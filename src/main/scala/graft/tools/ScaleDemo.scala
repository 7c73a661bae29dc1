package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Scale demonstration for the dedup/ANN linearity claims (SCALE.md):
  * build ×1/×3/×10 corpora from the sf0.1 documents/embeddings tables and
  * measure MinHash-LSH candidate-pair counts + wall time and IVF
  * assignment/probe cost at each multiple. The claim under test: candidate
  * generation is a bucket equi-join (LSH bands, IVF cells), so pairs and
  * time grow ~linearly with corpus size — never N².
  *
  * Corpus synthesis: copy k rewrites every token with a copy-unique prefix,
  * so copies share NO shingles with the original (distinct documents, the
  * honest scale-up); within-copy near-duplicate structure is preserved, so
  * the expected candidate set grows ~k×. Embedding copies get a per-copy
  * deterministic rotation-free perturbation (+0.01*k per dim) — distinct
  * vectors, same isotropic layout, cell populations grow k×.
  *
  * Usage: runMain graft.tools.ScaleDemo <sfDir> [multiples e.g. 1,3,10]
  */
object ScaleDemo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  // Copy stride: must exceed any base doc_id/vec_id or copies collide with
  // base rows and the pair counts silently bend. 10M clears the testdata
  // id space at every sf with two orders of margin.
  private val Stride = 10000000L

  def docsAt(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = Stride
    (0 until mult).map { k =>
      if (k == 0) base
      else base.select(
        (col("doc_id") + lit(k * n)).as("doc_id"),
        // prefix EVERY token: all 3-word shingles become copy-unique
        concat(lit(s"c${k}_"),
          regexp_replace(col("text"), " ", s" c${k}_")).as("text"))
    }.reduce(_ unionByName _)
  }

  def vecsAt(spark: SparkSession, dir: String, mult: Int): DataFrame = {
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = Stride
    (0 until mult).map { k =>
      if (k == 0) base
      else base.select(
        (col("vec_id") + lit(k * n)).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.01f * k)).as("embedding"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,3,10")
      .split(',').map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("| mult | docs | lsh_pairs | lsh_sec | vecs | ivf_cands | ivf_sec |")
    println("|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      // --- MinHash-LSH: signatures + banded candidates, end to end
      val corpus = docsAt(spark, sfDir, m)
      val nDocs = corpus.count()
      val ((pairs, _), lshSec) = timed {
        val sigs = Dedup.minhashSignatures(corpus)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val p = Dedup.lshCandidates(sigs).count()
        sigs.unpersist()
        (p, ())
      }

      // --- IVF: assign all vectors to 8 cells, probe 3 cells for 10 fixed
      // queries, count candidates entering the exact re-rank
      val vecs = vecsAt(spark, sfDir, m)
      val nVecs = vecs.count()
      val (ivfCands, ivfSec) = timed {
        val q = graft.functions.VectorExprs.quantize1000(col("embedding"))
        val e = vecs.select(col("vec_id"), q.as("qv"))
        def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          graft.functions.VectorExprs.dotProductLong(a, b)
        def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          dot(a, b).cast(DoubleType) /
            sqrt(dot(a, a).cast(DoubleType)) / sqrt(dot(b, b).cast(DoubleType))
        val cents = broadcast(e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("qv").as("cv")))
        val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
        val assigned = e.join(cents)
          .withColumn("ccos", cos(col("qv"), col("cv")))
          .withColumn("rn", row_number().over(wAssign))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("cid").as("cell"))
        val probes = e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
          .join(cents)
          .withColumn("ccos", cos(col("qv"), col("cv")))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))))
          .filter(col("rn") <= 3)
          .select(col("vec_id").as("qid"), col("cid").as("cell"))
        probes.join(assigned, Seq("cell")).filter(col("qid") =!= col("vec_id")).count()
      }
      println(s"| ${m}x | $nDocs | $pairs | ${f"$lshSec%.1f"} | $nVecs | $ivfCands | ${f"$ivfSec%.1f"} |")
    }

    // --- round-9 candidate generators: tfidf-cosine inverted index and
    // phash banding. Same claim under test: candidates are equi-join
    // generated (shared df-capped shingle / shared 14-bit band), so pair
    // counts and wall time grow ~linearly with the corpus — never N².
    println()
    println("| mult | docs | tfidf_cands | tfidf_sec | images | phash_cands | phash_sec |")
    println("|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      val corpus = docsAt(spark, sfDir, m)
      val nDocs = corpus.count()
      val (tfidfCands, tfidfSec) = timed {
        val t = split(col("text"), " ")
        val shingle = transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
            element_at(t, i + 2)))
        val sh = corpus.filter(size(t) >= 3)
          .select(col("doc_id"), explode(shingle).as("s")).distinct()
          .localCheckpoint(true)
        val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= 20)
        val iw = sh.join(dfreq, "s").localCheckpoint(true)
        iw.select(col("s"), col("doc_id").as("id_a"))
          .join(iw.select(col("s"), col("doc_id").as("id_b")), Seq("s"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct().count()
      }
      val (phashCands, phashSec) = timed {
        val sess = spark
        import sess.implicits._
        val hashes = corpus.select(col("doc_id")).as[Long]
          .mapPartitions(graft.operators.Multimodal.phashRows _).toDF()
          .localCheckpoint(true)
        val banded = hashes.select(col("vid"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band"),
            shiftright(col("dhash"), b * 14).bitwiseAND(lit(16383L))
              .as("bv"))): _*)).as("bb"))
          .select(col("vid"), col("bb.band").as("band"), col("bb.bv").as("bv"))
        banded.select(col("band"), col("bv"), col("vid").as("id_a"))
          .join(banded.select(col("band"), col("bv"), col("vid").as("id_b")),
            Seq("band", "bv"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct().count()
      }
      println(s"| ${m}x | $nDocs | $tfidfCands | ${f"$tfidfSec%.1f"} | ${nDocs * 2} | $phashCands | ${f"$phashSec%.1f"} |")
    }
    spark.stop()
  }
}
