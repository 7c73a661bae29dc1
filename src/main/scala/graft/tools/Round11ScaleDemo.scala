package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** ×1/×3/×10 linearity measurement for the round-11 operators (SCALE.md):
  * the hash-keyed TF-IDF cosine candidate generator (candidate volume must
  * track Σ df², bounded by the df cap — never corpus²), n-gram novelty
  * (two shingle-keyed hash aggs — wall tracks the scan), and the IVF kNN
  * graph (every vector probes nprobe/K of the corpus — edges grow k·N,
  * candidate work ~N²·nprobe/K locally but cell-partitioned at scale).
  * Reuses [[ScaleDemo.docsAt]]/[[ScaleDemo.vecsAt]]'s copy-unique corpus
  * synthesis.
  *
  * Usage: runMain graft.tools.Round11ScaleDemo <sfDir> [multiples]
  */
object Round11ScaleDemo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
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
    spark.range(1000000).selectExpr("sum(id)").collect() // warm scheduler

    mults.foreach { m =>
      val docs = ScaleDemo.docsAt(spark, sfDir, m).localCheckpoint(true)
      val nDocs = docs.count()
      val (nPairs, tTfidf) = timed {
        graft.operators.Dedup.tfidfPairs(docs,
          (a, b, c) => xxhash64(a, b, c)).count()
      }
      val (novelAgg, tNovel) = timed {
        graft.operators.TextAnalysis.noveltyOf(docs,
          (a, b, c) => xxhash64(a, b, c))
          .agg(sum(col("n_novel")), sum(col("n_shingles"))).head()
      }
      val vecs = ScaleDemo.vecsAt(spark, sfDir, m).localCheckpoint(true)
      val nVecs = vecs.count()
      val (nEdges, tKnn) = timed {
        graft.operators.SimilarityIvf.ivfCandidatesFrom(
          vecs, lit(true), lit(true), 4).count()
      }
      println(f"== x$m%-3d docs=$nDocs%8d  tfidf=${tTfidf}%6.2f s " +
        f"(pairs=$nPairs%8d)  novelty=${tNovel}%6.2f s " +
        f"(novel=${novelAgg.getLong(0)}%9d sh=${novelAgg.getLong(1)}%9d)")
      println(f"   vecs=$nVecs%8d  knn=${tKnn}%6.2f s (edges=$nEdges%9d)")
    }
    spark.stop()
  }
}
