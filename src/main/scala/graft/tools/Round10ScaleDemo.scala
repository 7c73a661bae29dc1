package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ×1/×3/×10 linearity measurement for the round-10 operators (SCALE.md):
  * content-defined chunking (narrow map + one content-keyed agg — wall
  * and chunk counts must grow ~linearly) and classifier training (one
  * map-side-combinable co-moment aggregation — wall must stay ~flat-ish:
  * scan-bound, O(k²) state). Reuses [[ScaleDemo.docsAt]]'s copy-unique
  * corpus synthesis so scaled corpora are genuinely distinct documents.
  *
  * Usage: runMain graft.tools.Round10ScaleDemo <sfDir> [multiples]
  */
object Round10ScaleDemo {

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
      // CDC chunking: chunk + content census + per-doc rollup
      val (chunkStats, tCdc) = timed {
        val chunks = graft.operators.Dedup.cdcChunkify(docs)
          .localCheckpoint(true)
        val census = chunks.select(col("chunk"), col("doc_id")).distinct()
          .groupBy(col("chunk")).agg(count(lit(1)).as("n_docs"))
        val row = chunks.join(census, "chunk")
          .agg(count(lit(1)), sum(when(col("n_docs") >= 2, 1L).otherwise(0L)))
          .head()
        (row.getLong(0), row.getLong(1))
      }
      // classifier training: the one co-moment aggregation + solve
      val (beta0, tTrain) = timed {
        graft.operators.QualityModel.train(
          graft.operators.QualityModel.feats(docs))(0)
      }
      println(f"== x$m%-3d docs=$nDocs%8d  cdc=${tCdc}%6.2f s " +
        f"(chunks=${chunkStats._1}%9d dup=${chunkStats._2}%9d)  " +
        f"train=${tTrain}%6.2f s (beta0=${beta0}%.6f)")
      // DSIR resampling: bucket stats stay <=256 rows at every multiple —
      // wall should track the scan, selection is TakeOrdered
      val (dsirTop, tDsir) = timed {
        graft.operators.TextAnalysis.dsirResample(
          docs.withColumn("source",
            concat(lit("src"), pmod(col("doc_id"), lit(20)))))
          .agg(count(lit(1)), min(col("dsir_score"))).head()
      }
      println(f"   dsir=${tDsir}%6.2f s (top=${dsirTop.getLong(0)}%3d " +
        f"minScore=${dsirTop.getLong(1)}%d)")
    }
    spark.stop()
  }
}
