package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall-per-merge measurement of the batched BPE trainer
  * (`TextAnalysis.bpeLearnBatched`, r12 verdict item 4): drive the
  * trainer to tens of rounds at several batch widths M over the real
  * documents table and report merges learned, wall, and wall/merge —
  * the number that says what a ~30k-merge production vocabulary costs.
  * M=1 is the sequential trainer, so the first row IS the old
  * per-merge cost and the speedup column is measured, not asymptotic.
  *
  * Usage: runMain graft.tools.BpeScaleDemo <sfDir> [rounds] [Ms]
  */
object BpeScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 10
    val ms = (if (args.length > 2) args(2) else "1,4,8,16")
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
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .localCheckpoint(true)
    println("| M | rounds | merges | wall s | s/merge | s/round |")
    println("|---|---|---|---|---|---|")
    ms.foreach { m =>
      // warm-up at 1 round to shed codegen/classload, then the timed run
      graft.operators.TextAnalysis.bpeLearnBatched(docs, 1, m)
      val t0 = System.nanoTime()
      val (_, learned) =
        graft.operators.TextAnalysis.bpeLearnBatched(docs, rounds, m)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"| $m%2d | $rounds | ${learned.size}%5d | $sec%7.2f | " +
        f"${sec / math.max(1, learned.size)}%7.3f | ${sec / rounds}%7.3f |")
    }
    spark.stop()
  }
}
