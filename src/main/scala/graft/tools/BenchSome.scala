package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: bench-IDENTICAL timing (fn + count inside the timer, the
  * graft.Bench.time1 contract) for a named subset of queries and/or
  * drives, in the order given — so an optimization's before/after can be
  * measured in minutes instead of a full sweep. `drive:*` names run the
  * drive; everything else runs the registered query. Repeat a name to
  * see warm (memoized) cost. Usage:
  *   runMain graft.tools.BenchSome <sfDir> <name|drive:name> [...]
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val drives = graft.SparkEntry.drives.toMap
    var total = 0.0
    names.foreach { n =>
      // skip-unknown keeps one command line usable across code versions
      // (an A/B run where a drive exists on only one side)
      val known = if (n.startsWith("drive:")) drives.contains(n)
        else graft.SparkEntry.queries.contains(n)
      if (!known) println(f"[benchsome] $n%-34s   (unknown, skipped)")
      else {
        val t0 = System.nanoTime()
        if (n.startsWith("drive:")) drives(n)(spark, sfDir)
        else graft.SparkEntry.queries(n)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        total += sec
        println(f"[benchsome] $n%-34s $sec%8.3f s")
      }
    }
    println(f"[benchsome] TOTAL ${total}%.3f s")
    spark.stop()
  }
}
