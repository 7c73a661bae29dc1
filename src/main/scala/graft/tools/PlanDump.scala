package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named registered queries to
  * `<outDir>/<name>_<tag>.txt` — the optimization-round evidence files
  * (the plans/r16 before/after captures). No counts, no writes: plans
  * only, so a capture is cheap even for expensive queries. Audit-style
  * queries whose registered frame is a driver-local boolean row (the
  * `sim_*` pinned pattern) still show their full lineage when the heavy
  * frames are reachable from the output plan; for the rest the companion
  * OPTIMIZATION doc names the internal frame the claim is about.
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <name...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, tag, names) =
      (args(0), args(1), args(2), args.drop(3).toSeq)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
