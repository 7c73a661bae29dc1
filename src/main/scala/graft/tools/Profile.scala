package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: time one registered query (or all) and optionally print its
  * formatted physical plan. Usage:
  *   runMain graft.tools.Profile <sfDir> <queryName|all> [explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "all"
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (which == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq(which -> SparkEntry.queries(which))
    targets.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      if (doExplain) { println(s"===== $name"); df.explain("formatted") }
      // two timed runs: first includes codegen/compile, second is steady state
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"$name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      }
    }
    spark.stop()
  }
}
