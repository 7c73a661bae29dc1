package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe the Louvain convergence drive (VERDICT r13 item 5) at a given
  * sf dir: run `SimilarityIvf.convergedCommunities` (levels 1-3 from the
  * registered memos, deeper levels coarsened on demand, accepted only on
  * STRICT exact-modularity gain) and print the accepted level count, the
  * per-level scaled modularity chain, and whether the converged partition
  * equals the pinned L3 — the facts the convergence query's oracle choice
  * depends on.
  *
  * Usage: runMain graft.tools.Round14LouvainProbe [sfDir...]
  */
object Round14LouvainProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    dirs.foreach { dir =>
      val (labels, levels) =
        graft.operators.SimilarityIvf.convergedCommunities(spark, dir)
      val nComm = labels.select("lbl").distinct().count()
      println(s"$dir: converged at level $levels, $nComm communities, " +
        s"${labels.count()} vertices")
    }
    spark.stop()
  }
}
