package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Files-read measurement for the `graft-table` connector READ pushdown
  * (VERDICT r13 item 1, the round's `weak`): build the sf dual-table
  * group the cdc_txn_* queries use (64 buckets, four wave-aligned
  * transactional batches), then read the version-3 snapshot through the
  * connector three ways and report how many live FILES/BUCKETS each scan
  * resolved ([[graft.sources.GraftTableReadStats]]) plus wall time:
  *
  *   1. unconstrained version-as-of read (the r13 behavior for EVERY
  *      read, selective or not),
  *   2. a 6-key IN lookup — the residues pin ≤6 of 64 buckets,
  *   3. a single-key equality lookup — exactly 1 bucket.
  *
  * At 100 TB the ratio is the point: a keyed lookup through the
  * connector now reads O(k/nBuckets) of the version's live bytes instead
  * of all of them, with nBuckets sized in the thousands.
  *
  * Usage: runMain graft.tools.Round14PushdownDemo [sfDir]
  */
object Round14PushdownDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    // the same four-wave transactional drive the cdc_txn_* queries share
    val group = graft.cdc.CdcQueries.dualSinkGroupFor(spark, sfDir)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def read() = spark.read.format("graft-table")
      .option("path", group).option("versionAsOf", "3").load()
    def stats() = (graft.sources.GraftTableReadStats.lastFiles,
      graft.sources.GraftTableReadStats.lastBuckets,
      graft.sources.GraftTableReadStats.lastTotalBuckets)

    println("| read | rows | files read | buckets read | live buckets | sec |")
    println("|---|---|---|---|---|---|")
    def row(label: String, rows: Long, sec: Double): Unit = {
      val (f, b, tb) = stats()
      println(f"| $label | $rows%d | $f%d | $b%d | $tb%d | $sec%.2f |")
    }
    // warm each path once so the table compares resolution, not JIT
    (0 until 2).foreach { i =>
      if (i == 1) println()
      val (n1, s1) = timed(read().count())
      if (i == 1) row("full version-3 scan", n1, s1)
      val (n2, s2) = timed(
        read().filter(col("id").isin(2L, 4L, 8L, 16L, 23L, 42L)).count())
      if (i == 1) row("IN (6 keys)", n2, s2)
      val (n3, s3) = timed(read().filter(col("id") === 23L).count())
      if (i == 1) row("single-key lookup", n3, s3)
    }
    spark.stop()
  }
}
