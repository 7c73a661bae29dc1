package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Data-layout → scan-efficiency contract, MEASURED (not plan-string
  * asserted): a sort-clustered parquet layout must let a pushed range
  * predicate skip row groups via footer min/max stats, and a partitioned
  * layout must scan only the matching partition's files. These are the two
  * layout levers that decide whether a 100 TB time-range query reads
  * gigabytes or the whole table.
  */
class LayoutSpec extends SparkSpec {

  /** Execute `df` and return (scan numOutputRows, scan numFiles) summed
    * over its parquet scans. AQE is disabled around the measured query so
    * `executedPlan` exposes the FileSourceScanExec directly (the layout
    * property under test is AQE-independent: row-group skipping happens in
    * the parquet reader below any adaptive re-planning).
    */
  private def scanMetrics(build: => DataFrame): (Long, Long) = {
    val key = "spark.sql.adaptive.enabled"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = build
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "no FileSourceScanExec in executed plan")
      (scans.map(_.metrics("numOutputRows").value).sum,
        scans.map(s => s.metrics.get("filesNum").orElse(s.metrics.get("numFiles"))
          .map(_.value).getOrElse(0L)).sum)
    } finally spark.conf.set(key, prior)
  }

  test("sort-clustered layout: range predicate skips row groups; unsorted reads everything") {
    val tmp = Files.createTempDirectory("graft-layout").toString
    // The clustering key is cast to DATE: measured on this Spark, a
    // TIMESTAMP_NTZ key (what DuckDB-written TIMESTAMP columns read back
    // as) gets its predicate into PushedFilters but the parquet reader
    // never evaluates it against row-group stats — both layouts scan all
    // 60k rows. DATE stats filter correctly, and a date is the right
    // clustering granularity for a time-partitioned fact table anyway.
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship_d"),
        col("l_quantity"), col("l_extendedprice"))
    val total = li.count()
    // clustered: range-partitioned + sorted on ship_d, ~64 KiB row
    // groups so the small test file still has many groups to skip
    Sources.writeClustered(li, s"$tmp/clustered", "ship_d",
      rowGroupBytes = 64L << 10, nFiles = 4)
    // unsorted control with the SAME row-group size: stats exist but every
    // group's [min,max] spans the whole date domain
    li.repartition(4).write.mode("overwrite")
      .option("parquet.block.size", (64L << 10).toString)
      .parquet(s"$tmp/unsorted")

    def rangeQuery(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_d") >= lit("1995-06-01").cast("date") &&
        col("ship_d") < lit("1995-07-01").cast("date"))
      .select(col("l_orderkey"), col("l_quantity"))

    val hit = rangeQuery(s"$tmp/clustered").count() // rows actually matching
    assert(hit > 0 && hit < total / 10, s"test needs a selective range, got $hit/$total")
    assert(rangeQuery(s"$tmp/unsorted").count() == hit)

    val (clusteredRows, _) = scanMetrics(rangeQuery(s"$tmp/clustered"))
    val (unsortedRows, _) = scanMetrics(rangeQuery(s"$tmp/unsorted"))
    // unsorted: every row group overlaps the range -> scan emits ~all rows
    assert(unsortedRows > total / 2,
      s"control layout unexpectedly skipped: $unsortedRows of $total")
    // clustered: only the row groups whose [min,max] overlaps one month
    // survive -> scan emits a small multiple of the true hit count
    assert(clusteredRows < unsortedRows / 4,
      s"clustered scan read $clusteredRows rows vs unsorted $unsortedRows — no row-group skipping")
    assert(clusteredRows >= hit)
  }

  test("morton interleave: known values and 2-dim locality") {
    import graft.functions.ZOrder
    import spark.implicits._
    val rows = Seq((0xFFFFL, 0L), (0L, 0xFFFFL), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b")).as("z")).as[Long].collect()
    assert(rows(0) == 0x55555555L) // a on even bits
    assert(rows(1) == 0xAAAAAAAAL) // b on odd bits
    // a=3 -> even bits 0,2; b=5 (bits 0,2) -> odd bits 1,5
    assert(rows(2) == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)))
  }

  test("z-ordered layout: range predicates on EITHER dimension skip row groups") {
    val tmp = Files.createTempDirectory("graft-layout-z").toString
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
    val total = li.count()
    // control: single-dim sort on partkey — serves partkey filters only
    Sources.writeClustered(li, s"$tmp/bypart", "l_partkey",
      rowGroupBytes = 64L << 10, nFiles = 4)
    // z-order on (partkey 0..1999, suppkey 0..99)
    Sources.writeZOrdered(li, s"$tmp/z", "l_partkey", 0, 1999,
      "l_suppkey", 0, 99, rowGroupBytes = 64L << 10, nFiles = 4)

    def partQ(dir: String) = spark.read.parquet(dir)
      .filter(col("l_partkey") >= 1000L && col("l_partkey") < 1100L) // 5%
      .select(col("l_orderkey"))
    def suppQ(dir: String) = spark.read.parquet(dir)
      .filter(col("l_suppkey") >= 40L && col("l_suppkey") < 50L) // 10%
      .select(col("l_orderkey"))

    // result equality across layouts
    assert(partQ(s"$tmp/z").count() == partQ(s"$tmp/bypart").count())
    assert(suppQ(s"$tmp/z").count() == suppQ(s"$tmp/bypart").count())

    val (partBySort, _) = scanMetrics(partQ(s"$tmp/bypart"))
    val (partByZ, _) = scanMetrics(partQ(s"$tmp/z"))
    val (suppBySort, _) = scanMetrics(suppQ(s"$tmp/bypart"))
    val (suppByZ, _) = scanMetrics(suppQ(s"$tmp/z"))
    info(s"partkey filter: sorted=$partBySort z=$partByZ of $total")
    info(s"suppkey filter: sorted=$suppBySort z=$suppByZ of $total")
    // single-dim sort: its own key prunes hard; the other key reads ~all
    // (margin: repartitionByRange SAMPLES bounds, so group edges wobble
    // a few % between runs — observed 5.3k-6.2k of 60k)
    assert(partBySort < total / 8)
    assert(suppBySort > total / 2,
      s"control layout should not prune suppkey, read $suppBySort")
    // z-order: BOTH dims prune meaningfully
    assert(partByZ < total / 2, s"z layout partkey scan $partByZ")
    assert(suppByZ < total / 2, s"z layout suppkey scan $suppByZ")
    assert(suppByZ * 2 <= suppBySort, s"z must beat single-dim sort on the second dim: $suppByZ vs $suppBySort")
  }

  test("compaction: many small files -> few target-sized files, same data") {
    val tmp = Files.createTempDirectory("graft-compact").toString
    val cust = graft.Tables.load(spark, "/root/testdata/sf0.01", "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    // simulate a streaming sink's accumulation: 20 tiny appends
    (0 until 20).foreach { _ =>
      cust.limit(75).write.mode("append").parquet(s"$tmp/t")
    }
    val before = spark.read.parquet(s"$tmp/t")
    val beforeRows = before.collect().map(_.toString).sorted
    val (nBefore, nAfter) = Sources.compact(spark, s"$tmp/t", 8L << 20)
    assert(nBefore >= 20, s"expected >=20 small files, got $nBefore")
    assert(nAfter == 1, s"1.5k tiny rows should compact to 1 file, got $nAfter")
    val afterRows = spark.read.parquet(s"$tmp/t").collect().map(_.toString).sorted
    assert(afterRows.toSeq == beforeRows.toSeq)
  }

  test("clustered compaction preserves row-group skipping; plain compaction destroys it") {
    val tmp = Files.createTempDirectory("graft-compact-z").toString
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("ship_d"),
        col("l_quantity"))
    val total = li.count()
    def writeFragmented(dir: String): Unit =
      // 12 separately-appended clustered slices: a small-file mess whose
      // per-file sort a naive compaction would undo
      (0 until 12).foreach { i =>
        li.filter(pmod(col("l_orderkey"), lit(12)) === i)
          .repartitionByRange(1, col("ship_d")).sortWithinPartitions(col("ship_d"))
          .write.mode("append").parquet(dir)
      }
    writeFragmented(s"$tmp/a"); writeFragmented(s"$tmp/b")
    def rangeRows(dir: String): Long = scanMetrics(
      spark.read.parquet(dir)
        .filter(col("ship_d") >= lit("1995-06-01").cast("date") &&
          col("ship_d") < lit("1995-07-01").cast("date"))
        .select(col("l_orderkey")))._1
    // clustered compaction: re-sorts while compacting -> skipping kept
    // (small row groups so the compacted files still have many groups)
    val (beforeA, afterA) = Sources.compact(spark, s"$tmp/a",
      targetBytes = 64L << 20, sortCol = Some("ship_d"),
      rowGroupBytes = 64L << 10)
    assert(beforeA >= 12 && afterA < beforeA)
    val clustered = rangeRows(s"$tmp/a")
    assert(clustered < total / 4,
      s"clustered compaction lost skipping: scanned $clustered of $total")
    // plain compaction with the SAME row-group size: round-robin shuffle
    // makes every group's [min,max] span the full domain -> no skipping
    Sources.compact(spark, s"$tmp/b", targetBytes = 64L << 20,
      sortCol = None, rowGroupBytes = 64L << 10)
    val destroyed = rangeRows(s"$tmp/b")
    assert(destroyed > total / 2,
      s"expected plain compaction to destroy clustering, scanned $destroyed")
  }

  test("partitioned layout: one-partition read scans only that partition's files") {
    val tmp = Files.createTempDirectory("graft-layout-part").toString
    val cust = graft.Tables.load(spark, "/root/testdata/sf0.01", "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    Sources.writePartitioned(cust, s"$tmp/p", "c_mktsegment")
    val nSegments = cust.select("c_mktsegment").distinct().count()
    assert(nSegments >= 3)
    val (allRows, allFiles) = scanMetrics(spark.read.parquet(s"$tmp/p"))
    val (oneRows, oneFiles) = scanMetrics(
      spark.read.parquet(s"$tmp/p").filter(col("c_mktsegment") === "BUILDING"))
    assert(allRows == cust.count())
    assert(oneRows == cust.filter(col("c_mktsegment") === "BUILDING").count())
    assert(allFiles > 0 && oneFiles > 0 &&
      oneFiles < allFiles, s"partition pruning read $oneFiles of $allFiles files")
  }
}
