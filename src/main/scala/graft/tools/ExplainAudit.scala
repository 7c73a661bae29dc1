package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan-quality audit: prints the formatted physical plan for selected
  * queries and greps the properties that matter at scale — pushed filters,
  * pruned read schemas, broadcast joins, partial aggregation.
  * Usage: runMain graft.tools.ExplainAudit <sfDir> [name ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q6_forecast_revenue", "q3_shipping_priority",
        "q5_local_supplier", "q_semi_join", "cdc_snapshot", "dedup_minhash_lsh",
        "sim_topk_quantized", "text_tfidf_top_term")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `redflags` mode: scan EVERY registered query's physical plan for the
    // patterns that kill at scale — cartesian products, nested-loop joins,
    // empty-partition-spec windows, single-partition exchanges — and print
    // only offenders (with a line of context each). The judge for plan
    // quality, run as a sweep instead of query-by-query reading.
    if (names == Seq("redflags")) {
      var flagged = 0
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val flags = Seq(
            "CartesianProduct" -> "cartesian product",
            "BroadcastNestedLoopJoin" -> "nested-loop join (check broadcast side is O(1))",
            "PartitionSpec: []" -> "window with empty partition spec",
            "Exchange SinglePartition" -> "single-partition exchange")
            .filter { case (pat, _) => plan.contains(pat) }
          if (flags.nonEmpty) {
            flagged += 1
            println(s"######## $n")
            flags.foreach { case (pat, why) =>
              println(s"  FLAG: $why")
              plan.linesIterator.filter(_.contains(pat))
                .take(2).foreach(l => println("    " + l.trim.take(160)))
            }
          }
        } catch { case e: Throwable => println(s"######## $n ERROR $e") }
      }
      println(s"== $flagged flagged of ${SparkEntry.queries.size}")
      spark.stop()
      return
    }
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      println(s"######## $n")
      // headline signals only; full plan on demand
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.startsWith("PushedFilters") || t.startsWith("ReadSchema") ||
            t.contains("BroadcastHashJoin") || t.contains("SortMergeJoin") ||
            t.contains("ShuffledHashJoin") || t.contains("HashAggregate") ||
            t.contains("Exchange") || t.contains("WholeStageCodegen") ||
            t.contains("TakeOrderedAndProject") || t.contains("Window"))
          println("  " + t.take(160))
      }
    }
    spark.stop()
  }
}
