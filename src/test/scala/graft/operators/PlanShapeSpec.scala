package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Regression guards for plan QUALITY, not results: the single-scan window
  * rewrites and broadcast choices hold only as long as nobody reintroduces
  * an agg + self-join-back or lets a dimension join fall to sort-merge. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  /** Count physical operators by their detail-section header `(n) Op` —
    * FormattedMode prints every operator twice (tree line + details), so a
    * raw substring count double-counts. */
  private def count(p: String, op: String): Int =
    s"""(?m)^\\(\\d+\\) $op""".r.findAllIn(p).size

  test("q2: single pass over lineitem — no duplicated fact subtree") {
    val p = plan("q2_min_cost_supplier")
    assert(count(p, "Scan parquet") <= 6, p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q17: fact read once, window over the joined frame") {
    val p = plan("q17_small_qty_revenue")
    assert(count(p, "Scan parquet") == 2, p.take(500)) // lineitem + part
    assert(p.contains("Window"))
  }

  test("q10: all dimension joins broadcast, one aggregation exchange") {
    val p = plan("q10_returned_revenue")
    assert(!p.contains("SortMergeJoin"))
    assert(count(p, "BroadcastHashJoin") >= 3, p.take(800))
  }

  test("pq encode: codebooks broadcast, no sort-merge join") {
    val p = plan("sim_pq_codes")
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("binned range join is hash-shaped — never a nested-loop cross product") {
    val p = plan("q_range_join_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
    assert(p.contains("Join"), p.take(400))
  }

  test("q15: no global window — scalar max broadcast back over cached agg") {
    val p = plan("q15_top_supplier")
    assert(!p.contains("Window"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(800)) // the 1-row max side is broadcast
    assert(p.contains("InMemoryTableScan"), p.take(800)) // perSupp cached, not re-aggregated
  }

  test("key skew profile: top-10 via TakeOrderedAndProject, window spec non-empty") {
    val p = plan("q_key_skew_profile")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    // the residual rank window is over the bounded 10-row frame and keeps a
    // partition spec (EliminateWindowPartitions must not have emptied it)
    assert("""(?s)Window.*PartitionSpec: \[\]""".r.findFirstIn(p).isEmpty, p.take(800))
  }

  test("cdc_multi_table: single aggregation pass per route — no crossJoin of twin subtrees") {
    val p = plan("cdc_multi_table")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(!p.contains("Window"), p.take(800)) // compaction folded into max_by agg
  }

  test("interval-overlap join is hash-shaped — never a nested-loop cross product") {
    val p = plan("q_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
    assert(p.contains("Join"), p.take(400))
  }

  test("chunking is a pure narrow map: no Exchange before the final sort") {
    val p = plan("text_chunks")
    // exactly one exchange: the rangepartitioning for the deterministic
    // output ORDER BY — nothing shuffles during chunk construction
    assert(count(p, "Exchange") == 1, p.take(800))
  }

  test("repetition signals: hash-agg shaped, no cross-product joins") {
    val p = plan("text_repetition")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // token-cardinality work collapses through partial hash aggregation
    assert(count(p, "HashAggregate") >= 4, p.take(800))
  }

  test("rare-bigram ratio: equi-join on the bigram, no cross product") {
    val p = plan("text_rare_bigram_ratio")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(p.contains("HashAggregate"), p.take(400))
  }

  test("one-pass pipeline: the whole lang×split×quality×dedup gate reads documents ONCE") {
    val p = plan("text_pipeline_one_pass")
    assert(count(p, "Scan parquet") == 1, p.take(800))
    assert(!p.contains("Join"), p.take(800)) // features fuse into the scan, no self-join-back
    assert(p.contains("Window"), p.take(400)) // exact-dedup canonical rank
  }

  test("url blocklist: the domain-dim join is broadcast — the scan never shuffles for it") {
    val p = plan("text_url_blocklist")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("pii scrub: one scan, no join — scrub is a narrow map") {
    val p = plan("text_pii_scrub")
    assert(count(p, "Scan parquet") == 1, p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }
}
