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

  test("tfidf cosine: inverted-index equi-join shape — no cartesian pair generation") {
    // the checkpointed iw frame truncates the plan, so what remains IS the
    // pair machinery: the shingle self-join, the (id_a,id_b) hash agg, the
    // norm joins. A cartesian anywhere here means the inverted index
    // stopped being the candidate generator.
    val p = plan("dedup_tfidf_cosine")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(count(p, "HashAggregate") >= 2, p.take(800)) // dot partial+final
    // pair generation joins on the shingle s — an equi join, never a
    // broadcast nested loop over the corpus
    assert(p.contains("Join"), p.take(400))
  }

  test("semantic dedup: pinned assignment; pair join is the cell equi-join") {
    // pin the pre-CC machinery directly (the CC tail is checkpointed, so
    // the registered query's final plan no longer shows it)
    val p = Dedup.semanticEdges(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // r17: the assignment is CHECKPOINTED (the r15 ReusedExchange
    // assumption was refuted by the plan audit — 18 embedding scans in
    // one plan); both self-join sides must now read the pinned frame and
    // the embeddings parquet must not appear in this tail at all
    assert(p.contains("Scan ExistingRDD"), p.take(800))
    assert(count(p, "Scan parquet") == 0, p.take(800))
    // within-cell pair generation is an equi-join on cell, not a loop
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      count(p, "BroadcastHashJoin") > 0, p.take(1200))
  }

  test("cms: two scans (sketch + exact top-20), sketch side broadcast back") {
    val p = plan("q_cms_custkey")
    assert(count(p, "Scan parquet") == 2, p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    // the UDAF aggregates through the object-agg path with a partial stage
    // (map-side combine of the 256-counter buffers)
    assert(count(p, "ObjectHashAggregate") + count(p, "SortAggregate") >= 2,
      p.take(800))
  }

  test("prefix filter: equi-join candidates, per-doc rank windows, no cartesian") {
    // audit the un-checkpointed pipeline: the registered query serves the
    // session-memoized localCheckpoint, whose explain is only an RDD scan
    val p = Dedup.exactPairsPlan(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // the rank window must be per-document, never a global order
    val specs = """windowspecdefinition\(([^)]*)\)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("doc_id")),
      specs.mkString("; "))
    assert(count(p, "HashAggregate") >= 2, p.take(800))
  }

  test("bm25 serving: the postings scan is partition-pruned to the query terms' buckets") {
    val p = plan("text_bm25_served")
    // the serving claim: PartitionFilters on the tbucket partition column
    // restrict the scan to the resolved query-term buckets, and the term
    // IN-list pushes into the surviving buckets' parquet scan
    val scans = """(?m)^\(\d+\) Scan parquet[\s\S]*?(?=\n\(\d+\)|\z)""".r
      .findAllIn(p).toSeq
    val postings = scans.filter(_.contains("tbucket"))
    assert(postings.nonEmpty, p.take(1200))
    assert(postings.exists(s =>
      """PartitionFilters: \[[^\]]*tbucket""".r.findFirstIn(s).isDefined), p.take(1200))
    assert(postings.exists(s =>
      """PushedFilters: \[[^\]]*[Ii]n\(term""".r.findFirstIn(s).isDefined),
      postings.mkString("\n").take(1200))
    assert(!p.contains("CartesianProduct"), p.take(800))
  }

  test("token cooccurrence: a-priori prune joins by key; only the 1-row N broadcast nests") {
    val p = plan("text_token_cooccurrence")
    assert(!p.contains("CartesianProduct"), p.take(800))
    // the single BroadcastNestedLoopJoin allowed is the 1-row corpus-size
    // frame riding the plan; pair generation itself must be hash joins
    assert(count(p, "BroadcastNestedLoopJoin") <= 1, p.take(800))
    assert(count(p, "HashAggregate") >= 4, p.take(800))
  }

  test("epoch shuffle: windows are per-(epoch,shard) — never a global order") {
    val p = plan("text_epoch_shuffle")
    // every Window must carry a non-empty partition spec; an empty one
    // would funnel the whole corpus through a single reducer
    val specs = """windowspecdefinition\(([^)]*)\)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p.take(800))
    assert(specs.forall(s => s.contains("epoch") && s.contains("shard")),
      specs.mkString("; "))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("vocab ids: ranks ride the pinned vocab aggregate, never the corpus") {
    val p = plan("text_vocab_ids")
    // r17: the token-count aggregate is pinned (graft.Ranks.globalRank
    // checkpoints it to decide the size-adaptive rank branch), so the
    // final plan ranks the VOCAB-sized RDD frame; at this SF the bounded
    // branch is the windowed rank over that pinned frame
    assert(p.contains("Scan ExistingRDD"), p.take(800))
    assert(p.contains("Window"), p.take(800))
    // encoding joins token->id by key — no cartesian anywhere
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("segment scrub: duplicate verdict is a segment equi-join, hash-agg shaped") {
    val p = plan("text_dup_segment_scrub")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(count(p, "HashAggregate") >= 2, p.take(800))
    // reassembly may use ObjectHashAggregate (collect_list bounded by
    // doc length) but the corpus-wide duplicate COUNT must be hash-agg
    assert(p.contains("partial_count"), p.take(800))
  }

  test("histogram quantiles: bounded aggs, stat frames broadcast, no sort of the fact") {
    val p = plan("q_quantile_histogram")
    // min/max + histogram + audit: every join of the 1-row/3-row helper
    // frames must broadcast; a sort-merge join would shuffle the scan
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(count(p, "BroadcastNestedLoopJoin") + count(p, "CartesianProduct") +
      count(p, "BroadcastHashJoin") >= 2, p.take(800))
    // no global Sort over lineitem rows — only bin-cardinality windows
    assert(p.contains("Window"), p.take(800))
  }

  test("quality classifier: narrow scoring map — no join, no window, one scan") {
    // training runs driver-side before the plan is built (the co-moment
    // agg is a separate job), so the SCORED output must be a pure narrow
    // map over one documents scan with literal coefficients
    val p = plan("text_quality_classifier")
    assert(count(p, "Scan parquet") == 1, p.take(800))
    assert(!p.contains("Join") && !p.contains("Window"), p.take(800))
    assert(count(p, "HashAggregate") == 0, p.take(800))
  }

  test("quality classifier eval: one partial+final agg over the scored scan") {
    val p = plan("text_quality_classifier_eval")
    assert(count(p, "Scan parquet") == 1, p.take(800))
    // threshold sweep: the 3-row frame nests (broadcast), the confusion
    // agg is map-side-combinable partial+final
    assert(count(p, "HashAggregate") == 2, p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("pca moments: partial+final hash agg past the pair explode, one scan per branch") {
    val p = plan("sim_pca_model")
    // the 2,080-way pair explode must collapse map-side: a partial and a
    // final HashAggregate per union branch, never a raw-row shuffle
    assert(count(p, "HashAggregate") >= 4, p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(p.contains("Generate"), p.take(800))
  }

  test("dsir: bucket stats broadcast, top-N via TakeOrdered — no global sort") {
    val p = plan("text_dsir_sample")
    // the ≤256-row bucket-stats table joins back broadcast, never sort-merge
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    // selection is per-partition top-N + driver merge, not a full sort
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }
}
