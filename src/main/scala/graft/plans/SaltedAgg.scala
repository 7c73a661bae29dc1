package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-stage aggregation: salt the hot key space, partially
  * aggregate on (key, salt), then finish on key. For algebraic aggregates
  * (count/sum/min/max) the result is exactly the unsalted aggregate, but
  * the first shuffle spreads a hot key over `buckets` reducers instead of
  * melting one.
  *
  * At 100 TB this is the standard fix when AQE's skew handling can't help
  * (skewed *aggregation* rather than skewed join).
  *
  * Salt determinism — the contract that matters on a real cluster:
  *
  * By DEFAULT the salt is a pure function of row content (`xxhash64` of the
  * whole row). That makes the map stage recompute-deterministic: if a
  * shuffle-map output is lost and one task is recomputed, every row gets the
  * SAME salt it had before, so already-fetched reducer inputs and recomputed
  * ones agree — no rows duplicated or lost. The cost: fully-identical rows
  * of a hot key (the degenerate skew case) share a content hash and land in
  * ONE salt bucket, unsplit.
  *
  * `spreadIdenticalRows = true` opts into splitting that degenerate case by
  * folding a per-row ordinal (`monotonically_increasing_id`) into the salt.
  * The ordinal depends on partition layout and row order, so a recomputed
  * map task could re-salt rows differently than what committed reducers
  * already consumed. Spark does NOT protect against this here: on Spark
  * 4.1.2 the SQL exec nodes create their RDDs with the default
  * `isOrderSensitive = false` and none overrides
  * `outputDeterministicLevel`, so a nondeterministic expression in a
  * Project is invisible to the scheduler's INDETERMINATE-stage tracking
  * (the SPARK-23207 rollback never fires for these plans). We therefore
  * force a `localCheckpoint()` barrier on the salted frame before the
  * consuming shuffle: the salt assignment is materialized once and lineage
  * is truncated, so a lost block fails the job loudly instead of silently
  * re-salting. Opt in only when identical-row skew is real and the
  * materialization cost of the salted side is acceptable.
  */
object SaltedAgg {

  /** Recompute-deterministic salt: content hash mod buckets. */
  private def contentSalt(row: Column, buckets: Int): Column =
    pmod(xxhash64(row), lit(buckets.toLong))

  /** Salted copy of `df` in column `_salt`. Default: content-only salt
    * (deterministic under task recompute). With `spreadIdenticalRows`, the
    * ordinal-mixed salt is pinned by an eager localCheckpoint barrier —
    * see the companion scaladoc for why the barrier is load-bearing. */
  private def withSalt(
      df: DataFrame,
      buckets: Int,
      spreadIdenticalRows: Boolean): DataFrame = {
    val row = struct(df.columns.map(col): _*)
    if (!spreadIdenticalRows) {
      df.withColumn("_salt", contentSalt(row, buckets))
    } else {
      df.withColumn("_salt",
          pmod(xxhash64(row, monotonically_increasing_id()), lit(buckets.toLong)))
        .localCheckpoint()
    }
  }

  /** sums/counts per key, salted. aggs maps output column name → (partial
    * expression over the input, final merge over the partial column). */
  def sumCountByKey(
      df: DataFrame,
      key: Column,
      buckets: Int,
      sums: Map[String, Column] = Map.empty,
      spreadIdenticalRows: Boolean = false): DataFrame = {
    val salted = withSalt(df, buckets, spreadIdenticalRows)
    val partialAggs =
      count(lit(1)).as("_n") +: sums.map { case (n, c) => sum(c).as(s"_s_$n") }.toSeq
    val partial = salted
      .groupBy(key.as("_key"), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs =
      sum(col("_n")).as("n") +: sums.keys.map(n => sum(col(s"_s_$n")).as(n)).toSeq
    partial.groupBy(col("_key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Skew-resistant equi-join: salt the (skewed) big side, replicate the
    * small side `buckets`×, and join on (key, salt) — a hot key's rows land
    * on `buckets` reducers instead of one. Exact same result set as the
    * plain join (every big row meets every matching small row exactly once,
    * at its own salt). Salt determinism follows the companion note: default
    * content-hash salt is recompute-safe; `spreadIdenticalRows` splits
    * fully-duplicate hot rows behind a localCheckpoint barrier.
    *
    * This is the manual fallback when AQE's skew-join split can't fire
    * (e.g. the skewed side is the OUTPUT of an aggregation whose stats AQE
    * can't see yet, or the join key is computed). Cost: small side
    * shuffled `buckets`×, which is the point — small × buckets ≪ hot-key
    * concentration. Column names are preserved; `big`/`small` must not
    * share column names (same contract as a plain join).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      buckets: Int,
      spreadIdenticalRows: Boolean = false): DataFrame = {
    val saltedBig = withSalt(big, buckets, spreadIdenticalRows)
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig
      .join(replicated,
        bigKey === smallKey && saltedBig("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
