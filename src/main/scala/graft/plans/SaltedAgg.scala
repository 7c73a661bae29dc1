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
  * (skewed *aggregation* rather than skewed join). Salt derives from a hash
  * of the whole row PLUS a per-row ordinal (`monotonically_increasing_id`):
  * content alone would send fully-duplicate hot-key rows — the degenerate
  * skew case — into a single salt bucket. The ordinal makes identical rows
  * spread too. Correctness does not depend on WHICH salt a row gets (each
  * partial is summed / each big row meets every matching small row exactly
  * once at its own salt) — the ordinal affects only the DISTRIBUTION.
  *
  * Retry semantics: the ordinal is nondeterministic under task recompute
  * (it depends on partition layout and row order), which Spark tracks —
  * plans containing it are INDETERMINATE, so a lost shuffle-map output
  * triggers Spark's whole-stage rollback/re-run (SPARK-23207) rather than
  * a partial recompute mixing two salt assignments. The cost of that
  * machinery on failure is the price of splitting degenerate identical-row
  * skew; callers who need deterministic map output on retry at the price
  * of NOT splitting identical rows can salt with the content hash alone.
  */
object SaltedAgg {

  /** Salt bucket for one row: content hash ⊕ per-row ordinal, mod buckets. */
  private def saltCol(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64((cols :+ monotonically_increasing_id()): _*), lit(buckets.toLong))

  /** sums/counts per key, salted. aggs maps output column name → (partial
    * expression over the input, final merge over the partial column). */
  def sumCountByKey(
      df: DataFrame,
      key: Column,
      buckets: Int,
      sums: Map[String, Column] = Map.empty): DataFrame = {
    val salted = df
      .withColumn("_salt", saltCol(Seq(struct(df.columns.map(col): _*)), buckets))
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

  /** Skew-resistant equi-join: salt the (skewed) big side with a per-row
    * hash (content ⊕ ordinal — see the companion note on retry semantics),
    * replicate the small side `buckets`×, and join on (key, salt) — a hot
    * key's rows land on `buckets` reducers instead of one. Exact same
    * result set as the plain join (every big row meets every matching
    * small row exactly once, at its own salt).
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
      buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      saltCol(Seq(struct(big.columns.map(col): _*)), buckets))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    saltedBig
      .join(replicated,
        bigKey === smallKey && saltedBig("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
