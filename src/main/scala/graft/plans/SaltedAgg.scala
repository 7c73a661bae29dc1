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
  * of the whole row (spreads uniformly, no RNG state, deterministic).
  */
object SaltedAgg {

  /** sums/counts per key, salted. aggs maps output column name → (partial
    * expression over the input, final merge over the partial column). */
  def sumCountByKey(
      df: DataFrame,
      key: Column,
      buckets: Int,
      sums: Map[String, Column] = Map.empty): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(xxhash64(struct(df.columns.map(col): _*)), lit(buckets)))
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
}
