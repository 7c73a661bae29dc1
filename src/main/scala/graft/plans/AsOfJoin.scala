package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * right.ts <= left.ts for the same key (the "snapshot the dimension as of
  * the fact's time" operator CDC consumers need; Spark has no native ASOF).
  *
  * Implementation is the merge-sorted union trick, not a range cross-join:
  * tag both sides, union, sort within key by (ts, side) and carry the last
  * seen right row forward with last_value(ignoreNulls) — one shuffle on the
  * key, O(n log n) per key, no row explosion. This is the plan shape that
  * survives 100 TB: a theta/range join would be O(L×R) per key; this is
  * linear after the sort, and the shuffle key is the equi-key.
  *
  * Cited shape: reference applies changes strictly in order per key
  * (consumer poll loop, consumer.py:54-75) — an as-of lookup is the batch
  * dual of that replay cursor.
  */
object AsOfJoin {

  /** leftTs/rightTs must be the same orderable type. Right payload columns
    * are returned with their own names (caller aliases beforehand).
    * Inner semantics: left rows with no earlier right row are dropped when
    * `inner = true`, kept with nulls otherwise.
    */
  def nearestEarlier(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      inner: Boolean = false): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(c => c == key || c == rightTs)

    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((Seq(col(key).as("_key"), col("_ts"), col("_side")) ++
        lCols.map(c => col(c).as(s"_l_$c")) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))): _*)
    val rTagged = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((Seq(col(key).as("_key"), col("_ts"), col("_side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        rCols.map(c => col(c).as(s"_r_$c"))): _*)

    // rights sort before lefts at equal ts (_side 0 < 1) → "at or before"
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select((Seq(col("_key"), col("_ts"), col("_side")) ++
        lCols.map(c => col(s"_l_$c")) ++
        rCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_r_$c"))): _*)
      .filter(col("_side") === 1)

    val out = carried.select(
      (lCols.map(c => col(s"_l_$c").as(c)) ++
        rCols.map(c => col(s"_r_$c").as(c))): _*)
    if (inner) out.filter(rCols.map(c => col(c).isNotNull).reduce(_ || _)) else out
  }
}
