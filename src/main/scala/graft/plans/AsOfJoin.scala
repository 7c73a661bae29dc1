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
    val working = Seq("_key", "_ts", "_side", "_r")
    require(!(lCols ++ right.columns).exists(working.contains),
      s"as-of join working names ${working.mkString(", ")} collide with an " +
        "input column — rename it first (the native variant rejects this too)")

    // the whole right row travels as ONE struct: a null in one payload
    // column can then never be backfilled from an OLDER right row (the
    // per-column last(ignoreNulls) frankenrow), and "did any right row
    // match" is simply _r IS NOT NULL — sound even for all-null payloads
    // or a payload-less existence join. The struct leads with the right
    // ts, which the null filter below guarantees non-null.
    val rStruct = org.apache.spark.sql.types.StructType(
      right.schema(rightTs).copy(name = "_rts") +:
        rCols.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select((Seq(col(key).as("_key"), col("_ts"), col("_side")) ++
        lCols.map(c => col(c).as(s"_l_$c")) :+
        lit(null).cast(rStruct).as("_r")): _*)
    val rTagged = right
      // SQL semantics: right.ts <= left.ts is never true for a null ts,
      // and a null key equi-matches nothing — such rows can't contribute
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select((Seq(col(key).as("_key"), col("_ts"), col("_side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) :+
        struct(col(rightTs).as("_rts") +: rCols.map(col): _*).as("_r")): _*)

    // rights sort before lefts at equal ts (_side 0 < 1) → "at or before";
    // a null LEFT ts sorts first, sees no right row, and gets no match
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select((Seq(col("_side")) ++
        lCols.map(c => col(s"_l_$c")) :+
        last(col("_r"), ignoreNulls = true).over(w).as("_r")): _*)
      .filter(col("_side") === 1)

    val matched = if (inner) carried.filter(col("_r").isNotNull) else carried
    matched.select(
      (lCols.map(c => col(s"_l_$c").as(c)) ++
        rCols.map(c => col("_r").getField(c).as(c))): _*)
  }
}
