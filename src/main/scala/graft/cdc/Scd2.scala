package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from the CDC log — the natural
  * companion to [[Compaction.latestState]]: instead of keeping only each
  * key's winner, keep EVERY version with its validity interval.
  *
  * The reference replays changes destructively (UPDATE overwrites, DELETE
  * removes — postgres.py:152-224), losing history. A warehouse-grade CDC
  * consumer materializes the same log as SCD2: one row per (key, version),
  * `valid_from` = the change's timestamp, `valid_to` = the NEXT change's
  * timestamp for that key (any op, including the delete that closes the
  * final interval), `is_current` when no later change exists.
  *
  * Scale: identical shuffle profile to compaction — one hash partition on
  * the key, one window pass. No self-join: `lead()` over the per-key
  * sequence closes intervals in a single pass, which is the idiomatic
  * Spark rewrite of the pairwise "match each version with its successor"
  * join. At 100 TB of log this is the same cost as the snapshot itself.
  */
object Scd2 {

  /** decoded change events → one row per surviving version with
    * [valid_from, valid_to) validity and an is_current flag. Delete events
    * emit no row but still close the previous version's interval. */
  def history(decoded: DataFrame): DataFrame = {
    val keyed = decoded.withColumn("_key", Envelope.keyCol)
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("ts_ms"), col("source.lsn"))
    keyed
      .withColumn("valid_to", lead(col("ts_ms"), 1).over(w))
      .filter(col("op") =!= "d")
      .select(col("after.*"),
        col("ts_ms").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Point-in-time lookup against the SCD2 history: the version whose
    * validity interval contains `ts`. Same result as compacting a
    * time-filtered log ([[CdcQueries.snapshotAsOf]]) but O(1) per key once
    * the history table is materialized — the standard warehouse pattern
    * for repeated time-travel queries. */
  def asOf(history: DataFrame, ts: Long): DataFrame =
    history.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || col("valid_to") > ts))
}
