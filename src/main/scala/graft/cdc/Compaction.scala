package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC latest-state compaction — the batch/declarative replacement for the
  * reference's one-row-at-a-time INSERT/UPDATE/DELETE replay
  * (postgres.py:115-224 dispatched by postgres.py:250-261).
  *
  * Semantics: for each key, the change with the greatest (ts_ms, lsn) wins;
  * if that winner is a delete ('d') the key is absent from the snapshot,
  * otherwise the snapshot row is the winner's `after` image. This is
  * exactly "replay the log in order" folded into one relational pass —
  * c/r/u all write `after` (postgres.py:134-145, 171-186), d removes by key
  * (postgres.py:212-220).
  *
  * Scale: one shuffle on the key (the same partitioning Kafka would give a
  * keyed topic), ranking window + filter — no global sort, no driver state.
  * At 100 TB the win over row-at-a-time replay is the whole point of doing
  * CDC compaction in Spark; skewed keys are bounded because each key keeps
  * only its own changes.
  */
object Compaction {

  /** decoded change events → the latest (ts_ms, lsn) change per key,
    * deletes INCLUDED, `_key` attached. The single ranking both snapshot
    * compaction and the live JDBC replica consume — one definition so the
    * two paths can never diverge on a tie-break. */
  def latestChangePerKey(decoded: DataFrame): DataFrame = {
    val keyed = decoded.withColumn("_key", Envelope.keyCol)
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("ts_ms").desc, col("source.lsn").desc_nulls_last)
    keyed
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
  }

  /** decoded change events (before/after/op/ts_ms[, source.lsn]) → latest
    * surviving row per key, `after.*` flattened. */
  def latestState(decoded: DataFrame): DataFrame =
    latestChangePerKey(decoded)
      .filter(col("op") =!= "d")
      .select(col("after.*"))
}
