package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ListState, MapState, ValueState}

/** Column-level CDC audit on transformWithState composite state — the two
  * typed state shapes [[TwsVersionTracker]] doesn't cover:
  *
  *  - [[FieldAudit]] (`MapState[field, ts]`): per KEY, per FIELD, when did
  *    that column last change — the column-lineage audit ("who moved
  *    acctbal and when") a replication operator is asked for. The CDC 'u'
  *    envelope here carries only `after` (before = null, matching the
  *    generated log), so the previous row is held in a ValueState and
  *    diffed field-by-field; only fields that actually changed update
  *    their map entry.
  *  - [[RecentVersions]] (`ListState[Long]`): per key, a bounded ring of
  *    the last N version timestamps — the "recent history" window kept
  *    resident without growing with key lifetime (the ListState is
  *    cleared and rewritten with the trimmed tail, so state per key is
  *    O(N), not O(versions)).
  *
  * Both RocksDB-resident; both O(changed keys) per micro-batch.
  */
object TwsChangeAudit {

  final case class RowSnap(name: String, nationkey: Option[Int],
      acctbal: Option[Double], mktsegment: String)

  final case class FieldChange(id: Long, field: String, changed_ts: Long)

  /** Last applied CDC log position for a key — the stale-replay guard's
    * memory. Kept in its OWN ValueState (not folded into [[RowSnap]])
    * because a delete clears the row snapshot but must NOT forget the
    * position: a replayed pre-delete event would otherwise diff against
    * an empty snapshot and re-mark every field with an older ts. */
  final case class Applied(ts: Long, lsn: Long)

  /** MapState per-field audit. */
  class FieldAudit extends StatefulProcessor[Long, StatefulUpsert.Change, FieldChange] {
    @transient private var lastRow: ValueState[RowSnap] = _
    @transient private var fieldTs: MapState[String, Long] = _
    @transient private var applied: ValueState[Applied] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastRow = getHandle.getValueState[RowSnap](
        "lastRow", Encoders.product[RowSnap], TTLConfig.NONE)
      fieldTs = getHandle.getMapState[String, Long](
        "fieldTs", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      applied = getHandle.getValueState[Applied](
        "applied", Encoders.product[Applied], TTLConfig.NONE)
    }

    private def fields(c: StatefulUpsert.Change): Map[String, Any] = Map(
      "name" -> c.name, "nationkey" -> c.nationkey,
      "acctbal" -> c.acctbal, "mktsegment" -> c.mktsegment)

    override def handleInputRows(
        key: Long,
        rows: Iterator[StatefulUpsert.Change],
        timerValues: TimerValues): Iterator[FieldChange] = {
      val ordered = rows.toSeq.sortBy(c => (c.ts_ms, c.lsn.getOrElse(0L)))
      var out = List.empty[FieldChange]
      var pos = Option(applied.get()).getOrElse(Applied(Long.MinValue, Long.MinValue))
      ordered.foreach { c =>
        val lsn = c.lsn.getOrElse(0L)
        if (c.ts_ms < pos.ts || (c.ts_ms == pos.ts && lsn <= pos.lsn)) {
          // stale replay (at-least-once): already applied — do not diff,
          // do not regress lastRow/fieldTs
        } else if (c.op == "d") {
          pos = Applied(c.ts_ms, lsn)
          // a delete changes every field (to absent); audit keeps the map
          // but the row snapshot clears so a re-insert re-marks all fields
          lastRow.clear()
        } else {
          pos = Applied(c.ts_ms, lsn)
          val prev = Option(lastRow.get())
          val changed = prev match {
            case None => fields(c).keys.toSeq // first sighting: all fields
            case Some(p) =>
              val pf = fields(StatefulUpsert.Change(
                key, p.name, p.nationkey, p.acctbal, p.mktsegment, "u", 0L, None))
              fields(c).collect { case (k, v) if pf(k) != v => k }.toSeq
          }
          changed.foreach(f => fieldTs.updateValue(f, c.ts_ms))
          lastRow.update(RowSnap(c.name, c.nationkey, c.acctbal, c.mktsegment))
          out = out ++ changed.map(f => FieldChange(key, f, c.ts_ms))
        }
      }
      applied.update(pos)
      out.iterator
    }
  }

  final case class VersionWindow(id: Long, n_kept: Int, oldest_ts: Long, newest_ts: Long)

  /** ListState bounded version ring (last `keep` versions per key). */
  class RecentVersions(keep: Int) extends StatefulProcessor[Long, StatefulUpsert.Change, VersionWindow] {
    @transient private var ring: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState[(Long, Long)](
        "ring", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[StatefulUpsert.Change],
        timerValues: TimerValues): Iterator[VersionWindow] = {
      val incoming = rows.toSeq.map(c => (c.ts_ms, c.lsn.getOrElse(0L))).sorted
      if (incoming.isEmpty) return Iterator.empty
      // distinct on (ts, lsn), NOT bare ts: a redelivered event (same ts
      // AND lsn) must not evict a genuine older version from the window,
      // but two REAL versions sharing a millisecond (update then delete —
      // distinct lsn) are distinct history and must both count
      val kept = (ring.get().toSeq ++ incoming).distinct.sorted.takeRight(keep)
      ring.clear()
      ring.appendList(kept.toArray)
      Iterator.single(VersionWindow(key, kept.size, kept.head._1, kept.last._1))
    }
  }

  def runFieldAudit(decoded: DataFrame): Dataset[FieldChange] = {
    val s = decoded.sparkSession
    import s.implicits._
    StatefulUpsert.toChanges(decoded)
      .groupByKey(_.id)
      .transformWithState(new FieldAudit, TimeMode.None(), OutputMode.Update())
  }

  def runRecentVersions(decoded: DataFrame, keep: Int = 3): Dataset[VersionWindow] = {
    val s = decoded.sparkSession
    import s.implicits._
    StatefulUpsert.toChanges(decoded)
      .groupByKey(_.id)
      .transformWithState(new RecentVersions(keep), TimeMode.None(), OutputMode.Update())
  }
}
