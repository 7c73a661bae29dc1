package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event-time state expiry on transformWithState timers — the state-GC
  * half of the 100 TB streaming-state story: keyed state that only grows
  * is a memory leak at scale; here every key's state carries an event-time
  * timer at (last event + gap), and when the WATERMARK passes it the key
  * emits a final tombstone row and clears its state. Watermark-driven, so
  * expiry is deterministic and replayable (no wall-clock in the loop) —
  * the same eviction discipline Spark's own streaming dedup and
  * stream-stream joins apply, exposed for custom per-key state.
  *
  * Timer discipline: timers accumulate per key (one per update) and Spark
  * fires each when the watermark passes it; only the one matching the
  * key's CURRENT (lastTs + gap) reaps — earlier ones are stale and no-op,
  * which avoids a delete-timer round trip per update.
  *
  * Reference behavior target: bounded consumer-side state for keys that
  * stopped changing (the reference's applier holds no state at all — the
  * Spark translation must actively bound what it adds).
  */
object TwsIdleReaper {

  final case class LastSeen(ts: Long, lsn: Long, name: String)

  /** `expired=false` rows are live updates; `expired=true` is the key's
    * final emission before its state is dropped. */
  final case class Reaped(id: Long, last_ts: Long, name: String, expired: Boolean)

  /** Change row with the watermarked event-time column retained (the
    * watermark node must reach the stateful operator). */
  final case class TimedChange(
      id: Long, name: String, op: String, ts_ms: Long, lsn: Option[Long],
      ts: java.sql.Timestamp)

  /** `tombstoneHorizonMs` bounds how long a reaped key's resurrection
    * guard lives: redeliveries are only defended against within this
    * event-time window after the reap (default 4× the idle gap — size it
    * to the source's at-least-once redelivery horizon). A redelivery
    * arriving LATER than the horizon can resurrect the key; unbounded
    * defense would mean unbounded tombstone state, the exact leak this
    * operator exists to prevent. */
  class Reaper(gapMs: Long, tombstoneHorizonMs: Long = -1L)
      extends StatefulProcessor[Long, TimedChange, Reaped] {
    private val horizonMs =
      if (tombstoneHorizonMs >= 0) tombstoneHorizonMs else 4 * gapMs
    @transient private var last: ValueState[LastSeen] = _
    // survives the reap's clear (the FieldAudit separate-position
    // discipline): an at-least-once redelivery of a PRE-reap event
    // arriving after the tombstone would otherwise recreate the key with
    // stale data and emit a live row after the "final emission". Bounded:
    // a GC timer at (reap ts + gap + horizon) clears the tombstone once
    // the watermark passes the redelivery horizon. (TTLConfig cannot
    // bound this state — TTL requires TimeMode.ProcessingTime and this
    // processor is event-time; the GC timer is also deterministic and
    // replayable where a wall-clock TTL is not.)
    @transient private var reapedAt: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      last = getHandle.getValueState[LastSeen](
        "last", Encoders.product[LastSeen], TTLConfig.NONE)
      reapedAt = getHandle.getValueState[(Long, Long)](
        "reapedAt", Encoders.product[(Long, Long)], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[TimedChange],
        timerValues: TimerValues): Iterator[Reaped] = {
      val batch = rows.toSeq
      if (batch.isEmpty) return Iterator.empty
      val newest = batch.maxBy(c => (c.ts_ms, c.lsn.getOrElse(0L)))
      val newLsn = newest.lsn.getOrElse(0L)
      Option(reapedAt.get()) match {
        case Some((rts, rlsn)) if newest.ts_ms < rts ||
            (newest.ts_ms == rts && newLsn <= rlsn) =>
          // redelivery of an event the reap already covered — a genuinely
          // NEW event (strictly later) legitimately revives the key
          return Iterator.empty
        case _ => ()
      }
      val st = Option(last.get()) match {
        // stale replay only when NOT strictly newer by (ts, lsn) — the
        // same tuple the maxBy above orders on; ts alone would discard a
        // same-millisecond successor and tombstone the superseded name
        case Some(cur) if cur.ts > newest.ts_ms ||
            (cur.ts == newest.ts_ms && cur.lsn >= newLsn) => cur
        case _ => LastSeen(newest.ts_ms, newLsn, newest.name)
      }
      last.update(st)
      getHandle.registerTimer(st.ts + gapMs)
      Iterator.single(Reaped(key, st.ts, st.name, expired = false))
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Reaped] =
      Option(last.get()) match {
        case Some(st) if expiredTimerInfo.getExpiryTimeInMs >= st.ts + gapMs =>
          reapedAt.update((st.ts, st.lsn)) // the resurrection guard
          // tombstone GC: once the watermark passes the redelivery
          // horizon, the guard itself is reaped (see below)
          getHandle.registerTimer(st.ts + gapMs + horizonMs)
          last.clear() // this key's CURRENT timer — reap
          Iterator.single(Reaped(key, st.ts, st.name, expired = true))
        case None =>
          // no live state: either a stale pre-reap timer (expiry below
          // the GC bar — no-op) or the tombstone-GC timer. Clear only
          // when the expiry covers the CURRENT tombstone's horizon: a
          // revive-and-re-reap cycle moves reapedAt forward, so an old
          // GC timer (lower expiry) never clears the newer tombstone.
          Option(reapedAt.get()) match {
            case Some((rts, _)) if expiredTimerInfo.getExpiryTimeInMs >=
                rts + gapMs + horizonMs =>
              reapedAt.clear()
            case _ => ()
          }
          Iterator.empty
        case _ => Iterator.empty // stale timer from an earlier update
      }
  }

  /** Wire a decoded change stream through the reaper. `watermarkDelay` is
    * the allowed event-time lateness; `gapMs` the idle gap before a key's
    * state is reaped. Requires the RocksDB state store. */
  def run(decoded: DataFrame, gapMs: Long,
      watermarkDelay: String = "0 milliseconds",
      tombstoneHorizonMs: Long = -1L): Dataset[Reaped] = {
    val s = decoded.sparkSession
    import s.implicits._
    decoded.select(
        coalesce(col("after.id"), col("before.id")).as("id"),
        coalesce(col("after.name"), col("before.name")).as("name"),
        col("op"), col("ts_ms"), col("source.lsn").as("lsn"),
        timestamp_millis(col("ts_ms")).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[TimedChange]
      .groupByKey(_.id)
      .transformWithState(new Reaper(gapMs, tombstoneHorizonMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
