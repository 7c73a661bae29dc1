package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** TTL-evicted per-key counter — the last transformWithState state-API
  * surface the repo exercises (ValueState/MapState/ListState/event-time
  * timers are covered by the sibling Tws* operators): `TTLConfig` attaches
  * a processing-time time-to-live to the STATE VALUE itself, and the store
  * treats an expired value as absent on read — no timer bookkeeping, no
  * explicit clear. This is the hot-key cache discipline: per-key activity
  * counts that self-evict once a key goes cold, so state is bounded by the
  * working set, not by every key ever seen.
  *
  * Contrast with [[TwsIdleReaper]]: the reaper is WATERMARK-driven
  * (deterministic, replayable — the right tool for semantics) and emits a
  * final tombstone; TTL is wall-clock-driven GC with no emission — the
  * right tool when eviction is a resource bound, not an output. TTL
  * requires `TimeMode.ProcessingTime`.
  *
  * Emitted `resumed=true` means the key still had live (unexpired) state
  * when the event arrived — the observable that lets a spec pin eviction:
  * after sleeping past the TTL, a key's next event sees `resumed=false`
  * and its count restarts.
  *
  * Scale shape: state is O(active keys within TTL window) in RocksDB —
  * strictly smaller than the O(all keys) the untimed variants hold.
  */
object TwsTtlCounter {

  final case class Seen(id: Long, count: Long, resumed: Boolean)

  class Counter(ttl: java.time.Duration)
      extends StatefulProcessor[Long, StatefulUpsert.Change, Seen] {
    @transient private var count: ValueState[Long] = _
    // high-water (ts_ms, lsn) mark under the SAME TTL: at-least-once
    // redeliveries must not inflate the count — every sibling operator
    // dedups by this tuple; the counter was the one observable that
    // didn't.
    // ASSUMPTION (load-bearing): per-key delivery is (ts_ms, lsn)-
    // monotone modulo redelivery — the CDC log is a per-key totally
    // ordered stream (Debezium per-partition ordering), so any event at
    // or below the mark IS a redelivery. A source that reorders first
    // deliveries within a key would have genuinely-new events silently
    // uncounted; defending against that would need a bounded
    // recently-seen set instead of a single high-water mark.
    @transient private var mark: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long](
        "count", Encoders.scalaLong, TTLConfig(ttl))
      mark = getHandle.getValueState[(Long, Long)](
        "mark", Encoders.product[(Long, Long)], TTLConfig(ttl))
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[StatefulUpsert.Change],
        timerValues: TimerValues): Iterator[Seen] = {
      // exists() is the TTL observable: an expired value reads as absent
      val resumed = count.exists()
      val prev =
        if (resumed && mark.exists()) mark.get()
        else (Long.MinValue, Long.MinValue)
      val fresh = rows.toSeq
        .map(c => (c.ts_ms, c.lsn.getOrElse(0L)))
        .filter(t => t._1 > prev._1 || (t._1 == prev._1 && t._2 > prev._2))
      val n = (if (resumed) count.get() else 0L) + fresh.size
      count.update(n) // re-arms the TTL clock for this key
      if (fresh.nonEmpty) mark.update(fresh.max)
      Iterator.single(Seen(key, n, resumed))
    }
  }

  /** Wire a decoded change stream through the TTL counter. RocksDB-only
    * (transformWithState contract); `TimeMode.ProcessingTime` is REQUIRED
    * by TTLConfig — which also means `processAllAvailable` cannot drive a
    * test (the engine keeps scheduling processing-time work and the call
    * never settles); drive with `Trigger.AvailableNow` + awaitTermination
    * instead (see TwsTtlSpec). */
  def run(decoded: DataFrame, ttl: java.time.Duration): Dataset[Seen] = {
    val s = decoded.sparkSession
    import s.implicits._
    StatefulUpsert.toChanges(decoded)
      .groupByKey(_.id)
      .transformWithState(new Counter(ttl), TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
