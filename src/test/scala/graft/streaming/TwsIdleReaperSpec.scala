package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Watermark-driven state expiry: keys idle past the gap emit a final
  * tombstone and their state clears; stale timers from earlier updates
  * no-op; a reaped key that re-arrives starts fresh. All event-time —
  * watermark advancement is the only clock, so the test is deterministic.
  */
class TwsIdleReaperSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String =
    envL(op, id, name, ts, ts)

  private def envL(op: String, id: Long, name: String, ts: Long, lsn: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$lsn},"op":"$op","ts_ms":$ts}}"""
  }

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("same-millisecond successor by lsn updates the name carried to the tombstone") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-reaper2").toString
      val stream = MemoryStream[String]
      // 10 s watermark delay: batch 2's same-millisecond event must reach
      // the processor (with 0 delay the watermark is already AT 1000 after
      // batch 1 and the engine drops the row before the state guard runs)
      val q = TwsIdleReaper.run(Envelope.decode(stream.toDF()), gapMs = 1000L,
          watermarkDelay = "10 seconds")
        .writeStream.format("memory").queryName("reaper2")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      def rows() = spark.table("reaper2")
        .as[TwsIdleReaper.Reaped].collect().toSeq
      try {
        stream.addData(envL("c", 1, "a1", 1000, 1))
        q.processAllAvailable()
        // same millisecond, higher lsn — a genuine successor (e.g. two
        // DMLs in one transaction): a ts-only guard discards it and the
        // key's live row AND final tombstone carry the superseded name
        stream.addData(envL("u", 1, "a2", 1000, 2))
        q.processAllAvailable()
        val live = rows().filter(r => r.id == 1L && !r.expired).last
        assert(live.name == "a2", live.toString)
        // equal (ts, lsn) replay must still be stale
        stream.addData(envL("u", 1, "a1", 1000, 2))
        q.processAllAvailable()
        assert(rows().filter(r => r.id == 1L && !r.expired).last.name == "a2")
        // advance the watermark (= max event time - 10 s) past 1000+gap:
        // the tombstone has the lsn-2 name
        stream.addData(envL("c", 9, "x", 15000, 9))
        q.processAllAvailable()
        val dead = rows().filter(r => r.id == 1L && r.expired)
        assert(dead.map(_.name) == Seq("a2"), dead.toString)
      } finally q.stop()
    }
  }

  test("a redelivered pre-reap event cannot resurrect a reaped key") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-reaper3").toString
      val stream = MemoryStream[String]
      // huge watermark delay: the redelivered event is NOT dropped by the
      // engine's late-record filter, so the reapedAt guard itself must
      // hold — the code must not rely on late filtering it doesn't pin
      val q = TwsIdleReaper.run(Envelope.decode(stream.toDF()), gapMs = 1000L,
          watermarkDelay = "1000 seconds")
        .writeStream.format("memory").queryName("reaper3")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      def rows() = spark.table("reaper3")
        .as[TwsIdleReaper.Reaped].collect().toSeq
      try {
        stream.addData(envL("c", 1, "old", 1000, 1))
        q.processAllAvailable()
        // advance the watermark (maxEvent - 1000 s) past 1000 + gap
        stream.addData(envL("c", 9, "x", 1005000, 9))
        q.processAllAvailable()
        assert(rows().exists(r => r.id == 1L && r.expired), rows().toString)
        val before = rows().size
        // at-least-once redelivery of the pre-reap event, post-tombstone:
        // must NOT recreate state or emit a live row
        stream.addData(envL("c", 1, "old", 1000, 1))
        q.processAllAvailable()
        val after = rows()
        assert(after.size == before, s"resurrected: ${after.drop(before)}")
        // a genuinely NEW event (strictly later) revives the key
        stream.addData(envL("u", 1, "new", 1006000, 10))
        q.processAllAvailable()
        val live = rows().filter(r => r.id == 1L && !r.expired).last
        assert(live.name == "new" && live.last_ts == 1006000L, live.toString)
      } finally q.stop()
    }
  }

  test("tombstone GC: the resurrection guard clears once the watermark passes the horizon") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-reaper4").toString
      val stream = MemoryStream[String]
      // gap 1 s, tombstone horizon 10 s. The engine late-filters input
      // below the watermark before it reaches the processor, so a
      // post-GC resurrection can't be observed through OUTPUT rows (any
      // event surviving the filter is strictly newer than the tombstone
      // and revives legitimately); the observable is STATE SIZE — without
      // GC every reaped key leaves a tombstone row forever, with GC the
      // store holds only live keys + tombstones inside their horizon.
      val q = TwsIdleReaper.run(Envelope.decode(stream.toDF()), gapMs = 1000L,
          watermarkDelay = "1000 seconds", tombstoneHorizonMs = 10000L)
        .writeStream.format("memory").queryName("reaper4")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      def rows() = spark.table("reaper4")
        .as[TwsIdleReaper.Reaped].collect().toSeq
      def stateRows(): Long = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).last
      try {
        stream.addData(envL("c", 1, "old", 1000, 1))
        q.processAllAvailable()
        // wm → 3000 (> 1000 + gap): key 1 reaps; its GC bar sits at
        // 1000 + 1000 + 10000 = 12000, ahead of the watermark
        stream.addData(envL("c", 9, "x", 1003000, 9))
        q.processAllAvailable()
        assert(rows().exists(r => r.id == 1L && r.expired))
        // wm → 20000 (> 12000): key 1's GC timer clears its tombstone;
        // key 9 reaps (bar 1014000 still pending); key 10 live
        stream.addData(envL("c", 10, "y", 1020000, 10))
        q.processAllAvailable()
        // wm → 1000000 (< k9's bar 1014000): k9's tombstone still held
        stream.addData(envL("c", 11, "z", 2000000, 11))
        q.processAllAvailable()
        // wm → 2100000: k9's tombstone GCs; k10 (1021000) and k11
        // (2001000) reap, their bars (1031000 / 2012000) pending
        stream.addData(envL("c", 12, "w", 3100000, 12))
        q.processAllAvailable()
        // wm → 3000000: k10's and k11's tombstones GC; k12 (bar 3101000)
        // and k13 stay live
        stream.addData(envL("c", 13, "v", 4000000, 13))
        q.processAllAvailable()
        assert(rows().count(_.expired) == 4, rows().filter(_.expired).toString)
        // surviving state: exactly the two live keys (k12, k13) — every
        // tombstone (k1, k9, k10, k11) has been GC'd. Without the GC
        // timer numRowsTotal would be 6.
        assert(stateRows() == 2L, s"state rows = ${stateRows()}")
      } finally q.stop()
    }
  }

  test("idle keys reap when the watermark passes last_ts + gap; re-arrival starts fresh") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-reaper").toString
      val stream = MemoryStream[String]
      val q = TwsIdleReaper.run(Envelope.decode(stream.toDF()), gapMs = 1000L)
        .writeStream.format("memory").queryName("reaper")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      def rows() = spark.table("reaper")
        .as[TwsIdleReaper.Reaped].collect().toSeq
      try {
        // batch 1: keys 1 and 2; watermark after this batch = 1500 —
        // below both timers (2000, 2500), nothing expires
        stream.addData(env("c", 1, "a1", 1000), env("c", 2, "b1", 1500))
        q.processAllAvailable()
        assert(rows().forall(!_.expired))
        // batch 2: key 2 updates at 2500 (current timer now 3500). The
        // watermark advances to 2500 and the engine's follow-up timer
        // batch fires: key 1 (timer 2000) reaps; key 2's STALE 2500
        // timer also fires but must no-op against its 3500 current.
        stream.addData(env("u", 2, "b2", 2500))
        q.processAllAvailable()
        val reaped2 = rows().filter(_.expired)
        assert(reaped2.map(_.id) == Seq(1L), reaped2.toString)
        assert(reaped2.head.last_ts == 1000L && reaped2.head.name == "a1")
        // batch 3: watermark → 5000 ≥ key 2's 3500 → key 2 reaps
        stream.addData(env("c", 3, "c1", 5000))
        q.processAllAvailable()
        assert(rows().filter(_.expired).map(_.id).sorted == Seq(1L, 2L))
        // batch 4: reaped key 1 re-arrives and must start FRESH; the
        // watermark reaching 6000 also reaps idle key 3 (timer 6000)
        stream.addData(env("u", 1, "a2", 6000))
        q.processAllAvailable()
        assert(rows().filter(_.expired).map(_.id).sorted == Seq(1L, 2L, 3L))
        val live1 = rows().filter(r => r.id == 1L && !r.expired).maxBy(_.last_ts)
        assert(live1.last_ts == 6000L && live1.name == "a2")
      } finally q.stop()
    }
  }
}
