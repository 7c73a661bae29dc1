package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** transformWithState version ledger: cross-micro-batch accumulation,
  * stale-replay guard, and the batch dual — under the RocksDB provider
  * the API requires (also the repo's pinned 100 TB state contract).
  */
class TwsVersionTrackerSpec extends SparkSpec {
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

  test("ledger accumulates across micro-batches; delete flips alive; replay is ignored") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-tws").toString
      val stream = MemoryStream[String]
      val q = TwsVersionTracker.run(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("tws_ledger")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(env("c", 1, "a1", 100), env("c", 2, "b1", 110))
        q.processAllAvailable()
        stream.addData(env("u", 1, "a2", 200), env("d", 2, "b1", 210))
        q.processAllAvailable()
        // batch 3: one fresh update for key 1 + a stale REPLAY of its batch-2
        // event (at-least-once delivery) — the replay must not count
        stream.addData(env("u", 1, "a3", 300), env("u", 1, "a2", 200))
        q.processAllAvailable()
        val rows = spark.table("tws_ledger")
          .as[TwsVersionTracker.LedgerRow].collect()
          .groupBy(_.id).map { case (k, v) => k -> v.maxBy(_.last_ts) }
        val k1 = rows(1L)
        assert(k1.versions == 3 && k1.upserts == 3 && k1.deletes == 0)
        assert(k1.alive && k1.last_ts == 300L)
        val k2 = rows(2L)
        assert(k2.versions == 2 && k2.upserts == 1 && k2.deletes == 1)
        assert(!k2.alive && k2.last_ts == 210L)
      } finally q.stop()
    }
  }

  test("same-millisecond successor ordered by lsn applies; same-(ts,lsn) replay does not") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-tws-lsn").toString
      val stream = MemoryStream[String]
      val q = TwsVersionTracker.run(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("tws_lsn")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(envL("u", 1, "a1", 200, 5))
        q.processAllAvailable()
        // a delete right after the update, SAME millisecond, higher lsn —
        // the CDC log's real ordering; a ts-only guard drops it as a
        // replay and the key stays alive with an undercounted ledger
        stream.addData(envL("d", 1, "a1", 200, 6))
        q.processAllAvailable()
        // genuine replay: the same (ts, lsn) position redelivered — must NOT count
        stream.addData(envL("d", 1, "a1", 200, 6))
        q.processAllAvailable()
        val k1 = spark.table("tws_lsn")
          .as[TwsVersionTracker.LedgerRow].collect().maxBy(_.versions)
        assert(k1.versions == 2 && k1.upserts == 1 && k1.deletes == 1, k1.toString)
        assert(!k1.alive && k1.last_ts == 200L, k1.toString)
      } finally q.stop()
    }
  }

  test("ledger equals the batch dual over the generated CDC log") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val events = graft.cdc.ChangeGen.changeEvents(spark, sfDir)
        .filter($"value".isNotNull).select("value").as[String].collect().toSeq
      val (h1, h2) = events.splitAt(events.size / 2)
      val ck = Files.createTempDirectory("graft-tws2").toString
      val stream = MemoryStream[String]
      val q = TwsVersionTracker.run(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("tws_dual")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        Seq(h1, h2).foreach { h => stream.addData(h: _*); q.processAllAvailable() }
        val got = spark.table("tws_dual")
          .as[TwsVersionTracker.LedgerRow].collect()
          .groupBy(_.id).map { case (k, v) => v.maxBy(_.last_ts) }
          .map(r => (r.id, r.versions, r.deletes, r.alive)).toSet
        // batch dual: fold the whole decoded log per key in (ts, lsn) order
        val dual = StatefulUpsert.toChanges(
          Envelope.decode(events.toDF("value")))
          .collect().groupBy(_.id).map { case (id, cs) =>
            val ordered = cs.sortBy(c => (c.ts_ms, c.lsn.getOrElse(0L)))
            (id, ordered.size.toLong,
              ordered.count(_.op == "d").toLong, ordered.last.op != "d")
          }.toSet
        assert(got == dual)
      } finally q.stop()
    }
  }
}
