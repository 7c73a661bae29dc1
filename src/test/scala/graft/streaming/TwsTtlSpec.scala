package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** TTLConfig state eviction — the transformWithState surface a
  * processAllAvailable harness cannot drive: TTL requires
  * TimeMode.ProcessingTime, and under that mode the engine never settles
  * (it keeps scheduling processing-time work, so BOTH processAllAvailable
  * AND Trigger.AvailableNow's run-to-completion hang — measured here).
  * Drive instead: a running ProcessingTime query, poll a foreachBatch
  * collector until the pass's rows land, stop, restart on the SAME
  * checkpoint + MemoryStream. Eviction is wall-clock by design, so the positive test
  * sleeps a real interval; the control runs the same drive with a long
  * TTL so only the eviction itself differs. */
class TwsTtlSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Process everything pending in `stream` through one query incarnation:
    * start on the shared checkpoint, poll the collector until `expect`
    * rows land or 60 s pass, stop. Returns the pass's emitted rows. A
    * foreachBatch collector, not a memory sink — the memory sink refuses
    * to recover from an existing checkpoint, and the restart IS the test. */
  private def runPass(stream: MemoryStream[String], ttl: java.time.Duration,
      ck: String, expect: Int): Seq[TwsTtlCounter.Seen] = {
    val acc = new scala.collection.mutable.ArrayBuffer[TwsTtlCounter.Seen]
    val q = TwsTtlCounter.run(Envelope.decode(stream.toDF()), ttl)
      .writeStream
      .option("checkpointLocation", ck)
      .outputMode("update").trigger(Trigger.ProcessingTime(50))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[TwsTtlCounter.Seen], _: Long) =>
        val rows = b.collect()
        acc.synchronized { acc ++= rows }; ()
      }
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (acc.synchronized(acc.size) < expect && System.nanoTime() < deadline)
        Thread.sleep(50)
      val got = acc.synchronized(acc.toSeq)
      assert(got.size >= expect, s"timed out waiting for $expect rows, got $got")
      // The collector sees rows DURING the micro-batch, before its
      // offsets/state commit — stopping here can abort the commit, and the
      // next incarnation then REPLAYS the batch from prior state (observed
      // as a suite-context flake: the control pass returned the replayed
      // count=1/resumed=false row instead of the resumed one). Progress
      // events post only after a batch fully commits, so wait until the
      // committed input rows cover this pass's data before stopping.
      while (q.recentProgress.map(_.numInputRows).sum < expect &&
          System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(q.recentProgress.map(_.numInputRows).sum >= expect,
        "timed out waiting for the data batch to commit")
      got
    } finally q.stop()
  }

  test("state expires after the TTL: the key restarts cold, a fresh key is unaffected") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-ttl").toString
      val stream = MemoryStream[String]
      val ttl = java.time.Duration.ofMillis(1500)

      stream.addData(env("c", 1, "a1", 100))
      val first = runPass(stream, ttl, ck, expect = 1)
      assert(first == Seq(TwsTtlCounter.Seen(1L, 1L, resumed = false)), first.toString)

      Thread.sleep(2500) // wall-clock past the TTL — eviction is processing-time GC

      // key 1 must read as ABSENT (evicted) and restart cold; key 2 is a
      // fresh key and must be indistinguishable from any first arrival
      stream.addData(env("u", 1, "a2", 200), env("c", 2, "b1", 210))
      val second = runPass(stream, ttl, ck, expect = 2)
      val k1 = second.filter(_.id == 1L).maxBy(_.count)
      assert(!k1.resumed && k1.count == 1L, s"key 1 state survived the TTL: $k1")
      assert(second.filter(_.id == 2L) ==
        Seq(TwsTtlCounter.Seen(2L, 1L, resumed = false)), second.toString)
    }
  }

  test("control: a long TTL retains state across the same sleep-and-restart drive") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-ttl2").toString
      val stream = MemoryStream[String]
      val ttl = java.time.Duration.ofHours(1)

      stream.addData(env("c", 1, "a1", 100))
      runPass(stream, ttl, ck, expect = 1)
      Thread.sleep(2500) // same sleep as the eviction test — only the TTL differs
      stream.addData(env("u", 1, "a2", 200))
      val second = runPass(stream, ttl, ck, expect = 1)
      val k1 = second.filter(_.id == 1L).maxBy(_.count)
      assert(k1.resumed && k1.count == 2L,
        s"key 1 state should have survived a 1h TTL: $k1")
    }
  }
}
