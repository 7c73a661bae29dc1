package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** MapState field audit + ListState version ring, deterministically. */
class TwsChangeAuditSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, bal: Double, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":$bal,"mktsegment":"X"}"""
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

  test("field audit: only columns that actually changed update their last-changed ts") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-audit").toString
      val stream = MemoryStream[String]
      val q = TwsChangeAudit.runFieldAudit(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("fieldaudit")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(env("c", 1, "a1", 10.0, 100))
        q.processAllAvailable()
        // batch 2: name changes, balance unchanged
        stream.addData(env("u", 1, "a2", 10.0, 200))
        q.processAllAvailable()
        // batch 3: balance changes, name unchanged
        stream.addData(env("u", 1, "a2", 99.0, 300))
        q.processAllAvailable()
        val last = spark.table("fieldaudit")
          .as[TwsChangeAudit.FieldChange].collect()
          .groupBy(_.field).map { case (f, v) => f -> v.map(_.changed_ts).max }
        assert(last("name") == 200L, last.toString)
        assert(last("acctbal") == 300L, last.toString)
        assert(last("mktsegment") == 100L && last("nationkey") == 100L, last.toString)
      } finally q.stop()
    }
  }

  test("field audit: delete then re-insert re-marks every field") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-audit2").toString
      val stream = MemoryStream[String]
      val q = TwsChangeAudit.runFieldAudit(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("fieldaudit2")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(env("c", 1, "a1", 10.0, 100))
        q.processAllAvailable()
        stream.addData(env("d", 1, "a1", 10.0, 200))
        q.processAllAvailable()
        stream.addData(env("c", 1, "a1", 10.0, 300)) // identical values
        q.processAllAvailable()
        val last = spark.table("fieldaudit2")
          .as[TwsChangeAudit.FieldChange].collect()
          .groupBy(_.field).map { case (f, v) => f -> v.map(_.changed_ts).max }
        // identical re-insert still counts as a change of every field:
        // the delete cleared the row snapshot
        assert(last.values.toSet == Set(300L), last.toString)
      } finally q.stop()
    }
  }

  test("field audit: a replayed old event neither regresses timestamps nor the row snapshot") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-audit3").toString
      val stream = MemoryStream[String]
      val q = TwsChangeAudit.runFieldAudit(Envelope.decode(stream.toDF()))
        .writeStream.format("memory").queryName("fieldaudit3")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      def changes() = spark.table("fieldaudit3")
        .as[TwsChangeAudit.FieldChange].collect().toSeq
      try {
        stream.addData(env("c", 1, "a1", 10.0, 100))
        q.processAllAvailable()
        stream.addData(env("u", 1, "a2", 10.0, 200)) // name → a2
        q.processAllAvailable()
        // at-least-once REPLAY of the batch-1 create: without a guard it
        // diffs a1 against the newer a2 snapshot, emits a spurious name
        // change with an OLDER ts, and regresses the snapshot to a1
        stream.addData(env("c", 1, "a1", 10.0, 100))
        q.processAllAvailable()
        // (name, 100) exists exactly once — from the genuine batch-1 first
        // sighting; the replay must not add a second, stale one
        assert(changes().count(c => c.field == "name" && c.changed_ts == 100L) == 1,
          changes().toString)
        assert(changes().filter(_.field == "name").map(_.changed_ts).max == 200L)
        // genuine follow-up touching only acctbal: a regressed snapshot
        // (a1) would ALSO flag name here — it must not
        stream.addData(env("u", 1, "a2", 99.0, 300))
        q.processAllAvailable()
        val at300 = changes().filter(_.changed_ts == 300L).map(_.field).toSet
        assert(at300 == Set("acctbal"), at300.toString)
      } finally q.stop()
    }
  }

  test("version ring: a redelivered duplicate timestamp does not evict a genuine older version") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-ring2").toString
      val stream = MemoryStream[String]
      val q = TwsChangeAudit.runRecentVersions(Envelope.decode(stream.toDF()), keep = 3)
        .writeStream.format("memory").queryName("ring2")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(env("c", 1, "a", 1.0, 100), env("u", 1, "b", 1.0, 200),
          env("u", 1, "c", 1.0, 300))
        q.processAllAvailable()
        // redelivery of ts=300 (at-least-once): without dedup the duplicate
        // occupies a ring slot and evicts the genuine 100
        stream.addData(env("u", 1, "c", 1.0, 300))
        q.processAllAvailable()
        val last = spark.table("ring2")
          .as[TwsChangeAudit.VersionWindow].collect().last
        assert(last.n_kept == 3 && last.oldest_ts == 100L && last.newest_ts == 300L,
          last.toString)
      } finally q.stop()
    }
  }

  test("version ring keeps the last 3 timestamps across micro-batches") {
    withConfs(StateStores.rocksDbConf) {
      implicit val sc = spark.sqlContext
      val ck = Files.createTempDirectory("graft-ring").toString
      val stream = MemoryStream[String]
      val q = TwsChangeAudit.runRecentVersions(Envelope.decode(stream.toDF()), keep = 3)
        .writeStream.format("memory").queryName("ring")
        .option("checkpointLocation", ck)
        .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
      try {
        stream.addData(env("c", 1, "a", 1.0, 100), env("u", 1, "b", 1.0, 200))
        q.processAllAvailable()
        stream.addData(env("u", 1, "c", 1.0, 300), env("u", 1, "d", 1.0, 400))
        q.processAllAvailable()
        val last = spark.table("ring")
          .as[TwsChangeAudit.VersionWindow].collect().maxBy(_.newest_ts)
        // 4 versions seen, ring keeps (200, 300, 400)
        assert(last.n_kept == 3 && last.oldest_ts == 200L && last.newest_ts == 400L,
          last.toString)
      } finally q.stop()
    }
  }
}
