package graft.sources

import graft.SparkSpec
import graft.cdc.{Compaction, Envelope}
import org.apache.spark.sql.DataFrame

/** LIVE JDBC integration for S4/S6–S9 against embedded Derby — a real
  * JDBC engine, in-process: the replica DDL init, the batched
  * DELETE+INSERT apply of compacted CDC changes, replay idempotence, the
  * equality with the parquet snapshot path, and the partitioned-parallel
  * Spark JDBC read back through the exact option map
  * `SourceContractSpec` pins. This closes the previously
  * environment-gated "no live database" half of S4 to the extent the
  * sandbox allows; a Postgres deployment differs only in the URL (and
  * would use ON CONFLICT as the dialect fast path). */
class JdbcReplicaSpec extends SparkSpec {
  import spark.implicits._

  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def decoded(events: Seq[String]): DataFrame =
    Envelope.decode(events.toDF("value"))

  private val b1 = Seq(env("c", 1, "a", 100), env("c", 2, "p", 110))
  private val b2 = Seq(env("u", 1, "b", 200), env("d", 2, "p", 210),
    env("c", 3, "q", 220))

  private def readBack(db: String, parts: Int = 4): DataFrame =
    spark.read.format("jdbc").options(Sources.jdbcOptions(
      url(db), "customers", "app", "app", "id", 0L, 100L, parts)).load()

  private def state(db: String): Map[Long, String] =
    readBack(db).select($"ID", $"NAME").as[(Long, String)].collect().toMap

  test("live S6-S9: DDL init + insert/update/delete apply on a real JDBC engine") {
    val db = "graft_live1"
    JdbcReplicaSink.applyBatch(decoded(b1), url(db), "customers")
    assert(state(db) == Map(1L -> "a", 2L -> "p"))
    JdbcReplicaSink.applyBatch(decoded(b2), url(db), "customers")
    assert(state(db) == Map(1L -> "b", 3L -> "q")) // update won, delete gone
  }

  test("replay idempotence: re-applying a batch converges (at-least-once contract)") {
    val db = "graft_replay"
    JdbcReplicaSink.applyBatch(decoded(b1), url(db), "customers")
    JdbcReplicaSink.applyBatch(decoded(b2), url(db), "customers")
    val s = state(db)
    JdbcReplicaSink.applyBatch(decoded(b2), url(db), "customers")
    assert(state(db) == s)
  }

  test("live replica equals the parquet snapshot path on the same events") {
    val db = "graft_eq"
    val all = b1 ++ b2
    JdbcReplicaSink.applyBatch(decoded(all), url(db), "customers")
    val snap = Compaction.latestState(decoded(all))
      .select($"id", $"name").as[(Long, String)].collect().toMap
    assert(state(db) == snap)
  }

  test("read back is partition-parallel through the pinned option map") {
    val db = "graft_parallel"
    JdbcReplicaSink.applyBatch(decoded(b1 ++ b2), url(db), "customers")
    val df = readBack(db, parts = 4)
    assert(df.rdd.getNumPartitions == 4,
      "partitionColumn/bounds must yield parallel range scans")
    assert(df.count() == 2)
  }

  test("within-batch ordering: latest (ts_ms, lsn) wins before the apply") {
    // two updates + a delete on one key in ONE batch — the compacted
    // net change must be the single winner, applied once
    val db = "graft_order"
    val batch = Seq(env("c", 7, "x", 10), env("u", 7, "y", 20),
      env("u", 7, "z", 30))
    JdbcReplicaSink.applyBatch(decoded(batch), url(db), "customers")
    assert(state(db) == Map(7L -> "z"))
    val batch2 = Seq(env("u", 7, "w", 40), env("d", 7, "w", 50))
    JdbcReplicaSink.applyBatch(decoded(batch2), url(db), "customers")
    assert(state(db).isEmpty)
  }

  test("streaming replica: micro-batches apply live; a replayed batch converges") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val db = "graft_stream"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-jdbc-ckpt")
      .toString
    val es = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = graft.streaming.CdcStream.runJdbcReplica(
      es.toDF().toDF("value"), url(db), "customers", ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      es.addData(b1: _*)
      q.processAllAvailable()
      assert(state(db) == Map(1L -> "a", 2L -> "p"))
      es.addData(b2: _*)
      q.processAllAvailable()
      assert(state(db) == Map(1L -> "b", 3L -> "q"))
    } finally q.stop()
    // replay the LAST batch out-of-band (the crash-before-commit case:
    // offsets uncommitted, the batch re-applies) — state must converge
    JdbcReplicaSink.applyBatch(decoded(b2), url(db), "customers")
    assert(state(db) == Map(1L -> "b", 3L -> "q"))
  }

  test("larger batch exercises statement batching across partitions") {
    val db = "graft_bulk"
    val n = 1200
    val batch = (1 to n).map(i => env("c", i.toLong, s"n$i", 1000L + i))
    JdbcReplicaSink.applyBatch(decoded(batch), url(db), "customers")
    val got = spark.read.format("jdbc").options(Sources.jdbcOptions(
      url(db), "customers", "app", "app", "id", 0L, n + 1L, 8)).load()
    assert(got.count() == n)
    // spot-check content round trip
    assert(got.filter($"ID" === 600).select($"NAME").as[String].head() == "n600")
  }
}
