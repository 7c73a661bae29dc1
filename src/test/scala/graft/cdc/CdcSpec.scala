package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Envelope/compaction semantics against the reference's behavior table
  * (FIXTURES.md §A): insert / update / delete / snapshot-r / null-value
  * tombstone / unknown op / malformed JSON.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long,
      beforeNull: Boolean = false, afterNull: Boolean = false): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (beforeNull) "null" else row
    val after = if (afterNull) "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def decode(values: Seq[String]): DataFrame =
    Envelope.decode(values.toDF("value"))

  test("insert event: before null, after populated (consumer.py happy path)") {
    val out = decode(Seq(env("c", 1, "a", 100, beforeNull = true))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Any]("before") == null)
    assert(r.getAs[org.apache.spark.sql.Row]("after").getAs[Long]("id") == 1L)
    assert(r.getAs[String]("op") == "c")
  }

  test("null-value tombstones are skipped (consumer.py:65-68)") {
    val df = Seq(Some(env("c", 1, "a", 100, beforeNull = true)), None, None)
      .toDF("value")
    assert(Envelope.decode(df).count() == 1)
  }

  test("malformed JSON is dropped, not fatal (consumer.py:76-79)") {
    val out = decode(Seq("{not json", env("r", 2, "b", 50, beforeNull = true)))
    assert(out.count() == 1)
  }

  test("unknown op raises (postgres.py:260-261)") {
    val bad = Envelope.assertKnownOps(
      decode(Seq(env("x", 1, "a", 100, beforeNull = true))))
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("Unknown op") ||
      Option(e.getCause).exists(_.getMessage.contains("Unknown op")))
  }

  test("compaction: last write wins, delete removes key, reinsert revives") {
    val events = Seq(
      env("c", 1, "v1", 100, beforeNull = true),
      env("u", 1, "v2", 200),
      env("c", 2, "w1", 110, beforeNull = true),
      env("d", 2, "w1", 210, afterNull = true),
      env("c", 3, "x1", 120, beforeNull = true),
      env("d", 3, "x1", 220, afterNull = true),
      env("c", 3, "x2", 320, beforeNull = true))
    val snap = Compaction.latestState(decode(events))
      .select($"id", $"name").as[(Long, String)].collect().toMap
    assert(snap == Map(1L -> "v2", 3L -> "x2"))
  }

  test("compaction tie on ts_ms broken by source.lsn (Kafka-offset stand-in)") {
    val a = s"""{"schema":null,"payload":{"before":null,"after":{"id":7,"name":"first","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"t","lsn":1},"op":"c","ts_ms":500}}"""
    val b = s"""{"schema":null,"payload":{"before":null,"after":{"id":7,"name":"second","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"t","lsn":2},"op":"u","ts_ms":500}}"""
    val snap = Compaction.latestState(decode(Seq(a, b)))
      .select($"name").as[String].collect()
    assert(snap.toSeq == Seq("second"))
  }

  test("ts tie with a NULL lsn: the non-null lsn wins (window AND max_by routes agree)") {
    // Compaction orders by lsn desc_nulls_last; the single-pass max_by
    // route (cdc_multi_table) relies on null struct fields comparing
    // smallest — both must pick the lsn-bearing event on a ts_ms tie.
    val a = s"""{"schema":null,"payload":{"before":null,"after":{"id":7,"name":"nolsn","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"t","lsn":null},"op":"c","ts_ms":500}}"""
    val b = s"""{"schema":null,"payload":{"before":null,"after":{"id":7,"name":"withlsn","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"t","lsn":1},"op":"u","ts_ms":500}}"""
    val viaWindow = Compaction.latestState(decode(Seq(a, b)))
      .select($"name").as[String].collect().toSeq
    assert(viaWindow == Seq("withlsn"))
    val viaMaxBy = decode(Seq(a, b))
      .groupBy(Envelope.keyCol.as("_key"))
      .agg(org.apache.spark.sql.functions.max_by(
        $"after.name",
        org.apache.spark.sql.functions.struct($"ts_ms", $"source.lsn")).as("name"))
      .select($"name").as[String].collect().toSeq
    assert(viaMaxBy == Seq("withlsn"))
  }

  test("generated change stream matches the oracle's modulus rules at sf0.001") {
    val snap = Compaction.latestState(
      Envelope.decode(ChangeGen.changeEvents(spark, sfDir)))
    val customers = graft.Tables.load(spark, sfDir, "customer")
    val expectedSurvivors = customers
      .filter($"c_custkey" % 5 =!= 0 || $"c_custkey" % 15 === 0).count()
    assert(snap.count() == expectedSurvivors)
    // updated-but-not-reinserted rows carry acctbal+100
    val updated = snap.filter($"id" % 3 === 0 && $"id" % 15 =!= 0)
      .join(customers, $"id" === $"c_custkey")
      .filter($"acctbal" =!= $"c_acctbal" + 100.0)
    assert(updated.count() == 0)
  }
}
