package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 edge semantics the oracle query can't isolate: interval contiguity,
  * delete-then-reinsert, and the [from, to) boundary convention. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def history(events: Seq[String]) =
    Scd2.history(Envelope.decode(events.toDF("value")))

  test("intervals are contiguous and the delete closes the last one") {
    val h = history(Seq(
      env("r", 1, "a", 100), env("u", 1, "b", 200), env("d", 1, "b", 300)))
      .select($"name", $"valid_from", $"valid_to", $"is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().sortBy(_._2)
    assert(h.toSeq == Seq(
      ("a", 100L, Some(200L), false),
      ("b", 200L, Some(300L), false))) // delete emits no row but closes 'b'
  }

  test("delete then re-insert: gap between versions, only the last is current") {
    val h = history(Seq(
      env("r", 7, "x", 100), env("d", 7, "x", 200), env("c", 7, "x2", 500)))
      .select($"name", $"valid_from", $"valid_to", $"is_current")
      .as[(String, Long, Option[Long], Boolean)].collect().sortBy(_._2)
    assert(h.toSeq == Seq(
      ("x", 100L, Some(200L), false),
      ("x2", 500L, None, true)))
  }

  test("asOf is [from, to): exact boundary belongs to the newer version; gap returns nothing") {
    val h = history(Seq(
      env("r", 1, "a", 100), env("u", 1, "b", 200), env("d", 1, "b", 300),
      env("c", 1, "c", 400)))
    def at(ts: Long) = Scd2.asOf(h, ts).select($"name").as[String].collect().toSeq
    assert(at(100) == Seq("a")) // inclusive from
    assert(at(199) == Seq("a"))
    assert(at(200) == Seq("b")) // boundary -> newer version
    assert(at(299) == Seq("b"))
    assert(at(350) == Seq())    // deleted gap
    assert(at(400) == Seq("c"))
  }
}
