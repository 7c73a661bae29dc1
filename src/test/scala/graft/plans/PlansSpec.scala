package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation exactly") {
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val salted = SaltedAgg.sumCountByKey(
      orders, col("o_custkey"), buckets = 8,
      sums = Map("qty" -> col("o_totalprice").cast("decimal(12,2)")))
      .select($"_key", $"n", $"qty".cast("double"))
      .as[(Long, Long, Double)].collect().toMap2
    val plain = orders.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("qty"))
      .as[(Long, Long, Double)].collect().toMap2
    assert(salted == plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val orders = graft.Tables.load(s2, sfDir, "orders")
    val customer = graft.Tables.load(s2, sfDir, "customer")
    orders.write.mode("overwrite").bucketBy(4, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    customer.write.mode("overwrite").bucketBy(4, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    val joined = s2.table("orders_b")
      .join(s2.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // bucketed-on-join-key tables: SortMergeJoin without Exchange
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n${plan.take(2000)}")
    assert(joined.count() ==
      orders.join(customer, col("o_custkey") === col("c_custkey")).count())
  }

  test("dead-letter routing: malformed values split out, pipeline unwedged") {
    val values = Seq(
      """{"schema":null,"payload":{"before":null,"after":{"id":1,"name":"a","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"t","lsn":1},"op":"c","ts_ms":1}}""",
      "{broken json",
      """{"something":"else"}""",
      null)
    val df = values.toDF("value")
    val (good, dead) = graft.cdc.Envelope.decodeWithDeadLetter(df)
    assert(good.count() == 1)
    assert(dead.as[String].collect().toSet == Set("{broken json", """{"something":"else"}"""))
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
