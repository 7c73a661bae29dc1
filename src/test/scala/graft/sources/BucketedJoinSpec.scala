package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the shuffle you pay ONCE at write time instead of on every
  * join. At 100 TB a fact table joined daily on the same key should be
  * bucketed on that key: both sides then arrive pre-clustered and the
  * sort-merge join plans with NO exchange — this spec pins that property
  * (results identical to the plain join, zero Exchange in the plan).
  */
class BucketedJoinSpec extends SparkSpec {

  private def writeBuckets(): Unit = {
    val o = graft.Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
  }

  test("bucketed-bucketed join plans without any exchange and matches plain join") {
    writeBuckets()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
      val physical = joined.queryExecution.executedPlan.toString

      // the join itself must not shuffle: both sides are bucketed on the key
      assert(physical.contains("SortMergeJoin"), physical.take(600))
      assert(!physical.contains("Exchange hashpartitioning(o_custkey"),
        physical.take(1200))
      assert(!physical.contains("Exchange hashpartitioning(c_custkey"),
        physical.take(1200))

      // and the results are exactly the plain (shuffled) join's
      val plain = graft.Tables.load(spark, sfDir, "orders")
        .join(graft.Tables.load(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("total"))
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("bucketed aggregation on the bucket key needs no exchange either") {
    writeBuckets()
    try {
      val agg = spark.table("orders_bkt")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("total"))
      val physical = agg.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange hashpartitioning"), physical.take(1200))
      assert(agg.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
