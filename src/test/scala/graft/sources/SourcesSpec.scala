package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The format-parameterized IO surface: every format goes through ONE code
  * path (format + options), so csv/json round-trips must reproduce the
  * parquet-sourced frame exactly, and partitioned layouts must prune.
  */
class SourcesSpec extends SparkSpec {

  private def customers =
    graft.Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")

  test("csv round-trip reproduces the frame (header + explicit schema)") {
    val tmp = Files.createTempDirectory("graft-src-csv").toString
    val orig = customers
    orig.write.mode("overwrite").option("header", "true").csv(s"$tmp/c")
    val back = Sources.read(spark, "csv", s"$tmp/c",
      Map("header" -> "true"))
      .select(col("c_custkey").cast("bigint"), col("c_name"),
        col("c_nationkey").cast("int"), col("c_acctbal").cast("double"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("json round-trip reproduces the frame") {
    val tmp = Files.createTempDirectory("graft-src-json").toString
    val orig = customers
    orig.write.mode("overwrite").json(s"$tmp/j")
    val back = Sources.read(spark, "json", s"$tmp/j")
      .select(col("c_custkey").cast("bigint"), col("c_name"),
        col("c_nationkey").cast("int"), col("c_acctbal").cast("double"))
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("orc round-trip reproduces the frame exactly (typed columnar format)") {
    // ORC keeps the schema, so no cast-back dance: the frame must come
    // back bit-identical through the same one-code-path read surface
    val tmp = Files.createTempDirectory("graft-src-orc").toString
    val orig = customers
    orig.write.mode("overwrite").orc(s"$tmp/o")
    val back = Sources.read(spark, "orc", s"$tmp/o")
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("orc predicate pushdown reaches the scan") {
    val tmp = Files.createTempDirectory("graft-src-orc2").toString
    customers.write.mode("overwrite").orc(s"$tmp/o")
    val q = Sources.read(spark, "orc", s"$tmp/o")
      .filter(col("c_custkey") === 42L).select(col("c_custkey"), col("c_name"))
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]"),
      plan.take(800))
  }

  test("partitioned write prunes: reading one partition scans one directory") {
    val tmp = Files.createTempDirectory("graft-src-part").toString
    val df = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    Sources.writePartitioned(df, s"$tmp/p", "c_mktsegment")
    val one = spark.read.parquet(s"$tmp/p")
      .filter(col("c_mktsegment") === "BUILDING")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan.take(800))
    val want = df.filter(col("c_mktsegment") === "BUILDING").count()
    assert(one.count() == want && want > 0)
  }
}
