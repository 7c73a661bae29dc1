package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic change-event generator — the Spark analogue of the
  * reference's Faker-driven workload generator (generate.py:120-174), made
  * reproducible (and DuckDB-oracle-expressible) by deriving every op from
  * the customer table with pure key-modulus rules instead of RNG:
  *
  *   - every customer emits a snapshot read     op='r' at ts 1_000_000+key
  *   - custkey % 3 == 0 emits an update         op='u' at ts 2_000_000+key
  *       (name upper-cased, acctbal + 100 — generate.py:77-96 flavor)
  *   - custkey % 5 == 0 emits a delete          op='d' at ts 3_000_000+key
  *       followed by a null-value Kafka tombstone (consumer.py:65-68)
  *   - custkey % 15 == 0 emits a re-insert      op='c' at ts 4_000_000+key
  *       (name suffixed '_2', original acctbal — generate.py:37-52 flavor)
  *
  * ts_ms is unique per (key, op) so "latest" is total-ordered, standing in
  * for Kafka (partition, offset) order. Events are serialized to real
  * Debezium-envelope JSON (to_json) so the consume path exercises the same
  * decode the reference does on Kafka bytes (consumer.py:69-71).
  *
  * Scale note: generation is a narrow map over the seed table — no shuffle,
  * no driver collection; at 100 TB this parallelizes with the scan.
  */
object ChangeGen {

  /** Wave timestamp bases: every event's ts_ms/lsn = base + key. The
    * whole wave arithmetic (and every consumer's boundary constant —
    * [[CdcQueries.Waves]], the 2.5e6 as-of midpoint) requires key <
    * [[KeyCap]]: beyond it an update's ts would cross the next wave's
    * base and the time-travel/micro-batch splits would silently
    * mis-bucket. Guarded fail-loud at generation time. */
  val WaveRead = 1000000L
  val WaveUpdate = 2000000L
  val WaveDelete = 3000000L
  val WaveReinsert = 4000000L
  val KeyCap = 500000L

  /** key-cap guard riding the ts expression: assert_true throws at scan
    * time for any over-cap key instead of generating mis-bucketed waves. */
  private def cappedTs(tsBase: Long): org.apache.spark.sql.Column =
    when(assert_true(col("id") < KeyCap).isNull, lit(tsBase) + col("id"))

  /** Change events as (key, value-JSON) pairs, value null for tombstones —
    * the shape a Kafka topic would carry. */
  def changeEvents(spark: SparkSession, dir: String): DataFrame = {
    // The seed table is a single small parquet file → one input split. A
    // real CDC topic has many Kafka partitions; repartition up front so
    // JSON build + downstream from_json decode use every core instead of
    // running the whole pipeline on one task.
    val c = Tables.load(spark, dir, "customer")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("mktsegment"))

    def row(name: org.apache.spark.sql.Column, bal: org.apache.spark.sql.Column) =
      struct(col("id"), name.as("name"), col("nationkey"), bal.as("acctbal"), col("mktsegment"))

    def envelope(before: org.apache.spark.sql.Column, after: org.apache.spark.sql.Column,
        op: String, tsBase: Long) =
      to_json(struct(
        lit(null).cast("string").as("schema"),
        struct(
          before.as("before"), after.as("after"),
          struct(lit("customers").as("table"), cappedTs(tsBase).as("lsn")).as("source"),
          lit(op).as("op"),
          cappedTs(tsBase).as("ts_ms")).as("payload")))

    val nullRow = lit(null).cast(Envelope.rowSchema)

    val reads = c.select(col("id").as("key"),
      envelope(nullRow, row(col("name"), col("acctbal")), "r", 1000000L).as("value"))

    val updates = c.filter(col("id") % 3 === 0).select(col("id").as("key"),
      envelope(row(col("name"), col("acctbal")),
        row(upper(col("name")), col("acctbal") + 100), "u", 2000000L).as("value"))

    val deletes = c.filter(col("id") % 5 === 0).select(col("id").as("key"),
      envelope(row(col("name"), col("acctbal")), nullRow, "d", 3000000L).as("value"))

    val tombstones = c.filter(col("id") % 5 === 0).select(col("id").as("key"),
      lit(null).cast("string").as("value"))

    val reinserts = c.filter(col("id") % 15 === 0).select(col("id").as("key"),
      envelope(nullRow, row(concat(col("name"), lit("_2")), col("acctbal")), "c", 4000000L)
        .as("value"))

    reads.unionAll(updates).unionAll(deletes).unionAll(tombstones).unionAll(reinserts)
  }

  /** Same generator over a second table (supplier) — the pipeline is
    * table-generic exactly like Debezium's one-connector-many-tables model
    * (schema.include.list, register-postgres.json:12). Rules use moduli
    * 4/6/12 (12 = lcm) so the oracle CASE stays simple.
    */
  val supplierRowSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("nationkey", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("acctbal", org.apache.spark.sql.types.DoubleType)))

  def supplierChangeEvents(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "supplier")
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("s_suppkey").as("id"), col("s_name").as("name"),
        col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"))

    def row(name: org.apache.spark.sql.Column, bal: org.apache.spark.sql.Column) =
      struct(col("id"), name.as("name"), col("nationkey"), bal.as("acctbal"))

    def envelope(before: org.apache.spark.sql.Column, after: org.apache.spark.sql.Column,
        op: String, tsBase: Long) =
      to_json(struct(
        lit(null).cast("string").as("schema"),
        struct(
          before.as("before"), after.as("after"),
          struct(lit("suppliers").as("table"), cappedTs(tsBase).as("lsn")).as("source"),
          lit(op).as("op"),
          cappedTs(tsBase).as("ts_ms")).as("payload")))

    val nullRow = lit(null).cast(supplierRowSchema)
    val reads = c.select(col("id").as("key"),
      envelope(nullRow, row(col("name"), col("acctbal")), "r", 1000000L).as("value"))
    val updates = c.filter(col("id") % 4 === 0).select(col("id").as("key"),
      envelope(row(col("name"), col("acctbal")),
        row(upper(col("name")), col("acctbal") + 50), "u", 2000000L).as("value"))
    val deletes = c.filter(col("id") % 6 === 0).select(col("id").as("key"),
      envelope(row(col("name"), col("acctbal")), nullRow, "d", 3000000L).as("value"))
    val reinserts = c.filter(col("id") % 12 === 0).select(col("id").as("key"),
      envelope(nullRow, row(concat(col("name"), lit("_n")), col("acctbal")), "c", 4000000L)
        .as("value"))
    reads.unionAll(updates).unionAll(deletes).unionAll(reinserts)
  }
}
