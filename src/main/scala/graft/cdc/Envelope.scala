package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium change-event envelope handling.
  *
  * Mirrors the consumed shape in the reference:
  *   - whole-message tombstone skip  (consumer.py:65-68)
  *   - UTF-8 decode + JSON parse     (consumer.py:69-70)
  *   - `payload` projection, `schema` half dropped (consumer.py:71)
  *   - op dispatch c/r/u/d, unknown op is an error (postgres.py:250-261)
  *
  * The row schema here is the driver testdata's `customer` table rather
  * than the reference's 4-column `inventory.customers` (postgres.py:100-107)
  * — same envelope, wider row. Schema is declared once as a StructType so
  * `from_json` gives a typed nested column instead of the reference's
  * untyped dicts; malformed JSON yields a null payload (PERMISSIVE mode),
  * the engine-level analogue of the reference's per-message error isolation
  * (consumer.py:76-79).
  */
object Envelope {

  /** Replicated-row schema (testdata customer flavor — the default; any
    * table's row schema can be plugged in, a Debezium envelope is generic). */
  val rowSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("nationkey", IntegerType),
    StructField("acctbal", DoubleType),
    StructField("mktsegment", StringType)))

  /** The reference's own 4-column inventory.customers row
    * (postgres.py:100-107), id widened to BIGINT. */
  val referenceRowSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType)))

  /** Debezium payload: before/after row images + op + source metadata. */
  def payloadSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", StructType(Seq(
      StructField("table", StringType),
      StructField("lsn", LongType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Full envelope; the `schema` half is parsed as-is and then dropped,
    * like the reference ignoring it (consumer.py:71). */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("payload", payloadSchema(row))))


  val validOps: Seq[String] = Seq("c", "r", "u", "d")

  /** T1: drop Kafka delete tombstones (null value). */
  def filterTombstones(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.filter(col(valueCol).isNotNull)

  /** T2+T3: parse the JSON envelope and project the payload fields.
    * Input: a string `value` column (Kafka value already cast to string, or
    * file lines). Output columns: before, after, op, ts_ms, source.
    */
  def decode(df: DataFrame, valueCol: String = "value",
      row: StructType = rowSchema): DataFrame =
    filterTombstones(df, valueCol)
      .select(from_json(col(valueCol), envelopeSchema(row)).getField("payload").as("p"))
      .select(col("p.before").as("before"), col("p.after").as("after"),
        col("p.op").as("op"), col("p.ts_ms").as("ts_ms"), col("p.source").as("source"))
      .filter(col("op").isNotNull) // malformed JSON → null payload → dropped

  /** T6 as data: split a raw value stream into (decodable, dead-letter).
    * The reference logs apply-failures and retries forever (consumer.py:
    * 76-79); at scale the idiom is routing malformed payloads to a
    * dead-letter set instead of wedging the consumer. A value is dead if it
    * parses to no payload.op (malformed JSON or wrong shape); tombstones
    * (null value) are NOT dead — they're protocol (consumer.py:65-68).
    */
  def decodeWithDeadLetter(df: DataFrame, valueCol: String = "value",
      row: StructType = rowSchema): (DataFrame, DataFrame) = {
    val nonNull = filterTombstones(df, valueCol)
    val parsed = nonNull.withColumn("_p",
      from_json(col(valueCol), envelopeSchema(row)).getField("payload"))
    val good = parsed.filter(col("_p.op").isNotNull)
      .select(col("_p.before").as("before"), col("_p.after").as("after"),
        col("_p.op").as("op"), col("_p.ts_ms").as("ts_ms"), col("_p.source").as("source"))
    val dead = parsed.filter(col("_p.op").isNull).select(col(valueCol))
    (good, dead)
  }

  /** Single-pass twin of [[decodeWithDeadLetter]]: every parsed row with
    * an `is_dead` flag instead of two frames. Spark shares no duplicate
    * subplans, so a consumer aggregating BOTH routes of the two-frame
    * form parses the whole stream twice; this form parses once. */
  def decodeWithDeadFlag(df: DataFrame, valueCol: String = "value",
      row: StructType = rowSchema): DataFrame =
    filterTombstones(df, valueCol)
      .withColumn("_p",
        from_json(col(valueCol), envelopeSchema(row)).getField("payload"))
      .select(col(valueCol),
        col("_p.before").as("before"), col("_p.after").as("after"),
        col("_p.op").as("op"), col("_p.ts_ms").as("ts_ms"),
        col("_p.source").as("source"),
        col("_p.op").isNull.as("is_dead"))

  /** T4 strict-mode check: unknown op raises, like postgres.py:260-261.
    * Implemented as a codegen'd expression (raise_error under a `when`) so
    * the scan stays distributed — no driver-side validation pass.
    */
  def assertKnownOps(df: DataFrame): DataFrame =
    df.withColumn("op",
      when(col("op").isin(validOps: _*), col("op"))
        .otherwise(raise_error(concat(lit("Unknown op: "), col("op")))))

  /** T5: the key every change event carries regardless of op — insert/update
    * events key on `after.id`, deletes on `before.id` (postgres.py:139-144,
    * 217-219). */
  def keyCol: Column = coalesce(col("after.id"), col("before.id"))
}
