package graft.cdc

import graft.{Num, Q}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end CDC pipeline queries (generate → serialize → decode →
  * compact), oracle-verified because ChangeGen's op rules are pure
  * key-modulus functions a SQL CASE can reproduce.
  *
  * The oracle does NOT re-run the pipeline — it states the expected final
  * replicated state directly from the seed table, which is what the
  * reference verifies manually by diffing source vs target tables
  * (README.md:149-151). Surviving state per ChangeGen's rules:
  *
  *   key%15==0              → re-inserted row (name||'_2', original acctbal)
  *   else key%5==0          → deleted (absent)
  *   else key%3==0          → updated (UPPER(name), acctbal+100)
  *   else                   → snapshot row unchanged
  */
object CdcQueries {
  import Num._

  /** Decoded change events, generated+parsed once per (session, dir) and
    * persisted: four CDC queries consume the same log — re-generating and
    * re-parsing JSON per query is exactly the "read the topic four times"
    * mistake a real deployment can't afford. Cache key is tiny (decoded
    * events ≪ source table).
    */
  private val rawEventsMemo = new graft.SessionMemo[DataFrame]((s, dir) =>
    ChangeGen.changeEvents(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  private[cdc] def rawEvents(spark: SparkSession, dir: String): DataFrame =
    rawEventsMemo(spark, dir)

  private val decodedMemo = new graft.SessionMemo[DataFrame]((s, dir) =>
    Envelope.decode(rawEvents(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  private[cdc] def decodedEvents(spark: SparkSession, dir: String): DataFrame =
    decodedMemo(spark, dir)

  /** RAW supplier change topic, same once-per-(session, dir) discipline —
    * previously regenerated on every supplierSnapshot/multiTable
    * invocation (raw, because the two consumers decode with different
    * row schemas). */
  private val supplierMemo = new graft.SessionMemo[DataFrame]((s, dir) =>
    ChangeGen.supplierChangeEvents(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  private[cdc] def supplierEvents(spark: SparkSession, dir: String): DataFrame =
    supplierMemo(spark, dir)

  /** Micro-batch wave boundaries for the incremental drives — ONE
    * definition for the three replay sites, derived from ChangeGen's
    * wave bases (key < ChangeGen.KeyCap keeps every wave inside its
    * range; generation fails loudly beyond the cap). */
  private[cdc] val Waves: Seq[(Long, Long)] = Seq(
    (0L, ChangeGen.WaveUpdate),
    (ChangeGen.WaveUpdate, ChangeGen.WaveDelete),
    (ChangeGen.WaveDelete, ChangeGen.WaveReinsert),
    (ChangeGen.WaveReinsert, Long.MaxValue))

  /** Re-pin every already-materialized cache entry after a
    * spark.catalog.clearCache() (Bench's per-sweep cleanup): the memo
    * holders keep returning the same frames, but their persist
    * registration is gone — without re-pinning, later sweeps re-generate
    * the topic per query. persist() on an already-persisted frame is a
    * no-op, so this is safe to call any time. */
  private[graft] def repersist(): Unit =
    Seq(rawEventsMemo, decodedMemo, supplierMemo).foreach(_.foreachValue(
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))

  private def pipeline(spark: SparkSession, dir: String): DataFrame =
    Compaction.latestState(
      Envelope.assertKnownOps(decodedEvents(spark, dir)))

  val snapshot: Q = Q(
    "cdc_snapshot",
    (s, dir) => pipeline(s, dir).orderBy(col("id")),
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 15 = 0 THEN c_name || '_2'
      |       WHEN c_custkey % 3 = 0 THEN upper(c_name)
      |       ELSE c_name END AS name,
      |  c_nationkey AS nationkey,
      |  CASE WHEN c_custkey % 3 = 0 AND c_custkey % 15 <> 0 THEN c_acctbal + 100
      |       ELSE c_acctbal END AS acctbal,
      |  c_mktsegment AS mktsegment
      |FROM customer
      |WHERE c_custkey % 5 <> 0 OR c_custkey % 15 = 0
      |ORDER BY id""".stripMargin))

  // ------------------------------------------------------------------
  // The same snapshot THROUGH the graft-cdc DataSource V2 connector — the
  // one engine surface the in-memory drives bypass. A file log is written
  // once per (session, dir) from the generated change topic (two
  // partitions by key parity; the write is the test-fixture side a real
  // capture process owns — tombstones are null-value records a line-based
  // log cannot carry, and CdcStream drops them before decode anyway), then
  // the query is a BATCH read via format("graft-cdc") → decode →
  // compaction. Sharing cdc_snapshot's oracle makes "the connector read
  // path loses nothing" a driver-hash-checked claim; the streaming half
  // (offsets, checkpoint replay, AvailableNow drain) is GraftCdcSourceSpec.
  private val dsv2LogRoot = new graft.SessionMemo[String]({ (s, dir) =>
    val root = java.nio.file.Files
      .createTempDirectory("graft-dsv2-log").toString
    val rows = rawEvents(s, dir).filter(col("value").isNotNull)
      .select(col("key"), col("value")).collect()
    (0 until 2).foreach { p =>
      // floorMod, not %: Scala's % is -1 for negative keys, which would
      // route such rows to NEITHER partition — silently vanished from the
      // log (latent: c_custkey is positive today, nothing here enforces it)
      graft.sources.GraftCdcLog.append(root, "customers.cdc", p,
        rows.filter(r => Math.floorMod(r.getLong(0), 2L) == p)
          .map(_.getString(1)).toSeq)
    }
    root
  }, root => org.apache.commons.io.FileUtils.deleteDirectory(
    new java.io.File(root)))

  val dsv2Snapshot: Q = Q(
    "cdc_dsv2_snapshot",
    (s, dir) => {
      val raw = s.read.format("graft-cdc")
        .options(graft.streaming.CdcStream.kafkaOptions(
          dsv2LogRoot(s, dir), "customers.cdc"))
        .load()
        .select(col("value").cast("string").as("value"))
      Compaction.latestState(Envelope.assertKnownOps(Envelope.decode(raw)))
        .orderBy(col("id"))
    },
    snapshot.oracle)

  // ------------------------------------------------------------------
  // The full CONNECTOR PAIR: readStream.format("graft-cdc") →
  // writeStream.format("graft-table") — the change log consumed through
  // the V2 read API and applied through the V2 StreamingWrite epoch
  // commit/abort API (commit-after-apply at the sink-connector level,
  // consumer.py:74-75), landing as a transaction-log CAS commit on the
  // dual-table group. Ran once per (session, dir); both reads below
  // resolve through the committed transaction. Sharing cdc_snapshot's /
  // the SCD2 oracle makes "the sink connector loses and invents nothing"
  // a driver-hash-checked claim; the epoch replay/abort windows are
  // GraftTableSinkSpec's.
  private val dsv2SinkGroup = new graft.SessionMemo[String]({ (s, dir) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2-sink")
    val group = s"$tmp/group"
    val q = s.readStream.format("graft-cdc")
      .options(graft.streaming.CdcStream.kafkaOptions(
        dsv2LogRoot(s, dir), "customers.cdc"))
      .load()
      .writeStream.format("graft-table")
      .option("path", group)
      .option("checkpointLocation", s"$tmp/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    group
  }, group => org.apache.commons.io.FileUtils.deleteDirectory(
    new java.io.File(group).getParentFile))

  val dsv2SinkSnapshot: Q = Q(
    "cdc_dsv2_sink_snapshot",
    (s, dir) => graft.streaming.DualSink.readSnapshot(s, dsv2SinkGroup(s, dir))
      .get
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
        col("mktsegment"))
      .orderBy(col("id")),
    snapshot.oracle)

  /** Decode-path check in isolation: op histogram of the change stream
    * (tombstones are skipped before decode, so they never count). */
  val opCounts: Q = Q(
    "cdc_op_counts",
    (s, dir) =>
      decodedEvents(s, dir)
        .groupBy(col("op")).agg(count(lit(1)).as("n"))
        .orderBy(col("op")),
    Some("""SELECT 'c' AS op, COUNT(*) AS n FROM customer WHERE c_custkey % 15 = 0
      |UNION ALL SELECT 'd', COUNT(*) FROM customer WHERE c_custkey % 5 = 0
      |UNION ALL SELECT 'r', COUNT(*) FROM customer
      |UNION ALL SELECT 'u', COUNT(*) FROM customer WHERE c_custkey % 3 = 0
      |ORDER BY op""".stripMargin))

  /** Replicated snapshot feeding a downstream analytical join — per
    * surviving customer, order count and spend. Also the driver's flagship
    * `entry` query. */
  val snapshotRevenue: Q = Q(
    "cdc_snapshot_revenue",
    (s, dir) => {
      val orders = graft.Tables.load(s, dir, "orders")
      pipeline(s, dir)
        .join(orders, col("id") === col("o_custkey"))
        .groupBy(col("id"), col("name"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .orderBy(col("id"))
    },
    Some("""WITH snap AS (
      |  SELECT c_custkey AS id,
      |    CASE WHEN c_custkey % 15 = 0 THEN c_name || '_2'
      |         WHEN c_custkey % 3 = 0 THEN upper(c_name)
      |         ELSE c_name END AS name
      |  FROM customer
      |  WHERE c_custkey % 5 <> 0 OR c_custkey % 15 = 0)
      |SELECT id, name, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM snap JOIN orders ON o_custkey = id
      |GROUP BY id, name ORDER BY id""".stripMargin))

  def flagship(spark: SparkSession, dir: String): DataFrame =
    snapshotRevenue.fn(spark, dir)

  /** Time travel: snapshot as of ts_ms <= 2_500_000 — after every update
    * (ts 2e6+key), before any delete (3e6+key) or re-insert (4e6+key).
    * The same compaction over a time-filtered log; the oracle states the
    * mid-timeline expected state directly.
    */
  val snapshotAsOf: Q = Q(
    "cdc_snapshot_asof",
    (s, dir) => Compaction.latestState(
      decodedEvents(s, dir).filter(col("ts_ms") <= 2500000L))
      .orderBy(col("id")),
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS name,
      |  c_nationkey AS nationkey,
      |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS acctbal,
      |  c_mktsegment AS mktsegment
      |FROM customer ORDER BY id""".stripMargin))

  /** Second replicated table through the identical pipeline (Debezium's
    * one-connector-many-tables shape) — decode with the supplier row
    * schema, same compaction. */
  val supplierSnapshot: Q = Q(
    "cdc_supplier_snapshot",
    (s, dir) => Compaction.latestState(
      Envelope.decode(supplierEvents(s, dir),
        row = ChangeGen.supplierRowSchema))
      .orderBy(col("id")),
    Some("""SELECT s_suppkey AS id,
      |  CASE WHEN s_suppkey % 12 = 0 THEN s_name || '_n'
      |       WHEN s_suppkey % 4 = 0 THEN upper(s_name)
      |       ELSE s_name END AS name,
      |  s_nationkey AS nationkey,
      |  CASE WHEN s_suppkey % 4 = 0 AND s_suppkey % 12 <> 0 THEN s_acctbal + 50
      |       ELSE s_acctbal END AS acctbal
      |FROM supplier
      |WHERE s_suppkey % 6 <> 0 OR s_suppkey % 12 = 0
      |ORDER BY id""".stripMargin))

  /** T6 as an oracle query: inject deterministic corrupt payloads (one per
    * custkey%7==0) into the change stream, route through the dead-letter
    * split, and report good/dead counts — the consumer never wedges and
    * nothing is silently dropped.
    */
  val deadLetter: Q = Q(
    "cdc_dead_letter",
    (s, dir) => {
      val corrupt = graft.Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey").as("key"),
          concat(lit("corrupt{"), col("c_custkey")).as("value"))
      val all = rawEvents(s, dir)
        .unionByName(corrupt)
      // ONE parse pass: the two-frame decodeWithDeadLetter form would
      // re-run from_json over the whole stream per consumed route
      Envelope.decodeWithDeadFlag(all)
        .agg(sum(when(col("is_dead"), 1L).otherwise(0L)).as("dead"),
          sum(when(!col("is_dead"), 1L).otherwise(0L)).as("good"))
        .select(expr("stack(2, 'dead', dead, 'good', good) AS (bucket, n)"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT 'dead' AS bucket, COUNT(*) AS n FROM customer WHERE c_custkey % 7 = 0
      |UNION ALL
      |SELECT 'good', (SELECT COUNT(*) FROM customer)
      |  + (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 0)
      |  + (SELECT COUNT(*) FROM customer WHERE c_custkey % 5 = 0)
      |  + (SELECT COUNT(*) FROM customer WHERE c_custkey % 15 = 0)
      |ORDER BY bucket""".stripMargin))

  /** The full customer change log re-stated as a DuckDB CTE — the oracle's
    * version of ChangeGen (same pure key-modulus rules, same timestamps). */
  private val evCte: String =
    """WITH ev AS (
      |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nationkey,
      |         c_acctbal AS acctbal, c_mktsegment AS mktsegment,
      |         'r' AS op, 1000000 + c_custkey AS ts_ms FROM customer
      |  UNION ALL
      |  SELECT c_custkey, upper(c_name), c_nationkey, c_acctbal + 100,
      |         c_mktsegment, 'u', 2000000 + c_custkey
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, NULL, NULL, NULL, NULL,
      |         'd', 3000000 + c_custkey FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name || '_2', c_nationkey, c_acctbal,
      |         c_mktsegment, 'c', 4000000 + c_custkey
      |  FROM customer WHERE c_custkey % 15 = 0),
      |v AS (
      |  SELECT *, lead(ts_ms) OVER (PARTITION BY id ORDER BY ts_ms) AS valid_to
      |  FROM ev)""".stripMargin

  /** SCD2: every version of every key with its validity interval. */
  val scd2History: Q = Q(
    "cdc_scd2_history",
    (s, dir) => Scd2.history(decodedEvents(s, dir))
      .orderBy(col("id"), col("valid_from")),
    Some(evCte +
      """
      |SELECT id, name, nationkey, acctbal, mktsegment,
      |       ts_ms AS valid_from, valid_to, valid_to IS NULL AS is_current
      |FROM v WHERE op <> 'd'
      |ORDER BY id, valid_from""".stripMargin))

  /** Point-in-time lookup via the SCD2 intervals (same instant as
    * [[snapshotAsOf]], different access path: interval containment over the
    * materialized history instead of re-compacting a filtered log). */
  val scd2AsOf: Q = Q(
    "cdc_scd2_asof",
    (s, dir) => Scd2.asOf(Scd2.history(decodedEvents(s, dir)), 2500000L)
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
        col("mktsegment"))
      .orderBy(col("id")),
    Some(evCte +
      """
      |SELECT id, name, nationkey, acctbal, mktsegment
      |FROM v
      |WHERE op <> 'd' AND ts_ms <= 2500000
      |  AND (valid_to IS NULL OR valid_to > 2500000)
      |ORDER BY id""".stripMargin))

  /** Schema evolution, Debezium-style: a v2 writer starts emitting an extra
    * `phone` column (for custkey%10==0, at ts 5e6+key — after every v1
    * event). The consumer reads the WHOLE log with the v2 reader schema:
    * PERMISSIVE from_json null-fills the missing column in v1 payloads —
    * schema-on-read evolution, no reprocessing, one compaction. The v2
    * insert also resurrects previously-deleted keys (10%%5==0), which the
    * oracle's CASE logic pins.
    */
  val schemaEvolution: Q = Q(
    "cdc_schema_evolution",
    (s, dir) => {
      val v2Schema = StructType(
        Envelope.rowSchema.fields :+ StructField("phone", StringType))
      val c = graft.Tables.load(s, dir, "customer")
        .filter(col("c_custkey") % 10 === 0)
      val v2 = c.select(col("c_custkey").as("key"),
        to_json(struct(
          lit(null).cast(StringType).as("schema"),
          struct(
            lit(null).cast(v2Schema).as("before"),
            struct(col("c_custkey").as("id"), col("c_name").as("name"),
              col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"),
              col("c_mktsegment").as("mktsegment"),
              concat(lit("P"), col("c_custkey").cast(StringType)).as("phone")).as("after"),
            struct(lit("customers").as("table"),
              (lit(5000000L) + col("c_custkey")).as("lsn")).as("source"),
            lit("c").as("op"),
            (lit(5000000L) + col("c_custkey")).as("ts_ms")).as("payload"))).as("value"))
      Compaction.latestState(
          Envelope.decode(rawEvents(s, dir).unionByName(v2), row = v2Schema))
        .orderBy(col("id"))
    },
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 10 = 0 THEN c_name
      |       WHEN c_custkey % 15 = 0 THEN c_name || '_2'
      |       WHEN c_custkey % 3 = 0 THEN upper(c_name)
      |       ELSE c_name END AS name,
      |  c_nationkey AS nationkey,
      |  CASE WHEN c_custkey % 10 <> 0 AND c_custkey % 3 = 0 AND c_custkey % 15 <> 0
      |       THEN c_acctbal + 100 ELSE c_acctbal END AS acctbal,
      |  c_mktsegment AS mktsegment,
      |  CASE WHEN c_custkey % 10 = 0 THEN 'P' || CAST(c_custkey AS VARCHAR)
      |       ELSE NULL END AS phone
      |FROM customer
      |WHERE c_custkey % 5 <> 0 OR c_custkey % 15 = 0 OR c_custkey % 10 = 0
      |ORDER BY id""".stripMargin))

  /** Temporal dimension join — the warehouse use of SCD2: each fact row
    * joins the dimension VERSION that was valid at the fact's own
    * timestamp, not a fixed instant. Each order gets a synthetic fact time
    * spanning the whole change timeline (1e6 + orderkey % 3.5e6), so
    * lookups land in v1/v2 periods and in post-delete gaps (those orders
    * drop out of the inner join). Plan shape: hash join on the customer key
    * carries the interval columns, the range predicate filters post-join —
    * the standard equi-key + validity-filter temporal lookup, one shuffle
    * on the key.
    */
  val scd2TemporalJoin: Q = Q(
    "cdc_scd2_temporal_join",
    (s, dir) => {
      val hist = Scd2.history(decodedEvents(s, dir))
      val o = graft.Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (lit(1000000L) + col("o_orderkey") % 3500000L).as("fact_ts"))
      o.join(hist,
          col("o_custkey") === col("id") &&
            col("valid_from") <= col("fact_ts") &&
            (col("valid_to").isNull || col("valid_to") > col("fact_ts")))
        .select(col("o_orderkey"), col("o_custkey"), col("fact_ts"),
          col("name"), col("valid_from"))
        .orderBy(col("o_orderkey"))
    },
    Some(evCte +
      """
      |SELECT o_orderkey, o_custkey, 1000000 + o_orderkey % 3500000 AS fact_ts,
      |  name, ts_ms AS valid_from
      |FROM orders JOIN v ON o_custkey = v.id
      |WHERE v.op <> 'd'
      |  AND ts_ms <= 1000000 + o_orderkey % 3500000
      |  AND (valid_to IS NULL OR valid_to > 1000000 + o_orderkey % 3500000)
      |ORDER BY o_orderkey""".stripMargin))

  /** Debezium one-connector-many-tables routing (schema.include.list,
    * /root/reference/register-postgres.json:12): both tables' topics arrive
    * as ONE (key, value) stream; each message is routed on a cheap JSON-path
    * probe of `payload.source.table` BEFORE full decode, then each route
    * parses with its own row schema, compacts, and reports (event count,
    * live keys, exact balance total).
    *
    * Scale shape: the probe is one `get_json_object` over the raw bytes —
    * no full parse for foreign-table messages — and each route's decode +
    * compaction shuffles only its own table's slice. Customer tombstones
    * (null value → null probe) drop at routing, exactly where Kafka
    * tombstones die in the reference's consumer (consumer.py:65-68).
    */
  val multiTable: Q = Q(
    "cdc_multi_table",
    (s, dir) => {
      // customer side comes from the session cache shared with the other
      // cdc_* queries — re-generating the topic per query is the "read the
      // topic N times" mistake the cache exists to prevent
      val all = rawEvents(s, dir)
        .unionByName(supplierEvents(s, dir))
        .withColumn("tbl",
          get_json_object(col("value"), "$.payload.source.table"))
      // Single-pass per route: Spark does not share duplicate subplans, so
      // feeding `dec` into both a count and a compaction decodes every
      // message twice. Instead one keyed aggregate computes the event count
      // AND the per-key winner (max_by over (ts_ms, lsn) — same order as
      // Compaction.latestState's ranking window, nulls-last lsn because
      // null struct fields compare smallest), then a tiny final agg folds
      // per-key results into the three report columns. One decode, one
      // shuffle, no crossJoin.
      def route(tblName: String, row: StructType): DataFrame = {
        val dec = Envelope.decode(
          all.filter(col("tbl") === tblName).drop("tbl"), row = row)
        dec.groupBy(Envelope.keyCol.as("_key"))
          .agg(count(lit(1)).as("n_ev"),
            max_by(struct(col("op"), col("after.acctbal").as("bal")),
              struct(col("ts_ms"), col("source.lsn"))).as("w"))
          .agg(sum(col("n_ev")).as("n_events"),
            count(when(col("w.op") =!= "d", 1)).as("n_live"),
            dsum(when(col("w.op") =!= "d", col("w.bal"))).as("total_bal"))
          .select(lit(tblName).as("tbl"), col("n_events"),
            col("n_live"), col("total_bal"))
      }
      route("customers", Envelope.rowSchema)
        .unionByName(route("suppliers", ChangeGen.supplierRowSchema))
        .orderBy(col("tbl"))
    },
    Some("""WITH cust AS (
      |  SELECT CASE WHEN c_custkey % 15 = 0 THEN c_acctbal
      |              WHEN c_custkey % 3 = 0 THEN c_acctbal + 100
      |              ELSE c_acctbal END AS bal
      |  FROM customer WHERE c_custkey % 5 <> 0 OR c_custkey % 15 = 0),
      |supp AS (
      |  SELECT CASE WHEN s_suppkey % 12 = 0 THEN s_acctbal
      |              WHEN s_suppkey % 4 = 0 THEN s_acctbal + 50
      |              ELSE s_acctbal END AS bal
      |  FROM supplier WHERE s_suppkey % 6 <> 0 OR s_suppkey % 12 = 0)
      |SELECT 'customers' AS tbl,
      |  (SELECT COUNT(*) FROM customer)
      |    + (SELECT COUNT(*) FROM customer WHERE c_custkey % 3 = 0)
      |    + (SELECT COUNT(*) FROM customer WHERE c_custkey % 5 = 0)
      |    + (SELECT COUNT(*) FROM customer WHERE c_custkey % 15 = 0) AS n_events,
      |  (SELECT COUNT(*) FROM cust) AS n_live,
      |  (SELECT CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) FROM cust) AS total_bal
      |UNION ALL
      |SELECT 'suppliers',
      |  (SELECT COUNT(*) FROM supplier)
      |    + (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 4 = 0)
      |    + (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 6 = 0)
      |    + (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 12 = 0),
      |  (SELECT COUNT(*) FROM supp),
      |  (SELECT CAST(SUM(CAST(bal AS DECIMAL(12,2))) AS DOUBLE) FROM supp)
      |ORDER BY tbl""".stripMargin))

  /** Snapshot diff: what changed between two points in the log — the CDC
    * reconciliation query (audit "what did yesterday's replication do",
    * or validate a migration). Both states compact from the SAME cached
    * decoded log; the diff is one full-outer join on the key, classified
    * into deleted / added / changed and filtered to actual differences.
    * At scale: two compactions (each one shuffle on the key, same
    * partitioning) + the co-partitioned outer join — no extra exchange.
    */
  val snapshotDiff: Q = Q(
    "cdc_snapshot_diff",
    (s, dir) => {
      val dec = decodedEvents(s, dir)
      val t1 = Compaction.latestState(dec.filter(col("ts_ms") <= 2500000L))
        .select(col("id"), col("name").as("name_before"),
          col("acctbal").as("bal_before"))
      val t2 = Compaction.latestState(dec)
        .select(col("id").as("id2"), col("name").as("name_after"),
          col("acctbal").as("bal_after"))
      t1.join(t2, col("id") === col("id2"), "full_outer")
        .withColumn("change",
          when(col("name_after").isNull && col("name_before").isNotNull, "deleted")
            .when(col("name_before").isNull && col("name_after").isNotNull, "added")
            .when(col("name_before") =!= col("name_after") ||
              col("bal_before") =!= col("bal_after"), "changed")
            .otherwise("unchanged"))
        .filter(col("change") =!= "unchanged")
        .select(coalesce(col("id"), col("id2")).as("id"), col("change"),
          col("name_before"), col("name_after"),
          col("bal_before"), col("bal_after"))
        .orderBy(col("id"))
    },
    // T1 (ts <= 2.5M): all keys present, %3 updated. T2 (full log):
    // %5-not-%15 deleted, %15 reinserted (name||'_2', original balance).
    // Diff rows are exactly the %5 keys.
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 15 = 0 THEN 'changed' ELSE 'deleted' END AS change,
      |  CASE WHEN c_custkey % 15 = 0 THEN upper(c_name) ELSE c_name END AS name_before,
      |  CASE WHEN c_custkey % 15 = 0 THEN c_name || '_2' ELSE NULL END AS name_after,
      |  CASE WHEN c_custkey % 15 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS bal_before,
      |  CASE WHEN c_custkey % 15 = 0 THEN c_acctbal ELSE NULL END AS bal_after
      |FROM customer WHERE c_custkey % 5 = 0
      |ORDER BY id""".stripMargin))

  /** ONE shared four-wave drive feeding BOTH incremental SCD2 queries
    * (the [[dualSinkOutputs]] discipline applied to the flat/bucketed
    * pair): each wave slice is checkpointed once and applied to the flat
    * history AND the bucketed history — re-running the whole four-batch
    * fold per query was the "replay the topic N times" mistake, and each
    * fold internally scans its batch twice (version rows + close-set), so
    * the shared staged slice pays off inside a single fold too. Both
    * merge PROTOCOLS still run in full; only the input staging and the
    * session-lifetime result cache are shared. */
  private val scd2Outputs =
    new graft.SessionMemo[(DataFrame, DataFrame)](runScd2)

  private def runScd2(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ev = decodedEvents(s, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-scd2-dual")
    val flatHist = s"$tmp/flat"
    val bktHist = s"$tmp/bkt"
    // bucket count sized by the event volume (guide §6 — at sf0.1 the
    // fixed 64 meant each micro-batch read+wrote 64 tiny files of a
    // few-MB history; the count is layout, not semantics: `bucket` never
    // reaches an output). ev is the persisted decodedEvents memo, so the
    // count is a cache scan.
    val nb = graft.streaming.CdcStream.adaptiveBuckets(ev.count())
    // stage every wave slice once (both folds read them), then run the
    // two merge protocols as PARALLEL folds: flat wave r depends only on
    // flat wave r−1 and bucketed on bucketed, so the folds are
    // independent threads over shared checkpointed slices — the drive's
    // wall drops to max(fold) instead of their sum, with each fold's
    // batch order (the correctness contract) untouched
    val slices = Waves.map { case (lo, hi) =>
      ev.filter(col("ts_ms") >= lo && col("ts_ms") < hi)
        .localCheckpoint(true)
    }
    graft.Par.par2(
      slices.foreach(graft.streaming.Scd2Stream.applyBatch(_, flatHist)),
      slices.foreach(
        graft.streaming.Scd2Stream.applyBatchBucketed(_, bktHist, nb)))
    val flat = s.read.parquet(flatHist)
      .orderBy(col("id"), col("valid_from"))
      .localCheckpoint() // materialize before the scratch dir goes away
    // resolve through the manifest — the committed live-file set, the
    // same path a concurrent reader takes (atomic-commit contract)
    val bkt = graft.streaming.Scd2Stream.readHistoryBucketed(s, bktHist).get
      .drop("bucket") // partition column, not part of the logical history
      .orderBy(col("id"), col("valid_from"))
      .localCheckpoint()
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    (flat, bkt)
  }

  /** Incremental SCD2: the same history as [[scd2History]], but built by
    * folding the log through `Scd2Stream.applyBatch` in four wave-aligned
    * micro-batches (r / u / d / c) against a scratch history table — the
    * end-to-end proof that the streaming merge path converges to the
    * batch operator's result, under the full DuckDB oracle. */
  val scd2Incremental: Q = Q(
    "cdc_scd2_incremental",
    (s, dir) => scd2Outputs(s, dir)._1,
    Some(evCte +
      """
      |SELECT id, name, nationkey, acctbal, mktsegment,
      |       ts_ms AS valid_from, valid_to, valid_to IS NULL AS is_current
      |FROM v WHERE op <> 'd'
      |ORDER BY id, valid_from""".stripMargin))

  /** Bucketed incremental SCD2 — the claimed 100 TB path, registered so
    * the bench regression gate tracks its cost (not just the demo tool).
    * Same four wave-aligned micro-batches as [[scd2Incremental]], but the
    * history lives hash-bucketed and each batch rewrites only touched
    * buckets ([[graft.streaming.Scd2Stream.applyBatchBucketed]]). Shares
    * the full DuckDB oracle — bucketing must not change a single row. */
  val scd2IncrementalBucketed: Q = Q(
    "cdc_scd2_incremental_bucketed",
    (s, dir) => scd2Outputs(s, dir)._2,
    Some(evCte +
      """
      |SELECT id, name, nationkey, acctbal, mktsegment,
      |       ts_ms AS valid_from, valid_to, valid_to IS NULL AS is_current
      |FROM v WHERE op <> 'd'
      |ORDER BY id, valid_from""".stripMargin))

  /** Drive the cross-table transactional sink ([[graft.streaming.DualSink]]
    * — snapshot + SCD2 history from the same batches, ONE transaction-log
    * CAS per batch) over the four wave-aligned micro-batches, ONCE per
    * (session, dir), and materialize all three transactional reads: the
    * live snapshot, the live history, and the snapshot AT the retained
    * PREVIOUS transaction (retainTxns = 2 keeps transaction 3 — every
    * delete applied, no re-insert yet — fully resolvable: log entry AND
    * data files). Sharing one drive across the three queries is the
    * decodedEvents discipline one level up: re-running the four-batch
    * merge per query is the "replay the topic N times" mistake.
    *
    * The live reads share the single-table queries' oracles VERBATIM (the
    * transaction machinery must not change a row of either table; the
    * crash/race contract itself is pinned by `TableGroupSpec`); the
    * time-travel read gets its own mid-timeline oracle. */
  // the four-batch drive can never run twice (SessionMemo's putIfAbsent +
  // lazy val); the checkpointed results live for the session's lifetime
  // by design — the three consumers re-read them across the whole sweep
  private val dualSinkOutputs =
    new graft.SessionMemo[(DataFrame, DataFrame, DataFrame, String)](run,
      // the group dir outlives run() for the connector-read consumer;
      // delete its temp tree when the owning session stops (the
      // dsv2SinkGroup dispose discipline)
      out => org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(out._4).getParentFile))

  private def run(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, String) = {
      val ev = decodedEvents(s, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-txn")
      val g = s"$tmp/group"
      // adaptive layout, as in runScd2 (guide §6): the dual sink stages
      // TWO tables per batch, so the fixed 64-bucket fan cost double
      val nb = graft.streaming.CdcStream.adaptiveBuckets(ev.count())
      Waves.foreach {
        case (lo, hi) =>
          graft.streaming.DualSink.applyBatch(
            ev.filter(col("ts_ms") >= lo && col("ts_ms") < hi), g,
            nBuckets = nb, retainTxns = 2)
      }
      val snapCols = Seq(col("id"), col("name"), col("nationkey"),
        col("acctbal"), col("mktsegment"))
      // materialize all three reads; the group dir itself STAYS for the
      // session — `cdc_table_read_dsv2` re-reads it through the
      // `graft-table` connector (the dsv2SinkGroup discipline)
      val snapLive = graft.streaming.DualSink.readSnapshot(s, g).get
        .select(snapCols: _*).orderBy(col("id")).localCheckpoint()
      val histLive = graft.streaming.DualSink.readHistory(s, g).get
        .drop("bucket") // partition column, not part of the logical history
        .orderBy(col("id"), col("valid_from")).localCheckpoint()
      val snapAt3 = graft.streaming.TableGroup.readTableAt(
          s, g, graft.streaming.DualSink.SnapshotTable, 3L).get
        .select(snapCols: _*).orderBy(col("id")).localCheckpoint()
      (snapLive, histLive, snapAt3, g)
  }

  /** The dual-sink drive's committed group dir (the pushdown demo reads
    * it through the connector; memoized — at most one drive per
    * session/dir). */
  private[graft] def dualSinkGroupFor(s: SparkSession, dir: String): String =
    dualSinkOutputs(s, dir)._4

  val txnSnapshot: Q = Q(
    "cdc_txn_snapshot",
    (s, dir) => dualSinkOutputs(s, dir)._1,
    snapshot.oracle)

  val txnHistory: Q = Q(
    "cdc_txn_history",
    (s, dir) => dualSinkOutputs(s, dir)._2,
    scd2IncrementalBucketed.oracle)

  /** Time travel through the transaction log (the Delta/Iceberg `VERSION
    * AS OF` read): resolve the snapshot via transaction 3's immutable log
    * entry instead of the live pointer. Transaction 3 = the first three
    * waves applied (inserts, updates, deletes) with the re-insert wave
    * still in the future, so the oracle is the mid-timeline state stated
    * directly from the seed: every key%5 row deleted (including the
    * key%15 rows whose re-insert hasn't happened yet), updates applied to
    * the surviving key%3 rows. */
  val txnTimeTravel: Q = Q(
    "cdc_txn_time_travel",
    (s, dir) => dualSinkOutputs(s, dir)._3,
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS name,
      |  c_nationkey AS nationkey,
      |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS acctbal,
      |  c_mktsegment AS mktsegment
      |FROM customer
      |WHERE c_custkey % 5 <> 0
      |ORDER BY id""".stripMargin))

  /** The same VERSION-AS-OF read THROUGH THE CONNECTOR —
    * `spark.read.format("graft-table").option("versionAsOf", 3)` resolves
    * transaction 3's immutable log entry inside the DataSource V2 read
    * path ([[graft.sources.GraftTableScan]]) instead of via the Scala
    * API. Shares [[txnTimeTravel]]'s oracle verbatim: the driver hash
    * proves the connector surface changed no row; the pruning/versioning
    * contracts are pinned by `GraftTableSinkSpec`. */
  val tableReadDsv2: Q = Q(
    "cdc_table_read_dsv2",
    (s, dir) => {
      val g = dualSinkOutputs(s, dir)._4
      s.read.format("graft-table")
        .option("path", g)
        .option("table", graft.streaming.DualSink.SnapshotTable)
        .option("versionAsOf", "3")
        .load()
        .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
          col("mktsegment"))
        .orderBy(col("id"))
    },
    txnTimeTravel.oracle)

  /** The same pinned-version read as SQL TEXT (VERDICT r14 item 5):
    * `graft.sources.GraftCatalog` makes the group SQL-addressable, and
    * `VERSION AS OF` resolves through Spark's time-travel analysis into
    * the identical [[graft.sources.GraftTableScan]] — shares
    * [[txnTimeTravel]]'s oracle verbatim. */
  val tableReadSql: Q = Q(
    "cdc_table_read_sql",
    (s, dir) => {
      val g = dualSinkOutputs(s, dir)._4
      s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      s.sql(s"""SELECT id, name, nationkey, acctbal, mktsegment
        FROM graft.`$g`.snapshot VERSION AS OF 3 ORDER BY id""")
    },
    txnTimeTravel.oracle)

  /** A SELECTIVE version-as-of lookup through the connector — the read
    * that exercises the r13 `weak`'s fix: the IN predicate on the bucket
    * key pushes into the DSv2 scan ([[graft.sources.GraftTablePushdown]]),
    * prunes the resolved file list to the ≤6 buckets the six keys hash
    * into (of the group's 64), and re-applies on the inner parquet read
    * for footer-stats row-group skipping. Key 42 is %3==0, so the lookup
    * also crosses an UPDATED row. Oracle = [[txnTimeTravel]]'s
    * mid-timeline state restricted to the same keys. */
  val tableReadPushdown: Q = Q(
    "cdc_table_read_pushdown",
    (s, dir) => {
      val g = dualSinkOutputs(s, dir)._4
      s.read.format("graft-table")
        .option("path", g)
        .option("table", graft.streaming.DualSink.SnapshotTable)
        .option("versionAsOf", "3")
        .load()
        .filter(col("id").isin(2L, 4L, 8L, 16L, 23L, 42L))
        .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
          col("mktsegment"))
        .orderBy(col("id"))
    },
    Some("""SELECT c_custkey AS id,
      |  CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS name,
      |  c_nationkey AS nationkey,
      |  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS acctbal,
      |  c_mktsegment AS mktsegment
      |FROM customer
      |WHERE c_custkey % 5 <> 0 AND c_custkey IN (2, 4, 8, 16, 23, 42)
      |ORDER BY id""".stripMargin))

  /** A TIME-RANGE read through the connector — the r14 verdict's
    * file-stats item: "rows changed since T" (T = the last wave's start)
    * is the incremental-consumer scan every CDC table serves, and the
    * bucket-residue pruning is useless for it (a range constrains no
    * hash residue). The per-file min/max sidecar
    * ([[graft.streaming.BucketManifest.StatsName]], recorded from the
    * merge's own footers) prunes the FILE LIST to files whose max
    * `_ts_ms` reaches T — the buckets wave 4 touched — before any footer
    * is opened; `GraftTableSinkSpec` pins the files-read reduction.
    * Oracle: the only rows whose LATEST change is in wave 4 are the
    * re-creates (`c_custkey % 15 = 0`, `name || '_2'`). */
  val tableReadRecent: Q = Q(
    "cdc_table_read_recent",
    (s, dir) => {
      val g = dualSinkOutputs(s, dir)._4
      s.read.format("graft-table")
        .option("path", g)
        .option("table", graft.streaming.DualSink.SnapshotTable)
        .load() // the LIVE transaction: all four waves applied
        .filter(col("_ts_ms") >= 4000000L)
        .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
          col("mktsegment"))
        .orderBy(col("id"))
    },
    Some("""SELECT c_custkey AS id, c_name || '_2' AS name,
      |  c_nationkey AS nationkey, c_acctbal AS acctbal,
      |  c_mktsegment AS mktsegment
      |FROM customer WHERE c_custkey % 15 = 0
      |ORDER BY id""".stripMargin))

  /** A STRING-RANGE read through the connector (VERDICT r15 item 3): the
    * `_file_stats` sidecar now records truncated ASCII bounds for UTF8
    * columns (the Iceberg discipline), so a `name` range prunes the file
    * list the same way `_ts_ms` does — `GraftTableSinkSpec` pins the
    * files-opened reduction and the representation guards (a fractional
    * literal can never prune long stats, the r15 ADVICE fix). Oracle =
    * the live-snapshot state with the identical range applied to the
    * reconstructed name — DuckDB and Spark agree on ASCII ordering, so
    * the driver hash proves the pruning changed no row. */
  val tableReadNameRange: Q = Q(
    "cdc_table_read_name_range",
    (s, dir) => {
      val g = dualSinkOutputs(s, dir)._4
      s.read.format("graft-table")
        .option("path", g)
        .option("table", graft.streaming.DualSink.SnapshotTable)
        .load()
        .filter(col("name") >= "Customer#000000400" &&
          col("name") < "Customer#000000800")
        .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
          col("mktsegment"))
        .orderBy(col("id"))
    },
    Some("""SELECT * FROM (
      |  SELECT c_custkey AS id,
      |    CASE WHEN c_custkey % 15 = 0 THEN c_name || '_2'
      |         WHEN c_custkey % 3 = 0 THEN upper(c_name)
      |         ELSE c_name END AS name,
      |    c_nationkey AS nationkey,
      |    CASE WHEN c_custkey % 3 = 0 AND c_custkey % 15 <> 0 THEN c_acctbal + 100
      |         ELSE c_acctbal END AS acctbal,
      |    c_mktsegment AS mktsegment
      |  FROM customer
      |  WHERE c_custkey % 5 <> 0 OR c_custkey % 15 = 0)
      |WHERE name >= 'Customer#000000400' AND name < 'Customer#000000800'
      |ORDER BY id""".stripMargin))

  /** MULTI-TABLE connector-pair drive (VERDICT r14 item 4): ONE topic
    * carries BOTH tables' envelopes (the reference's
    * `schema.include.list` capture shape, `register-postgres.json:12` —
    * one Postgres publication, many tables), ONE `graft-cdc` stream
    * reads it, and the `graft-table` sink routes each envelope by
    * `payload.source.table` into its own `<table>_snapshot`/`_history`
    * pair — every epoch one cross-table transaction
    * ([[graft.streaming.DualSink.applyBatchMulti]]). Per-table row
    * schemas ride `tableSchema.<name>` options (the schema-registry
    * analog). */
  private val multiSinkGroup = new graft.SessionMemo[String]({ (s, dir) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft-multi-sink")
    val root = s"$tmp/log"
    val rows = rawEvents(s, dir).filter(col("value").isNotNull)
      .unionByName(supplierEvents(s, dir).filter(col("value").isNotNull))
      .select(col("key"), col("value")).collect()
    (0 until 2).foreach { p =>
      graft.sources.GraftCdcLog.append(root, "pg.cdc", p,
        rows.filter(r => Math.floorMod(r.getLong(0), 2L) == p)
          .map(_.getString(1)).toSeq)
    }
    val group = s"$tmp/group"
    val q = s.readStream.format("graft-cdc")
      .options(graft.streaming.CdcStream.kafkaOptions(root, "pg.cdc"))
      .load()
      .writeStream.format("graft-table")
      .option("path", group)
      .option("checkpointLocation", s"$tmp/ck")
      .option("routeBySourceTable", "true")
      .option("tableSchema.customers", Envelope.rowSchema.toDDL)
      .option("tableSchema.suppliers", ChangeGen.supplierRowSchema.toDDL)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    group
  }, group => org.apache.commons.io.FileUtils.deleteDirectory(
    new java.io.File(group).getParentFile))

  /** MULTI-TABLE routing × SCHEMA EVOLUTION composed (VERDICT r15 item
    * 7 — the last untested interaction): the SAME routed group as
    * [[multiSinkGroup]] built in TWO stream runs against one
    * checkpoint. Run 1 routes both tables under their v1 DDLs; then the
    * topic gains v2 customer envelopes carrying `phone`
    * ([[schemaEvolution]]'s exact change set: every `%10` key
    * re-created at ts 5e6+key with a phone), and run 2 restarts the
    * stream with `tableSchema.customers` WIDENED mid-stream. The merge
    * unions old and new under widening semantics
    * (`allowMissingColumns`), `stageWrite` publishes the evolved
    * `_schema` sidecar schema-first, and readers resolve the mixed
    * pre-/post-evolution buckets under the one widened schema. The
    * suppliers route must come through UNTOUCHED — its oracle is
    * [[supplierSnapshot]]'s verbatim. */
  private val multiEvoGroup = new graft.SessionMemo[String]({ (s, dir) =>
    val tmp = java.nio.file.Files.createTempDirectory("graft-multi-evo")
    val root = s"$tmp/log"
    val group = s"$tmp/group"
    def pipe(customersDdl: String): Unit = {
      val q = s.readStream.format("graft-cdc")
        .options(graft.streaming.CdcStream.kafkaOptions(root, "pg.cdc"))
        .load()
        .writeStream.format("graft-table")
        .option("path", group)
        .option("checkpointLocation", s"$tmp/ck")
        .option("routeBySourceTable", "true")
        .option("tableSchema.customers", customersDdl)
        .option("tableSchema.suppliers", ChangeGen.supplierRowSchema.toDDL)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // run 1: the full two-table topic under the v1 customer DDL
    val v1Rows = rawEvents(s, dir).filter(col("value").isNotNull)
      .unionByName(supplierEvents(s, dir).filter(col("value").isNotNull))
      .select(col("key"), col("value")).collect()
    (0 until 2).foreach { p =>
      graft.sources.GraftCdcLog.append(root, "pg.cdc", p,
        v1Rows.filter(r => Math.floorMod(r.getLong(0), 2L) == p)
          .map(_.getString(1)).toSeq)
    }
    pipe(Envelope.rowSchema.toDDL)
    // the DDL gain: v2 envelopes carry `phone` (schemaEvolution's set)
    val v2Schema = org.apache.spark.sql.types.StructType(
      Envelope.rowSchema.fields :+ org.apache.spark.sql.types.StructField(
        "phone", org.apache.spark.sql.types.StringType))
    val c = graft.Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
    val v2Rows = c.select(col("c_custkey").as("key"),
      to_json(struct(
        lit(null).cast(org.apache.spark.sql.types.StringType).as("schema"),
        struct(
          lit(null).cast(v2Schema).as("before"),
          struct(col("c_custkey").as("id"), col("c_name").as("name"),
            col("c_nationkey").as("nationkey"),
            col("c_acctbal").as("acctbal"),
            col("c_mktsegment").as("mktsegment"),
            concat(lit("P"), col("c_custkey").cast(
              org.apache.spark.sql.types.StringType)).as("phone"))
            .as("after"),
          struct(lit("customers").as("table"),
            (lit(5000000L) + col("c_custkey")).as("lsn")).as("source"),
          lit("c").as("op"),
          (lit(5000000L) + col("c_custkey")).as("ts_ms")).as("payload")))
        .as("value")).collect()
    (0 until 2).foreach { p =>
      graft.sources.GraftCdcLog.append(root, "pg.cdc", p,
        v2Rows.filter(r => Math.floorMod(r.getLong(0), 2L) == p)
          .map(_.getString(1)).toSeq)
    }
    // run 2: same checkpoint (only the NEW offsets replay), WIDER DDL
    pipe(v2Schema.toDDL)
    group
  }, group => org.apache.commons.io.FileUtils.deleteDirectory(
    new java.io.File(group).getParentFile))

  /** The evolved customers route — shares [[schemaEvolution]]'s oracle
    * verbatim: the routed, two-run, mid-stream-widened pipeline must
    * land exactly the state the single-decode batch operator computes. */
  val multiSinkEvolution: Q = Q(
    "cdc_multi_sink_evolution",
    (s, dir) => graft.streaming.TableGroup.readTable(
        s, multiEvoGroup(s, dir), "customers_snapshot").get
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
        col("mktsegment"), col("phone"))
      .orderBy(col("id")),
    schemaEvolution.oracle)

  /** The untouched suppliers route of the SAME evolved group — one
    * table's DDL gain must not disturb its group sibling (shares
    * [[supplierSnapshot]]'s oracle verbatim). */
  val multiSinkEvolutionOther: Q = Q(
    "cdc_multi_sink_evolution_other",
    (s, dir) => graft.streaming.TableGroup.readTable(
        s, multiEvoGroup(s, dir), "suppliers_snapshot").get
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"))
      .orderBy(col("id")),
    supplierSnapshot.oracle)

  /** The customers route of the multi-table stream — shares
    * [[snapshot]]'s oracle verbatim: routing two tables through one
    * stream must not change a row of either. */
  val multiSinkCustomers: Q = Q(
    "cdc_multi_sink_customers",
    (s, dir) => graft.streaming.TableGroup.readTable(
        s, multiSinkGroup(s, dir), "customers_snapshot").get
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"),
        col("mktsegment"))
      .orderBy(col("id")),
    snapshot.oracle)

  /** The suppliers route — shares [[supplierSnapshot]]'s oracle verbatim
    * (different row schema through the same sink, via its
    * `tableSchema.suppliers` DDL option). */
  val multiSinkSuppliers: Q = Q(
    "cdc_multi_sink_suppliers",
    (s, dir) => graft.streaming.TableGroup.readTable(
        s, multiSinkGroup(s, dir), "suppliers_snapshot").get
      .select(col("id"), col("name"), col("nationkey"), col("acctbal"))
      .orderBy(col("id")),
    supplierSnapshot.oracle)

  /** The SCD2 history half through the connector-sink drive
    * ([[dsv2SinkGroup]]). The sink applied the whole log as ONE epoch, so
    * this also pins that a single-batch history merge equals the
    * four-wave incremental one (both must equal the oracle's full-log
    * window). Declared after [[scd2IncrementalBucketed]] because the
    * shared oracle is read at object init. */
  val dsv2SinkHistory: Q = Q(
    "cdc_dsv2_sink_history",
    (s, dir) => graft.streaming.DualSink.readHistory(s, dsv2SinkGroup(s, dir))
      .get
      .drop("bucket")
      .orderBy(col("id"), col("valid_from")),
    scd2IncrementalBucketed.oracle)

  /** S4's LIVE half through the driver gate: the change stream is applied
    * to a real JDBC database (embedded Derby — in-process, but a genuine
    * SQL engine behind a genuine JDBC driver) with
    * [[graft.sources.JdbcReplicaSink]]'s batched DELETE+INSERT replay,
    * then read back with the partitioned-parallel JDBC source options
    * `SourceContractSpec` pins. The oracle is cdc_snapshot's verbatim —
    * the hash match proves the live-database round trip changed no row.
    * Replay-idempotent, so bench re-runs in one JVM converge. */
  val jdbcReplica: Q = Q(
    "cdc_jdbc_replica",
    (s, dir) => {
      val url = "jdbc:derby:memory:graft_replica_q;create=true"
      graft.sources.JdbcReplicaSink.applyBatch(
        Envelope.assertKnownOps(decodedEvents(s, dir)), url, "customers")
      s.read.format("jdbc").options(graft.sources.Sources.jdbcOptions(
          url, "customers", "app", "app", "id", 0L, 2000000L, 8)).load()
        .select(col("ID").as("id"), col("NAME").as("name"),
          col("NATIONKEY").as("nationkey"), col("ACCTBAL").as("acctbal"),
          col("MKTSEGMENT").as("mktsegment"))
        .orderBy(col("id"))
    },
    snapshot.oracle)

  /** Named shared drives (the SessionMemo artifacts several queries
    * consume), exposed so the bench times each one as its own `drive:*`
    * pseudo-entry instead of whichever consumer query happens to pay
    * first (which made e.g. cdc_scd2_incremental unmonitorable at 0.05 s
    * while another query silently absorbed its 13 s drive). Forcing is
    * idempotent — the memo computes at most once per (session, dir). */
  private[graft] val drives: Seq[(String, (SparkSession, String) => Unit)] =
    Seq(
      "drive:cdc_events" ->
        ((s, d) => { decodedEvents(s, d).count(); () }),
      "drive:cdc_supplier_events" ->
        ((s, d) => { supplierEvents(s, d).count(); () }),
      "drive:cdc_scd2" -> ((s, d) => { scd2Outputs(s, d); () }),
      "drive:cdc_dual_sink" -> ((s, d) => { dualSinkOutputs(s, d); () }),
      "drive:cdc_dsv2_log" -> ((s, d) => { dsv2LogRoot(s, d); () }),
      "drive:cdc_dsv2_sink" -> ((s, d) => { dsv2SinkGroup(s, d); () }))

  val all: Seq[Q] = Seq(snapshot, dsv2Snapshot, opCounts, snapshotRevenue,
    snapshotAsOf, supplierSnapshot, deadLetter, scd2History, scd2AsOf,
    schemaEvolution, scd2TemporalJoin, multiTable, snapshotDiff,
    scd2Incremental, scd2IncrementalBucketed, txnSnapshot, txnHistory,
    txnTimeTravel, tableReadDsv2, tableReadPushdown, tableReadRecent,
    tableReadNameRange, tableReadSql, jdbcReplica, dsv2SinkSnapshot,
    dsv2SinkHistory, multiSinkCustomers, multiSinkSuppliers,
    multiSinkEvolution, multiSinkEvolutionOther)
}
