package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Coverage gaps wave: the salted skew-resistant aggregation registered as
  * a verified query (result must be EXACTLY the unsalted aggregate — the
  * oracle is the plain GROUP BY), ntile window buckets, and a
  * both-sides-unmatched FULL OUTER join.
  */
object GapOps {
  import Num._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // Salted two-stage aggregation (plans.SaltedAgg): the skew fix for hot
  // group keys. Algebraic aggregates re-associate exactly (counts and
  // DECIMAL sums), so the salted plan must hash-match the plain GROUP BY —
  // which is literally the oracle here.
  val saltedAgg: Q = Q(
    "q_salted_agg",
    (s, dir) => {
      graft.plans.SaltedAgg.sumCountByKey(
          t(s, dir, "orders"), col("o_orderpriority"), buckets = 16,
          sums = Map("spend" -> dec(col("o_totalprice"))))
        .select(col("_key").as("o_orderpriority"), col("n"),
          col("spend").cast(DoubleType).as("spend"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------------------
  // Salted skew-resistant JOIN (plans.SaltedAgg.saltedJoin): the manual
  // fix when one join key dominates and AQE can't split it. Joining on
  // (key, salt) with a buckets×-replicated small side must produce EXACTLY
  // the plain join — the oracle is the unsalted join + GROUP BY.
  val saltedJoinQ: Q = Q(
    "q_salted_join",
    (s, dir) => {
      val joined = graft.plans.SaltedAgg.saltedJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice")),
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey"), col("c_custkey"), buckets = 16)
      joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // ------------------------------------------------------------------
  // Join-key skew profile: the diagnostic you run BEFORE choosing a skew
  // mitigation — per-key frequency of the prospective join key, top heavy
  // hitters with their share of total, plus distribution stats. One hash
  // agg + a tiny sorted head; at scale this is the cheap dry-run that
  // decides between plain shuffle, AQE skew split, and saltedJoin.
  val keySkewProfile: Q = Q(
    "q_key_skew_profile",
    (s, dir) => {
      // freq is consumed TWICE (the top-10 side and the scalar total) and
      // Spark executes duplicate subplans independently — persist so the
      // lineitem scan+agg runs once. Supplier-cardinality, bounded; Bench
      // clears the session cache after each sweep (same policy as q15).
      val freq = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_rows"))
        .persist()
      val total = freq.agg(sum(col("n_rows")).as("total"),
        count(lit(1)).as("n_keys"))
      // Top-10 via orderBy().limit() → TakeOrderedAndProject: each task
      // keeps its local top-10 and only those reach the driver-side merge —
      // no single-reducer global window even though the per-key frame grows
      // with the data. The rank window then runs over a 10-row bounded
      // input; partitioning on n_keys (an attribute — same value for every
      // row, but NOT foldable, so EliminateWindowPartitions can't strip it
      // the way it strips a lit() partition key) keeps the partition spec
      // non-empty: the single partition here is 10 rows by construction,
      // not "all data, one task".
      freq.orderBy(col("n_rows").desc, col("l_suppkey")).limit(10)
        .crossJoin(broadcast(total))
        .withColumn("share_x1m", expr("n_rows * 1000000 div total"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("n_keys"))
            .orderBy(col("n_rows").desc, col("l_suppkey"))))
        .select(col("rk").cast(IntegerType).as("rank"), col("l_suppkey"),
          col("n_rows"), col("share_x1m"), col("n_keys"))
        .orderBy(col("rank"))
    },
    Some("""WITH freq AS (
      |  SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY l_suppkey),
      |tot AS (
      |  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
      |    COUNT(*) AS n_keys FROM freq)
      |SELECT CAST(rk AS INT) AS rank, l_suppkey, n_rows,
      |  n_rows * 1000000 // total AS share_x1m, n_keys
      |FROM (
      |  SELECT l_suppkey, n_rows,
      |    row_number() OVER (ORDER BY n_rows DESC, l_suppkey) AS rk
      |  FROM freq) CROSS JOIN tot
      |WHERE rk <= 10 ORDER BY rank""".stripMargin))

  // ------------------------------------------------------------------
  // ntile: quartiles of customers by account balance within each market
  // segment, then per-tile stats. Deterministic: ntile ties are resolved by
  // the total sort order (acctbal, custkey).
  val ntileQ: Q = Q(
    "q_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("tile", ntile(4).over(w))
        .groupBy(col("c_mktsegment"), col("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
        .orderBy(col("c_mktsegment"), col("tile"))
    },
    Some("""WITH tiled AS (
      |  SELECT c_mktsegment, c_acctbal,
      |    ntile(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey) AS tile
      |  FROM customer)
      |SELECT c_mktsegment, CAST(tile AS INT) AS tile, COUNT(*) AS n,
      |  MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi
      |FROM tiled GROUP BY c_mktsegment, tile
      |ORDER BY c_mktsegment, tile""".stripMargin))

  // ------------------------------------------------------------------
  // FULL OUTER join with unmatched rows on BOTH sides: nations that have
  // deep-debt customers vs nations that have deep-debt suppliers (the
  // -600 cut leaves ~20 nations on one side, ~1 on the other).
  val fullOuter: Q = Q(
    "q_full_outer",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") < -600)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val sp = t(s, dir, "supplier").filter(col("s_acctbal") < -600)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("c_nationkey") === col("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""WITH c AS (
      |  SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
      |  WHERE c_acctbal < -600 GROUP BY c_nationkey),
      |s AS (
      |  SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
      |  WHERE s_acctbal < -600 GROUP BY s_nationkey)
      |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
      |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
      |FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
      |ORDER BY nationkey""".stripMargin))

  // ------------------------------------------------------------------
  // Incremental aggregate maintenance (materialized-view merge math): the
  // base state is an aggregate over the history partition, a new batch is
  // aggregated ALONE, and the two partial states merge by re-aggregation —
  // sums of DECIMAL sums and counts of counts are associative, so the
  // merged view must equal the direct aggregate over everything, which is
  // the oracle. This is the foreachBatch/streaming-agg update rule stated
  // as a verifiable batch query.
  val incrementalAgg: Q = Q(
    "q_incremental_agg",
    (s, dir) => {
      val cut = lit("1999-01-01").cast(TimestampType)
      def phase(f: DataFrame): DataFrame = f
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("sdec"))
      val o = t(s, dir, "orders")
      val base = phase(o.filter(col("o_orderdate") < cut))
      val delta = phase(o.filter(col("o_orderdate") >= cut))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n"), sum(col("sdec")).cast(DoubleType).as("spend"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------------------
  // Data-quality profile (expectations-style validation): per-column null
  // counts, bounds, cardinalities, and rule-violation counts in ONE
  // aggregation pass over the fact — the pre-ingest gate of a training
  // pipeline. Every metric is a conditional aggregate, so the whole profile
  // is a single map-side-combinable hash aggregate, no second scan.
  val dataQuality: Q = Q(
    "q_data_quality",
    (s, dir) => {
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        countDistinct(col("l_returnflag")).as("n_flags"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L))
          .as("bad_flag"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount"),
        sum(when(col("l_shipdate") < lit("1990-01-01").cast(TimestampType) ||
            col("l_shipdate") >= lit("2005-01-01").cast(TimestampType), 1L)
          .otherwise(0L)).as("impossible"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("bad_price"))
    },
    Some("""SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
      |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      |  COUNT(DISTINCT l_returnflag) AS n_flags,
      |  CAST(SUM(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS bad_flag,
      |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      |  CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01'
      |    OR l_shipdate >= TIMESTAMP '2005-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS impossible,
      |  CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price
      |FROM lineitem""".stripMargin))

  val all: Seq[Q] = Seq(saltedAgg, saltedJoinQ, keySkewProfile, ntileQ,
    fullOuter, incrementalAgg, dataQuality)
}
