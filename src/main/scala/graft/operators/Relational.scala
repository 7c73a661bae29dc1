package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator suite over the driver testdata (SURVEY.md §2.5 plan).
  *
  * The reference delegates every relational op to DuckDB/Postgres as SQL
  * text (/root/reference/app/utils/postgres.py:65-77); here each capability
  * is a declarative DataFrame plan so Catalyst gets pushdown/pruning/join
  * selection, with an ANSI-SQL oracle for the driver's DuckDB compare.
  *
  * Scale notes (100 TB): every query is a pure declarative plan —
  * filters/projections reach the parquet scan (PushedFilters), dimension
  * joins are explicitly `broadcast()` (region/nation/supplier stay small
  * relative to facts), fact-fact joins shuffle on their join key only after
  * filtering, and all aggregates are hash aggregates with map-side partial
  * aggregation. Nothing collects to the driver.
  *
  * Oracle exactness rules (see Num): money sums go through DECIMAL (order-
  * independent), averages are exact-decimal-sum-as-double divided by count
  * (one IEEE division), DuckDB integer results are CAST to Spark's result
  * type (length/rank/size → INT, SUM(int) → BIGINT not HUGEINT), and every
  * query ends in a deterministic total ORDER BY.
  */
object Relational {
  import Num._

  /** Body receives a table loader bound to (spark, sfDir). */
  private def q(name: String, oracle: String)(
      body: (String => DataFrame) => DataFrame): Q =
    Q(name, (s, dir) => body(n => Tables.load(s, dir, n)), Some(oracle.stripMargin))

  // ---------------------------------------------------------------------
  // q1_pricing_summary — TPC-H Q1 shape: scan-filter-hashagg, the classic
  // map-side-combine workload. One shuffle on the (tiny) group key.
  val q1: Q = q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus"""
  ) { t =>
    t("lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        decToDoubleExact(
          sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount")))))
          .as("sum_disc_price"),
        decToDoubleExact(
          sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))) * (one + rate(col("l_tax")))))
          .as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sum(rate(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------------
  // q3_shipping_priority — TPC-H Q3 shape: filtered fact-fact join. The
  // segment filter prunes customer before the join; top-k compiles to
  // TakeOrderedAndProject (no global sort materialization).
  val q3: Q = q(
    "q3_shipping_priority",
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10"""
  ) { t =>
    val cut = lit("1997-03-15 00:00:00")
    t("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t("orders").filter(col("o_orderdate") < cut),
        col("c_custkey") === col("o_custkey"))
      .join(t("lineitem").filter(col("l_shipdate") > cut),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------------
  // q5_local_supplier — TPC-H Q5 shape: star join. region/nation are
  // explicitly broadcast (O(10²) rows at ANY scale factor). supplier is
  // NOT hinted: it grows linearly with SF, and an explicit broadcast()
  // hint is honored unconditionally (AQE demotion applies only to
  // planner-estimated joins, never to user hints) — at 100 TB the hint
  // would OOM the driver instead of falling back. Unhinted, the planner
  // auto-broadcasts it at small SF and shuffle-joins at scale.
  // The two facts shuffle once each on their keys.
  val q5: Q = q(
    "q5_local_supplier",
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name"""
  ) { t =>
    t("customer")
      .join(t("orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00") &&
                col("o_orderdate") < lit("1998-01-01 00:00:00")),
        col("c_custkey") === col("o_custkey"))
      .join(t("lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(t("supplier"),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // ---------------------------------------------------------------------
  // q6_forecast_revenue — pure scan-filter-agg; every predicate reaches the
  // parquet reader as a pushed filter, projection prunes to 4 columns.
  val q6: Q = q(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""
  ) { t =>
    t("lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
              col("l_shipdate") < lit("1997-01-01 00:00:00") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * rate(col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------------
  // q_semi_join — EXISTS as left_semi: no right-side payload crosses the
  // shuffle, only the join key; Spark dedups the build side.
  val qSemi: Q = q(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey"""
  ) { t =>
    t("customer")
      .join(t("orders").filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  // q_anti_join — NOT EXISTS as left_anti (customers with no open orders,
  // so the result is non-empty at every scale factor).
  val qAnti: Q = q(
    "q_anti_join",
    """SELECT c_custkey, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey"""
  ) { t =>
    t("customer")
      .join(t("orders").filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // q_topk_per_group — per-key top-k via ranking window: one shuffle on the
  // partition key, rank+filter instead of a global sort.
  val qTopK: Q = q(
    "q_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_custkey, rk"""
  ) { t =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t("orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  // q_topk_udaf — the SAME top-3-per-customer computed through the typed
  // TopKAggregator instead of a rank window: the UDAF carries only k pairs
  // per mapper through the shuffle (map-side combine), where the window
  // form sorts every row of each partition. Identical oracle — the two
  // plans must agree bit-for-bit.
  val qTopKUdaf: Q = Q(
    "q_topk_udaf",
    (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new graft.functions.TopKAggregator(3).toColumn.name("topk"))
        .toDF("o_custkey", "topk")
        .select(col("o_custkey"), posexplode(col("topk")))
        .select(col("o_custkey"),
          col("col._2").as("o_orderkey"),
          col("col._1").as("o_totalprice"),
          (col("pos") + 1).cast(IntegerType).as("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INT) AS rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin))

  // q_window_running — frames + lag/lead + rank sharing one window spec →
  // Spark computes them in a single WindowExec pass (one shuffle).
  val qWinRun: Q = q(
    "q_window_running",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      |  LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
      |  LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order,
      |  CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
      |FROM orders
      |ORDER BY o_custkey, seq"""
  ) { t =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t("orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_spend"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        rank().over(w).as("seq"))
      .orderBy(col("o_custkey"), col("seq"))
  }

  // ---------------------------------------------------------------------
  // q_rollup / q_cube — grouping sets: single Expand + one hash agg shuffle.
  // NULLS FIRST pinned on both sides (Spark ASC default is nulls-first,
  // DuckDB's is nulls-last).
  val qRollup: Q = q(
    "q_rollup",
    """SELECT n_name, c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""
  ) { t =>
    t("customer")
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
  }

  val qCube: Q = q(
    "q_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
  ) { t =>
    t("orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  // ---------------------------------------------------------------------
  // q_setops — INTERSECT/EXCEPT (distinct semantics in both engines).
  val qSetOps: Q = q(
    "q_setops",
    """SELECT o_custkey FROM (
      |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |   INTERSECT
      |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
      |ORDER BY o_custkey"""
  ) { t =>
    val o = t("orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .orderBy(col("o_custkey"))
  }

  // q_distinct — dropDuplicates == SELECT DISTINCT.
  val qDistinct: Q = q(
    "q_distinct",
    """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderstatus, o_orderpriority"""
  ) { t =>
    t("orders").select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  // q_count_distinct — exact distinct counts per group. (At 100 TB prefer
  // approx_count_distinct; HLL estimates aren't oracle-comparable so the
  // exact form is what's verified.)
  val qCountDistinct: Q = q(
    "q_count_distinct",
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_custs,
      |  COUNT(*) AS n_orders,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  ) { t =>
    t("orders").groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderstatus"))
  }

  // ---------------------------------------------------------------------
  // q_string_fns — scalar string surface (all codegen'd built-ins; the
  // reference's only string work is f-string SQL assembly, generate.py).
  val qString: Q = q(
    "q_string_fns",
    """SELECT c_custkey,
      |  lower(c_name) AS lname,
      |  upper(c_mktsegment) AS useg,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  substr(c_name, 1, 8) AS prefix,
      |  replace(c_name, '#', '-') AS dashed,
      |  concat(c_mktsegment, ':', c_name) AS tagged,
      |  string_split(c_name, '#')[2] AS numpart,
      |  CAST(levenshtein(substr(c_name, 1, 8), 'Customer') AS INT) AS lev
      |FROM customer
      |WHERE c_name LIKE 'Customer#%9'
      |ORDER BY c_custkey"""
  ) { t =>
    t("customer")
      .filter(col("c_name").like("Customer#%9"))
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("lname"),
        upper(col("c_mktsegment")).as("useg"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("prefix"),
        translate(col("c_name"), "#", "-").as("dashed"),
        concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"),
        element_at(split(col("c_name"), "#"), 2).as("numpart"),
        levenshtein(substring(col("c_name"), 1, 8), lit("Customer")).as("lev"))
      .orderBy(col("c_custkey"))
  }

  // q_date_fns — temporal scalar surface; group by derived (year, month).
  val qDate: Q = q(
    "q_date_fns",
    """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  MIN(CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_start,
      |  MAX(last_day(CAST(o_orderdate AS DATE))) AS month_end,
      |  MIN(CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)) AS min_day_off
      |FROM orders
      |GROUP BY 1, 2 ORDER BY y, m"""
  ) { t =>
    t("orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total"),
        min(date_trunc("month", col("o_orderdate")).cast(DateType)).as("month_start"),
        max(last_day(col("o_orderdate").cast(DateType))).as("month_end"),
        min(datediff(col("o_orderdate").cast(DateType), lit(java.sql.Date.valueOf("1995-01-01"))))
          .as("min_day_off"))
      .orderBy(col("y"), col("m"))
  }

  // q_case_agg — conditional aggregation (CASE inside agg); ratio is double
  // division of exact integers.
  val qCaseAgg: Q = q(
    "q_case_agg",
    """SELECT o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      |  CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS finished_share
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
  ) { t =>
    t("orders").groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_finished"),
        sum(when(col("o_totalprice") > 200000, 1).otherwise(0)).as("n_big"),
        (sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast(DoubleType) /
          count(lit(1))).as("finished_share"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------------
  // q_json_events — JSON-in-string extraction (events.props), then agg.
  // Mirrors the reference's JSON envelope decode surface (consumer.py:70)
  // applied to a queryable column.
  val qJson: Q = q(
    "q_json_events",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type"""
  ) { t =>
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    t("events").groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(k).as("sum_k"),
        min(k).as("min_k"),
        max(k).as("max_k"),
        dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  // q_events_sessionize — batch sessionization: 30-min-gap session split via
  // lag + running sum. One shuffle on user_id; exact integer output.
  val qSessionize: Q = q(
    "q_events_sessionize",
    """WITH marked AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
      |           - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
      |             OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
      |FROM marked GROUP BY user_id ORDER BY user_id"""
  ) { t =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts").cast(TimestampType))
    t("events")
      .select(col("user_id"), col("event_id"),
        when(us - lag(us, 1).over(w) > 1800000000L, 1).otherwise(0).as("new_session"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (lit(1) + sum(col("new_session"))).cast(LongType).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------------
  // q_array_fns — array scalar surface over embeddings (exact element ops
  // only; float reductions live in Similarity and are verified separately).
  val qArray: Q = q(
    "q_array_fns",
    """SELECT vec_id, label,
      |  CAST(len(embedding) AS INT) AS dim,
      |  embedding[1] AS first_v,
      |  embedding[64] AS last_v,
      |  list_min(embedding) AS min_v,
      |  list_max(embedding) AS max_v,
      |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id"""
  ) { t =>
    t("embeddings").filter(col("vec_id") < 100)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_v"),
        element_at(col("embedding"), 64).as("last_v"),
        array_min(col("embedding")).as("min_v"),
        array_max(col("embedding")).as("max_v"),
        size(filter(col("embedding"), x => x > lit(0f))).as("n_pos"))
      .orderBy(col("vec_id"))
  }

  // q_window_extras — the rest of the window-function surface: ntile,
  // percent_rank/cume_dist (exact integer ratios → deterministic doubles),
  // first/last/nth value over full frames, and a RANGE frame.
  val qWinExtras: Q = q(
    "q_window_extras",
    """SELECT o_custkey, o_orderkey,
      |  CAST(ntile(4) OVER w AS INT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  first_value(o_orderkey) OVER wf AS first_ok,
      |  last_value(o_orderkey) OVER wf AS last_ok,
      |  nth_value(o_orderkey, 2) OVER wf AS second_ok,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderkey
      |    RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
      |FROM orders
      |WHERE o_custkey % 17 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey"""
  ) { t =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wr = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rangeBetween(-100, Window.currentRow)
    t("orders")
      .filter(col("o_custkey") % 17 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_orderkey")).over(wf).as("first_ok"),
        last(col("o_orderkey")).over(wf).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_ok"),
        sum(dec(col("o_totalprice"))).over(wr).cast(DoubleType).as("range_sum"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  // q_tumbling_batch — the batch dual of the streaming tumbling window
  // (EventStreams.tumblingCounts): same window() expression, no watermark.
  // Oracle via DuckDB time_bucket. This pins the semantics the streaming
  // path is tested against in StreamingSpec.
  val qTumblingBatch: Q = q(
    "q_tumbling_batch",
    """SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) AS w_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY w_start, event_type"""
  ) { t =>
    t("events")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))
  }

  // q_sliding_batch — batch dual of the sliding window (width 10 m, slide
  // 5 m): every event lands in two windows; the oracle reproduces that as
  // two phase-offset time_buckets unioned.
  val qSlidingBatch: Q = q(
    "q_sliding_batch",
    """WITH both_phases AS (
      |  SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) AS w_start,
      |    event_type FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP), INTERVAL 5 MINUTE),
      |    event_type FROM events)
      |SELECT w_start, event_type, COUNT(*) AS n
      |FROM both_phases GROUP BY w_start, event_type
      |ORDER BY w_start, event_type"""
  ) { t =>
    t("events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
      .orderBy(col("w_start"), col("event_type"))
  }

  // q_session_batch — batch dual of session_window(gap 30 m) with full
  // session bounds. Spark merges sessions on strict interval overlap, so a
  // gap of exactly 30 m starts a NEW session → the oracle's split condition
  // is diff >= gap (not >).
  val qSessionBatch: Q = q(
    "q_session_batch",
    """WITH marked AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
      |           - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
      |             OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id,
      |  MIN(ts) AS s_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS s_end,
      |  COUNT(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, s_start"""
  ) { t =>
    t("events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("s_start"))
  }

  // q_stream_join_batch — batch dual of the stream-stream interval join
  // (EventStreams.viewClickJoin): same user, view within 10 minutes before
  // the click. In streaming this is the watermark-bounded-state join; the
  // relational semantics are identical, which is what the oracle pins.
  val qStreamJoinBatch: Q = q(
    "q_stream_join_batch",
    """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id,
      |  CAST(c.ts AS TIMESTAMP) AS c_ts, CAST(v.ts AS TIMESTAMP) AS v_ts
      |FROM events c JOIN events v
      |  ON c.user_id = v.user_id
      |  AND c.event_type = 'click' AND v.event_type = 'view'
      |  AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP)
      |  AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 10 MINUTE
      |ORDER BY click_id, view_id"""
  ) { t =>
    val ev = t("events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    c.join(v, col("user_id") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("c_ts"), col("v_ts"))
      .orderBy(col("click_id"), col("view_id"))
  }

  val all: Seq[Q] = Seq(
    q1, q3, q5, q6, qSemi, qAnti, qTopK, qTopKUdaf, qWinRun, qWinExtras, qRollup, qCube,
    qSetOps, qDistinct, qCountDistinct, qString, qDate, qCaseAgg,
    qJson, qSessionize, qTumblingBatch, qSlidingBatch, qSessionBatch,
    qStreamJoinBatch, qArray)
}
