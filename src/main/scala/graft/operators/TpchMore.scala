package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped coverage wave 2: the classic decision-support patterns not
  * yet exercised by q1/q3/q5/q6/q8 — EXISTS / NOT-EXISTS correlated
  * predicates, min-cost-per-group join-back (the Q2 correlated scalar min),
  * outer-join count distributions (Q13), conditional revenue share (Q14),
  * per-group scalar-average gating (Q17), and substring-bucketed anti-join
  * rollups (Q22). The testdata has no partsupp/commitdate, so each query is
  * re-grounded on the available columns while keeping the plan shape.
  *
  * Scale notes: every dimension side that fits in memory is broadcast
  * (nation/region/part filters); the Q2 join-back and Q17 per-part average
  * reuse one aggregated side instead of a correlated per-row subquery —
  * exactly the rewrite Catalyst performs for scalar subqueries, stated
  * explicitly so the shuffle keys are visible. All money math is DECIMAL
  * (order-independent) with one final double cast.
  */
object TpchMore {
  import Num._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // Q2 shape: cheapest supplier per part within a region. partsupp stands
  // in as min(l_extendedprice) per (part, supplier) over EUROPE lineitems.
  val q2MinCostSupp: Q = Q(
    "q2_min_cost_supplier",
    (s, dir) => {
      val euSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
      val ps = t(s, dir, "lineitem")
        .join(euSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"), col("n_name"))
        .agg(min(col("l_extendedprice")).as("cost"))
      // per-part min via a window over the ALREADY-AGGREGATED frame, not an
      // agg + self-join back: the self-join shape plans the fact-table scan
      // and aggregation subtree twice, the window reshuffles only the small
      // (part, supplier) aggregate. Same semantics as the oracle's ps/best
      // CTE pair (DuckDB materializes the CTE once).
      val winner = ps
        .withColumn("min_cost",
          min(col("cost")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("l_partkey"))))
        .filter(col("cost") === col("min_cost"))
        .groupBy(col("l_partkey").as("partkey"), col("min_cost"))
        // struct-min orders by s_suppkey first, so this IS min(s_suppkey)
        // while carrying the winner's name along — no re-join to supplier
        // (one fewer scan + broadcast; supplier is 10M rows at SF10k).
        .agg(min(struct(col("s_suppkey"), col("s_name"))).as("w"))
      winner
        .join(broadcast(t(s, dir, "part").filter(col("p_size") < 10)),
          col("partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_brand"), col("min_cost"),
          col("w.s_suppkey").as("best_supp"), col("w.s_name").as("s_name"))
        .orderBy(col("p_partkey"))
    },
    Some("""WITH eu AS (
      |  SELECT s_suppkey, s_name FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |ps AS (
      |  SELECT l_partkey, s_suppkey, MIN(l_extendedprice) AS cost
      |  FROM lineitem JOIN eu ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey, s_suppkey),
      |best AS (
      |  SELECT l_partkey, MIN(cost) AS min_cost FROM ps GROUP BY l_partkey),
      |winner AS (
      |  SELECT ps.l_partkey AS partkey, best.min_cost,
      |    MIN(ps.s_suppkey) AS best_supp
      |  FROM ps JOIN best
      |    ON ps.l_partkey = best.l_partkey AND ps.cost = best.min_cost
      |  GROUP BY ps.l_partkey, best.min_cost)
      |SELECT p_partkey, p_brand, min_cost, best_supp, s_name
      |FROM winner
      |JOIN part ON partkey = p_partkey AND p_size < 10
      |JOIN supplier ON best_supp = s_suppkey
      |ORDER BY p_partkey""".stripMargin))

  // ------------------------------------------------------------------
  // Q4 shape: order-priority checking — orders in a quarter with at least
  // one lineitem shipped 60+ days after the order date (EXISTS → left semi).
  val q4PriorityExists: Q = Q(
    "q4_priority_exists",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-07-01").cast(TimestampType))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------------------
  // Q10 shape: revenue lost to returned items per customer, top 20.
  // Deterministic cut: revenue is an exact decimal sum (ties broken by key).
  val q10ReturnedRev: Q = Q(
    "q10_returned_revenue",
    (s, dir) => {
      val rev = dec(col("l_extendedprice")) * (one - rate(col("l_discount")))
      t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(rev).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  // ------------------------------------------------------------------
  // Q13 shape: distribution of per-customer order counts, via a
  // conditioned LEFT OUTER join (the join predicate filter, not a WHERE).
  val q13OrderDist: Q = Q(
    "q13_order_distribution",
    (s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""WITH per_cust AS (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT c_count, COUNT(*) AS custdist
      |FROM per_cust GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  // ------------------------------------------------------------------
  // Q14 shape: promo revenue share in one month — conditional aggregation
  // over a fact→dim join, exact decimal numerator/denominator.
  val q14PromoShare: Q = Q(
    "q14_promo_share",
    (s, dir) => {
      val rev = dec(col("l_extendedprice")) * (one - rate(col("l_discount")))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .join(broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast(DecimalType(12, 2)))).cast(DoubleType).as("promo_rev"),
          sum(rev).cast(DoubleType).as("total_rev"))
        .select(col("promo_rev"), col("total_rev"),
          (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"))
    },
    Some("""SELECT
      |  CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS promo_rev,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_rev,
      |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS promo_pct
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin))

  // ------------------------------------------------------------------
  // Q17 shape: revenue from small-quantity lineitems of one brand, gated by
  // a per-part scalar average (stated as agg + join-back — the Catalyst
  // rewrite of the correlated subquery, with exact decimal averages).
  val q17SmallQty: Q = Q(
    "q17_small_qty_revenue",
    (s, dir) => {
      // per-part average as a window over the brand-joined frame, not a
      // second scan+agg of lineitem joined back: the brand filter restricts
      // PARTS, so each surviving part still contributes all its lineitems —
      // the window average equals the correlated per-part average, with the
      // fact read once. Same exact-average formula as the oracle (decimal
      // sum → double, one division).
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          sum(dec(col("l_quantity"))).over(w).cast(DoubleType) /
            count(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
        .agg(count(lit(1)).as("n_items"),
          (dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },
    Some("""WITH per_part AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#4'
      |JOIN per_part ON l_partkey = pk
      |WHERE l_quantity < 0.5 * avg_qty""".stripMargin))

  // ------------------------------------------------------------------
  // Q22 shape: above-average-balance customers with no orders, bucketed by
  // a name substring — scalar subquery + NOT EXISTS (left anti) + rollup.
  val q22IdleCust: Q = Q(
    "q22_idle_customers",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      // every customer has SOME order in this testdata, so the idle
      // predicate is "no recent urgent order" — same NOT-EXISTS → anti-join
      // shape, non-degenerate result
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_orderdate") >= lit("1999-01-01").cast(TimestampType))
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(substring(col("c_name"), 17, 2).as("code"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("code"))
    },
    Some("""SELECT substr(c_name, 17, 2) AS code, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(c_acctbal)
      |    FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |    AND o_orderpriority = '1-URGENT'
      |    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY substr(c_name, 17, 2)
      |ORDER BY code""".stripMargin))

  val all: Seq[Q] = Seq(q2MinCostSupp, q4PriorityExists, q10ReturnedRev,
    q13OrderDist, q14PromoShare, q17SmallQty, q22IdleCust)
}
