package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-shaped coverage wave 3: nation-pair volume (Q7), profit rollup
  * (Q9), late-shipment priority counts (Q12), top-supplier scalar-max
  * (Q15), distinct-supplier counting with exclusion anti-join (Q16), large
  * orders via HAVING join-back (Q18), disjunctive multi-range predicates
  * (Q19), and sole-late-shipper multi-EXISTS (Q21). The testdata lacks
  * partsupp/commitdate/shipmode, so each query is re-grounded on available
  * columns (late := shipped >90 days after order date) while preserving the
  * original's plan shape — which is what exercises the optimizer.
  *
  * Scale notes: nation/region/part-subset sides are broadcast; the Q15
  * global max is computed on the already-aggregated per-supplier frame
  * (25k rows at SF100) and broadcast back, never a single-partition window
  * over the fact table; Q21's two correlated EXISTS become one semi and one
  * anti hash-join on the order key, both streamed against the same shuffle.
  */
object TpchWave3 {
  import Num._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def rev = graft.Num.revenue
  private val sqlRev = graft.Num.sqlRevenue

  // ------------------------------------------------------------------
  // Q7 shape: shipping volume between two nations, by direction and year.
  val q7Volume: Q = Q(
    "q7_nation_volume",
    (s, dir) => {
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation")))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sk"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(n2, col("c_nationkey") === col("ck"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(decToDoubleExact(sum(rev)).as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year,
      |  CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS volume
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS INT) AS l_year, $sqlRev AS vol
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  // ------------------------------------------------------------------
  // Q9 shape: profit (revenue proxy — no supplycost column) by supplier
  // nation and order year, for parts whose name contains 'gear'.
  val q9Profit: Q = Q(
    "q9_product_profit",
    (s, dir) => {
      t(s, dir, "lineitem")
        // part grows with SF — no explicit hint (a user broadcast() is
        // honored unconditionally; only planner-estimated joins get AQE
        // demotion). The planner auto-broadcasts at small SF.
        .join(t(s, dir, "part")
          .filter(col("p_name").contains("gear")).select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(decToDoubleExact(sum(rev)).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(CAST(SUM($sqlRev) AS VARCHAR) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin))

  // ------------------------------------------------------------------
  // Q12 shape: late-shipment order counts by line status, split into
  // high/low priority — conditional agg over a fact→fact join.
  val q12LateLines: Q = Q(
    "q12_late_shipments",
    (s, dir) => {
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!highPrio, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  // ------------------------------------------------------------------
  // Q15 shape: supplier(s) with the maximum quarterly revenue. The max is
  // taken over the per-supplier aggregate (small) and broadcast back —
  // never a global window over the fact table.
  val q15TopSupplier: Q = Q(
    "q15_top_supplier",
    (s, dir) => {
      // perSupp is supplier-cardinality — small today, but it GROWS with
      // the data, so a global max window over it would still be a
      // single-reducer pass at 100×. Instead: persist the per-supplier
      // aggregate (one lineitem scan total), reduce it to a 1-row scalar
      // max, and broadcast that back — every step after the fact-table agg
      // is either fully parallel or a 1-row broadcast. The persist has no
      // matching unpersist in-plan (the query is returned lazily); one
      // supplier-cardinality frame per invocation, LRU-evictable, and the
      // multi-sweep bench clears the session cache between sweeps so
      // repeated runs don't accumulate copies.
      val perSupp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .groupBy(col("l_suppkey"))
        .agg(decToDoubleExact(sum(rev)).as("total_rev"))
        .persist()
      perSupp
        .crossJoin(broadcast(perSupp.agg(max(col("total_rev")).as("max_rev"))))
        .filter(col("total_rev") === col("max_rev"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH per_supp AS (
      |  SELECT l_suppkey, CAST(CAST(SUM($sqlRev) AS VARCHAR) AS DOUBLE) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_rev
      |FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM per_supp)
      |ORDER BY s_suppkey""".stripMargin))

  // ------------------------------------------------------------------
  // Q16 shape: how many distinct suppliers serve each (brand, type, size
  // bucket), excluding one brand and an "excluded supplier" list (names
  // ending in '7' — the complaints stand-in) via left anti join.
  val q16SupplierCnt: Q = Q(
    "q16_parts_supplier_cnt",
    (s, dir) => {
      val excluded = t(s, dir, "supplier")
        .filter(col("s_name").endsWith("7")).select(col("s_suppkey"))
      t(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey"))
        // supplier and part both grow with SF — unhinted (see q9's note)
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_size") >= 20),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#5' AND p_size >= 20
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  // ------------------------------------------------------------------
  // Q18 shape: large-volume orders — HAVING on a per-order quantity sum,
  // joined back to customer/orders detail.
  val q18LargeOrders: Q = Q(
    "q18_large_orders",
    (s, dir) => {
      // HAVING compares the DECIMAL sum (exact in both engines); the
      // string bridge only converts the surviving output values.
      val bigOrders = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("big_okey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > 150)
        .select(col("big_okey"), decToDoubleExact(col("qty_dec")).as("total_qty"))
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("big_okey"))
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    Some("""WITH big AS (
      |  SELECT l_orderkey AS big_okey,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
      |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
      |  total_qty
      |FROM orders
      |JOIN big ON o_orderkey = big_okey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin))

  // ------------------------------------------------------------------
  // Q19 shape: disjunction of three (brand, size-range, qty-range)
  // conjunctions — one broadcast join, OR predicate evaluated post-join
  // (classic disjunctive-pushdown exercise).
  val q19Disjunctive: Q = Q(
    "q19_disjunctive_rev",
    (s, dir) => {
      t(s, dir, "lineitem")
        // part grows with SF — unhinted (see q9's note)
        .join(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
            col("l_quantity").between(20, 40)))
        .agg(decToDoubleExact(sum(rev)).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""SELECT CAST(CAST(SUM($sqlRev) AS VARCHAR) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |    AND l_quantity BETWEEN 1 AND 20)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |    AND l_quantity BETWEEN 10 AND 30)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
      |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin))

  // ------------------------------------------------------------------
  // Q21 shape: suppliers who were the SOLE late shipper on a multi-supplier
  // order (late := shipped >90 days after order date). The two correlated
  // EXISTS become a semi join (another supplier participated) and an anti
  // join (no OTHER supplier was late), both hashed on the order key.
  val q21SoleLate: Q = Q(
    "q21_sole_late_shipper",
    (s, dir) => {
      // Single-scan rewrite of the EXISTS / NOT EXISTS pair: both are
      // order-level predicates, so ONE lineitem⋈orders join feeds a
      // two-level aggregation — (orderkey, suppkey) partials, then the
      // orderkey rollup that decides "has another supplier" (n_supp > 1)
      // and "sole late supplier" (n_late_supp == 1). The explicit
      // repartition on orderkey ALONE is the one lineitem-sized exchange:
      // HashPartitioning(orderkey) satisfies the clustering of BOTH aggs
      // (grouping by the finer (orderkey, suppkey) included), whereas
      // letting the first agg shuffle on its own keys would re-exchange
      // for the rollup. The old shape scanned lineitem three times and
      // shuffled it separately for the semi and anti joins. numwait sums
      // the sole supplier's late LINES, matching COUNT(*) over l1 rows.
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
            .as("is_late"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late_lines"))
      perSupp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          count(when(col("n_late_lines") > 0, 1)).as("n_late_supp"),
          max(when(col("n_late_lines") > 0, col("l_suppkey"))).as("late_supp"),
          sum(col("n_late_lines")).as("order_late_lines"))
        .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
        .join(t(s, dir, "supplier") // grows with SF — unhinted
          .select(col("s_suppkey"), col("s_name")),
          col("late_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("order_late_lines")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""WITH late AS (
      |  SELECT l_orderkey, l_suppkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |SELECT s_name, COUNT(*) AS numwait
      |FROM late l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM late l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin))

  // ------------------------------------------------------------------
  // Q11 shape: "important" parts — parts whose revenue from one nation's
  // suppliers exceeds a fraction of that nation's total. The global total
  // is an aggregate of the already-aggregated per-part frame, broadcast
  // back (scalar-subquery rewrite made explicit).
  val q11ImportantParts: Q = Q(
    "q11_important_parts",
    (s, dir) => {
      val natSupp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation").filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      // natSupp is ~1/|nations| of supplier — still linear in SF, so
      // unhinted (see q9's note); auto-broadcast covers small SF
      val perPart = t(s, dir, "lineitem")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(rev).as("value_dec"))
      val total = perPart.agg(sum(col("value_dec")).as("total_dec"))
      perPart.join(broadcast(total))
        // exact cross-multiplication (0.002 = 1/500): value*500 > total
        // stays in DECIMAL — decimal * double is the documented
        // engine-divergent path (Num.decToDoubleExact) past 2^53
        .filter(col("value_dec") * lit(500) > col("total_dec"))
        .select(col("l_partkey"),
          decToDoubleExact(col("value_dec")).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some(s"""WITH nat_supp AS (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'),
      |per_part AS (
      |  SELECT l_partkey, SUM($sqlRev) AS value_dec
      |  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey)
      |SELECT l_partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS value
      |FROM per_part
      |WHERE value_dec * 500 > (SELECT SUM(value_dec) FROM per_part)
      |ORDER BY value DESC, l_partkey""".stripMargin))

  // ------------------------------------------------------------------
  // Q20 shape: suppliers with an outsized share of a part family's volume —
  // per-(part, supplier) shipped quantity vs the part's total, threshold
  // semi-join back to suppliers. Per-part total via window over the
  // aggregated frame (single fact scan, as q2/q17).
  val q20ExcessSuppliers: Q = Q(
    "q20_excess_suppliers",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      val ps = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").contains("bolt")).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
      val excess = ps
        .withColumn("tot_dec", sum(col("qty_dec")).over(w))
        // exact cross-multiplication (0.2 = 1/5), same rationale as q11
        .filter(col("qty_dec") * lit(5) > col("tot_dec"))
        .select(col("l_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%bolt%'
      |  GROUP BY l_partkey, l_suppkey),
      |tot AS (
      |  SELECT *, SUM(qty_dec) OVER (PARTITION BY l_partkey) AS tot_dec
      |  FROM ps)
      |SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT DISTINCT l_suppkey FROM tot WHERE qty_dec * 5 > tot_dec)
      |ORDER BY s_suppkey""".stripMargin))

  val all: Seq[Q] = Seq(q7Volume, q9Profit, q11ImportantParts, q12LateLines,
    q15TopSupplier, q16SupplierCnt, q18LargeOrders, q19Disjunctive,
    q20ExcessSuppliers, q21SoleLate)
}
