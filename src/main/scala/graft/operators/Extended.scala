package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second-wave operator coverage: SQL-text gateway (S5 parity), as-of join,
  * pivot, grouping sets, null-handling scalars, exact moments, embedding
  * near-dup, seeded sampling (G3 parity), approximate aggregates.
  */
object Extended {
  // set a session conf for one plan materialization, restoring the PRIOR
  // value afterwards — a bare unset() would clobber a user's own setting
  // (e.g. a globally enabled rewrite) for the rest of the session
  private def withConf[A](s: SparkSession, key: String, value: String)(body: => A): A = {
    val prior = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prior match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  import Num._

  // ------------------------------------------------------------------
  // S5 parity: the reference executes arbitrary SQL text through its
  // gateway (execute_sql_query, postgres.py:65-77). Here: register the
  // testdata as views and run the query as SQL text through spark.sql —
  // same text runs on DuckDB as the oracle.
  private val gatewaySql =
    """SELECT n_name, r_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name, r_name
      |ORDER BY n_name, r_name""".stripMargin

  val sqlGateway: Q = Q(
    "q_sql_gateway",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(gatewaySql) },
    Some(gatewaySql))

  // ------------------------------------------------------------------
  // As-of join: each error event picks up the latest signup of the same
  // user at-or-before it (CDC "snapshot the dimension at the fact's time").
  // Spark side is the merge-sorted union plan (graft.plans.AsOfJoin);
  // oracle uses DuckDB's native ASOF LEFT JOIN.
  val asofJoin: Q = Q(
    "q_asof_join",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
      graft.plans.AsOfJoin.nearestEarlier(errors, signups, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"), col("signup_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("signup_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'error'),
      |s AS (
      |  SELECT event_id AS signup_event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'signup')
      |SELECT e.event_id, e.user_id, s.signup_event_id,
      |  CAST(epoch_us(e.ts) - epoch_us(s.ts) AS BIGINT) AS gap_us
      |FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin))

  // ------------------------------------------------------------------
  // Same as-of semantics on the custom-plan path: AsOfJoinPlan →
  // AsOfJoinStrategy → AsOfJoinExec (GraftExtensions.injectPlannerStrategy),
  // a per-partition sorted merge instead of the union+window rewrite.
  // Identical oracle to q_asof_join — the two implementations must agree
  // bit-for-bit.
  val asofJoinNative: Q = Q(
    "q_asof_join_native",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
      graft.plans.AsOfJoinNative
        .nearestEarlier(errors, signups, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"), col("signup_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("signup_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'error'),
      |s AS (
      |  SELECT event_id AS signup_event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'signup')
      |SELECT e.event_id, e.user_id, s.signup_event_id,
      |  CAST(epoch_us(e.ts) - epoch_us(s.ts) AS BIGINT) AS gap_us
      |FROM e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin))

  // ------------------------------------------------------------------
  // Pivot — wide conditional aggregation; the oracle states it as CASE
  // sums, which is exactly the plan Spark lowers pivot to.
  val pivot: Q = Q(
    "q_pivot",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("o_totalprice"))).cast(DoubleType))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------------------
  // Explicit grouping sets (beyond rollup/cube): ((status, prio), (status), ()).
  val groupingSets: Q = Q(
    "q_grouping_sets",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  // ------------------------------------------------------------------
  // Null-handling scalar surface + null-skipping aggregation semantics.
  val nullFns: Q = Q(
    "q_null_fns",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(nullif(col("o_orderstatus"), lit("P"))).as("n_not_p"),
        min(coalesce(nullif(col("o_orderstatus"), lit("P")), lit("ZZZ"))).as("min_coalesced"),
        sum(when(col("o_orderstatus").isNull, 1).otherwise(0)).cast(LongType).as("n_null_status"))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority,
      |  COUNT(*) AS n_rows,
      |  COUNT(nullif(o_orderstatus, 'P')) AS n_not_p,
      |  MIN(coalesce(nullif(o_orderstatus, 'P'), 'ZZZ')) AS min_coalesced,
      |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  // ------------------------------------------------------------------
  // Exact second moments: variance/stddev from decimal sums. The moments
  // are exact (decimal); the final arithmetic is the same IEEE expression
  // on identical doubles in both engines, so results match bit-for-bit.
  // (Built-in var_pop/stddev use streaming one-pass updates whose float
  // error depends on partitioning — not oracle-comparable; this is the
  // shuffle-friendly two-moment formulation you'd use at scale anyway.)
  val moments: Q = Q(
    "q_stats_moments",
    (s, dir) => {
      val x = dec(col("o_totalprice"))
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          decToDoubleExact(sum(x)).as("sum_x"),
          decToDoubleExact(sum(x * x)).as("sum_x2"))
        .select(
          col("o_orderstatus"), col("n"), col("sum_x"), col("sum_x2"),
          (col("sum_x") / col("n")).as("mean"),
          ((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n")).as("var_pop"),
          sqrt((col("sum_x2") - col("sum_x") * col("sum_x") / col("n")) / col("n")).as("stddev_pop"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH m AS (
      |  SELECT o_orderstatus, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_x,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_x2
      |  FROM orders GROUP BY o_orderstatus)
      |SELECT o_orderstatus, n, sum_x, sum_x2,
      |  sum_x / n AS mean,
      |  (sum_x2 - sum_x * sum_x / n) / n AS var_pop,
      |  sqrt((sum_x2 - sum_x * sum_x / n) / n) AS stddev_pop
      |FROM m ORDER BY o_orderstatus""".stripMargin))

  // ------------------------------------------------------------------
  // Embedding-cosine near-dup detection: integer-quantized cosine over
  // blocked pairs (vec_id < 300 both sides), threshold 0.3 — exact oracle.
  // The unblocked scale path goes through sim_lsh_buckets first.
  private def quantCol(c: String): org.apache.spark.sql.Column =
    graft.functions.VectorExprs.quantize1000(col(c))
  private def dotQ(a: String, b: String): org.apache.spark.sql.Column =
    graft.functions.VectorExprs.dotProductLong(col(a), col(b))

  val embeddingNearDup: Q = Q(
    "dedup_embedding_cosine",
    (s, dir) => {
      // Precompute each row's norm BEFORE the pair join: the dot product is
      // the only per-pair work (1 array fold per pair instead of 3 — the
      // self-norms are row-local and the arithmetic is identical, so the
      // oracle hash is unchanged). At n rows that's 2n folds saved per n²/2
      // pairs.
      val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id"), quantCol("embedding").as("qv"))
        .withColumn("nrm", sqrt(dotQ("qv", "qv").cast(DoubleType)))
      val a = e.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("nrm").as("nb"))
      val cos = dotQ("qa", "qb").cast(DoubleType) / col("na") / col("nb")
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), cos.as("cos"))
        .filter(col("cos") >= 0.3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
      |  FROM embeddings WHERE vec_id < 300),
      |p AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    CAST(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) AS DOUBLE)
      |      / sqrt(CAST(list_sum(list_transform(a.v, x -> x * x)) AS DOUBLE))
      |      / sqrt(CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)) AS cos
      |  FROM q a JOIN q b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, cos FROM p WHERE cos >= 0.3 ORDER BY id_a, id_b""".stripMargin))

  // ------------------------------------------------------------------
  // G3 parity: the reference's only SELECT is ORDER BY RANDOM() LIMIT 1
  // (generate.py:68-70). Hash-ordered pick = same uniform-pick semantics but
  // reproducible AND engine-portable (md5 is identical in Spark and DuckDB),
  // so this is oracle-exact where a seeded rand() cannot be. Executes as
  // TakeOrderedAndProject — O(n) scan + top-1 per partition, no full sort.
  val randomPick: Q = Q(
    "q_random_pick",
    (s, dir) => Tables.load(s, dir, "customer")
      .orderBy(md5(col("c_custkey").cast(StringType)), col("c_custkey"))
      .limit(1)
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer
      |ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 1""".stripMargin))

  // Approximate aggregates — the 100 TB substitutes for exact distinct
  // counts and percentiles; estimates are engine-specific → rows-only,
  // accuracy asserted in unit tests against exact values.
  val approxStats: Q = Q(
    "q_approx_stats",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx_custs"),
        expr("approx_percentile(o_totalprice, 0.5)").as("approx_median"),
        expr("approx_percentile(o_totalprice, 0.95)").as("approx_p95"))
      .orderBy(col("o_orderstatus")),
    None)

  // Oracle-checked twin of q_approx_stats: the sketches' raw estimates are
  // engine-specific, but their ACCURACY CONTRACTS are not — so compute the
  // exact values in the same pass and emit tolerance booleans the DuckDB
  // oracle pins to TRUE. A sketch regression (wrong merge, register loss
  // in partial aggregation, bad serialization) flips a boolean and fails
  // the hash compare. Tolerances: approx_count_distinct rsd defaults to
  // 0.05 → 3σ = 15%; the datasketches HLL (lgK=12, rsd ≈ 1.6%) gets 5%;
  // approx_percentile at default accuracy is pinned inside the exact IQR.
  val approxStatsPinned: Q = Q(
    "q_approx_stats_pinned",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_custs"),
        approx_count_distinct(col("o_custkey")).as("_acd"),
        hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("_hll"),
        expr("approx_percentile(o_totalprice, 0.5)").as("_p50"),
        expr("approx_percentile(o_totalprice, 0.95)").as("_p95"),
        expr("percentile(o_totalprice, 0.25)").as("_ep25"),
        expr("percentile(o_totalprice, 0.75)").as("_ep75"),
        max(col("o_totalprice")).as("_max"))
      .select(col("o_orderstatus"), col("exact_custs"),
        (abs(col("_acd") - col("exact_custs")) <=
          col("exact_custs") * 0.15).as("acd_within_15pct"),
        (abs(col("_hll") - col("exact_custs")) <=
          col("exact_custs") * 0.05).as("hll_within_5pct"),
        (col("_p50") >= col("_ep25") && col("_p50") <= col("_ep75"))
          .as("p50_in_iqr"),
        (col("_p95") >= col("_p50") && col("_p95") <= col("_max"))
          .as("p95_in_range"))
      .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS exact_custs,
      |  TRUE AS acd_within_15pct, TRUE AS hll_within_5pct,
      |  TRUE AS p50_in_iqr, TRUE AS p95_in_range
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // ------------------------------------------------------------------
  // Count-Min sketch point-frequency estimates — the "how frequent is THIS
  // item" companion to the Misra-Gries "which items are frequent" sketch
  // (functions/CountMin.scala). Unlike MG, the CMS buffer is a pure
  // elementwise sum: commutative, associative, PARTITIONING-INDEPENDENT —
  // so with engine-neutral affine hashes the whole sketch is
  // deterministic and the oracle replays the estimates EXACTLY (full
  // value oracle, not the pinned-boolean pattern approx sketches need).
  // Query: sketch o_custkey at 4×64, estimate the 20 most frequent
  // customers, emit (exact, est, overcount_ok) — est ≥ exact always.
  private val CmsD = 4
  private val CmsW = 64

  val cmsCustkey: Q = Q(
    "q_cms_custkey",
    (s, dir) => {
      val keys = Tables.load(s, dir, "orders").select(col("o_custkey"))
      val sketch = keys.agg(
        graft.functions.CountMin.udafFn(CmsD, CmsW)(col("o_custkey")).as("sk"))
      val top = keys.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("o_custkey")).limit(20)
      top.crossJoin(broadcast(sketch))
        .withColumn("est", graft.functions.CountMin.estimateCol(
          col("sk"), col("o_custkey"), CmsD, CmsW))
        .select(col("o_custkey"), col("exact"), col("est"),
          (col("est") >= col("exact")).as("overcount_ok"))
        .orderBy(col("o_custkey"))
    },
    Some {
      val hp = graft.functions.CountMin.HashA
        .zip(graft.functions.CountMin.HashB).take(CmsD).zipWithIndex
        .map { case ((a, b), j) => s"($j, $a, $b)" }.mkString(", ")
      val p = graft.functions.CountMin.P
      s"""WITH hp(j, a, b) AS (VALUES $hp),
         |counters AS (
         |  SELECT hp.j, (((o.o_custkey % $p + $p) % $p * hp.a + hp.b) % $p) % $CmsW AS i,
         |    COUNT(*) AS c
         |  FROM orders o CROSS JOIN hp
         |  GROUP BY hp.j, i),
         |top20 AS (
         |  SELECT o_custkey, COUNT(*) AS exact FROM orders
         |  GROUP BY o_custkey ORDER BY exact DESC, o_custkey LIMIT 20),
         |est AS (
         |  SELECT t.o_custkey, t.exact, MIN(c.c) AS est
         |  FROM top20 t
         |  CROSS JOIN hp
         |  JOIN counters c ON c.j = hp.j
         |    AND c.i = (((t.o_custkey % $p + $p) % $p * hp.a + hp.b) % $p) % $CmsW
         |  GROUP BY t.o_custkey, t.exact)
         |SELECT o_custkey, exact, est, (est >= exact) AS overcount_ok
         |FROM est ORDER BY o_custkey""".stripMargin
    })

  // ------------------------------------------------------------------
  // Theta/band join: equi key (nationkey) + range predicate (acctbal band).
  // Catalyst extracts the equi part as the join key and evaluates the band
  // as a join-time filter — never a cross product. (The pure-theta fallback
  // is cross+filter; a banded equi key is what scales.)
  val bandJoin: Q = Q(
    "q_band_join",
    (s, dir) => Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "supplier"),
        col("c_nationkey") === col("s_nationkey") &&
          abs(col("c_acctbal") - col("s_acctbal")) < 10.0)
      .select(col("c_custkey"), col("s_suppkey"),
        col("c_acctbal"), col("s_acctbal"))
      .orderBy(col("c_custkey"), col("s_suppkey")),
    Some("""SELECT c_custkey, s_suppkey, c_acctbal, s_acctbal
      |FROM customer JOIN supplier
      |  ON c_nationkey = s_nationkey AND abs(c_acctbal - s_acctbal) < 10.0
      |ORDER BY c_custkey, s_suppkey""".stripMargin))

  // ------------------------------------------------------------------
  // Binned range join: interval predicate with NO equi key — the case
  // Spark would plan as a nested-loop cross product. The scale fix is
  // manufacturing the equi key: bin both sides' timestamps at the window
  // width, replicate one side to its 3 adjacent bins (|Δt| ≤ W ⟹ bin
  // distance ≤ 1, so 3 bins are complete and each pair matches exactly
  // once), hash-join on the bin, and apply the exact range filter at the
  // join. Cross product → one shuffle + 3× replication of one side.
  private val RangeW = 60000000L // 60 s in microseconds

  val rangeJoinBinned: Q = Q(
    "q_range_join_binned",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("e_us"))
        .withColumn("bucket", expr(s"e_us div $RangeW"))
      val sgn = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("sgn_id"), unix_micros(col("ts")).as("s_us"))
        .withColumn("bucket", explode(array(
          expr(s"s_us div $RangeW - 1"), expr(s"s_us div $RangeW"),
          expr(s"s_us div $RangeW + 1"))))
      err.join(sgn, Seq("bucket"))
        .filter(abs(col("e_us") - col("s_us")) <= RangeW)
        .select(col("err_id"), col("sgn_id"),
          (col("e_us") - col("s_us")).as("dt_us"))
        .orderBy(col("err_id"), col("sgn_id"))
    },
    Some("""WITH e AS (
      |  SELECT event_id AS err_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
      |  FROM events WHERE event_type = 'error'),
      |s AS (
      |  SELECT event_id AS sgn_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us
      |  FROM events WHERE event_type = 'signup')
      |SELECT err_id, sgn_id, e_us - s_us AS dt_us
      |FROM e JOIN s ON abs(e_us - s_us) <= 60000000
      |ORDER BY err_id, sgn_id""".stripMargin))

  // ------------------------------------------------------------------
  // The SAME band join written naively — no manual binning — and rewritten
  // to the equi shape by the injected optimizer rule
  // ([[graft.plans.BinnedRangeJoinRule]], enabled per-session via
  // spark.graft.binnedRangeJoin.width). The user writes the O(|L|×|R|)
  // BNLJ trap; the optimizer manufactures the bin key. Shares
  // q_range_join_binned's oracle semantics, so the rewrite's exactness is
  // hash-checked by the driver, and the plan is forced while the width is
  // set so the session conf never leaks into later queries.
  val rangeJoinAuto: Q = Q(
    "q_range_join_auto",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("e_us"))
      val sgn = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("sgn_id"), unix_micros(col("ts")).as("s_us"))
      val df = err.join(sgn,
          col("e_us") >= col("s_us") - RangeW &&
          col("e_us") <= col("s_us") + RangeW)
        .select(col("err_id"), col("sgn_id"),
          (col("e_us") - col("s_us")).as("dt_us"))
        .orderBy(col("err_id"), col("sgn_id"))
      withConf(s, "spark.graft.binnedRangeJoin.width", RangeW.toString) {
        // materialize the physical plan NOW (QueryExecution caches it) so
        // the rewrite is baked in and the conf can be restored immediately
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin"),
          "binned-range-join rule did not fire")
      }
      df
    },
    Some("""WITH e AS (
      |  SELECT event_id AS err_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
      |  FROM events WHERE event_type = 'error'),
      |s AS (
      |  SELECT event_id AS sgn_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us
      |  FROM events WHERE event_type = 'signup')
      |SELECT err_id, sgn_id, e_us - s_us AS dt_us
      |FROM e JOIN s ON e_us >= s_us - 60000000 AND e_us <= s_us + 60000000
      |ORDER BY err_id, sgn_id""".stripMargin))

  // ------------------------------------------------------------------
  // Binned interval-OVERLAP join: both sides are intervals of VARIABLE
  // length (start = ts, end = ts + value seconds) and the predicate is
  // overlap (s0 <= e1 AND e0 <= s1) with no equi key — the shape temporal
  // engines special-case and Spark would nested-loop. Same manufactured-
  // equi-key fix as the point-in-window case, generalized: each interval
  // registers in EVERY bin it touches (sequence(start div W .. end div W);
  // lengths are bounded < W so that's ≤ 2 bins), overlapping intervals
  // must share a bin, the exact predicate filters at the join, and a
  // groupBy de-dupes pairs that met in two bins. Cost: one shuffle on the
  // bin key, ≤2× replication — output-linear, never |L|×|R|. (Pair counts
  // themselves grow with interval DENSITY; that's the semantics of
  // overlap, not a plan property.)
  private val OvlW = 120000000L // 120 s in microseconds ≥ max interval len

  /** Core of the binned overlap join, reusable and property-tested: left
    * columns (lid, l0, l1), right columns (rid, r0, r1), closed intervals,
    * every length < `w` (caller's contract — it bounds replication at 2
    * bins per interval). Output: (lid, rid, overlap_us) for each
    * overlapping pair, exactly once.
    */
  def binnedOverlapJoin(left: DataFrame, right: DataFrame, w: Long): DataFrame = {
    require(w > 0, "bin width must be positive")
    def binned(df: DataFrame, a: String, b: String) = df
      .withColumn("bucket", explode(sequence(expr(s"$a div $w"), expr(s"$b div $w"))))
    binned(left, "l0", "l1").join(binned(right, "r0", "r1"), Seq("bucket"))
      .filter(col("l0") <= col("r1") && col("r0") <= col("l1"))
      .groupBy(col("lid"), col("rid")) // a pair can meet in 2 bins
      // the bounds are pair-constant, so min() over the duplicate bin
      // hits IS the overlap value — dedup and compute in one agg
      .agg(min(least(col("l1"), col("r1")) - greatest(col("l0"), col("r0")))
        .as("overlap_us"))
  }

  // The SAME overlap join written naively and auto-rewritten by
  // [[graft.plans.BinnedRangeJoinRule]]'s first-shared-bin case — pairs
  // meet exactly once at bin = max(bin(s0), bin(e0)), so no dedup stage
  // exists in the plan at all (the manual query needs its groupBy). Shares
  // q_interval_overlap's oracle; plan forced while the width is set.
  val intervalOverlapAuto: Q = Q(
    "q_interval_overlap_auto",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("value") < 120.0 &&
          col("ts") < lit("2024-01-08").cast(TimestampType))
      def side(tpe: String, id: String, a: String, b: String) = ev
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(id), unix_micros(col("ts")).as(a),
          (unix_micros(col("ts")) + floor(col("value") * 1000000.0).cast(LongType)).as(b))
      val l = side("signup", "sgn_id", "s0", "s1")
      val r = side("error", "err_id", "e0", "e1")
      val df = l.join(r, col("s0") <= col("e1") && col("e0") <= col("s1"))
        .select(col("sgn_id"), col("err_id"),
          (least(col("s1"), col("e1")) - greatest(col("s0"), col("e0")))
            .as("overlap_us"))
        .orderBy(col("sgn_id"), col("err_id"))
      withConf(s, "spark.graft.binnedRangeJoin.width", OvlW.toString) {
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin"),
          "overlap rewrite did not fire")
      }
      df
    },
    Some("""WITH s AS (
      |  SELECT event_id AS sgn_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS s1
      |  FROM events WHERE event_type = 'signup' AND value < 120
      |    AND ts < TIMESTAMP '2024-01-08'),
      |e AS (
      |  SELECT event_id AS err_id, epoch_us(ts) AS e0,
      |    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e1
      |  FROM events WHERE event_type = 'error' AND value < 120
      |    AND ts < TIMESTAMP '2024-01-08')
      |SELECT sgn_id, err_id,
      |  least(s1, e1) - greatest(s0, e0) AS overlap_us
      |FROM s JOIN e ON s0 <= e1 AND e0 <= s1
      |ORDER BY sgn_id, err_id""".stripMargin))

  val intervalOverlap: Q = Q(
    "q_interval_overlap",
    (s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .filter(col("value") < 120.0 &&
          col("ts") < lit("2024-01-08").cast(TimestampType))
      def side(tpe: String, id: String, a: String, b: String) = ev
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(id), unix_micros(col("ts")).as(a),
          (unix_micros(col("ts")) + floor(col("value") * 1000000.0).cast(LongType)).as(b))
      binnedOverlapJoin(
        side("signup", "lid", "l0", "l1"),
        side("error", "rid", "r0", "r1"), OvlW)
        .select(col("lid").as("sgn_id"), col("rid").as("err_id"), col("overlap_us"))
        .orderBy(col("sgn_id"), col("err_id"))
    },
    Some("""WITH s AS (
      |  SELECT event_id AS sgn_id, epoch_us(ts) AS s0,
      |    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS s1
      |  FROM events WHERE event_type = 'signup' AND value < 120
      |    AND ts < TIMESTAMP '2024-01-08'),
      |e AS (
      |  SELECT event_id AS err_id, epoch_us(ts) AS e0,
      |    epoch_us(ts) + CAST(floor(value * 1000000) AS BIGINT) AS e1
      |  FROM events WHERE event_type = 'error' AND value < 120
      |    AND ts < TIMESTAMP '2024-01-08')
      |SELECT sgn_id, err_id,
      |  least(s1, e1) - greatest(s0, e0) AS overlap_us
      |FROM s JOIN e ON s0 <= e1 AND e0 <= s1
      |ORDER BY sgn_id, err_id""".stripMargin))

  // ------------------------------------------------------------------
  // Subquery forms: correlated scalar subqueries in the projection and an
  // IN-subquery predicate — same SQL text on both engines (Catalyst rewrites
  // the scalars to left-outer aggregated joins, IN to a semi join).
  private val subqueriesSql =
    """SELECT c_custkey,
      |  (SELECT MAX(o_totalprice) FROM orders o WHERE o.o_custkey = c.c_custkey) AS max_price,
      |  (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |  AND c_custkey % 11 = 0
      |ORDER BY c_custkey""".stripMargin

  val subqueries: Q = Q(
    "q_subqueries",
    (s, dir) => { Tables.registerAll(s, dir); s.sql(subqueriesSql) },
    Some(subqueriesSql))

  // ------------------------------------------------------------------
  // Unpivot (melt): wide → long. Oracle states it as UNION ALL, which is
  // exactly what the Expand-based unpivot plan computes.
  val unpivot: Q = Q(
    "q_unpivot",
    (s, dir) => Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 19 === 0)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast(DoubleType).as("c_nationkey_d"))
      .unpivot(
        Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nationkey_d")),
        "metric", "value")
      .orderBy(col("c_custkey"), col("metric")),
    Some("""SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value
      |FROM customer WHERE c_custkey % 19 = 0
      |UNION ALL
      |SELECT c_custkey, 'c_nationkey_d', CAST(c_nationkey AS DOUBLE)
      |FROM customer WHERE c_custkey % 19 = 0
      |ORDER BY c_custkey, metric""".stripMargin))

  // arg-max/arg-min aggregates (max_by/min_by) on a unique ordering key.
  val argMinMax: Q = Q(
    "q_argminmax",
    (s, dir) => Tables.load(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        max_by(col("o_orderstatus"), col("o_orderkey")).as("latest_status"),
        min_by(col("o_orderstatus"), col("o_orderkey")).as("first_status"),
        max(col("o_orderkey")).as("max_ok"),
        min(col("o_orderkey")).as("min_ok"))
      .orderBy(col("o_custkey")),
    Some("""SELECT o_custkey,
      |  max_by(o_orderstatus, o_orderkey) AS latest_status,
      |  min_by(o_orderstatus, o_orderkey) AS first_status,
      |  MAX(o_orderkey) AS max_ok,
      |  MIN(o_orderkey) AS min_ok
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  // TPC-H Q8 shape: market share = conditional revenue / total revenue per
  // year — nested aggregation over a 5-way join, exact decimal numerators
  // and denominators, one double division at the end.
  val marketShare: Q = Q(
    "q8_market_share",
    (s, dir) => {
      val t = (n: String) => Tables.load(s, dir, n)
      val asiaNations = broadcast(
        t("nation").join(broadcast(t("region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
      val rev = dec(col("l_extendedprice")) * (one - rate(col("l_discount")))
      t("lineitem")
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(asiaNations, col("s_nationkey") === col("n_nationkey"), "left")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(
          sum(when(col("n_name").isNotNull, rev).otherwise(lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType).as("asia_rev"),
          sum(rev).cast(DoubleType).as("total_rev"))
        .select(col("y"), col("asia_rev"), col("total_rev"),
          (col("asia_rev") / col("total_rev")).as("asia_share"))
        .orderBy(col("y"))
    },
    Some("""WITH asia AS (
      |  SELECT n_nationkey, n_name FROM nation
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
      |j AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS y,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev,
      |    a.n_name
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  LEFT JOIN asia a ON s_nationkey = a.n_nationkey)
      |SELECT y,
      |  CAST(SUM(CASE WHEN n_name IS NOT NULL THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS asia_rev,
      |  CAST(SUM(rev) AS DOUBLE) AS total_rev,
      |  CAST(SUM(CASE WHEN n_name IS NOT NULL THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    / CAST(SUM(rev) AS DOUBLE) AS asia_share
      |FROM j GROUP BY y ORDER BY y""".stripMargin))

  // ------------------------------------------------------------------
  // Skyline (Pareto frontier) — the preference-query operator relational
  // engines bolt on (Börzsönyi's SKYLINE OF): minimize (extendedprice,
  // quantity) jointly; a point survives iff nothing is ≤ in both and < in
  // one. The engine computes it with a sweep: over DISTINCT value pairs
  // ordered by (price, qty), a point is dominated exactly when the
  // cumulative qty-minimum over its predecessors is ≤ its own qty (any
  // predecessor has lower price or equal price with lower qty). The
  // DuckDB oracle deliberately uses the OTHER formulation — NOT EXISTS
  // over the dominance predicate — so a hash match certifies the sweep
  // against the definition, not against itself.
  //
  // 100 TB shape: the fact collapses to DISTINCT (price, qty) first — a
  // map-side-combinable agg down to value-domain cardinality — and the
  // sweep window runs over THAT (bounded by the value domain, not the
  // table; the skyline semilattice skyline(A∪B) = skyline(skyline(A) ∪
  // skyline(B)) is how you'd shard even the domain if it ever grew).
  val skyline: Q = Q(
    "q_skyline",
    (s, dir) => {
      val pts = Tables.load(s, dir, "lineitem")
        .select((col("l_extendedprice") * 100).cast(LongType).as("price_cents"),
          col("l_quantity").cast(LongType).as("qty"))
        .distinct()
      // Two-pass distributed running-min (r17): the previous global
      // running-min window moved the whole distinct domain to ONE
      // partition (the WindowExec warning). Range-partition by the sweep
      // order, take per-partition minima (pass 1, a P-row collect), seed
      // each partition's running min with the strict-prefix partitions'
      // min (pass 2) — output-identical: the sweep order is total and a
      // row survives iff every strictly-preceding row has qty ≥ … exactly
      // as the window evaluated it.
      val pinned = pts.localCheckpoint(true)
      if (pinned.count() <= graft.Ranks.SmallMax) {
        // bounded domain (by the guard) → the windowed sweep as before;
        // its single partition is a choice here, not a scale hazard
        val w = Window.orderBy(col("price_cents"), col("qty"))
          .rowsBetween(Window.unboundedPreceding, -1)
        pinned.withColumn("prev_min_qty", min(col("qty")).over(w))
          .filter(col("prev_min_qty").isNull ||
            col("prev_min_qty") > col("qty"))
          .select(col("price_cents"), col("qty"))
          .orderBy(col("price_cents"))
      } else {
        val parts = math.max(1, s.sparkContext.defaultParallelism)
        val parted = pinned
          .repartitionByRange(parts, col("price_cents"), col("qty"))
          .withColumn("_pid", spark_partition_id())
          .localCheckpoint(true) // pin ONE partition sampling, both passes
        // pass 1: per-range-partition min(qty) → driver (≤ #partitions)
        val mins = parted.groupBy(col("_pid")).agg(min(col("qty")).as("_m"))
          .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
        // strict-prefix min per partition (None for the first non-empty)
        val prefix = mins.map { case (pid, _) =>
          val before = mins.collect { case (j, m) if j < pid => m }
          (pid, if (before.isEmpty) Option.empty[Long] else Some(before.min))
        }.toSeq
        import s.implicits._
        val prefixDf = prefix.map { case (p, m) => (p, m) }
          .toDF("_pid", "_pmin")
        // pass 2: the running min WITHIN each partition is a PARTITIONED
        // window; combined with the broadcast prefix minima it evaluates
        // exactly the global strictly-preceding min the single-partition
        // window computed
        val wl = Window.partitionBy(col("_pid"))
          .orderBy(col("price_cents"), col("qty"))
          .rowsBetween(Window.unboundedPreceding, -1)
        parted.join(broadcast(prefixDf), "_pid")
          .withColumn("_lmin", min(col("qty")).over(wl))
          .filter((col("_lmin").isNull || col("_lmin") > col("qty")) &&
            (col("_pmin").isNull || col("_pmin") > col("qty")))
          .select(col("price_cents"), col("qty"))
          .orderBy(col("price_cents"))
      }
    },
    Some("""WITH pts AS (
      |  SELECT DISTINCT CAST(l_extendedprice * 100 AS BIGINT) AS price_cents,
      |    CAST(l_quantity AS BIGINT) AS qty
      |  FROM lineitem)
      |SELECT price_cents, qty FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts d
      |  WHERE d.price_cents <= p.price_cents AND d.qty <= p.qty
      |    AND (d.price_cents < p.price_cents OR d.qty < p.qty))
      |ORDER BY price_cents""".stripMargin))

  // ------------------------------------------------------------------
  // Hamming-threshold join, DECLARATIVE form: the caller writes the
  // nested-loop predicate `hamming64(a, b) <= 3` and the
  // HammingBandJoinRule rewrites it to the pigeonhole-exact banded
  // equi-join the dedup operators build by hand (simhash/phash). The
  // signature is an engine-neutral 61-bit integer formula (groups of 8
  // docs share a base; each member flips one distinct low bit, so
  // intra-group distances are exactly 2 and the k=3 search finds every
  // intra-group pair plus any accidental background collisions), which
  // is what lets DuckDB replay the ALL-PAIRS definition with
  // bit_count(xor(..)) — the hash match is banded-plan-vs-definition.
  private val HamMod = (1L << 61) - 1

  val hammingBandAuto: Q = Q(
    "q_hamming_band_auto",
    (s, dir) => {
      val sigs = Tables.load(s, dir, "documents").select(col("doc_id"),
        expr(s"((doc_id div 8) * 2654435761 + 40503) % $HamMod ^ " +
          "shiftleft(CAST(1 AS BIGINT), CAST((doc_id % 8) * 7 AS INT))")
          .as("sig"))
      val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b"))
      val df = a.join(b,
          expr("hamming64(sig_a, sig_b) <= 3 AND id_a < id_b"))
        .select(col("id_a"), col("id_b"),
          expr("hamming64(sig_a, sig_b)").as("dist"))
        .orderBy(col("id_a"), col("id_b"))
      withConf(s, "spark.graft.hammingBandJoin.enabled", "true") {
        // bake the physical plan NOW (QueryExecution caches it) so the
        // rewrite is in and the conf is restored before the next query
        val plan = df.queryExecution.executedPlan.toString
        require(!plan.contains("BroadcastNestedLoopJoin") &&
          !plan.contains("CartesianProduct"),
          "hamming-band-join rule did not fire")
      }
      df
    },
    Some(s"""WITH sigs AS (
      |  SELECT doc_id,
      |    xor(((doc_id // 8) * 2654435761 + 40503) % ${HamMod},
      |        1::BIGINT << ((doc_id % 8) * 7)) AS sig
      |  FROM documents)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist
      |FROM sigs a JOIN sigs b
      |  ON bit_count(xor(a.sig, b.sig)) <= 3 AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin))

  val all: Seq[Q] = Seq(
    sqlGateway, asofJoin, asofJoinNative, pivot, groupingSets, nullFns, moments,
    embeddingNearDup, randomPick, approxStats, approxStatsPinned, cmsCustkey,
    bandJoin,
    rangeJoinBinned, rangeJoinAuto,
    intervalOverlap, intervalOverlapAuto, subqueries, unpivot, argMinMax,
    marketShare, skyline, hammingBandAuto)
}
