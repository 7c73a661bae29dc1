package graft.operators

import graft.{Num, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bivariate statistics — correlation, covariance, least-squares
  * regression — plus exact percentiles and a deterministic mode.
  *
  * Spark's built-in corr/covar/regr_* aggregates stream co-moments in
  * partition order, so their double results are NOT order-independent and
  * can't hash-match a single-threaded oracle. Instead the co-moments are
  * accumulated as exact DECIMAL sums (order-independent, distributable via
  * partial aggregation exactly like any SUM) and the closed-form formulas
  * are evaluated on the final doubles — the identical IEEE expression on
  * both engines. The decimal→double conversion goes through the string
  * bridge ([[Num.decToDoubleExact]]) because the squared-term sums exceed
  * 2^53 in scaled magnitude.
  *
  * At scale this is the right shape anyway: five partial-aggregatable sums
  * per group, one shuffle, no second pass — the textbook one-pass
  * covariance rewrite.
  */
object StatsPack {
  import Num._

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  // ------------------------------------------------------------------
  // corr / covar_pop / regression slope+intercept of
  // (x = l_quantity, y = l_extendedprice) per l_returnflag.
  val corrRegr: Q = Q(
    "q_corr_regr",
    (s, dir) => {
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      val sums = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          decToDoubleExact(sum(x)).as("sx"),
          decToDoubleExact(sum(y)).as("sy"),
          decToDoubleExact(sum(x * x)).as("sxx"),
          decToDoubleExact(sum(y * y)).as("syy"),
          decToDoubleExact(sum(x * y)).as("sxy"))
      val nd = col("n").cast(DoubleType)
      val covN = nd * col("sxy") - col("sx") * col("sy") // n²·covar
      val varX = nd * col("sxx") - col("sx") * col("sx") // n²·var(x)
      val varY = nd * col("syy") - col("sy") * col("sy")
      sums.select(
          col("l_returnflag"), col("n"),
          (covN / sqrt(varX * varY)).as("corr_xy"),
          (covN / (nd * nd)).as("covar_pop"),
          (covN / varX).as("slope"),
          ((col("sy") - (covN / varX) * col("sx")) / nd).as("intercept"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH sums AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
      |         * (CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_xy,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS covar_pop,
      |  (CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
      |  (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
      |    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
      |    / CAST(n AS DOUBLE) AS intercept
      |FROM sums ORDER BY l_returnflag""".stripMargin))

  // ------------------------------------------------------------------
  // Exact (interpolated) quartiles of l_quantity per returnflag — Spark
  // `percentile` and DuckDB `quantile_cont` both use the (n-1)·q linear
  // interpolation definition.
  val percentiles: Q = Q(
    "q_percentile_exact",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          expr("percentile(l_extendedprice, 0.9)").as("price_p90"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  quantile_cont(l_extendedprice, 0.9) AS price_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // ------------------------------------------------------------------
  // Deterministic mode: most frequent l_quantity per returnflag, smallest
  // value on frequency ties (both engines' bare mode() breaks ties
  // arbitrarily, so the ranking is stated explicitly).
  val modeQ: Q = Q(
    "q_mode",
    (s, dir) => {
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("freq").desc, col("l_quantity"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("freq"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH counts AS (
      |  SELECT l_returnflag, l_quantity, COUNT(*) AS freq
      |  FROM lineitem GROUP BY l_returnflag, l_quantity),
      |ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY l_returnflag
      |    ORDER BY freq DESC, l_quantity) AS rn
      |  FROM counts)
      |SELECT l_returnflag, l_quantity AS mode_qty, freq
      |FROM ranked WHERE rn = 1 ORDER BY l_returnflag""".stripMargin))

  // ------------------------------------------------------------------
  // Histogram quantiles — the bounded-state estimator that replaces a
  // global sort at scale. q_percentile_exact is the semantics reference;
  // THIS is the plan you run on 100 TB: two scans (min/max, then a
  // 256-bin equi-width histogram — both map-side-combinable aggs whose
  // state is O(bins), never O(rows)), a 256-row cumulative scan, and one
  // bracketing pass. All arithmetic is integer (prices in cents, floor
  // divisions), so estimates are deterministic and the oracle replays
  // them exactly; the bracket_ok boolean is the estimator's GUARANTEE —
  // strictly fewer than `ceil(p·n/100)` values lie below the reported
  // bin's lower bound and at least that many lie at or below its upper
  // bound, i.e. the true p-th percentile is inside the reported bin —
  // verified by exact conditional counts, not trusted.
  private val HistBins = 256L
  private val HistPs = Seq(50L, 90L, 99L)

  val histogramQuantiles: Q = Q(
    "q_quantile_histogram",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val li = t(s, dir, "lineitem")
        .select((col("l_extendedprice") * 100).cast(LongType).as("cents"))
      val stats = li.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"),
        count(lit(1)).as("n"))
      // span/min/count ride the plan as a broadcast 1-row frame
      val binned = li.crossJoin(broadcast(stats))
        .select(col("mn"), col("mx"), col("n"),
          expr(s"((cents - mn) * $HistBins) div (mx - mn + 1)").as("b"))
        .groupBy(col("b"), col("mn"), col("mx"), col("n"))
        .agg(count(lit(1)).as("c"))
      // cumulative over <= 256 ordered bins: a single-partition window on
      // a BOUNDED frame (bin count is the knob, not data size)
      val cum = binned.withColumn("cum",
        sum(col("c")).over(Window.orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ps = HistPs.toDF("p")
      val sel = cum.crossJoin(broadcast(ps))
        .filter(col("cum") * 100 >= col("p") * col("n"))
        .groupBy(col("p"))
        .agg(min(col("b")).as("b"), first(col("mn")).as("mn"),
          first(col("mx")).as("mx"), first(col("n")).as("n"))
        .select(col("p"), col("b"), col("n"),
          // tight bin bounds: b holds cents with b*span <= (cents-mn)*256
          // < (b+1)*span, so lo is the CEILING div and hi is
          // ((b+1)*span - 1) div 256 — floor-div on both would exclude the
          // bin's true extrema whenever span % 256 != 0
          (col("mn") + expr(
            s"(b * (mx - mn + 1) + ${HistBins - 1}) div $HistBins"))
            .as("est_lo"),
          (col("mn") + expr(s"((b + 1) * (mx - mn + 1) - 1) div $HistBins"))
            .as("est_hi"))
      // bracket audit: exact ranks of the bin bounds vs the target rank
      val audit = li.crossJoin(broadcast(sel))
        .groupBy(col("p"), col("b"), col("n"), col("est_lo"), col("est_hi"))
        .agg(
          sum(when(col("cents") < col("est_lo"), 1L).otherwise(0L)).as("below"),
          sum(when(col("cents") <= col("est_hi"), 1L).otherwise(0L)).as("upto"))
      audit.select(col("p"), col("b"), col("est_lo"), col("est_hi"),
          (col("below") * 100 < col("p") * col("n") &&
            col("upto") * 100 >= col("p") * col("n")).as("bracket_ok"))
        .orderBy(col("p"))
    },
    Some(s"""WITH li AS (
      |  SELECT CAST(l_extendedprice * 100 AS BIGINT) AS cents FROM lineitem),
      |st AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx,
      |              CAST(COUNT(*) AS BIGINT) AS n FROM li),
      |bins AS (
      |  SELECT ((cents - mn) * $HistBins) // (mx - mn + 1) AS b,
      |         CAST(COUNT(*) AS BIGINT) AS c
      |  FROM li, st GROUP BY 1),
      |cum AS (
      |  SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM bins),
      |sel AS (
      |  SELECT p, MIN(b) AS b FROM cum,
      |    (SELECT CAST(unnest([${HistPs.mkString(", ")}]) AS BIGINT) AS p)
      |  WHERE cum * 100 >= p * (SELECT n FROM st)
      |  GROUP BY p),
      |est AS (
      |  SELECT p, b,
      |    mn + (b * (mx - mn + 1) + ${HistBins - 1}) // $HistBins AS est_lo,
      |    mn + ((b + 1) * (mx - mn + 1) - 1) // $HistBins AS est_hi, n
      |  FROM sel, st)
      |SELECT p, b, est_lo, est_hi,
      |  ((SELECT COUNT(*) FROM li WHERE cents < est_lo) * 100 < p * n AND
      |   (SELECT COUNT(*) FROM li WHERE cents <= est_hi) * 100 >= p * n)
      |    AS bracket_ok
      |FROM est ORDER BY p""".stripMargin))

  // Per-group histogram quantiles: the same bounded-state estimator keyed
  // by l_returnflag — group stats ride a broadcast dim, the cumulative
  // window is per-(group, ≤256 bins), and the bracket audit runs as one
  // conditional-count pass. This is how per-slice p50/p90 dashboards run
  // at 100 TB: state O(groups × bins), never a per-group sort.
  val histogramQuantilesGrouped: Q = Q(
    "q_quantile_histogram_grouped",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"),
          (col("l_extendedprice") * 100).cast(LongType).as("cents"))
      val stats = li.groupBy(col("g")).agg(min(col("cents")).as("mn"),
        max(col("cents")).as("mx"), count(lit(1)).as("n"))
      val binned = li.join(broadcast(stats), "g")
        .select(col("g"), col("mn"), col("mx"), col("n"),
          expr(s"((cents - mn) * $HistBins) div (mx - mn + 1)").as("b"))
        .groupBy(col("g"), col("b"), col("mn"), col("mx"), col("n"))
        .agg(count(lit(1)).as("c"))
      val cum = binned.withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val ps = Seq(50L, 90L).toDF("p")
      val sel = cum.crossJoin(broadcast(ps))
        .filter(col("cum") * 100 >= col("p") * col("n"))
        .groupBy(col("g"), col("p"))
        .agg(min(col("b")).as("b"), first(col("mn")).as("mn"),
          first(col("mx")).as("mx"), first(col("n")).as("n"))
        .select(col("g"), col("p"), col("b"), col("n"),
          // same tight ceil-lo / floor-of-(end-1)-hi bounds as the
          // ungrouped estimator — see the comment there
          (col("mn") + expr(
            s"(b * (mx - mn + 1) + ${HistBins - 1}) div $HistBins"))
            .as("est_lo"),
          (col("mn") + expr(s"((b + 1) * (mx - mn + 1) - 1) div $HistBins"))
            .as("est_hi"))
      li.join(broadcast(sel), "g")
        .groupBy(col("g"), col("p"), col("b"), col("n"), col("est_lo"),
          col("est_hi"))
        .agg(
          sum(when(col("cents") < col("est_lo"), 1L).otherwise(0L)).as("below"),
          sum(when(col("cents") <= col("est_hi"), 1L).otherwise(0L)).as("upto"))
        .select(col("g"), col("p"), col("b"), col("est_lo"), col("est_hi"),
          (col("below") * 100 < col("p") * col("n") &&
            col("upto") * 100 >= col("p") * col("n")).as("bracket_ok"))
        .orderBy(col("g"), col("p"))
    },
    Some(s"""WITH li AS (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice * 100 AS BIGINT) AS cents
      |  FROM lineitem),
      |st AS (SELECT g, MIN(cents) AS mn, MAX(cents) AS mx,
      |              CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY g),
      |bins AS (
      |  SELECT li.g, ((cents - mn) * $HistBins) // (mx - mn + 1) AS b,
      |         CAST(COUNT(*) AS BIGINT) AS c
      |  FROM li JOIN st ON st.g = li.g GROUP BY li.g, 2),
      |cum AS (
      |  SELECT g, b, SUM(c) OVER (PARTITION BY g ORDER BY b) AS cum FROM bins),
      |sel AS (
      |  SELECT cum.g, p, MIN(b) AS b FROM cum
      |    JOIN st ON st.g = cum.g,
      |    (SELECT CAST(unnest([50, 90]) AS BIGINT) AS p)
      |  WHERE cum * 100 >= p * st.n
      |  GROUP BY cum.g, p),
      |est AS (
      |  SELECT sel.g, p, b,
      |    mn + (b * (mx - mn + 1) + ${HistBins - 1}) // $HistBins AS est_lo,
      |    mn + ((b + 1) * (mx - mn + 1) - 1) // $HistBins AS est_hi, n
      |  FROM sel JOIN st ON st.g = sel.g)
      |SELECT e.g, e.p, e.b, e.est_lo, e.est_hi,
      |  ((SELECT COUNT(*) FROM li WHERE li.g = e.g AND cents < e.est_lo)
      |     * 100 < e.p * e.n AND
      |   (SELECT COUNT(*) FROM li WHERE li.g = e.g AND cents <= e.est_hi)
      |     * 100 >= e.p * e.n) AS bracket_ok
      |FROM est e ORDER BY g, p""".stripMargin))

  val all: Seq[Q] = Seq(corrRegr, percentiles, modeQ, histogramQuantiles,
    histogramQuantilesGrouped)
}
