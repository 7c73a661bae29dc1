package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA over `embeddings.embedding` — the embedding post-processing step a
  * large pipeline runs before indexing (decorrelate, reduce, whiten).
  *
  * Split exactly like the quality classifier (`QualityModel`): the
  * DISTRIBUTED part is one exact co-moment aggregation (order-independent
  * DECIMAL sums of quantized coordinates — the `sim_pca_model` query,
  * hash-checked against DuckDB), the k×k eigensolve runs driver-side on
  * the collected 2145-row moment table (cyclic Jacobi, deterministic),
  * and projection is a narrow map with literal coefficients — no shuffle
  * anywhere past the moment aggregation.
  *
  * 100 TB shape: the (d ≤ e) pair explode fans each row ×2,080, but the
  * hash aggregation is map-side combinable, so every partition collapses
  * to ≤ 2,145 rows before the (tiny) shuffle; driver state is the fixed
  * 64×64 moment matrix regardless of corpus size. Eigenvectors cannot be
  * expressed in static SQL, so the projection itself is ScalaTest-pinned
  * (orthonormality, eigen-residuals, planted-direction recovery,
  * per-component variance = eigenvalue) rather than driver-oracle'd —
  * the moment table the model derives from IS driver-oracle'd.
  */
object Pca {

  val Dim = 64
  // 2^20 quantization: coordinates are O(1) floats, so quantized values
  // are ~±5e6, pairwise products ~2.5e13 — DECIMAL(18,0) operands keep
  // products at precision 37 and sums at 38 in both engines (the
  // QualityModel discipline)
  private val QScale = 1048576.0

  private def dec(c: Column): Column = c.cast(DecimalType(18, 0))

  private def quantized(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast(DoubleType) * lit(QScale)).cast(LongType)).as("q"))

  /** The exact co-moment table: rows (d, e, s) with s = Σ q_d·q_e for
    * 0 ≤ d ≤ e < 64, plus marginals (d, -1, Σ q_d) and the count row
    * (-1, -1, n). Everything downstream (mean, covariance, eigenvectors)
    * is a pure function of these integers. */
  /** The (d ≤ e) pairwise-product aggregation alone — a commutative
    * monoid over rows, so the SAME dataflow maintains the model online
    * (complete-mode streaming aggregate ≡ batch recompute of the prefix;
    * `PcaStreamSpec`). */
  def momentProducts(embs: DataFrame): DataFrame =
    quantized(embs)
      .select(col("q"), explode(sequence(lit(0), lit(Dim - 1))).as("d"))
      .select(col("q"), col("d"),
        explode(sequence(col("d"), lit(Dim - 1))).as("e"))
      .select(col("d"), col("e"),
        (dec(element_at(col("q"), col("d") + 1)) *
          dec(element_at(col("q"), col("e") + 1))).as("p"))
      .groupBy(col("d"), col("e")).agg(sum(col("p")).as("s"))

  def moments(embs: DataFrame): DataFrame = {
    val qv = quantized(embs)
    val prods = momentProducts(embs)
    val marg = qv.select(posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(sum(dec(col("x"))).as("s"))
      .select(col("d"), lit(-1).as("e"), col("s"))
    val cnt = qv.agg(count(lit(1)).as("n"))
      .select(lit(-1).as("d"), lit(-1).as("e"), col("n").as("s"))
    prods.select(col("d"), col("e"), col("s").cast(DecimalType(38, 0)).as("s"))
      .unionAll(marg.select(col("d"), col("e"),
        col("s").cast(DecimalType(38, 0)).as("s")))
      .unionAll(cnt.select(col("d"), col("e"),
        col("s").cast(DecimalType(38, 0)).as("s")))
      .orderBy(col("d"), col("e"))
  }

  /** Eigen model: unit-norm components (rows, descending eigenvalue) and
    * the per-dimension mean, all in ORIGINAL (unquantized) units. */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Driver-side solve from the collected moment rows: exact-integer
    * covariance → cyclic Jacobi eigendecomposition → top-k by value. */
  def fitFromMoments(rows: Array[org.apache.spark.sql.Row], k: Int): Model = {
    val s = Array.ofDim[Double](Dim, Dim)
    val m = new Array[Double](Dim)
    var n = 0.0
    rows.foreach { r =>
      val d = r.getInt(0); val e = r.getInt(1)
      val v = java.lang.Double.parseDouble(
        r.getDecimal(2).toBigInteger.toString)
      if (d == -1 && e == -1) n = v
      else if (e == -1) m(d) = v
      else { s(d)(e) = v; s(e)(d) = v }
    }
    require(n >= 2, s"PCA needs >= 2 vectors, got $n")
    // covariance in quantized units, then rescale once: C = (S/n − μμ')/Q²
    val c = Array.ofDim[Double](Dim, Dim)
    val q2 = QScale * QScale
    for (d <- 0 until Dim; e <- 0 until Dim)
      c(d)(e) = (s(d)(e) / n - (m(d) / n) * (m(e) / n)) / q2
    val (vals, vecs) = jacobi(c)
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    Model(
      mean = m.map(_ / n / QScale),
      eigenvalues = order.map(vals).toArray,
      components = order.map(i => vecs.map(_(i))).toArray)
  }

  def fit(embs: DataFrame, k: Int): Model =
    fitFromMoments(moments(embs).collect(), k)

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues, V) with
    * columns of V the eigenvectors. Deterministic sweep order; converges
    * quadratically — 30 sweeps is far past machine precision for 64×64. */
  private def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 30) {
      sweep += 1
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // stable tan of the rotation angle; theta == 0 (equal diagonal
          // entries) rotates by exactly 45° (t = 1), not 0
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val cth = 1.0 / math.sqrt(t * t + 1.0)
          val sth = t * cth
          var i = 0
          while (i < n) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = cth * aip - sth * aiq
            a(i)(q) = sth * aip + cth * aiq
            i += 1
          }
          i = 0
          while (i < n) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = cth * api - sth * aqi
            a(q)(i) = sth * api + cth * aqi
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = cth * vip - sth * viq
            v(i)(q) = sth * vip + cth * viq
            i += 1
          }
        }
      }
      off = offDiag(a)
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Projection columns over ANY numeric-array column, with LITERAL
    * coefficients: for each kept component c, pc_c = Σ_d
    * comp(c)(d)·(x_d − mean_d), the sum built in fixed d order so replays
    * are bit-identical. Narrow map, no shuffle. */
  def projectCols(model: Model, vec: Column): Seq[Column] =
    model.components.zipWithIndex.toSeq.map { case (comp, ci) =>
      (0 until Dim).map { d =>
        lit(comp(d)) *
          (element_at(vec, d + 1).cast(DoubleType) - lit(model.mean(d)))
      }.reduceLeft(_ + _).as(s"pc$ci")
    }

  def project(embs: DataFrame, model: Model): DataFrame =
    embs.select(col("vec_id") +: projectCols(model, col("embedding")): _*)

  /** The FULL moment table as ONE aggregation — the streamable form: a
    * streaming query admits a single aggregate, so the batch [[moments]]
    * three-aggregate union cannot run in complete output mode, but this
    * per-row explode into products ∪ marginals ∪ count rows followed by
    * one hash aggregate can, and it produces the identical (d, e, s)
    * rows (PcaStreamSpec pins streamed ≡ batch after every micro-batch).
    * State is bounded at 2,145 rows regardless of stream length. */
  def momentRowsStreamable(embs: DataFrame): DataFrame = {
    val d1 = Dim - 1
    val prodRows = expr(
      s"""flatten(transform(sequence(0, $d1), d ->
         |  transform(sequence(d, $d1), e ->
         |    named_struct('d', d, 'e', e,
         |      'p', CAST(CAST(element_at(q, d + 1) AS DECIMAL(18,0))
         |                * CAST(element_at(q, e + 1) AS DECIMAL(18,0)) AS DECIMAL(37,0))))))""".stripMargin)
    val margRows = expr(
      s"""transform(sequence(0, $d1), d ->
         |  named_struct('d', d, 'e', -1,
         |    'p', CAST(element_at(q, d + 1) AS DECIMAL(37,0))))""".stripMargin)
    val cntRow = expr(
      "array(named_struct('d', -1, 'e', -1, 'p', CAST(1 AS DECIMAL(37,0))))")
    quantized(embs)
      .select(explode(concat(prodRows, margRows, cntRow)).as("m"))
      .groupBy(col("m.d").as("d"), col("m.e").as("e"))
      .agg(sum(col("m.p")).cast(DecimalType(38, 0)).as("s"))
  }

  // ------------------------------------------------------------------
  // Driver constraint (round-10 verdict): a DECIMAL(38,0) output column
  // defeats the driver's cross-engine hash canonicalization (the values
  // were cell-exact but the int128 decimal hashed differently from the
  // Spark-parquet and DuckDB sides). Emit the sums as VARCHAR — fully
  // scale-safe (no overflow cliff at higher SFs, unlike BIGINT) and
  // identical digit strings in both engines for scale-0 decimals.
  // `moments` itself keeps DECIMAL(38,0) for the exact driver-side solve.
  val pcaModel: Q = Q(
    "sim_pca_model",
    (s, dir) => moments(Tables.load(s, dir, "embeddings"))
      .select(col("d"), col("e"), col("s").cast(StringType).as("s")),
    Some("""WITH qv AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
      |  FROM embeddings),
      |de AS (
      |  SELECT u.d AS d, v.e AS e,
      |    CAST(q[u.d + 1] AS DECIMAL(18,0)) AS qd,
      |    CAST(q[v.e + 1] AS DECIMAL(18,0)) AS qe
      |  FROM qv, unnest(generate_series(0, 63)) AS u(d),
      |       unnest(generate_series(u.d, 63)) AS v(e)),
      |prods AS (SELECT d, e, SUM(qd * qe) AS s FROM de GROUP BY d, e),
      |marg AS (
      |  SELECT u.d AS d, -1 AS e, SUM(CAST(q[u.d + 1] AS DECIMAL(18,0))) AS s
      |  FROM qv, unnest(generate_series(0, 63)) AS u(d) GROUP BY u.d),
      |cnt AS (SELECT -1 AS d, -1 AS e,
      |  CAST(COUNT(*) AS DECIMAL(38,0)) AS s FROM qv)
      |SELECT d, e, CAST(CAST(s AS DECIMAL(38,0)) AS VARCHAR) AS s FROM prods
      |UNION ALL SELECT d, e, CAST(CAST(s AS DECIMAL(38,0)) AS VARCHAR) FROM marg
      |UNION ALL SELECT d, e, CAST(s AS VARCHAR) FROM cnt
      |ORDER BY d, e""".stripMargin))

  /** Driver-checked pin for the projection/eigensolve half (the pattern of
    * `q_approx_stats_pinned`): fit the full 64-eigenvalue model from the
    * exact moment table, project onto the top-K components, and verify
    * IN-ENGINE over the projected corpus that
    *   - each component's population mean is ~0 (centering correct),
    *   - each component's population variance matches its eigenvalue
    *     (the defining property of a principal axis),
    *   - the mean squared residual equals trace(C) − Σ top-K eigenvalues
    *     (Pythagoras under an orthonormal basis — this simultaneously
    *     checks orthonormality END-TO-END through the projection),
    * plus two driver-computed model invariants (pairwise orthonormality
    * residual, descending eigenvalue order) emitted from the REAL fitted
    * model. The oracle pins every boolean TRUE. Tolerances leave ~100×
    * margin over the 2⁻²⁰ quantization error while still failing on any
    * real defect (wrong normalization, unsorted eigenpairs, mean skipped,
    * non-orthogonal basis).
    */
  private val ProjK = 8

  val pcaProject: Q = Q(
    "sim_pca_project",
    (s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      // full spectrum: top-K components for projection, all 64 eigenvalues
      // for the trace (Σλ = trace(C) exactly, up to Jacobi residual)
      val full = fitFromMoments(moments(embs).collect(), Dim)
      val model = Model(full.mean, full.eigenvalues.take(ProjK),
        full.components.take(ProjK))
      val trace = full.eigenvalues.sum
      // driver-side model invariants (computed from the real model)
      val orthoResid = (for {
        i <- 0 until ProjK; j <- i until ProjK
      } yield {
        val dot = (0 until Dim).map(d =>
          model.components(i)(d) * model.components(j)(d)).sum
        math.abs(dot - (if (i == j) 1.0 else 0.0))
      }).max
      val eigSorted = full.eigenvalues.sliding(2)
        .forall(p => p.length < 2 || p(0) >= p(1) - 1e-12)
      // per-row centered columns, built once and shared by projection,
      // total-energy, and residual — all narrow maps, no shuffle until
      // the single final aggregate
      val centered = (0 until Dim).map(d =>
        element_at(col("embedding"), d + 1).cast(DoubleType) -
          lit(model.mean(d)))
      val pcs = model.components.zipWithIndex.map { case (comp, ci) =>
        (0 until Dim).map(d => lit(comp(d)) * centered(d))
          .reduceLeft(_ + _).as(s"pc$ci")
      }
      val totalSq = centered.map(c => c * c).reduceLeft(_ + _).as("tsq")
      val perRow = embs.select(pcs :+ totalSq: _*)
      val aggCols =
        (0 until ProjK).flatMap { i =>
          Seq(avg(col(s"pc$i")).as(s"m$i"),
            avg(col(s"pc$i") * col(s"pc$i")).as(s"s$i"))
        } :+ avg(col("tsq")).as("ts")
      val one = perRow.agg(aggCols.head, aggCols.tail: _*)
      val rows = (0 until ProjK).map { i =>
        val ev = model.eigenvalues(i)
        val varI = col(s"s$i") - col(s"m$i") * col(s"m$i")
        struct(
          lit(i.toLong).as("pc"),
          (abs(col(s"m$i")) <= lit(1e-4)).as("mean_ok"),
          // abs term: quantized-vs-raw eigenvalue perturbation is bounded
          // by ‖ΔC‖_F ≤ 64·2e-7 ≈ 1.3e-5 (Weyl); trace·1e-4 gives ~10×
          // margin while staying ≪ the smallest eigenvalue of a 64-dim
          // spread spectrum (≈ trace/64)
          (abs(varI - lit(ev)) <= lit(ev) * 0.01 + lit(trace) * 1e-4)
            .as("var_ok"),
          lit(orthoResid <= 1e-10).as("ortho_ok"),
          lit(eigSorted).as("eig_sorted_ok"),
          (abs(col("ts") -
            (0 until ProjK).map(j => col(s"s$j")).reduceLeft(_ + _) -
            lit(trace - model.eigenvalues.sum)) <=
            lit(trace) * 0.01 + 1e-10).as("recon_ok"))
      }
      one.select(explode(array(rows: _*)).as("r"))
        .select(col("r.*")).orderBy(col("pc"))
    },
    Some(s"""SELECT u.pc AS pc, TRUE AS mean_ok, TRUE AS var_ok,
      |  TRUE AS ortho_ok, TRUE AS eig_sorted_ok, TRUE AS recon_ok
      |FROM unnest(generate_series(0, ${ProjK - 1})) AS u(pc)
      |ORDER BY pc""".stripMargin))

  val all: Seq[Q] = Seq(pcaModel, pcaProject)
}
