package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-based quality scoring: train a ridge-regression classifier on
  * heuristic quality labels, then score the corpus with it — the
  * fastText-style "train a scorer on labeled-by-heuristic data" step of a
  * real training-data pipeline (cf. the quality-filter stage the heuristic
  * queries in [[TextAnalysis]] implement directly).
  *
  * 100 TB shape: ONE map-side-combinable aggregation pass accumulates the
  * normal-equation co-moments X'X / X'y as exact DECIMAL sums of integer
  * features (the StatsPack corr/regr discipline — order-independent,
  * distributable, O(k²) state per partial regardless of row count); the
  * k×k system (k = 5: intercept + 4 quality signals) is solved
  * driver-side; scoring is a narrow map with the coefficients inlined as
  * literals. No shuffle beyond the one partial-agg exchange.
  *
  * Oracle exactness: the Gaussian-elimination solve is generated ONCE as a
  * tiny expression AST ([[LinSolve]]) and then (a) evaluated step-by-step
  * in Scala on the driver and (b) rendered as DuckDB SQL lateral-alias
  * bindings with the identical operation order — so both engines execute
  * the same IEEE-754 op sequence and the resulting doubles (coefficients
  * AND per-document scores) are bit-identical, not merely close. The
  * decimal→double conversions go through the string bridge (correctly
  * rounded strtod on both engines, see graft.Num.decToDoubleExact).
  */
object QualityModel {

  // ------------------------------------------------------------------
  // LinSolve: a shared-expression-DAG linear solver. Gaussian elimination
  // without pivoting (valid: X'X + λI is symmetric positive definite, so
  // every pivot is strictly positive) followed by back substitution, as an
  // ordered list of named single-operation bindings.
  private[graft] object LinSolve {
    sealed trait E
    final case class Ref(n: String) extends E
    final case class Sub(l: E, r: E) extends E
    final case class Mul(l: E, r: E) extends E
    final case class Div(l: E, r: E) extends E

    def render(e: E): String = e match {
      case Ref(n)    => n
      case Sub(l, r) => s"(${render(l)} - ${render(r)})"
      case Mul(l, r) => s"(${render(l)} * ${render(r)})"
      case Div(l, r) => s"(${render(l)} / ${render(r)})"
    }

    def eval(e: E, env: collection.Map[String, Double]): Double = e match {
      case Ref(n)    => env(n)
      case Sub(l, r) => eval(l, env) - eval(r, env)
      case Mul(l, r) => eval(l, env) * eval(r, env)
      case Div(l, r) => eval(l, env) / eval(r, env)
    }

    /** Ordered bindings solving A·β = b for a symmetric k×k system whose
      * inputs are pre-bound as m{i}{j} (upper triangle incl. diagonal;
      * the symmetric initial lower-triangle entry reuses the same name)
      * and v{i}. Solutions land in beta0..beta{k-1}. Binding order is a
      * topological order, so the SQL rendering is a valid lateral-alias
      * chain and the Scala evaluation is a simple left fold.
      */
    def solveSteps(k: Int): Seq[(String, E)] = {
      val a = Array.tabulate(k, k)((i, j) =>
        s"m${math.min(i, j)}${math.max(i, j)}")
      val b = Array.tabulate(k)(i => s"v$i")
      val steps = Seq.newBuilder[(String, E)]
      for (i <- 0 until k; j <- (i + 1) until k) {
        val f = s"f$j$i"
        steps += f -> Div(Ref(a(j)(i)), Ref(a(i)(i)))
        for (c <- (i + 1) until k) {
          val nn = s"e$j${c}p$i"
          steps += nn -> Sub(Ref(a(j)(c)), Mul(Ref(f), Ref(a(i)(c))))
          a(j)(c) = nn
        }
        val nb = s"w${j}p$i"
        steps += nb -> Sub(Ref(b(j)), Mul(Ref(f), Ref(b(i))))
        b(j) = nb
      }
      for (i <- (k - 1) to 0 by -1) {
        var acc: E = Ref(b(i))
        for (c <- (i + 1) until k)
          acc = Sub(acc, Mul(Ref(a(i)(c)), Ref(s"beta$c")))
        steps += s"beta$i" -> Div(acc, Ref(a(i)(i)))
      }
      steps.result()
    }

    /** Driver-side solve: upper-triangle input `a(i)(j)` (j >= i), rhs
      * `b`, via the same step list the SQL oracle renders. */
    def solveDense(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      val k = b.length
      val env = scala.collection.mutable.HashMap[String, Double]()
      for (i <- 0 until k; j <- i until k) env(s"m$i$j") = a(i)(j)
      for (i <- 0 until k) env(s"v$i") = b(i)
      solveSteps(k).foreach { case (n, e) => env(n) = eval(e, env) }
      Array.tabulate(k)(i => env(s"beta$i"))
    }

    /** The step list as DuckDB lateral-alias SELECT items. */
    def solveSqlItems(k: Int): String =
      solveSteps(k).map { case (n, e) => s"${render(e)} AS $n" }
        .mkString(",\n    ")
  }

  // ------------------------------------------------------------------
  // Feature map: intercept + 4 integer-exact quality signals (the same
  // expressions text_quality gates on, so the teacher label is exactly
  // the heuristic quality_ok).
  private val K = 5
  private val Ridge = 1.0 // λ, applied to every diagonal entry incl. bias

  private val stop = Seq("the", "a", "of", "and", "to", "in")
  private val stopSql = stop.map(s => s"'$s'").mkString(", ")

  private def toks: Column = split(col("text"), " ")

  /** doc_id, x1..x4 (ints), y (0/1 heuristic label). */
  private[graft] def feats(docs: DataFrame): DataFrame = {
    val nTok = size(toks)
    val nPunct = length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
    docs.select(
      col("doc_id"),
      nTok.as("x1"),
      nPunct.as("x2"),
      size(filter(toks, w => w.isin(stop: _*))).as("x3"),
      length(regexp_replace(col("text"), " ", "")).as("x4"),
      when(nTok.between(5, 100000) && nPunct * 10 < length(col("text")), 1)
        .otherwise(0).as("y"))
  }

  private val featsSql: String =
    s"""feats AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
      |    CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS BIGINT) AS x2,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopSql))) AS BIGINT) AS x3,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS x4,
      |    CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 100000
      |          AND length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 10
      |              < length(text)
      |      THEN 1 ELSE 0 END AS y
      |  FROM documents)""".stripMargin

  // co-moment sums: s{i}{j} = Σ xi·xj (x0 ≡ 1), t{i} = Σ xi·y — all exact
  // DECIMAL; feature operands cast to DECIMAL(18,0) so products stay at
  // precision 37 and sums at 38 in both engines.
  private val xNames = Seq("x1", "x2", "x3", "x4")

  private def sumsAgg: Seq[Column] = {
    def d(c: String) = col(c).cast(DecimalType(18, 0))
    val s = Seq.newBuilder[Column]
    s += count(lit(1)).as("s00")
    for (i <- 1 until K) s += sum(d(xNames(i - 1))).as(s"s0$i")
    for (i <- 1 until K; j <- i until K)
      s += sum(d(xNames(i - 1)) * d(xNames(j - 1))).as(s"s$i$j")
    s += sum(col("y").cast(DecimalType(18, 0))).as("t0")
    for (i <- 1 until K)
      s += sum(d(xNames(i - 1)) * col("y").cast(DecimalType(18, 0)))
        .as(s"t$i")
    s.result()
  }

  private val sumsSql: String = {
    def d(c: String) = s"CAST($c AS DECIMAL(18,0))"
    val items = Seq.newBuilder[String]
    items += "CAST(COUNT(*) AS BIGINT) AS s00"
    for (i <- 1 until K) items += s"SUM(${d(xNames(i - 1))}) AS s0$i"
    for (i <- 1 until K; j <- i until K)
      items += s"SUM(${d(xNames(i - 1))} * ${d(xNames(j - 1))}) AS s$i$j"
    items += s"SUM(${d("y")}) AS t0"
    for (i <- 1 until K)
      items += s"SUM(${d(xNames(i - 1))} * ${d("y")}) AS t$i"
    s"sums AS (\n  SELECT ${items.result().mkString(",\n    ")}\n  FROM feats)"
  }

  // decimal→double string bridge + ridge on the diagonal, as the matrix
  // bindings m{i}{j} / v{i} the solver consumes.
  private val matSql: String = {
    def bridge(c: String) = s"CAST(CAST($c AS VARCHAR) AS DOUBLE)"
    val items = Seq.newBuilder[String]
    for (i <- 0 until K; j <- i until K) {
      val src = bridge(s"s$i$j")
      // the diagonal ridge term renders FROM the Ridge constant so the
      // oracle can never silently diverge from the engine's λ
      items += (if (i == j) s"($src + CAST($Ridge AS DOUBLE)) AS m$i$j"
                else s"$src AS m$i$j")
    }
    for (i <- 0 until K) items += s"${bridge(s"t$i")} AS v$i"
    s"mat AS (\n  SELECT ${items.result().mkString(",\n    ")}\n  FROM sums)"
  }

  private val solveSql: String =
    s"solve AS (\n  SELECT ${LinSolve.solveSqlItems(K)}\n  FROM mat)"

  /** Driver-side training: one aggregation job → exact co-moment row →
    * string-bridge doubles → shared-DAG solve. Returns beta0..beta4.
    * `ridge` is overridable so the planted-relationship spec can solve
    * the unregularized system (λ=0 recovers an exact linear label). */
  private[graft] def train(featFrame: DataFrame,
      ridge: Double = Ridge): Array[Double] = {
    val row = featFrame.agg(sumsAgg.head, sumsAgg.tail: _*).head()
    def asD(name: String): Double = row.get(row.fieldIndex(name)) match {
      case l: java.lang.Long => l.toDouble
      case d: java.math.BigDecimal =>
        java.lang.Double.parseDouble(d.toBigInteger.toString)
      case other => throw new IllegalStateException(
        s"unexpected co-moment type for $name: $other")
    }
    val a = Array.tabulate(K, K) { (i, j) =>
      if (j >= i) {
        val base = asD(s"s$i$j")
        if (i == j) base + ridge else base
      } else 0.0
    }
    val b = Array.tabulate(K)(i => asD(s"t$i"))
    LinSolve.solveDense(a, b)
  }

  /** Left-associated inlined-literal score, matching the SQL text
    * ((((beta0 + beta1*x1) + beta2*x2) + beta3*x3) + beta4*x4). */
  private def scoreCol(beta: Array[Double]): Column =
    (1 until K).foldLeft(lit(beta(0)): Column)((acc, i) =>
      acc + lit(beta(i)) * col(xNames(i - 1)).cast(DoubleType))

  private val scoreSql: String =
    (1 until K).foldLeft("beta0")((acc, i) =>
      s"($acc + (beta${i} * CAST(${xNames(i - 1)} AS DOUBLE)))")

  // ------------------------------------------------------------------
  val classifierQ: Q = Q(
    "text_quality_classifier",
    (s, dir) => {
      val f = feats(Tables.load(s, dir, "documents"))
      val beta = train(f)
      f.select(col("doc_id"), col("y").cast(IntegerType).as("label"),
          scoreCol(beta).as("score"))
        .withColumn("predicted", (col("score") >= 0.5).cast(IntegerType))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $featsSql,
      |$sumsSql,
      |$matSql,
      |$solveSql
      |SELECT doc_id, CAST(y AS INT) AS label,
      |  $scoreSql AS score,
      |  CAST($scoreSql >= 0.5 AS INT) AS predicted
      |FROM feats, solve ORDER BY doc_id""".stripMargin))

  /** The learned model itself: one row per coefficient. */
  val modelQ: Q = Q(
    "text_quality_classifier_model",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val beta = train(feats(Tables.load(s, dir, "documents")))
      (0 until K).map(i => (s"beta$i", beta(i))).toDF("coef", "value")
        .orderBy(col("coef"))
    },
    Some(s"""WITH $featsSql,
      |$sumsSql,
      |$matSql,
      |$solveSql
      |SELECT u.coef, u.value FROM solve, LATERAL (
      |  SELECT * FROM (VALUES ('beta0', beta0), ('beta1', beta1),
      |    ('beta2', beta2), ('beta3', beta3), ('beta4', beta4))
      |    AS t(coef, value)) u
      |ORDER BY u.coef""".stripMargin))

  /** Threshold sweep: confusion-matrix counts of the trained scorer
    * against its teacher labels at several operating points — the
    * model-quality measurement a pipeline runs before picking the
    * filtering threshold. One narrow scoring pass + one hash aggregation
    * per sweep (state O(#thresholds)); ratios are IEEE divisions of
    * exact BIGINT counts, so the oracle replays them bit-exactly. */
  private val EvalThresholds = Seq(0.3, 0.5, 0.7)

  val evalQ: Q = Q(
    "text_quality_classifier_eval",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val f = feats(Tables.load(s, dir, "documents"))
      val beta = train(f)
      val scored = f.select(col("y"), scoreCol(beta).as("score"))
      val th = EvalThresholds.toDF("threshold")
      scored.crossJoin(broadcast(th))
        .groupBy(col("threshold"))
        .agg(
          sum(when(col("score") >= col("threshold") && col("y") === 1, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("threshold") && col("y") === 0, 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") < col("threshold") && col("y") === 0, 1L)
            .otherwise(0L)).as("tn"),
          sum(when(col("score") < col("threshold") && col("y") === 1, 1L)
            .otherwise(0L)).as("fn"))
        .select(col("threshold"), col("tp"), col("fp"), col("tn"), col("fn"),
          ((col("tp") + col("tn")).cast(DoubleType) /
            (col("tp") + col("fp") + col("tn") + col("fn")).cast(DoubleType))
            .as("accuracy"),
          when(col("tp") + col("fp") === 0, lit(null).cast(DoubleType))
            .otherwise(col("tp").cast(DoubleType) /
              (col("tp") + col("fp")).cast(DoubleType)).as("prec"),
          when(col("tp") + col("fn") === 0, lit(null).cast(DoubleType))
            .otherwise(col("tp").cast(DoubleType) /
              (col("tp") + col("fn")).cast(DoubleType)).as("recall"))
        .orderBy(col("threshold"))
    },
    Some(s"""WITH $featsSql,
      |$sumsSql,
      |$matSql,
      |$solveSql,
      |scored AS (
      |  SELECT y, $scoreSql AS score FROM feats, solve),
      |th AS (SELECT CAST(unnest([${EvalThresholds.mkString(", ")}]) AS DOUBLE)
      |         AS threshold),
      |cm AS (
      |  SELECT threshold,
      |    SUM(CASE WHEN score >= threshold AND y = 1 THEN 1 ELSE 0 END) AS tp,
      |    SUM(CASE WHEN score >= threshold AND y = 0 THEN 1 ELSE 0 END) AS fp,
      |    SUM(CASE WHEN score <  threshold AND y = 0 THEN 1 ELSE 0 END) AS tn,
      |    SUM(CASE WHEN score <  threshold AND y = 1 THEN 1 ELSE 0 END) AS fn
      |  FROM scored, th GROUP BY threshold)
      |SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      |  CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
      |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE)
      |    AS accuracy,
      |  CASE WHEN tp + fp = 0 THEN NULL
      |       ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS prec,
      |  CASE WHEN tp + fn = 0 THEN NULL
      |       ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
      |FROM cm ORDER BY threshold""".stripMargin))

  val all: Seq[Q] = Seq(classifierQ, modelQ, evalQ)
}
