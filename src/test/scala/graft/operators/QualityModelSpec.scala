package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._
  import QualityModel.LinSolve

  test("planted linear relationship is recovered by the normal-equation train") {
    // y is EXACTLY 3 + 2*x1 - x2 + 0*x3 + 5*x4 on integer features; with
    // λ=0 the least-squares solution is the planted coefficient vector,
    // recovered through the full distributed path: DECIMAL co-moment agg →
    // string-bridge doubles → shared-DAG Gaussian elimination.
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { id =>
      val x1 = rnd.nextInt(200) + 1
      val x2 = rnd.nextInt(50)
      val x3 = rnd.nextInt(30)
      val x4 = rnd.nextInt(1000) + 1
      (id, x1, x2, x3, x4, 3 + 2 * x1 - x2 + 5 * x4)
    }
    val planted = rows.toDF("doc_id", "x1", "x2", "x3", "x4", "y")
      .repartition(4) // exercise partial-agg merge, not a single partition
    val beta = QualityModel.train(planted, ridge = 0.0)
    val want = Seq(3.0, 2.0, -1.0, 0.0, 5.0)
    beta.toSeq.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 1e-6, s"beta=$got want=$w")
    }
  }

  test("solveDense solution satisfies A*beta = b (residual check)") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val k = 5
      // SPD by construction: A = M'M + I on a random integer M
      val m = Array.fill(k, k)(rnd.nextInt(9) - 4)
      val a = Array.tabulate(k, k) { (i, j) =>
        val dot = (0 until k).map(r => m(r)(i).toDouble * m(r)(j)).sum
        if (i == j) dot + 1.0 else dot
      }
      val b = Array.fill(k)(rnd.nextInt(100).toDouble)
      val beta = LinSolve.solveDense(a, b)
      (0 until k).foreach { i =>
        val lhs = (0 until k).map(j => a(i)(j) * beta(j)).sum
        assert(math.abs(lhs - b(i)) < 1e-8 * (1.0 + math.abs(b(i))),
          s"row $i residual: $lhs vs ${b(i)}")
      }
    }
  }

  test("solve step list is a valid topological order with unique names") {
    val steps = LinSolve.solveSteps(5)
    val bound = scala.collection.mutable.Set[String]()
    for (i <- 0 until 5; j <- i until 5) bound += s"m$i$j"
    for (i <- 0 until 5) bound += s"v$i"
    def refs(e: LinSolve.E): Seq[String] = e match {
      case LinSolve.Ref(n) => Seq(n)
      case LinSolve.Sub(l, r) => refs(l) ++ refs(r)
      case LinSolve.Mul(l, r) => refs(l) ++ refs(r)
      case LinSolve.Div(l, r) => refs(l) ++ refs(r)
    }
    steps.foreach { case (n, e) =>
      refs(e).foreach(r => assert(bound.contains(r), s"$n refs unbound $r"))
      assert(!bound.contains(n), s"duplicate binding $n")
      bound += n
    }
    (0 until 5).foreach(i => assert(bound.contains(s"beta$i")))
  }

  test("classifier scores agree with the published model coefficients") {
    val scored = QualityModel.classifierQ.fn(spark, sfDir)
    val beta = QualityModel.modelQ.fn(spark, sfDir)
      .orderBy($"coef").select($"value").as[Double].collect()
    assert(beta.length == 5)
    val feats = QualityModel.feats(
      graft.Tables.load(spark, sfDir, "documents"))
    val rescored = feats.select($"doc_id",
      ((((lit(beta(0)) + lit(beta(1)) * $"x1".cast("double"))
        + lit(beta(2)) * $"x2".cast("double"))
        + lit(beta(3)) * $"x3".cast("double"))
        + lit(beta(4)) * $"x4".cast("double")).as("score2"))
    val joined = scored.join(rescored, "doc_id")
    assert(joined.filter($"score" =!= $"score2").count() == 0)
    // label is exactly the text_quality heuristic gate
    val lbl = scored.select($"doc_id", $"label")
      .join(TextAnalysis.quality.fn(spark, sfDir)
        .select($"doc_id", $"quality_ok"), "doc_id")
    assert(lbl.filter(($"label" === 1) =!= $"quality_ok").count() == 0)
    // predictions are 0/1 and scores are finite
    assert(scored.filter(!$"predicted".isin(0, 1)).count() == 0)
    assert(scored.filter(isnan($"score") || !$"score".between(-1e6, 1e6))
      .count() == 0)
  }

  test("threshold sweep: counts partition the corpus; recall falls as the threshold rises") {
    val n = graft.Tables.load(spark, sfDir, "documents").count()
    val rows = QualityModel.evalQ.fn(spark, sfDir)
      .select($"threshold", $"tp", $"fp", $"tn", $"fn")
      .as[(Double, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq(0.3, 0.5, 0.7))
    rows.foreach { case (t, tp, fp, tn, fn) =>
      assert(tp + fp + tn + fn == n, s"t=$t counts must partition the corpus")
    }
    // raising the threshold can only move predictions positive→negative:
    // tp (and so recall) is monotone non-increasing, tn non-decreasing
    rows.sliding(2).foreach {
      case Array((_, tp1, _, tn1, _), (_, tp2, _, tn2, _)) =>
        assert(tp2 <= tp1 && tn2 >= tn1)
      case _ =>
    }
  }

  test("streaming scoring with batch-trained coefficients equals the batch scores") {
    // the serving shape at scale: train once on the corpus, score new
    // documents as they arrive — the scorer is a narrow map, so the
    // streaming twin must reproduce the batch scores bit for bit
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val beta = QualityModel.modelQ.fn(spark, sfDir)
      .orderBy($"coef").select($"value").as[Double].collect()
    val es = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val scoreExpr = {
      val toks = split($"text", " ")
      val x1 = size(toks).cast("double")
      val x2 = length(regexp_replace($"text", "[a-z0-9 ]", "")).cast("double")
      val x3 = size(filter(toks, w =>
        w.isin("the", "a", "of", "and", "to", "in"))).cast("double")
      val x4 = length(regexp_replace($"text", " ", "")).cast("double")
      (((lit(beta(0)) + lit(beta(1)) * x1) + lit(beta(2)) * x2)
        + lit(beta(3)) * x3) + lit(beta(4)) * x4
    }
    val q = es.toDF().toDF("doc_id", "text")
      .select($"doc_id", scoreExpr.as("score"))
      .writeStream.outputMode("append")
      .format("memory").queryName("qm_stream").start()
    try {
      val rows = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().toSeq
      rows.grouped(200).foreach(chunk => es.addData(chunk: _*))
      q.processAllAvailable()
      val streamed = spark.table("qm_stream")
        .as[(Long, Double)].collect().toMap
      val batch = QualityModel.classifierQ.fn(spark, sfDir)
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
      assert(streamed.size == batch.size)
      assert(batch.forall { case (id, s) => streamed(id) == s },
        "streaming scores must equal batch scores exactly")
    } finally q.stop()
  }

  test("trained model separates better than chance on its own labels") {
    // the scorer is trained ON the heuristic labels, so its in-sample
    // accuracy must beat the majority-class rate
    val scored = QualityModel.classifierQ.fn(spark, sfDir).cache()
    try {
      val n = scored.count().toDouble
      val acc = scored.filter($"predicted" === $"label").count() / n
      val majority = math.max(
        scored.filter($"label" === 1).count(),
        scored.filter($"label" === 0).count()) / n
      assert(acc >= majority - 1e-9, s"acc=$acc majority=$majority")
    } finally scored.unpersist()
  }
}
