package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees under adversarial reduce/merge orders, plus the
  * distributed pinned-query path. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def runSketch(k: Int, parts: Seq[Seq[String]]): Map[String, Long] = {
    val agg = new MisraGriesAggregator(k)
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  test("hand case: decrement-all and merge-subtract keep the guarantees") {
    // k=3 → 2 counters; stream with one dominant token split adversarially
    val parts = Seq(
      Seq("a", "a", "b", "c", "a"),   // c forces a decrement-all
      Seq("d", "a", "d", "e", "a"),
      Seq("a", "f", "a"))
    val n = parts.map(_.size).sum // 13
    val exact = parts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = runSketch(3, parts)
    assert(sk.size <= 2)
    // a: exact 7 > 13/3 → must be surfaced with est in [7 - 13/3, 7]
    assert(sk.contains("a"))
    sk.foreach { case (w, est) =>
      assert(est <= exact(w), s"$w overestimated: $est > ${exact(w)}")
      assert((exact(w) - est) * 3 <= n, s"$w undercut past n/k: $est vs ${exact(w)}")
    }
  }

  test("property: guarantees hold for random streams, splits, and k") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(
      Gen.choose(0L, Long.MaxValue), // seed
      Gen.choose(2, 12),             // k
      Gen.choose(1, 6)               // partitions
    ) { (seed, k, nParts) =>
      val rnd = new scala.util.Random(seed)
      // zipf-ish: token index = floor(sqrt(uniform)) concentrates mass
      val stream = Seq.fill(200)(s"t${math.sqrt(rnd.nextInt(400)).toInt}")
      val parts = stream.grouped(math.max(1, stream.size / nParts)).toSeq
      val n = stream.size
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = runSketch(k, parts)
      val sizeOk = sk.size <= k - 1
      val heavyOk = exact.forall { case (w, c) =>
        c * k <= n || sk.contains(w) }
      val boundsOk = sk.forall { case (w, est) =>
        est <= exact(w) && (exact(w) - est) * k <= n }
      sizeOk && heavyOk && boundsOk
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(300))
    assert(res.passed, res.status.toString)
  }

  test("SQL surface: misra_gries_8 callable from spark.sql with the guarantees") {
    MisraGries.registerSql(spark)
    Seq("a", "a", "a", "b", "b", "c", "d", "e", "a", "b")
      .toDF("w").createOrReplaceTempView("mg_toks")
    val sk = spark.sql("SELECT misra_gries_8(w) AS m FROM mg_toks")
      .selectExpr("explode(m) AS (w, est)")
      .as[(String, Long)].collect().toMap
    assert(sk.size <= 7)
    // n=10, k=8: every token with count > 10/8 (i.e. >= 2) must surface
    assert(sk.contains("a") && sk.contains("b"))
    assert(sk("a") <= 4 && (4 - sk("a")) * 8 <= 10)
  }

  test("pinned query: all guarantee booleans true, scalars match exact") {
    val row = graft.operators.TextAnalysis.heavyHittersPinned
      .fn(spark, sfDir).collect()(0)
    assert(row.getAs[Boolean]("all_heavy_surfaced"))
    assert(row.getAs[Boolean]("est_bounds_ok"))
    assert(row.getAs[Boolean]("size_le_k"))
    assert(row.getAs[Long]("n_heavy_exact") > 0, "fixture: no heavy tokens?")
  }
}
