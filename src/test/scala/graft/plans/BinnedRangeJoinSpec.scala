package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The automatic range-join binning rule: same results as the naive plan,
  * BNLJ eliminated, correct on the edges (empty intervals, nulls, strict
  * bounds, width larger than the whole domain). */
class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val WidthKey = "spark.graft.binnedRangeJoin.width"

  private def withWidth[A](w: Long)(f: => A): A = {
    spark.conf.set(WidthKey, w.toString)
    try f finally spark.conf.unset(WidthKey)
  }

  private def points: DataFrame =
    Seq((1L, 10L), (2L, 55L), (3L, 100L), (4L, 999L)).toDF("pid", "x")
  private def intervals: DataFrame =
    Seq((10L, 0L, 20L), (20L, 50L, 60L), (30L, 90L, 110L), (40L, 200L, 100L))
      .toDF("iid", "lo", "hi") // iid=40 is inverted (never matches)

  private def joined: DataFrame =
    points.join(intervals, $"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").orderBy($"pid", $"iid")

  test("rule off: naive range join plans as BNLJ (the trap exists)") {
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("rule on: equi-shaped plan, identical results, inverted interval dead") {
    val expected = withWidth(0L)(joined.as[(Long, Long)].collect().toSeq)
    assert(expected == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    Seq(7L, 64L, 100000L).foreach { w => // incl. width >> domain (one bin)
      withWidth(w) {
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), s"w=$w: ${p.take(400)}")
        assert(p.contains("Join"), p.take(200))
        assert(joined.as[(Long, Long)].collect().toSeq == expected, s"w=$w")
      }
    }
  }

  test("strict bounds and null point/bounds match naive semantics") {
    val pts = Seq(Some(10L), Some(20L), None).zipWithIndex
      .map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
    val ivs = Seq((1L, Some(5L), Some(15L)), (2L, None, Some(99L)),
      (3L, Some(10L), None)).toDF("iid", "lo", "hi")
    def q: DataFrame = pts.join(ivs, $"x" > $"lo" && $"x" < $"hi")
      .select($"pid", $"iid").orderBy($"pid", $"iid")
    val naive = withWidth(0L)(q.as[(Long, Long)].collect().toSeq)
    val binned = withWidth(8L)(q.as[(Long, Long)].collect().toSeq)
    assert(binned == naive, s"binned=$binned naive=$naive")
    assert(naive == Seq((0L, 1L))) // only x=10 in (5,15); nulls never match
  }

  test("rule leaves equi joins and non-range conditions alone") {
    withWidth(64L) {
      val equi = points.join(intervals, $"x" === $"lo")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // cross-side OR is not a pure range join — untouched
      val or = points.join(intervals, $"x" <= $"lo" || $"x" >= $"hi")
      assert(!or.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    }
  }

  test("property: rule on == rule off for random tables, negatives included") {
    // Exactness leans on integer-division MONOTONICITY, which holds for
    // Spark's truncating div on negatives too (trunc is non-decreasing) —
    // but that's exactly the kind of claim a generator should be pointed
    // at: random points/intervals spanning negative and positive values,
    // random widths, strict and non-strict bounds.
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(
      Gen.choose(0L, Long.MaxValue), // seed
      Gen.choose(1L, 300L),          // width
      Gen.oneOf(true, false)         // strict bounds
    ) { (seed, w, strict) =>
      val rnd = new scala.util.Random(seed)
      val pts = Seq.tabulate(30)(i => (i.toLong, rnd.between(-500L, 500L)))
        .toDF("pid", "x")
      val ivs = Seq.tabulate(20) { i =>
        val a = rnd.between(-500L, 500L)
        (i.toLong, a, a + rnd.between(-50L, 200L)) // some inverted
      }.toDF("iid", "lo", "hi")
      def q = {
        val c = if (strict) $"x" > $"lo" && $"x" < $"hi"
                else $"x" >= $"lo" && $"x" <= $"hi"
        pts.join(ivs, c).select($"pid", $"iid")
          .orderBy($"pid", $"iid").as[(Long, Long)].collect().toSeq
      }
      val naive = withWidth(0L)(q)
      val binned = withWidth(w)(q)
      naive == binned
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(25))
    assert(res.passed, res.status.toString)
  }

  test("rule fires on SQL-text BETWEEN joins too (session-wide surface)") {
    withWidth(16L) {
      points.createOrReplaceTempView("brj_pts")
      intervals.createOrReplaceTempView("brj_ivs")
      val df = spark.sql(
        """SELECT pid, iid FROM brj_pts JOIN brj_ivs
          |ON x BETWEEN lo AND hi ORDER BY pid, iid""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
      assert(df.as[(Long, Long)].collect().toSeq ==
        Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    }
  }

  test("abs-band form and reversed comparisons rewrite too") {
    // abs(x - y) <= c is the natural band phrasing (the manual query's
    // oracle uses it); reversed bounds (lo <= p) must also pair up
    val left = Seq((1L, 10L), (2L, 55L), (3L, 210L)).toDF("pid", "x")
    val right = Seq((10L, 12L), (20L, 60L), (30L, 400L)).toDF("iid", "y")
    def absQ = left.join(right, abs($"x" - $"y") <= 10L)
      .select($"pid", $"iid").orderBy($"pid", $"iid")
    val naive = withWidth(0L)(absQ.as[(Long, Long)].collect().toSeq)
    assert(naive == Seq((1L, 10L), (2L, 20L)))
    withWidth(16L) {
      val p = absQ.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
      assert(absQ.as[(Long, Long)].collect().toSeq == naive)
    }
    // reversed phrasing: lo <= x AND x <= hi (bounds on the LEFT of the
    // comparisons) — silently unmatched before this round's fix
    def revQ = points.join(intervals, $"lo" <= $"x" && $"hi" >= $"x")
      .select($"pid", $"iid").orderBy($"pid", $"iid")
    val revNaive = withWidth(0L)(revQ.as[(Long, Long)].collect().toSeq)
    withWidth(16L) {
      val p = revQ.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
      assert(revQ.as[(Long, Long)].collect().toSeq == revNaive)
    }
  }

  test("interval-overlap joins rewrite via the first-shared-bin residual, no duplicates") {
    val li = Seq((1L, 0L, 30L), (2L, 50L, 90L), (3L, 200L, 150L)) // 3 inverted
      .toDF("lid", "ls", "le")
    val ri = Seq((10L, 25L, 60L), (20L, 85L, 120L), (30L, 300L, 400L))
      .toDF("rid", "rs", "re")
    def q = li.join(ri, $"ls" <= $"re" && $"rs" <= $"le")
      .select($"lid", $"rid").orderBy($"lid", $"rid")
    val naive = withWidth(0L)(q.as[(Long, Long)].collect().toSeq)
    assert(naive == Seq((1L, 10L), (2L, 10L), (2L, 20L)))
    Seq(7L, 64L, 100000L).foreach { w =>
      withWidth(w) {
        val p = q.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin"), s"w=$w: ${p.take(400)}")
        // no dedup aggregate was inserted — duplicates never arise
        assert(q.as[(Long, Long)].collect().toSeq == naive, s"w=$w")
      }
    }
  }

  test("property: overlap rewrite == naive for random intervals incl. negatives") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(
      Gen.choose(0L, Long.MaxValue), Gen.choose(1L, 200L)
    ) { (seed, w) =>
      val rnd = new scala.util.Random(seed)
      def ivs(n: Int) = Seq.tabulate(n) { i =>
        val s = rnd.between(-300L, 300L)
        (i.toLong, s, s + rnd.between(-30L, 120L)) // some inverted
      }
      val li = ivs(25).toDF("lid", "ls", "le")
      val ri = ivs(15).toDF("rid", "rs", "re")
      def q = li.join(ri, $"ls" <= $"re" && $"rs" <= $"le")
        .select($"lid", $"rid").orderBy($"lid", $"rid")
      withWidth(0L)(q.as[(Long, Long)].collect().toSeq) ==
        withWidth(w)(q.as[(Long, Long)].collect().toSeq)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("overlap form fires from SQL text too") {
    withWidth(16L) {
      Seq((1L, 0L, 30L), (2L, 50L, 90L)).toDF("lid", "ls", "le")
        .createOrReplaceTempView("brj_li")
      Seq((10L, 25L, 60L), (20L, 300L, 400L)).toDF("rid", "rs", "re")
        .createOrReplaceTempView("brj_ri")
      val df = spark.sql(
        """SELECT lid, rid FROM brj_li JOIN brj_ri
          |ON ls <= re AND rs <= le ORDER BY lid, rid""".stripMargin)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
      assert(df.as[(Long, Long)].collect().toSeq == Seq((1L, 10L), (2L, 10L)))
    }
  }

  test("events band join through the rule matches the manual binned query") {
    withWidth(60000000L) {
      val ev = graft.Tables.load(spark, sfDir, "events")
      val err = ev.filter($"event_type" === "error")
        .select($"event_id".as("err_id"), unix_micros($"ts").as("e_us"))
      val sgn = ev.filter($"event_type" === "signup")
        .select($"event_id".as("sgn_id"), unix_micros($"ts").as("s_us"))
      val auto = err.join(sgn,
          $"e_us" >= $"s_us" - 60000000L && $"e_us" <= $"s_us" + 60000000L)
        .select($"err_id", $"sgn_id").orderBy($"err_id", $"sgn_id")
      val p = auto.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(400))
      val manual = graft.operators.Extended.rangeJoinBinned.fn(spark, sfDir)
        .select($"err_id", $"sgn_id").orderBy($"err_id", $"sgn_id")
      assert(auto.as[(Long, Long)].collect().toSeq ==
        manual.as[(Long, Long)].collect().toSeq)
    }
  }
}
