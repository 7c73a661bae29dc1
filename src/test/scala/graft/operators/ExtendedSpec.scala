package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches brute-force nearest-earlier lookup") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_event_id"), $"ts".as("signup_ts"))
    val fast = graft.plans.AsOfJoin.nearestEarlier(errors, signups, "user_id", "ts", "ts")
      .select($"event_id", $"signup_event_id")
      .as[(Long, Option[Long])].collect().toMap
    // brute force: non-equi join + max
    val brute = errors.as("e").join(signups.as("s"),
        $"e.user_id" === $"s.user_id" && $"s.ts" <= $"e.ts", "left")
      .groupBy($"event_id")
      .agg(max_by($"signup_event_id", $"signup_ts").as("signup_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
    assert(fast.nonEmpty && fast.values.exists(_.isDefined))
  }

  test("property: binned overlap join == brute force (boundaries, zero-length, bin edges)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val W = 100L
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(1, 60), Gen.choose(1, 60)) {
      (seed, nl, nr) =>
        val rnd = new scala.util.Random(seed)
        // starts cluster around bin edges (multiples of W ± small), lengths
        // in [0, W) including 0 — the cases where binning can go wrong
        def iv(i: Long) = {
          val start = rnd.nextInt(6) * W + rnd.nextInt(5) - 2
          val len = if (rnd.nextBoolean()) 0L else rnd.nextInt(W.toInt - 1).toLong
          (i, start, start + len)
        }
        val lrows = (0 until nl).map(i => iv(i.toLong))
        val rrows = (0 until nr).map(i => iv(i.toLong))
        val got = Extended.binnedOverlapJoin(
          lrows.toDF("lid", "l0", "l1"), rrows.toDF("rid", "r0", "r1"), W)
          .as[(Long, Long, Long)].collect().toSet
        val want = (for {
          (lid, l0, l1) <- lrows
          (rid, r0, r1) <- rrows
          if l0 <= r1 && r0 <= l1
        } yield (lid, rid, math.min(l1, r1) - math.max(l0, r0))).toSet
        got == want
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(25))
    assert(res.passed, res.status.toString)
  }

  test("approx aggregates land near exact values") {
    val approx = Extended.approxStats.fn(spark, sfDir)
      .select($"o_orderstatus", $"approx_custs", $"approx_median")
      .as[(String, Long, Double)].collect().toMap2
    val exact = graft.Tables.load(spark, sfDir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n"), median($"o_totalprice").as("m"))
      .as[(String, Long, Double)].collect().toMap2
    approx.foreach { case (k, (ac, am)) =>
      val (ec, em) = exact(k)
      assert(math.abs(ac - ec).toDouble / ec < 0.1, s"$k distinct: $ac vs $ec")
      assert(math.abs(am - em) / em < 0.25, s"$k median: $am vs $em")
    }
  }

  test("scala udf surface registers and composes (kept off hot paths by design)") {
    // §2.5 UDF surface: supported, but the engine prefers codegen'd
    // built-ins / native Expressions — a UDF boxes per row and blocks
    // whole-stage codegen, so it's the escape hatch, not the default.
    val initials = udf((name: String) => name.split("#").head.take(3).toUpperCase)
    spark.udf.register("initials", initials)
    val viaApi = graft.Tables.load(spark, sfDir, "customer")
      .select(initials($"c_name").as("i")).distinct().as[String].collect().toSet
    graft.Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql("SELECT DISTINCT initials(c_name) AS i FROM customer")
      .as[String].collect().toSet
    assert(viaApi == viaSql && viaApi == Set("CUS"))
  }

  test("hamming64 expression: codegen result matches bitCount, nulls propagate") {
    graft.functions.Hamming64.register(spark)
    val rows = Seq((3L, 1L), (0L, -1L), (Long.MaxValue, 0L)).toDF("a", "b")
      .selectExpr("hamming64(a, b) AS h").as[Int].collect()
    assert(rows.toSeq == Seq(1, 64, 63))
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .selectExpr("hamming64(a, b) AS h").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("IVF ANN recall: probed top-1 equals brute-force top-1 for most queries") {
    val ivf = SimilarityIvf.ivfTopK.fn(spark, sfDir)
      .filter($"rk" === 1).select($"qid", $"cid").as[(Long, Long)].collect().toMap
    val brute = {
      val e = graft.Tables.load(spark, sfDir, "embeddings")
      val q = e.filter($"vec_id" >= 100 && $"vec_id" < 110)
        .select($"vec_id".as("qid"), $"embedding".as("qe"))
      val c = e.select($"vec_id".as("cid"), $"embedding".as("ce"))
      val dot = aggregate(zip_with($"qe", $"ce",
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)
      val cos = dot / sqrt(aggregate(zip_with($"qe", $"qe",
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v)) /
        sqrt(aggregate(zip_with($"ce", $"ce",
          (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, v) => a + v))
      q.join(c, $"qid" =!= $"cid")
        .select($"qid", $"cid", cos.as("cos"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"qid")
            .orderBy($"cos".desc, $"cid")))
        .filter($"rk" === 1).select($"qid", $"cid").as[(Long, Long)].collect().toMap
    }
    assert(ivf.keySet == brute.keySet)
    val agree = ivf.count { case (q, c) => brute(q) == c }
    // nprobe=3 of 8 cells over isotropic (clusterless) vectors: true
    // neighbors can live outside probed cells — that's the approximation
    // trade; require half the queries to agree with brute force
    assert(agree * 2 >= ivf.size, s"top-1 recall $agree/${ivf.size}")
  }

  test("TopKAggregator matches rank-window top-k") {
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    // window form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val windowed = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"o_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // aggregator form: (custkey → (orderkey, price)) through the typed UDAF
    val aggregated = orders
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(3).toColumn)
      .collect()
      .map { case (k, items) => k -> items.map(_._2).toSet }
      .toMap
    assert(aggregated == windowed)
  }

  test("seeded random pick is deterministic across runs (G3 parity)") {
    val a = Extended.randomPick.fn(spark, sfDir).as[(Long, String)].collect()
    val b = Extended.randomPick.fn(spark, sfDir).as[(Long, String)].collect()
    assert(a.length == 1 && a.sameElements(b))
  }

  test("histogram quantiles: every reported bin contains the exact percentile") {
    val cents = graft.Tables.load(spark, sfDir, "lineitem")
      .select(($"l_extendedprice" * 100).cast("long").as("c"))
      .orderBy($"c").as[Long].collect()
    val got = StatsPack.histogramQuantiles.fn(spark, sfDir)
      .select($"p", $"est_lo", $"est_hi", $"bracket_ok")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.map(_._1).toSeq == Seq(50L, 90L, 99L))
    got.foreach { case (p, lo, hi, ok) =>
      assert(ok, s"p$p bracket_ok must hold")
      // exact percentile by the same rank rule: first value whose rank
      // satisfies rank*100 >= p*n
      val idx = ((p * cents.length + 99) / 100).toInt - 1
      val exact = cents(math.max(idx, 0))
      assert(exact >= lo && exact <= hi,
        s"p$p exact=$exact outside reported bin [$lo, $hi]")
      // 256 bins over the price span: the bin is a tight bracket
      assert(hi - lo < (cents.last - cents.head) / 128,
        s"p$p bin [$lo,$hi] wider than 2x the equi-width bound")
    }
  }

  test("histogram bin bounds are tight for every value and every span") {
    // pure formula pin: for any span (including span % 256 != 0, the case
    // where floor-div bounds were provably off by one), every value's bin
    // bounds must bracket the value, and the bounds must be exactly the
    // bin's min/max attainable values
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val mn = rnd.nextInt(1000).toLong
      val span = 1L + rnd.nextInt(5000)  // mx - mn + 1
      val bins = 256L
      def bin(v: Long): Long = ((v - mn) * bins) / span
      def estLo(b: Long): Long = mn + (b * span + bins - 1) / bins
      def estHi(b: Long): Long = mn + ((b + 1) * span - 1) / bins
      (mn until mn + span).foreach { v =>
        val b = bin(v)
        assert(v >= estLo(b) && v <= estHi(b),
          s"v=$v outside [${estLo(b)},${estHi(b)}] for bin $b span=$span")
      }
      // tightness: each non-empty bin's bounds are attained
      (mn until mn + span).groupBy(bin).foreach { case (b, vs) =>
        assert(vs.min == estLo(b) && vs.max == estHi(b),
          s"bin $b bounds [${estLo(b)},${estHi(b)}] vs actual " +
            s"[${vs.min},${vs.max}] span=$span")
      }
    }
  }

  test("skyline sweep formulation equals brute-force dominance on crafted ties") {
    import org.apache.spark.sql.expressions.Window
    // includes a duplicate pair, an equal-price pair, and an equal-qty pair
    val pts = Seq((1L, 5L), (1L, 5L), (2L, 3L), (3L, 3L), (2L, 2L), (4L, 1L),
      (5L, 5L))
    val df = pts.toDF("price_cents", "qty").distinct()
    val w = Window.orderBy($"price_cents", $"qty")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sweep = df.withColumn("m", min($"qty").over(w))
      .filter($"m".isNull || $"m" > $"qty")
      .select($"price_cents", $"qty").as[(Long, Long)].collect().toSet
    val distinctPts = pts.distinct
    val brute = distinctPts.filter { case (p, q) =>
      !distinctPts.exists { case (p2, q2) =>
        p2 <= p && q2 <= q && (p2 < p || q2 < q)
      }
    }.toSet
    assert(sweep == brute)
    assert(brute == Set((1L, 5L), (2L, 2L), (4L, 1L)))
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
