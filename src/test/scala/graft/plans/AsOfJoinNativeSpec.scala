package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, "t1"), ("A", 20L, "t2"), ("A", 30L, "t3"),
    ("B", 5L, "t4"), ("B", 50L, "t5"),
    ("C", 7L, "t6") // no quotes at all for C
  ).toDF("sym", "ts", "trade_id")

  private def quotes = Seq(
    ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 25L, 3.0),
    ("B", 6L, 4.0), // after B's first trade
    ("D", 1L, 9.0) // key with no trades
  ).toDF("sym", "ts", "px")

  test("native as-of join matches hand-computed nearest-earlier semantics") {
    val got = AsOfJoinNative
      .nearestEarlier(trades, quotes, "sym", "ts", "ts")
      .select("trade_id", "px").as[(String, Option[Double])]
      .collect().toMap
    assert(got == Map(
      "t1" -> Some(1.0), // A@10 → quote A@5
      "t2" -> Some(2.0), // A@20 → quote A@20 (at-or-before includes equal ts)
      "t3" -> Some(3.0), // A@30 → quote A@25
      "t4" -> None, // B@5: only quote is B@6, later
      "t5" -> Some(4.0),
      "t6" -> None)) // C has no quotes
  }

  test("inner=true drops unmatched left rows") {
    val got = AsOfJoinNative
      .nearestEarlier(trades, quotes, "sym", "ts", "ts", inner = true)
      .select("trade_id").as[String].collect().toSet
    assert(got == Set("t1", "t2", "t3", "t5"))
  }

  test("null keys and timestamps never match") {
    val l = Seq((Some("A"), Some(10L), "l1"), (None, Some(10L), "l2"),
      (Some("A"), None, "l3")).toDF("k", "ts", "id")
    val r = Seq((Some("A"), Some(5L), 1.0), (Some("A"), None, 7.0),
      (None, Some(1L), 8.0)).toDF("k", "ts", "v")
    val got = AsOfJoinNative.nearestEarlier(l, r, "k", "ts", "ts")
      .select("id", "v").as[(String, Option[Double])].collect().toMap
    assert(got == Map("l1" -> Some(1.0), "l2" -> None, "l3" -> None))
  }

  test("composed variant: null payloads carry as one row, null key/ts never match") {
    // the latest matching right row has a NULL payload column — the
    // output must be THAT row (a=null, b=2), never a frankenrow mixing
    // the older row's a=1 with the newer row's b=2
    val l = Seq(("K", 30L, "l1")).toDF("k", "ts", "id")
    val r = Seq(
      ("K", 10L, Some(1.0), None: Option[Double]),
      ("K", 20L, None: Option[Double], Some(2.0)))
      .toDF("k", "ts", "a", "b")
    val got = AsOfJoin.nearestEarlier(l, r, "k", "ts", "ts")
      .select("id", "a", "b")
      .as[(String, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(("l1", None, Some(2.0))))
    // null key / null ts semantics match the native variant: never a match
    val ln = Seq((Some("A"), Some(10L), "n1"), (None, Some(10L), "n2"),
      (Some("A"), None, "n3")).toDF("k", "ts", "id")
    val rn = Seq((Some("A"), Some(5L), 1.0), (Some("A"), None, 7.0),
      (None, Some(1L), 8.0)).toDF("k", "ts", "v")
    val gotN = AsOfJoin.nearestEarlier(ln, rn, "k", "ts", "ts")
      .select("id", "v").as[(String, Option[Double])].collect().toMap
    assert(gotN == Map("n1" -> Some(1.0), "n2" -> None, "n3" -> None))
    // inner=true with an all-null payload match still KEEPS the left row
    // (a match happened), and a payload-less right side doesn't crash
    val rAllNull = Seq(("K", 10L, None: Option[Double])).toDF("k", "ts", "a")
    val inner = AsOfJoin.nearestEarlier(l, rAllNull, "k", "ts", "ts",
      inner = true).select("id").as[String].collect().toSeq
    assert(inner == Seq("l1"))
    val rBare = Seq(("K", 10L)).toDF("k", "ts")
    val bare = AsOfJoin.nearestEarlier(l, rBare, "k", "ts", "ts",
      inner = true).select("id").as[String].collect().toSeq
    assert(bare == Seq("l1"))
  }

  test("agrees with the composed union+window variant on real data (self-join lineage)") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"),
        col("event_id").as("signup_event_id"), col("ts").as("signup_ts"))
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("signup_event_id"))
        .as[(Long, Option[Long])].collect().toMap
    val composed = shape(
      AsOfJoin.nearestEarlier(errors, signups, "user_id", "ts", "ts"))
    val native = shape(
      AsOfJoinNative.nearestEarlier(errors, signups, "user_id", "ts", "ts"))
    assert(native.nonEmpty && native == composed)
  }

  test("plan uses AsOfJoinExec with one exchange per side and sorted merge") {
    val df = AsOfJoinNative.nearestEarlier(trades, quotes, "sym", "ts", "ts")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"))
    // EnsureRequirements must have planned the declared distribution/ordering:
    // a hash exchange and a (key, ts) sort on each side
    assert("Exchange hashpartitioning".r.findAllIn(physical).size == 2)
    assert("Sort \\[".r.findAllIn(physical).size >= 2)
  }

  test("property: matches a brute-force nearest-earlier on random data") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(1, 120), Gen.choose(1, 120)) {
      (seed, nl, nr) =>
        val rnd = new scala.util.Random(seed)
        // few keys + coarse ts so collisions and ties are common
        val lrows = (0 until nl).map(i =>
          (rnd.nextInt(5).toString, rnd.nextInt(20).toLong, i.toLong))
        val rrows = (0 until nr).map(i =>
          (rnd.nextInt(5).toString, rnd.nextInt(20).toLong, i.toDouble))
        val l = lrows.toDF("k", "ts", "lid")
        val r = rrows.toDF("k", "ts", "v")
        val got = AsOfJoinNative
          .nearestEarlier(l, r, "k", "ts", "ts")
          .select("lid", "v").as[(Long, Option[Double])].collect().toMap
        // brute force: among right rows with same key and rts <= lts, the
        // merge keeps the LAST in (ts, arrival) sort order per the
        // operator's tie contract; value ties make any choice valid, so
        // compare the set of admissible values
        lrows.forall { case (k, ts, lid) =>
          val cands = rrows.filter(rr => rr._1 == k && rr._2 <= ts)
          if (cands.isEmpty) got(lid).isEmpty
          else {
            val maxTs = cands.map(_._2).max
            val admissible = cands.filter(_._2 == maxTs).map(_._3).toSet
            got(lid).exists(admissible.contains)
          }
        }
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(30))
    assert(res.passed, res.status.toString)
  }

  test("object-backed (string) keys: candidate key survives cursor advance past other keys") {
    // Exercises the candKey-from-copied-row path: string keys are
    // object-backed, so a candidate key read from the sorter's reusable row
    // would go stale as the right cursor advances (and corrupt on spill —
    // the in-memory variant at least executes the copy+re-eval path on
    // every candidate). Many interleaved keys, several candidates per key,
    // and a final left row per key that must still compare EQUAL to the
    // candidate key retained from several cursor steps earlier.
    val n = 5000
    val l = (0 until n).map(i => (f"key_${i % 500}%04d", 100L + (i / 500), i.toLong))
      .toDF("k", "ts", "lid")
    val r = (0 until n).map(i => (f"key_${i % 500}%04d", (i / 500).toLong, i.toLong))
      .toDF("k", "ts", "rid")
    val got = AsOfJoinNative.nearestEarlier(l, r, "k", "ts", "ts")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(got.size == n)
    // every left row matches: the latest right row for its key is at
    // ts = n/500 - 1 = 9, i.e. rid = key + 9*500
    (0 until n).foreach { i =>
      val key = i % 500
      assert(got(i.toLong) == Some((key + 9 * 500).toLong),
        s"lid=$i key=$key got=${got(i.toLong)}")
    }
  }

  test("left column colliding with the _r_ rename prefix is rejected at construction") {
    val l = Seq(("A", 10L, 1.0)).toDF("k", "ts", "_r_px")
    val r = Seq(("A", 5L, 2.0)).toDF("k", "ts", "px")
    val e = intercept[IllegalArgumentException](
      AsOfJoinNative.nearestEarlier(l, r, "k", "ts", "ts"))
    assert(e.getMessage.contains("_r_"))
    // a _r_-prefixed left column with NO right counterpart is fine
    val l2 = Seq(("A", 10L, 1.0)).toDF("k", "ts", "_r_other")
    val ok = AsOfJoinNative.nearestEarlier(l2, r, "k", "ts", "ts")
    assert(ok.count() == 1)
  }

  test("AQE on, skewed input: zipPartitions children stay co-partitioned") {
    // AQE's CoalesceShufflePartitions rewrites post-shuffle partitioning at
    // runtime; AsOfJoinExec merges via zipPartitions, which REQUIRES equal
    // child partition counts. Pin that an adaptively-executed, heavily
    // skewed join still runs and is exactly right (AQE must coalesce both
    // sides consistently — a mismatch would throw at execution).
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      // one hot key carrying ~95% of rows on both sides
      val l = spark.range(20000).selectExpr(
        "CASE WHEN id % 20 = 0 THEN concat('cold_', id % 7) ELSE 'hot' END AS k",
        "id % 100 AS ts", "id AS lid")
      val r = spark.range(4000).selectExpr(
        "CASE WHEN id % 20 = 0 THEN concat('cold_', id % 7) ELSE 'hot' END AS k",
        "id % 50 AS ts", "id AS rid")
      val native = AsOfJoinNative.nearestEarlier(l, r, "k", "ts", "ts")
      val composed = AsOfJoin.nearestEarlier(l, r, "k", "ts", "ts")
      def shape(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        df.select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap
      val g = shape(native)
      assert(g.size == 20000)
      // rid ties at the max ts are resolved by sort arrival order in the
      // native merge, composed uses last_value over the same order — both
      // must agree on WHICH ts matched; compare on the admissible-ts level
      val cShape = shape(composed)
      val rrows = r.as[(String, Long, Long)].collect()
      val byKey = rrows.groupBy(_._1)
      l.as[(String, Long, Long)].collect().foreach { case (k, ts, lid) =>
        val cands = byKey.getOrElse(k, Array.empty).filter(_._2 <= ts)
        if (cands.isEmpty) assert(g(lid).isEmpty && cShape(lid).isEmpty)
        else {
          val maxTs = cands.map(_._2).max
          val admissible = cands.filter(_._2 == maxTs).map(_._3).toSet
          assert(g(lid).exists(admissible.contains), s"lid=$lid")
          assert(cShape(lid).exists(admissible.contains), s"lid=$lid (composed)")
        }
      }
      // pin that this actually ran adaptively (not a silently-disabled path)
      assert(native.queryExecution.executedPlan.toString.contains("AdaptiveSparkPlan"))
    } finally {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  test("ties on right ts take the last sorted row; duplicate left keys all match") {
    val l = Seq(("A", 10L, "x"), ("A", 10L, "y")).toDF("k", "ts", "id")
    val r = Seq(("A", 10L, 1.0), ("A", 10L, 2.0)).toDF("k", "ts", "v")
    val got = AsOfJoinNative.nearestEarlier(l, r, "k", "ts", "ts")
      .select("id", "v").as[(String, Double)].collect().toMap
    // both right rows are at-or-before; merge keeps the LAST in sort order.
    // (ts tie order between the two right rows is not defined by (k, ts)
    // sorting alone, so assert membership, same for both left rows)
    assert(got.keySet == Set("x", "y"))
    assert(Set(1.0, 2.0).contains(got("x")) && got("x") == got("y"))
  }
}
