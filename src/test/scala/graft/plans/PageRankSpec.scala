package graft.plans

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def pr(edges: Seq[(Long, Long)], verts: Seq[Long],
      iters: Int = 5): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), verts.toDF("id"),
      verts.size.toLong, iters, Scale)
      .as[(Long, Long)].collect().toMap

  test("directed 3-cycle stays exactly uniform every iteration") {
    // each node has out-degree 1 and in-degree 1; starting uniform, the
    // integer update maps every node identically, so ranks stay equal —
    // any asymmetry would expose partition-dependent arithmetic
    val got = pr(Seq((0L, 1L), (1L, 2L), (2L, 0L)), Seq(0L, 1L, 2L))
    assert(got.values.toSet.size == 1)
    // closed cycle conserves mass up to the floor losses: r <= scale/3
    assert(got(0L) <= Scale / 3 && got(0L) > Scale / 4)
  }

  test("star hub outranks leaves; hand-computed fixed-point values match") {
    // 3 leaves -> hub 9; hub has no out-edges (dangling).
    // n=4, base = 15*S/400, r0 = S/4.
    // it1: leaves get base only; hub gets base + 3*floor(85*r0/100).
    val verts = Seq(0L, 1L, 2L, 9L)
    val got1 = pr(Seq((0L, 9L), (1L, 9L), (2L, 9L)), verts, iters = 1)
    val base = 15L * Scale / 400L
    val r0 = Scale / 4
    assert(got1(0L) == base && got1(1L) == base && got1(2L) == base)
    assert(got1(9L) == base + 3L * (r0 * 85L / 100L))
    // after more rounds the ordering persists and leaves sit at base
    val got5 = pr(Seq((0L, 9L), (1L, 2L), (2L, 9L)), verts, iters = 5)
    assert(got5(9L) > got5(0L))
  }

  test("result is independent of input partitioning (integer-exact sums)") {
    val edges = (0L until 200L).map(i => (i, (i * i + 3) % 200)) ++
      (0L until 200L).map(i => (i, i % 17))
    val verts = (0L until 200L)
    val e1 = edges.toDF("src", "dst").repartition(1)
    val e32 = edges.toDF("src", "dst").repartition(32)
    val a = PageRank.run(e1.filter($"src" =!= $"dst").distinct(),
      verts.toDF("id"), 200L, 5).as[(Long, Long)].collect().toMap
    val b = PageRank.run(e32.filter($"src" =!= $"dst").distinct(),
      verts.toDF("id"), 200L, 5).as[(Long, Long)].collect().toMap
    assert(a == b)
    // the %17 hub ray must actually rank hubs above the background
    val hubTop = (0L until 17L).map(a).max
    val bgMax = (100L until 200L).map(a).max
    assert(hubTop > bgMax)
  }

  test("hub-skew contrib agg: map-side partials bound the shuffle to parts×keys") {
    // The derived link graph's `id % 97` ray concentrates ~N/97 of all
    // in-links on 97 dst keys; the per-iteration `groupBy(dst).sum` faces
    // exactly that skew. sum is algebraic, so Spark's partial (map-side)
    // aggregation must collapse each map partition to ≤97 hub rows BEFORE
    // the shuffle — the reducer for a hub key then receives ≤ #map-tasks
    // rows, not N/97. This test pins both halves of that claim:
    //  1. the physical plan has partial+final HashAggregate around the
    //     exchange (the plan shape that absorbs the hubs);
    //  2. measured shuffle records for a pure 100k-edge hub ray stay ≤
    //     parts×97 — a ~130× collapse vs the unaggregated 100k rows.
    // This is why the contrib agg does NOT route through SaltedAgg: the
    // salt would add a second shuffle per iteration to fix a skew the
    // partial agg already absorbs.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import org.apache.spark.sql.functions.{col, sum}
    val parts = 8
    val edges = spark.range(100000)
      .select((col("id") % 97).as("id"), (col("id") % 1000 + 1).as("c"))
      .repartition(parts).localCheckpoint(true) // pin the map-side layout
    val agg = edges.groupBy(col("id")).agg(sum(col("c")).as("contrib"))

    val p = agg.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val nHashAgg = """(?m)^\(\d+\) HashAggregate""".r.findAllIn(p).size
    assert(nHashAgg == 2, s"expected partial+final HashAggregate, plan:\n${p.take(1200)}")
    assert(p.contains("partial_sum"), p.take(1200))

    @volatile var shuffleRecords = 0L
    @volatile var stagesSeen = 0
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleRecords += sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
        stagesSeen += 1
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = agg.collect()
      assert(out.length == 97)
      assert(out.map(_.getLong(1)).sum ==
        (0L until 100000L).map(i => i % 1000 + 1).sum) // exactness unchanged
      // drain the listener bus: wait until stage events stop arriving
      val deadline = System.currentTimeMillis + 15000
      var last = -1
      while (System.currentTimeMillis < deadline && stagesSeen != last) {
        last = stagesSeen; Thread.sleep(300)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(shuffleRecords > 0, "no shuffle write observed — test wiring broken")
    assert(shuffleRecords <= parts.toLong * 97,
      s"shuffle carried $shuffleRecords rows for 100000 inputs over 97 keys — " +
        "map-side partial aggregation is not absorbing the hub skew")
  }

  private def ppr(edges: Seq[(Long, Long)], verts: Seq[Long],
      seeds: Set[Long], iters: Int = 5): Map[Long, Long] = {
    import org.apache.spark.sql.functions.col
    PageRank.runPersonalized(edges.toDF("src", "dst"), verts.toDF("id"),
      col("id").isin(seeds.toSeq: _*), seeds.size.toLong, iters, Scale)
      .as[(Long, Long)].collect().toMap
  }

  test("personalized: full teleport set reproduces plain PageRank exactly") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val verts = Seq(0L, 1L, 2L, 3L)
    assert(ppr(edges, verts, verts.toSet) == pr(edges, verts))
  }

  test("personalized: vertices unreachable from the seed set rank zero") {
    // 0 → 1 → 2 chain with 3 → 0: seeding only {0} gives 3 neither
    // teleport mass nor inflow, so its rank is exactly 0 at every round,
    // while the chain downstream of the seed holds all the mass
    val got = ppr(Seq((0L, 1L), (1L, 2L), (3L, 0L)),
      Seq(0L, 1L, 2L, 3L), Set(0L))
    assert(got(3L) == 0L)
    assert(got(0L) > 0L && got(1L) > 0L && got(2L) > 0L)
    // seed holds the teleport floor: base = 15% of scale (single seed)
    assert(got(0L) >= 15L * Scale / 100L)
    // mass decays along the chain away from the seed
    assert(got(0L) > got(1L) && got(1L) > got(2L))
  }
}
