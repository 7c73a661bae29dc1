package graft.operators

import graft.SparkSpec

/** Known-value pins for the degree-oriented triangle count — the oracle
  * checks the derived link graph; these check the orientation logic itself
  * on graphs small enough to count by hand, including the tie cases
  * (equal degrees) where a wrong tie-break double- or zero-counts.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: (Long, Long)*): Long =
    Graph.triangleCount(edges.toSeq.toDF("src", "dst"))
      .collect()(0).getLong(0)

  test("K4: all degrees tie — 4 triangles, each counted once") {
    assert(tri((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)) == 4L)
  }

  test("square + one diagonal: exactly the 2 triangles the diagonal closes") {
    assert(tri((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)) == 2L)
  }

  test("triangle-free shapes count zero") {
    assert(tri((0L, 1L), (1L, 2L), (2L, 3L)) == 0L) // path
    assert(tri((9L, 0L), (9L, 1L), (9L, 2L), (9L, 3L)) == 0L) // star
  }

  test("direction and duplicate edges are ignored") {
    // same triangle given once per direction plus a repeated edge
    assert(tri((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 2L)) == 1L)
  }

  private def supportHist(edges: (Long, Long)*): Map[Long, Long] =
    Graph.edgeSupportHistogram(edges.toSeq.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("edge support: K4 edges each sit in 2 triangles; a pendant edge in 0") {
    // K4 + pendant vertex 9 hanging off node 0
    val hist = supportHist((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L), (0L, 9L))
    assert(hist == Map(2L -> 6L, 0L -> 1L), hist.toString)
  }

  test("edge support: diagonal of the split square carries both triangles") {
    // square 0-1-2-3 with diagonal 0-2: diagonal support 2, sides 1
    val hist = supportHist((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    assert(hist == Map(2L -> 1L, 1L -> 4L), hist.toString)
  }

  // -- k-core peel: hand-pinned shapes -------------------------------------

  private def peel(k: Int, rounds: Int, edges: (Long, Long)*): Map[Long, Int] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = e.select($"src".as("id"))
      .union(e.select($"dst".as("id"))).distinct()
    Graph.kcorePeel(e, verts, k, rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("k-core: star collapses outside-in — leaves round 1, center round 2") {
    val got = peel(2, 5, (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L))
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1, 9L -> 2),
      got.toString)
  }

  test("k-core: K5 survives k=4 intact; K4 peels entirely in round 1") {
    val k5 = (for {
      i <- 0L to 4L; j <- (i + 1) to 4L
    } yield (i, j))
    assert(peel(4, 5, k5: _*).values.forall(_ == 0))
    val k4 = (for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (i, j))
    assert(peel(4, 5, k4: _*).values.forall(_ == 1))
  }

  test("k-core: chain cascade peels one layer per round from both ends") {
    val got = peel(2, 5, (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(got == Map(0L -> 1, 4L -> 1, 1L -> 2, 3L -> 2, 2L -> 3),
      got.toString)
  }

  // -- coreness (h-index fixpoint): hand-pinned shapes ---------------------

  private def coreness(edges: (Long, Long)*): Map[Long, Long] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = e.select($"src".as("id"))
      .union(e.select($"dst".as("id"))).distinct()
    Graph.corenessHIndex(e, verts, maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("coreness: K4 with a pendant — clique members 3, pendant 1") {
    val got = coreness((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 2L), (1L, 3L), (2L, 3L), (0L, 9L))
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 9L -> 1L),
      got.toString)
  }

  test("coreness: cycle is uniformly 2, path and star uniformly 1") {
    assert(coreness((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).values.toSet
      == Set(2L))
    assert(coreness((0L, 1L), (1L, 2L), (2L, 3L)).values.toSet == Set(1L))
    assert(coreness((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).values.toSet
      == Set(1L))
  }

  test("tail finish equals the pure-distributed peel (vertex-budget guard)") {
    // budget 0 disables the local finish entirely; the default budget
    // admits the sf0.001 graph immediately — both paths must agree on
    // every removed_round
    val e = graft.Tables.load(spark, sfDir, "documents")
      .select(($"doc_id" % 97).as("src"), $"doc_id".as("dst"))
      .filter($"src" =!= $"dst")
    val verts = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id".as("id"))
    def run(vb: Long, eb: Long) =
      Graph.kcorePeel(e, verts, 2, tailVertexBudget = vb,
          tailEdgeBudget = eb)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val distributed = run(0L, 0L)
    val local = run(Graph.TailVertexBudget, Graph.TailEdgeBudget)
    assert(local == distributed)
    // edge budget 0 forces the distributed path even when vertices fit
    assert(run(Graph.TailVertexBudget, 0L) == distributed)
  }

  test("tail finish equals the pure-distributed coreness (budget guard)") {
    val e = graft.Tables.load(spark, sfDir, "documents")
      .select(($"doc_id" % 97).as("src"), $"doc_id".as("dst"))
      .filter($"src" =!= $"dst")
    val verts = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id".as("id"))
    def run(vb: Long) =
      Graph.corenessHIndex(e, verts, tailVertexBudget = vb)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Graph.TailVertexBudget) == run(0L))
  }

  test("coreness: h-index fixpoint agrees with the k-core peel on the link graph") {
    // coreness(v) >= k  ⟺  v survives the k-peel — ties the two
    // decompositions together on real (adversarial-periphery) data; the
    // full per-vertex values are pinned by the recursive-CTE oracle
    val k = 4
    val byCore = Graph.corenessQ.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1) >= k)).toMap
    val byPeel = Graph.kcore.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1) == 0)).toMap
    assert(byCore == byPeel)
  }

  test("coreness H-aggregate: histogram form is exact and hand-pinned") {
    // multiset {5,4,4,2,1}: sorted desc -> min(5,1),min(4,2),min(4,3),
    // min(2,4),min(1,5) = 1,2,3,2,1 -> H=3; histogram path must agree.
    // A second vertex with {7,7,7} (H=3, all ties in one histogram row)
    // and a third with {1} (H=1) pin the group-boundary cases.
    val pairs = (Seq(5L, 4L, 4L, 2L, 1L).map((10L, _)) ++
      Seq(7L, 7L, 7L).map((20L, _)) ++ Seq((30L, 1L)))
      .toDF("v", "ew")
    val got = Graph.hFromNeighborEstimates(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 3L, 20L -> 3L, 30L -> 1L), got.toString)
  }

  test("coreness H-aggregate: algebraic partials absorb hub fan-in (plan + shuffle records)") {
    // The scale contract from the round-8 audit: H must come from the
    // estimate histogram (partial+final HashAggregate), never a per-vertex
    // collect_list whose buffer grows with hub degree. Pin both halves:
    //  1. plan: partial_count around the exchange, NO collect_list /
    //     ObjectHashAggregate anywhere;
    //  2. measured shuffle records for a 100k-pair hub ray (97 hubs x 8
    //     distinct estimates) stay <= parts x 97 x 8 + window input —
    //     a >10x collapse vs the unaggregated 100k rows.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import org.apache.spark.sql.functions.col
    val parts = 8
    val pairs = spark.range(100000)
      .select((col("id") % 97).as("v"), (col("id") % 8 + 1).as("ew"))
      .repartition(parts).localCheckpoint(true) // pin the map-side layout
    val h = Graph.hFromNeighborEstimates(pairs)

    val p = h.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("collect_list"), p.take(1200))
    assert(!p.contains("ObjectHashAggregate"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
    val nHashAgg = """(?m)^\(\d+\) HashAggregate""".r.findAllIn(p).size
    assert(nHashAgg >= 2, s"expected partial+final HashAggregate, plan:\n${p.take(1200)}")

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
      val out = h.collect()
      // every hub sees ~1031 of each estimate 1..8: cum at ew=8 is already
      // >= 8, so H = 8 everywhere — exactness alongside the scale claim
      assert(out.length == 97 && out.forall(_.getLong(1) == 8L))
      val deadline = System.currentTimeMillis + 15000
      var last = -1
      while (System.currentTimeMillis < deadline && stagesSeen != last) {
        last = stagesSeen; Thread.sleep(300)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(shuffleRecords > 0, "no shuffle write observed — test wiring broken")
    assert(shuffleRecords <= parts.toLong * 97 * 8 + 97 * 8,
      s"shuffle carried $shuffleRecords rows for 100000 pairs over 97x8 keys — " +
        "map-side partial aggregation is not absorbing the hub fan-in")
  }

  // -- BFS depths: hand-pinned shapes --------------------------------------

  private def bfs(src: Long, edges: (Long, Long)*): Map[Long, Int] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = e.select($"src".as("id"))
      .union(e.select($"dst".as("id"))).distinct()
    Graph.bfsDepths(e, verts, src, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("bfs: chain depths count hops from the source") {
    assert(bfs(0L, (0L, 1L), (1L, 2L), (2L, 3L))
      == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("bfs: diamond takes the shorter of two paths; edges are undirected") {
    assert(bfs(3L, (0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
      == Map(3L -> 0, 1L -> 1, 2L -> 1, 0L -> 2))
  }

  test("bfs: a disconnected component stays at depth -1") {
    assert(bfs(0L, (0L, 1L), (5L, 6L))
      == Map(0L -> 0, 1L -> 1, 5L -> -1, 6L -> -1))
  }

  test("bfs multi-source: depth is hops to the NEAREST seed") {
    // chain 0-1-2-3-4 with seeds {0, 4}: the middle is 2 from both ends
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val verts = e.select($"src".as("id"))
      .union(e.select($"dst".as("id"))).distinct()
    val got = Graph.bfsDepthsFrom(e, verts,
        $"id" === 0L || $"id" === 4L, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("bfs: an eccentricity beyond the depth cap fails loud (the oracle-cap contract)") {
    // a 12-hop chain against maxDepth = 10: returning partial depths
    // would silently disagree with the oracle's MIN(depth) — throw instead
    val chain = (0L until 12L).map(i => (i, i + 1))
    intercept[IllegalStateException] { bfs(0L, chain: _*) }
  }

  test("bfs: an eccentricity exactly AT the cap resolves (no off-by-one throw)") {
    // a 10-hop chain against maxDepth = 10: every depth is final and the
    // oracle's capped walk handles depth == cap, so this must succeed —
    // the probe round distinguishes it from depths BEYOND the cap
    val chain = (0L until 10L).map(i => (i, i + 1))
    val got = bfs(0L, chain: _*)
    assert(got == (0L to 10L).map(i => i -> i.toInt).toMap, got.toString)
  }

  /** Run [[Graph.sssp]] over an explicit weighted UNDIRECTED edge list
    * `(a, b, wt)` (symmetrized here, like production's weightedSym). */
  private def ssspOn(src: Long, cap: Long, wedges: (Long, Long, Long)*): Map[Long, Long] = {
    val sym = wedges.toSeq
      .flatMap { case (a, b, wt) => Seq((a, b, wt), (b, a, wt)) }
      .toDF("v", "w", "wt")
    val verts = sym.select($"v".as("id")).distinct()
    Graph.sssp(sym, verts, src, distCap = cap, maxRounds = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("sssp: chain accumulates edge weights from the source") {
    assert(ssspOn(0L, 64L, (0L, 1L, 3L), (1L, 2L, 4L))
      == Map(0L -> 0, 1L -> 3, 2L -> 7))
  }

  test("sssp: a cheap multi-hop detour undercuts the heavy direct edge") {
    // direct 0-3 costs 9; the 3-hop detour 0-1-2-3 costs 3 — weighted
    // relaxation must keep improving PAST the first (hop-wise shortest)
    // path found, which is exactly where BFS semantics would be wrong
    assert(ssspOn(0L, 64L,
      (0L, 3L, 9L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
      == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("sssp: edges relax in both directions; a disconnected component stays -1") {
    assert(ssspOn(2L, 64L, (0L, 1L, 2L), (1L, 2L, 5L), (8L, 9L, 1L))
      == Map(2L -> 0, 1L -> 5, 0L -> 7, 8L -> -1, 9L -> -1))
  }

  test("sssp: a finite distance beyond the dist cap fails loud (the oracle-cap contract)") {
    // total path weight 12 against cap 10: the capped oracle walk would
    // under-enumerate, so the engine must throw, never return quietly
    intercept[IllegalStateException] {
      ssspOn(0L, 10L, (0L, 1L, 6L), (1L, 2L, 6L))
    }
    // exactly AT the cap is fine (the oracle extends while dist + wt <= cap)
    assert(ssspOn(0L, 12L, (0L, 1L, 6L), (1L, 2L, 6L))
      == Map(0L -> 0, 1L -> 6, 2L -> 12))
  }

  test("sssp: weightedSym derives (a+b)%7+1 on canonical edges, both directions") {
    val e = Seq((4L, 2L), (2L, 4L), (5L, 6L)).toDF("src", "dst")
    val sym = Graph.weightedSym(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (2,4) dedupes across directions → wt (2+4)%7+1 = 7; (5,6) → wt 5
    assert(sym == Set((2L, 4L, 7L), (4L, 2L, 7L), (5L, 6L, 5L), (6L, 5L, 5L)))
  }

  private def lpa(rounds: Int, edges: (Long, Long)*): Map[Long, Long] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    Graph.lpaRun(e, verts, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("lpa: two triangles joined by a bridge settle into two communities") {
    // triangle {0,1,2} — bridge 2-10 — triangle {10,11,12}: synchronous
    // min-tie-break LPA settles (traced by hand, stable from round 4) on
    // community 0 for the first triangle and community 2 for the second —
    // label 2 leaks over the bridge in round 2's ties and wins the right
    // triangle, but the two communities stay DISTINCT, which is the point
    val got = lpa(4, (0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (2L, 10L))
    assert(got(0L) == 0L && got(1L) == 0L && got(2L) == 0L, got.toString)
    assert(got(10L) == 2L && got(11L) == 2L && got(12L) == 2L, got.toString)
  }

  test("lpa: tie among neighbor labels resolves to the smallest label") {
    // path 5-7-9: vertex 7 sees {5, 9} once each after round 1 → picks 5
    val got = lpa(1, (5L, 7L), (7L, 9L))
    assert(got(7L) == 5L)
    // endpoints see only their single neighbor's initial label
    assert(got(5L) == 7L && got(9L) == 7L)
  }

  test("lpa: round 0 identity and determinism across reruns") {
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val a = lpa(3, e: _*)
    val b = lpa(3, e: _*)
    assert(a == b, "synchronous LPA must be rerun-deterministic")
    assert(lpa(0, e: _*) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  private def mlpa(rounds: Int, edges: (Long, Long)*): Map[Long, Long] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    Graph.modularityLpaRun(e, verts, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("modularity lpa: planted two-community graph is recovered") {
    // two 4-cliques {0..3} and {10..13} joined by the single bridge 3-10:
    // the planted partition. The volume penalty keeps the bridge from
    // merging the cliques — each settles on its own min label
    val k4a = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val k4b = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = mlpa(3, (k4a ++ k4b :+ (3L, 10L)): _*)
    val ca = Set(0L, 1L, 2L, 3L).map(got)
    val cb = Set(10L, 11L, 12L, 13L).map(got)
    assert(ca.size == 1, s"left clique split: $got")
    assert(cb.size == 1, s"right clique split: $got")
    assert(ca != cb, s"cliques merged across the bridge: $got")
  }

  test("modularity lpa: deterministic across reruns; round 0 is identity") {
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
    assert(mlpa(3, e: _*) == mlpa(3, e: _*))
    assert(mlpa(0, e: _*) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("modularity lpa: isolated vertex keeps its own label (totality)") {
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val verts = Seq(0L, 1L, 99L).toDF("id")
    val got = Graph.modularityLpaRun(e, verts, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(99L) == 99L)
    assert(got.keySet == Set(0L, 1L, 99L))
  }

  test("refineWithin: an internally-disconnected community splits; " +
      "connected ones survive; refinement never merges") {
    // planted LPA defect: one label covers {0,1,2} ∪ {10,11,12} but no
    // internal edge crosses the halves — Leiden-style refinement must
    // split it into two refined communities; the other label {5,6} is
    // connected and survives whole
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (11L, 12L), (5L, 6L),
      (2L, 5L)). // the 2-5 edge CROSSES labels: must not leak into refinement
      toDF("src", "dst")
    val labels = Seq(0L -> 1L, 1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      12L -> 1L, 5L -> 2L, 6L -> 2L).toDF("id", "lbl")
    val got = Graph.refineWithin(edges, labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // split halves, deterministic min-id refined labels
    assert(Set(0L, 1L, 2L).map(got(_)._2) == Set(0L))
    assert(Set(10L, 11L, 12L).map(got(_)._2) == Set(10L))
    // the connected label-2 community survives whole
    assert(Set(5L, 6L).map(got(_)._2) == Set(5L))
    // original labels carried through; refinement never merges labels
    assert(got.forall { case (id, (lbl, _)) =>
      lbl == (if (id >= 5L && id <= 6L) 2L else 1L) })
    val byRefined = got.values.groupBy(_._2).values
    assert(byRefined.forall(_.map(_._1).toSet.size == 1),
      "a refined community spans two original communities")
  }

  test("louvain coarsening: merges an over-split clique, keeps planted " +
      "communities apart, never loses exact modularity") {
    import org.apache.spark.sql.functions.col
    // planted PHASE-2 case: K8 handed to the coarsener OVER-SPLIT into two
    // halves. No single vertex move can see the merge (vertex-level LPA's
    // blind spot) but the super-graph move can: the half with the larger
    // label must adopt the smaller one (downward-only rule — an
    // unrestricted synchronous update would SWAP the two labels forever)
    val k8 = (for (a <- 0L to 7L; b <- (a + 1) to 7L) yield (a, b))
      .toDF("src", "dst")
    val split = (0L to 7L).map(v => v -> (if (v < 4) 0L else 10L))
      .toDF("id", "lbl")
    val merged = Graph.louvainCoarsen(k8, split, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(merged.values.toSet == Set(0L), s"K8 halves failed to merge: $merged")
    assert(Graph.modularityScaled(k8, split.select(col("id"),
        col("lbl"))) <
      Graph.modularityScaled(k8,
        (0L to 7L).map(v => v -> 0L).toDF("id", "lbl")),
      "sanity: merging the K8 halves must raise exact modularity")

    // planted NON-merge: two K4s + one bridge, correctly partitioned —
    // coarsening must leave a good partition alone (the volume penalty
    // outweighs the single bridge edge on the super-graph too)
    val k4a = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val k4b = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val bridged = (k4a ++ k4b :+ (3L, 10L)).toDF("src", "dst")
    val good = ((0L to 3L).map(_ -> 0L) ++ (10L to 13L).map(_ -> 10L))
      .toDF("id", "lbl")
    val kept = Graph.louvainCoarsen(bridged, good, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L to 3L).map(kept).toSet != (10L to 13L).map(kept).toSet,
      s"coarsening merged across the bridge: $kept")

    // corpus check (the r12 verdict's bar): phase 2 on the L1 fixpoint of
    // the document link graph never decreases exact modularity, and only
    // ever coarsens (merges) the partition
    val (edges, verts, _) = Graph.linkGraph(spark, sfDir)
    val l1 = Graph.modularityLpaRun(edges, verts, 3).localCheckpoint(true)
    val l2 = Graph.louvainCoarsen(edges, l1, 2)
      .select(col("id"), col("lbl2").as("lbl")).localCheckpoint(true)
    val q1 = Graph.modularityScaled(edges, l1)
    val q2 = Graph.modularityScaled(edges, l2)
    assert(q2 >= q1, s"coarsening lost modularity: $q2 < $q1")
    val n1 = l1.select(col("lbl")).distinct().count()
    val n2 = l2.select(col("lbl")).distinct().count()
    assert(n2 <= n1, s"coarsening must not split: $n2 > $n1")

    // a THIRD level (the multi-level loop iterated on the L2 partition —
    // louvainCoarsen is partition-agnostic): same invariants one level
    // up, and the hierarchy nests (L3 is a function of the L2 label)
    val l3pairs = Graph.louvainCoarsen(edges, l2, 2).localCheckpoint(true)
    val l3 = l3pairs.select(col("id"), col("lbl2").as("lbl"))
    val q3 = Graph.modularityScaled(edges, l3)
    assert(q3 >= q2, s"level-3 coarsening lost modularity: $q3 < $q2")
    val n3 = l3.select(col("lbl")).distinct().count()
    assert(n3 <= n2, s"level-3 coarsening must not split: $n3 > $n2")
    assert(l3pairs.select(col("lbl")).distinct().count() ==
      l3pairs.select(col("lbl"), col("lbl2")).distinct().count(),
      "L3 must be a function of the L2 label (nesting)")
  }

  test("louvain convergence: driver small-graph finish equals the " +
      "distributed move rule; the loop terminates naturally at the gain " +
      "floor; the converged partition dominates the pinned 2-round chain") {
    import org.apache.spark.sql.functions.col
    // 1. the budget-guarded DRIVER fixpoint replicates the distributed
    //    synchronous move rule round-for-round (same candidates, same
    //    downward-only restriction, same exact score, same tie-break):
    //    capped at r rounds both paths must land identical labels
    val k8 = (for (a <- 0L to 7L; b <- (a + 1) to 7L) yield (a, b))
      .toDF("src", "dst")
    // vertex 99 is EDGE-ISOLATED under its own label: the distributed run
    // keeps it as a stay-put super-node (own label is always a candidate)
    // and the driver finish must not drop it at the projection join
    val split = ((0L to 7L).map(v => v -> (if (v < 4) 0L else 10L)) :+
      (99L -> 99L))
      .toDF("id", "lbl")
    val ctx = Graph.undContext(k8)
    for (r <- 1 to 3) {
      val dist = Graph.louvainCoarsenCtx(ctx, split, r)
        .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      val drv = Graph.louvainCoarsenDriver(ctx, split, r)
        .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
      assert(drv == dist, s"driver finish diverged at $r rounds")
      assert(drv.get(99L).contains(99L), s"isolated vertex dropped: $drv")
    }

    // 2. corpus: converge from the L1 fixpoint of the document link graph
    val (edges, verts, _) = Graph.linkGraph(spark, sfDir)
    val l1 = Graph.modularityLpaRun(edges, verts, 3).localCheckpoint(true)
    val qs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (fin, levels) = Graph.louvainConverge(edges,
      { case 1 => Some(l1); case _ => None }, 32,
      onLevel = (_, q, _) => qs += q)
    // natural termination: strictly below the maxLevels backstop (8)
    assert(levels < 8, s"hit the level backstop: $levels")
    // the ACCEPTED chain (all candidates but possibly the last) is
    // strictly increasing; the final candidate is the rejected one
    // (or the loop stopped at the backstop, excluded above)
    qs.toSeq.dropRight(1).sliding(2).foreach {
      case Seq(a, b) => assert(b > a, s"accepted chain not increasing: $qs")
      case _ => ()
    }
    // 3. dominance over the pinned 2-round L2→L3 chain (the registered
    //    graph_communities_l2/_multilevel trajectory): local moves run to
    //    their fixpoint per level, so the converged partition's exact
    //    modularity is at least the fixed-round chain's
    val l2p = Graph.louvainCoarsen(edges, l1, 2)
      .select(col("id"), col("lbl2").as("lbl")).localCheckpoint(true)
    val l3p = Graph.louvainCoarsen(edges, l2p, 2)
      .select(col("id"), col("lbl2").as("lbl")).localCheckpoint(true)
    val qFin = Graph.modularityScaled(edges, fin)
    val qL3 = Graph.modularityScaled(edges, l3p)
    assert(qFin >= qL3, s"converged $qFin below the pinned chain $qL3")
    // 4. convergence only ever coarsens
    assert(fin.select(col("lbl")).distinct().count() <=
      l1.select(col("lbl")).distinct().count())
  }

  test("modularity lpa step: algebraic argmax — no window, no collect buffer") {
    import org.apache.spark.sql.functions.col
    val sym = spark.range(100000)
      .select((col("id") % 97).as("v"), (col("id") % 1000).as("w"))
    val deg = sym.groupBy(col("v")).agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("d"))
    val labels = spark.range(1000).select(col("id"), col("id").as("lbl"))
    val p = Graph.modularityLpaStep(sym, deg, 200000L, labels).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("collect_list"), p.take(1200))
    assert(!p.contains("ObjectHashAggregate"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("partial_max"), p.take(1500))
  }

  private def pair(src: Long, dst: Long, edges: (Long, Long)*): (Long, Int) = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    val (out, rounds) = Graph.biSssp(Graph.weightedSym(e), verts, src, dst)
    (out.collect()(0).getLong(2), rounds)
  }

  test("pair shortest path: chain, diamond, disconnected, self") {
    // chain 0-1-2-3-4 under wt = (a+b)%7+1: 2+4+6+1 = 13
    assert(pair(0L, 4L, (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))._1 == 13L)
    // diamond: 0-1-3 costs 2+5, 0-2-3 costs 3+6 → 7
    assert(pair(0L, 3L, (0L, 1L), (1L, 3L), (0L, 2L), (2L, 3L))._1 == 7L)
    // disconnected components → -1
    assert(pair(0L, 3L, (0L, 1L), (2L, 3L))._1 == -1L)
    // source == target short-circuits at distance 0 in 0 rounds
    assert(pair(5L, 5L, (5L, 6L)) == ((0L, 0)))
  }

  test("pair shortest path: bidirectional meets in ~half the chain rounds") {
    // a 21-vertex chain: one-sided relaxation needs 20 rounds to reach the
    // far end; the bidirectional frontiers meet in the middle — strictly
    // fewer rounds (≈ half + the termination-certificate rounds)
    val chain = (0L until 20L).map(i => (i, i + 1))
    val (d, rounds) = pair(0L, 20L, chain: _*)
    val expected = chain.map { case (a, b) => (a + b) % 7 + 1 }.sum
    assert(d == expected, s"chain distance $d != $expected")
    assert(rounds <= 14, s"bidirectional took $rounds rounds on a 20-hop chain")
  }

  test("pair shortest path agrees with full SSSP on the link graph") {
    val e = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (1L, 4L),
      (4L, 5L), (0L, 5L), (2L, 5L))
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    val sym = Graph.weightedSym(e.toDF("src", "dst"))
    val full = Graph.sssp(sym, verts, 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 5L).foreach { t =>
      val d = Graph.biSssp(sym, verts, 0L, t)._1.collect()(0).getLong(2)
      assert(d == full(t), s"target $t: pair=$d full=${full(t)}")
    }
  }

  test("lpa step: algebraic argmax — hash aggregates only, no degree-sized buffer") {
    // the per-round argmax must stay max(struct(c, -lbl)) — partial+final
    // HashAggregate with map-side combine — never a window or collect_list
    // whose state scales with a hub's neighbor count
    import org.apache.spark.sql.functions.col
    val sym = spark.range(100000)
      .select((col("id") % 97).as("v"), (col("id") % 1000).as("w"))
    val verts = spark.range(1000).select(col("id"))
    val labels = verts.select(col("id"), col("id").as("lbl"))
    val p = Graph.lpaStep(sym, labels, verts).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("collect_list"), p.take(1200))
    assert(!p.contains("ObjectHashAggregate"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
    // both aggregations keep a PARTIAL stage below their exchange — the
    // map-side combine that collapses hub fan-in. (The struct max lowers
    // to SortAggregate — struct buffers aren't hash-aggregable — but its
    // per-group state is still O(1); what this pin forbids is any
    // degree-sized buffer or single-reducer construct.)
    assert(p.contains("partial_count"), p.take(1500))
    assert(p.contains("partial_max"), p.take(1500))
  }

  test("double sweep: exact on a path, a cycle, and a star; ties pick min id") {
    def sweep(src: Long, edges: (Long, Long)*): (Int, Long, Int) = {
      val e = edges.toSeq.toDF("src", "dst")
      val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
      Graph.doubleSweep(e, verts, src)
    }
    // path 0-1-2-3-4 from the middle: ecc 2, far end ties {0,4} → 0,
    // second sweep from 0 finds the TRUE diameter 4 (exact on trees)
    assert(sweep(2L, (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)) == ((2, 0L, 4)))
    // 6-cycle: every eccentricity is 3 — both sweeps agree
    val c6 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 0L))
    assert(sweep(0L, c6: _*) == ((3, 3L, 3)))
    // star from a leaf: ecc 2, farthest ties on all other leaves → min id
    assert(sweep(1L, (9L, 1L), (9L, 2L), (9L, 3L)) == ((2, 2L, 2)))
  }

  private def matching(rounds: Int, edges: (Long, Long)*): Seq[(Long, Long, Int)] = {
    val e = edges.toSeq.toDF("src", "dst")
    val verts = edges.flatMap(p => Seq(p._1, p._2)).distinct.toDF("id")
    Graph.handshakeMatching(e, verts, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2)).toSeq
  }

  test("handshake matching: path pairs off in two rounds; star keeps one edge") {
    // path 0-1-2-3: round 1 matches the mutual-min pair (0,1); 2 and 3
    // become mutual once 1 leaves → perfect matching in round 2
    assert(matching(3, (0L, 1L), (1L, 2L), (2L, 3L))
      == Seq((0L, 1L, 1), (2L, 3L, 2)))
    // star: center 9 proposes to leaf 1 and only leaf 1 reciprocates;
    // the remaining leaves have no edges left → exactly one matched edge
    assert(matching(3, (9L, 1L), (9L, 2L), (9L, 3L)) == Seq((1L, 9L, 1)))
    // triangle: (0,1) mutual in round 1, vertex 2 stays single
    assert(matching(3, (0L, 1L), (1L, 2L), (0L, 2L)) == Seq((0L, 1L, 1)))
  }

  test("handshake matching on the link graph is a valid matching") {
    val m = Graph.matchingQ.fn(spark, sfDir)
      .select($"a", $"b").as[(Long, Long)].collect()
    assert(m.nonEmpty)
    val endpoints = m.flatMap(p => Seq(p._1, p._2))
    assert(endpoints.distinct.length == endpoints.length,
      "a vertex appears in two matched edges — not a matching")
  }

  test("clustering coefficient: per-vertex triangles sum to 3x the global count") {
    val out = Graph.clusteringCoeff.fn(spark, sfDir)
      .select($"id", $"degree", $"n_triangles", $"lcc_num", $"lcc_den")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // every triangle contributes exactly one membership to its 3 corners
    val globalTri = Graph.triangles.fn(spark, sfDir)
      .as[Long].collect()(0)
    assert(out.map(_._3).sum == 3 * globalTri)
    // the fraction is bounded: 2*tri <= d*(d-1); undefined rows are 0/0
    assert(out.forall { case (_, d, _, num, den) =>
      num <= den || (den == 0 && num == 0 && d <= 1)
    })
  }

  test("k-core: link-graph peel runs the full 13-round cascade to fixpoint") {
    // The derived link graph's periphery peels as a long chain cascade —
    // the adversarial case for the loop (and the reason the oracle must
    // be genuinely recursive, not a fixed unroll). Golden distribution
    // independently confirmed by the DuckDB recursive-CTE oracle on the
    // same parquet: 38 vertices peel over 13 rounds, 462 survive.
    val rounds = Graph.kcore.fn(spark, sfDir)
      .groupBy($"removed_round").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = Map(0 -> 462L, 1 -> 9L, 2 -> 5L, 3 -> 4L, 4 -> 3L,
      13 -> 1L) ++ (5 to 12).map(_ -> 2L)
    assert(rounds == expected, rounds.toString)
  }
}
