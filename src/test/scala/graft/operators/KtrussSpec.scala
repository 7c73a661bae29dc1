package graft.operators

import graft.SparkSpec

/** k-truss decomposition pins: hand-verifiable shapes (including the
  * cascade the oracle cannot follow) and a randomized equivalence property
  * against an in-memory brute-force peel. The brute force recounts support
  * from scratch every round — precisely the bookkeeping the distributed
  * peel replaces with incremental decrements, so agreement here is what
  * certifies the decrement logic (most of all the count-a-death-once rule
  * when a triangle loses two edges in the same batch). */
class KtrussSpec extends SparkSpec {
  import spark.implicits._

  private def truss(edges: (Long, Long)*): Map[(Long, Long), Int] =
    Graph.ktruss(edges.toSeq.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  /** Brute force: batch peel with full support recount per round (batch
    * removal at a fixed threshold is order-independent, so this equals the
    * sequential textbook peel). */
  private def naiveTruss(edges: Set[(Long, Long)]): Map[(Long, Long), Int] = {
    val canon = edges.collect { case (x, y) if x != y =>
      (math.min(x, y), math.max(x, y)) }
    var live = canon
    var out = Map.empty[(Long, Long), Int]
    var k = 3
    var guard = 0
    while (live.nonEmpty) {
      guard += 1
      require(guard < 10000, "naive peel runaway")
      val adj = live.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).toSet }
      def sup(e: (Long, Long)): Int =
        (adj.getOrElse(e._1, Set.empty) & adj.getOrElse(e._2, Set.empty)).size
      val r = live.filter(sup(_) < k - 2)
      if (r.isEmpty) k += 1
      else { out ++= r.map(_ -> (k - 1)); live --= r }
    }
    out
  }

  test("K5: every edge closes 3 triangles — trussness 5 throughout") {
    val k5 = for { i <- 0L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val got = truss(k5: _*)
    assert(got.size == 10 && got.values.forall(_ == 5), got.toString)
  }

  test("chain and star are triangle-free — trussness 2") {
    assert(truss((0L, 1L), (1L, 2L), (2L, 3L)).values.forall(_ == 2))
    assert(truss((9L, 0L), (9L, 1L), (9L, 2L)).values.forall(_ == 2))
  }

  test("two triangles sharing an edge: support 2 on the bridge does not save it") {
    // peel at k=4: outer edges (support 1) fall, the cascade then drops
    // the bridge — everything is trussness 3
    val got = truss((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L), (2L, 3L))
    assert(got.values.forall(_ == 3), got.toString)
  }

  test("K4 with a pendant edge: core keeps 4, pendant gets 2") {
    val got = truss((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (0L, 9L))
    assert(got == Map((0L, 1L) -> 4, (0L, 2L) -> 4, (0L, 3L) -> 4,
      (1L, 2L) -> 4, (1L, 3L) -> 4, (2L, 3L) -> 4, (0L, 9L) -> 2),
      got.toString)
  }

  test("triangle chain cascades: every level-4 peel round knocks out the next link") {
    // triangles 0-1-2, 1-2-3 (shares 1-2), 2-3-4 (shares 2-3): at k=4 the
    // outermost support-1 edges fall first, then the dominoes — all t=3
    val got = truss((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L))
    assert(got.values.forall(_ == 3), got.toString)
  }

  test("direction and duplicate edges are ignored") {
    val got = truss((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (0L, 2L))
    assert(got == Map((0L, 1L) -> 3, (0L, 2L) -> 3, (1L, 2L) -> 3),
      got.toString)
  }

  test("property: distributed peel == brute-force recount on random graphs") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 6 + rnd.nextInt(5)
      // dense enough for multi-level trusses and same-batch double kills
      val edges = (for {
        i <- 0L until n; j <- (i + 1) until n
        if rnd.nextInt(100) < 55
      } yield (i, j)).toSet
      edges.isEmpty ||
        truss(edges.toSeq: _*) == naiveTruss(edges)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(12))
    assert(res.passed, res.status.toString)
  }

  test("tail finish equals the pure-distributed peel (budget guard)") {
    // budget 0 disables the local finish; the default budget admits the
    // sf0.001 link graph immediately — per-edge trussness must agree
    val e = graft.Tables.load(spark, sfDir, "documents")
      .select(($"doc_id" % 97).as("src"), $"doc_id".as("dst"))
      .filter($"src" =!= $"dst")
    def run(eb: Long, ib: Long) =
      Graph.ktruss(e, tailEdgeCountBudget = eb, tailIncBudget = ib)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val distributed = run(0L, 0L)
    val local = run(50000L, 1500000L)
    assert(local == distributed)
    // incidence budget 0 forces the distributed path even when edges fit
    assert(run(50000L, 0L) == distributed)
  }

  test("link-graph decomposition: levels valid, boundary matches support profile") {
    val pinned = Graph.ktrussPinned.fn(spark, sfDir).collect()(0)
    assert(pinned.getBoolean(3), "levels_valid must hold on the link graph")
    // t >= 3 count must equal the support >= 1 count from the (already
    // oracle-verified) support histogram — the cascade-free k=3 boundary
    val hist = Graph.edgeSupport.fn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pinned.getLong(2) == hist.filterKeys(_ >= 1).values.sum)
    assert(pinned.getLong(1) == hist.getOrElse(0L, 0L))
    assert(pinned.getLong(0) == hist.values.sum)
  }
}
