package graft.plans

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain needs multiple propagation rounds, converges to min id") {
    // 10-9-8-...-1: diameter 9, label 1 must walk the whole chain
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got == (1L to 10L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate labels; parallel/reversed edges collapse") {
    val got = cc(Seq((5L, 3L), (3L, 5L), (5L, 3L), (20L, 30L), (30L, 40L)))
    assert(got == Map(3L -> 3L, 5L -> 3L, 20L -> 20L, 30L -> 20L, 40L -> 20L))
  }

  test("star graph: transitive closure through a hub merges leaves that share no edge") {
    val got = cc(Seq((100L, 7L), (100L, 8L), (100L, 9L)))
    assert(got.values.toSet == Set(7L))
    assert(got.keySet == Set(7L, 8L, 9L, 100L))
  }

  test("isolated nodes (no edges) get singleton clusters when the node set is passed") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 50L, 60L).toDF("id")
    val got = ConnectedComponents.run(edges, nodes = Some(nodes))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 50L -> 50L, 60L -> 60L))
  }

  private def ccStar(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.runStar(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("null edge endpoints are dropped, not propagated (run parity with runStar)") {
    // a null endpoint must neither emit a null-id cluster row nor perturb
    // the sum-equality convergence witness (a null label acquiring a real
    // min later would make the label sum non-monotone)
    val edges = Seq((Some(1L), Some(2L)), (None, Some(5L)), (Some(7L), None))
      .toDF("src", "dst")
    val got = ConnectedComponents.run(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 7L -> 7L))
  }

  test("star variant: long chain converges in O(log^2) rounds where min-label would exceed maxIter") {
    // path 1-2-...-200: diameter 199. run(maxIter=25) must refuse (partial
    // labels are wrong answers); runStar handles it within its default cap.
    val chain = (1L until 200L).map(i => (i, i + 1))
    assertThrows[IllegalStateException](
      ConnectedComponents.run(chain.toDF("src", "dst")).count())
    val got = ccStar(chain)
    assert(got == (1L to 200L).map(_ -> 1L).toMap)
  }

  test("star variant: isolated nodes, parallel/reversed edges, hub merge") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (100L, 7L), (100L, 8L), (100L, 9L))
    val got = ccStar(edges)
    assert(got == Map(3L -> 3L, 5L -> 3L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 100L -> 7L))
    val nodes = Seq(3L, 5L, 42L).toDF("id")
    val withIso = ConnectedComponents.runStar(
      Seq((5L, 3L)).toDF("src", "dst"), nodes = Some(nodes))
      .as[(Long, Long)].collect().toMap
    assert(withIso == Map(3L -> 3L, 5L -> 3L, 42L -> 42L))
  }

  test("star variant: self-loop-only nodes survive as singletons (parity with run)") {
    val edges = Seq((5L, 5L), (1L, 2L)).toDF("src", "dst")
    val viaRun = ConnectedComponents.run(edges).as[(Long, Long)].collect().toMap
    val viaStar = ConnectedComponents.runStar(edges).as[(Long, Long)].collect().toMap
    assert(viaRun == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    assert(viaStar == viaRun)
  }

  test("property: star variant == min-label propagation on random graphs") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(0, 60)) { (seed, nEdges) =>
      val rnd = new scala.util.Random(seed)
      // node ids sparse and shuffled so min-ids are not positional
      val edges = (0 until nEdges).map { _ =>
        (rnd.nextInt(30).toLong * 7 + 3, rnd.nextInt(30).toLong * 7 + 3)
      }.filter(e => e._1 != e._2)
      if (edges.isEmpty) true
      else ccStar(edges) == cc(edges)
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(15))
    assert(res.passed, res.status.toString)
  }
}
