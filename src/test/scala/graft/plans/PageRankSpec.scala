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
}
