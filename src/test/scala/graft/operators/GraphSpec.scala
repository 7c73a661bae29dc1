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
}
