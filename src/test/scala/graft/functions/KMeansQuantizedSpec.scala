package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansQuantizedSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Long])*) =
    rows.toDF("id", "qv")

  test("two obvious clusters converge to their integer means") {
    // ids 0,1 seed the two centroids; the data forms tight groups around
    // (0,0) and (100,100)
    val v = vecs(
      0L -> Seq(0L, 0L), 1L -> Seq(100L, 100L),
      2L -> Seq(2L, 0L), 3L -> Seq(0L, 2L),
      4L -> Seq(98L, 100L), 5L -> Seq(100L, 98L))
    val cents = KMeans.fitQuantized(v, k = 2, iters = 3)
      .orderBy($"cid").as[(Long, Seq[Long])].collect().toSeq
    // cluster 0: {(0,0),(2,0),(0,2)} -> mean floor (0,0); cluster 1:
    // {(100,100),(98,100),(100,98)} -> floor (99,99)
    assert(cents == Seq(0L -> Seq(0L, 0L), 1L -> Seq(99L, 99L)))
  }

  test("centroid that loses every point disappears; assignment stays total") {
    // seed centroids at ids 0 and 1, but id 1's vector is inside cluster 0's
    // basin after one update — all points collapse to one cell
    val v = vecs(
      0L -> Seq(0L, 0L), 1L -> Seq(1L, 1L),
      2L -> Seq(0L, 1L), 3L -> Seq(1L, 0L))
    val cents = KMeans.fitQuantized(v, k = 2, iters = 2)
    val cells = KMeans.assignQuantized(v, cents)
      .select($"id", $"cell").as[(Long, Long)].collect().toMap
    assert(cells.size == 4)                 // every vector still assigned
    assert(cells.values.toSet.size <= 2)
  }

  test("assignment ties break toward the smaller centroid id") {
    val v = vecs(0L -> Seq(0L), 1L -> Seq(10L), 2L -> Seq(5L)) // equidistant
    val cents = vecs(0L -> Seq(0L), 1L -> Seq(10L))
      .select($"id".as("cid"), $"qv".as("cv"))
    val cell = KMeans.assignQuantized(v.filter($"id" === 2), cents)
      .select($"cell").as[Long].head()
    assert(cell == 0L)
  }
}
