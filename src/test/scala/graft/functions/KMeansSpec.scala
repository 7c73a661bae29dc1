package graft.functions

import graft.SparkSpec

class KMeansSpec extends SparkSpec {

  test("k-means: inertia decreases monotonically-ish and result is deterministic") {
    val vectors = KMeans.embeddingVectors(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val c0 = KMeans.fit(vectors, k = 4, iters = 0) // init only
    val c2 = KMeans.fit(vectors, k = 4, iters = 2)
    val i0 = KMeans.inertia(vectors, c0)
    val i2 = KMeans.inertia(vectors, c2)
    assert(i2 < i0, s"training should reduce inertia: $i0 -> $i2")

    // determinism across runs (fixed init, deterministic tie-breaks)
    val c2b = KMeans.fit(vectors, k = 4, iters = 2)
    val a = c2.collect().map(_.toString).sorted.toSeq
    val b = c2b.collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("trained centroids plug into the IVF assignment shape") {
    val vectors = KMeans.embeddingVectors(
      graft.Tables.load(spark, sfDir, "embeddings"))
    val cents = KMeans.fit(vectors, k = 4, iters = 1)
    val assigned = KMeans.assign(vectors, cents)
    assert(assigned.count() == vectors.count())
    val cells = assigned.select("cell").distinct().count()
    assert(cells > 1 && cells <= 4)
  }
}
