package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver-local Lloyd twins must be BIT-IDENTICAL to the distributed
  * loops (KMeans.LocalTrainMax routes small training sets to them) — the
  * loops are order-independent integer arithmetic by design, so any
  * divergence is a transcription bug in the twin, not a tolerance. Pinned
  * on the real embedding corpus (sf0.001), including the balanced
  * (ε-split) per-branch path, by forcing the distributed path with
  * localMax = 0 and comparing exact centroid tables. */
class KMeansLocalTwinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    import graft.functions.VectorExprs.quantize1000
    graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), quantize1000(col("embedding")).as("qv"))
  }

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.select(col("cid"), col("cv")).as[(Long, Seq[Long])]
      .collect().sortBy(_._1).toSeq

  test("fitQuantizedFrom: local twin == distributed loop on the real corpus") {
    val v = corpus
    val init = v.filter($"id" < 7).select($"id".as("cid"), $"qv".as("cv"))
    val local = table(KMeans.fitQuantizedFrom(v, init, iters = 3))
    val dist = table(KMeans.fitQuantizedFrom(v, init, iters = 3, localMax = 0))
    assert(local == dist)
  }

  test("fitQuantizedPerBranch: local twin == distributed, balanced path") {
    val v = corpus
    // a deliberately skewed branch split (hash parity ⇒ ~2 branches) so
    // the capFactor path has donors to move
    val sample = v.select(pmod(xxhash64($"id"), lit(3)).as("branch"),
      $"id", $"qv")
    def tbl(df: org.apache.spark.sql.DataFrame) =
      df.select(col("branch"), col("cid"), col("cv"))
        .as[(Long, Long, Seq[Long])].collect().sortBy(r => (r._1, r._2)).toSeq
    val local = tbl(KMeans.fitQuantizedPerBranch(sample, kPerBranch = 4,
      iters = 3, cellCapFactor = 1.2))
    val dist = tbl(KMeans.fitQuantizedPerBranch(sample, kPerBranch = 4,
      iters = 3, cellCapFactor = 1.2, localMax = 0))
    assert(local == dist)
  }

  test("localAssignQ == assignQuantized on the real corpus") {
    val v = corpus
    val cents = KMeans.fitQuantized(v, k = 6, iters = 2)
    val dist = KMeans.assignQuantized(v, cents)
      .select($"id", $"cell").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val centsL = cents.select(col("cid"), col("cv"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
      .map { case (c, cv) => (c, cv.toArray) }.toSeq
    val rows = v.select($"id", $"qv").as[(Long, Seq[Long])].collect()
      .map { case (id, qv) => (id, qv.toArray) }
    val local = KMeans.localAssignQ(rows, centsL)
      .map { case (id, _, cell) => (id, cell) }.sortBy(_._1).toSeq
    assert(local == dist)
  }

  test("fitQuantizedPerBranch: local twin == distributed, uncapped path") {
    val v = corpus
    val sample = v.select(pmod(xxhash64($"id"), lit(2)).as("branch"),
      $"id", $"qv")
    def tbl(df: org.apache.spark.sql.DataFrame) =
      df.select(col("branch"), col("cid"), col("cv"))
        .as[(Long, Long, Seq[Long])].collect().sortBy(r => (r._1, r._2)).toSeq
    val local = tbl(KMeans.fitQuantizedPerBranch(sample, kPerBranch = 3,
      iters = 2))
    val dist = tbl(KMeans.fitQuantizedPerBranch(sample, kPerBranch = 3,
      iters = 2, localMax = 0))
    assert(local == dist)
  }
}
