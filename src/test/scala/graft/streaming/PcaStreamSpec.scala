package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming maintenance of the PCA sufficient statistics
  * (sim_pca_model's scale path): the co-moment products are a
  * commutative monoid over rows — exact DECIMAL sums — so a
  * complete-mode streaming aggregate of the SAME dataflow
  * ([[graft.operators.Pca.momentProducts]]) holds exactly the state a
  * batch recompute of the prefix would. A pipeline can therefore keep
  * the PCA model fresh against an embedding stream with no approximation
  * drift and state bounded at 2,080 rows. */
class PcaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed co-moment products equal the batch table after every micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val es = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = graft.operators.Pca.momentProducts(
        es.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("pca_stream").start()
    try {
      def streamed(): Map[(Int, Int), java.math.BigDecimal] =
        spark.table("pca_stream")
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2))
          .toMap
      def batchOf(prefix: Seq[(Long, Seq[Float])]): Map[(Int, Int), java.math.BigDecimal] =
        graft.operators.Pca.momentProducts(
            prefix.toDF("vec_id", "embedding"))
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2))
          .toMap

      val rnd = new scala.util.Random(7)
      def vecs(n: Int, base: Long): Seq[(Long, Seq[Float])] =
        (0 until n).map(i =>
          (base + i, Seq.fill(64)(rnd.nextGaussian().toFloat)))

      val b1 = vecs(40, 0L)
      es.addData(b1: _*); q.processAllAvailable()
      val s1 = streamed()
      assert(s1 == batchOf(b1))
      assert(s1.size == 64 * 65 / 2) // state bounded at the pair count

      val b2 = vecs(25, 1000L)
      es.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batchOf(b1 ++ b2))
    } finally q.stop()
  }

  test("single-aggregate streamable moments equal the batch three-aggregate union") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 30).map(i =>
        (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    assert(keyed(graft.operators.Pca.momentRowsStreamable(df).collect()) ==
      keyed(graft.operators.Pca.moments(df).collect()))
  }

  test("projected index after cutover equals the batch recompute under the streamed model") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca-serve").toString
    val home = s"$tmp/home"
    val root0 = VectorIndexStream.IndexHome.init(home)
    val cents = Seq((0L, Seq.fill(64)(0L)), (1L, Seq.fill(64)(1000L)))
      .toDF("cid", "cv")
    val es = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Long])]
    // ONE stream feeds BOTH consumers: the index ingest and the
    // complete-mode moment aggregate (each query tracks its own offsets)
    val qIdx = VectorIndexStream.run(es.toDF().toDF("id", "qv"),
      cents, root0, s"$tmp/ck-idx")
    val qMom = graft.operators.Pca.momentRowsStreamable(
        es.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("pca_mom_serve").start()
    try {
      val rnd = new scala.util.Random(23)
      def vecs(n: Int, base: Long): Seq[(Long, Seq[Long])] =
        (0 until n).map(i =>
          (base + i, Seq.fill(64)(rnd.nextInt(1000).toLong)))
      val b1 = vecs(20, 0L); val b2 = vecs(15, 100L)
      es.addData(b1: _*)
      qIdx.processAllAvailable(); qMom.processAllAvailable()
      es.addData(b2: _*)
      qIdx.processAllAvailable(); qMom.processAllAvailable()

      val momentRows = spark.table("pca_mom_serve").collect()
      // captured pre-cutover: the cutover GC collects the old generation
      val beforeCells = spark.read.parquet(root0)
        .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
      val newRoot = VectorIndexStream.IndexHome.compactCutoverProjected(
        spark, home, momentRows, k = 4)
      assert(VectorIndexStream.IndexHome.resolveRoot(home).contains(newRoot))

      val served = spark.read.parquet(newRoot)
      // membership and cell assignment survive the projected compaction
      val afterCells = served.select($"vec_id", $"cell")
        .as[(Long, Long)].collect().toSet
      assert(afterCells == beforeCells)
      // the served projections ARE the batch recompute: same moments ⇒
      // same Jacobi model ⇒ identical literal projection arithmetic ⇒
      // bit-exact doubles
      val all = (b1 ++ b2).toDF("vec_id", "embedding")
      val model = graft.operators.Pca.fitFromMoments(
        graft.operators.Pca.moments(all).collect(), 4)
      val expected = graft.operators.Pca.project(all, model)
        .as[(Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      val got = served.select($"vec_id", $"pc0", $"pc1", $"pc2", $"pc3")
        .as[(Long, Double, Double, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      assert(got == expected)
    } finally { qIdx.stop(); qMom.stop() }
  }
}
