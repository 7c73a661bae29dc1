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
}
