package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming maintenance of the bounded-state quantile histogram
  * (q_quantile_histogram's scale path): bin counts are pure sums, so a
  * complete-mode streaming aggregate holds EXACTLY the state a batch
  * recompute of the prefix would — the property that lets a monitoring
  * pipeline read p50/p90 mid-stream with no approximation drift. The
  * streaming variant fixes the bin bounds up front (a prior profiling
  * pass supplies them — a 2-pass min/max can't stream), which is how
  * production histogram monitors run anyway.
  */
class HistogramStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Bins = 256L
  private val Lo = 0L
  private val Hi = 10000L // exclusive upper profile bound

  private def binOf(v: Long): Long = ((v - Lo) * Bins) / (Hi - Lo + 1)

  private def p50(hist: Map[Long, Long]): Long = {
    val n = hist.values.sum
    val sorted = hist.toSeq.sortBy(_._1)
    var cum = 0L
    sorted.find { case (_, c) => cum += c; cum * 100 >= 50 * n }.get._1
  }

  test("streaming bin counts over the prefix equal the batch histogram; quantile agrees") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val es = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = es.toDF().toDF("v")
      .select(expr(s"((v - $Lo) * $Bins) div (${Hi - Lo + 1})").as("b"))
      .groupBy($"b").agg(count(lit(1)).as("c"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hist_stream").start()
    try {
      def streamed(): Map[Long, Long] = spark.table("hist_stream")
        .as[(Long, Long)].collect().toMap
      def batchOf(prefix: Seq[Long]): Map[Long, Long] =
        prefix.groupBy(binOf).view.mapValues(_.size.toLong).toMap

      val b1 = (0L until 1000L).map(i => (i * i * 7 + i) % Hi)
      es.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batchOf(b1))

      val b2 = (0L until 600L).map(i => (i * 13 + 5) % Hi)
      es.addData(b2: _*); q.processAllAvailable()
      val afterTwo = streamed()
      assert(afterTwo == batchOf(b1 ++ b2))
      // the mid-stream quantile read: identical to a batch recompute
      assert(p50(afterTwo) == p50(batchOf(b1 ++ b2)))
      // state is bounded by the bin count regardless of stream length
      assert(afterTwo.size <= Bins)
    } finally q.stop()
  }
}
