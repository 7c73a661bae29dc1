package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (UDAF surface, SURVEY §4): keeps the k highest
  * (score, id) pairs per group in a bounded buffer — the reduce-side
  * alternative to rank-window top-k. The window form sorts every row of a
  * partition; this form carries only k pairs per mapper through the shuffle
  * (classic TeraSort-style combiner win when k ≪ group size).
  *
  * Buffer is a plain sorted Vector (k is small); replace with a binary heap
  * if k grows. Deterministic: ties broken by id ascending.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(buf: Seq[(Double, Long)], score: Double, id: Long): Seq[(Double, Long)] = {
    val appended = (buf :+ ((score, id)))
      .sortBy { case (s, i) => (-s, i) }
    if (appended.size > k) appended.take(k) else appended
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    insert(buf, in._2, in._1)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a) { case (acc, (s, i)) => insert(acc, s, i) }

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
