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
  require(k >= 1, "k must be >= 1") // k <= 0 would silently emit nothing

  /** Linear insertion into the already-sorted buffer — O(k) per row with
    * an O(1) early exit when the buffer is full and the score can't rank,
    * vs re-sorting the whole buffer per input row. Order: score desc,
    * id asc on ties. */
  private[functions] def insert(buf: Seq[(Double, Long)], score: Double, id: Long): Seq[(Double, Long)] = {
    def ranksBefore(e: (Double, Long)): Boolean =
      score > e._1 || (score == e._1 && id < e._2)
    if (buf.size >= k && !ranksBefore(buf.last)) buf
    else {
      val at = buf.indexWhere(ranksBefore)
      val pos = if (at < 0) buf.size else at
      val appended = (buf.take(pos) :+ ((score, id))) ++ buf.drop(pos)
      if (appended.size > k) appended.take(k) else appended
    }
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

/** Dual top-k in ONE pass: the (score desc, id asc) top k over ALL input
  * rows AND over the flagged subset (`in._3`), sharing [[TopKAggregator]]'s
  * insertion. Exists for probe audits where one candidate set is a strict
  * subset of another (the mass-quota'd probe list ⊆ the unquota'd list):
  * instead of two full candidate joins scoring 3.1M pairs, one join scores
  * the superset once and both bounded buffers ride the same shuffle —
  * bit-identical to two [[TopKAggregator]] passes by construction. */
class TopK2Aggregator(k: Int)
    extends Aggregator[(Long, Double, Boolean),
      (Seq[(Double, Long)], Seq[(Double, Long)]),
      (Seq[(Double, Long)], Seq[(Double, Long)])] {
  private val one = new TopKAggregator(k)

  override def zero: (Seq[(Double, Long)], Seq[(Double, Long)]) =
    (Vector.empty, Vector.empty)

  override def reduce(buf: (Seq[(Double, Long)], Seq[(Double, Long)]),
      in: (Long, Double, Boolean)): (Seq[(Double, Long)], Seq[(Double, Long)]) =
    (one.insert(buf._1, in._2, in._1),
      if (in._3) one.insert(buf._2, in._2, in._1) else buf._2)

  override def merge(a: (Seq[(Double, Long)], Seq[(Double, Long)]),
      b: (Seq[(Double, Long)], Seq[(Double, Long)]))
      : (Seq[(Double, Long)], Seq[(Double, Long)]) =
    (b._1.foldLeft(a._1) { case (acc, (s, i)) => one.insert(acc, s, i) },
      b._2.foldLeft(a._2) { case (acc, (s, i)) => one.insert(acc, s, i) })

  override def finish(buf: (Seq[(Double, Long)], Seq[(Double, Long)]))
      : (Seq[(Double, Long)], Seq[(Double, Long)]) = buf

  override def bufferEncoder
      : Encoder[(Seq[(Double, Long)], Seq[(Double, Long)])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Seq[(Double, Long)], Seq[(Double, Long)])]()
  override def outputEncoder
      : Encoder[(Seq[(Double, Long)], Seq[(Double, Long)])] = bufferEncoder
}
