package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed aggregate (UDAF surface) —
  * the bounded-memory frequent-items operator Spark has no native
  * aggregate for (`stat.freqItems` exists only as a Dataset action).
  * Carries at most k-1 counters per partial aggregate regardless of
  * cardinality, so global heavy hitters over 100 TB of tokens cost one
  * map-side-combined aggregation with O(k) state per mapper — no
  * vocabulary-sized shuffle.
  *
  * Merge is the mergeable-summaries construction (Agarwal et al., PODS
  * 2012): sum counters, then subtract the k-th largest count and drop
  * non-positives. The classic guarantees survive ANY reduce/merge order:
  *
  *   exact(w) − n/k  ≤  est(w)  ≤  exact(w)        (n = stream length)
  *   exact(w) > n/k  ⟹  w is in the sketch
  *   |sketch| ≤ k−1
  *
  * The raw counter values DO depend on partitioning order, so the sketch
  * itself is engine-native (rows-only); the GUARANTEES are deterministic,
  * which is what the pinned query
  * ([[graft.operators.TextAnalysis]] `text_heavy_hitters_pinned`) has the
  * DuckDB oracle check — the q_approx_stats_pinned pattern.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 2, "Misra-Gries needs k >= 2")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1)
      case None if buf.size < k - 1 => buf.updated(w, 1L)
      case None => // decrement-all step: every counter pays one
        buf.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k - 1) summed
    else {
      // subtract the k-th largest count; ≤ k-1 entries can exceed it
      val d = summed.values.toSeq.sortBy(-_).apply(k - 1)
      summed.flatMap { case (w, c) =>
        if (c > d) Some(w -> (c - d)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}

object MisraGries {
  def udafFn(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAggregator(k))

  /** SQL surface. UDAFs register per-SESSION (unlike the codegen'd
    * Expressions `GraftExtensions` injects at session build — the
    * extensions API has no aggregator hook), and k is a constructor
    * parameter rather than a data argument, so the standard sizes get
    * fixed names: `misra_gries_8(col)`, `misra_gries_32(col)`. Idempotent. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(8, 32).foreach { k =>
      spark.udf.register(s"misra_gries_$k", udafFn(k))
    }
}
