package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed aggregate —
  * the bounded-memory point-frequency estimator that complements the
  * [[MisraGriesAggregator]] heavy-hitters sketch: MG answers "which items
  * are frequent", CMS answers "how frequent is THIS item" for any item,
  * in `depth × width` counters regardless of cardinality. At 100 TB the
  * sketch is one map-side-combined aggregation with O(d·w) state per
  * mapper — no key-cardinality shuffle anywhere.
  *
  * Contract: est(x) = min_j counter[j][h_j(x)] ≥ exact(x) ALWAYS (counters
  * only overcount — collisions add, never subtract), and est(x) ≤
  * exact(x) + ε·n with probability 1−δ for ε = e/width, δ = e^(−depth).
  *
  * Unlike Misra-Gries (whose counter values depend on reduce order), the
  * CMS buffer is a pure elementwise SUM — commutative, associative,
  * partitioning-independent — so with engine-neutral hash functions the
  * ENTIRE sketch is deterministic and the DuckDB oracle replays point
  * estimates EXACTLY (`q_cms_custkey`), not just guarantee booleans.
  * Hashes are pairwise-independent-style affine maps over a Mersenne-ish
  * prime, h_j(x) = ((x·A_j + B_j) mod P) mod width, pure BIGINT
  * arithmetic in both engines.
  */
class CountMinAggregator(val depth: Int, val width: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(depth >= 1 && depth <= CountMin.HashA.length,
    s"depth must be in [1, ${CountMin.HashA.length}]")
  require(width >= 2, "width must be >= 2")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var j = 0
    while (j < depth) {
      buf(j * width + CountMin.bucket(x, j, width)) += 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CountMin {

  /** Affine hash constants (fixed, engine-neutral; all < P). */
  val HashA: Seq[Long] = Seq(31L, 131L, 1031L, 10007L)
  val HashB: Seq[Long] = Seq(7L, 77L, 777L, 7777L)
  val P: Long = 1000000007L

  /** Row-j bucket of key x — the JVM twin of [[bucketCol]]. The key is
    * reduced mod P FIRST: mathematically a no-op (affine maps commute
    * with mod-P reduction), but it (a) makes negative keys address the
    * same counter on the write (JVM floorMod) and read (Column pmod)
    * paths, and (b) bounds the product at ~1e13 so neither side can
    * overflow — the JVM would silently wrap while ANSI Column math
    * throws, a write/read divergence for |x| > ~9.2e14. */
  def bucket(x: Long, j: Int, width: Int): Int =
    ((math.floorMod(x, P) * HashA(j) + HashB(j)) % P % width).toInt

  /** The same bucket as a Column expression (for estimate lookups in
    * DataFrame space; replayed verbatim by the oracle SQL). Identical
    * value to [[bucket]] for EVERY Long key, negatives included. */
  def bucketCol(x: Column, j: Int, width: Int): Column =
    (pmod(x, lit(P)) * HashA(j) + HashB(j)) % P % width

  /** Point estimate from a flattened sketch column (Seq[Long] of
    * depth×width): min over rows of the addressed counter. */
  def estimateCol(sketch: Column, x: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(j =>
      element_at(sketch,
        (lit(j * width) + bucketCol(x, j, width) + 1).cast(IntegerType))): _*)

  def udafFn(depth: Int, width: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMinAggregator(depth, width))

  /** SQL surface, fixed standard sizes (UDAFs register per-session and
    * take no constructor args through SQL — the MisraGries discipline):
    * `count_min_4x64(key)`, `count_min_4x1024(key)`. Idempotent. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(64, 1024).foreach { w =>
      spark.udf.register(s"count_min_4x$w", udafFn(4, w))
    }
}
