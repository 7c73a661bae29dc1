package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve helpers: interleave the bits of two bucketized
  * dimensions into one sort key, so sorting by that key clusters rows
  * that are close in BOTH dimensions. A range predicate on either
  * dimension then maps to a bounded set of Z-ranges, and parquet
  * row-group min/max stats on the Z column's constituent dims skip
  * groups for filters on either dim — the multi-column generalization of
  * `Sources.writeClustered`'s single-dim sort (measured in LayoutSpec).
  *
  * Built from codegen'd bitwise builtins (shift/and/or), no UDF: the
  * classic 4-step bit-spread, so the whole key derivation stays inside
  * WholeStageCodegen at scan speed.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * value (0b...abcd -> 0b...0a0b0c0d). */
  def spread16(c: Column): Column = {
    val m1 = c.bitwiseAND(lit(0xFFFFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m4 = m3.bitwiseOR(shiftleft(m3, 2)).bitwiseAND(lit(0x33333333L))
    m4.bitwiseOR(shiftleft(m4, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit bucket values: bits of `a` land on
    * even positions, bits of `b` on odd. */
  def morton(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Map a numeric column with known domain [min, max] onto 16-bit
    * buckets (0..65535), monotonically — integer-exact arithmetic.
    * `div` (not `/`, which is double division) keeps wide domains exact:
    * past 2^53 the double quotient can round across a bucket boundary,
    * and a max-domain value rounding up to exactly 65536.0 would wrap to
    * bucket 0 — the far end of the Z-curve. */
  def bucket16(c: Column, min: Long, max: Long): Column = {
    val span = math.max(1L, max - min + 1L)
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        ColumnShim.expression((c - lit(min)).cast("long") * lit(65536L)),
        ColumnShim.expression(lit(span))))
      .bitwiseAND(lit(0xFFFFL))
  }

  /** The Z-order sort key for two dimensions with known domains. */
  def zkey(a: Column, aMin: Long, aMax: Long,
      b: Column, bMin: Long, bMax: Long): Column =
    morton(bucket16(a, aMin, aMax), bucket16(b, bMin, bMax))
}
