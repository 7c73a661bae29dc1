package graft.plans

import graft.functions.Hamming64
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, BitwiseAnd, CreateArray,
  EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  LessThan, LessThanOrEqual, Literal, Not, Or, PosExplode, PredicateHelper,
  ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a Hamming-threshold join — an inner join whose
  * cross-side predicate is `hamming64(l, r) <= k` — into the banded
  * equi-join the dedup operators build by hand (simhash, phash), so ANY
  * caller phrasing the similarity join declaratively gets the
  * pigeonhole-exact plan instead of the O(|L|x|R|)
  * BroadcastNestedLoopJoin Spark would otherwise produce.
  *
  * Rewrite (B = k+1 bands over the 64 signature bits):
  *   L JOIN R ON hamming64(ls, rs) <= k AND rest
  * =>
  *   Project(original output,
  *     Generate(posexplode(bands(ls)), L)
  *       JOIN Generate(posexplode(bands(rs)), R)
  *       ON posL = posR AND valL = valR
  *          AND firstMatch(posL)          -- meet EXACTLY once
  *          AND <the full original condition>)
  *
  * Exactness (pigeonhole): k+1 disjoint bands cover all 64 bits, so a
  * pair within Hamming distance k has at most k differing bits and must
  * agree on at least one whole band — every qualifying pair meets. The
  * first-match residual (for every earlier band j < pos, band_j(ls) ≠
  * band_j(rs)) makes a pair agreeing on several bands meet exactly once —
  * the interval-overlap rule's no-dedup-aggregate discipline (an inserted
  * distinct could merge genuinely duplicate input rows). The FULL
  * original predicate re-filters at the join, so same-band pairs beyond
  * the threshold drop out. Null signatures band to null values, which the
  * band equi-key rejects — matching the inner join's null semantics.
  *
  * Cost: each side replicates k+1 times (the band count), then one
  * shuffle on (band index, band value) — output-linear in the candidate
  * pairs instead of |L|x|R|, the standard multi-index Hamming search
  * trade (the simhash/phash literature's banding).
  *
  * Scope guards: inner joins only; exactly one Hamming-threshold
  * conjunct (both signature expressions LongType, one per side; k a
  * foldable integer constant in [0, maxK]); no cross-side equi conjunct
  * (hash join already available); every conjunct deterministic. k ≥ 64
  * never rewrites (the predicate is vacuous — banding cannot prune).
  *
  * Off by default; enabled per-session via
  * `spark.graft.hammingBandJoin.enabled`; `spark.graft.hammingBandJoin
  * .maxK` (default 16) bounds the replication factor — past it band
  * selectivity decays (64/(k+1) bits per band) and the rewrite stops
  * paying. Manual shapes this automates: `operators/Dedup.scala`
  * (simhash bands), `operators/Multimodal.scala` (phash bands).
  */
class HammingBandJoinRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val EnabledKey = "spark.graft.hammingBandJoin.enabled"
  private val MaxKKey = "spark.graft.hammingBandJoin.maxK"

  private def enabled: Boolean =
    try conf.getConfString(EnabledKey, "false").toBoolean
    catch { case _: IllegalArgumentException => false }

  private def maxK: Int =
    try conf.getConfString(MaxKKey, "16").toInt
    catch { case _: NumberFormatException => 16 }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond).getOrElse(j)
    }
  }

  /** Band `i` of `B` over a 64-bit signature: bits [64i/B, 64(i+1)/B). */
  private def bandExpr(sig: Expression, i: Int, b: Int): Expression = {
    val start = (64 * i) / b
    val width = (64 * (i + 1)) / b - start
    val mask = if (width == 64) -1L else (1L << width) - 1L
    BitwiseAnd(ShiftRightUnsigned(sig, Literal(start, IntegerType)),
      Literal(mask, LongType))
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOf(e: Expression): Option[Boolean] = {
      val r = e.references
      if (r.isEmpty) None
      else if (r.subsetOf(left.outputSet)) Some(true)
      else if (r.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def crossSide(a: Expression, b: Expression): Boolean =
      (sideOf(a), sideOf(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
    if (conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }) return None
    if (!conjuncts.forall(_.deterministic)) return None

    // the Hamming-threshold conjunct, normalized to <= k
    def intConst(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    val hits = conjuncts.flatMap {
      case LessThanOrEqual(h @ Hamming64(a, b), c) =>
        intConst(c).map(k => (h, a, b, k))
      case LessThan(h @ Hamming64(a, b), c) =>
        intConst(c).map(k => (h, a, b, k - 1))
      case GreaterThanOrEqual(c, h @ Hamming64(a, b)) =>
        intConst(c).map(k => (h, a, b, k))
      case GreaterThan(c, h @ Hamming64(a, b)) =>
        intConst(c).map(k => (h, a, b, k - 1))
      case _ => None
    }
    val hit = hits match {
      case Seq((_, a, b, k)) if crossSide(a, b) &&
          a.dataType == LongType && b.dataType == LongType &&
          k >= 0 && k <= math.min(63, maxK) => Some((a, b, k))
      case _ => None // zero, ambiguous (several), vacuous, or over budget
    }
    hit.map { case (a, b, k) =>
      val bCount = k + 1
      val (sigL, sigR) = if (sideOf(a).contains(true)) (a, b) else (b, a)
      def explodeBands(sig: Expression, tag: String, child: LogicalPlan)
          : (Generate, Attribute, Attribute) = {
        val pos = AttributeReference(s"__graft_band_pos_$tag", IntegerType)()
        val v = AttributeReference(s"__graft_band_val_$tag", LongType)()
        val gen = Generate(
          PosExplode(CreateArray((0 until bCount).map(bandExpr(sig, _, bCount)))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(pos, v), child = child)
        (gen, pos, v)
      }
      val (lGen, posL, valL) = explodeBands(sigL, "l", left)
      val (rGen, posR, valR) = explodeBands(sigR, "r", right)
      // meet exactly once: this is the FIRST agreeing band — every
      // earlier band differs
      val firstMatch = (0 until bCount - 1).map { jIdx =>
        Or(LessThanOrEqual(posL, Literal(jIdx, IntegerType)),
          Not(EqualTo(bandExpr(sigL, jIdx, bCount),
            bandExpr(sigR, jIdx, bCount))))
      }.reduceOption(And).getOrElse(Literal.TrueLiteral)
      val newJoin = Join(lGen, rGen, Inner,
        Some(And(EqualTo(posL, posR),
          And(EqualTo(valL, valR), And(firstMatch, cond)))), j.hint)
      Project(j.output, newJoin)
    }
  }
}
