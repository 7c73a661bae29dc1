package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, Cast, EqualNullSafe, EqualTo,
  Explode, Expression, GreaterThan, GreaterThanOrEqual, Greatest,
  IntegralDivide, LessThan, LessThanOrEqual, Literal, PredicateHelper,
  Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a pure range join — an inner join whose ONLY
  * cross-side predicates bound a point expression from one side between a
  * lower and an upper expression from the other — into a binned equi-join,
  * the rewrite temporal/interval engines apply and Spark otherwise plans as
  * a BroadcastNestedLoopJoin (O(|L|x|R|) work, and BNLJ additionally drops
  * the probe pipeline out of whole-stage codegen).
  *
  * Rewrite (W = configured bin width):
  *   L JOIN R ON p >= lo AND p <= hi        -- p from L; lo, hi from R
  * =>
  *   Project(original output,
  *     (L + bin := p div W)
  *       JOIN (R + bin := explode(sequence(lo div W, max(lo,hi) div W)))
  *       ON L.bin = R.bin AND p >= lo AND p <= hi)
  *
  * Exactness: integer division is monotone, so lo <= p <= hi implies
  *   bin(lo) <= bin(p) <= bin(hi) — every qualifying pair shares the point
  * row's single bin (no duplicate pairs, no dedup needed), and the FULL
  * original predicate re-filters at the join, so extra bin co-residents
  * drop out. Inverted intervals (lo > hi — predicate always false) clamp
  * to one spurious bin row that the residual kills; null bounds yield a
  * null sequence → Explode emits nothing, matching inner-join null
  * semantics; a null point bins to null, which the bin equi-key rejects
  * like the original comparison would.
  *
  * Cost: one shuffle on the bin key; the bounds side replicates once per
  * bin its interval touches — ceil(len/W)+1 rows, user-tuned via W. The
  * result is output-linear instead of |L|x|R|.
  *
  * Scope guards (fire narrowly, stay correct):
  *  - inner joins only, and only when NO cross-side equi conjunct exists
  *    (if one does, Spark already hash-joins; binning would only add work —
  *    this also makes the rule a no-op on its own output);
  *  - point/bounds expressions must be integral (int/long family) — bin
  *    arithmetic is exact there;
  *  - every other conjunct must be single-sided (pushable filters), so the
  *    rewrite never weakens a predicate it does not re-apply.
  *
  * Off by default; enabled per-session via
  * `spark.graft.binnedRangeJoin.width` (a positive long in the unit of the
  * point expression). Reference for the manual shape this automates:
  * `operators/Extended.scala` (q_range_join_binned).
  */
class BinnedRangeJoinRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.binnedRangeJoin.width"

  private def width: Long =
    try conf.getConfString(WidthKey, "0").toLong catch {
      case _: NumberFormatException => 0L
    }

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, w).getOrElse(j)
    }
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOf(e: Expression): Option[Boolean] = { // Some(true)=left-only
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
    // bail if an equi conjunct already exists (hash join is available)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    if (hasEqui) return None

    // normalize each cross-side comparison to (point, bound, isLower).
    // Each comparison is emitted in BOTH orientations (a >= b is a lower
    // bound on a AND an upper bound on b) — whichever expression turns out
    // to have both a lower and an upper bound becomes the point; the other
    // orientation just never completes a pair. Strict variants are safe:
    // binning only needs lo <= p <= hi as a SUPERSET condition, and the
    // residual re-applies the strict form.
    // The band form abs(x - y) <= c expands to the same normal form
    // (y - c <= x <= y + c, and symmetrically for y) with operands widened
    // to long — int→long casts only, so int inputs can't overflow. For
    // LONG inputs within ~2^62 of the domain edge the y±c bound can
    // overflow: under ANSI (this repo's sessions) that THROWS visibly;
    // in non-ANSI it would wrap and silently drop edge pairs — if that
    // regime matters, pre-shift the domain before joining.
    case class Bound(point: Expression, bound: Expression, lower: Boolean)
    import org.apache.spark.sql.catalyst.expressions.{Abs, Add, Subtract}
    def asLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    def bandBounds(x: Expression, y: Expression, c: Expression): Seq[Bound] =
      if (crossSide(x, y) && integral(x) && integral(y) && integral(c) &&
          c.references.isEmpty && c.deterministic) // c: constant only
        Seq(
          Bound(x, Subtract(asLong(y), asLong(c)), lower = true),
          Bound(x, Add(asLong(y), asLong(c)), lower = false),
          Bound(y, Subtract(asLong(x), asLong(c)), lower = true),
          Bound(y, Add(asLong(x), asLong(c)), lower = false))
      else Seq.empty
    val bounds = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) if crossSide(a, b) =>
        Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
      case GreaterThan(a, b) if crossSide(a, b) =>
        Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
      case LessThanOrEqual(a, b) if crossSide(a, b) =>
        Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
      case LessThan(a, b) if crossSide(a, b) =>
        Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), c) => bandBounds(x, y, c)
      case LessThan(Abs(Subtract(x, y, _), _), c) => bandBounds(x, y, c)
      case GreaterThanOrEqual(c, Abs(Subtract(x, y, _), _)) => bandBounds(x, y, c)
      case GreaterThan(c, Abs(Subtract(x, y, _), _)) => bandBounds(x, y, c)
      case _ => Seq.empty
    }
    // every remaining conjunct must be single-sided (a pushable filter the
    // join keeps in its residual) — anything else (OR across sides, UDF
    // over both) means this is not a pure range join; don't touch it.
    def isRangeShape(e: Expression): Boolean = e match {
      case GreaterThanOrEqual(a, b) => crossSide(a, b)
      case GreaterThan(a, b) => crossSide(a, b)
      case LessThanOrEqual(a, b) => crossSide(a, b)
      case LessThan(a, b) => crossSide(a, b)
      case _ => false
    }
    val other = conjuncts.filterNot {
      case e if isRangeShape(e) => true
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), c) =>
        bandBounds(x, y, c).nonEmpty
      case LessThan(Abs(Subtract(x, y, _), _), c) =>
        bandBounds(x, y, c).nonEmpty
      case GreaterThanOrEqual(c, Abs(Subtract(x, y, _), _)) =>
        bandBounds(x, y, c).nonEmpty
      case GreaterThan(c, Abs(Subtract(x, y, _), _)) =>
        bandBounds(x, y, c).nonEmpty
      case _ => false
    }
    if (!other.forall(e => sideOf(e).isDefined)) return None

    // pick a point expression with BOTH a lower and an upper bound, all
    // integral, point on one side and both bounds on the other
    val candidates = bounds.groupBy(_.point.canonicalized)
    val hit = candidates.values.flatMap { bs =>
      val p = bs.head.point
      val lows = bs.filter(_.lower)
      val highs = bs.filterNot(_.lower)
      for {
        lo <- lows.headOption
        hi <- highs.headOption
        pSide <- sideOf(p)
        loSide <- sideOf(lo.bound) if loSide != pSide
        hiSide <- sideOf(hi.bound) if hiSide != pSide
        if integral(p) && integral(lo.bound) && integral(hi.bound)
      } yield (p, lo.bound, hi.bound, pSide)
    }.headOption
    hit.map { case (p, lo, hi, pointOnLeft) =>
      val wLit = Literal(w, LongType)
      def bin(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType), wLit)
      val (pointPlan, boundsPlan) = if (pointOnLeft) (left, right) else (right, left)
      // point side: one projected bin column
      val pAlias = Alias(bin(p), "__graft_bin_p")()
      val pointBinned = Project(pointPlan.output :+ pAlias, pointPlan)
      // bounds side: explode every bin the interval touches; Greatest
      // clamps inverted intervals to one spurious row the residual kills
      // Sequence is TimeZoneAwareExpression: without an explicit zone it
      // stays UNRESOLVED post-analysis and plan validation rejects the
      // rewrite (the zone is only semantically relevant for temporal
      // sequences, but resolution requires it unconditionally)
      val seq = Sequence(
        bin(lo), Greatest(Seq(bin(lo), bin(hi))), Some(Literal(1L, LongType)),
        Some(conf.sessionLocalTimeZone))
      val bAttr = AttributeReference("__graft_bin_b", LongType)()
      val boundsBinned = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bAttr),
        child = boundsPlan)
      val (newLeft, newRight, lBin, rBin) =
        if (pointOnLeft) (pointBinned, boundsBinned, pAlias.toAttribute, bAttr)
        else (boundsBinned, pointBinned, bAttr, pAlias.toAttribute)
      val newJoin = Join(newLeft, newRight, Inner,
        Some(And(EqualTo(lBin, rBin), cond)), j.hint)
      Project(j.output, newJoin)
    }.orElse(rewriteOverlap(j, left, right, cond, conjuncts,
      (a, b) => crossSide(a, b), e => sideOf(e), w))
  }

  /** Interval-OVERLAP joins: `ls <= re AND rs <= le` (each side an
    * interval, no shared point expression — the point/bounds extractor
    * above finds no hit). Both sides explode every bin their interval
    * touches, and the FIRST-SHARED-BIN residual `bin = max(bin(ls),
    * bin(rs))` makes each overlapping pair meet EXACTLY once — no dedup
    * aggregate, which a generic rewrite could not insert safely anyway
    * (grouping by all columns would also merge genuinely duplicate input
    * rows). Proof the shared bin is registered by both sides: from
    * `rs <= le`, bin(rs) <= bin(le), so max(bin(ls), bin(rs)) lies in
    * left's [bin(ls), max(bin(ls), bin(le))] — symmetrically for right
    * via `ls <= re`; Greatest-clamped sequences cover exactly those
    * ranges (inverted intervals clamp to one spurious row the residual
    * kills). Replication is ceil(len/W)+1 per side — the manual
    * `q_interval_overlap` shape, automated. */
  private def rewriteOverlap(
      j: Join, left: LogicalPlan, right: LogicalPlan, cond: Expression,
      conjuncts: Seq[Expression], crossSide: (Expression, Expression) => Boolean,
      sideOf: Expression => Option[Boolean], w: Long): Option[LogicalPlan] = {
    // X <= Y (or strict) with X left-only / Y right-only, and the mirror
    case class Upper(lo: Expression, hi: Expression, loLeft: Boolean)
    val uppers = conjuncts.flatMap {
      case LessThanOrEqual(a, b) if crossSide(a, b) =>
        sideOf(a).map(Upper(a, b, _))
      case LessThan(a, b) if crossSide(a, b) =>
        sideOf(a).map(Upper(a, b, _))
      case GreaterThanOrEqual(a, b) if crossSide(a, b) =>
        sideOf(b).map(Upper(b, a, _))
      case GreaterThan(a, b) if crossSide(a, b) =>
        sideOf(b).map(Upper(b, a, _))
      case _ => None
    }
    val pair = for {
      u1 <- uppers.find(_.loLeft)   // ls <= re
      u2 <- uppers.find(!_.loLeft)  // rs <= le
      if Seq(u1.lo, u1.hi, u2.lo, u2.hi).forall(integral)
    } yield (u1.lo, u2.hi, u2.lo, u1.hi) // (ls, le, rs, re)
    pair.map { case (ls, le, rs, re) =>
      val wLit = Literal(w, LongType)
      def bin(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType), wLit)
      def explodeBins(s: Expression, e: Expression, name: String,
          child: LogicalPlan): (Generate, AttributeReference) = {
        val seq = Sequence(bin(s), Greatest(Seq(bin(s), bin(e))),
          Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
        val attr = AttributeReference(name, LongType)()
        (Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
          qualifier = None, generatorOutput = Seq(attr), child = child), attr)
      }
      val (lGen, lBin) = explodeBins(ls, le, "__graft_bin_l", left)
      val (rGen, rBin) = explodeBins(rs, re, "__graft_bin_r", right)
      val firstShared = EqualTo(lBin, Greatest(Seq(bin(ls), bin(rs))))
      val newJoin = Join(lGen, rGen, Inner,
        Some(And(EqualTo(lBin, rBin), And(firstShared, cond))), j.hint)
      Project(j.output, newJoin)
    }
  }
}
