package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Fused vector kernels as native codegen'd Catalyst expressions — the hot
  * inner loop of brute-force similarity and embedding dedup.
  *
  * The composable form (`zip_with` product + `aggregate` fold) is already
  * codegen'd, but it MATERIALIZES the intermediate product array per pair
  * and folds it in a second loop. On an O(Q·N) pair join that allocation is
  * the dominant cost. These expressions compile to a single fused loop with
  * zero allocation, while keeping bit-identical arithmetic to the fold
  * (left-to-right double accumulation, per-element widening cast) — so
  * swapping them into an oracle-verified query does not change its hash.
  *
  * Accumulation order is part of the CONTRACT here, not an accident: the
  * DuckDB oracles state the same left fold via list_reduce.
  */
abstract class VectorFoldExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Can return null even for non-null inputs (unequal lengths), so the
    * default child-derived nullability would be WRONG for literal inputs —
    * whole-stage codegen would constant-fold isNull away and the null
    * silently degrades to a garbage value. */
  override def nullable: Boolean = true

  /** Analysis-time validation: both inputs must be arrays of a supported
    * numeric element type, so SQL misuse gets a clean AnalysisException
    * naming the function instead of a runtime ClassCastException. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires two arrays of float/double/long/int, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** The fold these kernels mirror (`zip_with` product + `aggregate` sum)
    * returns NULL as soon as any element is null (null product poisons the
    * running sum). Reading the raw slot instead would silently return
    * garbage, so when either input type admits null elements the loops
    * below carry a per-element null check; when both types declare
    * containsNull=false the check is statically elided from codegen. */
  protected def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  /** codegen element read, widened to double */
  protected def readElem(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }

  /** interpreted element read, widened to double */
  protected def evalElem(e: Expression, arr: ArrayData, i: Int): Double =
    elemType(e) match {
      case FloatType   => arr.getFloat(i).toDouble
      case DoubleType  => arr.getDouble(i)
      case LongType    => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case t => throw new IllegalArgumentException(s"unsupported element type $t")
    }
}

/** dot_product(a, b) = Σᵢ aᵢ·bᵢ, accumulated left-to-right in double. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null // match the fold:
    // zip_with pads the short side with null, nulling the whole sum
    val n = a.numElements()
    var dot = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // null element nulls the fold
      dot += evalElem(left, a, i) * evalElem(right, b, i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $dot += ${readElem(left, a, i)} * ${readElem(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_sim(a, b) = dot/√(Σa²)/√(Σb²), all three sums in one fused pass,
  * each accumulated left-to-right (matches dot/sqrt/sqrt of separate
  * folds bit-for-bit because the three accumulators are independent). */
case class CosineSim(left: Expression, right: Expression)
    extends VectorFoldExpression {

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // null element nulls the fold
      val x = evalElem(left, a, i); val y = evalElem(right, b, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $x = ${readElem(left, a, i)};
         |    double $y = ${readElem(right, b, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / java.lang.Math.sqrt($na) / java.lang.Math.sqrt($nb);
         |  }
         |}""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer-vector kernels for the quantized similarity path (elements are
  * round(x·1000) longs): exact integer sums, so accumulation order is
  * irrelevant — these exist purely to fuse the loop and kill the per-pair
  * intermediate array. Overflow headroom: |elem| ≤ ~10⁴ ⇒ per-term ≤ 10⁸,
  * 64 dims ⇒ |sum| ≤ 10¹⁰, far inside Long. */
abstract class LongVectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // null on unequal lengths

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires two arrays of bigint, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  protected def pairTerm(x: String, y: String): String
  protected def pairEval(x: Long, y: Long): Long

  /** See [[VectorFoldExpression.mayHaveNullElems]] — same fold contract. */
  protected def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0L; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null // null element nulls the fold
      acc += pairEval(a.getLong(i), b.getLong(i)); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val nullCheck = if (mayHaveNullElems)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $x = $a.getLong($i); long $y = $b.getLong($i);
         |    $acc += ${pairTerm(x, y)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}""".stripMargin
    })
}

/** dot_product_long(a, b) = Σᵢ aᵢ·bᵢ over long arrays (exact). */
case class DotProductLong(left: Expression, right: Expression)
    extends LongVectorFoldExpression {
  override protected def pairTerm(x: String, y: String): String = s"$x * $y"
  override protected def pairEval(x: Long, y: Long): Long = x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sqdist_long(a, b) = Σᵢ (aᵢ-bᵢ)² over long arrays (exact). */
case class SqDistLong(left: Expression, right: Expression)
    extends LongVectorFoldExpression {
  override protected def pairTerm(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def pairEval(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level API (no registration needed). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def dotProductLong(a: Column, b: Column): Column =
    ColumnShim.column(DotProductLong(
      ColumnShim.expression(a), ColumnShim.expression(b)))
  def sqDistLong(a: Column, b: Column): Column =
    ColumnShim.column(SqDistLong(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  type FunctionDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, usage: String,
      builder: Seq[Expression] => Expression): FunctionDescriptor =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.VectorExprs", name, usage),
      builder)

  /** Arity-checked 2-arg builder: a wrong argument count raises a clean
    * error naming the function (the module's stated SQL-misuse contract)
    * instead of an IndexOutOfBoundsException from `es(1)`. */
  private def binary(name: String, usage: String,
      mk: (Expression, Expression) => Expression): FunctionDescriptor =
    descriptor(name, usage, {
      case Seq(a, b) => mk(a, b)
      case es => throw new IllegalArgumentException(
        s"$name takes exactly 2 arguments, got ${es.length}")
    })

  val dotProductDescriptor: FunctionDescriptor =
    binary("dot_product", "dot_product(a, b) - left-fold double dot product",
      DotProduct(_, _))
  val cosineSimDescriptor: FunctionDescriptor =
    binary("cosine_sim", "cosine_sim(a, b) - fused cosine similarity",
      CosineSim(_, _))
  val hamming64Descriptor: FunctionDescriptor =
    binary("hamming64", "hamming64(a, b) - popcount(a XOR b)",
      Hamming64(_, _))
  val shingleGenDescriptor: FunctionDescriptor =
    binary("shingle_gen",
      "shingle_gen(text, w) - stream word w-shingles (table function)",
      ShingleGen(_, _))

  /** round(x·1000) integer quantization — THE shared scale contract of the
    * quantized similarity path (the Long kernels' overflow-headroom math
    * and every quantized oracle assume exactly this transform; keep the
    * single definition). */
  def quantize1000(c: Column): Column =
    org.apache.spark.sql.functions.transform(c,
      x => org.apache.spark.sql.functions.round(
        x.cast(DoubleType) * 1000).cast(LongType))

  /** Runtime registration on an existing session (tests, notebooks). The
    * creation-time path is [[graft.GraftExtensions]]. */
  def registerAll(spark: SparkSession): Unit =
    Seq(dotProductDescriptor, cosineSimDescriptor, hamming64Descriptor,
      shingleGenDescriptor)
      .foreach { case (id, _, b) =>
        spark.sessionState.functionRegistry
          .createOrReplaceTempFunction(id.funcName, b, "built-in")
      }
}
