package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hamming distance between two 64-bit signatures as a native Catalyst
  * expression with codegen — the hot inner comparison of simhash near-dup
  * search. A Scala UDF here would box two Longs per row and break
  * whole-stage codegen; this compiles to `Long.bitCount(a ^ b)` inline.
  *
  * (The reference has no such operator — this is part of the LLM-pipeline
  * extension surface; preference order per the build contract is native
  * Expression > UDF.)
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  /** SQL-surface validation (the function is injected via GraftExtensions):
    * wrong argument types must fail analysis with a message naming the
    * function, not ClassCastException inside generated code. */
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hamming64 requires two bigint signatures, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Hamming64 {
  /** Register as a SQL-callable function on the session; use via
    * expr("hamming64(a, b)"). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming64", {
        case Seq(a, b) => Hamming64(a, b)
        case es => throw new IllegalArgumentException(
          s"hamming64 takes exactly 2 arguments, got ${es.length}")
      }, "scala_udf")
}
