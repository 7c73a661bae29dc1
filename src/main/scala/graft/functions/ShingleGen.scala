package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF surface, SURVEY §2.5): explode a
  * document into its word w-shingles WITHOUT materializing the shingle
  * array — one output row per shingle, streamed from the generator. The
  * analyzer's ExtractGenerator wraps this into a `Generate` node, the same
  * plan shape as `explode`, so it composes with projections and runs as a
  * narrow op.
  *
  * Semantics mirror the array pipeline used by the minhash path
  * (graft.operators.Dedup.shingleDf): tokens = split on single space
  * (trailing empties kept, like Spark's `split`), shingle i =
  * tokens[i .. i+w-1] joined by spaces, truncated at the end; a document
  * shorter than w tokens yields its whole token list as one shingle.
  * Duplicates are EMITTED (dedup is the consumer's choice, e.g.
  * `array_distinct` equivalent via DISTINCT downstream).
  *
  * Why a Generator and not `explode(transform(sequence(...)))`: the array
  * form materializes every shingle of a document in one row buffer before
  * exploding — per-row memory O(doc length × w). The generator streams
  * rows out, which is the difference between "fine" and "OOM" on the long
  * tail of a 100 TB corpus (book-length documents).
  */
case class ShingleGen(child: Expression, width: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, width)

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_gen requires a string document, got ${child.dataType.catalogString}")
    else if (width.dataType != IntegerType || !width.foldable)
      TypeCheckResult.TypeCheckFailure(
        "shingle_gen requires a literal integer shingle width")
    else width.eval(null) match {
      // reject bad literals HERE: a task-time require would fail the stage
      // with retries instead of a clean analysis error
      case null => TypeCheckResult.TypeCheckFailure(
        "shingle_gen width must not be null")
      case v: Int if v < 1 => TypeCheckResult.TypeCheckFailure(
        s"shingle_gen width must be >= 1, got $v")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  private lazy val w: Int = width.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val text = child.eval(input)
    if (text == null) Iterator.empty
    else {
      val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
      val count = math.max(toks.length - (w - 1), 1)
      (0 until count).iterator.map { i =>
        val s = toks.slice(i, math.min(i + w, toks.length)).mkString(" ")
        new GenericInternalRow(Array[Any](UTF8String.fromString(s)))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ShingleGen =
    copy(child = newChildren(0), width = newChildren(1))
}
