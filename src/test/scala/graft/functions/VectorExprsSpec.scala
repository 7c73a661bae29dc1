package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  test("fused dot_product is bit-identical to the zip_with+aggregate fold") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val cmp = df.select(
      VectorExprs.dotProduct(col("a"), col("b")).as("fused"),
      foldDot(col("a"), col("b")).as("folded"))
    assert(cmp.filter(col("fused") =!= col("folded")).count() == 0)
  }

  test("fused cosine_sim matches dot/sqrt/sqrt of separate folds bit-for-bit") {
    val df = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val folded = foldDot(col("a"), col("b")) /
      sqrt(foldDot(col("a"), col("a"))) / sqrt(foldDot(col("b"), col("b")))
    val cmp = df.select(
      VectorExprs.cosineSim(col("a"), col("b")).as("fused"), folded.as("folded"))
    assert(cmp.filter(col("fused") =!= col("folded")).count() == 0)
  }

  test("SQL registration via extensions: functions callable from SQL text, null-safe") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS self,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n,
        |  hamming64(7L, 0L) AS h""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.isNullAt(2))
    assert(r.getInt(3) == 3)
    // unequal lengths null out, matching the zip_with+aggregate fold
    // (zip_with pads the short side with null, nulling the sum)
    val u = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D)) AS d").head()
    assert(u.isNullAt(0))
  }

  test("interpreted eval (no codegen) agrees with codegen path") {
    // force interpreted evaluation by calling nullSafeEval directly
    val a = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1.0f, 2.0f, 3.0f))
    val b = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(4.0f, 5.0f, 6.0f))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1.0f, 2.0f, 3.0f),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val dot = DotProduct(lit, lit)
    assert(dot.eval(null) == (1.0 + 4.0 + 9.0))
    val cos = CosineSim(lit, lit)
    assert(math.abs(cos.eval(null).asInstanceOf[Double] - 1.0) < 1e-15)
    assert(a.numElements() == 3 && b.numElements() == 3)
  }
}
