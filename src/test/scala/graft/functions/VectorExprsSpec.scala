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

  test("null element nulls the result — matching the fold — in codegen and interpreted") {
    // codegen path (SQL surface): any null element must yield NULL, exactly
    // like the zip_with+aggregate fold, never a garbage partial sum
    val r = spark.sql(
      """SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)) AS d,
        |  cosine_sim(array(1.0D, 2.0D), array(CAST(NULL AS DOUBLE), 4.0D)) AS c,
        |  dot_product(array(1.0D, 2.0D),
        |    zip_with(array(3.0D), array(1.0D, 2.0D), (x, y) -> x)) AS z""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // the fold itself agrees
    val fold = spark.sql(
      """SELECT aggregate(zip_with(array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D),
        |  (x, y) -> x * y), 0.0D, (a, v) -> a + v) AS f""".stripMargin).head()
    assert(fold.isNullAt(0))
    // interpreted path
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType => DT, LongType}
    val withNull = Literal.create(Seq[java.lang.Double](1.0, null), ArrayType(DT, true))
    val plain = Literal.create(Seq[java.lang.Double](3.0, 4.0), ArrayType(DT, true))
    assert(DotProduct(withNull, plain).eval(null) == null)
    assert(CosineSim(plain, withNull).eval(null) == null)
    val ln = Literal.create(Seq[java.lang.Long](1L, null), ArrayType(LongType, true))
    val lp = Literal.create(Seq[java.lang.Long](3L, 4L), ArrayType(LongType, true))
    assert(DotProductLong(ln, lp).eval(null) == null)
    assert(SqDistLong(lp, ln).eval(null) == null)
  }

  test("long kernels null out on null elements through the SQL/codegen path") {
    val r = spark.sql(
      """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS fold
        |FROM VALUES (array(1L, CAST(NULL AS BIGINT)), array(3L, 4L)) AS t(a, b)""".stripMargin)
      .head()
    assert(r.isNullAt(0))
    val df = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) AS a, array(3L, 4L) AS b")
    val fused = df.select(
      VectorExprs.dotProductLong(col("a"), col("b")).as("d"),
      VectorExprs.sqDistLong(col("a"), col("b")).as("s")).head()
    assert(fused.isNullAt(0) && fused.isNullAt(1))
  }

  test("hamming64 rejects non-bigint inputs at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hamming64('a', 'b')").collect()
    }
    assert(e.getMessage.contains("hamming64"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hamming64(array(1L), 2L)").collect()
    }
    assert(e2.getMessage.contains("hamming64"))
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
