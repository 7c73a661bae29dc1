package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShingleGenSpec extends SparkSpec {
  import spark.implicits._

  test("generator output equals the array-transform shingling") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(50)
    val gen = docs
      .select(col("doc_id"), expr("shingle_gen(text, 3)").as("s"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val toks = split(col("text"), " ")
    val viaArray = docs
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(toks) - 2, lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(3))))).as("s"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(gen.nonEmpty && gen == viaArray)
  }

  test("short documents yield one whole-text shingle; null text yields none") {
    val d = Seq((1L, "ab"), (2L, "x y"), (3L, null)).toDF("id", "text")
    val got = d.select(col("id"), expr("shingle_gen(text, 3)").as("s"))
      .as[(Long, String)].collect().toSeq
    assert(got.toSet == Set((1L, "ab"), (2L, "x y")))
  }

  test("rejects non-string input and non-literal width at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT shingle_gen(42, 3)").collect()
    }
    assert(e.getMessage.contains("shingle_gen"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT shingle_gen('a b c', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e2.getMessage.contains("shingle_gen"))
  }

  test("plan is a Generate node (streamed), not an array explode") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val p = docs.select(expr("shingle_gen(text, 3)"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Generate shinglegen"), p.take(500))
  }
}
