package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

class SimilarityPqSpec extends SparkSpec {
  import spark.implicits._

  test("pq rerank: queries rank themselves first with exact distance 0") {
    val got = SparkEntry.queries("sim_pq_rerank")(spark, sfDir)
      .select("qid", "rank", "vec_id", "exact_d2")
      .as[(Long, Int, Long, Long)].collect()
    val first = got.filter(_._2 == 1)
    assert(first.length == 3) // NQueries
    // the query vector is in the corpus, so rank 1 must be the query itself
    first.foreach { case (qid, _, vecId, exact) =>
      assert(vecId == qid && exact == 0L, s"qid=$qid rank1=$vecId d2=$exact")
    }
  }

  test("pq rerank: exact distance is non-decreasing in rank per query") {
    val got = SparkEntry.queries("sim_pq_rerank")(spark, sfDir)
      .select("qid", "rank", "exact_d2")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).values
    got.foreach { rows =>
      val byRank = rows.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("pq rerank plan: distance table and shortlist broadcast, corpus shuffled once") {
    val p = SparkEntry.queries("sim_pq_rerank")(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert(p.contains("BroadcastHashJoin"))
  }
}
