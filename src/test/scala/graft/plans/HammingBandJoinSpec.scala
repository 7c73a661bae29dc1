package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[HammingBandJoinRule]] contract: result equality with the naive
  * nested-loop plan (the rewrite is an exact pigeonhole transformation,
  * not an approximation), exactly-once pair emission, null semantics,
  * and the scope guards. */
class HammingBandJoinSpec extends SparkSpec {
  import spark.implicits._

  private val EnabledKey = "spark.graft.hammingBandJoin.enabled"

  private def withRule[A](body: => A): A = {
    spark.conf.set(EnabledKey, "true")
    try body finally spark.conf.unset(EnabledKey)
  }

  private def sigs(name: String, vs: Seq[java.lang.Long]): DataFrame =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF(s"id_$name", s"sig_$name")

  private def pairs(a: DataFrame, b: DataFrame, pred: String): Set[(Long, Long)] =
    a.join(b, expr(pred)).select($"id_a", $"id_b")
      .as[(Long, Long)].collect().toSet

  test("rewritten join equals the nested-loop join on random signatures") {
    val rnd = new scala.util.Random(31)
    val vs: Seq[java.lang.Long] = Seq.fill(120)(rnd.nextLong(): java.lang.Long) ++
      Seq(null, null) // null signatures never match
    val a = sigs("a", vs)
    val b = sigs("b", vs.reverse)
    Seq(0, 1, 3, 7).foreach { k =>
      val pred = s"hamming64(sig_a, sig_b) <= $k"
      val naive = pairs(a, b, pred)
      val banded = withRule(pairs(a, b, pred))
      assert(banded == naive, s"k=$k: banded != naive")
    }
  }

  test("identical signatures (every band agrees) emit each pair exactly once") {
    val a = sigs("a", Seq(42L, 42L, 7L))
    val b = sigs("b", Seq(42L, 7L))
    val rows = withRule {
      a.join(b, expr("hamming64(sig_a, sig_b) <= 3"))
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    }
    // 2 left rows of 42 x 1 right row of 42 + 1 pair of 7 = 3 rows, no dups
    assert(rows.size == 3 && rows.distinct.size == 3, rows.toString)
  }

  test("the rule fires: no nested-loop join in the plan; disabled leaves BNLJ") {
    val a = sigs("a", Seq(1L, 2L, 3L))
    val b = sigs("b", Seq(1L, 2L, 3L))
    val joined = a.join(b, expr("hamming64(sig_a, sig_b) <= 2"))
    val off = joined.queryExecution.executedPlan.toString
    assert(off.contains("BroadcastNestedLoopJoin") ||
      off.contains("CartesianProduct"), "expected BNLJ with the rule off")
    withRule {
      val on = a.join(b, expr("hamming64(sig_a, sig_b) <= 2"))
        .queryExecution.executedPlan.toString
      assert(!on.contains("BroadcastNestedLoopJoin") &&
        !on.contains("CartesianProduct"), s"rule did not fire:\n$on")
      assert(on.contains("posexplode") || on.contains("Generate"),
        "expected the band explode in the plan")
    }
  }

  test("scope guards: equi conjunct present, vacuous k, strict and reversed forms") {
    val a = sigs("a", Seq(5L, 6L))
    val b = sigs("b", Seq(5L, 6L))
    // strict/reversed ground truth is computed with the rule OFF — 5^2=7
    // is a distance-3 pair that `< 3` must EXCLUDE, so a k-vs-k-1 banding
    // off-by-one shows up as a result difference, not banded-vs-banded
    val sa = sigs("a", Seq(5L, 6L, 2L))
    val sb = sigs("b", Seq(5L, 6L, 2L))
    val naiveStrict = pairs(sa, sb, "hamming64(sig_a, sig_b) < 3")
    val naiveLe = pairs(sa, sb, "hamming64(sig_a, sig_b) <= 3")
    assert(naiveLe.size == naiveStrict.size + 2, "distance-3 pairs must split the forms")
    withRule {
      // an existing cross-side equi conjunct → hash join, no rewrite
      val equi = a.join(b,
        expr("id_a = id_b AND hamming64(sig_a, sig_b) <= 2"))
      assert(!equi.queryExecution.executedPlan.toString.contains("Generate"))
      // k >= 64 is vacuous — banding cannot prune; stays nested-loop
      val vac = a.join(b, expr("hamming64(sig_a, sig_b) <= 64"))
      assert(!vac.queryExecution.executedPlan.toString.contains("Generate"))
      // strict (< k) and reversed (k >= h) forms rewrite and agree
      assert(pairs(sa, sb, "hamming64(sig_a, sig_b) < 3") == naiveStrict)
      assert(pairs(sa, sb, "3 >= hamming64(sig_a, sig_b)") == naiveLe)
    }
  }

  test("extra cross-side conjuncts ride the residual (id_a < id_b pairing)") {
    val rnd = new scala.util.Random(77)
    val vs: Seq[java.lang.Long] = Seq.fill(80)(rnd.nextLong() & 0xFFFFL: java.lang.Long)
    val a = sigs("a", vs)
    val b = sigs("b", vs)
    val pred = "hamming64(sig_a, sig_b) <= 2 AND id_a < id_b"
    val naive = pairs(a, b, pred)
    val banded = withRule(pairs(a, b, pred))
    assert(banded == naive && naive.nonEmpty)
  }
}
