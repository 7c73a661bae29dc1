package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Exact duplicated-substring span pins (the Lee et al. ExactSubstr
  * axis): spans are duplication-COVERAGE regions — every length-L window
  * starting inside a span occurs >= 2 times corpus-wide — merged
  * maximally per document. The planted tests build documents from
  * DISJOINT alphabets per region so cross-region windows can never
  * collide and the expected span boundaries are exact.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private val L = Dedup.SpanL

  private def spans(rows: (Long, String)*): Seq[(Long, Long, Long, Long)] =
    Dedup.substringSpans(rows.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq

  // deterministic pseudo-random string over a restricted alphabet —
  // regions built from disjoint alphabets cannot share any window
  private def rnd(alphabet: String, n: Int, seed: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => alphabet(r.nextInt(alphabet.length))).mkString
  }

  private val segAB = rnd("ABCDEFGHIJKLMNOPQRSTUVWXYZ", 80, 7) // shared segment

  test("a planted shared segment is reported as exactly one span per doc, offset-exact") {
    val a = rnd("abcdefghijklm", 60, 1) + segAB + rnd("nopqrstuvwxyz", 55, 2)
    val b = rnd("0123456789", 70, 3) + segAB + rnd("!@#$%^&*()_+-=", 50, 4)
    val got = spans((1L, a), (2L, b))
    assert(got == Seq(
      (1L, 61L, 80L, 2L),
      (2L, 71L, 80L, 2L)))
  }

  test("a corpus with no repeated window yields zero spans") {
    val got = spans(
      (1L, rnd("abcdefghijklm", 200, 11)),
      (2L, rnd("nopqrstuvwxyz", 200, 12)),
      (3L, rnd("0123456789", 200, 13)))
    assert(got.isEmpty)
  }

  test("a within-document repeat is found: both occurrences reported") {
    val d = rnd("abcdefghijklm", 50, 21) + segAB +
      rnd("nopqrstuvwxyz", 45, 22) + segAB + rnd("0123456789", 40, 23)
    val got = spans((1L, d))
    assert(got == Seq(
      (1L, 51L, 80L, 2L),
      (1L, 51L + 80L + 45L, 80L, 2L)))
  }

  test("adjacent covered windows merge into ONE maximal span") {
    val long = rnd("ABCDEFGHIJKLMNOPQRSTUVWXYZ", 150, 31)
    val a = rnd("abcdefghijklm", 42, 32) + long + rnd("nopqrstuvwxyz", 47, 33)
    val b = rnd("0123456789", 66, 34) + long + rnd("!@#$%^&*()_+-=", 44, 35)
    val got = spans((1L, a), (2L, b))
    // one span per doc (not 150-L+1 fragments), covering the copy exactly
    assert(got == Seq((1L, 43L, 150L, 2L), (2L, 67L, 150L, 2L)))
  }

  test("coverage contract: every L-window starting inside a reported span occurs >= 2x") {
    val docsDf = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val texts = docsDf.as[(Long, String)].collect().toMap
    val census = texts.values.toSeq
      .flatMap(t => (0 to t.length - L).map(i => t.substring(i, i + L)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = Dedup.substringSpans(docsDf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty, "expected organic duplicated spans in the corpus")
    got.foreach { case (id, start, len, maxOcc) =>
      val t = texts(id)
      val windows = ((start - 1) to (start - 1 + len - L))
        .map(i => t.substring(i.toInt, i.toInt + L))
      assert(windows.forall(w => census(w) >= 2),
        s"doc $id span @$start len $len has a unique window")
      assert(windows.map(census).max.toLong == maxOcc)
      // maximality: the windows straddling either edge are NOT all dups
      val before = start - 2
      if (before >= 0 && before + L <= t.length)
        assert(census(t.substring(before.toInt, (before + L).toInt)) < 2,
          s"doc $id span @$start not left-maximal")
      val after = start - 1 + len - L + 1
      if (after + L <= t.length)
        assert(census(t.substring(after.toInt, (after + L).toInt)) < 2,
          s"doc $id span @$start not right-maximal")
    }
  }

  test("scale key: xxhash64-keyed census produces identical spans on the real corpus") {
    val docsDf = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val exact = Dedup.substringSpans(docsDf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val hashed = Dedup.substringSpans(docsDf, c => xxhash64(c))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(exact == hashed)
  }
}
