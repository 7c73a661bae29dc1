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

  test("two duplicated windows with start gap > 1 but touching extents merge into ONE span") {
    // A carries S1 immediately followed by S2 (duplicated window starts at
    // p and p+L, nothing duplicated in between); B carries S1 and S2 far
    // apart. Maximal-coverage semantics: A reports ONE 2L-char span, B two
    // L-char spans — summing span_len never over-counts coverage.
    val s1 = rnd("ABCDEFGHIJKLM", L, 41)
    val s2 = rnd("NOPQRSTUVWXYZ", L, 42)
    val a = rnd("abcdefghijklm", 50, 43) + s1 + s2 + rnd("nopqrstuvwxyz", 45, 44)
    val b = rnd("0123456789", 60, 45) + s1 + rnd("!@#$%^&*()_+-=", 70, 46) +
      s2 + rnd("~`{}[]|;:<>,.?", 40, 47)
    val got = spans((1L, a), (2L, b))
    assert(got == Seq(
      (1L, 51L, 2L * L, 2L),
      (2L, 61L, L.toLong, 2L),
      (2L, 61L + L + 70L, L.toLong, 2L)))
  }

  test("coverage contract: spans equal the maximal duplicated-coverage runs, pairwise disjoint") {
    val docsDf = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val texts = docsDf.as[(Long, String)].collect().toMap
    val census = texts.values.toSeq
      .flatMap(t => (0 to t.length - L).map(i => t.substring(i, i + L)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val got = Dedup.substringSpans(docsDf)
      .as[(Long, Long, Long, Long)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got.nonEmpty, "expected organic duplicated spans in the corpus")
    // independent oracle: per doc, union the [i, i+L-1] extents of every
    // duplicated window into maximal runs (merge when the next start is
    // <= current end + 1), carrying the max census over member windows
    val expected = texts.toSeq.sortBy(_._1).flatMap { case (id, t) =>
      val dup = (0 to t.length - L)
        .filter(i => census(t.substring(i, i + L)) >= 2)
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      dup.foreach { i =>
        val occ = census(t.substring(i, i + L))
        runs.lastOption match {
          case Some((s, e, m)) if i <= e + 1 =>
            runs(runs.length - 1) = (s, math.max(e, i + L - 1), math.max(m, occ))
          case _ => runs += ((i, i + L - 1, occ))
        }
      }
      runs.map { case (s, e, m) =>
        (id, (s + 1).toLong, (e - s + 1).toLong, m.toLong)
      }
    }
    assert(got == expected)
    // disjointness with a real gap between consecutive spans per doc
    got.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Seq((_, s1, l1, _), (_, s2, _, _)) => assert(s2 > s1 + l1)
        case _ =>
      }
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
