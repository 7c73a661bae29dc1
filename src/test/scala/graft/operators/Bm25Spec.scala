package graft.operators

import graft.SparkSpec

/** BM25 top-k retrieval pins: an independent BigInt replication of the
  * rational-quantized scoring formula (query derivation included) must
  * match [[TextAnalysis.bm25Retrieve]] exactly on a planted corpus, and
  * the classic BM25 semantics (monotone in tf, diminishing returns) hold
  * on a controlled pair of docs.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private type Out = (Int, String, Int, Long, Long)

  private def run(docs: Seq[(Long, String)]): Seq[Out] =
    TextAnalysis.bm25Retrieve(docs.toDF("doc_id", "text"))
      .as[Out].collect().toSeq

  /** Independent replication: plain Scala + BigInt, no Spark, no DuckDB. */
  private def ref(docs: Seq[(Long, String)]): Seq[Out] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = BigInt(docs.size)
    val tl = BigInt(toks.values.map(_.size).sum)
    val df = toks.values.toSeq.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size).toMap
    val ranked = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(12)
      .zipWithIndex.map { case ((t, d), i) => (t, d, i + 1) }
    val qterms = ranked.collect { case (t, d, r) if r >= 5 && r <= 12 =>
      ((r - 5) / 2, t, d, r) }
    val qlabel = qterms.groupBy(_._1).view.mapValues { ts =>
      val s = ts.sortBy(_._4); s.head._2 + " " + s.last._2 }.toMap
    val dl = toks.view.mapValues(_.size).toMap
    val contribs = for {
      (qid, term, d, _) <- qterms
      (docId, ts) <- toks.toSeq
      tf = BigInt(ts.count(_ == term)) if tf > 0
    } yield ((qid, docId),
      ((BigInt(2) * n - 2 * d + 1) * 44 * tl * tf * 1000000) /
        ((BigInt(2) * d + 1) * (BigInt(20) * tl * tf + 6 * tl + 18 * dl(docId) * n)))
    contribs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .map { case ((q, doc), s) => (q, doc, s) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case (_, doc, s) => (-s, doc) }.take(TextAnalysis.Bm25K)
          .zipWithIndex
          .map { case ((_, doc, s), i) => (q, qlabel(q), i + 1, doc, s.toLong) }
      }.sortBy { case (q, _, r, _, _) => (q, r) }
  }

  // generative planted corpus: term tj (j=1..16) is in doc i iff i <= 21-j
  // (all dfs distinct: df(tj) = 21-j), with multiplicity (i+j) % 3 + 1 —
  // varied tf AND dl, so every factor of the formula is exercised.
  private val planted: Seq[(Long, String)] = (1 to 20).map { i =>
    val text = (1 to 16).flatMap { j =>
      if (i <= 21 - j) Seq.fill((i + j) % 3 + 1)(f"t$j%02d") else Nil
    }.mkString(" ")
    (i.toLong, text)
  }

  test("planted corpus: engine output equals the BigInt replication exactly") {
    val got = run(planted)
    val want = ref(planted)
    assert(got == want)
    assert(got.map(_._1).distinct == Seq(0, 1, 2, 3)) // 4 well-formed queries
  }

  test("monotone in tf with diminishing returns (equal dl, equal df)") {
    // 6 scaffold docs of exactly t01..t12 once each (6+2 candidates ≤ k,
    // so neither probe doc can fall off the top-k cut); A has one filler,
    // B swaps the filler for a SECOND t05 — so df is identical for every
    // band term, dl(A)=dl(B), and only tf(t05) differs (1 vs 2).
    val base = (1 to 12).map(j => f"t$j%02d").mkString(" ")
    val docs = (1 to 6).map(k => (k.toLong, base)) ++
      Seq((101L, base + " f01"), (102L, base + " t05"))
    val got = run(docs)
    val q0 = got.filter(_._1 == 0).map(r => r._4 -> r._5).toMap // {t05 t06}
    assert(q0(102L) > q0(101L), "extra tf must raise the score")
    assert(q0(102L) < 2 * q0(101L), "second occurrence must count less than the first")
    // sanity: both engines agree with the reference here too
    assert(got == ref(docs))
  }

  test("real corpus: 4 queries, contiguous ranks, non-increasing scores") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val got = run(docs)
    assert(got.map(_._1).distinct.sorted == Seq(0, 1, 2, 3))
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) == (1 to sorted.size).toSeq, s"query $q ranks")
      assert(sorted.map(_._5) == sorted.map(_._5).sorted.reverse, s"query $q scores")
      assert(sorted.head._2.split(" ").length == 2, s"query $q label")
    }
    assert(got == ref(docs), "engine equals the BigInt replication on the real corpus")
  }
}
