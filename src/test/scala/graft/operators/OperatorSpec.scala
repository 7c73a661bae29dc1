package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity checks for the no-oracle (rows-only) operators at sf0.001 —
  * the semantic assertions DuckDB can't express for engine-native hashes.
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf cosine: xxhash64 shingle key produces identical pairs to the string key") {
    val base = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val hashed = Dedup.tfidfPairs(base, (a, b, c) => xxhash64(a, b, c))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val exact = Dedup.tfidfPairs(base, (a, b, c) => concat_ws(" ", a, b, c))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(hashed.nonEmpty && hashed == exact)
  }

  test("prefix filter scale key: xxhash64 shingles produce identical " +
      "near-pairs to the string key (the registered drive's shape)") {
    // the prefix theorem needs only a consistent global order — (df, key)
    // under EITHER key type — so the pipeline stays lossless; this pins
    // that the key swap (and its different equal-df tie-break) moves only
    // the candidate set, never the verified output, on the real corpus
    val hashed = Dedup.exactPairsPlan(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    val exact = Dedup.exactPairsPlan(spark, sfDir,
        (a, b, c) => concat_ws(" ", a, b, c))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(hashed.nonEmpty && hashed == exact)
  }

  test("quality survivors: the best-scoring member wins, not the min id") {
    // planted cluster: doc 1 (min id, 3 tokens) vs doc 7 (7 tokens incl.
    // stopwords) — the longest/most-natural member must survive; cluster 10
    // is a singleton and must survive trivially
    val cc = Seq((1L, 1L), (7L, 1L), (10L, 10L)).toDF("id", "cluster")
    val corpus = Seq(
      (1L, "short text here"),
      (7L, "the quick brown fox and a dog"),
      (10L, "lonely doc")).toDF("doc_id", "text")
    val out = Dedup.bestQualitySurvivors(cc, corpus)
      .select($"cluster_id", $"survivor_id", $"score", $"n_members")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 7L, 7L * 1000 + 3, 2L), // "the", "and", "a" = 3 stop hits
      (10L, 10L, 2L * 1000, 1L)))
  }

  test("quality survivors on the real corpus: exactly one survivor per cluster, scores maximal") {
    val rows = Dedup.qualitySurvivors.fn(spark, sfDir)
      .select($"cluster_id", $"survivor_id", $"score", $"n_members")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val cc = Dedup.ccClusters.fn(spark, sfDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect()
    assert(rows.map(_._4).sum == cc.length) // members partition the corpus
    // driver-side argmax recompute: rebuild the 3-variant corpus texts,
    // score each member with the query's formula, and require every
    // survivor to be the (score desc, id asc) winner of its cluster
    val stopSet = Set("the", "a", "of", "and", "to", "in")
    def score(text: String): Long = {
      val t = text.split(" ", -1)
      t.length.toLong * 1000 + t.count(stopSet)
    }
    val texts = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, tx) =>
        val t = tx.split(" ", -1)
        Seq(id -> tx,
          (id + 2000000L) -> t.dropRight(1).mkString(" "),
          (id + 4000000L) -> t.drop(1).mkString(" "))
      }.toMap
    val winners = cc.groupBy(_._2).map { case (cl, ms) =>
      cl -> ms.map(_._1).map(id => (id, score(texts(id))))
        .minBy { case (id, sc) => (-sc, id) }
    }
    rows.foreach { case (cl, surv, sc, _) =>
      val (wid, wsc) = winners(cl)
      assert(surv == wid && sc == wsc, s"cluster $cl: got ($surv,$sc) want ($wid,$wsc)")
    }
  }

  test("source reputation: keep verdict reconciles and both reputations occur") {
    val rows = graft.operators.TextAnalysis.sourceReputation.fn(spark, sfDir)
      .select($"lang_match", $"src_n", $"src_match", $"src_low_rep", $"keep")
      .as[(Boolean, Long, Long, Boolean, Boolean)].collect()
    rows.foreach { case (m, n, s, low, keep) =>
      assert(low == (s * 100 < n * 40))
      assert(keep == (m && !low))
    }
    assert(rows.exists(_._4) && rows.exists(!_._4), "threshold must discriminate")
  }

  test("curation funnel: counts monotone non-increasing, tokens consistent") {
    val rows = graft.operators.TextAnalysis.curationFunnel.fn(spark, sfDir)
      .select($"stage", $"n_docs", $"n_tokens").as[(Int, Long, Long)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    rows.sliding(2).foreach {
      case Array((_, n1, t1), (_, n2, t2)) =>
        assert(n2 <= n1 && t2 <= t1, s"funnel must not grow: $n1->$n2")
      case _ =>
    }
    assert(rows.last._2 > 0, "something must survive the full funnel")
  }

  test("outlier filter: verdict reconciles with per-cell stats and flags a real tail") {
    val rows = SimilarityIvf.outlierFilter.fn(spark, sfDir)
      .select($"vec_id", $"cell", $"dist2", $"n_cell", $"is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val sums = rows.groupBy(_._2).map { case (c, rs) =>
      c -> (rs.map(_._3).sum, rs.length.toLong)
    }
    rows.foreach { case (_, cell, d2, n, out) =>
      val (sd, nc) = sums(cell)
      assert(n == nc)
      assert(out == (d2 * n * 20 > 21 * sd))
    }
    assert(rows.exists(_._5) && rows.exists(!_._5), "threshold must discriminate")
  }

  test("cluster stats: sizes partition the 3-variant corpus, removal accounting consistent") {
    val rows = Dedup.clusterStats.fn(spark, sfDir)
      .select($"cluster_size", $"n_clusters", $"n_docs", $"n_tokens",
        $"tokens_removed").as[(Long, Long, Long, Long, Long)].collect()
    val corpusN = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum == 3 * corpusN) // every doc + its 2 variants
    rows.foreach { case (sz, nc, nd, nt, rem) =>
      assert(nd == sz * nc, s"size-$sz docs")
      assert(rem < nt && rem >= 0, s"size-$sz removal bounds")
    }
    assert(rows.exists(_._1 == 3), "the planted 3-way duplication spike")
  }

  test("knn graph: every vector is a source with exactly K ranked, non-self edges") {
    val edges = SimilarityIvf.knnGraph.fn(spark, sfDir)
      .select($"src", $"dst", $"rk").as[(Long, Long, Int)].collect()
    val n = graft.Tables.load(spark, sfDir, "embeddings").count()
    val bySrc = edges.groupBy(_._1)
    assert(bySrc.size == n, s"${bySrc.size} sources for $n vectors")
    bySrc.foreach { case (src, es) =>
      assert(es.map(_._3).sorted.toSeq == (1 to es.length), s"$src ranks")
      assert(es.length == 4, s"$src degree")
      assert(es.forall(_._2 != src), s"$src self edge")
    }
  }

  test("bm25 negatives: sides coherent, ranks contiguous, scores non-increasing") {
    val rows = graft.operators.TextAnalysis.bm25Negatives.fn(spark, sfDir)
      .select($"query_id", $"side", $"rank", $"score", $"n_terms_hit")
      .as[(Int, String, Int, Long, Int)].collect()
    assert(rows.exists(_._2 == "positive") && rows.exists(_._2 == "hard_negative"))
    rows.foreach { case (_, side, _, _, hit) =>
      assert(if (side == "positive") hit >= 2 else hit == 1, s"$side/$hit")
    }
    rows.groupBy(r => (r._1, r._2)).foreach { case ((q, side), rs) =>
      val sorted = rs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to rs.length), s"$q/$side ranks")
      assert(sorted.map(_._4).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b
        case _ => true
      }, s"$q/$side score order")
    }
  }

  test("badwords filter: verdicts reconcile and the list fires on a real minority") {
    val rows = graft.operators.TextAnalysis.badwordsFilter.fn(spark, sfDir)
      .select($"n_flagged", $"has_badword", $"keep")
      .as[(Int, Boolean, Boolean)].collect()
    rows.foreach { case (n, has, keep) =>
      assert(has == (n > 0) && keep == !has)
    }
    val flagged = rows.count(_._2)
    assert(flagged > 0 && flagged < rows.length, s"$flagged of ${rows.length}")
  }

  test("novelty and source overlap: xxhash64 shingle key ≡ string key on the real corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    import graft.operators.{TextAnalysis => TA}
    val hv = TA.noveltyOf(docs, (a, b, c) => xxhash64(a, b, c))
      .as[(Long, Int, Int)].collect().toSeq
    val sv = TA.noveltyOf(docs, (a, b, c) => concat_ws(" ", a, b, c))
      .as[(Long, Int, Int)].collect().toSeq
    assert(hv.nonEmpty && hv == sv)
    val ho = TA.sourceOverlapOf(docs, (a, b, c) => xxhash64(a, b, c))
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    val so = TA.sourceOverlapOf(docs, (a, b, c) => concat_ws(" ", a, b, c))
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(ho.nonEmpty && ho == so)
  }

  test("audio near-dup: DC-offset members bit-identical; every planted pair found; no cross-group pair") {
    // the invariance claim, directly: member fingerprints within a group
    // differ only by a DC shift, which cancels in the window comparisons
    val fps = Multimodal.audioFingerprints((0L until 64L).iterator).toSeq
    fps.groupBy(_.doc_id / 8).values.foreach { g =>
      assert(g.map(_.dhash).distinct.length == 1, s"group ${g.head.doc_id / 8}")
    }
    // distinct groups carry distinct contours on this corpus
    assert(fps.map(_.dhash).distinct.length == 8)
    val pairs = Multimodal.audioNearDup.fn(spark, sfDir)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    assert(pairs.forall(_._3 == 0))
    assert(pairs.forall(p => p._1 / 8 == p._2 / 8), "no cross-group pair")
    val n = graft.Tables.load(spark, sfDir, "documents").count()
    val want = (0L until n).groupBy(_ / 8).values
      .map(g => g.size * (g.size - 1) / 2).sum
    assert(pairs.length == want, s"${pairs.length} vs planted $want")
  }

  test("minhash LSH finds every planted near-duplicate pair") {
    // dedup_minhash_lsh runs over documents ∪ near-copies(id+2e6, one token
    // dropped); every original must collide with its own perturbed copy.
    val out = Dedup.minhashLsh.fn(spark, sfDir)
      .select($"id_a", $"id_b", $"n_match_hashes")
      .as[(Long, Long, Int)].collect()
    val planted = out.filter { case (a, b, _) => b == a + 2000000L }
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    // near-copies differ by one shingle-worth of tokens → extremely high
    // estimated similarity; all 500 planted pairs must surface
    assert(planted.length == nDocs, s"found ${planted.length} of $nDocs planted pairs")
    assert(planted.forall(_._3 >= 24), "planted pairs should match >=75% of hashes")
  }

  test("simhash: near-copies within small hamming distance, random pairs far") {
    val sigs = Dedup.simhashQ.fn(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val origIds = sigs.keys.filter(_ < 2000000L).toSeq.sorted
    val copies = origIds.filter(id => sigs.contains(id + 2000000L))
    assert(copies.nonEmpty)
    val near = copies.map(id => ham(sigs(id), sigs(id + 2000000L)))
    assert(near.count(_ <= 12) >= copies.size * 9 / 10,
      s"90% of near-copies should be within hamming 12, got ${near.sorted.take(10)}...")
    // the corpus is word soup over a tiny shared vocabulary, so unrelated
    // docs are closer than real text would be — assert separation, not an
    // absolute bar: random pairs must average farther than planted copies
    val far = origIds.sliding(2).collect { case Seq(a, b) => ham(sigs(a), sigs(b)) }.toSeq
    val nearAvg = near.sum.toDouble / near.size
    val farAvg = far.sum.toDouble / far.size
    assert(farAvg > nearAvg * 2,
      s"unrelated avg hamming $farAvg should exceed 2x near-copy avg $nearAvg")
  }

  test("brute-force cosine: self-similarity excluded, scores in [-1,1], k per query") {
    val out = Similarity.bruteforce.fn(spark, sfDir)
      .select($"qid", $"cid", $"cos", $"rk").as[(Long, Long, Double, Int)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (q, c, s, _) => q != c && s <= 1.0001 && s >= -1.0001 })
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length == 5)
      val sorted = rows.sortBy(_._4).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        "ranks must be in descending similarity order")
    }
  }

  test("hard negatives: winners are the true per-side argmax under the quantized cosine") {
    val out = Similarity.hardNegatives.fn(spark, sfDir)
      .select($"qid", $"label_a", $"pos_id", $"pos_cos", $"neg_id", $"neg_cos",
        $"margin")
      .as[(Long, Int, Long, Double, Long, Double, Double)].collect()
    assert(out.length == 20 && out.map(_._1).distinct.length == 20)
    // brute-force recompute driver-side with the identical quantized
    // arithmetic (500-2000 vectors x 20 anchors — trivially collectable)
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding").as[(Long, Int, Array[Float])]
      .collect()
      .map { case (id, l, v) =>
        (id, l, v.map(x => math.round(x.toDouble * 1000)))
      }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    out.foreach { case (qid, la, posId, posCos, negId, negCos, margin) =>
      val (_, lbl, q) = byId(qid)
      assert(la == lbl, s"$qid anchor label")
      assert(posId != qid && negId != qid)
      assert(byId(posId)._2 == la && byId(negId)._2 != la, s"$qid side labels")
      assert(margin == posCos - negCos, s"$qid margin")
      val scored = vecs.filter(_._1 != qid)
        .map { case (id, l, v) => (id, l, cos(q, v)) }
      val bestPos = scored.filter(_._2 == la).maxBy(p => (p._3, -p._1))
      val bestNeg = scored.filter(_._2 != la).maxBy(p => (p._3, -p._1))
      assert((posId, negId) == ((bestPos._1, bestNeg._1)),
        s"$qid argmax: got ($posId,$negId) want (${bestPos._1},${bestNeg._1})")
    }
  }

  test("LSH sign-sketch buckets group similar vectors (bucket sizes sane)") {
    val buckets = Similarity.lshBuckets.fn(spark, sfDir)
      .select($"bucket", $"n_vecs").as[(Int, Long)].collect()
    assert(buckets.nonEmpty)
    val total = buckets.map(_._2).sum
    assert(total == graft.Tables.load(spark, sfDir, "embeddings").count())
  }

  test("multimodal decode: features deterministic and consistent with payload") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
      .collect()
    assert(feats.length == docs.size)
    feats.take(20).foreach { f =>
      val bytes = docs(f.doc_id).getBytes("UTF-8")
      assert(f.n_bytes == bytes.length)
      assert(f.head_byte == (bytes(0) & 0xff))
      val chk = bytes.foldLeft(0L)((h, b) => (h * 131 + (b & 0xff)) % 1000000007L)
      assert(f.checksum == chk)
    }
  }

  test("multimodal png: real ImageIO round trip is pixel-lossless") {
    // Encode through javax.imageio, decode through javax.imageio, and
    // check every decoded pixel against the generator formula — proves a
    // REAL codec (zlib inflate + PNG chunk parsing) runs behind the
    // mapPartitions seam, not a byte pass-through.
    val bytes = Multimodal.PngCodec.encode(42L)
    // PNG signature: 0x89 'P' 'N' 'G'
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val feats = Multimodal.pngDecodeFeatures(Iterator(42L, 0L, 499L)).toSeq
    feats.foreach { f =>
      assert(f.width == Multimodal.PngCodec.width(f.doc_id))
      assert(f.height == Multimodal.PngCodec.height(f.doc_id))
      assert(f.n_px_ok == f.width * f.height,
        s"doc ${f.doc_id}: only ${f.n_px_ok}/${f.width * f.height} pixels survived the round trip")
      assert(f.png_bytes_min == 1)
    }
    // distributed path: same values through the Dataset plan
    val df = Multimodal.pngDecode.fn(spark, sfDir)
    val bad = df.filter($"n_px_ok" =!= $"width" * $"height").count()
    assert(bad == 0L)
    assert(df.count() == graft.Tables.load(spark, sfDir, "documents").count())
  }

  test("multimodal wav: real RIFF/WAVE round trip is sample-lossless") {
    // Encode through javax.sound.sampled, parse back through the real WAV
    // container parser, and check every decoded sample against the
    // generator formula — proves a REAL codec (RIFF chunk walk + fmt
    // header decode) runs behind the mapPartitions seam.
    val bytes = Multimodal.WavCodec.encode(42L)
    // RIFF....WAVE container magic
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val feats = Multimodal.wavDecodeFeatures(Iterator(42L, 0L, 499L)).toSeq
    feats.foreach { f =>
      assert(f.n_samples == Multimodal.WavCodec.nSamples(f.doc_id))
      assert(f.n_ok == f.n_samples,
        s"doc ${f.doc_id}: only ${f.n_ok}/${f.n_samples} samples survived the round trip")
      // sample_rate is read from the DECODED fmt header, not the constant
      assert(f.sample_rate == Multimodal.WavCodec.sampleRate)
      assert(f.wav_bytes_min == 1)
      assert(f.peak <= 2000)
    }
    // distributed path: same values through the Dataset plan
    val df = Multimodal.wavDecode.fn(spark, sfDir)
    val bad = df.filter($"n_ok" =!= $"n_samples").count()
    assert(bad == 0L)
    assert(df.count() == graft.Tables.load(spark, sfDir, "documents").count())
  }

  test("multimodal jpeg: real lossy round trip stays inside pinned bounds") {
    // Encode through the JDK's real JPEG writer (DCT + quantization +
    // huffman), decode through the real reader, and check the decoded
    // raster against the generator formula WITHIN the pinned tolerances —
    // lossy, so unlike PNG the pin is a bound, not equality. The bounds
    // have ~8× margin over the measured worst case (max|err|=1, MAE<0.3
    // at quality 0.95 on the smooth gradient), so a channel swap, stride
    // bug, or broken inverse DCT fails loudly while codec-version jitter
    // cannot.
    val bytes = Multimodal.JpegCodec.encode(42L)
    // SOI / EOI entropy-stream markers
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    assert((bytes(bytes.length - 2) & 0xff) == 0xff &&
      (bytes(bytes.length - 1) & 0xff) == 0xd9)
    val feats = Multimodal.jpegDecodeFeatures(Iterator(42L, 0L, 499L)).toSeq
    feats.foreach { f =>
      assert(f.width == Multimodal.JpegCodec.width(f.doc_id))
      assert(f.height == Multimodal.JpegCodec.height(f.doc_id))
      assert(f.jpeg_sig_ok && f.jpeg_container_ok && f.dims_ok)
      assert(f.max_err_le_8, s"doc ${f.doc_id}: max error above pinned bound")
      assert(f.mae_x100_le_200, s"doc ${f.doc_id}: MAE above pinned bound")
    }
    // distributed path: every pinned boolean true for every document
    val df = Multimodal.jpegDecode.fn(spark, sfDir)
    val bad = df.filter(!$"jpeg_sig_ok" || !$"jpeg_container_ok" ||
      !$"dims_ok" || !$"max_err_le_8" || !$"mae_x100_le_200").count()
    assert(bad == 0L)
    assert(df.count() == graft.Tables.load(spark, sfDir, "documents").count())
  }

  test("pii scrub: redacted text carries zero residual matches; counts are exact") {
    // The oracle pins counts and the md5 of the redacted text; this spec
    // states the semantic property directly — running ALL detectors over
    // the redacted output finds nothing — and pins a hand case with
    // multiple spans and adjacent punctuation.
    val out = TextAnalysis.piiScrub.fn(spark, sfDir)
    assert(out.filter(!$"has_pii" || $"n_emails" =!= 1 ||
      $"n_phones" =!= 1 || $"n_ips" =!= 1).count() == 0L)
    // re-run detection over redacted text: zero residuals (spark-side only
    // — r is not in the output schema, so rebuild via the same fn on a
    // 2-doc frame and scan its md5-pinned construction by hand)
    val res = spark.sql(
      """SELECT regexp_count(r, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')
        |     + regexp_count(r, '\\b555-[0-9]{4}\\b')
        |     + regexp_count(r, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b') AS n
        |FROM (SELECT regexp_replace(regexp_replace(regexp_replace(
        |    'a user.name+x@ex.co b, 192.168.0.1; 555-1234! c@d.org',
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>'),
        |    '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>'),
        |    '\\b555-[0-9]{4}\\b', '<PHONE>') AS r)""".stripMargin)
      .as[Int].head()
    assert(res == 0, s"residual PII matches after redaction: $res")
  }

  test("url blocklist: exactly the .biz domains are blocked; doc counts partition") {
    val rows = TextAnalysis.urlBlocklist.fn(spark, sfDir)
      .select($"domain", $"blocked", $"n_docs").as[(String, Boolean, Long)]
      .collect()
    assert(rows.length == 6)
    assert(rows.filter(_._2).map(_._1).sorted.toSeq ==
      Seq("ads.example.biz", "spam.example.biz"))
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum == nDocs)
  }

  test("weighted PPS sample: pick counts match the grid exactly, per shard") {
    // Systematic PPS invariants the oracle hash can't state directly:
    // per-shard Σ n_picks equals the number of grid positions that land
    // inside the shard's total weight, and any doc with w >= T is a
    // certainty inclusion.
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", ($"doc_id" % 8).as("shard"), $"n_chars".as("w"))
    val out = TextAnalysis.weightedSample.fn(spark, sfDir)
    val perShard = out.groupBy($"shard").agg(sum($"n_picks").as("picks"))
      .as[(Long, Long)].collect().toMap
    val totW = docs.groupBy($"shard").agg(sum($"w").as("tw"))
      .as[(Long, Long)].collect().toMap
    val T = 1000L
    totW.foreach { case (shard, tw) =>
      val off = (shard * 37) % T
      // grid positions off, off+T, ... strictly below tw
      val expected = (tw + T - off - 1) / T
      assert(perShard.getOrElse(shard, 0L) == expected,
        s"shard $shard: picks=${perShard.get(shard)} expected=$expected (tw=$tw)")
    }
    val heavy = docs.filter($"w" >= T).select($"doc_id").as[Long].collect().toSet
    val picked = out.select($"doc_id").as[Long].collect().toSet
    assert(heavy.subsetOf(picked), "w >= T docs are certainty inclusions")
  }

  test("mjpeg: real container walk + stride-2 decode inside bounds; bound has teeth") {
    val feats = Multimodal.mjpegDecodeFeatures(Iterator(7L, 0L, 42L)).toSeq
    feats.foreach { f =>
      assert(f.n_frames == 3 + (f.doc_id % 4).toInt)
      assert(f.n_sampled == (f.n_frames + 1) / 2) // stride 2 from frame 0
      assert(f.container_ok && f.dims_ok)
      assert(f.max_err_le_6 && f.mae_x100_le_150, f.toString)
    }
    // the ±16/frame brightness ramp makes an off-by-one sampling stride
    // visible: decoded frame 0 compared against the frame-1 formula must
    // blow the ≤6 bound (else the bound couldn't catch a stride bug)
    val id = 42L
    val w = Multimodal.JpegCodec.width(id); val h = Multimodal.JpegCodec.height(id)
    val bytes = Multimodal.MjpegCodec.encode(id)
    val in = java.nio.ByteBuffer.wrap(bytes)
    in.position(4); val n = in.getInt
    val lens = Array.fill(n)(in.getInt)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes, 8 + 4 * n, lens(0)))
    val maxErrWrongFrame = (for { y <- 0 until h; x <- 0 until w } yield
      math.abs(img.getRaster.getSample(x, y, 0) -
        Multimodal.MjpegCodec.pixel(id, w, h, 1, x, y))).max
    assert(maxErrWrongFrame > 6, s"stride-bug sentinel too weak: $maxErrWrongFrame")
    // corrupted magic must flag the container, not throw (dead-letter
    // principle: one damaged asset cannot kill the partition)
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    val scored = Multimodal.scoreMjpeg(id, bad)
    assert(!scored.container_ok && scored.n_frames == 0)
    // truncated lengths table must flag too
    val short = Multimodal.MjpegCodec.encode(id)
    val lenPos = 8 + 4 * (n - 1) // last frame's length field
    short(lenPos) = 0x7f.toByte  // lengths no longer sum to payload size
    assert(!Multimodal.scoreMjpeg(id, short).container_ok)
    // distributed path: every pinned boolean true for every document
    val df = Multimodal.mjpegFrames.fn(spark, sfDir)
    val badRows = df.filter(!$"container_ok" || !$"dims_ok" ||
      !$"max_err_le_6" || !$"mae_x100_le_150").count()
    assert(badRows == 0L)
  }

  test("cross-modal dedup: planted image groups pair up and caption alignment classifies them") {
    // group 0 (ids 0..9) shares one image (per-member brightness shift);
    // ids 0 and 1 carry the SAME caption (aligned), everything else a
    // distinct caption (misaligned). Group 2 (ids 20, 21) is a second
    // planted image pair. Cross-group image pairs must not appear.
    val docs = ((0L to 9L) ++ Seq(20L, 21L)).map { id =>
      val text =
        if (id <= 1L) "the same caption shared by two documents exactly"
        else s"caption number $id with its own distinct unique words w$id x$id y$id"
      (id, text)
    }
    val out = Multimodal.crossModalPairs(docs.toDF("doc_id", "text"))
      .select($"id_a", $"id_b", $"hamming", $"caption_near", $"misaligned")
      .as[(Long, Long, Int, Boolean, Boolean)].collect()
    assert(out.nonEmpty)
    // every returned pair is within one planted image group
    assert(out.forall { case (a, b, _, _, _) => a / 10 == b / 10 }, out.toSeq)
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    // same image + same caption -> aligned
    val p01 = byPair((0L, 1L))
    assert(p01._3 <= 3 && p01._4 && !p01._5, p01.toString)
    // identical shifts (0 vs 0) -> hamming 0; different captions -> misaligned
    val p03 = byPair((0L, 3L))
    assert(p03._3 == 0 && !p03._4 && p03._5, p03.toString)
    // second planted group present and misaligned (distinct captions)
    val p2021 = byPair((20L, 21L))
    assert(p2021._3 <= 3 && p2021._5, p2021.toString)
    // misaligned = !caption_near everywhere (the output contract)
    assert(out.forall(r => r._5 == !r._4))
  }

  test("cross-modal dedup scale key: xxhash64 caption shingles equal the " +
      "string key on the real corpus (the registered query shape)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val hashed = Multimodal.crossModalPairs(d).collect().toSeq
    val exact = Multimodal.crossModalPairs(d,
      (a, b, c) => concat_ws(" ", a, b, c)).collect().toSeq
    assert(hashed == exact)
  }

  test("video near-dup: same-shift members are frame-identical; pairs stay within planted groups") {
    // group = id/8; members encode the same per-(gid, frame) pixel field
    // under shift (id%8)%3. Same shift -> bit-identical frame hashes
    // (lossless PNG round trip); different shift -> within the hamming
    // budget on this fixed deterministic set.
    val rows = Multimodal.videoFrameHashes((0L until 8L).iterator).toSeq
    val byDoc = rows.groupBy(_.doc_id).view.mapValues(
      _.sortBy(_.f).map(_.dhash)).toMap
    assert(byDoc(0L) == byDoc(3L) && byDoc(0L) == byDoc(6L)) // shift 0
    assert(byDoc(1L) == byDoc(4L) && byDoc(1L) == byDoc(7L)) // shift 1
    assert(byDoc(2L) == byDoc(5L)) // shift 2
    val crossShift = byDoc(0L).zip(byDoc(2L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(crossShift.forall(_ <= 3), crossShift.toString)

    // full query: every emitted pair is internally consistent, and every
    // same-shift within-group pair (frame-identical by the above) is
    // found with ALL frames near
    val out = Multimodal.videoNearDup.fn(spark, sfDir)
      .select($"id_a", $"id_b", $"n_frames_a", $"n_frames_b",
        $"n_near_frames", $"video_near")
      .as[(Long, Long, Int, Int, Long, Boolean)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._6 == (2 * r._5 >= math.max(r._3, r._4))))
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    val nDocs = graft.Tables.load(spark, sfDir, "documents").count()
    (0L until nDocs).grouped(8).foreach { g =>
      for {
        a <- g; b <- g if a < b && a % 8 % 3 == b % 8 % 3
      } {
        val p = byPair.getOrElse((a, b), fail(s"missing planted pair ($a,$b)"))
        assert(p._5 == p._3.toLong && p._6, p.toString)
      }
    }
  }

  test("minhash eval: metrics are internally consistent and recall on the planted corpus is high") {
    val r = Dedup.minhashEval.fn(spark, sfDir)
      .select($"n_true", $"n_cand", $"n_hit", $"n_missed", $"sum_match_hits")
      .as[(Long, Long, Long, Long, Long)].head()
    val (nTrue, nCand, nHit, nMissed, sumMatch) = r
    assert(nTrue > 0L)
    assert(nHit <= math.min(nTrue, nCand))
    assert(nMissed == nTrue - nHit)
    // 8x4 banding at the planted near-copies' similarity: recall ~1
    assert(nHit * 10L >= nTrue * 9L, s"recall too low: $nHit/$nTrue")
    // calibration mass: true positives average well above 20/32 matches
    assert(sumMatch >= 20L * nHit, s"sum_match_hits=$sumMatch nHit=$nHit")
  }

  test("ccnet buckets: per-language tertiles are disc-exact, minimal, and monotone") {
    val rows = TextAnalysis.ccnetBuckets.fn(spark, sfDir)
      .select($"doc_id", $"lang", $"score_q", $"bucket")
      .as[(Long, String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      val byB = rs.groupBy(_._4).view.mapValues(_.map(_._3).toSeq).toMap
      val head = byB.getOrElse("head", Seq.empty)
      val mid = byB.getOrElse("middle", Seq.empty)
      val tail = byB.getOrElse("tail", Seq.empty)
      assert(head.size + mid.size + tail.size == n, lang)
      val t1 = (n + 2) / 3; val t2 = (2 * n + 2) / 3
      // disc-percentile contract: head reaches ceil(n/3) docs, and the
      // threshold is MINIMAL — dropping the tied boundary score falls short
      assert(head.size >= t1, s"$lang head=${head.size} < $t1")
      assert(head.size - head.count(_ == head.min) < t1, lang)
      assert(head.size + mid.size >= t2, lang)
      if (mid.nonEmpty)
        assert(head.size + mid.size - mid.count(_ == mid.min) < t2, lang)
      // monotone: scores never interleave across buckets
      if (head.nonEmpty && mid.nonEmpty) assert(head.min > mid.max, lang)
      if (mid.nonEmpty && tail.nonEmpty) assert(mid.min > tail.max, lang)
      if (mid.isEmpty && head.nonEmpty && tail.nonEmpty)
        assert(head.min > tail.max, lang)
    }
  }

  test("fuzzy decontamination: every planted benchmark copy is flagged against its source") {
    val out = TextAnalysis.decontaminationFuzzy.fn(spark, sfDir)
      .select($"doc_id", $"best_test_id", $"best_jac_scaled", $"contaminated")
      .as[(Long, Long, Long, Boolean)].collect()
    val planted = out.filter(_._1 >= 2000000L)
    assert(planted.nonEmpty)
    // a planted copy (its source minus the last token) best-matches its own
    // source at J = (n-1)/n and trips the tau = 0.5 verdict
    planted.foreach { p =>
      assert(p._2 == p._1 - 2000000L, p.toString)
      assert(p._4 && p._3 >= 500000L, p.toString)
    }
    // the verdict and the score agree row-by-row on the tau = 0.5 bar for
    // the J = (n-1)/n planted rows; natural rows are data-dependent (the
    // sf0.001 corpus has one genuine cross-split near-dup at J = 0.89)
    out.foreach(p => if (p._3 >= 1000000L) assert(p._4, p.toString))
  }

  test("phash: brightness shift stays within the hamming budget; banding loses no qualifying pair") {
    // dHash contract: the +2-clamped copy of an image lands within
    // hamming <= 3 of the original (brightness-invariance up to clamp
    // flips), while distinct docs' hashes are far apart — and the 4x14
    // banding provably recalls EVERY pair the full O(n^2) scan would
    // (hamming <= 3 over 4 bands pigeonholes one clean band).
    val ids = (0L until 200L)
    val rows = Multimodal.phashRows(ids.iterator).toSeq
    val byVid = rows.map(r => r.vid -> r.dhash).toMap
    ids.foreach { id =>
      val d = java.lang.Long.bitCount(byVid(id) ^ byVid(id + 4000000L))
      assert(d <= 3, s"doc $id: copy drifted to hamming $d")
    }
    // full-scan qualifying pairs == band-join qualifying pairs
    val vids = rows.map(_.vid)
    val full = (for {
      a <- vids; b <- vids if a < b
      if java.lang.Long.bitCount(byVid(a) ^ byVid(b)) <= 3
    } yield (a, b)).toSet
    def bands(dh: Long): Seq[(Int, Long)] =
      (0 until 4).map(b => b -> ((dh >> (b * 14)) & 16383L))
    val banded = (for {
      a <- vids; b <- vids if a < b
      if bands(byVid(a)).intersect(bands(byVid(b))).nonEmpty
      if java.lang.Long.bitCount(byVid(a) ^ byVid(b)) <= 3
    } yield (a, b)).toSet
    assert(banded == full, s"banding lost ${(full -- banded).size} pairs")
    assert(full.size >= 200, "every planted pair must qualify")
    // decoded-raster hashing equals formula hashing: the PNG round trip
    // contributes nothing (lossless) — a codec bug would shift bits
    val id = 77L
    val w = Multimodal.PngCodec.width(id); val h = Multimodal.PngCodec.height(id)
    var expect = 0L
    (0 until 8).foreach { r =>
      val gy = r * h / 8
      (0 until 7).foreach { c =>
        val p1 = Multimodal.phashPixel(id, c * w / 8, gy)
        val p2 = Multimodal.phashPixel(id, (c + 1) * w / 8, gy)
        if (p1 < p2) expect |= 1L << (r * 7 + c)
      }
    }
    assert(byVid(id) == expect)
  }

  test("bpe: doubled-space replace IS greedy left-to-right merge; merged tokens re-merge") {
    // the three semantic hinges of the string-rendered BPE round:
    //  1. overlapping pairs merge non-overlapping left-to-right
    //     ('a a a' -> one merge, pair count 2 but replacement count 1)
    //  2. disjoint occurrences all merge ('a b a b' -> two merges)
    //  3. the doubled-space invariant survives replacement, so a LATER
    //     round can merge a merged token with a neighbor
    def dub(text: String): String = " " + text.replace(" ", "  ") + " "
    def merge(s: String, a: String, b: String): String =
      s.replace(s" $a  $b ", s" $a~$b ")
    def toks(s: String): Seq[String] = s.trim.split("  ").toSeq
    assert(toks(merge(dub("a a a"), "a", "a")) == Seq("a~a", "a"))
    assert(toks(merge(dub("a b a b"), "a", "b")) == Seq("a~b", "a~b"))
    assert(toks(merge(dub("c a b c"), "a", "b")) == Seq("c", "a~b", "c"))
    // round 2 over round 1's output: ('c', 'a~b') merges cleanly
    val r1 = merge(dub("c a b c a b"), "a", "b")
    assert(toks(merge(r1, "c", "a~b")) == Seq("c~a~b", "c~a~b"))
    // Spark's replace() must scan identically to java.lang.String (the
    // JVM reference above) — pin via the SQL function on the hand cases
    val got = Seq("a a a", "a b a b").toDF("text")
      .selectExpr("replace(concat(' ', replace(text, ' ', '  '), ' '), ' a  a ', ' a~a ') AS s")
      .as[String].collect()
    assert(got(0) == " a~a  a " && got(1) == " a  b  a  b ")
  }

  test("batched bpe: conservative conflict-free selection is pinned") {
    // rank-1 always survives; a pair sharing a token with ANY
    // higher-ranked candidate drops, INCLUDING one that was itself
    // eliminated (the conservative rule — plain greedy would re-admit
    // (c,d) after (b,c)'s elimination; the oracle's anti-join cannot)
    assert(TextAnalysis.bpeSelectBatch(Seq(("a", "b", 9L), ("b", "c", 8L),
      ("d", "e", 7L))) == Seq((1, "a", "b", 9L), (3, "d", "e", 7L)))
    assert(TextAnalysis.bpeSelectBatch(Seq(("a", "b", 9L), ("b", "c", 8L),
      ("c", "d", 7L))) == Seq((1, "a", "b", 9L)))
    // a self-pair conflicts on its single token
    assert(TextAnalysis.bpeSelectBatch(Seq(("a", "a", 9L), ("a", "b", 8L),
      ("c", "d", 7L))) == Seq((1, "a", "a", 9L), (3, "c", "d", 7L)))
  }

  test("batched bpe: equals the sequential trainer when the top-M pairs " +
      "don't overlap; oracle-shape merge table") {
    // per-doc UNIQUE fillers keep every cross pair at count 1, so the
    // top-4 slate is the four disjoint planted pairs (equal counts,
    // lexicographic tie-break) — the commutation precondition
    val docs = (0L until 6L).map(d =>
        (d, s"aa bb f${d}x cc dd f${d}y ee ff f${d}z gg hh"))
      .toDF("doc_id", "text")
    val (seqFinal, seqLearned) = TextAnalysis.bpeLearnBatched(docs, 4, 1)
    val (batFinal, batLearned) = TextAnalysis.bpeLearnBatched(docs, 1, 4)
    // same merges (modulo the round/rank bookkeeping), same counts
    assert(seqLearned.map(t => (t._3, t._4, t._5)) ==
      batLearned.map(t => (t._3, t._4, t._5)),
      s"merge sets diverged: $seqLearned vs $batLearned")
    assert(batLearned.map(_._2) == Seq(1, 2, 3, 4), "all four must survive")
    // identical final corpus, doc for doc
    val a = seqFinal.orderBy($"doc_id").select($"s").as[String].collect().toSeq
    val b = batFinal.orderBy($"doc_id").select($"s").as[String].collect().toSeq
    assert(a == b, "batched and sequential training left different corpora")
    // and the batched corpus token total matches the last learned row
    assert(seqLearned.last._6 == batLearned.last._6)
  }

  test("bpe encode: token-count shrink equals merge joins; totals match the merge table") {
    // structural invariant of joining with '~': every merge fuses two
    // tokens into one, so n_tokens − n_tokens_encoded must equal the
    // total number of '~' characters across the doc's encoded tokens
    // (a token merged twice carries two '~'s and accounts for two joins)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    assert(TextAnalysis.bpeEncode.fn(spark, sfDir).count() == docs.count(),
      "one encoded row per document")
    // recompute '~' counts independently from the merge replay and compare
    val tilde = TextAnalysis.bpeEncode.fn(spark, sfDir)
      .select($"doc_id",
        ($"n_tokens" - $"n_tokens_encoded").as("shrink"),
        $"n_merged_tokens")
      .as[(Long, Int, Int)].collect()
    // every shrink is non-negative and at least the merged-token count
    // (each merged token absorbed >= 1 join), and some doc actually merged
    assert(tilde.forall { case (_, s, m) => s >= m && m >= 0 })
    assert(tilde.exists(_._3 > 0), "at least one document must contain a merge")
    // cross-consistency with the merge table: corpus token total after the
    // final round equals the sum of per-doc encoded counts
    val lastTotal = TextAnalysis.bpeMerges.fn(spark, sfDir)
      .orderBy($"round".desc).select($"n_tokens_after").as[Long].head()
    val encTotal = TextAnalysis.bpeEncode.fn(spark, sfDir)
      .agg(sum($"n_tokens_encoded")).as[Long].head()
    assert(lastTotal == encTotal,
      s"merge-table total $lastTotal != encoded total $encTotal")
  }

  test("bpe packing: n_tok is the ENCODED count, offsets are per-shard prefix " +
      "sums, and the window stays shard-partitioned") {
    val packed = TextAnalysis.bpePacking.fn(spark, sfDir)
    // fused correctly: every doc's packed token count equals
    // text_bpe_encode's n_tokens_encoded (the learned-tokenizer stream,
    // not the whitespace count text_token_packing uses)
    val join = packed.select($"doc_id", $"n_tok")
      .join(TextAnalysis.bpeEncode.fn(spark, sfDir)
        .select($"doc_id", $"n_tokens_encoded"), "doc_id")
    assert(join.filter($"n_tok" =!= $"n_tokens_encoded").count() == 0)
    // prefix-sum structure: within a shard, start_offset is the running
    // sum of preceding docs' n_tok in doc_id order
    val rows = packed.select($"shard", $"doc_id", $"start_offset", $"n_tok")
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).values
    rows.foreach { sh =>
      val sorted = sh.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, off, _), i) =>
        val expect = sorted.take(i).map(_._4.toLong).sum
        assert(off == expect)
      }
    }
    // plan pin: the running sum's Window exchanges on hashpartitioning(
    // shard) — a global (unpartitioned) window would show Exchange
    // SinglePartition below the Window and serialize one reducer at scale
    val p = TextAnalysis.bpePacking.fn(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("hashpartitioning(shard"), p.take(1500))
  }

  test("url canonicalization: case, www, scheme, trailing slash, tracking " +
      "params fold; real params survive sorted") {
    val cases = Seq(
      "https://news.example.org/p/5" -> "https://news.example.org/p/5",
      "HTTP://WWW.NEWS.EXAMPLE.ORG/p/5/?utm_source=feed&UTM_campaign=x" ->
        "https://news.example.org/p/5",
      "https://news.example.org/p/5?page=2&ref=home" ->
        "https://news.example.org/p/5?page=2",
      // params sort (order is not identity) and fbclid/gclid are tracking
      "https://a.example.org/x?z=1&a=2&fbclid=abc&gclid=9" ->
        "https://a.example.org/x?a=2&z=1",
      // bare host, no path, no query
      "http://WWW.B.example.NET" -> "https://b.example.net",
      // tracking-only query leaves no '?'
      "https://c.example.org/p?utm_medium=m" -> "https://c.example.org/p")
    val got = cases.map(_._1).toDF("url")
      .select(TextAnalysis.canonicalUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
  }

  test("epoch shuffle: each epoch is a full permutation; epochs are distinct orders") {
    val out = TextAnalysis.epochShuffle.fn(spark, sfDir)
      .select($"epoch", $"shard", $"pos", $"doc_id")
      .as[(Int, Int, Long, Long)].collect()
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect().toSet
    Seq(0, 1).foreach { e =>
      val rows = out.filter(_._1 == e)
      // membership: every document appears exactly once per epoch
      assert(rows.map(_._4).toSet == docs && rows.length == docs.size)
      // positions are dense 1..n within each shard
      rows.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq)
      }
      // shards are hash-balanced: no shard holds more than 3x its share
      val share = docs.size / 8.0
      assert(rows.groupBy(_._2).values.forall(_.length <= share * 3))
    }
    // the two epochs order documents differently (different md5 keys)
    val order0 = out.filter(_._1 == 0).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    val order1 = out.filter(_._1 == 1).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order0 != order1, "epoch 0 and 1 must be distinct permutations")
  }

  test("segment scrub: banner dropped everywhere; unique docs reconstruct exactly") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = TextAnalysis.dupSegmentScrub.fn(spark, sfDir)
      .join(docs.select($"doc_id", md5($"text").as("orig_md5")), "doc_id")
      .select($"doc_id", $"n_segments", $"n_kept", $"n_dropped",
        $"scrub_md5", $"orig_md5")
      .as[(Long, Int, Int, Int, String, String)].collect()
    assert(out.length == docs.count())
    // the planted banner is one segment of every doc and corpus-duplicated,
    // so every document drops at least one segment
    assert(out.forall { case (_, ns, nk, nd, _, _) => nd >= 1 && nk + nd == ns })
    // a doc whose only duplicated segment is the banner reassembles to its
    // ORIGINAL text (banner is exactly segment-width, so offsets align);
    // word-soup segments rarely repeat, so this must hold for most docs
    val clean = out.filter { case (_, ns, nk, _, _, _) => nk == ns - 1 }
    assert(clean.length >= out.length / 2, "most docs should lose only the banner")
    assert(clean.forall { case (_, _, _, _, scrub, orig) => scrub == orig },
      "banner-only scrub must reconstruct the original text byte-for-byte")
  }

  test("audio framing reconciles with whole-clip WAV features") {
    val frames = Multimodal.audioFraming.fn(spark, sfDir)
      .select($"doc_id", $"frame_id", $"n", $"energy", $"zero_crossings")
      .as[(Long, Int, Int, Long, Int)].collect().groupBy(_._1)
    val clips = Multimodal.wavDecode.fn(spark, sfDir)
      .select($"doc_id", $"n_samples", $"energy", $"zero_crossings")
      .as[(Long, Int, Long, Int)].collect()
    assert(clips.nonEmpty && frames.size == clips.length)
    clips.foreach { case (id, n, energy, clipZc) =>
      val fs = frames(id).sortBy(_._2)
      // frame cover: ceil(n/160) frames whose lengths sum to the clip
      assert(fs.length == (n + 159) / 160 && fs.map(_._3).sum == n)
      // energy is additive over the disjoint frames — must match exactly
      assert(fs.map(_._4).sum == energy, s"doc $id energy mismatch")
      // frame-local ZCR misses only the crossings AT frame boundaries:
      // clip total - frame sum ∈ [0, nframes-1]
      val missed = clipZc - fs.map(_._5).sum
      assert(missed >= 0 && missed < fs.length,
        s"doc $id boundary-crossing delta $missed outside [0, ${fs.length})")
    }
  }

  test("survivors: one per cluster, membership adds up, survivor is the min id") {
    val clusters = Dedup.ccClusters.fn(spark, sfDir)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect()
    val surv = Dedup.survivors.fn(spark, sfDir)
      .select($"survivor_id", $"n_members").as[(Long, Long)].collect()
    // the survivor set IS the distinct cluster-label set (min-label CC)
    assert(surv.map(_._1).toSet == clusters.map(_._2).toSet)
    // every member is accounted for exactly once across survivors
    assert(surv.map(_._2).sum == clusters.length)
    // per-cluster membership matches the clustering
    val bySize = clusters.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(surv.forall { case (id, n) => bySize(id) == n })
    // survivor is the minimum member id of its own cluster
    val minMember = clusters.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    assert(surv.forall { case (id, _) => minMember(id) == id })
  }

  test("prefix filter: candidate generation is lossless vs the unfiltered join") {
    val out = Dedup.prefixFilter.fn(spark, sfDir)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // reference: the SAME threshold decided from the full (unfiltered)
    // shingle equi-join — prefix filtering may only prune candidates that
    // cannot pass, never a qualifying pair
    val d = graft.Tables.load(spark, sfDir, "documents")
    val t = split($"text", " ")
    val base = d.select($"doc_id", $"text").unionAll(
      d.select(($"doc_id" + 2000000L).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), size(t) - 1)).as("text")))
    val shingle = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
        element_at(t, i + 2)))
    val sh = base.filter(size(t) >= 3)
      .select($"doc_id", explode(shingle).as("s")).distinct()
      .localCheckpoint(true)
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val ref = sh.select($"s", $"doc_id".as("id_a"))
      .join(sh.select($"s", $"doc_id".as("id_b")), Seq("s"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select($"doc_id".as("id_a"), $"n".as("n_a")), "id_a")
      .join(sizes.select($"doc_id".as("id_b"), $"n".as("n_b")), "id_b")
      .filter(lit(17) * $"inter" >= lit(7) * ($"n_a" + $"n_b"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out == ref, s"prefix path ${out.size} pairs, full join ${ref.size}")
    // every planted near-copy qualifies and is found
    val planted = out.filter { case (a, b) => b == a + 2000000L }
    assert(planted.size == d.count(), s"found ${planted.size} planted pairs")
  }

  test("random projection preserves aggregate norms and distances") {
    val out = Similarity.randomProjection.fn(spark, sfDir)
      .select($"vec_id", $"q_norm2", $"p_norm2")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // corpus-level norm preservation: E[p_k^2] = ||q||^2 exactly for a
    // +-1 matrix; the sum over all vectors must sit near 16x
    val ratio = out.map(_._3).sum.toDouble / 16 / out.map(_._2).sum
    assert(math.abs(ratio - 1.0) < 0.1, s"aggregate norm ratio $ratio")
    // aggregate DISTANCE preservation on consecutive-id pairs: project
    // the difference vector (projection is linear, so p_a - p_b is the
    // projection of q_a - q_b and the same expectation identity applies)
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id",
        graft.functions.VectorExprs.quantize1000($"embedding").as("qv"))
    val paired = e.join(e.select(($"vec_id" - 1).as("vec_id"),
        $"qv".as("qv_b")), "vec_id")
      .select(zip_with($"qv", $"qv_b", (a, b) => a - b).as("d"))
    import org.apache.spark.sql.Column
    val sign: (Column, Column) => Column = (k, j) =>
      when(((k * 37 + (j - 1) * 101) % 97 % 2) === 0, lit(1L))
        .otherwise(lit(-1L))
    val pd = transform(sequence(lit(0), lit(15)), k =>
      aggregate(sequence(lit(1), lit(64)), lit(0L), (acc, j) =>
        acc + sign(k, j) * element_at($"d", j)))
    val sums = paired.select(
      aggregate($"d", lit(0L), (a, x) => a + x * x).as("dq"),
      aggregate(pd, lit(0L), (a, x) => a + x * x).as("dp"))
      .agg(sum($"dq"), sum($"dp")).as[(Long, Long)].head()
    val dRatio = sums._2.toDouble / 16 / sums._1
    assert(math.abs(dRatio - 1.0) < 0.15, s"aggregate distance ratio $dRatio")
  }

  test("ngram novelty: first doc is all-novel; novelty sums to the distinct shingle count") {
    val out = TextAnalysis.ngramNovelty.fn(spark, sfDir)
      .select($"doc_id", $"n_shingles", $"n_novel")
      .as[(Long, Int, Int)].collect()
    assert(out.nonEmpty)
    // the smallest doc_id introduces every one of its own shingles
    val first = out.minBy(_._1)
    assert(first._2 == first._3, s"doc ${first._1} must be fully novel")
    // each distinct shingle is attributed to exactly one document
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val t = split($"text", " ")
    val shingle = transform(sequence(lit(1), size(t) - 2),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
        element_at(t, i + 2)))
    val nDistinct = docs.filter(size(t) >= 3)
      .select(explode(shingle).as("s")).distinct().count()
    assert(out.map(_._3.toLong).sum == nDistinct)
    // novelty is bounded by the doc's own shingle count
    assert(out.forall { case (_, ns, nv) => nv >= 0 && nv <= ns })
  }

  test("exact-by-hash dedup agrees with exact-by-text dedup") {
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"text")
      .unionAll(graft.Tables.load(spark, sfDir, "documents")
        .select(($"doc_id" + 1000L).as("doc_id"), $"text"))
    val byHash = Dedup.dedupExactByHash(d)
    assert(byHash.count() == d.select($"text").distinct().count())
    assert(byHash.agg(sum($"n_copies")).as[Long].head() == d.count())
  }

  test("dsir: candidates matching the target's bigram distribution outrank disjoint ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    val tgtText = Seq.fill(20)("alpha beta gamma delta").mkString(" ")
    val offText = Seq.fill(20)("zulu yankee xray whiskey").mkString(" ")
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    val rows =
      (0L until 10L).map(row(_, tgtText, "src0")) ++  // trusted target slice
      (10L until 20L).map(row(_, tgtText, "src1")) ++ // target-like candidates
      (20L until 30L).map(row(_, offText, "src2"))    // disjoint candidates
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.dsirSample.fn(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.length == 20, "all 20 candidates fit under the top-N cap")
    val byId = out.map(r => r._1 -> r._2).toMap
    // every target-like candidate scores positive (more target-like than
    // the corpus average), every disjoint one negative, no overlap
    assert((10L until 20L).forall(byId(_) > 0))
    assert((20L until 30L).forall(byId(_) < 0))
    assert((10L until 20L).map(byId).min > (20L until 30L).map(byId).max)
    // ranks 1..10 are exactly the target-like group
    assert(out.filter(_._3 <= 10).map(_._1).toSet == (10L until 20L).toSet)
  }

  test("source overlap: a mirrored source pair scores jaccard 1.0; disjoint pairs drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-overlap").toString
    val shared = "alpha beta gamma delta epsilon zeta"
    val other = "zulu yankee xray whiskey victor uniform"
    def row(id: Long, text: String, src: String) =
      (id, text, "en", src, text.length.toLong)
    (Seq(row(0L, shared, "src0"), row(1L, shared, "src1"),
      row(2L, other, "src2")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.sourceOverlap.fn(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect()
    // only the mirrored pair surfaces (zero-overlap pairs are absent)
    assert(out.length == 1)
    val (a, b, nShared, nA, nB, j) = out.head
    assert(a == "src0" && b == "src1" && nShared == 4 && nA == 4 && nB == 4)
    assert(j == 1.0)
  }
}
