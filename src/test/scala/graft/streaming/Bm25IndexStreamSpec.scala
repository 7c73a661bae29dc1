package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Incremental BM25 index maintenance: the streamed index (per-batch
  * postings + additive df/stats partials) must serve the identical
  * ranked results as the batch recompute, mid-stream prefixes included,
  * and a replayed batch must not perturb a single score. */
class Bm25IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.Tables.load(spark, sfDir, "documents")
    .select($"doc_id", $"text")

  private def served(root: String): Seq[(Int, String, Int, Long)] =
    graft.operators.TextAnalysis.bm25ServeStreamed(spark, root)
      .select($"query_id", $"q_terms", $"rank", $"doc_id")
      .as[(Int, String, Int, Long)].collect().toSeq

  private def batchTopk(d: org.apache.spark.sql.DataFrame)
      : Seq[(Int, String, Int, Long)] =
    graft.operators.TextAnalysis.bm25Retrieve(d)
      .select($"query_id", $"q_terms", $"rank", $"doc_id")
      .as[(Int, String, Int, Long)].collect().toSeq

  test("streamed index serves the batch results exactly, at every prefix and after replay") {
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-bm25-stream").toString
    val root = s"$tmp/idx"
    val all = docs.as[(Long, String)].collect()
    val waves = all.groupBy(d => (d._1 % 3).toInt)

    val es = MemoryStream[(Long, String)]
    val q = Bm25IndexStream.run(
      es.toDF().toDF("doc_id", "text"), root, s"$tmp/ck",
      Trigger.ProcessingTime(0))
    try {
      es.addData(waves(0).toIndexedSeq)
      q.processAllAvailable()
      // mid-stream: the partially built index must equal the batch
      // recompute over exactly the docs streamed so far (df, corpus
      // totals, and ranking all reflect only wave 0)
      val w0 = spark.createDataFrame(waves(0).toIndexedSeq)
        .toDF("doc_id", "text")
      assert(served(root) == batchTopk(w0), "wave-0 prefix")

      // drain each wave separately so batch ids are deterministically
      // 0/1/2 (the replay below re-targets id 1)
      es.addData(waves(1).toIndexedSeq)
      q.processAllAvailable()
      es.addData(waves(2).toIndexedSeq)
      q.processAllAvailable()
      val full = served(root)
      assert(full == batchTopk(docs), "full corpus")
      assert(full.nonEmpty)

      // replay idempotence: re-apply wave 1's content under its batch id
      // (dynamic overwrite rewrites exactly that batch's partitions)
      val w1 = spark.createDataFrame(waves(1).toIndexedSeq)
        .toDF("doc_id", "text")
      val replayId = 1L
      Bm25IndexStream.applyBatch(w1, root, replayId)
      assert(served(root) == full, "replayed batch must not change a score")

      // compaction folds the three batches into one generation; serving
      // the compacted root must again be score-identical
      val compacted = s"$tmp/idx_c"
      Bm25IndexStream.compactTo(spark, root, compacted)
      assert(served(compacted) == full, "compaction must not change a score")
      val dfFiles = new java.io.File(s"$compacted/df_part/batch=0")
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(dfFiles == 1, s"df partials folded to one slice, got $dfFiles")
    } finally q.stop()
  }

  test("additive maintenance is split-invariant: random batch partitions serve identically") {
    // property over ARBITRARY batchings (the MemoryStream test fixes one):
    // however the corpus is split into batches, summed partials equal the
    // batch corpus statistics, so serving is bit-identical. Seeded random
    // splits of a synthetic corpus; few trials — each is a full
    // build+serve cycle
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi")
    val rnd = new scala.util.Random(42)
    val corpus = (0L until 40L).map { id =>
      val n = 8 + rnd.nextInt(8)
      id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val cdf = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val want = batchTopk(cdf)
    assert(want.nonEmpty)
    (1 to 4).foreach { trial =>
      val k = 1 + rnd.nextInt(5)
      val assign = corpus.map(d => d -> rnd.nextInt(k))
      val root = Files.createTempDirectory(s"graft-bm25-prop$trial").toString
      (0 until k).foreach { b =>
        val slice = assign.filter(_._2 == b).map(_._1)
        if (slice.nonEmpty)
          Bm25IndexStream.applyBatch(
            spark.createDataFrame(slice).toDF("doc_id", "text"), root, b.toLong)
      }
      assert(served(root) == want, s"trial $trial (k=$k) diverged")
    }
  }
}
