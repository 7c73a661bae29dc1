package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming near-dup filter: exact copies and ≤3-bit SimHash neighbors
  * of already-seen documents are dropped across micro-batches; the
  * streaming run equals the batch dual (applyBatch folded over the same
  * batches). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: Int, n: Int): String =
    (0 until n).map(i => s"w${(i * 31 + seed * 7) % 97}").mkString(" ")

  // 40-token base doc; nearCopy swaps one token — with 40 votes per bit a
  // single swap moves few bits, and the spec VERIFIES (not assumes) the
  // hamming distance before relying on the drop.
  private val baseText = words(1, 40)
  private val nearText = baseText.split(" ").updated(5, "zzz").mkString(" ")
  private val otherText = words(2, 40)
  private val thirdText = words(3, 40)

  private def hamming(a: String, b: String): Int = {
    val df = Seq((a, b)).toDF("ta", "tb")
      .select(graft.operators.Dedup.simhash(split($"ta", " ")).as("sa"),
        graft.operators.Dedup.simhash(split($"tb", " ")).as("sb"))
      .select(bit_count($"sa".bitwiseXOR($"sb")).as("d")).as[Int]
    df.head()
  }

  test("near-dup stream filter: copies and close neighbors dropped across batches, batch dual agrees") {
    val d = hamming(baseText, nearText)
    assert(d <= 3, s"fixture drift: near-copy hamming $d > 3 — pick a longer doc")
    assert(hamming(baseText, otherText) > 3, "fixture drift: unrelated docs too close")

    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-neardup").toString
    val es = MemoryStream[(Long, String)]
    val docs = es.toDF().toDF("doc_id", "text")
    val q = NearDupStream.nearDupFilter(
      docs, s"$tmp/index", s"$tmp/out", s"$tmp/ck", Trigger.ProcessingTime(0))
    // batch 1: base + unrelated -> both survive
    es.addData((1L, baseText), (2L, otherText))
    q.processAllAvailable()
    // batch 2: exact copy of 1 (drop), near-copy of 1 (drop), fresh (keep)
    es.addData((3L, baseText), (4L, nearText), (5L, thirdText))
    q.processAllAvailable()
    // batch 3: near-copy again (still dropped — index remembers), plus an
    // intra-batch pair: 7 collides with smaller-id 6 -> 6 kept, 7 dropped
    val dupPair = words(4, 40)
    es.addData((6L, dupPair), (7L, dupPair))
    q.processAllAvailable()
    q.stop()
    def readOut(dir: String) = spark.read
      .option("recursiveFileLookup", "true").parquet(dir)
    val survivors = readOut(s"$tmp/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 5L, 6L), s"got $survivors")

    // batch dual: fold applyBatch over the same three batches
    val tmp2 = Files.createTempDirectory("graft-neardup-dual").toString
    val batches = Seq(Seq((1L, baseText), (2L, otherText)),
      Seq((3L, baseText), (4L, nearText), (5L, thirdText)),
      Seq((6L, dupPair), (7L, dupPair)))
    batches.zipWithIndex.foreach { case (b, i) =>
      NearDupStream.applyBatch(
        b.toDF("doc_id", "text"), s"$tmp2/index", s"$tmp2/out", i.toLong)
    }
    val dual = readOut(s"$tmp2/out")
      .select($"doc_id").as[Long].collect().toSet
    assert(dual == survivors)
    // the index holds exactly the survivors' bands (4 per doc)
    assert(readOut(s"$tmp/index").count() == survivors.size * 4L)

    // crash-replay idempotence: re-running the LAST batch with the same
    // batchId (what a checkpoint replay does) must change nothing — the
    // per-batch subdirs are rewritten, not appended, and the batch must
    // not collide with its own previous attempt's bands.
    NearDupStream.applyBatch(
      batches.last.toDF("doc_id", "text"), s"$tmp2/index", s"$tmp2/out", 2L)
    assert(readOut(s"$tmp2/out")
      .select($"doc_id").as[Long].collect().toSet == survivors)
    assert(readOut(s"$tmp2/index").count() == survivors.size * 4L)
  }
}
