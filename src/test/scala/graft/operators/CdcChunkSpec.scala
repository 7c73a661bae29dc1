package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Content-defined chunking pins: the property the whole operator exists
  * for is OFFSET-ROBUSTNESS — boundaries are a function of content alone,
  * so a shifted/edited copy re-synchronizes at the next boundary instead
  * of invalidating every downstream unit the way fixed-stride windows do. */
class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: (Long, String)*): Map[Long, Seq[String]] =
    Dedup.cdcChunkify(rows.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private val base =
    "the quick brown fox jumps over the lazy dog while a sorted query " +
      "plan shuffles rows across partitions and the optimizer prunes " +
      "columns before the scan even begins to read a single byte of data"

  test("chunks reassemble the document exactly, in order") {
    val got = chunksOf((1L, base))(1L)
    assert(got.mkString("") == base)
    assert(got.forall(_.nonEmpty))
  }

  test("offset robustness: a prefix-shifted copy shares every chunk after its first boundary") {
    val m = chunksOf((1L, base), (2L, "zq " + base))
    val (a, b) = (m(1L), m(2L))
    // all but the first chunk of each must be identical — the chunking
    // re-synchronizes at the first content boundary
    assert(a.tail == b.tail, s"tails differ:\n${a.tail}\n${b.tail}")
    assert(b.head == "zq " + a.head)
    // the shared tail is the overwhelming majority of the content
    assert(a.tail.map(_.length).sum * 10 > base.length * 5,
      "expected most content in shared chunks")
  }

  test("a mid-document edit invalidates only the chunk it touches") {
    val edited = base.replace("optimizer", "optimizer!")
    val m = chunksOf((1L, base), (2L, edited))
    val shared = m(1L).toSet.intersect(m(2L).toSet)
    // every chunk NOT containing the edit site is byte-identical
    val touched = m(1L).filter(_.contains("optimizer"))
    assert(m(1L).filterNot(touched.contains).forall(shared.contains))
    assert(shared.nonEmpty)
  }

  test("short texts (< window) come back as one whole chunk") {
    val m = chunksOf((1L, "tiny"), (2L, ""), (3L, "x"))
    assert(m(1L) == Seq("tiny"))
    assert(!m.contains(2L)) // empty text → zero chunks
    assert(m(3L) == Seq("x"))
  }

  test("boundaries are deterministic across runs and partitionings") {
    val rows = (1L to 50L).map(i => (i, base.drop((i % 7).toInt) + i))
    val a = Dedup.cdcChunkify(rows.toDF("doc_id", "text").repartition(4))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val b = Dedup.cdcChunkify(rows.toDF("doc_id", "text").repartition(1))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(a == b)
  }

  test("scale key: xxhash64-keyed census rollup equals the string key " +
      "on the real corpus (the registered dedup_cdc_chunks shape)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.select(
      (col("doc_id") + 3000000L).as("doc_id"),
      concat(lit("zq "), col("text")).as("text")))
    val exact = Dedup.cdcDupStats(corpus, identity)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val hashed = Dedup.cdcDupStats(corpus, xxhash64(_))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(exact == hashed)
  }
}
