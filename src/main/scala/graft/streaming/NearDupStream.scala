package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming near-duplicate filter: dedup-on-ingest for a document stream.
  *
  * Each micro-batch computes 64-bit SimHash signatures, splits them into
  * 4×16-bit bands, and drops any document whose band collides with the
  * persistent seen-band index (built from prior batches' SURVIVORS) or
  * with a smaller-`doc_id` document in the same batch. Pigeonhole gives
  * the recall guarantee: two signatures within Hamming distance 3 differ
  * in at most 3 of 64 bits, so at least one 16-bit band is untouched and
  * matches exactly — every near-dup (≤3 bit flips) of a seen document IS
  * caught. Collisions beyond distance 3 are possible (that's the LSH
  * trade: conservative over-dropping, never under-dropping within the
  * radius). Chain semantics are one-shot per batch: a doc is dropped if
  * it collides with ANY earlier-id doc in its batch, surviving or not —
  * deterministic and single-pass, documented rather than iterated.
  *
  * Scale shape: the batch side is micro-batch-sized; the index grows with
  * the corpus. The collision check is a left-semi equi-join on
  * `(band, v)` — at 100 TB the index lives as a table BUCKETED on
  * `(band, v)` so the semi join never reshuffles the big side, and the
  * per-batch append writes only the survivors' 4 rows/doc. The parquet
  * dir used here is the same code path minus the bucket metadata.
  */
object NearDupStream {

  /** 4 disjoint 16-bit bands of a 64-bit signature. */
  def bandsOf(sig: Column): Column =
    array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sig, b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }: _*)

  private val indexSchema = StructType(Seq(
    StructField("band", IntegerType), StructField("v", LongType)))

  private def readIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      // per-batch subdirs (b<id>/...) -> flat recursive listing; the
      // subdirs are an idempotence device, not partition columns
      spark.read.schema(indexSchema)
        .option("recursiveFileLookup", "true").parquet(indexDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
  }

  /** One batch of the filter, batch-callable (the foreachBatch body and
    * the spec's batch dual are this same function). Survivors land in
    * `outDir/b<batchId>`, their bands in `indexDir/b<batchId>`, written
    * with OVERWRITE — so a replay of the same micro-batch after a crash
    * rewrites its own subdirectory instead of appending duplicates, and
    * the filter output is exactly-once end to end (checkpoint replays a
    * batch only with the same batchId and, because the index read
    * excludes the batch's own subdir by construction — it didn't exist
    * when earlier batches wrote — the same input set). */
  def applyBatch(batch: DataFrame, indexDir: String, outDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    // A replayed batch must not see its own failed attempt's bands (it
    // would collide with itself and drop everything): remove this batch's
    // subdirs BEFORE the index read, not just rely on Overwrite at write.
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(s"$indexDir/b$batchId", s"$outDir/b$batchId").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val sig = batch
      .withColumn("simhash64", Dedup.simhash(split(col("text"), " ")))
      .persist() // consumed 3× below (bands, survivors, index append)
    try {
      val banded = sig.select(col("doc_id"),
          explode(bandsOf(col("simhash64"))).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.v").as("v"))
      val idx = readIndex(spark, indexDir)
      val hitIndex = banded.join(idx, Seq("band", "v"), "left_semi")
        .select(col("doc_id"))
      val l = banded.select(col("band"), col("v"), col("doc_id").as("id_a"))
      val r = banded.select(col("band"), col("v"), col("doc_id").as("id_b"))
      val hitBatch = l.join(r,
          l("band") === r("band") && l("v") === r("v") &&
            col("id_a") > col("id_b"))
        .select(col("id_a").as("doc_id"))
      val dropped = hitIndex.union(hitBatch).distinct()
      val survivors = sig.join(dropped, Seq("doc_id"), "left_anti")
      survivors.write.mode(SaveMode.Overwrite).parquet(s"$outDir/b$batchId")
      banded.join(dropped, Seq("doc_id"), "left_anti")
        .select(col("band"), col("v"))
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/b$batchId")
    } finally sig.unpersist()
  }

  /** The streaming query: every micro-batch runs [[applyBatch]] with its
    * batchId, so a checkpoint replay rewrites the same per-batch subdirs
    * and the filter is exactly-once end to end (spec: replaying a batch
    * changes nothing). */
  def nearDupFilter(docs: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, indexDir, outDir, batchId)
      }
      .start()
}
