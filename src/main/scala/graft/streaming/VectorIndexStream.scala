package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of a cell-partitioned IVF vector index — the
  * streaming companion to the batch build in
  * [[graft.operators.SimilarityIvf]]: embeddings arrive as a stream, each
  * micro-batch assigns its vectors to coarse cells (argmin L2 against
  * BROADCAST centroids — the centroids are the trained quantizer and stay
  * fixed; retraining is a batch job that rebuilds the index) and appends
  * ONLY the touched cell partitions of the parquet index.
  *
  * Layout: one root, partitioned `batch=<id>/cell=<c>` . The batch level is
  * the replay-idempotence device (same contract as [[NearDupStream]]'s
  * per-batch subdirs): a replayed micro-batch DYNAMICALLY OVERWRITES its
  * own batch=<id> partitions instead of appending duplicates. The crash
  * contract rests on REPLAYED BATCH CONTENT BEING DETERMINISTIC (true for
  * replayable sources — Kafka offsets, MemoryStream): same data ⇒ same
  * assigned cells ⇒ the replay rewrites exactly the partitions a crashed
  * attempt may have left partial files in, so orphans cannot survive a
  * replay (spec-pinned with a content-identical crashed-attempt twin). The cell
  * level is what serving prunes on — a cell filter prunes across every
  * batch directory, so the read cost of a probe stays ∝ the probed cells'
  * data no matter how many batches accumulated. (An index compaction —
  * folding batch dirs together — is the same operator as the CDC sinks'
  * compaction and reuses their manifest machinery when atomicity beyond
  * replay idempotence is needed.)
  *
  * Scale shape: the batch side is micro-batch-sized, the assignment is a
  * broadcast join + narrow argmin — the accumulated index is NEVER read,
  * shuffled, or rewritten by ingest; an insert-heavy stream updates hot
  * cells without touching the corpus, and the serving path's pruned read
  * ([[graft.operators.SimilarityIvf.ivfServed]]) picks new vectors up on
  * its next probe of that cell.
  *
  * Reference scope anchor: the reference streams rows into a replica table
  * (`/root/reference/app/consumer/consumer.py:63-75`); this is the same
  * consume-assign-append contract for vector payloads.
  */
object VectorIndexStream {

  /** One micro-batch: assign and write. Batch-callable (the foreachBatch
    * body and the spec's batch dual are this same function). */
  def applyBatch(batch: DataFrame, cents: DataFrame, idxDir: String,
      batchId: Long): Unit = {
    if (!batch.isEmpty) {
      graft.functions.KMeans.assignQuantized(batch, broadcast(cents))
        .select(col("id").as("vec_id"), col("qv"),
          lit(batchId).as("batch"), col("cell"))
        .repartition(col("cell")) // ≤1 file per touched cell per batch
        .write.partitionBy("batch", "cell")
        // dynamic: replaces exactly this batch's partitions on replay,
        // never another batch's
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(idxDir)
    }
  }

  /** Read the maintained index (all batches; serving filters on cell). */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
      idxDir: String): DataFrame =
    spark.read.parquet(idxDir)

  /** Offline compaction: fold every accumulated batch into a single
    * batch=0 generation at `outDir`, one file per cell. Write-to-new-root
    * rather than in-place: compaction is maintenance that runs while no
    * ingest writes (stop the query or point it at the new root after),
    * and a reader holding the OLD root is never torn — the cutover is the
    * caller swapping which root it reads, which on a real deployment is a
    * table-format/manifest pointer update ([[BucketManifest]] is the
    * single-table version of that machinery). */
  def compactTo(spark: org.apache.spark.sql.SparkSession,
      idxDir: String, outDir: String): Unit =
    readIndex(spark, idxDir)
      .select(col("vec_id"), col("qv"), lit(0L).as("batch"), col("cell"))
      .repartition(col("cell")) // ≤1 file per cell, as at ingest
      .write.partitionBy("batch", "cell")
      .mode("overwrite").parquet(outDir)

  /** The streaming wrapper: `vecs` must carry (id, qv). */
  def run(vecs: DataFrame, cents: DataFrame, idxDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    vecs.writeStream
      .queryName("graft-vector-index")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, cents, idxDir, batchId)
      }
      .start()
}
