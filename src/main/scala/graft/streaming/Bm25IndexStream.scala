package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of the bucket-partitioned BM25 text index —
  * the [[VectorIndexStream]] discipline applied to retrieval: documents
  * arrive as a stream, each micro-batch appends its postings (partitioned
  * `tbucket=<b>/batch=<id>`, so a query's bucket pruning works ACROSS
  * every accumulated batch directory), its doc lengths, and two ADDITIVE
  * per-batch partials — per-term document frequency and corpus totals —
  * that serving merges by summation
  * ([[graft.operators.TextAnalysis.bm25ServeStreamed]]). Additivity is
  * what makes the maintenance exact rather than approximate: a document
  * lives wholly in one batch, so batch-local df/doclen/totals sum to the
  * corpus values and the streamed index reproduces `text_bm25_topk`
  * BIT-EXACTLY once every document has streamed in (spec-pinned).
  *
  * Replay idempotence: every table is partitioned by `batch` and written
  * with dynamic partition overwrite — a replayed micro-batch rewrites
  * exactly its own batch partitions (same contract, and same
  * deterministic-replay precondition, as [[VectorIndexStream]]).
  *
  * Scale shape: the batch side is micro-batch-sized; the accumulated
  * index is never read, shuffled, or rewritten by ingest. The df-partial
  * table grows one vocab-bounded slice per batch — serving's merge is a
  * vocab-sized hash agg; when batch count grows large, compaction folds
  * partials exactly like the CDC sinks' compaction (additivity means the
  * fold is a plain sum).
  */
object Bm25IndexStream {

  /** One micro-batch: derive parts and write. Batch-callable (the
    * foreachBatch body, the registered query's drive, and the spec's
    * batch dual are this same function). */
  def applyBatch(batch: DataFrame, root: String, batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val (postings, doclen, dfPart, statsPart) =
        graft.operators.TextAnalysis.bm25BatchParts(batch)
      def write(df: DataFrame, table: String, parts: Seq[String]): Unit =
        df.withColumn("batch", lit(batchId))
          .write.partitionBy(parts :+ "batch": _*)
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(s"$root/$table")
      // cluster postings by bucket first: the repartition computes the
      // same pmod(hash(term), n) as the partition value, so it doubles as
      // the write exchange — ≤1 file per (batch, bucket)
      write(postings.repartition(
          graft.operators.TextAnalysis.Bm25Buckets, col("term")),
        "postings", Seq("tbucket"))
      write(doclen.coalesce(1), "doclen", Seq.empty)
      write(dfPart.coalesce(1), "df_part", Seq.empty)
      write(statsPart, "stats_part", Seq.empty)
    }
  }

  /** Offline compaction: fold every accumulated batch into a single
    * batch=0 generation at `outRoot` — postings re-clustered to ≤1 file
    * per bucket, df partials summed to one vocab-sized slice, stats
    * summed to one row (additivity makes the fold a plain sum). Same
    * write-to-new-root + caller-swaps-pointer contract as
    * [[VectorIndexStream.compactTo]]. */
  def compactTo(spark: org.apache.spark.sql.SparkSession,
      root: String, outRoot: String): Unit = {
    val b = graft.operators.TextAnalysis.Bm25Buckets
    spark.read.parquet(s"$root/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("tbucket"),
        lit(0L).as("batch"))
      .repartition(b, col("term"))
      .write.partitionBy("tbucket", "batch").parquet(s"$outRoot/postings")
    spark.read.parquet(s"$root/doclen")
      .select(col("doc_id"), col("dl"), lit(0L).as("batch"))
      .coalesce(1).write.partitionBy("batch").parquet(s"$outRoot/doclen")
    spark.read.parquet(s"$root/df_part")
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .select(col("term"), col("df"), lit(0L).as("batch"))
      .coalesce(1).write.partitionBy("batch").parquet(s"$outRoot/df_part")
    spark.read.parquet(s"$root/stats_part")
      .agg(sum(col("n_corpus")).as("n_corpus"),
        sum(col("tl_corpus")).as("tl_corpus"))
      .select(col("n_corpus"), col("tl_corpus"), lit(0L).as("batch"))
      .write.partitionBy("batch").parquet(s"$outRoot/stats_part")
  }

  /** Wire a document stream into the maintained index. */
  def run(docs: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => applyBatch(batch, root, id))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
