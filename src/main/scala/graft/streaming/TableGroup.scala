package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table atomic commit — the multi-table transaction [[BucketManifest]]
  * deliberately left out (its swap is atomic per table directory; a pipeline
  * maintaining snapshot AND history from the same batch would otherwise
  * publish them one swap apart, and a crash in that gap leaves the PAIR
  * inconsistent even though each table alone is fine).
  *
  * Protocol — the same two primitives, one level up (exactly how
  * [[VectorIndexStream.IndexHome]] lifted the manifest discipline to
  * generations):
  *
  *  - Data files are immutable appends, per table, as before.
  *  - Each commit writes every table's post-commit live-file set as an
  *    IMMUTABLE versioned manifest `_manifest.v<N>` (N = the transaction
  *    id, shared by all tables in the group).
  *  - ONE file, `<groupDir>/_commit`, holds the live transaction id.
  *    Commit = write all the versioned manifests, then atomically swap
  *    `_commit` to N. Readers resolve `_commit` FIRST and read every table
  *    through `_manifest.v<N>` — so a reader sees transaction N-1's
  *    snapshot with transaction N-1's history, or N's with N's, NEVER a
  *    mixed pair, regardless of where the writer died.
  *  - Crash anywhere before the `_commit` swap (including between two
  *    tables' manifest writes — the gap single-table swaps cannot close):
  *    orphan data files and orphan `v<N>` manifests that nothing
  *    references; the checkpoint replay recomputes the batch, overwrites
  *    the orphan manifests in place (same N), and swaps once. Crash after
  *    the swap: a completed commit; replay is a latest-wins no-op at N+1.
  *    GC of superseded files and manifests runs after a successful swap.
  *
  * 100 TB shape: the `_commit` file is ~10 bytes read once per batch on
  * the driver; per-table manifests stay O(live files). On an object store
  * the swap becomes put-if-absent/atomic-rename and the synchronous GC an
  * async vacuum with a retention window — the multi-table transaction log
  * discipline of Delta/Iceberg, carried by two plain files. Reference
  * behavior target: the reference applies each change to its replica
  * table inside a DB transaction (postgres.py:33-59) — one table there; a
  * file-based replica fanning one stream into several derived tables
  * needs this protocol to give readers the same transactional view. */
object TableGroup {

  val CommitName = "_commit"

  /** Test failpoints: crash AFTER the first table's versioned manifest is
    * written (the exact window two independent single-table commits cannot
    * make safe), and crash after ALL manifests but before the pointer
    * swap. */
  private[streaming] var crashAfterFirstStage: Boolean = false
  private[streaming] var crashBeforeCommit: Boolean = false

  private def commitFile(groupDir: String) = new File(groupDir, CommitName)

  /** The live transaction id; None before the first commit. */
  def currentTxn(groupDir: String): Option[Long] = {
    val f = commitFile(groupDir)
    if (!f.exists()) None
    else Some(new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8).trim.toLong)
  }

  private def swapCommit(groupDir: String, v: Long): Unit = {
    new File(groupDir).mkdirs()
    val tmp = new File(groupDir, CommitName + ".tmp")
    Files.write(tmp.toPath, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp.toPath, commitFile(groupDir).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Resolve `table` at the live transaction (manifest-pruned to `buckets`
    * when given). None before the first commit or when nothing matches. */
  def readTable(spark: SparkSession, groupDir: String, table: String,
      buckets: Option[Seq[Long]] = None): Option[DataFrame] =
    currentTxn(groupDir).flatMap(v =>
      BucketManifest.resolveVersion(spark, s"$groupDir/$table", v, buckets))

  /** One table's contribution to a transaction: which buckets its merge
    * touched and the pre-write listing of those buckets. */
  case class Staged(table: String, changed: Seq[Long],
      before: Map[Long, Set[String]])

  /** Publish all staged tables as one transaction. Data files must already
    * be append-written. Single-writer per group (foreachBatch is serial);
    * readers are never blocked and never see a mixed pair.
    *
    * `retainTxns` is the retention window: the last `retainTxns`
    * transactions stay fully resolvable after the commit (their manifests
    * AND every data file they reference survive GC), so a long-running
    * reader that resolved `_commit` up to `retainTxns - 1` commits ago
    * never loses a file mid-scan — the Delta/Iceberg snapshot-retention
    * discipline. The default (1) keeps only the new live transaction:
    * right for single-process tests and the tightest storage bound;
    * production fan-out with concurrent readers sets the window to cover
    * the longest reader, and [[vacuum]] shrinks it later. */
  def commit(groupDir: String, staged: Seq[Staged],
      retainTxns: Int = 1): Long = {
    require(retainTxns >= 1, s"retainTxns must be >= 1, got $retainTxns")
    val cur = currentTxn(groupDir)
    val next = cur.getOrElse(0L) + 1L
    staged.zipWithIndex.foreach { case (st, i) =>
      val dir = s"$groupDir/${st.table}"
      val old = cur.flatMap(BucketManifest.readVersion(dir, _))
        .getOrElse(Map.empty[Long, Seq[String]])
      BucketManifest.writeVersion(dir, next,
        BucketManifest.nextEntries(old, dir, st.changed, st.before))
      if (crashAfterFirstStage && i == 0)
        throw new IllegalStateException(
          "failpoint: crash between table manifests")
    }
    if (crashBeforeCommit)
      throw new IllegalStateException("failpoint: crash before commit swap")
    swapCommit(groupDir, next)
    staged.foreach(st =>
      gcTable(s"$groupDir/${st.table}", next, retainTxns, Some(st.changed)))
    next
  }

  /** Every transaction id in the retention window that still has a
    * manifest on disk, newest last. */
  private def keptVersions(dir: String, live: Long, retainTxns: Int): Seq[Long] =
    (math.max(1L, live - retainTxns + 1) to live)
      .filter(v => new File(dir, BucketManifest.versionName(v)).exists())

  /** Union of the kept manifests' live-file sets — what GC must not touch. */
  private def keptEntries(dir: String, versions: Seq[Long]): Map[Long, Seq[String]] =
    versions.flatMap(v => BucketManifest.readVersion(dir, v).toSeq)
      .flatMap(_.toSeq)
      .groupBy(_._1)
      .map { case (b, fs) => b -> fs.flatMap(_._2).distinct.sorted }

  private def bucketDirs(dir: String): Seq[Long] =
    Option(new File(dir).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toLong)

  private def gcTable(dir: String, live: Long, retainTxns: Int,
      buckets: Option[Seq[Long]]): Unit = {
    val keep = keptVersions(dir, live, retainTxns)
    BucketManifest.gcBuckets(dir,
      buckets.getOrElse(bucketDirs(dir)), keptEntries(dir, keep))
    BucketManifest.gcVersionsExcept(dir, keep.toSet)
  }

  /** Shrink the retention window offline: keep the last `retainTxns`
    * transactions of every table in the group and collect everything
    * older (manifests and the data files only they referenced). Sweeps
    * ALL bucket directories, so orphans a crashed writer left in buckets
    * no later commit touched are collected too. */
  def vacuum(groupDir: String, retainTxns: Int = 1): Unit =
    currentTxn(groupDir).foreach { live =>
      tablesOf(groupDir).foreach(t =>
        gcTable(s"$groupDir/$t", live, retainTxns, None))
    }

  /** The group's tables: subdirectories holding at least one versioned
    * manifest. */
  private def tablesOf(groupDir: String): Seq[String] =
    Option(new File(groupDir).listFiles()).toSeq.flatten
      .filter(d => d.isDirectory &&
        Option(d.listFiles()).toSeq.flatten.exists(
          _.getName.startsWith(BucketManifest.ManifestName + ".v")))
      .map(_.getName)
}

/** The transaction's flagship user: maintain the latest-state snapshot AND
  * the SCD2 history from the SAME decoded micro-batch, committed together.
  * The merges are exactly [[CdcStream.mergeSnapshot]] and
  * [[Scd2Stream.mergeHistory]] — same plans, same shuffles, same
  * ≤1-file-per-bucket writes — only the publication step changes (one
  * group commit instead of two independent swaps). */
object DualSink {

  val SnapshotTable = "snapshot"
  val HistoryTable = "history"

  /** Apply one decoded envelope batch to both tables transactionally.
    * `retainTxns` = how many transactions stay readable after the commit
    * (see [[TableGroup.commit]]). */
  def applyBatch(decoded: DataFrame, groupDir: String,
      nBuckets: Int = 64, retainTxns: Int = 1): Unit = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val snapDir = s"$groupDir/$SnapshotTable"
    val histDir = s"$groupDir/$HistoryTable"
    BucketScheme.ensure(snapDir, BucketScheme.Murmur3Pmod, nBuckets)
    BucketScheme.ensure(histDir, BucketScheme.Murmur3Pmod, nBuckets)

    // both merges key on the same column with the same hash — one
    // changed-bucket set covers the pair
    val batchNorm = CdcStream.normalizeBatch(decoded, nBuckets)
    val changed: Seq[Long] =
      batchNorm.select(org.apache.spark.sql.functions.col("bucket"))
        .distinct().as[Long].collect().toSeq
    if (changed.isEmpty) return

    // existing slices resolve through the GROUP's live transaction — a
    // crashed earlier attempt's orphan files and manifests never re-enter
    val nextSnap = CdcStream.mergeSnapshot(
      batchNorm,
      TableGroup.readTable(spark, groupDir, SnapshotTable, Some(changed))
        .map(CdcStream.snapshotAsChanges(_, decoded.schema("before").dataType)),
      nBuckets)
    val nextHist = Scd2Stream.mergeHistory(
      Scd2Stream.keyedBatch(decoded, nBuckets),
      TableGroup.readTable(spark, groupDir, HistoryTable, Some(changed)),
      nBuckets)

    val beforeSnap = BucketManifest.preWriteListing(snapDir, changed)
    val beforeHist = BucketManifest.preWriteListing(histDir, changed)
    nextSnap.write.mode("append").partitionBy("bucket").parquet(snapDir)
    nextHist.write.mode("append").partitionBy("bucket").parquet(histDir)
    TableGroup.commit(groupDir, Seq(
      TableGroup.Staged(SnapshotTable, changed, beforeSnap),
      TableGroup.Staged(HistoryTable, changed, beforeHist)), retainTxns)
  }

  def readSnapshot(spark: SparkSession, groupDir: String): Option[DataFrame] =
    TableGroup.readTable(spark, groupDir, SnapshotTable)

  def readHistory(spark: SparkSession, groupDir: String): Option[DataFrame] =
    TableGroup.readTable(spark, groupDir, HistoryTable)

  /** Streaming wrapper: raw Debezium-envelope values → decoded → one
    * transactional dual merge per micro-batch. Commit-after-apply: the
    * checkpoint advances only after the group commit, so a crash replays
    * the batch (a latest-wins no-op past a completed `_commit` swap). */
  def run(rawValues: DataFrame, groupDir: String, checkpointDir: String,
      nBuckets: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery =
    rawValues.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(graft.cdc.Envelope.decode(batch), groupDir, nBuckets)
      }
      .start()
}
