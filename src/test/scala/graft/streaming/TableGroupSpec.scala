package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.DataFrame
import java.io.File
import java.nio.file.Files

/** Cross-table transaction contract of [[TableGroup]] / [[DualSink]]: a
  * snapshot and an SCD2 history maintained from the same batch are
  * published by ONE `_commit` swap — a crash anywhere (including between
  * the two tables' manifest writes, the window two independent
  * single-table commits cannot close) leaves readers on a CONSISTENT
  * pre-commit pair; replay converges, GCs orphans, and the final tables
  * equal the single-table sinks' outputs exactly. */
class TableGroupSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def decoded(events: Seq[String]): DataFrame =
    Envelope.decode(events.toDF("value"))

  private def snapState(g: String): Map[Long, String] =
    DualSink.readSnapshot(spark, g)
      .map(_.select($"id", $"name").as[(Long, String)].collect().toMap)
      .getOrElse(Map.empty)

  private def histState(g: String): Set[(Long, String, Long, Option[Long], Boolean)] =
    DualSink.readHistory(spark, g)
      .map(_.select($"id", $"name", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet)
      .getOrElse(Set.empty)

  private val b1 = Seq(env("c", 1, "a", 100), env("c", 2, "p", 110))
  private val b2 = Seq(env("u", 1, "b", 200), env("d", 2, "p", 210),
    env("c", 3, "q", 220))

  test("dual sink equals the two single-table sinks run separately") {
    val tmp = Files.createTempDirectory("graft-group-eq").toString
    val g = s"$tmp/group"
    DualSink.applyBatch(decoded(b1), g, nBuckets = 4)
    DualSink.applyBatch(decoded(b2), g, nBuckets = 4)

    val snapDir = s"$tmp/solo_snap"
    val histDir = s"$tmp/solo_hist"
    CdcStream.upsertBatchBucketed(spark, snapDir, nBuckets = 4)(decoded(b1), 0L)
    CdcStream.upsertBatchBucketed(spark, snapDir, nBuckets = 4)(decoded(b2), 1L)
    Scd2Stream.applyBatchBucketed(decoded(b1), histDir, nBuckets = 4)
    Scd2Stream.applyBatchBucketed(decoded(b2), histDir, nBuckets = 4)

    assert(snapState(g) == Map(1L -> "b", 3L -> "q"))
    assert(snapState(g) ==
      CdcStream.readSnapshotBucketed(spark, snapDir).get
        .select($"id", $"name").as[(Long, String)].collect().toMap)
    assert(histState(g) ==
      Scd2Stream.readHistoryBucketed(spark, histDir).get
        .select($"id", $"name", $"valid_from", $"valid_to", $"is_current")
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet)
  }

  test("crash between the two tables' manifest writes: readers keep a consistent pair; replay converges") {
    val tmp = Files.createTempDirectory("graft-group-crash1").toString
    val g = s"$tmp/group"
    DualSink.applyBatch(decoded(b1), g, nBuckets = 4)
    val txn1 = TableGroup.currentTxn(g)
    val s1 = snapState(g)
    val h1 = histState(g)

    // the window single-table commits cannot close: snapshot's v2 manifest
    // is on disk, history's is not — and NOTHING is published
    TableGroup.crashAfterFirstStage = true
    try intercept[IllegalStateException] {
      DualSink.applyBatch(decoded(b2), g, nBuckets = 4)
    } finally TableGroup.crashAfterFirstStage = false
    assert(new File(s"$g/snapshot", BucketManifest.versionName(2L)).exists(),
      "failpoint fired too early — no staged manifest")
    assert(TableGroup.currentTxn(g) == txn1)
    assert(snapState(g) == s1 && histState(g) == h1,
      "readers must still see the transaction-1 PAIR")

    // replay: overwrites the orphan v2 manifest, swaps once, pair advances
    DualSink.applyBatch(decoded(b2), g, nBuckets = 4)
    assert(TableGroup.currentTxn(g).contains(2L))
    assert(snapState(g) == Map(1L -> "b", 3L -> "q"))
    assert(histState(g).map(_._1) == Set(1L, 2L, 3L))
  }

  test("crash after all manifests but before the commit swap: same contract, and GC cleans up on replay") {
    val tmp = Files.createTempDirectory("graft-group-crash2").toString
    val g = s"$tmp/group"
    DualSink.applyBatch(decoded(b1), g, nBuckets = 4)
    val s1 = snapState(g)

    TableGroup.crashBeforeCommit = true
    try intercept[IllegalStateException] {
      DualSink.applyBatch(decoded(b2), g, nBuckets = 4)
    } finally TableGroup.crashBeforeCommit = false
    assert(TableGroup.currentTxn(g).contains(1L) && snapState(g) == s1)

    DualSink.applyBatch(decoded(b2), g, nBuckets = 4)
    assert(TableGroup.currentTxn(g).contains(2L))
    assert(snapState(g) == Map(1L -> "b", 3L -> "q"))
    // post-commit GC: exactly one versioned manifest (the live one) per
    // table, and disk files equal the live manifest exactly
    Seq("snapshot", "history").foreach { t =>
      val dir = s"$g/$t"
      val versioned = Option(new File(dir).listFiles()).toSeq.flatten
        .filter(_.getName.startsWith(BucketManifest.ManifestName + ".v"))
        .map(_.getName)
      assert(versioned == Seq(BucketManifest.versionName(2L)), versioned)
      val disk = Option(new File(dir).listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}")).toSet
      val live = BucketManifest.readVersion(dir, 2L)
        .map(_.values.flatten.toSet).getOrElse(Set.empty)
      assert(disk == live, s"$t: disk=$disk live=$live")
    }
  }

  test("streaming wrapper: one transaction per micro-batch, pair stays consistent") {
    implicit val sc = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-group-stream").toString
    val g = s"$tmp/group"
    val es = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val q = DualSink.run(es.toDF().toDF("value"), g, s"$tmp/ck", nBuckets = 4)
    try {
      es.addData(b1: _*)
      q.processAllAvailable()
      assert(TableGroup.currentTxn(g).contains(1L))
      assert(snapState(g) == Map(1L -> "a", 2L -> "p"))
      es.addData(b2: _*)
      q.processAllAvailable()
      assert(TableGroup.currentTxn(g).contains(2L))
      assert(snapState(g) == Map(1L -> "b", 3L -> "q"))
      assert(histState(g).map(_._1) == Set(1L, 2L, 3L))
    } finally q.stop()
  }

  test("retention window: an old reader's transaction stays fully resolvable; vacuum shrinks it") {
    val tmp = Files.createTempDirectory("graft-group-retain").toString
    val g = s"$tmp/group"
    DualSink.applyBatch(decoded(b1), g, nBuckets = 4, retainTxns = 2)
    // a long-running reader resolves transaction 1 NOW and keeps scanning
    val oldReaderFiles = BucketManifest.readVersion(s"$g/snapshot", 1L)
      .get.values.flatten.toSeq.map(rel => new File(s"$g/snapshot", rel))
    assert(oldReaderFiles.nonEmpty && oldReaderFiles.forall(_.exists()))

    DualSink.applyBatch(decoded(b2), g, nBuckets = 4, retainTxns = 2)
    assert(TableGroup.currentTxn(g).contains(2L))
    // window of 2: the old reader's manifest AND every file it references
    // survive the commit's GC — it can finish its scan at transaction 1
    assert(oldReaderFiles.forall(_.exists()),
      "retention must keep the old transaction's data files")
    val v1 = BucketManifest.resolveVersion(spark, s"$g/snapshot", 1L)
    assert(v1.isDefined)
    assert(v1.get.select($"id", $"name").as[(Long, String)].collect().toMap
      == Map(1L -> "a", 2L -> "p"), "transaction 1 must still resolve exactly")
    // the live transaction is unaffected by retention
    assert(snapState(g) == Map(1L -> "b", 3L -> "q"))

    // the reader is done: vacuum to a window of 1 — transaction 1's
    // manifest and its superseded files go, the live pair is untouched
    TableGroup.vacuum(g, retainTxns = 1)
    assert(BucketManifest.readVersion(s"$g/snapshot", 1L).isEmpty)
    assert(BucketManifest.readVersion(s"$g/history", 1L).isEmpty)
    assert(snapState(g) == Map(1L -> "b", 3L -> "q"))
    assert(histState(g).map(_._1) == Set(1L, 2L, 3L))
    // nothing unreferenced remains on disk
    Seq("snapshot", "history").foreach { t =>
      val dir = s"$g/$t"
      val disk = Option(new File(dir).listFiles()).toSeq.flatten
        .filter(_.getName.startsWith("bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}")).toSet
      val live = BucketManifest.readVersion(dir, 2L)
        .map(_.values.flatten.toSet).getOrElse(Set.empty)
      assert(disk == live, s"$t: disk=$disk live=$live")
    }
  }

  test("replay after a completed commit is a latest-wins no-op at the next transaction") {
    val tmp = Files.createTempDirectory("graft-group-noop").toString
    val g = s"$tmp/group"
    DualSink.applyBatch(decoded(b1), g, nBuckets = 4)
    DualSink.applyBatch(decoded(b2), g, nBuckets = 4)
    val s = snapState(g)
    val h = histState(g)
    DualSink.applyBatch(decoded(b2), g, nBuckets = 4) // at-least-once redelivery
    assert(TableGroup.currentTxn(g).contains(3L))
    assert(snapState(g) == s && histState(g) == h)
  }
}
