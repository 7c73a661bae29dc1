package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.{CdcStream, DualSink, TableGroup}
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The `graft-table` DataSource V2 streaming SINK: commit-after-apply
  * (reference `app/consumer/consumer.py:74-75`) proven at Spark's
  * `StreamingWrite` epoch commit/abort API. The end-to-end shape is the
  * full connector pair — `readStream.format("graft-cdc")` →
  * `writeStream.format("graft-table")` — with epoch commits landing as
  * transaction-log CAS entries on the dual-table group. */
class GraftTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  private def runPipe(root: String, topic: String, group: String,
      ck: String): Unit = {
    val q = spark.readStream
      .format("graft-cdc")
      .options(CdcStream.kafkaOptions(root, topic))
      .load()
      .writeStream
      .format("graft-table")
      .option("path", group)
      .option("checkpointLocation", ck)
      .option("nBuckets", "4")
      .option("retainTxns", "2")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("connector pair end to end: graft-cdc read → graft-table epoch commits") {
    val tmp = Files.createTempDirectory("graft-tbl-e2e").toString
    val root = s"$tmp/log"; val group = s"$tmp/group"
    GraftCdcLog.append(root, "t", 0, Seq(
      env("r", 1, "a", 100), env("r", 2, "b", 110), env("u", 1, "a2", 200)))
    GraftCdcLog.append(root, "t", 1, Seq(
      env("r", 3, "c", 120), env("d", 2, "b", 210)))
    runPipe(root, "t", group, s"$tmp/ck1")

    val snap = DualSink.readSnapshot(spark, group).get
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(snap == Set((1L, "a2"), (3L, "c")))
    val hist = DualSink.readHistory(spark, group).get
      .select($"id", $"valid_from", $"valid_to")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(hist == Set((1L, 100L, Some(200L)), (1L, 200L, None),
      (2L, 110L, Some(210L)), (3L, 120L, None)))
    // the epoch landed as a txn-log CAS entry and left a committed marker
    assert(TableGroup.currentTxn(group).contains(1L))
    val epochs = new File(s"$group/_epochs").listFiles()(0).listFiles()
    assert(epochs.length == 1)
    // staging fully swept after commit
    assert(!new File(s"$group/_staging").exists() ||
      new File(s"$group/_staging").listFiles().forall(_.listFiles().isEmpty))
  }

  test("connector READ: version-as-of resolves the txn log; live default; " +
      "pruning pushes into the scan; bad versions fail loudly") {
    val tmp = Files.createTempDirectory("graft-tbl-read").toString
    val root = s"$tmp/log"; val group = s"$tmp/group"; val ck = s"$tmp/ck"
    GraftCdcLog.append(root, "t", 0, Seq(env("r", 1, "a", 100)))
    runPipe(root, "t", group, ck) // txn 1: {1 -> a}
    GraftCdcLog.append(root, "t", 0, Seq(env("u", 1, "a2", 200)))
    runPipe(root, "t", group, ck) // txn 2: {1 -> a2}; retainTxns=2 keeps 1

    def read(v: Option[Long], table: String = "snapshot") = {
      val r = spark.read.format("graft-table")
        .option("path", group).option("table", table)
      v.foreach(x => r.option("versionAsOf", x.toString))
      r.load()
    }
    // default = live transaction; byte-equal to the Scala API read
    assert(read(None).select($"id", $"name").as[(Long, String)]
      .collect().toSet == Set((1L, "a2")))
    // version-as-of resolves the RETAINED previous transaction
    assert(read(Some(1L)).select($"id", $"name").as[(Long, String)]
      .collect().toSet == Set((1L, "a")))
    // the history table reads through the same option surface
    assert(read(None, table = "history")
      .select($"id", $"valid_from", $"valid_to")
      .as[(Long, Long, Option[Long])].collect().toSet ==
      Set((1L, 100L, Some(200L)), (1L, 200L, None)))
    // column pruning reaches the connector scan: the planned row-source
    // outputs only the requested column
    val pruned = read(Some(2L)).select($"name")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("ReadSchema: struct<name:string>"), plan.take(800))
    assert(!plan.contains("acctbal"), "pruning failed:\n" + plan.take(800))
    assert(pruned.as[String].collect().toSeq == Seq("a2"))
    // a version outside the retention window / unknown table / no commits
    intercept[IllegalArgumentException](read(Some(99L)).collect())
    intercept[IllegalArgumentException](
      read(None, table = "nope").collect())
    intercept[IllegalArgumentException](
      spark.read.format("graft-table").option("path", s"$tmp/empty")
        .option("versionAsOf", "1").load().collect())
  }

  test("a second AvailableNow run appends only the new records as a new txn") {
    val tmp = Files.createTempDirectory("graft-tbl-incr").toString
    val root = s"$tmp/log"; val group = s"$tmp/group"; val ck = s"$tmp/ck"
    GraftCdcLog.append(root, "t", 0, Seq(env("r", 1, "a", 100)))
    runPipe(root, "t", group, ck)
    assert(TableGroup.currentTxn(group).contains(1L))
    GraftCdcLog.append(root, "t", 0, Seq(env("u", 1, "a2", 200)))
    runPipe(root, "t", group, ck)
    assert(TableGroup.currentTxn(group).contains(2L))
    val snap = DualSink.readSnapshot(spark, group).get
      .select($"id", $"name").as[(Long, String)].collect().toSet
    assert(snap == Set((1L, "a2")))
    // time travel to txn 1 still resolves (retainTxns=2)
    val at1 = TableGroup.readTableAt(spark, group, DualSink.SnapshotTable, 1L)
      .get.select($"id", $"name").as[(Long, String)].collect().toSet
    assert(at1 == Set((1L, "a")))
  }

  test("batch write: the initial snapshot load is one transaction; " +
      "streaming applies on top of it") {
    val tmp = Files.createTempDirectory("graft-tbl-batch").toString
    val root = s"$tmp/log"; val group = s"$tmp/group"
    // bootstrap: a plain DataFrame append — the backfill path
    val seed = Seq(env("r", 1, "a", 100), env("r", 2, "b", 110))
      .toDF("value")
    seed.write.format("graft-table")
      .option("path", group).option("nBuckets", "4")
      .option("retainTxns", "2")
      .mode("append").save()
    assert(TableGroup.currentTxn(group).contains(1L))
    assert(DualSink.readSnapshot(spark, group).get
      .select($"id", $"name").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // no staging left behind
    assert(!new File(s"$group/_staging").exists() ||
      new File(s"$group/_staging").listFiles().forall(_.listFiles().isEmpty))
    // the change stream applies ON TOP as transaction 2
    GraftCdcLog.append(root, "t", 0, Seq(env("u", 1, "a2", 200)))
    runPipe(root, "t", group, s"$tmp/ck")
    assert(TableGroup.currentTxn(group).contains(2L))
    assert(DualSink.readSnapshot(spark, group).get
      .select($"id", $"name").as[(Long, String)].collect().toSet ==
      Set((1L, "a2"), (2L, "b")))
    // the bootstrap transaction still time-travels
    assert(TableGroup.readTableAt(spark, group, DualSink.SnapshotTable, 1L)
      .get.select($"id", $"name").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("replayed epoch commit is a no-op past the marker (exactly-once)") {
    val tmp = Files.createTempDirectory("graft-tbl-replay").toString
    val group = s"$tmp/group"
    val write = new GraftTableStreamingWrite(
      group, "q1", 0, false, 4, 2)
    val staging = GraftTableSink.stagingDir(group, "q1", 0L)
    staging.mkdirs()
    val f = new File(staging, "part-00000-0.jsonl")
    Files.write(f.toPath,
      (env("r", 1, "a", 100) + "\n").getBytes("UTF-8"))
    val msgs: Array[WriterCommitMessage] =
      Array(GraftStagedFile(f.getAbsolutePath, 1L))
    write.commit(0L, msgs)
    assert(TableGroup.currentTxn(group).contains(1L))
    // the engine re-delivers the SAME epoch after a crash: staged files
    // are re-written by re-executed tasks, commit is called again
    staging.mkdirs()
    Files.write(f.toPath,
      (env("r", 1, "a", 100) + "\n").getBytes("UTF-8"))
    write.commit(0L, msgs)
    assert(TableGroup.currentTxn(group).contains(1L)) // no second txn
    val snap = DualSink.readSnapshot(spark, group).get
    assert(snap.count() == 1L)
  }

  test("abort deletes the epoch's staged files and publishes nothing") {
    val tmp = Files.createTempDirectory("graft-tbl-abort").toString
    val group = s"$tmp/group"
    val write = new GraftTableStreamingWrite(
      group, "q2", 0, false, 4, 1)
    val staging = GraftTableSink.stagingDir(group, "q2", 0L)
    staging.mkdirs()
    val f = new File(staging, "part-00000-0.jsonl")
    Files.write(f.toPath, (env("r", 1, "a", 100) + "\n").getBytes("UTF-8"))
    write.abort(0L, Array(GraftStagedFile(f.getAbsolutePath, 1L)))
    assert(!staging.exists())
    assert(TableGroup.currentTxn(group).isEmpty)
  }

  test("tombstones (null value) are skipped by the stage writer, and the " +
      "writer rejects inputs without a value column") {
    val tmp = Files.createTempDirectory("graft-tbl-tomb").toString
    val group = s"$tmp/group"
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData(env("r", 1, "a", 100))
    // null tombstone mixed in via a transform
    val src = mem.toDF().select(
      when(col("value").contains("never"), lit(null)).otherwise(col("value"))
        .as("value"))
    val q = src.writeStream.format("graft-table")
      .option("path", group)
      .option("checkpointLocation", s"$tmp/ck")
      .option("nBuckets", "4")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(DualSink.readSnapshot(spark, group).get.count() == 1L)

    val bad = intercept[Exception] {
      val q2 = mem.toDF().select(col("value").as("v"))
        .writeStream.format("graft-table")
        .option("path", s"$tmp/group2")
        .option("checkpointLocation", s"$tmp/ck2")
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination()
    }
    assert(bad.getMessage != null)
  }

  test("connector READ pushdown: filters reach the scan (PushedFilters), " +
      "key equality prunes the FILE LIST to the key's bucket, and a " +
      "residue hitting no live bucket yields an empty result") {
    val tmp = Files.createTempDirectory("graft-tbl-push").toString
    val root = s"$tmp/log"; val group = s"$tmp/group"; val ck = s"$tmp/ck"
    // keys bucketed by pmod(murmur3(id), 4) — compute the layout Spark
    // itself will produce, then insert only keys of buckets {0,1,2}:
    // bucket 3 stays EMPTY so a lookup routed there exercises the
    // zero-live-files path
    val bucketOf: Map[Long, Long] = spark.range(1, 200)
      .select($"id", pmod(hash($"id"), lit(4)).cast("long").as("b"))
      .as[(Long, Long)].collect().toMap
    val keys = (1L to 199L).filter(k => bucketOf(k) != 3L).take(40)
    assert(keys.map(bucketOf).toSet == Set(0L, 1L, 2L))
    val missing = (1L to 199L).find(k => bucketOf(k) == 3L).get
    GraftCdcLog.append(root, "t", 0,
      keys.map(k => env("r", k, s"n$k", 100 + k)))
    runPipe(root, "t", group, ck) // nBuckets=4 (runPipe)

    def read() = spark.read.format("graft-table").option("path", group).load()

    // unconstrained read: every live bucket's files
    assert(read().select($"id").as[Long].collect().toSet == keys.toSet)
    val (allFiles, allBuckets) =
      (GraftTableReadStats.lastFiles, GraftTableReadStats.lastBuckets)
    assert(allBuckets == 3 && allFiles >= 3)

    // keyed lookup: PushedFilters in the plan, ONE bucket's files read
    val target = keys.find(_ == 7L).getOrElse(keys.head)
    val one = read().filter($"id" === target).select($"id", $"name")
    val plan = one.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(id,"),
      plan.take(1200))
    assert(one.as[(Long, String)].collect().toSeq ==
      Seq((target, s"n$target")))
    assert(GraftTableReadStats.lastBuckets == 1,
      s"expected 1 bucket, read ${GraftTableReadStats.lastBuckets}")
    assert(GraftTableReadStats.lastFiles < allFiles)

    // IN over keys of two distinct buckets: exactly those buckets
    val twoBuckets = keys.groupBy(bucketOf).values.map(_.head).take(2).toSeq
    assert(read().filter($"id".isin(twoBuckets: _*)).count() == 2)
    assert(GraftTableReadStats.lastBuckets ==
      twoBuckets.map(bucketOf).distinct.size)

    // a key routed to the EMPTY bucket: zero files selected, empty result
    // (the valid-empty path, not a resolution failure)
    assert(read().filter($"id" === missing).count() == 0L)
    assert(GraftTableReadStats.lastBuckets == 0 &&
      GraftTableReadStats.lastFiles == 0)

    // a range predicate pushes (inner parquet row-group stats) but pins
    // no bucket: every live bucket stays in the file list
    val range = read().filter($"id" > lit(0L))
    val rplan = range.queryExecution.executedPlan.toString()
    assert(rplan.contains("PushedFilters:") &&
      rplan.contains("GreaterThan(id,"), rplan.take(1200))
    assert(range.count() == keys.size.toLong)
    assert(GraftTableReadStats.lastBuckets == 3)
  }

  test("pushdown residues equal Spark's own pmod(hash(key), n); unmarked " +
      "or foreign-scheme layouts are never pruned; Or/And compose") {
    import org.apache.spark.sql.sources.{And, EqualTo, In, IsNotNull, Or}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.streaming.BucketScheme
    val tmp = Files.createTempDirectory("graft-push-unit").toString
    val n = 16
    BucketScheme.ensure(s"$tmp/snapshot", BucketScheme.Murmur3Pmod, n)
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", tmp))
    val schema = StructType(Seq(StructField("id", LongType)))
    def bk(fs: org.apache.spark.sql.sources.Filter*) =
      GraftTablePushdown.buckets(opts, schema, fs.toArray)

    // the driver-side residue must equal what the MERGE computed
    val expected: Map[Long, Long] = spark.range(1, 50)
      .select($"id", pmod(hash($"id"), lit(n)).cast("long").as("b"))
      .as[(Long, Long)].collect().toMap
    (1L to 49L).foreach { k =>
      assert(bk(EqualTo("id", k)) == Some(Seq(expected(k))), s"key $k")
    }
    // composition: IN unions, Or unions, And intersects, IsNotNull is
    // unconstrained (and must not defeat the constrained conjunct)
    assert(bk(In("id", Array(1L, 2L, 3L))) ==
      Some(Seq(1L, 2L, 3L).map(expected).distinct.sorted))
    assert(bk(Or(EqualTo("id", 1L), EqualTo("id", 2L))) ==
      Some(Seq(1L, 2L).map(expected).distinct.sorted))
    assert(bk(IsNotNull("id"), EqualTo("id", 5L)) ==
      Some(Seq(expected(5L))))
    assert(bk(And(IsNotNull("id"), EqualTo("id", 5L))) ==
      Some(Seq(expected(5L))))
    assert(bk(IsNotNull("id")) == None)
    // contradictory equalities intersect to zero buckets (when the two
    // keys live in different buckets)
    val (ka, kb) = (1L to 49L).flatMap(a => (1L to 49L).collect {
      case b if expected(a) != expected(b) => (a, b) }).head
    assert(bk(EqualTo("id", ka), EqualTo("id", kb)) == Some(Seq.empty))

    // unmarked table dir: no pruning, never a guess
    val bare = Files.createTempDirectory("graft-push-bare").toString
    val bareOpts = new CaseInsensitiveStringMap(java.util.Map.of("path", bare))
    assert(GraftTablePushdown.buckets(bareOpts, schema,
      Array(EqualTo("id", 1L))) == None)
    // foreign scheme id: refuse likewise
    val alien = Files.createTempDirectory("graft-push-alien").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$alien/snapshot"))
    Files.write(java.nio.file.Paths.get(s"$alien/snapshot/_bucket_scheme"),
      "xxhash64-pmod/16\n".getBytes("UTF-8"))
    val alienOpts =
      new CaseInsensitiveStringMap(java.util.Map.of("path", alien))
    assert(GraftTablePushdown.buckets(alienOpts, schema,
      Array(EqualTo("id", 1L))) == None)

    // the bucketing key comes from the MARKER, never the reader's option:
    // a matching option is redundant-but-fine; a conflicting one refuses
    // (computing residues from the wrong column would silently drop
    // matching files); a legacy two-field marker exposes no key → no
    // key-derived pruning even with an option present
    val okOpts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", tmp, "bucketKey", "id"))
    assert(GraftTablePushdown.buckets(okOpts, schema,
      Array(EqualTo("id", 5L))) == Some(Seq(expected(5L))))
    val badOpts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", tmp, "bucketKey", "uid"))
    val e = intercept[IllegalArgumentException] {
      GraftTablePushdown.buckets(badOpts, schema, Array(EqualTo("uid", 5L)))
    }
    assert(e.getMessage.contains("stamped"))
    val legacy = Files.createTempDirectory("graft-push-legacy").toString
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$legacy/snapshot"))
    Files.write(java.nio.file.Paths.get(s"$legacy/snapshot/_bucket_scheme"),
      s"${BucketScheme.Murmur3Pmod}/16\n".getBytes("UTF-8"))
    val legacyOpts = new CaseInsensitiveStringMap(
      java.util.Map.of("path", legacy, "bucketKey", "id"))
    assert(GraftTablePushdown.buckets(legacyOpts, schema,
      Array(EqualTo("id", 1L))) == None)
    // ...but a direct bucket-column predicate still prunes on legacy
    // layouts: its residues are directory values, not hash-derived
    assert(GraftTablePushdown.buckets(legacyOpts, schema,
      Array(EqualTo("bucket", java.lang.Long.valueOf(3L)))) == Some(Seq(3L)))
  }
}
