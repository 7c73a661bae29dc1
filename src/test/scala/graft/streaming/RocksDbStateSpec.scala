package graft.streaming

import graft.SparkSpec
import graft.cdc.Envelope
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.Files

/** The 100 TB state claim, executed: every stateful streaming shape in the
  * engine (flatMapGroupsWithState upsert, stream-stream interval join,
  * dedup-within-watermark) runs under BOTH state-store providers and must
  * produce identical results. RocksDB engagement is asserted, not assumed:
  * provider-specific progress metrics and the RocksDB checkpoint layout
  * (zip/changelog uploads instead of the HDFS provider's .delta files).
  * Config contract: [[StateStores.rocksDbConf]].
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private def env(op: String, id: Long, name: String, ts: Long): String = {
    val row = s"""{"id":$id,"name":"$name","nationkey":1,"acctbal":10.0,"mktsegment":"X"}"""
    val before = if (op == "d") row else "null"
    val after = if (op == "d") "null" else row
    s"""{"schema":null,"payload":{"before":$before,"after":$after,"source":{"table":"customers","lsn":$ts},"op":"$op","ts_ms":$ts}}"""
  }

  /** Run `body` with the given state-store session confs, restoring after. */
  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** All `customMetrics` keys across every progress the query reported. */
  private def stateMetricKeys(q: StreamingQuery): Set[String] = {
    import scala.jdk.CollectionConverters._
    q.recentProgress.toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().asScala)
      .toSet
  }

  /** State files written under a checkpoint, by extension. */
  private def stateFileExts(checkpointDir: String): Set[String] = {
    val state = new java.io.File(s"$checkpointDir/state")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    if (!state.exists()) Set.empty
    else walk(state).map(_.getName).map { n =>
      val i = n.lastIndexOf('.'); if (i >= 0) n.substring(i) else n
    }.toSet
  }

  /** Stateful upsert pipeline under the session's current provider;
    * returns (final emitted state per key, metric keys, state file exts). */
  private def runUpsert(qn: String): (Map[Long, (String, Boolean)], Set[String], Set[String]) = {
    implicit val sc = spark.sqlContext
    val ck = Files.createTempDirectory(s"graft-rocks-$qn").toString
    val stream = MemoryStream[String]
    val q = StatefulUpsert.run(Envelope.decode(stream.toDF()))
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation", ck)
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    stream.addData(env("c", 1, "v1", 100), env("c", 2, "w1", 110))
    q.processAllAvailable()
    stream.addData(env("u", 1, "v2", 200), env("d", 2, "w1", 210),
      env("c", 3, "x1", 300))
    q.processAllAvailable()
    stream.addData(env("c", 1, "v1", 100)) // stale replay must not regress
    q.processAllAvailable()
    val metrics = stateMetricKeys(q)
    q.stop()
    val rows = spark.table(qn)
      .select($"id", $"name", $"deleted", $"ts_ms")
      .as[(Long, String, Boolean, Long)].collect()
    val latest = rows.groupBy(_._1).map { case (k, rs) =>
      val r = rs.maxBy(_._4); k -> ((r._2, r._3)) }
    (latest, metrics, stateFileExts(ck))
  }

  test("stateful upsert: identical results under HDFS and RocksDB providers; RocksDB engages") {
    val (hdfsRes, hdfsMetrics, hdfsExts) =
      withConfs(Map(StateStores.ProviderKey -> StateStores.HdfsProvider)) {
        runUpsert("rocks_upsert_hdfs")
      }
    val (rocksRes, rocksMetrics, rocksExts) =
      withConfs(StateStores.rocksDbConf) { runUpsert("rocks_upsert_rocksdb") }

    assert(rocksRes == hdfsRes, s"provider changed results: $rocksRes vs $hdfsRes")
    assert(rocksRes(1L) == (("v2", false)))
    assert(rocksRes(2L)._2, "key 2 must be marked deleted")

    // engagement, not configuration: RocksDB reports provider-specific
    // metrics and uploads zip/changelog files; HDFS writes .delta files.
    assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in progress: $rocksMetrics")
    assert(!hdfsMetrics.exists(_.toLowerCase.contains("rocksdb")), hdfsMetrics.toString)
    assert(hdfsExts.contains(".delta"), s"hdfs layout: $hdfsExts")
    assert(!rocksExts.contains(".delta") &&
      (rocksExts.contains(".zip") || rocksExts.contains(".changelog")),
      s"rocksdb layout: $rocksExts")
  }

  /** Stream-stream interval join under the current provider. */
  private def runIntervalJoin(qn: String): Set[(Long, Long)] = {
    implicit val sc = spark.sqlContext
    val vs = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    def df(m: MemoryStream[(Long, java.sql.Timestamp, Long, String)]) =
      m.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.viewClickJoin(df(vs), df(cs))
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    vs.addData((101L, ts(1), 1L, "view"), (102L, ts(5), 1L, "view"),
      (201L, ts(2), 2L, "view"))
    cs.addData((900L, ts(8), 1L, "click"))
    q.processAllAvailable()
    vs.addData((103L, ts(30), 1L, "view"))
    cs.addData((901L, ts(31), 1L, "click"))
    q.processAllAvailable()
    val metrics = stateMetricKeys(q)
    q.stop()
    if (qn.endsWith("rocksdb"))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")), metrics.toString)
    spark.table(qn).select($"click_id", $"view_id").as[(Long, Long)].collect().toSet
  }

  test("stream-stream interval join: RocksDB provider matches HDFS provider") {
    val hdfs = withConfs(Map(StateStores.ProviderKey -> StateStores.HdfsProvider)) {
      runIntervalJoin("rocks_join_hdfs")
    }
    val rocks = withConfs(StateStores.rocksDbConf) { runIntervalJoin("rocks_join_rocksdb") }
    assert(hdfs == Set((900L, 101L), (900L, 102L), (901L, 103L)))
    assert(rocks == hdfs)
  }

  /** Streaming dedup under the current provider. */
  private def runDedup(qn: String): Seq[Long] = {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStreams.dedupWithinWatermark(stream.toDF().toDF("ts", "event_id"))
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    stream.addData((t0, 1L), (t0, 2L), (t0, 1L))
    q.processAllAvailable()
    stream.addData((t0, 2L), (t0, 3L))
    q.processAllAvailable()
    val metrics = stateMetricKeys(q)
    q.stop()
    if (qn.endsWith("rocksdb"))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")), metrics.toString)
    spark.table(qn).select($"event_id").as[Long].collect().sorted.toSeq
  }

  test("streaming dedup within watermark: RocksDB provider matches HDFS provider") {
    val hdfs = withConfs(Map(StateStores.ProviderKey -> StateStores.HdfsProvider)) {
      runDedup("rocks_dedup_hdfs")
    }
    val rocks = withConfs(StateStores.rocksDbConf) { runDedup("rocks_dedup_rocksdb") }
    assert(hdfs == Seq(1L, 2L, 3L))
    assert(rocks == hdfs)
  }
}
