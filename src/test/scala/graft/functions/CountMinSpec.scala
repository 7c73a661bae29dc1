package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min contract: never undercounts, exact when collision-free,
  * deterministic regardless of partitioning (the property that buys the
  * full-value oracle `q_cms_custkey` — unlike Misra-Gries, whose counter
  * values are reduce-order-dependent and oracle-pinned by booleans only). */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def jvmSketch(d: Int, w: Int, parts: Seq[Seq[Long]]): Seq[Long] = {
    val agg = new CountMinAggregator(d, w)
    agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge))
  }

  private def estimate(sk: Seq[Long], x: Long, d: Int, w: Int): Long =
    (0 until d).map(j => sk(j * w + CountMin.bucket(x, j, w))).min

  test("hand case: est >= exact for every key; exact when a row is collision-free") {
    val stream = Seq(1L, 1L, 1L, 2L, 2L, 3L, 7L, 7L, 7L, 7L)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = jvmSketch(4, 64, Seq(stream))
    exact.foreach { case (x, c) =>
      val est = estimate(sk, x, 4, 64)
      assert(est >= c, s"undercount for $x: $est < $c")
      // 4 distinct keys in 4x64 buckets: some row separates every pair,
      // so the min over rows recovers the exact count here
      assert(est == c, s"collision-free stream must estimate exactly: $x")
    }
    // total mass per row is the stream length — sums never lose an event
    (0 until 4).foreach { j =>
      assert(sk.slice(j * 64, (j + 1) * 64).sum == stream.size)
    }
  }

  test("property: arbitrary split/merge orders produce the identical sketch (sums commute)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val streamGen = Gen.listOf(Gen.choose(0L, 500L))
    val cutsGen = Gen.choose(1, 5)
    val prop = forAll(streamGen, cutsGen) { (xs, nCuts) =>
      val whole = jvmSketch(2, 16, Seq(xs))
      val parts = if (xs.isEmpty) Seq(Seq.empty[Long])
        else xs.grouped(math.max(1, xs.size / nCuts)).toSeq
      jvmSketch(2, 16, parts) == whole &&
        jvmSketch(2, 16, parts.reverse) == whole
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(res.passed, res.status.toString)
  }

  test("distributed: repartitioning does not change a single counter") {
    val keys = (0L until 5000L).map(i => i % 97)
    val sk1 = keys.toDF("k").repartition(1)
      .agg(CountMin.udafFn(4, 64)($"k")).as[Seq[Long]].head()
    val sk32 = keys.toDF("k").repartition(32)
      .agg(CountMin.udafFn(4, 64)($"k")).as[Seq[Long]].head()
    assert(sk1 == sk32)
    assert(sk1 == jvmSketch(4, 64, Seq(keys)))
  }

  test("estimateCol matches the JVM estimate on the distributed sketch") {
    val keys = (0L until 2000L).map(i => i % 41)
    val skDf = keys.toDF("k").agg(CountMin.udafFn(4, 64)($"k").as("sk"))
    val sk = skDf.as[Seq[Long]].head()
    val got = keys.distinct.toDF("k").crossJoin(broadcast(skDf))
      .select($"k", CountMin.estimateCol($"sk", $"k", 4, 64).as("est"))
      .as[(Long, Long)].collect().toMap
    keys.distinct.foreach { x =>
      assert(got(x) == estimate(sk, x, 4, 64), s"key $x")
    }
  }

  test("streaming: complete-mode sketch over the stream prefix equals the batch sketch exactly") {
    // the pure-sum buffer makes the streaming aggregate's state identical
    // to a batch recompute of the prefix — no approximation drift across
    // micro-batches, the property a monitoring pipeline relies on when it
    // reads the sketch mid-stream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val es = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = es.toDF().toDF("k")
      .agg(CountMin.udafFn(4, 64)($"k").as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_stream").start()
    try {
      val b1 = (0L until 500L).map(_ % 13)
      es.addData(b1: _*); q.processAllAvailable()
      assert(spark.table("cms_stream").as[Seq[Long]].head()
        == jvmSketch(4, 64, Seq(b1)))
      val b2 = (0L until 300L).map(_ % 7)
      es.addData(b2: _*); q.processAllAvailable()
      assert(spark.table("cms_stream").as[Seq[Long]].head()
        == jvmSketch(4, 64, Seq(b1, b2)))
    } finally q.stop()
  }

  test("SQL surface: count_min_4x64 registers and estimates never undercount") {
    CountMin.registerSql(spark)
    (0L until 300L).map(i => i % 7).toDF("k").createOrReplaceTempView("cms_in")
    val sk = spark.sql("SELECT count_min_4x64(k) FROM cms_in")
      .as[Seq[Long]].head()
    (0L until 7L).foreach { x =>
      assert(estimate(sk, x, 4, 64) >= 300 / 7)
    }
  }
}
