package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("property: saltedJoin equals the plain join on random skewed data") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(Gen.choose(0L, 10000L), Gen.choose(50, 300)) { (seed, n) =>
      val rnd = new scala.util.Random(seed)
      // 80% of big-side rows land on one hot key
      val big = (0 until n).map { i =>
        val k = if (rnd.nextDouble() < 0.8) 0L else rnd.nextInt(10).toLong
        (k, i.toLong)
      }.toDF("bk", "payload")
      val small = (0L until 10L).map(k => (k, s"dim$k")).toDF("sk", "dim")
      val salted = SaltedAgg.saltedJoin(big, small, col("bk"), col("sk"), 8)
        .select("bk", "payload", "dim").as[(Long, Long, String)].collect().sorted.toSeq
      val plain = big.join(small, col("bk") === col("sk"))
        .select("bk", "payload", "dim").as[(Long, Long, String)].collect().sorted.toSeq
      salted == plain
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(20))
    assert(res.passed, res.status.toString)
  }

  test("degenerate skew: opt-in ordinal salt spreads fully-identical hot-key rows") {
    // Default content-hash salting is recompute-deterministic but sends
    // identical rows to ONE bucket; spreadIdenticalRows opts into the
    // ordinal-mixed salt (behind a localCheckpoint barrier). 10k identical
    // rows over 8 buckets: counts stay exact and the spread is real.
    val big = spark.range(10000).select(lit(0L).as("bk"), lit(7L).as("payload"))
    val small = Seq((0L, "dim0")).toDF("sk", "dim")
    val joined = SaltedAgg.saltedJoin(big, small, col("bk"), col("sk"), 8,
      spreadIdenticalRows = true)
    assert(joined.count() == 10000L)
    val spread = SaltedAgg.sumCountByKey(big, col("bk"), 8,
        spreadIdenticalRows = true)
      .as[(Long, Long)].collect().toMap
    assert(spread(0L) == 10000L) // exact count preserved
    // observe the distribution by re-deriving the salt the same way the
    // operator does: count distinct salt buckets actually populated
    val perBucket = big
      .withColumn("_salt", pmod(xxhash64(struct(col("bk"), col("payload")),
        monotonically_increasing_id()), lit(8L)))
      .groupBy("_salt").count().as[(Long, Long)].collect()
    assert(perBucket.length > 1, s"identical rows all landed in one bucket: ${perBucket.toSeq}")
    assert(perBucket.map(_._2).max < 10000L)
  }

  test("salt determinism contract: default path has no barrier and no ordinal; opt-in is barriered") {
    // The default salt must be a pure function of row content (safe under
    // shuffle-map recompute); the ordinal variant is only safe because the
    // salted frame is pinned by localCheckpoint (lineage truncated → a lost
    // block fails loudly instead of re-salting). Pin both shapes.
    val big = spark.range(100).select(col("id").as("bk"), col("id").as("payload"))
    val small = Seq((0L, "dim0")).toDF("sk", "dim")
    val plainPlan = SaltedAgg.saltedJoin(big, small, col("bk"), col("sk"), 4)
      .queryExecution.optimizedPlan.toString
    assert(!plainPlan.contains("monotonically_increasing_id"), plainPlan)
    assert(!plainPlan.contains("LogicalRDD"), plainPlan)
    val barriered = SaltedAgg.saltedJoin(big, small, col("bk"), col("sk"), 4,
      spreadIdenticalRows = true).queryExecution.optimizedPlan.toString
    // localCheckpoint materializes the salted side: it scans a LogicalRDD
    // with truncated lineage (no salt expression left to recompute)
    assert(barriered.contains("LogicalRDD"), barriered)
  }

  test("AQE splits a skewed sort-merge join when thresholds are hit") {
    // one hot key with ~200k rows vs 9 cold keys — force SMJ (no broadcast)
    // and set the skew thresholds low enough that AQE must split the hot
    // partition. This pins that our session config doesn't break AQE's
    // skew handling (the automatic path; saltedJoin is the manual one).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(200000)
        .select((col("id") % 10).as("bk"), col("id").as("payload"))
        .withColumn("bk", when(col("bk") < 8, lit(0L)).otherwise(col("bk")))
      val right = spark.range(100000)
        .select((col("id") % 10).as("rk"), col("id").as("rv"))
        .withColumn("rk", when(col("rk") < 8, lit(0L)).otherwise(col("rk")))
      val joined = big.join(right, col("bk") === col("rk"))
        .agg(count(lit(1)).as("n"))
      val n = joined.collect().head.getLong(0) // collect() finalizes THIS plan (head() would plan a separate limit)
      // hot key 0: 160k × 80k pairs + cold keys 8,9: 20k×10k each
      assert(n == 160000L * 80000L + 2L * 20000L * 10000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
