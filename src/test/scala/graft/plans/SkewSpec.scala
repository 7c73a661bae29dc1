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

  test("degenerate skew: fully-identical hot-key rows spread across salt buckets") {
    // content-hash-only salting sends identical rows to ONE bucket — the
    // per-row ordinal in the salt must spread them. 10k identical rows over
    // 8 buckets: every bucket should see some, and the max bucket should
    // hold well under the whole set.
    val big = spark.range(10000).select(lit(0L).as("bk"), lit(7L).as("payload"))
    val small = Seq((0L, "dim0")).toDF("sk", "dim")
    val joined = SaltedAgg.saltedJoin(big, small, col("bk"), col("sk"), 8)
    assert(joined.count() == 10000L)
    // observe the distribution by re-deriving the salt the same way the
    // operator does: count distinct salt buckets actually populated
    val spread = SaltedAgg.sumCountByKey(big, col("bk"), 8)
      .as[(Long, Long)].collect().toMap
    assert(spread(0L) == 10000L) // exact count preserved
    val perBucket = big
      .withColumn("_salt", pmod(xxhash64(struct(col("bk"), col("payload")),
        monotonically_increasing_id()), lit(8L)))
      .groupBy("_salt").count().as[(Long, Long)].collect()
    assert(perBucket.length > 1, s"identical rows all landed in one bucket: ${perBucket.toSeq}")
    assert(perBucket.map(_._2).max < 10000L)
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
