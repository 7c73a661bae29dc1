package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the bloom filter's two correctness obligations:
  *  1. no false negatives across the full set → toBytes → mightContain
  *     round trip (long-word writer vs byte-wise prober bit layout);
  *  2. the probe Expression stays inside codegen (CODEGEN_ONLY factory
  *     mode would throw if BloomMightContain fell back to interpretation);
  * plus the lossless-prefilter property: the bloom-prefiltered
  * decontamination query returns exactly the plain query's rows.
  */
class BloomSpec extends SparkSpec {

  test("no false negatives across set/toBytes/mightContain") {
    val rnd = new scala.util.Random(42)
    val members = Array.fill(5000)(rnd.nextLong())
    val bits = new Array[Long](Bloom.DefaultBits / 64)
    members.foreach(h => BloomUtil.set(bits, h, Bloom.DefaultK))
    val bytes = BloomUtil.toBytes(bits)
    assert(members.forall(h =>
      BloomUtil.mightContain(bytes, h, Bloom.DefaultK)),
      "a set member probed absent — bit layout mismatch between writer and prober")
  }

  test("false positive rate stays near the designed ~1%") {
    val rnd = new scala.util.Random(7)
    val members = Array.fill(100000)(rnd.nextLong())
    val bits = new Array[Long](Bloom.DefaultBits / 64)
    members.foreach(h => BloomUtil.set(bits, h, Bloom.DefaultK))
    val bytes = BloomUtil.toBytes(bits)
    val memberSet = members.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(20000).toArray
    val fp = probes.count(h => BloomUtil.mightContain(bytes, h, Bloom.DefaultK))
    val rate = fp.toDouble / probes.length
    // theoretical (fill)^k ≈ 0.004 here; 0.02 leaves slack without letting
    // the degenerate one-degree-of-freedom regression (~0.097) back in.
    assert(rate < 0.02, s"false positive rate $rate too high for 2^20 bits / k=5 / 1e5 keys")
  }

  test("aggregator builds the same bloom distributed as locally") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hs = Seq.fill(2000)(rnd.nextLong())
    // distributed: udaf over 4 partitions → partial blooms OR-merged
    val agg = spark.createDataset(hs).repartition(4)
      .select(Bloom.bloomAgg(col("value")).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    // local reference
    val bits = new Array[Long](Bloom.DefaultBits / 64)
    hs.foreach(h => BloomUtil.set(bits, h, Bloom.DefaultK))
    assert(java.util.Arrays.equals(agg, BloomUtil.toBytes(bits)),
      "distributed OR-merge diverged from sequential set()")
  }

  test("probe runs under CODEGEN_ONLY — no interpreted fallback") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val hs = Seq(1L, 2L, 3L, 4L)
      val bits = new Array[Long](Bloom.DefaultBits / 64)
      hs.foreach(h => BloomUtil.set(bits, h, Bloom.DefaultK))
      val bytes = BloomUtil.toBytes(bits)
      val out = spark.createDataset(Seq(1L, 2L, 99L))
        .select(col("value"),
          Bloom.mightContain(lit(bytes), col("value")).as("hit"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(out(1L) && out(2L), "members must probe present")
      // 99 may be a false positive in principle; with 4 keys in 2^20 bits
      // the chance is ~(4*5/2^20)^5 ≈ 0 — assert definite absence.
      assert(!out(99L), "non-member probed present at near-zero load")
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      prev.foreach(spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("property: no false negatives for any geometry (m multiple of 64, any k)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val prop = forAll(
      Gen.choose(1, 64).map(_ * 64), // m: 64..4096 bits
      Gen.choose(1, 8),              // k
      Gen.choose(0L, Long.MaxValue), // seed
      Gen.choose(1, 200)             // n members
    ) { (m, k, seed, n) =>
      val rnd = new scala.util.Random(seed)
      val members = Array.fill(n)(rnd.nextLong())
      val bits = new Array[Long](m / 64)
      members.foreach(h => BloomUtil.set(bits, h, k))
      val bytes = BloomUtil.toBytes(bits)
      members.forall(h => BloomUtil.mightContain(bytes, h, k))
    }
    val res = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(res.passed, res.status.toString)
  }

  test("bloom_might_contain is SQL-callable via GraftExtensions") {
    val hs = Seq(10L, 20L)
    val bits = new Array[Long](Bloom.DefaultBits / 64)
    hs.foreach(h => BloomUtil.set(bits, h, Bloom.DefaultK))
    val hex = BloomUtil.toBytes(bits).map("%02x".format(_)).mkString
    val got = spark.sql(
      s"SELECT bloom_might_contain(unhex('$hex'), 10L), " +
        s"bloom_might_contain(unhex('$hex'), 999L, 5)").collect()(0)
    assert(got.getBoolean(0) && !got.getBoolean(1))
  }

  test("bloom-prefiltered decontamination equals the plain query") {
    val plain = TextAnalysis.decontamination.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val bloomed = TextAnalysis.decontaminationBloom.fn(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(bloomed == plain,
      "bloom prefilter changed the result — it must be lossless")
    assert(plain.nonEmpty, "decontamination produced no rows at sf0.001")
  }
}
