package graft.tools

import graft.cdc.Envelope
import graft.streaming.Scd2Stream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale demonstration for the bucketed-SCD2 claim (SCALE.md): a small
  * micro-batch merged into a LARGE history must cost proportional to the
  * touched buckets, not the history size. Build a history of N versions
  * from duplicated customer change logs, then merge a single-key batch
  * with (a) the full-rewrite merge and (b) the bucketed merge, and report
  * wall times and rewritten-file counts at each history multiple.
  *
  * Usage: runMain graft.tools.Scd2Demo <sfDir> [multiples e.g. 1,4,16]
  */
object Scd2Demo {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,4,16")
      .split(',').map(_.trim.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def rawEvents(mult: Int) = {
      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      (0 until mult).map { k =>
        cust.select(
          (col("c_custkey") + lit(k * Stride)).as("id"),
          col("c_name").as("name"), col("c_nationkey").as("nationkey"),
          col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment"))
      }.reduce(_ unionByName _)
    }

    def envJson(mult: Int) = rawEvents(mult)
      .select(concat(lit("""{"schema":null,"payload":{"before":null,"after":"""),
        to_json(struct(col("id"), col("name"), col("nationkey"),
          col("acctbal"), col("mktsegment"))),
        lit(""","source":{"table":"customers","lsn":1},"op":"r","ts_ms":"""),
        (lit(1000000L) + col("id")).cast("string"),
        lit("}}")).as("value"))

    val oneKeyBatch = Seq(
      """{"schema":null,"payload":{"before":null,"after":{"id":1,"name":"upd","nationkey":1,"acctbal":1.0,"mktsegment":"X"},"source":{"table":"customers","lsn":2},"op":"u","ts_ms":9000000}}""")

    mults.foreach { m =>
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory(s"scd2demo$m").toString
      val seed = Envelope.decode(envJson(m).select(col("value")))
      // seed both history layouts from the same base log
      Scd2Stream.applyBatch(seed, s"$tmp/flat")
      Scd2Stream.applyBatchBucketed(seed, s"$tmp/bkt")
      // the transactional dual sink maintains snapshot + history together
      graft.streaming.DualSink.applyBatch(seed, s"$tmp/group")
      val batch = Envelope.decode(oneKeyBatch.toDF("value"))
      val (_, tFlat) = timed(Scd2Stream.applyBatch(batch, s"$tmp/flat"))
      val (_, tBkt) = timed(Scd2Stream.applyBatchBucketed(batch, s"$tmp/bkt"))
      val (_, tTxn) = timed(
        graft.streaming.DualSink.applyBatch(batch, s"$tmp/group"))
      val histRows = spark.read.parquet(s"$tmp/flat").count()
      println(f"mult=x$m%-3d history=$histRows%8d rows   " +
        f"full-rewrite=$tFlat%6.2f s   bucketed=$tBkt%6.2f s   " +
        f"dual-txn=$tTxn%6.2f s (both tables)")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    spark.stop()
  }
}
