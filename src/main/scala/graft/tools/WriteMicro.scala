package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark of the staged bucket write's components (CdcProfile
  * shows stage.write ≈ 1.5-1.9 s per call at sf0.1 — the per-batch fixed
  * cost the r12/r13 verdicts gate): time a 15k-row write under different
  * shapes to attribute the wall between the exchange, the dynamic
  * partitionBy, the 64 parquet file inits, and the committer.
  *
  * Usage: runMain graft.tools.WriteMicro
  */
object WriteMicro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val df = spark.range(15000)
      .withColumn("bucket", pmod(hash(col("id")), lit(64)).cast("long"))
      .withColumn("name", concat(lit("cust_"), col("id")))
      .withColumn("acctbal", col("id") * 1.5)
      .localCheckpoint(true)

    def timed(label: String)(f: String => Unit): Unit = {
      // warm once, then 3 measured runs
      (0 until 4).foreach { i =>
        val tmp = java.nio.file.Files.createTempDirectory("wm").toString
        val t0 = System.nanoTime()
        f(tmp)
        val sec = (System.nanoTime() - t0) / 1e9
        if (i > 0) println(f"  $label%-46s $sec%6.3f s")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
    }

    timed("repartition(64,id) + partitionBy(bucket) v1") { tmp =>
      df.repartition(64, col("id")).write.partitionBy("bucket")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(64,id) + partitionBy(bucket) v2") { tmp =>
      df.repartition(64, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(64,id), no partitionBy, v2") { tmp =>
      df.repartition(64, col("id")).write
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("coalesce-free flat write (32 parts) v2") { tmp =>
      df.write
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(16,id) + partitionBy(bucket) v2") { tmp =>
      df.repartition(16, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(32,id) + partitionBy(bucket) v2") { tmp =>
      df.repartition(32, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("repartition(32,id) + partitionBy, v2, AQE off") { tmp =>
      df.repartition(32, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    timed("repartition(4,id) + partitionBy(bucket) v2") { tmp =>
      df.repartition(4, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(8,id) + partitionBy(bucket) v2") { tmp =>
      df.repartition(8, col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    timed("repartition(id) AQE-sized + partitionBy v2") { tmp =>
      df.repartition(col("id")).write.partitionBy("bucket")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .mode("overwrite").parquet(tmp)
    }
    spark.stop()
  }
}
