package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    // stage decomposition of the trained-graph build (the shared drive's
    // exact parameters — trainedGraphShared), with onStage printed
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-scratch-ivf")
    val t0 = System.nanoTime()
    val edges = graft.operators.SimilarityIvf.knnGraphHierarchical(
      vecs, 4, 16, 8, s"$tmp/idx", coarseProbe = 4,
      coarseTrainIters = 0, fineTrainIters = 2, samplePerCell = 8,
      probeMassQuota = 0, fineCellCapFactor = 2.0,
      onStage = (k, v) => println(f"== stage $k: $v%.3f"))
    edges.count()
    println(f"== total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    edges.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    spark.stop()
  }
}
