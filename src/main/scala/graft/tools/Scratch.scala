package graft.tools
import org.apache.spark.sql.SparkSession
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
    for (n <- args) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t0 = System.nanoTime()
      df.count()
      println(s"== $n first: ${(System.nanoTime()-t0)/1e9}")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(s"== $n second: ${(System.nanoTime()-t1)/1e9}")
      df.explain("formatted")
      println("== FINAL PLAN ==")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
