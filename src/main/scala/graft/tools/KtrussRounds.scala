package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints the peel round count of graph_ktruss per sf dir (sizes the
  * unrolled-generation oracle). */
object KtrussRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val df = graft.SparkEntry.queries("graph_ktruss")(spark, dir)
      val maxT = df.agg(org.apache.spark.sql.functions.max("trussness"))
        .head().getInt(0)
      println(s"== $dir rounds=${graft.operators.Graph.lastKtrussRounds} maxT=$maxT")
    }
    spark.stop()
  }
}
