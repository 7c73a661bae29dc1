package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev loop: run a subset of SparkEntry.queries against an sf dir and dump
  * parquet + the matching oracle_sql.json subset, so tools/check.py can
  * verify just those queries. Usage:
  *   runMain graft.tools.RunOne <sfDir> <outDir> <name> [name...]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oracles = names.flatMap(n =>
      graft.SparkEntry.oracleSql.get(n).map(n -> _))
    for (n <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$n")
      println(f"[runone] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // same full control-char escaping discipline as Verify/Bench — a \r
    // (or any other <0x20 char) in an oracle string must not emit
    // invalid JSON
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracles.map { case (n, s) => s"${q(n)}: ${q(s)}" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
