package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** Format-parameterized source/sink surface — the engine's answer to the
  * reference's connection gateway (postgres.py:13-62): where the reference
  * hard-wires DuckDB-ATTACH-Postgres, sources here are declarative format +
  * options, so parquet/json/csv/jdbc/kafka are one code path.
  *
  * JDBC (the production replica target, S4) is code-complete but not
  * exercisable offline; `jdbcOptions` documents the partitioned-read
  * contract that matters at scale: partitionColumn/num bounds turn a single
  * remote cursor into parallel range scans.
  */
object Sources {

  def read(spark: SparkSession, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** Partitioned-parallel JDBC read options (prod variant of S4). */
  def jdbcOptions(
      url: String, table: String, user: String, password: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): Map[String, String] = Map(
    "url" -> url, "dbtable" -> table, "user" -> user, "password" -> password,
    "partitionColumn" -> partitionColumn,
    "lowerBound" -> lowerBound.toString, "upperBound" -> upperBound.toString,
    "numPartitions" -> numPartitions.toString)

  /** Write a snapshot partitioned by a key expression — the layout that
    * makes downstream per-key reads partition-pruned at scale. */
  def writePartitioned(df: DataFrame, path: String, byCol: String,
      format: String = "parquet"): Unit =
    df.write.format(format).mode("overwrite").partitionBy(byCol).save(path)
}
