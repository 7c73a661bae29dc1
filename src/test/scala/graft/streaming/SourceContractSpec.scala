package graft.streaming

import graft.SparkSpec
import graft.sources.Sources

/** Pins the LIVE-source option contracts (S1/S2 Kafka, S4 JDBC) that the
  * offline sandbox can't execute: the option maps are pure functions, so
  * the exact wiring a deployment would hand to the connector is asserted
  * here byte-for-byte. This is the closest offline-reachable approximation
  * of the reference's live loop (consumer.py:28-49, postgres.py:13-62) —
  * the downstream decode→compact→sink chain is exercised for real via
  * MemoryStream in StreamingSpec.
  */
class SourceContractSpec extends SparkSpec {

  test("S1: subscribe-from-earliest option map, exactly") {
    assert(CdcStream.kafkaOptions("broker1:9092,broker2:9092", "cdc.public.users") ==
      Map(
        "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
        "subscribe" -> "cdc.public.users",
        "startingOffsets" -> "earliest"))
  }

  test("S1: commit handling is absent by design — checkpoint owns offsets") {
    val opts = CdcStream.kafkaOptions("b:9092", "t")
    // the reference sets enable.auto.commit=False and commits after apply;
    // in Spark that contract is the checkpoint dir, so NO consumer-commit
    // or group-management option may leak into the map
    assert(!opts.keys.exists(_.contains("commit")))
    assert(!opts.keys.exists(_.contains("group.id")))
  }

  test("S2: explicit same-offset-per-partition seek as startingOffsets JSON") {
    val json = CdcStream.startingOffsetsJson("cdc.public.users",
      Map(0 -> 0L, 1 -> 0L, 2 -> 0L))
    assert(json == """{"cdc.public.users":{"0":0,"1":0,"2":0}}""")
    assert(CdcStream.kafkaOptions("b:9092", "cdc.public.users", json)("startingOffsets") == json)
  }

  test("S2: offsets JSON is partition-sorted and supports sentinels") {
    // -2 = earliest, -1 = latest per the connector contract
    assert(CdcStream.startingOffsetsJson("t", Map(2 -> -1L, 0 -> -2L, 1 -> 5L)) ==
      """{"t":{"0":-2,"1":5,"2":-1}}""")
    assertThrows[IllegalArgumentException](
      CdcStream.startingOffsetsJson("t", Map.empty))
  }

  test("S2: startingOffsets JSON round-trips through Spark's JSON parser") {
    // the connector parses this with a JSON reader — pin that our builder
    // emits something a strict parser accepts and maps back to the offsets
    val json = CdcStream.startingOffsetsJson("a.b.c", Map(0 -> 42L, 3 -> -1L))
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS())
    val row = parsed.select("`a.b.c`.`0`", "`a.b.c`.`3`").head()
    assert(row.getLong(0) == 42L && row.getLong(1) == -1L)
  }

  test("S4: partitioned JDBC read option map, exactly") {
    assert(Sources.jdbcOptions(
      url = "jdbc:postgresql://pg:5432/db", table = "public.users",
      user = "u", password = "p",
      partitionColumn = "id", lowerBound = 1L, upperBound = 1000000L,
      numPartitions = 32) ==
      Map(
        "url" -> "jdbc:postgresql://pg:5432/db",
        "dbtable" -> "public.users",
        "user" -> "u", "password" -> "p",
        "partitionColumn" -> "id",
        "lowerBound" -> "1", "upperBound" -> "1000000",
        "numPartitions" -> "32"))
  }

  test("S4: jdbc option map drives a partition-parallel DataFrameReader plan") {
    // no live database offline — but the reader accepts the map and plans
    // numPartitions parallel range scans; instantiation must not require a
    // connection (load() would). Pin that the option set is the one Spark's
    // JDBC source actually recognizes by name.
    val recognized = Set("url", "dbtable", "user", "password",
      "partitionColumn", "lowerBound", "upperBound", "numPartitions",
      "fetchsize", "queryTimeout")
    val opts = Sources.jdbcOptions("jdbc:postgresql://h/d", "t", "u", "p", "id", 0L, 10L, 4)
    assert(opts.keySet.subsetOf(recognized))
  }
}
