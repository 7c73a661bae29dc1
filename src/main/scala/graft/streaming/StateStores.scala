package graft.streaming

/** State-store provider contract for stateful streaming at scale.
  *
  * The default HDFSBackedStateStoreProvider keeps every store's working set
  * as an in-heap map — at 100 TB of keyed state it is the first thing that
  * dies (executor OOM long before shuffle or sink limits). The production
  * contract for the stateful operators in this package (StatefulUpsert's
  * flatMapGroupsWithState, the stream-stream interval join, streaming
  * dedup, windowed aggregates) is RocksDB-backed state:
  * native off-heap working set, spill-to-disk, incremental checkpoints.
  *
  * `rocksdbjni` ships with the Spark distribution (verified against
  * /opt/spark/jars), so this is a pure-config swap — no code change in any
  * operator. `RocksDbStateSpec` runs the stateful suite under BOTH
  * providers and asserts identical results plus real RocksDB engagement
  * (provider-specific metrics and on-disk checkpoint layout), the same way
  * `SourceContractSpec` pins the Kafka option maps.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The full session-conf contract for RocksDB state at scale. Keys are
    * read when a streaming query STARTS (set them before `.start()`).
    *
    *  - changelog checkpointing makes the per-batch durable upload
    *    O(changed keys) instead of O(store) — the difference between a
    *    bounded commit and re-uploading a snapshot of the whole state
    *    every batch once state no longer fits a snapshot budget.
    *  - bounded memory usage caps the TOTAL RocksDB block-cache +
    *    memtable footprint across all store instances on an executor, so
    *    state memory is a fixed budget line instead of
    *    #partitions × per-store default.
    */
  def rocksDbConf: Map[String, String] = Map(
    ProviderKey -> RocksDbProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true")
}
