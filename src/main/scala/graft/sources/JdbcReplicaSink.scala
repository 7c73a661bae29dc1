package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JDBC replica sink — the LIVE half of S4/S6–S9: apply a decoded CDC
  * batch to a real SQL database over JDBC, the reference's
  * create-table + INSERT/UPDATE/DELETE replay
  * (postgres.py:100-107, 115-224) re-expressed for batch scale.
  *
  * Shape: the batch first compacts to ONE net change per key (the
  * [[graft.cdc.Compaction]] ranking, deletes retained), then executors
  * apply their partitions through batched PreparedStatements inside a
  * per-partition transaction. Per key the apply is DELETE-then-INSERT —
  * the portable upsert (Postgres would use INSERT .. ON CONFLICT, the
  * dialect-specific fast path; DELETE+INSERT is what every JDBC engine
  * accepts and what keeps REPLAY idempotent: re-applying a batch
  * converges to the same replica state, the at-least-once contract every
  * sink in this repo honors). Keys are unique post-compaction, so
  * partitions never contend on a row.
  *
  * At scale: compaction is one shuffle on the key; the JDBC write is
  * numPartitions parallel connections × batched statements — the same
  * parallel-range discipline as the partitioned READ options
  * ([[Sources.jdbcOptions]]), bounded by what the target database
  * accepts. Proven live against embedded Derby (the sandbox's real JDBC
  * engine) by `JdbcReplicaSpec`; the URL is the only Postgres-vs-Derby
  * difference the code sees.
  */
object JdbcReplicaSink {

  /** Net change per key — the latest (ts_ms, lsn) winner INCLUDING
    * deletes (unlike Compaction.latestState, which emits the surviving
    * snapshot): (op, id, after-image columns; nulls for 'd'). Shares
    * [[graft.cdc.Compaction.latestChangePerKey]]'s ranking so the live
    * replica and the parquet snapshot can never diverge on a tie-break. */
  def netChanges(decoded: DataFrame): DataFrame =
    graft.cdc.Compaction.latestChangePerKey(decoded)
      .select(col("op"), col("_key").as("id"),
        col("after.name").as("name"),
        col("after.nationkey").as("nationkey"),
        col("after.acctbal").as("acctbal"),
        col("after.mktsegment").as("mktsegment"))

  /** Already-exists SQLStates across the engines this sink targets:
    * Derby X0Y32 (no IF NOT EXISTS), Postgres 42P07 (duplicate_table),
    * SQL-standard/MySQL-family 42S01 — the converged create-if-absent
    * case on each. */
  private val TableExistsStates = Set("X0Y32", "42P07", "42S01")

  private[sources] def connect(url: String,
      props: java.util.Properties): java.sql.Connection =
    java.sql.DriverManager.getConnection(url, props)

  /** Optional credentials (the partitioned READ path takes them the same
    * way; embedding them in the URL also works for engines that allow it). */
  def connectionProps(user: Option[String] = None,
      password: Option[String] = None): java.util.Properties = {
    val p = new java.util.Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  /** S6: replica DDL init, create-if-absent (the reference's
    * create_customers_table). */
  def ensureTable(url: String, table: String,
      props: java.util.Properties = new java.util.Properties()): Unit = {
    val conn = connect(url, props)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $table (
           |  id BIGINT NOT NULL PRIMARY KEY,
           |  name VARCHAR(200),
           |  nationkey INT,
           |  acctbal DOUBLE,
           |  mktsegment VARCHAR(40))""".stripMargin)
      catch {
        case e: java.sql.SQLException
            if TableExistsStates.contains(e.getSQLState) => // exists
      }
      finally st.close()
    } finally conn.close()
  }

  /** S7–S9 live: apply the net changes to the replica. One transaction
    * per partition, statements batched `batchSize` at a time, deletes
    * flushed before inserts inside each flush (keys are unique
    * post-compaction, so flush order across keys is immaterial). */
  def applyNetChanges(net: DataFrame, url: String, table: String,
      batchSize: Int = 500, user: Option[String] = None,
      password: Option[String] = None): Unit = {
    net.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = connect(url, connectionProps(user, password))
        var applied = false
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(
            s"DELETE FROM $table WHERE id = ?")
          val ins = conn.prepareStatement(
            s"INSERT INTO $table (id, name, nationkey, acctbal, " +
              "mktsegment) VALUES (?, ?, ?, ?, ?)")
          var pending = 0
          def flush(): Unit = {
            del.executeBatch() // upsert = delete-then-insert, per flush
            ins.executeBatch()
            pending = 0
          }
          rows.foreach { r =>
            val id = r.getLong(r.fieldIndex("id"))
            del.setLong(1, id)
            del.addBatch()
            if (r.getString(r.fieldIndex("op")) != "d") {
              ins.setLong(1, id)
              ins.setString(2, r.getString(r.fieldIndex("name")))
              if (r.isNullAt(r.fieldIndex("nationkey"))) ins.setNull(3, java.sql.Types.INTEGER)
              else ins.setInt(3, r.getInt(r.fieldIndex("nationkey")))
              if (r.isNullAt(r.fieldIndex("acctbal"))) ins.setNull(4, java.sql.Types.DOUBLE)
              else ins.setDouble(4, r.getDouble(r.fieldIndex("acctbal")))
              ins.setString(5, r.getString(r.fieldIndex("mktsegment")))
              ins.addBatch()
            }
            pending += 1
            if (pending >= batchSize) flush()
          }
          flush()
          conn.commit() // T7: commit-after-apply, per partition
          applied = true
        } finally {
          // A failed apply must roll back BEFORE close: Derby refuses to
          // close a connection with an active transaction (25001), which
          // would mask the real DML failure with the close error and
          // leave row locks held against the task retry.
          if (!applied) {
            try conn.rollback()
            catch { case _: java.sql.SQLException => () }
          }
          conn.close()
        }
      }
    }
  }

  /** The full live replica pipeline: DDL init + compact + apply. */
  def applyBatch(decoded: DataFrame, url: String, table: String): Unit = {
    ensureTable(url, table)
    applyNetChanges(netChanges(decoded), url, table)
  }
}
