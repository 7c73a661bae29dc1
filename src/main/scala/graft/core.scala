package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered engine query: name, DataFrame builder over an sf dir, and
  * (when ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
  *
  * The driver hash-compares the builder's parquet output against the oracle
  * result (see Verify.scala), so the builder and oracle must agree on column
  * NAMES, VALUES, and (defensively) row ORDER — every query here ends in a
  * deterministic total sort on output keys.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Readers for the driver's parquet tables (TESTDATA.md). One parquet file
  * per table under the sf dir. At 100 TB these would be partitioned
  * directories; `spark.read.parquet` on a directory is the same code path,
  * so nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as two parquet encodings across testdata
    * generations, both normalized here to a session-local TIMESTAMP:
    *
    *  - TIMESTAMP(NANOS), which Spark 4 only reads as a raw long
    *    (spark.sql.legacy.parquet.nanosAsLong=true, set by every session
    *    builder in this repo): convert with integer division — the same
    *    ns→us truncation DuckDB's CAST(ts AS TIMESTAMP) applies. (`ts div
    *    1000` stays in integer math; ns-since-epoch overflows the 53-bit
    *    double mantissa, so `/ 1000` would corrupt low digits.)
    *  - timestamp[us] with no timezone, which Spark 4 reads as
    *    TIMESTAMP_NTZ: cast to TIMESTAMP under the UTC session timezone
    *    (bit-identical microsecond values; DuckDB reads the same file as
    *    a naive TIMESTAMP, so oracle comparisons stay exact). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }

  /** Register every table as a temp view (for spark.sql-style callers). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Compute-once-per-(session, sf-dir) memo — the shared-drive discipline
  * (exact-pairs, CC labelling, SCD2 dual drive, BM25 index): several
  * registered queries consume one expensive artifact, so the first caller
  * computes it (typically ending in an eager localCheckpoint or a
  * temp-dir write) and every later caller reuses it. `putIfAbsent` +
  * `lazy val` gives at-most-once computation under concurrent first
  * callers.
  *
  * Lifetime contract: an entry lives while its OWNING SESSION lives —
  * each value is either block-manager-resident (survives the bench's
  * per-sweep clearCache) or an on-disk index, and the bench/verify
  * processes are bounded single-session runs. A long-lived multi-session
  * process is covered by eviction, not retention: every `apply` sweeps
  * entries whose session has stopped (a stopped session's frames are
  * unusable — its block manager is gone), dropping the heap references
  * and running `dispose` on the evicted value so memos that own disk
  * artifacts (the dsv2 file log, the BM25 index roots) release those too.
  */
final class SessionMemo[V](compute: (SparkSession, String) => V,
    dispose: V => Unit = (_: V) => ()) {
  private final class Holder(s: SparkSession, dir: String) {
    lazy val value: V = compute(s, dir)
    /** forced exactly once and only for entries some caller completed —
      * eviction must never trigger a fresh computation just to dispose */
    @volatile var forced = false
  }
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Holder]
  private def evictStopped(): Unit =
    cache.keys.foreach { case key @ (s, _) =>
      if (s.sparkContext.isStopped)
        // remove FIRST (TrieMap.remove is atomic — exactly one concurrent
        // evictor wins the holder, so dispose runs at most once), and
        // dispose best-effort: eviction is cleanup riding an unrelated
        // caller's apply(), and a disposal IO failure must neither fail
        // that healthy caller nor re-poison every later apply() the way
        // an in-predicate throw left the entry resident
        cache.remove(key).foreach { h =>
          if (h.forced)
            try dispose(h.value)
            catch { case scala.util.control.NonFatal(_) => () }
        }
    }
  def apply(s: SparkSession, dir: String): V = {
    evictStopped()
    val fresh = new Holder(s, dir)
    val h = cache.putIfAbsent((s, dir), fresh).getOrElse(fresh)
    val v = h.value
    h.forced = true
    v
  }
  /** Visit every memoized value (Bench's post-clearCache re-pin path).
    * Holders exist only for keys some caller already forced, so this
    * never triggers a fresh computation in practice. */
  def foreachValue(f: V => Unit): Unit = cache.values.foreach(h => f(h.value))
}

/** Numeric helpers that keep Spark and the DuckDB oracle bit-identical.
  *
  * The testdata money/quantity columns are doubles holding 2-decimal
  * values. Summing doubles is order-dependent (Spark's partial aggregation
  * over 32 partitions sums in a different order than DuckDB's single
  * stream), so any double sum can drift in the last ULPs. Casting to
  * DECIMAL first makes the arithmetic exact and order-independent in both
  * engines; casting the final decimal back to DOUBLE is deterministic.
  * Keep operand precision small (12,2 / 4,2) so decimal multiplication
  * never exceeds either engine's 38-digit width.
  */
/** Two independent Spark jobs on parallel threads (Spark schedules
  * concurrent jobs onto free cores). BOTH branches settle before any
  * failure propagates: rethrowing on the first failure while the sibling
  * keeps writing unsupervised would let a fast retry race a zombie job
  * against the same directories — the caller must know both are done
  * (or dead) before it unwinds. First branch's failure wins when both
  * fail. Shared by the dual sink's checkpoint/staging pairs and the
  * SCD2 drive's parallel folds.
  *
  * The branches run on FRESH threads created by the calling thread, not
  * a shared pool: SparkContext keeps its local properties (job group,
  * job description, the streaming batch id) in an InheritableThreadLocal,
  * so a child thread inherits the caller's — jobs launched here stay in
  * the caller's job group (StreamingQuery.stop()'s cancellation reaches
  * them) and keep UI/metrics attribution. A pool thread would carry
  * whatever properties its CREATOR had, which for the global EC is none.
  *
  * Interruption (the normal path when a streaming query is stopped while
  * a batch is mid-flight) is part of the both-settle contract: an
  * interrupt of the calling thread is forwarded to both branch threads
  * (their Spark jobs are already being cancelled via the inherited job
  * group; the forward covers non-job waits), the join LOOP keeps waiting
  * until both branches are genuinely dead, and the interrupt status is
  * re-asserted before results or failures propagate — the caller never
  * unwinds while a sibling job is still moving files. */
/** Distributed global ranking WITHOUT the single-partition window
  * (guide §2.5; the WindowExec "moving all data to a single partition"
  * warning): range-repartition by the sort key, sort within partitions,
  * number rows per partition (`monotonically_increasing_id` is
  * consecutive from `pid << 33` within a partition, so `_mid − min(_mid)`
  * is the local index), then add each partition's global offset (a
  * ≤ #partitions-row driver collect — bounded by the knob, never the
  * data). Output-identical
  * to `row_number().over(Window.orderBy(sortCols)) - 1` whenever the
  * sort key is TOTAL (no ties between distinct rows): range partitions
  * are ordered, so offset + local index = global rank regardless of
  * where the sampled range boundaries fall. Stays in DataFrame algebra
  * (codegen, no RDD round-trip — a zipWithIndex variant measured 3×
  * slower); the eager checkpoint pins ONE evaluation of the id column so
  * the offset table and the output never see different partition
  * samplings. */
object Ranks {
  /** Rows at or under which the plain global window runs instead: the
    * two-pass machinery is ~10 small jobs of fixed cost (measured 0.6 →
    * 5.0 s on a 31-word vocabulary), while a single-partition sort of a
    * few million narrow rows is sub-second — the branch makes the rank
    * SIZE-adaptive rather than tuned for either local mode or the
    * cluster. The count that decides the branch scans the pinned input
    * (the pin is needed by the two-pass anyway). */
  val SmallMax: Long = 4L << 20

  def globalRank(df: DataFrame, rankName: String,
      sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val pinned = df.localCheckpoint(true)
    if (pinned.count() <= SmallMax)
      // bounded input (≤ SmallMax by the guard) → the windowed rank; its
      // single partition is a CHOICE here, not a scale hazard
      return pinned.withColumn(rankName,
        (row_number().over(Window.orderBy(sortCols: _*)) - 1)
          .cast(LongType))
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val parted = pinned.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // per-partition (count, first id) → driver-side running offsets: a
    // ≤ #partitions-row collect, so no window anywhere in this rank
    val stats = parted.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"), min(col("_mid")).as("_base"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var run = 0L
    val offRows = stats.map { case (pid, n, base) =>
      val o = (pid, base, run); run += n; o
    }.toSeq
    import spark.implicits._
    val offsets = offRows.toDF("_pid", "_base", "_off")
    parted.join(broadcast(offsets), "_pid")
      .withColumn(rankName, col("_off") + (col("_mid") - col("_base")))
      .drop("_pid", "_mid", "_base", "_off")
  }
}

object Par {
  def par2[A, B](a: => A, b: => B): (A, B) = {
    @volatile var ra: Either[Throwable, A] = null
    @volatile var rb: Either[Throwable, B] = null
    val ta = new Thread(() =>
      ra = try Right(a) catch { case t: Throwable => Left(t) }, "graft-par2-a")
    val tb = new Thread(() =>
      rb = try Right(b) catch { case t: Throwable => Left(t) }, "graft-par2-b")
    ta.setDaemon(true); tb.setDaemon(true)
    ta.start(); tb.start()
    var interrupted = false
    def joinSettled(t: Thread): Unit =
      while (t.isAlive)
        try t.join()
        catch {
          case _: InterruptedException =>
            interrupted = true
            ta.interrupt(); tb.interrupt()
        }
    joinSettled(ta); joinSettled(tb)
    if (interrupted) Thread.currentThread().interrupt()
    (ra, rb) match {
      case (Right(x), Right(y)) => (x, y)
      case (Left(t), _) => throw t
      case (_, Left(t)) => throw t
    }
  }
}

/** Lightweight phase-wall accumulator for the CDC merge paths: names the
  * time inside each protocol phase (materialize / changed-collect / merge
  * staging / commit / swap) so a profile attributes wall to PHASES, which
  * AQE's per-stage jobs and SQLExecution's pooled call sites cannot
  * (every job reports a pool frame). Always on — one nanoTime pair and a
  * map merge per phase, nanoseconds against jobs that cost seconds. */
object Phase {
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long)]() // name -> (ns, count)
  def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally acc.merge(name, (System.nanoTime() - t0, 1L),
      (a, b) => (a._1 + b._1, a._2 + b._2))
  }
  def reset(): Unit = acc.clear()
  /** (name, totalSec, count), heaviest first. */
  def report(): Seq[(String, Double, Long)] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.toSeq
      .map { case (n, (ns, c)) => (n, ns / 1e9, c) }
      .sortBy(-_._2)
  }
}

object Num {
  /** money/quantity operand: DECIMAL(12,2) */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  /** rate operand (discount/tax in [0,1]): DECIMAL(4,2) */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  val one: Column = lit(1).cast(DecimalType(4, 2))
  /** order-independent exact sum of a 2-decimal double, returned as double */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** decimal→double via string: both engines' string→double parse is
    * correctly rounded (IEEE strtod), unlike DuckDB's direct decimal cast
    * which double-rounds (int128→double, then ×10⁻ˢ) and can drift half an
    * ULP once the scaled integer exceeds 2⁵³. Use for high-magnitude /
    * high-scale decimal results; pair with
    * `CAST(CAST(x AS VARCHAR) AS DOUBLE)` in the oracle. */
  def decToDoubleExact(c: Column): Column =
    c.cast(StringType).cast(DoubleType)
  /** exact average: decimal sum cast to double, divided by count (IEEE
    * double/long division — identical in both engines). */
  def davg(c: Column): Column = sum(dec(c)).cast(DoubleType) / count(c)

  /** THE TPC-H revenue expression, defined once: its decimal
    * precision/scale must stay bit-identical between the Spark plan and
    * the DuckDB oracle string across every query that uses it. */
  def revenue: Column = dec(col("l_extendedprice")) * (one - rate(col("l_discount")))

  // DuckDB-side equivalents (string builders for oracle SQL)
  def sqlDec(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(4,2))"
  def sqlDsum(e: String): String = s"CAST(SUM(${sqlDec(e)}) AS DOUBLE)"
  def sqlDavg(e: String): String = s"CAST(SUM(${sqlDec(e)}) AS DOUBLE) / COUNT($e)"
  val sqlRevenue: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
}
