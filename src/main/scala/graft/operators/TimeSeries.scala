package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series shaping over the event stream: gap-filled resampling and
  * time-range (interval) window frames — the regularization steps between
  * raw events and any per-period model input.
  */
object TimeSeries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ------------------------------------------------------------------
  // Daily counts per event_type with missing days ZERO-FILLED over the
  // corpus's [min_day, max_day] span. ONE scan of the fact: the bounds
  // and the type dimension both derive from the (|types|×|days|-sized)
  // daily aggregate, not from separate passes over events — the fact-side
  // aggregation shuffles once on (type, day) and everything downstream is
  // aggregate-cardinality. The spine is sequence+explode over the
  // broadcast 1-row bounds frame; no driver collect.
  val resampleGapfill: Q = Q(
    "q_resample_gapfill",
    (s, dir) => {
      val e = ev(s, dir).select(col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      val daily = e.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // feeds bounds, types, and the join back
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = broadcast(bounds)
        .select(explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
        .crossJoin(daily.select(col("event_type")).distinct())
      spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH e AS (
      |  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
      |  FROM events),
      |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      |spine AS (
      |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      |  FROM bounds),
      |daily AS (
      |  SELECT event_type, day, COUNT(*) AS n FROM e GROUP BY event_type, day)
      |SELECT t.event_type, s.day, COALESCE(d.n, 0) AS n
      |FROM spine s
      |CROSS JOIN (SELECT DISTINCT event_type FROM e) t
      |LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = s.day
      |ORDER BY t.event_type, s.day""".stripMargin))

  // ------------------------------------------------------------------
  // Rolling 7-day event count and value sum per user: a RANGE window over
  // event-time (every event sees the preceding week INCLUDING same-instant
  // rows — the frame is value-based, not row-count-based). Both engines
  // order by integer epoch seconds so the frame bound arithmetic is exact.
  val rolling7d: Q = Q(
    "q_window_7d_rolling",
    (s, dir) => {
      val e = ev(s, dir).select(col("event_id"), col("user_id"),
        col("value"), unix_timestamp(col("ts")).as("sec"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-7L * 86400, 0)
      e.select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("value").cast(DecimalType(12, 2))).over(w)
            .cast(DoubleType).as("sum_7d"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_7d,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_7d
      |FROM (SELECT event_id, user_id, value,
      |        -- floor, not CAST: DuckDB casts double->bigint by ROUNDING,
      |        -- Spark's unix_timestamp truncates sub-second parts
      |        CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin))

  val all: Seq[Q] = Seq(resampleGapfill, rolling7d)
}
