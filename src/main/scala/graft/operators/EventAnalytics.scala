package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-analytics operators over the event stream: funnel progression
  * and cohort retention — the two queries every event warehouse runs daily.
  *
  * Scale notes: both are scan → filtered aggregate → small-frame joins.
  * The funnel's per-stage "first time after previous stage" is three
  * type-filtered aggregations joined on user_id (each join key is the
  * already-aggregated per-user frame, ~|users| rows, not the event fact);
  * retention is one aggregation to find each user's cohort plus one join
  * back — the cohort frame is |users| rows and shuffles once.
  */
object EventAnalytics {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ------------------------------------------------------------------
  // 3-stage funnel: first view → first click after it → first purchase
  // after that; count users surviving each stage.
  val funnel: Q = Q(
    "q_events_funnel",
    (s, dir) => {
      val e = ev(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id"))
        .filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      v.agg(count(lit(1)).as("n")).select(lit("1_view").as("stage"), col("n"))
        .unionByName(c.agg(count(lit(1)).as("n"))
          .select(lit("2_click").as("stage"), col("n")))
        .unionByName(p.agg(count(lit(1)).as("n"))
          .select(lit("3_purchase").as("stage"), col("n")))
        .orderBy(col("stage"))
    },
    Some("""WITH v AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2
      |  GROUP BY e.user_id)
      |SELECT '1_view' AS stage, COUNT(*) AS n FROM v
      |UNION ALL SELECT '2_click', COUNT(*) FROM c
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
      |ORDER BY stage""".stripMargin))

  // ------------------------------------------------------------------
  // Cohort retention: cohort = day of user's first event (bucketed to
  // 7-day weeks from epoch-day so both engines use pure integer math);
  // cell = distinct users of cohort w active in week w+k.
  val retention: Q = Q(
    "q_cohort_retention",
    (s, dir) => {
      val e = ev(s, dir)
        .select(col("user_id"), (unix_timestamp(col("ts")) / 86400L)
          .cast(LongType).as("day"))
      // floor() spelled out: Spark's `/` on longs is double division, and
      // cast-to-long truncates toward zero — identical to floor only
      // because epoch days here are positive. floor keeps it honest.
      val first = e.groupBy(col("user_id"))
        .agg(floor(min(col("day")) / 7L).cast(LongType).as("cohort_week"))
      e.join(first, Seq("user_id"))
        .select(col("cohort_week"),
          (floor(col("day") / 7L).cast(LongType) - col("cohort_week")).as("week_offset"),
          col("user_id"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH days AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
      |  FROM events),
      |first AS (
      |  SELECT user_id, CAST(floor(min(day) / 7) AS BIGINT) AS cohort_week
      |  FROM days GROUP BY user_id)
      |SELECT cohort_week,
      |  CAST(floor(day / 7) AS BIGINT) - cohort_week AS week_offset,
      |  COUNT(DISTINCT d.user_id) AS n_users
      |FROM days d JOIN first f ON d.user_id = f.user_id
      |GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin))

  val all: Seq[Q] = Seq(funnel, retention)
}
