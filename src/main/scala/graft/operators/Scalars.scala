package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Remaining scalar surface: math, regexp capture groups, JSON-as-map,
  * array higher-order functions. All integer-exact or fixed-IEEE (sqrt is
  * correctly rounded per IEEE-754, so it matches across engines; exp/ln
  * would not — deliberately excluded from oracle queries).
  */
object Scalars {

  val math: Q = Q(
    "q_math_fns",
    (s, dir) => Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        abs(col("o_totalprice") - 200000).as("abs_diff"),
        ceil(col("o_totalprice")).as("ceil_p"),
        floor(col("o_totalprice")).as("floor_p"),
        round(col("o_totalprice"), -3).as("round_k"),
        (col("o_orderkey") % 7).as("mod7"),
        signum(col("o_totalprice") - 200000).as("sign_diff"),
        sqrt(col("o_totalprice")).as("sqrt_p"),
        pow(lit(2), col("o_orderkey") % 10).as("pow2"),
        greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
        least(col("o_totalprice"), lit(100000.0)).as("lo"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      |  abs(o_totalprice - 200000) AS abs_diff,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_p,
      |  CAST(floor(o_totalprice) AS BIGINT) AS floor_p,
      |  round(o_totalprice, -3) AS round_k,
      |  o_orderkey % 7 AS mod7,
      |  CAST(sign(o_totalprice - 200000) AS DOUBLE) AS sign_diff,
      |  sqrt(o_totalprice) AS sqrt_p,
      |  pow(2, o_orderkey % 10) AS pow2,
      |  greatest(o_totalprice, 100000.0) AS hi,
      |  least(o_totalprice, 100000.0) AS lo
      |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin))

  val regexpFns: Q = Q(
    "q_regexp_fns",
    (s, dir) => Tables.load(s, dir, "customer")
      .filter(col("c_custkey") % 13 === 0)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "Customer#(\\d+)", 1).cast(LongType).as("name_num"),
        regexp_extract(col("c_mktsegment"), "^([A-Z]+)", 1).as("seg_word"),
        (regexp_count(col("c_name"), lit("0"))).cast(IntegerType).as("zeros"),
        regexp_like(col("c_name"), lit("[13579]$")).as("odd_tail"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey,
      |  CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS name_num,
      |  regexp_extract(c_mktsegment, '^([A-Z]+)', 1) AS seg_word,
      |  CAST(len(regexp_extract_all(c_name, '0')) AS INT) AS zeros,
      |  regexp_matches(c_name, '[13579]$') AS odd_tail
      |FROM customer WHERE c_custkey % 13 = 0 ORDER BY c_custkey""".stripMargin))

  val mapJson: Q = Q(
    "q_map_json",
    (s, dir) => {
      val m = from_json(col("props"), MapType(StringType, LongType))
      Tables.load(s, dir, "events")
        .filter(col("event_id") % 53 === 0)
        .select(
          col("event_id"),
          size(m).as("n_keys"),
          concat_ws(",", map_keys(m)).as("keys_csv"),
          element_at(m, "k").as("k_val"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      |  CAST(len(json_keys(props)) AS INT) AS n_keys,
      |  array_to_string(json_keys(props), ',') AS keys_csv,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
      |FROM events WHERE event_id % 53 = 0 ORDER BY event_id""".stripMargin))

  val arrayHof: Q = Q(
    "q_array_hof",
    (s, dir) => Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") % 29 === 0)
      .select(
        col("vec_id"),
        exists(col("embedding"), x => x > 0.5f).as("any_big"),
        forall(col("embedding"), x => x > -10f).as("all_sane"),
        size(filter(col("embedding"), x => x < 0)).as("n_neg"),
        aggregate(
          transform(col("embedding"), x => round(x.cast(DoubleType) * 1000).cast(LongType)),
          lit(0L), (acc, v) => acc + abs(v)).as("l1_q"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
      |  len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_big,
      |  len(list_filter(embedding, x -> NOT (x > -10))) = 0 AS all_sane,
      |  CAST(len(list_filter(embedding, x -> x < 0)) AS INT) AS n_neg,
      |  CAST(list_sum(list_transform(embedding,
      |    x -> abs(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)))) AS BIGINT) AS l1_q
      |FROM embeddings WHERE vec_id % 29 = 0 ORDER BY vec_id""".stripMargin))

  // per-(user, day) dedup — the daily-grain exact dedup pattern over an
  // event stream (keep first event id per key per day).
  val dedupDaily: Q = Q(
    "q_dedup_daily",
    (s, dir) => Tables.load(s, dir, "events")
      .groupBy(col("user_id"), col("ts").cast(DateType).as("day"))
      .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n"))
      .orderBy(col("user_id"), col("day")),
    Some("""SELECT user_id, CAST(ts AS DATE) AS day,
      |  MIN(event_id) AS first_event, COUNT(*) AS n
      |FROM events GROUP BY user_id, CAST(ts AS DATE)
      |ORDER BY user_id, day""".stripMargin))

  // date arithmetic: day/month offsets with month-end clamping semantics
  // (identical in both engines), week truncation.
  val dateArith: Q = Q(
    "q_date_arith",
    (s, dir) => Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") % 101 === 0)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate").cast(DateType), 30).as("plus30d"),
        add_months(col("o_orderdate").cast(DateType), 2).as("plus2m"),
        date_sub(col("o_orderdate").cast(DateType), 7).as("minus7d"),
        date_trunc("week", col("o_orderdate")).cast(DateType).as("week_start"),
        quarter(col("o_orderdate")).as("q"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30d,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
      |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus7d,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
      |  CAST(quarter(o_orderdate) AS INT) AS q
      |FROM orders WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(math, regexpFns, mapJson, arrayHof, dedupDaily, dateArith)
}
