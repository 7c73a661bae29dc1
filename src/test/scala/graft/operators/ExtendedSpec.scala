package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtendedSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches brute-force nearest-earlier lookup") {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts", $"event_id".as("signup_event_id"), $"ts".as("signup_ts"))
    val fast = graft.plans.AsOfJoin.nearestEarlier(errors, signups, "user_id", "ts", "ts")
      .select($"event_id", $"signup_event_id")
      .as[(Long, Option[Long])].collect().toMap
    // brute force: non-equi join + max
    val brute = errors.as("e").join(signups.as("s"),
        $"e.user_id" === $"s.user_id" && $"s.ts" <= $"e.ts", "left")
      .groupBy($"event_id")
      .agg(max_by($"signup_event_id", $"signup_ts").as("signup_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
    assert(fast.nonEmpty && fast.values.exists(_.isDefined))
  }

  test("approx aggregates land near exact values") {
    val approx = Extended.approxStats.fn(spark, sfDir)
      .select($"o_orderstatus", $"approx_custs", $"approx_median")
      .as[(String, Long, Double)].collect().toMap2
    val exact = graft.Tables.load(spark, sfDir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n"), median($"o_totalprice").as("m"))
      .as[(String, Long, Double)].collect().toMap2
    approx.foreach { case (k, (ac, am)) =>
      val (ec, em) = exact(k)
      assert(math.abs(ac - ec).toDouble / ec < 0.1, s"$k distinct: $ac vs $ec")
      assert(math.abs(am - em) / em < 0.25, s"$k median: $am vs $em")
    }
  }

  test("seeded random pick is deterministic across runs (G3 parity)") {
    val a = Extended.randomPick.fn(spark, sfDir).as[(Long, String)].collect()
    val b = Extended.randomPick.fn(spark, sfDir).as[(Long, String)].collect()
    assert(a.length == 1 && a.sameElements(b))
  }

  implicit private class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
