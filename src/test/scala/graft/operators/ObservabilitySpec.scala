package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Pipeline observability: `Dataset.observe` attaches named metrics that
  * are computed DURING the action (no second scan) — how a production
  * pipeline watches row counts / null rates / value bounds without paying
  * an extra pass at 100 TB.
  */
class ObservabilitySpec extends SparkSpec {

  test("observe() collects data-quality metrics in the same pass as the action") {
    val obs = Observation("dq")
    val df = graft.Tables.load(spark, sfDir, "orders")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("o_totalprice").isNull, 1).otherwise(0)).as("null_price"),
        min(col("o_orderdate")).as("min_date"),
        max(col("o_totalprice")).as("max_price"))
      .filter(col("o_totalprice") > 0)
    val kept = df.count()
    val m = obs.get
    // metrics describe the observed frame (pre-filter), computed in-pass
    assert(m("n_rows").asInstanceOf[Long] >= kept && kept > 0)
    assert(m("null_price").asInstanceOf[Long] == 0L)
    assert(m("max_price").asInstanceOf[Double] > 0.0)
  }
}
