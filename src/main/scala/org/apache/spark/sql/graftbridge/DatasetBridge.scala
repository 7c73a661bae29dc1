package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library needs: turning a custom
  * LogicalPlan node into a DataFrame. Spark exposes no public constructor
  * for that (by design — plans are an internal API), so every library that
  * ships its own logical operators carries a one-line bridge in an
  * `org.apache.spark.sql` subpackage; this is ours, kept deliberately to a
  * single call so the internal surface we touch stays minimal.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
