package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Spark 4 moved Column↔Expression conversion behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so a
  * library shipping native Catalyst expressions needs one file inside the
  * `org.apache.spark.sql` package tree to lift them into public Columns —
  * the same approach other Spark-extension libraries use. Nothing else in
  * this project lives outside the `graft` namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
