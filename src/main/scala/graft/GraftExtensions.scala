package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-creation-time injection of the engine's custom expressions —
  * the idiomatic way a Spark library ships Catalyst extensions:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Makes `dot_product`, `cosine_sim`, `hamming64` available to ANY SQL text
  * (including the SQL-gateway passthrough, SURVEY §2.1 S5) and to
  * `expr()`/`call_function` callers, with full whole-stage codegen — these
  * are native Expressions, not UDFs.
  *
  * Also injects the planner strategy for the library's one whole-operator
  * custom plan, the native as-of join ([[graft.plans.AsOfJoinPlan]] →
  * [[graft.plans.AsOfJoinExec]]); every other operator composes from
  * built-ins by design.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(functions.VectorExprs.dotProductDescriptor)
    ext.injectFunction(functions.VectorExprs.cosineSimDescriptor)
    ext.injectFunction(functions.VectorExprs.hamming64Descriptor)
    ext.injectFunction(functions.VectorExprs.shingleGenDescriptor)
    ext.injectFunction(functions.Bloom.mightContainDescriptor)
    ext.injectPlannerStrategy(_ => new plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(s => new plans.BinnedRangeJoinRule(s))
    ext.injectOptimizerRule(s => new plans.HammingBandJoinRule(s))
  }
}
