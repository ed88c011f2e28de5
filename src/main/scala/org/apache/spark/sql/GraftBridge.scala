package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression
  * converters (Spark 4 moved these behind the classic module). Lives
  * in the sql package solely to re-export the two calls the graft
  * custom expressions need; no Spark internals are modified. */
object GraftBridge {
  /** Re-export of the private[sql] AbstractDataType so graft custom
    * expressions can declare ExpectsInputTypes contracts. */
  type ADT = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic Dataset.ofRows). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-export of the private[sql] float/double key normalizer
    * (-0.0 → 0.0, canonical NaN): Spark inserts it above ITS OWN
    * grouping operators only, so custom keyed operators (TopKPerKey)
    * must apply it to their grouping keys themselves. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)

  /** True when `dt` is (or nests, at any depth) a MapType — maps have
    * no canonical binary form, so byte-compared grouping keys must
    * reject them, same rule as Spark's own groupBy analysis check.
    * (Wraps the private[sql] DataType.existsRecursively.) */
  def containsMapType(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.existsRecursively(_.isInstanceOf[org.apache.spark.sql.types.MapType])

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a running session (for
    * sessions not built with GraftExtensions). Synchronized: the
    * check-then-append on `extraStrategies` is a read-modify-write of
    * a plain var, and two concurrent registrations (e.g. parallel
    * first calls of two strategy-backed operators) could each append
    * to the same stale snapshot, losing one strategy (round-12
    * review). */
  def registerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
