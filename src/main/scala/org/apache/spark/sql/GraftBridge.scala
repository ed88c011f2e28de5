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

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a running session (for
    * sessions not built with GraftExtensions). */
  def registerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
