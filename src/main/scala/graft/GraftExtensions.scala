package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{IntersectCountRewrite, SortedIntersectCount, VecDot}

/** Session extension registering the graft custom expressions as SQL
  * functions, so the engine surface is reachable from plain
  * `spark.sql(...)` too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT vec_dot(a, b) FROM vecs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  /** Arity-checked builder: wrong argument counts get a clean analysis
    * error naming the signature, never a silent drop of extras or an
    * IndexOutOfBoundsException. */
  private def binary(name: String)(f: (Expression, Expression) => Expression)(
      children: Seq[Expression]): Expression = {
    if (children.size != 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "2",
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    f(children(0), children(1))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold dot product of two array<double>"),
      binary("vec_dot")(VecDot(_, _)) _))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |a ∩ b| for sorted distinct array<bigint>"),
      binary("sorted_intersect_count")(SortedIntersectCount(_, _)) _))
  }
}
