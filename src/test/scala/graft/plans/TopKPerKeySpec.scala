package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSuite
import graft.engine.Tables

class TopKPerKeySpec extends SparkSuite {

  test("TopKPerKey matches the window row_number form exactly") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val viaOp = TopK.perKey(orders, 3,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice") -> false, col("o_orderkey") -> true))
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).toSet
    val viaWindow = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).toSet
    assert(viaOp == viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("plan contains the custom exec and exactly one keyed exchange") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val df = TopK.perKey(orders, 2,
      Seq(col("o_custkey")), Seq(col("o_totalprice") -> false))
    df.collect() // let AQE finalize the plan before reading it
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("hashpartitioning(o_custkey"), plan)
    // no SortExec needed — the heap replaces the sort
    assert(!plan.contains("(Sort"), plan)
  }

  test("k must be positive (fail fast, not mid-job)") {
    import spark.implicits._
    val df = Seq((1, 10)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      TopK.perKey(df, 0, Seq(col("k")), Seq(col("v") -> true))
    }
  }

  test("k larger than group size returns the whole group") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val out = TopK.perKey(df, 99, Seq(col("k")), Seq(col("v") -> true))
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 10), (1, 20), (2, 5)))
  }
}
