package graft

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.engine.Tables

/** The mergeable-sketch alternates documented in SCALE.md for
  * high-cardinality groups at 100 TB: HLL count-distinct and t-digest
  * percentiles, sanity-bounded against their exact twins. */
class ApproxSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact") {
    val row = Tables(spark, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile close to exact percentile") {
    val row = Tables(spark, dir, "lineitem").agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx")).collect()(0)
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) <= 1.0)
  }

  test("declared approx queries stay inside their error envelopes") {
    Seq("q_approx_distinct", "q_approx_percentile").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val out = df.filter(!col("within_bound")).count()
      assert(out == 0, s"$name: $out rows outside the declared bound")
    }
  }
}
