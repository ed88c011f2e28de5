package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the contract of the opt-in starved-scan fan-out
  * ([[Tables.wide]], optimization round 17): results identical to the
  * bare scan, filter/column pushdown reaching the parquet scan THROUGH
  * the repartition, a deterministic hash exchange on the table's
  * primary key (never round-robin), and the two pass-through cases
  * (tiny table, multi-file production layout) staying exchange-free. */
class TablesFanOutSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("fan-out preserves the row multiset exactly") {
    val bare = Tables(spark, sf, "lineitem").collect().toSeq
      .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val fanned = Tables.wide(spark, sf, "lineitem").collect().toSeq
      .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(fanned == bare)
  }

  test("fan-out is a deterministic hash exchange on the primary key") {
    val plan = Tables.wide(spark, sf, "lineitem")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(l_orderkey"),
      s"expected pk hash exchange, got:\n$plan")
    assert(!plan.contains("roundrobin"),
      s"fan-out must never be round-robin (retry/order hazard):\n$plan")
  }

  test("pushdown reaches the scan through the repartition") {
    val q = Tables.wide(spark, sf, "lineitem")
      .filter(col("l_quantity") > 10.0)
      .select(col("l_quantity"), col("l_discount"))
    val scan = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    assert(scan.contains("GreaterThan(l_quantity"),
      s"filter must be pushed to the scan:\n$scan")
    assert(!scan.contains("l_comment") && !scan.contains("l_extendedprice"),
      s"pruning must drop unused columns at the scan:\n$scan")
  }

  test("a tiny table passes through with no exchange") {
    val plan = Tables.wide(spark, sf, "region")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"5-row table must not shuffle:\n$plan")
  }

  test("a multi-file (production) layout passes through with no exchange") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fanout-multifile")
    (1L to 512L).map(i => (i, s"cust$i")).toDF("c_custkey", "c_name")
      .repartition(3)
      .write.parquet(dir.resolve("customer.parquet").toString)
    val plan = Tables.wide(spark, dir.toString, "customer")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"directory layouts already parallelize by file:\n$plan")
  }
}
