package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Co-located joins via bucketed tables: pre-shuffling both sides into
  * the same bucket layout removes the per-query Exchange — at 100 TB,
  * bucketing fact tables on their join key turns every downstream join
  * into a local zip of buckets. */
class BucketingSpec extends SparkSuite {

  test("bucketed join plans without an Exchange on either side") {
    // force the sort-merge path (tiny test tables would broadcast,
    // which hides exactly the shuffle bucketing is meant to remove)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables(spark, "/root/testdata/sf0.001", "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, "/root/testdata/sf0.001", "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
