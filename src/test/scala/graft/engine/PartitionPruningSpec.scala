package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Partition-layout discipline: a table written `partitionBy` a filter
  * column must prune at the source — at 100 TB the difference between
  * scanning one partition directory and all of them IS the query. */
class PartitionPruningSpec extends SparkSuite {

  test("partitionBy write + filter read prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    // the EQUALITY must be inside PartitionFilters (a plan that keeps
    // only isnotnull there and filters = 'click' post-scan reads every
    // partition — exactly the regression this spec exists to catch)
    val flat = q.queryExecution.executedPlan.toString.replaceAll("\\s", "")
    val pf = flat.drop(flat.indexOf("PartitionFilters:[")).takeWhile(_ != ']')
    assert(pf.contains("=click"), flat)
    // pruned result matches the unpartitioned filter
    val want = Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "click").count()
    assert(q.count() == want && want > 0)
  }

  test("declared q_partition_pruned scan prunes on the lang IN-list") {
    val df = graft.SparkEntry.queries("q_partition_pruned")(
      spark, "/root/testdata/sf0.001")
    val flat = df.queryExecution.executedPlan.toString.replaceAll("\\s", "")
    val pf = flat.drop(flat.indexOf("PartitionFilters:[")).takeWhile(_ != ']')
    // the IN-list must sit in PartitionFilters — post-scan filtering
    // would read every language's directory
    assert(pf.contains("IN(en,de)") || pf.contains("in(lang"), flat.take(2000))
    assert(df.count() == 2)
  }
}
