package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Runtime bloom-filter join reduction — the semi-join pre-filter that
  * matters when a selective dim filter meets a fact-fact shuffle join:
  * the planner aggregates a bloom filter over the filtered build
  * side's join keys and applies `might_contain` on the probe side
  * BEFORE its shuffle, so most fact rows never cross the exchange. At
  * the 100 TB defaults this triggers on its own (creation side
  * < 100 MB, application scan > 10 GB); the spec lowers the
  * application-side threshold to pin the mechanism at test scale and
  * asserts the filtered result is unchanged. */
class RuntimeFilterSpec extends SparkSuite {

  test("selective shuffle join injects a bloom filter on the probe side") {
    val dir = "/root/testdata/sf0.01"
    def query() = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 400000)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // no broadcast (force the shuffle join the filter exists for),
      // application-side size gate lowered to test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val df = query()
      val withFilter = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg"),
        "no bloom filter aggregated on the build side:\n" + plan.take(1500))
      assert(plan.contains("might_contain"),
        "bloom filter not applied on the probe side:\n" + plan.take(1500))

      // correctness unchanged: bloom is a may-contain pre-filter, the
      // exact join still decides membership
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val noFilter = query().collect().toSeq
      assert(withFilter == noFilter && withFilter.nonEmpty)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
