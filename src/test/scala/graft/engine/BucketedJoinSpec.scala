package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketing discipline: two tables written `bucketBy` the same key
  * and bucket count must join with NO exchange on either side — the
  * bucket layout IS the shuffle, paid once at write time. At 100 TB a
  * fact-fact join that reshuffles both sides every run versus reading
  * co-located buckets is the difference between hours and minutes;
  * this spec pins the mechanism so a layout regression (bucket count
  * drift, bucketing disabled, non-bucketed rewrite) fails the build.
  */
class BucketedJoinSpec extends SparkSuite {

  test("co-bucketed tables join with zero exchanges") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle shape: a broadcast join would also skip the
    // exchange, proving nothing about the bucket layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
      (0L until 10000L).map(i => (i % 997, i)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_orders")
      (0L until 5000L).map(i => (i % 997, i * 2)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_lines")

      val j = spark.table("bkt_orders").join(spark.table("bkt_lines"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(3000))
      // the join itself ran co-located; only correctness left to check
      val total = j.agg(sum("n")).as[Long].head()
      // every k in 0..996 appears ceil/floor-often on both sides:
      // 10000 rows over 997 keys x 5000 rows over 997 keys
      val want = (0L until 997L).map { k =>
        val na = 10000L / 997 + (if (k < 10000 % 997) 1 else 0)
        val nb = 5000L / 997 + (if (k < 5000 % 997) 1 else 0)
        na * nb
      }.sum
      assert(total == want, s"got $total want $want")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
