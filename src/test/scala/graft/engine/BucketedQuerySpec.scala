package graft.engine

import graft.SparkSuite

/** The DECLARED bucketed query's plan contract: q_join_bucketed's join
  * and per-order aggregate must run with zero hash exchanges — the
  * persisted bucket layout replaces the per-query shuffle. Broadcast
  * is disabled so the sort-merge path (the 100 TB fact-fact shape) is
  * what's being pinned; the only allowed exchange is the final
  * presentation sort's range partitioning.
  */
class BucketedQuerySpec extends SparkSuite {

  test("q_join_bucketed plans join + aggregate with zero hash exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = graft.ext.Pipeline.queries.find(_.name == "q_join_bucketed").get
      val df = q.fn(spark, "/root/testdata/sf0.001")
      // executedPlan, not sparkPlan: exchanges are inserted by
      // EnsureRequirements during preparation — the bare sparkPlan has
      // none anywhere and would make the no-exchange assertion vacuous
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected zero hash exchanges:\n${plan.take(4000)}")
      assert(plan.contains("SortMergeJoin"),
        s"expected the sort-merge fact-fact shape:\n${plan.take(2000)}")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
