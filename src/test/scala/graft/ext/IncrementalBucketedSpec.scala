package graft.ext

import graft.SparkSuite

/** The bucketed-corpus incremental dedup plan contract: with the
  * corpus content-hash table persisted `bucketBy(h)`, the nightly
  * anti-join must shuffle ONLY the increment — exactly one hash
  * exchange in the whole plan (increment side; the corpus branch reads
  * co-located buckets, and the post-join group-by reuses the join
  * partitioning). Broadcast disabled so the sort-merge anti shape (the
  * 100 TB corpus shape) is what's pinned.
  */
class IncrementalBucketedSpec extends SparkSuite {

  test("q_dedup_incremental_bkt shuffles only the increment") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Dedup.queries.find(_.name == "q_dedup_incremental_bkt").get
      val df = q.fn(spark, "/root/testdata/sf0.001")
      // executedPlan, not sparkPlan: exchanges are inserted by
      // EnsureRequirements during preparation — the bare sparkPlan has
      // none anywhere and would make this assertion vacuous
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected exactly one hash exchange (the increment), got $exchanges:\n" +
          plan.take(4000))
      // and it computes the same relation as the in-query variant
      val inQuery = Dedup.queries.find(_.name == "q_dedup_incremental").get
        .fn(spark, "/root/testdata/sf0.001").collect().toSeq
      assert(df.collect().toSeq == inQuery)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
