package graft.ext

import graft.{SparkEntry, SparkSuite}

/** The quota sample's scale claim is the PLAN, not just the rows: a
  * rank<=N filter over a partitioned window must plan WindowGroupLimit
  * both below the shuffle (each input partition forwards at most N
  * rows per group) and above it — without the partial limit, every
  * language's full row set crosses the exchange and the window sort
  * is corpus-sized. */
class QuotaSampleSpec extends SparkSuite {

  test("q_sample_quota plans partial + final WindowGroupLimit") {
    val df = SparkEntry.queries("q_sample_quota")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val hits = "WindowGroupLimit".r.findAllIn(plan).size
    assert(hits >= 2, s"expected partial+final WindowGroupLimit, got $hits:\n" +
      plan.take(1500))
  }

  test("q_sample_quota caps every group at the quota") {
    val rows = SparkEntry.queries("q_sample_quota")(spark, "/root/testdata/sf0.01")
      .groupBy("lang").count().collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) <= 20, r.toString))
  }
}
