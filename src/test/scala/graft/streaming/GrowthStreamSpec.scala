package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.GrowthEvent

/** Streaming/batch bridge for growth accounting: replaying the
  * sf0.001 user-days in day order across micro-batches, the streamed
  * per-(user, day) role emissions must fold to exactly batch
  * q_growth_acct's per-day new/retained/resurrected counts. Churn is
  * an absence, not an event — asserted OUT of the stream and left to
  * the batch query (the growthStream scaladoc contract). */
class GrowthStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed role emissions fold to batch q_growth_acct counts") {
    val days = graft.engine.Tables(spark, sf, "events")
      .selectExpr("user_id",
        "(unix_micros(ts) - 1704067200000000) div 86400000000 AS d")
      .distinct().as[(Long, Long)].collect()
      .map { case (u, d) => GrowthEvent(u, d) }
      .sortBy(e => (e.d, e.user_id))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[GrowthEvent](spark)
    val q = EventStream.growthStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("growth_out")
      .start()
    try {
      val ds = days.map(_.d).distinct.sorted
      val cut1 = ds(ds.length / 3)
      val cut2 = ds(2 * ds.length / 3)
      Seq(days.filter(_.d <= cut1),
        days.filter(e => e.d > cut1 && e.d <= cut2),
        days.filter(_.d > cut2)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val emitted = spark.table("growth_out")
        .as[(Long, Long, String)].collect()
      // exactly one role per (user, day)
      assert(emitted.map(e => (e._1, e._2)).distinct.length == emitted.length)
      assert(emitted.length == days.length,
        "every distinct user-day must classify exactly once")

      val streamed = emitted.groupBy(e => (e._2, e._3))
        .map { case (k, v) => k -> v.length.toLong }
      val batch = SparkEntry.queries("q_growth_acct")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      batch.foreach { case (d, _, nw, ret, res, _) =>
        assert(streamed.getOrElse((d, "new"), 0L) == nw, s"day $d new")
        assert(streamed.getOrElse((d, "retained"), 0L) == ret,
          s"day $d retained")
        assert(streamed.getOrElse((d, "resurrected"), 0L) == res,
          s"day $d resurrected")
      }
    } finally q.stop()
  }
}
