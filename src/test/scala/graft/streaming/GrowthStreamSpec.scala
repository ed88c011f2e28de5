package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.GrowthEvent

/** Streaming/batch bridge for growth accounting: replaying the
  * sf0.001 user-days in day order across micro-batches, the streamed
  * per-(user, day) role emissions must fold to exactly batch
  * q_growth_acct's per-day counts for ALL FOUR classes — churn
  * included, emitted via event-time timeout (or a resurrecting
  * arrival) once the watermark passes the churn day's end. */
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
      // a sentinel user one day past the horizon pushes the watermark
      // over the last real day's end so every knowable churn times
      // out — batch likewise reports churn only through its last
      // observed day. Two extra batches: one to advance the
      // watermark, one to fire the timeouts it unlocked.
      val maxD = ds.last
      input.addData(Seq(GrowthEvent(-1L, maxD + 1)))
      q.processAllAvailable()
      input.addData(Seq(GrowthEvent(-1L, maxD + 1)))
      q.processAllAvailable()

      val emitted = spark.table("growth_out")
        .as[(Long, Long, String)].collect()
        .filter(_._1 != -1L)
      // exactly one role per (user, day)
      assert(emitted.map(e => (e._1, e._2)).distinct.length == emitted.length)
      val active = emitted.filter(_._3 != "churned")
      assert(active.length == days.length,
        "every distinct user-day must classify exactly once")

      val streamed = emitted.groupBy(e => (e._2, e._3))
        .map { case (k, v) => k -> v.length.toLong }
      val batch = SparkEntry.queries("q_growth_acct")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      var churnTotal = 0L
      batch.foreach { case (d, _, nw, ret, res, ch) =>
        assert(streamed.getOrElse((d, "new"), 0L) == nw, s"day $d new")
        assert(streamed.getOrElse((d, "retained"), 0L) == ret,
          s"day $d retained")
        assert(streamed.getOrElse((d, "resurrected"), 0L) == res,
          s"day $d resurrected")
        assert(streamed.getOrElse((d, "churned"), 0L) == ch,
          s"day $d churned")
        churnTotal += ch
      }
      assert(churnTotal > 0, "corpus must exercise churn (non-vacuous)")
      // Batch reports only days with ≥1 active user; the stream emits
      // churn at the user's true lastDay+1 even when that calendar
      // day is corpus-wide dark (growthStream's documented
      // divergence). Per-day equality on batch-reported days is
      // asserted above; any remaining streamed churn must sit on a
      // genuinely dark day inside the horizon, and the totals must
      // reconcile exactly — no corpus shape can silently break this.
      val batchDays = batch.map(_._1).toSet
      val activeDays = days.map(_.d).toSet
      val darkChurn = emitted
        .filter(e => e._3 == "churned" && !batchDays.contains(e._2))
      darkChurn.foreach(e => assert(
        !activeDays.contains(e._2) && e._2 <= maxD,
        s"churn at ${e._2} is neither batch-reported nor dark-in-horizon"))
      assert(emitted.count(_._3 == "churned") == churnTotal + darkChurn.length,
        "streamed churn must equal batch churn plus dark-day churn")
    } finally q.stop()
  }

  test("churn emits on resurrecting arrival without waiting for a timeout") {
    // u1 active {1,2,5}: the day-5 arrival closes run {1,2} and must
    // emit churn-at-3 in the SAME batch; u2 active {1,5} likewise
    // emits churn-at-2. No churn-at-6 appears: the run is still open
    // at the horizon (watermark never passes day 6's end).
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[GrowthEvent](spark)
    val q = EventStream.growthStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("growth_arrival")
      .start()
    try {
      Seq(Seq(GrowthEvent(1L, 1L), GrowthEvent(2L, 1L)),
          Seq(GrowthEvent(1L, 2L)),
          Seq(GrowthEvent(1L, 5L), GrowthEvent(2L, 5L))).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("growth_arrival")
        .as[(Long, Long, String)].collect().toSet
      assert(got == Set(
        (1L, 1L, "new"), (2L, 1L, "new"),
        (1L, 2L, "retained"),
        (1L, 3L, "churned"), (2L, 2L, "churned"),
        (1L, 5L, "resurrected"), (2L, 5L, "resurrected")))
    } finally q.stop()
  }

  test("churn on a corpus-wide dark day still emits (documented divergence)") {
    // u1 active {1}, u2 active {1,3}: day 2 has NO active user, yet
    // both runs truly end there — u2's churn-at-2 emits with its
    // day-3 resurrection (arrival path) and u1's via the event-time
    // timeout once the watermark passes day 2's end. Batch
    // q_growth_acct would not report day 2 at all (its churn
    // left-joins onto days with ≥1 active user); this pins the
    // stream side of that contract so it cannot silently change.
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[GrowthEvent](spark)
    val q = EventStream.growthStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("growth_dark")
      .start()
    try {
      Seq(Seq(GrowthEvent(1L, 1L), GrowthEvent(2L, 1L)),
          Seq(GrowthEvent(2L, 3L)),
          // sentinel batches: advance the watermark past day 2's
          // end, then fire the timeout it unlocked (the main spec's
          // two-extra-batches idiom)
          Seq(GrowthEvent(-1L, 3L)),
          Seq(GrowthEvent(-1L, 3L))).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val got = spark.table("growth_dark")
        .as[(Long, Long, String)].collect()
        .filter(_._1 != -1L).toSet
      assert(got == Set(
        (1L, 1L, "new"), (2L, 1L, "new"),
        (1L, 2L, "churned"), (2L, 2L, "churned"),
        (2L, 3L, "resurrected")),
        s"got $got")
    } finally q.stop()
  }
}
