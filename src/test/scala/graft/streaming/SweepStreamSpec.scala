package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.SweepEvent

/** Streaming/batch bridge for the concurrency sweep: replaying the
  * sf0.001 shipment cover deltas in day order across micro-batches,
  * the streamed per-nation final (peak, peak_day) must equal batch
  * q_peak_concurrency exactly — including the earliest-day tie-break
  * when the peak level recurs. */
class SweepStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed sweep over day-ordered batches equals batch q_peak_concurrency") {
    // the SAME deltas the batch query derives: +1 at ship day, −1 at
    // ship day + 7, keyed by supplier nation
    val d = graft.engine.Tables(spark, sf, "lineitem")
      .join(graft.engine.Tables(spark, sf, "supplier"),
        $"l_suppkey" === $"s_suppkey")
      .selectExpr("s_nationkey AS nk",
        "unix_micros(cast(l_shipdate as timestamp)) div 86400000000 AS sd")
      .as[(Long, Long)].collect()
    val deltas = (d.map { case (nk, sd) => SweepEvent(nk, sd, 1L) } ++
      d.map { case (nk, sd) => SweepEvent(nk, sd + 7L, -1L) })
      .sortBy(e => (e.d, e.nk))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SweepEvent](spark)
    val q = EventStream.sweepStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sweep_out")
      .start()
    try {
      // chunk at day boundaries so a day never straddles micro-batches
      // (the in-order source contract the scaladoc states)
      val days = deltas.map(_.d).distinct.sorted
      val cut1 = days(days.length / 3)
      val cut2 = days(2 * days.length / 3)
      val chunks = Seq(deltas.filter(_.d <= cut1),
        deltas.filter(e => e.d > cut1 && e.d <= cut2),
        deltas.filter(_.d > cut2))
      chunks.foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // the peak only tightens across emissions, so the final state is
      // the max-peak emission; the memory sink's row order is not part
      // of its contract, so assert order-free: the batch (peak, day)
      // is the emission maximum, and the closing emission (all covers
      // closed -> open = 0) carries exactly that state
      val streamed = spark.table("sweep_out")
        .as[(Long, Long, Long, Long)].collect().groupBy(_._1)

      val batch = SparkEntry.queries("q_peak_concurrency")(spark, sf)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (nk, (peak, day)) =>
        val rows = streamed(nk)
        assert(rows.map(_._3).max == peak,
          s"nation $nk: streamed max peak != batch $peak")
        assert(rows.exists(r => r._2 == 0L && r._3 == peak && r._4 == day),
          s"nation $nk: no closing emission with batch state ($peak, $day)")
      }
    } finally q.stop()
  }

  test("a day straddling micro-batches never commits a partial level") {
    // day 0 arrives as +3 then −2 (net 1) split across batches, then
    // day 1 adds +1 (level 2). Batch sweep: peak 2 at day 1. The old
    // fold committed day 0's partial level 3 as the peak; the buffered
    // in-progress day must revise it away.
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SweepEvent](spark)
    val q = EventStream.sweepStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("sweep_straddle")
      .start()
    try {
      Seq(Seq(SweepEvent(1L, 0L, 3L)),
          Seq(SweepEvent(1L, 0L, -2L)),
          Seq(SweepEvent(1L, 1L, 1L))).foreach { batch =>
        input.addData(batch)
        q.processAllAvailable()
      }
      val rows = spark.table("sweep_straddle")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // emissions are batch-sweep-of-prefix: (3,3,d0), (1,1,d0), (2,2,d1)
      assert(rows.contains((1L, 3L, 3L, 0L)), s"first prefix: $rows")
      assert(rows.contains((1L, 1L, 1L, 0L)), s"revised prefix: $rows")
      assert(rows.contains((1L, 2L, 2L, 1L)), s"final must be (2, day 1): $rows")
      assert(!rows.contains((1L, 2L, 3L, 0L)),
        "partial level 3 must not have been committed")
    } finally q.stop()
  }
}
