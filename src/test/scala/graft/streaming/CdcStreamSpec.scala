package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.CdcEvent

/** Streaming/batch bridge for the CDC fold: replaying the sf0.001
  * changelog in event-time order across micro-batches, the streamed
  * per-user final state must equal batch q_cdc_apply exactly —
  * including users whose history ends in a tombstone (streamed
  * n_live = 0 retraction ⇔ absent from the batch state). */
class CdcStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def micros(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  test("streamed CDC fold over ordered batches equals batch q_cdc_apply") {
    val log = graft.engine.Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value")
      .as[(Long, Timestamp, Long, String, Double)].collect()
      .map { case (u, t, id, et, v) => CdcEvent(u, t, id, et, v) }
      // event-time replay order: the in-order source contract
      .sortBy(e => (micros(e.ts), e.event_id))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CdcEvent](spark)
    val q = EventStream.cdcApplyStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out")
      .start()
    try {
      val (a, rest) = log.splitAt(log.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val finalRows = spark.table("cdc_out").collect()

      // authoritative expectation: replay the fold scalar-side
      val expectedState = log.groupBy(_.user_id).map { case (u, evs) =>
        val ordered = evs.sortBy(e => (micros(e.ts), e.event_id))
        val lastDel = ordered.lastIndexWhere(_.event_type == "error")
        val live = ordered.drop(lastDel + 1)
        u -> live
      }
      // batch query state
      val batch = SparkEntry.queries("q_cdc_apply")(spark, sf)
        .select("user_id", "n_live", "last_type", "last_value")
        .as[(Long, Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap

      // batch query ≡ scalar fold (tombstoned users absent)
      expectedState.foreach { case (u, live) =>
        if (live.isEmpty) assert(!batch.contains(u),
          s"user $u tombstoned but present in batch state")
        else {
          val (n, lt, lv) = batch(u)
          assert(n == live.size.toLong && lt == live.last.event_type &&
            lv == live.last.value,
            s"user $u: batch state mismatch vs scalar fold")
        }
      }
      // streamed emissions: every user emits ≥1 state row; a
      // tombstoned user emits the n_live = 0 retraction; a survivor's
      // FINAL fold state appears among its emissions (its last batch
      // emits exactly that state — the stream reached the batch answer)
      val allRows = finalRows.map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3))).toSeq
      val users = allRows.map(_._1).toSet
      assert(users == log.map(_.user_id).toSet,
        "every user must emit at least one state row")
      expectedState.foreach { case (u, live) =>
        if (live.isEmpty)
          assert(allRows.exists(r => r._1 == u && r._2 == 0L),
            s"tombstoned user $u never emitted a retraction")
        else {
          val exp = (u, live.size.toLong,
            micros(live.head.ts), live.last.event_type)
          assert(allRows.contains(exp),
            s"user $u: final streamed state $exp absent from emissions")
        }
      }
    } finally q.stop()
  }
}
