package graft.streaming

import graft.SparkSuite
import graft.streaming.EventStream.{SessionRevEvent, SessionRevOut}

/** Streaming/batch bridge for session depth/revenue: replaying the
  * sf0.001 events in time order across micro-batches, the streamed
  * CLOSED sessions must equal exactly the batch session set
  * (q_sessionize's 30-min-gap definition with purchase cents summed
  * per session — the q_session_dist substrate) minus each user's
  * final, still-open session. A hand replay additionally pins the
  * revenue accumulator through a close-and-reopen. */
class SessionDistStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed closed sessions equal batch sessions minus each user's open tail") {
    val raw = graft.engine.Tables(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us",
        "CASE WHEN event_type = 'purchase' " +
          "THEN CAST(floor(value * 100) AS BIGINT) ELSE 0L END AS rev")
      .as[(Long, Long, Long)].collect()
      .sortBy(e => (e._2, e._1))

    // scalar recompute of the batch session definition: per user,
    // time-sorted events split on gaps > 30 min; depth + cents
    val batchSessions: Map[Long, Seq[(Long, Long, Long, Long)]] =
      raw.groupBy(_._1).map { case (u, evs) =>
        val sorted = evs.sortBy(_._2)
        val sess = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)] // (n, start, end, rev)
        var (n, st, en, rv) = (0L, 0L, 0L, 0L)
        sorted.foreach { case (_, t, r) =>
          if (n == 0L) { n = 1; st = t; en = t; rv = r }
          else if (t - en > 1800L * 1000000L) {
            sess += ((n, st, en, rv)); n = 1; st = t; en = t; rv = r
          } else { n += 1; en = t; rv += r }
        }
        val open = (n, st, en, rv) // the final session stays open
        u -> (sess.toSeq, open)
      }.map { case (u, (closed, _)) => u -> closed }

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionRevEvent](spark)
    val q = EventStream.sessionRevenue(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessrev_out")
      .start()
    try {
      val evs = raw.map { case (u, t, r) =>
        // preserve FULL microseconds: seconds via the ms constructor,
        // the sub-second fraction via setNanos (ms-only construction
        // would drop micros and shift session boundaries vs batch)
        val tsObj = new java.sql.Timestamp((t / 1000000L) * 1000L)
        tsObj.setNanos(((t % 1000000L) * 1000L).toInt)
        SessionRevEvent(u, tsObj, r)
      }
      val third = evs.length / 3
      Seq(evs.take(third), evs.slice(third, 2 * third), evs.drop(2 * third))
        .foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }

      val streamed = spark.table("sessrev_out").as[SessionRevOut].collect()
        .groupBy(_.user_id)
        .map { case (u, ss) =>
          u -> ss.map(s => (s.n_events, s.start_us, s.end_us, s.rev_cents))
            .sortBy(_._2).toSeq
        }
      val expected = batchSessions.filter(_._2.nonEmpty)
      assert(streamed.keySet == expected.keySet,
        s"user sets differ: ${streamed.keySet.size} vs ${expected.keySet.size}")
      expected.foreach { case (u, sess) =>
        assert(streamed(u) == sess, s"user $u: ${streamed(u)} != $sess")
      }
      // non-vacuity: the corpus must exercise multi-event sessions
      // with revenue
      val all = streamed.values.flatten
      assert(all.exists(_._1 > 1), "no multi-event session closed")
      assert(all.exists(_._4 > 0), "no closed session carries revenue")
    } finally q.stop()
  }

  test("revenue accumulates within a session and resets on close") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionRevEvent](spark)
    val q = EventStream.sessionRevenue(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessrev_hand")
      .start()
    try {
      // session 1: 0/10/20 min, cents 100+0+250; the 60-min event
      // (cents 7) closes it and opens session 2
      input.addData(Seq(
        SessionRevEvent(1L, ts(0), 100L), SessionRevEvent(1L, ts(10), 0L),
        SessionRevEvent(1L, ts(20), 250L), SessionRevEvent(1L, ts(60), 7L)))
      q.processAllAvailable()
      val got = spark.table("sessrev_hand").as[SessionRevOut].collect().toSeq
      assert(got == Seq(SessionRevOut(1L, 3L, 0L, 20L * 60000000L, 350L)))
    } finally q.stop()
  }
}
