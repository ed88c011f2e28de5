package graft.streaming

import scala.util.Random

import graft.SparkSuite

/** Randomized batch-equality property for the island-merge sessionizer
  * (round-9 rewrite): users emit well-separated sessions, delivery is
  * randomized — most sessions arrive promptly, some arrive LATE
  * (delivered whole or split across two consecutive micro-batches,
  * after later sessions already opened), and late fragments share
  * their batches with new forward sessions (the mixed-batch case the
  * hold rule must survive). After a far-future flush event closes
  * everything, the emitted sessions must equal EXACTLY the batch
  * q_sessionize session set over the full event multiset — every late
  * cluster merged, nothing double-emitted, counts/starts/ends exact.
  *
  * The generator respects the declared liveness contract: one late
  * cluster in flight per user, its fragments in consecutive batches —
  * the shape the hold guarantees. A straggler ≥2 idle invocations
  * behind its cluster is the documented residual divergence and is
  * deliberately not generated. */
class SessionPropertySpec extends SparkSuite {
  import spark.implicits._

  private val gapMin = 30L

  test("random prompt/late/split delivery equals batch sessions exactly") {
    val rnd = new Random(20260814L)
    // per user: session list (events in minutes), and for each session
    // its delivery: Left(batch) = whole, Right((b1, b2, split)) = late
    final case class Sess(events: Seq[Long])
    val users = (1L to 4L).map { u =>
      val k = 4 + rnd.nextInt(3) // 4..6 sessions
      var t = rnd.nextInt(60).toLong
      val sessions = (1 to k).map { _ =>
        t += 40 + rnd.nextInt(80) // > gap since the previous end
        val n = 1 + rnd.nextInt(4)
        val evs = Seq.iterate(t, n)(x => x + rnd.nextInt(9)).map { x =>
          t = math.max(t, x); x
        }
        Sess(evs)
      }
      u -> sessions
    }.toMap
    val maxK = users.values.map(_.size).max
    val nBatches = maxK + 5

    // delivery schedule: batch -> Seq((user, minute))
    val delivery = Array.fill(nBatches + 2)(
      scala.collection.mutable.Buffer.empty[(Long, Long)])
    var nLate, nSplit = 0
    users.foreach { case (u, sessions) =>
      var lastLate = -10
      sessions.zipWithIndex.foreach { case (sess, i0) =>
        val i = i0 + 1 // 1-based batch of prompt delivery
        val late = i0 - lastLate > 3 && rnd.nextDouble() < 0.4
        if (late) {
          lastLate = i0
          nLate += 1
          // the cluster lands whole-or-split in consecutive batches
          // i+2, i+3 — after sessions i+1, i+2 opened (ancient), and
          // sharing its batches with those prompt deliveries (mixed)
          val cut = rnd.nextInt(sess.events.size + 1)
          if (cut > 0 && cut < sess.events.size) nSplit += 1
          val (a, b) = rnd.shuffle(sess.events).splitAt(cut)
          a.foreach(m => delivery(i + 2) += ((u, m)))
          b.foreach(m => delivery(i + 3) += ((u, m)))
        } else sess.events.foreach(m => delivery(i) += ((u, m)))
      }
      // far-future flush closes the held and open sessions
      delivery(nBatches + 1) += ((u, 10000000L))
    }

    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS(), gapMinutes = gapMin)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_prop")
      .start()
    try {
      delivery.foreach { batch =>
        if (batch.nonEmpty) {
          input.addData(batch.toSeq.map { case (u, m) =>
            EventStream.SessionEvent(u, ts(m))
          })
          q.processAllAvailable()
        }
      }
      val streamed = spark.table("sess_prop").as[EventStream.SessionOut]
        .collect()
        .groupBy(_.user_id)
        .map { case (u, ss) =>
          u -> ss.map(s => (s.n_events, s.start_us, s.end_us)).sorted.toSeq
        }
      val expected = users.map { case (u, sessions) =>
        u -> sessions.map { s =>
          (s.events.size.toLong,
            s.events.min * 60000000L, s.events.max * 60000000L)
        }.sorted
      }
      assert(streamed.keySet == expected.keySet)
      expected.foreach { case (u, sess) =>
        assert(streamed(u) == sess,
          s"user $u:\n  streamed ${streamed(u)}\n  expected $sess")
      }
      // non-vacuity: the generator actually produced late AND split
      // deliveries — the cases the hold rule exists for
      assert(nLate >= 3, s"degenerate generator: only $nLate late clusters")
      assert(nSplit >= 1, s"degenerate generator: no split late cluster")
    } finally q.stop()
  }

  // ── trickle cadence (round-10 verdict item 6) ──  A key receiving
  // ONE ancient straggler per batch keeps its hold "touched" every
  // invocation, so the untouched-close liveness rule never fires.
  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
  private def runTrickle(maxHold: Int): Seq[EventStream.SessionOut] = {
    val name = s"sess_trickle_$maxHold"
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStream.SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS(), gapMinutes = gapMin,
        maxHoldInvocations = maxHold)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .start()
    try {
      // batch 0 opens the forward session; batches 1..12 each deliver
      // one ancient straggler, every one within a gap of the previous
      // (minutes 100, 110, ..., 220 — one batch-faithful island), all
      // more than a gap before the open session at minute 10000
      input.addData(Seq(EventStream.SessionEvent(1L, ts(10000L))))
      q.processAllAvailable()
      (0 to 12).foreach { i =>
        input.addData(Seq(EventStream.SessionEvent(1L, ts(100L + 10L * i))))
        q.processAllAvailable()
      }
      // far-future flush closes the open session and any live hold
      input.addData(Seq(EventStream.SessionEvent(1L, ts(10000000L))))
      q.processAllAvailable()
      spark.table(name).as[EventStream.SessionOut].collect().toSeq
    } finally q.stop()
  }

  test("trickle of ancient stragglers: unbounded hold stays batch-faithful") {
    val out = runTrickle(Int.MaxValue).map(s =>
      (s.n_events, s.start_us / 60000000L, s.end_us / 60000000L)).sorted
    // batch q_sessionize over the full multiset: the 13 stragglers are
    // ONE session (each within a gap of its neighbor) plus the closed
    // forward singleton (the flush event's own session stays OPEN and
    // unemitted) — the trickle hold may live indefinitely but merges
    // exactly what batch semantics merge
    assert(out == Seq((1L, 10000L, 10000L), (13L, 100L, 220L)).sorted,
      s"got $out")
  }

  test("trickle of ancient stragglers: maxHoldInvocations bounds hold age") {
    val cap = 3
    val out = runTrickle(cap)
    val ancient = out.filter(_.start_us < 10000L * 60000000L)
    // conservation: every straggler is in exactly one emitted session
    assert(ancient.map(_.n_events).sum == 13L, s"got $ancient")
    // the bound: no ancient session accumulated more than cap+1
    // stragglers (held cap invocations, closed on the next), so the
    // hold's state lifetime is bounded in TIME, not only by idleness
    assert(ancient.forall(_.n_events <= cap + 1L),
      s"a hold outlived its $cap-invocation bound: $ancient")
    assert(ancient.size >= 3,
      s"expected the trickle split into multiple bounded sessions: $ancient")
    // the forward session closes as usual (the flush event's own
    // session stays open and unemitted) — the knob touches only holds
    assert(out.count(_.start_us >= 10000L * 60000000L) == 1)
  }
}
