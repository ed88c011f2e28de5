package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.SparkSuite

// v1-shaped keyed-state layouts: each mirrors what an OLDER build of
// the matching operator would have persisted (one field short of
// today's layout), so a checkpoint written with one is exactly the
// artifact an operator hits after upgrading a build in place.
case class V1SessionState(cur: EventStream.SessionState,
    late: Option[EventStream.SessionState])
case class V1GrowthState(firstDay: Long, lastDay: Long)
case class V1SweepState(openPrev: Long, peak: Long, peak_day: Long,
    curDay: Long)
case class V1PatternState(stage: Int)

/** Round-12 verdict item 5: every stateful streaming operator, not
  * just the sessionizer, must surface a state-schema restore failure
  * under the documented migration rule. Each test writes a REAL
  * checkpoint with a v1-shaped clone of the operator (same key type,
  * same timeout conf, one state field short), then restores the
  * CURRENT operator from it through [[EventStream.diagnosed]] and
  * asserts the named error — on the blocking call AND on the polled
  * `diagnosedException` accessor (round-12 ADVICE: operators watching
  * `q.exception` never saw the rule). */
class StatefulRestoreSpec extends SparkSuite {
  import spark.implicits._
  import EventStream._

  private def tsOf(min: Long) =
    new java.sql.Timestamp(1700000000000L + min * 60000L)

  /** Writes a checkpoint by running `old` (the v1-shaped clone) over
    * `rows1`, appends `rows2` as a fresh micro-batch, restores `real`
    * from the same checkpoint, and asserts the diagnosed failure. A
    * FILE source (not MemoryStream) so the restore replays cleanly
    * across two distinct queries. */
  private def assertDiagnosedRestore[I <: Product](
      rows1: Seq[I], rows2: Seq[I], outputMode: String)(
      old: Dataset[I] => Dataset[_])(real: Dataset[I] => Dataset[_])(
      implicit enc: org.apache.spark.sql.Encoder[I]): Unit = {
    val base = Files.createTempDirectory("graft-v1-restore")
    val in = base.resolve("in").toString
    val ckpt = base.resolve("ckpt").toString
    rows1.toDS().write.mode("append").parquet(in)
    def stream() = spark.readStream.schema(enc.schema).parquet(in).as[I]
    val q1 = old(stream()).writeStream.outputMode(outputMode)
      .option("checkpointLocation", ckpt).format("noop").start()
    try q1.processAllAvailable() finally q1.stop()
    rows2.toDS().write.mode("append").parquet(in)
    val q2 = EventStream.diagnosed(real(stream()).writeStream
      .outputMode(outputMode).option("checkpointLocation", ckpt)
      .format("noop").start())
    try {
      val e = intercept[IllegalStateException](q2.processAllAvailable())
      assert(e.getMessage.contains("delete the checkpoint directory"),
        e.getMessage)
      assert(e.getMessage.contains("SURVEY.md"), e.getMessage)
      val polled = q2.diagnosedException
      assert(polled.exists(
        _.getMessage.contains("delete the checkpoint directory")),
        s"polled diagnosedException must carry the rule, got: $polled")
    } finally q2.stop()
  }

  test("sessionize: restoring a v1 (pre-lateAge) checkpoint names the rule") {
    def v1fn(uid: Long, evs: Iterator[SessionEvent],
        st: GroupState[V1SessionState]): Iterator[Long] = {
      val us = evs.map(e =>
        (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L).toArray
      if (us.nonEmpty) {
        val cur = st.getOption.map(_.cur)
        st.update(V1SessionState(SessionState(
          math.min(us.min, cur.map(_.start).getOrElse(Long.MaxValue)),
          math.max(us.max, cur.map(_.end).getOrElse(Long.MinValue)),
          us.length + cur.map(_.n).getOrElse(0L), 0L), None))
      }
      Iterator.empty
    }
    assertDiagnosedRestore[SessionEvent](
      Seq(SessionEvent(1L, tsOf(0)), SessionEvent(1L, tsOf(1))),
      Seq(SessionEvent(1L, tsOf(120))), "append")(
      ds => ds.groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(v1fn))(
      ds => sessionize(ds))
  }

  test("sessionRevenue: restoring a v1 checkpoint names the rule") {
    def v1fn(uid: Long, evs: Iterator[SessionRevEvent],
        st: GroupState[V1SessionState]): Iterator[Long] = {
      val n = evs.size.toLong
      if (n > 0)
        st.update(V1SessionState(SessionState(0L, 0L, n, 0L), None))
      Iterator.empty
    }
    assertDiagnosedRestore[SessionRevEvent](
      Seq(SessionRevEvent(1L, tsOf(0), 100L)),
      Seq(SessionRevEvent(1L, tsOf(120), 50L)), "append")(
      ds => ds.groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(v1fn))(
      ds => sessionRevenue(ds))
  }

  test("growthStream: restoring a v1 (pre-churnedAt) checkpoint names the rule") {
    def v1fn(uid: Long, evs: Iterator[GrowthEventTs],
        st: GroupState[V1GrowthState]): Iterator[GrowthOut] = {
      if (!st.hasTimedOut) {
        val days = evs.map(_.d).toArray
        if (days.nonEmpty) {
          val prev = st.getOption
          st.update(V1GrowthState(
            prev.map(_.firstDay).getOrElse(days.min),
            math.max(days.max,
              prev.map(_.lastDay).getOrElse(Long.MinValue))))
          st.setTimeoutTimestamp(math.max((days.max + 2) * 86400000L,
            st.getCurrentWatermarkMs() + 1))
        }
      }
      Iterator.empty
    }
    assertDiagnosedRestore[GrowthEvent](
      Seq(GrowthEvent(1L, 0L), GrowthEvent(1L, 1L)),
      Seq(GrowthEvent(1L, 5L)), "append")(
      ds => ds.withColumn("ets", expr("timestamp_seconds((d + 1) * 86400)"))
        .as[GrowthEventTs]
        .withWatermark("ets", "0 seconds")
        .groupByKey(_.user_id)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(v1fn))(
      ds => growthStream(ds))
  }

  test("sweepStream: restoring a v1 (pre-curNet) checkpoint names the rule") {
    def v1fn(nk: Long, evs: Iterator[SweepEvent],
        st: GroupState[V1SweepState]): SweepOut = {
      val sum = evs.map(_.delta).sum
      val prev = st.getOption.getOrElse(
        V1SweepState(0L, Long.MinValue, 0L, 0L))
      st.update(V1SweepState(prev.openPrev + sum, prev.peak,
        prev.peak_day, prev.curDay))
      SweepOut(nk, prev.openPrev + sum, prev.peak, prev.peak_day)
    }
    assertDiagnosedRestore[SweepEvent](
      Seq(SweepEvent(1L, 0L, 3L)),
      Seq(SweepEvent(1L, 1L, -2L)), "update")(
      ds => ds.groupByKey(_.nk)
        .mapGroupsWithState(GroupStateTimeout.NoTimeout)(v1fn))(
      ds => sweepStream(ds))
  }

  test("detectPattern: restoring a v1 (pre-hits) checkpoint names the rule") {
    def v1fn(uid: Long, evs: Iterator[PatternEvent],
        st: GroupState[V1PatternState]): Iterator[PatternHit] = {
      st.update(V1PatternState(evs.size))
      Iterator.empty
    }
    assertDiagnosedRestore[PatternEvent](
      Seq(PatternEvent(1L, 1L, tsOf(0), "view")),
      Seq(PatternEvent(2L, 1L, tsOf(1), "click")), "append")(
      ds => ds.groupByKey(_.user_id).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(v1fn))(
      ds => detectPattern(ds))
  }
}
