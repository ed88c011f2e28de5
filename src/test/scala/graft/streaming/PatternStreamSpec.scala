package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.{PatternEvent, PatternHit}

/** Streaming CEP semantics: the per-user v→c→p (no error between)
  * machine must hand its stage across micro-batches, reset on errors,
  * count repeated conversions, and — fed the full corpus in event-time
  * order — agree with batch q_event_pattern's regex verdict. */
class PatternStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  private def newStream() = org.apache.spark.sql.execution.streaming.runtime
    .MemoryStream[PatternEvent](spark)

  test("pattern machine hands state across micro-batches, resets on error") {
    val input = newStream()
    val q = EventStream.detectPattern(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_out")
      .start()
    try {
      // user 1: v | c | p across three batches -> one hit at the p
      // user 2: v,c | e | p -> the error wipes the stage, no hit
      // user 3: v,c,p,v | c,p -> two conversions, n_hits 1 then 2
      input.addData(Seq(
        PatternEvent(10L, 1L, ts(0), "view"),
        PatternEvent(20L, 2L, ts(0), "view"),
        PatternEvent(21L, 2L, ts(1), "click"),
        PatternEvent(30L, 3L, ts(0), "view"),
        PatternEvent(31L, 3L, ts(1), "click"),
        PatternEvent(32L, 3L, ts(2), "purchase"),
        PatternEvent(33L, 3L, ts(3), "view")))
      q.processAllAvailable()
      input.addData(Seq(
        PatternEvent(11L, 1L, ts(10), "click"),
        PatternEvent(22L, 2L, ts(10), "error"),
        PatternEvent(34L, 3L, ts(10), "click"),
        PatternEvent(35L, 3L, ts(11), "purchase")))
      q.processAllAvailable()
      input.addData(Seq(
        PatternEvent(12L, 1L, ts(20), "purchase"),
        PatternEvent(23L, 2L, ts(20), "purchase")))
      q.processAllAvailable()
      val hits = spark.table("cep_out").as[PatternHit].collect()
        .sortBy(h => (h.user_id, h.n_hits)).toSeq
      assert(hits == Seq(
        PatternHit(1L, 12L, 1L),
        PatternHit(3L, 32L, 1L), PatternHit(3L, 35L, 2L)), hits.toString)
    } finally q.stop()
  }

  test("streamed corpus in event-time order agrees with batch regex") {
    val evs = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[PatternEvent].collect()
      .sortBy(e => ((e.ts.getTime / 1000L) * 1000000L +
        e.ts.getNanos / 1000L, e.event_id)).toSeq
    val (h1, h2) = evs.splitAt(evs.length / 2)
    val input = newStream()
    val q = EventStream.detectPattern(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cep_corpus")
      .start()
    try {
      input.addData(h1); q.processAllAvailable()
      input.addData(h2); q.processAllAvailable()
      val streamedUsers = spark.table("cep_corpus")
        .select("user_id").distinct().as[Long].collect().toSet
      val batchUsers = SparkEntry.queries("q_event_pattern")(
        spark, "/root/testdata/sf0.001")
        .filter(col("converted_clean"))
        .select("user_id").as[Long].collect().toSet
      assert(streamedUsers == batchUsers,
        s"stream-only: ${streamedUsers -- batchUsers}, " +
          s"batch-only: ${batchUsers -- streamedUsers}")
    } finally q.stop()
  }
}
