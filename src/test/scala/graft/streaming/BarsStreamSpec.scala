package graft.streaming

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.BarTick

/** Streaming/batch bridge for the OHLC fold — and a stronger claim
  * than the sweep's: because open/close are argmin/argmax on the
  * (time, event_id) TOTAL order held in state, the fold is
  * arrival-order-INSENSITIVE. The replay below is deliberately
  * SHUFFLED (md5-order, days interleaved across micro-batches) and
  * the final per-day state must still equal batch q_ohlc exactly. */
class BarsStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed bars over a shuffled replay equal batch q_ohlc") {
    val ticks = graft.engine.Tables(spark, sf, "events")
      .selectExpr("(unix_micros(ts) - 1704067200000000) div 86400000000 AS d",
        "unix_micros(ts) AS us", "event_id",
        "CAST(floor(value * 10000) AS LONG) AS fp")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (d, us, id, fp) => BarTick(d, us, id, fp) }
      // adversarial order: md5 of event_id — neither time- nor
      // day-clustered
      .sortBy(e => java.security.MessageDigest.getInstance("MD5")
        .digest(e.event_id.toString.getBytes)
        .map("%02x".format(_)).mkString)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BarTick](spark)
    val q = EventStream.barsStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("bars_out")
      .start()
    try {
      val (a, rest) = ticks.splitAt(ticks.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("bars_out")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .groupBy(_._1)
      val batch = SparkEntry.queries("q_ohlc")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap

      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (d, expect) =>
        // the tick-count only reaches the batch value once every tick
        // arrived — that emission is the day's final state and must
        // equal the batch bar in every field
        val fin = streamed(d).filter(_._6 == expect._6)
        assert(fin.nonEmpty, s"day $d never reached its final tick count")
        assert(fin.distinct.length == 1 && fin.head == expect,
          s"day $d: streamed ${fin.head} != batch $expect")
      }
    } finally q.stop()
  }
}
