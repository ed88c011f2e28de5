package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.BinEvent

/** The streaming/batch bridge for drift: streamed over the month's
  * second half against the first half as reference, the monitor's
  * final TVD must be BIT-EQUAL to batch q_tvd (same cleared integers,
  * same division order), regardless of micro-batch splits. */
class TvdStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed TVD over the second half bit-equals batch q_tvd") {
    val binned = graft.engine.Tables(spark, sf, "events")
      .select(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L < 15")
        .as("h1"), floor(col("value") * 10).cast("long").as("bin"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val ref = Map("all" -> binned.filter(_._1).map(_._2)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong })
    val stream = binned.filterNot(_._1).map(x => BinEvent("all", x._2))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BinEvent](spark)
    val q = EventStream.tvdDrift(input.toDS(), ref)
      .writeStream.outputMode("update")
      .format("memory").queryName("tvd_out")
      .start()
    try {
      val (a, rest) = stream.splitAt(stream.length / 4)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val fin = spark.sql(
        "SELECT n, tvd FROM tvd_out ORDER BY n DESC LIMIT 1").collect().head
      assert(fin.getLong(0) == stream.length.toLong)
      val batch = SparkEntry.queries("q_tvd")(spark, sf).collect().head
      assert(fin.getDouble(1) == batch.getDouble(2),
        s"streamed ${fin.getDouble(1)} != batch ${batch.getDouble(2)}")
      // drift against the stream's own first emission must be larger
      // or equal once more data arrives only if distributions differ;
      // at minimum the value is a valid TVD
      assert(fin.getDouble(1) >= 0.0 && fin.getDouble(1) <= 1.0)
    } finally q.stop()
  }
}
