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

  test("a key with no reference mass reads as maximal drift, not NaN") {
    val ref = Map("known" -> Map(0L -> 5L, 1L -> 5L))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[BinEvent](spark)
    val q = EventStream.tvdDrift(input.toDS(), ref)
      .writeStream.outputMode("update")
      .format("memory").queryName("tvd_unseen")
      .start()
    try {
      input.addData(Seq(BinEvent("known", 0L), BinEvent("known", 1L),
        BinEvent("brand_new", 3L), BinEvent("brand_new", 4L)))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT key, n, tvd FROM tvd_unseen").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      // a brand-new key shares zero mass with the reference: maximal
      // drift by definition — pre-fix this was 0/0 = NaN, so every
      // `tvd > threshold` alert comparison was silently false
      assert(rows("brand_new") == (2L, 1.0), s"got ${rows("brand_new")}")
      assert(!rows("known")._2.isNaN && rows("known")._2 == 0.0,
        s"known-key TVD must stay exact: ${rows("known")}")
    } finally q.stop()
  }
}
