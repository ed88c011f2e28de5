package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.streaming.EventStream.SketchEvent

/** The mergeability proof for the bottom-k sketch: streamed in
  * arbitrary micro-batch splits, the final state must equal batch
  * q_bottomk on the same corpus — min-k of a set is order-free, so
  * the streaming answer IS the batch answer. Also pins the JVM-side
  * md5 hash against the SQL HashSample construction. */
class BottomKStreamSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("JVM hash matches the SQL HashSample md5 construction") {
    val sqlSide = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id")).distinct()
      .withColumn("hv", expr(graft.functions.HashSample.sparkRaw("user_id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hv(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    sqlSide.foreach { case (u, h) => assert(hv(u) == h, s"user $u") }
  }

  test("streamed sketch state equals batch q_bottomk after arbitrary splits") {
    val events = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"))
      .collect().map(r => SketchEvent(r.getLong(0), r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SketchEvent](spark)
    val q = EventStream.bottomKSketch(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("bk_out")
      .start()
    try {
      // three uneven micro-batches — mergeability means the split
      // points cannot matter
      val (a, rest) = events.splitAt(events.length / 3)
      val (b, c) = rest.splitAt(rest.length / 5)
      Seq(a, b, c).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // LAST update per key is the final state
      val streamed = spark.sql(
        """SELECT event_type, h_k, est_ndv, users FROM (
          |  SELECT *, row_number() OVER (PARTITION BY event_type
          |    ORDER BY size DESC, h_k ASC) AS rn FROM bk_out) WHERE rn = 1
          |""".stripMargin)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getSeq[Long](3)))).toMap
      val batch = SparkEntry.queries("q_bottomk")(spark, sf).collect()
        .groupBy(_.getString(0))
      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (et, rows) =>
        val users = rows.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
        val hk = rows.maxBy(_.getLong(1)).getLong(3)
        val est = rows.find(_.getLong(1) == 5).get.getLong(4)
        val (sHk, sEst, sUsers) = streamed(et)
        assert(sUsers == users, s"$et members diverge")
        assert(sHk == hk && sEst == est, s"$et probe diverges")
      }
    } finally q.stop()
  }
}
