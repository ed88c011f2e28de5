package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Manual surface drive: `sbt "Test/runMain graft.StreamingDemo"` —
  * runs the Structured Streaming surface as a user would: files
  * arriving in a directory, windowed aggregation with watermark,
  * stateful sessionization; prints sink contents. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.EventStream

    // two "arriving" file batches, second one out-of-order (older ts)
    val dir = Files.createTempDirectory("graft-stream-demo").toString
    val ev = graft.engine.Tables(spark, "/root/testdata/sf0.001", "events")
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dir)

    // diagnosed(): the documented handle-wrapping pattern — a
    // state-schema restore failure surfaces under its migration rule
    // (blocking calls AND the diagnosedException polling accessor)
    val q = EventStream.diagnosed(
      EventStream.dailyCounts(EventStream.readEvents(spark, dir))
        .writeStream.outputMode("complete")
        .format("memory").queryName("demo_daily")
        .trigger(Trigger.AvailableNow()).start())
    q.awaitTermination(120000)
    println("== streaming daily counts (both file batches, incl. out-of-order) ==")
    spark.table("demo_daily").orderBy("day", "event_type").show(8, false)
    val streamTotal = spark.table("demo_daily").agg(sum("cnt")).as[Long].head()
    println(s"STREAM_TOTAL=$streamTotal BATCH_TOTAL=${ev.count()}")

    println("== stateful sessionizer over the real events table ==")
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStream.SessionEvent](spark)
    input.addData(ev.select(col("user_id"), col("ts").as("ts"))
      .as[EventStream.SessionEvent].collect().toSeq)
    val q2 = EventStream.diagnosed(EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("demo_sessions")
      .trigger(Trigger.AvailableNow()).start())
    q2.awaitTermination(120000)
    println(s"CLOSED_SESSIONS=${spark.table("demo_sessions").count()}")
    spark.table("demo_sessions").orderBy("user_id").show(5, false)
    spark.stop()
  }
}
