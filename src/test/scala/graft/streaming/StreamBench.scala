package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput micro-bench (manual main, not a test): pumps
  * the sf events table through the file source into `slidingCounts`
  * and `dedupEvents` and reports end-to-end rows/s — so the streaming
  * operators carry a measured number like every batch operator does
  * (EventStreamSpec proves their semantics; this measures their rate).
  *
  * Run: sbt "Test/runMain graft.streaming.StreamBench [sfDir] [nBatches]"
  *
  * Shape notes: the input is split into `nBatches` parquet drops so
  * the run covers multiple micro-batches (state handoff included, not
  * just one big batch); rates include source listing, state store
  * maintenance, and sink I/O — the honest end-to-end number.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.engine.Tables(spark, dir, "events")
    val n = ev.count()
    val src = Files.createTempDirectory("graft-streambench").toString
    (0 until nBatches).foreach { b =>
      ev.filter(pmod(col("event_id"), lit(nBatches)) === b)
        .write.mode("append").parquet(src)
    }

    def run(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = Files.createTempDirectory(s"graft-sb-ckpt-$label").toString
      val t0 = System.nanoTime()
      val q = df.writeStream
        .outputMode(if (label == "dedup") "append" else "update")
        .format("memory").queryName(s"sb_$label")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(600000)
      val secs = (System.nanoTime() - t0) / 1e9
      val out = spark.table(s"sb_$label").count()
      println(f"STREAMBENCH $label%-14s in_rows=$n out_rows=$out " +
        f"secs=$secs%.2f rows_per_sec=${n / secs}%.0f")
    }

    val events = EventStream.readEvents(spark, src)
    run("sliding")(EventStream.slidingCounts(events))
    run("dedup")(EventStream.dedupEvents(events, Seq("event_id")))
    run("hll_distinct")(EventStream.uniqueUsersPerWindow(events))
    spark.stop()
  }
}
