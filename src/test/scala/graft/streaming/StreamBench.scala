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
    // ONE file per drop + maxFilesPerTrigger=1 below: without the
    // per-trigger bound, AvailableNow drains every pre-existing file
    // in a single micro-batch and the claimed multi-batch shape (state
    // handoff between triggers) never actually runs. Drops are split
    // in EVENT-TIME order (ntile over ts) — the realistic arrival
    // shape; an id-mod split would put most of batches 2+ below the
    // watermark advanced by batch 1 and silently drop them as late.
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val staged = ev.withColumn("b", ntile(nBatches).over(w))
    (1 to nBatches).foreach { b =>
      staged.filter(col("b") === b).drop("b")
        .coalesce(1).write.mode("append").parquet(src)
    }

    def run(label: String, mode: String = "update")(
        df: org.apache.spark.sql.DataFrame): Unit = {
      val ckpt = Files.createTempDirectory(s"graft-sb-ckpt-$label").toString
      val t0 = System.nanoTime()
      val q = df.writeStream
        .outputMode(if (label == "dedup") "append" else mode)
        .format("memory").queryName(s"sb_$label")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      // a timed-out (still running) query would publish a bogus rate
      // and steal cores from the next one — fail loudly instead
      require(q.awaitTermination(600000),
        s"$label did not finish within 10 minutes")
      val secs = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      val out = spark.table(s"sb_$label").count()
      println(f"STREAMBENCH $label%-14s in_rows=$n out_rows=$out " +
        f"batches=$batches secs=$secs%.2f rows_per_sec=${n / secs}%.0f")
    }

    val events = EventStream.readEvents(spark, src, maxFilesPerTrigger = 1)
    run("sliding")(EventStream.slidingCounts(events))
    run("dedup")(EventStream.dedupEvents(events, Seq("event_id")))
    run("hll_distinct")(EventStream.uniqueUsersPerWindow(events))
    // CDC tombstone fold: per-key O(1) state (4 scalars/user)
    import spark.implicits._
    run("cdc_fold")(EventStream.cdcApplyStream(
      events.select("user_id", "ts", "event_id", "event_type", "value")
        .as[EventStream.CdcEvent]).toDF())
    // concurrency sweep monitor: per-user 1-day activity covers
    // (+1 at the event's day, −1 the day after), 3 scalars of state
    // per key — the q_peak_concurrency streaming twin at corpus rate
    val days = events.selectExpr("user_id AS nk",
      "(unix_micros(ts) - 1704067200000000L) div 86400000000L AS d")
    run("sweep_monitor")(EventStream.sweepStream(
      days.selectExpr("nk", "d", "CAST(1 AS LONG) AS delta")
        .union(days.selectExpr("nk", "d + 1 AS d", "CAST(-1 AS LONG) AS delta"))
        .as[EventStream.SweepEvent]).toDF())
    // session depth/revenue: the sessionizer core + revenue scalar,
    // 4 scalars of state per user — the q_session_dist streaming twin
    run("session_rev", "append")(EventStream.sessionRevenue(
      events.selectExpr("user_id", "ts",
        "CASE WHEN event_type = 'purchase'" +
          " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0L END AS rev")
        .as[EventStream.SessionRevEvent]).toDF())
    // growth accounting with churn timeouts: 3 scalars of state per
    // user, event-time timeout armed per update
    run("growth_acct", "append")(EventStream.growthStream(
      events.selectExpr("user_id",
        "(unix_micros(ts) - 1704067200000000L) div 86400000000L AS d")
        .as[EventStream.GrowthEvent]).toDF())
    spark.stop()
  }
}
