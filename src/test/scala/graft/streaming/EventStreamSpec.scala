package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.engine.Tables

class EventStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming daily counts == batch q_event_window counts") {
    // stage the static events table as a "stream" directory
    val dir = Files.createTempDirectory("graft-stream").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)

    val q = EventStream.dailyCounts(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate")

    val streamed = spark.table("daily_out")
      .select(col("day"), col("event_type"), col("cnt"), col("sum_value"))
      .as[(java.sql.Date, String, Long, Double)].collect().toSet
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .as[(java.sql.Date, String, Long, Double)].collect().toSet
    assert(streamed == batch) // incl. the double sum — decimal-accumulated
  }

  test("streaming sliding counts == batch q_window_hopping aggregation") {
    val dir = Files.createTempDirectory("graft-stream-slide").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)

    val q = EventStream.slidingCounts(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("slide_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate")

    val streamed = spark.table("slide_out")
      .select(col("w_start"), col("event_type"), col("cnt"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed == batch) // each event in exactly 2 windows, both engines
  }

  test("streaming approx distinct users == batch sketch, inside error bound") {
    val dir = Files.createTempDirectory("graft-stream-hll").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)

    val q = EventStream.uniqueUsersPerWindow(EventStream.readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate")

    val streamed = spark.table("hll_out")
      .select(col("day"), col("event_type"), col("approx_users"))
      .as[(java.sql.Date, String, Long)].collect()
      .map { case (d, t, n) => ((d, t), n) }.toMap
    val exact = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Date, String, Long)].collect()
      .map { case (d, t, n) => ((d, t), n) }.toMap
    assert(streamed.keySet == exact.keySet)
    // the sketch is deterministic on fixed data; same rsd envelope as
    // batch q_approx_distinct (rsd 0.02, asserted at 5x)
    streamed.foreach { case (k, approx) =>
      val ex = exact(k).toDouble
      assert(math.abs(approx - ex) <= math.max(ex * 0.1, 2.0),
        s"$k: approx $approx exact $ex")
    }
  }

  test("file sink + checkpoint: restart resumes exactly-once") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val base = Files.createTempDirectory("graft-eo")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)

    def runOnce(): Unit = {
      val q = input.toDS().toDF()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "streaming query did not terminate")
    }

    input.addData(Seq(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(1))))
    runOnce() // run 1 commits batch 1
    input.addData(Seq(SessionEvent(2L, ts(2))))
    runOnce() // "restart": same checkpoint, must process ONLY batch 2

    val rows = spark.read.parquet(sink).collect()
    assert(rows.length == 3, s"expected exactly-once total 3, got ${rows.length}")
    // re-run with NO new data: nothing may be appended
    runOnce()
    assert(spark.read.parquet(sink).count() == 3)
  }

  test("admitFirstN caps each key across micro-batches with O(keys) state") {
    import EventStream.{AdmitEvent, AdmitOut}
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[AdmitEvent](spark)
    val out = EventStream.admitFirstN(input.toDS(), 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("admit_out")
      .trigger(Trigger.AvailableNow())

    // batch 1: user 1 over-contributes (3 events), user 2 sends one —
    // in-batch admission must follow (ts, id) order, not arrival order
    input.addData(Seq(AdmitEvent(13L, 1L, ts(3)), AdmitEvent(11L, 1L, ts(1)),
      AdmitEvent(12L, 1L, ts(2)), AdmitEvent(21L, 2L, ts(1))))
    assert(q.start().awaitTermination(60000))
    // batch 2: user 1 is already at the cap (state carries the count);
    // user 2 admits exactly one more
    input.addData(Seq(AdmitEvent(14L, 1L, ts(4)), AdmitEvent(22L, 2L, ts(5)),
      AdmitEvent(23L, 2L, ts(6))))
    assert(q.start().awaitTermination(60000))

    val got = spark.table("admit_out").as[AdmitOut].collect()
      .map(a => (a.event_id, a.user_id, a.rank)).toSet
    assert(got == Set((11L, 1L, 1L), (12L, 1L, 2L), // 13 dropped: over cap
      (21L, 2L, 1L), (22L, 2L, 2L))) // 14, 23 dropped
  }

  test("detectAnomalies flags prequential outliers, state spans micro-batches") {
    import EventStream.{AnomalyEvent, AnomalyHit}
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[AnomalyEvent](spark)
    val out = EventStream.detectAnomalies(input.toDS(), zThreshold = 3.0,
      minN = 8)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("anomaly_out")
      .trigger(Trigger.AvailableNow())

    // batch 1: 8 calm values (alternating 10/12) warm the moments;
    // nothing may flag during warm-up even though early z is noisy
    val calm = (1 to 8).map(i =>
      AnomalyEvent(i.toLong, "click", ts(i.toLong),
        if (i % 2 == 0) 12.0 else 10.0))
    input.addData(calm)
    assert(q.start().awaitTermination(60000))
    assert(spark.table("anomaly_out").isEmpty)

    // batch 2: a spike, then more calm, then a second LARGER spike —
    // both must flag (state carried the batch-1 moments), calm must
    // not; the second spike needs more magnitude because the first
    // one legitimately inflated the running variance (masking)
    input.addData(Seq(
      AnomalyEvent(9L, "click", ts(9), 100.0),
      AnomalyEvent(10L, "click", ts(10), 11.0),
      AnomalyEvent(11L, "click", ts(11), -200.0)))
    assert(q.start().awaitTermination(60000))

    val got = spark.table("anomaly_out").as[AnomalyHit].collect()
      .map(h => h.event_id -> h.z).toMap
    assert(got.keySet == Set(9L, 11L), s"flagged ${got.keySet}")
    assert(got(9L) > 3.0 && got(11L) < -3.0)

    // scalar re-derivation of event 9's z from the 8 warm-up values
    val vfp = calm.map(e => math.floor(e.value * 10000.0).toLong)
    val (n, s1, s2) = (vfp.length.toLong, vfp.sum, vfp.map(v => v * v).sum)
    val x = math.floor(100.0 * 10000.0).toLong
    val expected = (n * x - s1).toDouble /
      math.sqrt((n * s2 - s1 * s1).toDouble)
    assert(math.abs(got(9L) - expected) < 1e-12)
  }

  test("stream-stream join == batch join, matching across micro-batches") {
    import org.apache.spark.sql.Row
    // modern base time: epoch-adjacent event times sit below the initial
    // watermark's state-cleanup predicate and are evicted before matching
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Row(id, new java.sql.Timestamp(1700000000000L + min * 60000L), user, typ, 0.0, "{}")
    implicit val enc = org.apache.spark.sql.Encoders.row(EventStream.eventSchema)
    val views = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row](spark)
    val purchases = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row](spark)
    val q = EventStream.correlate(views.toDF(), purchases.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("corr_out")
      .start()
    try {
      // batch 1: view for users 1 and 2; purchase for user 2 (+10 min)
      views.addData(Seq(ev(1, 1L, 0, "view"), ev(2, 2L, 0, "view")))
      purchases.addData(Seq(ev(3, 2L, 10, "purchase")))
      q.processAllAvailable()
      // batch 2: user 1 purchases 20 min after the buffered view (joins
      // ACROSS batches via state), user 3 purchases with no view
      purchases.addData(Seq(ev(4, 1L, 20, "purchase"), ev(5, 3L, 25, "purchase"),
        ev(6, 1L, 200, "purchase"))) // beyond the 30-min window: no match
      q.processAllAvailable()
      val got = spark.table("corr_out")
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got == Set((2L, 3L), (1L, 4L)), got.toString)
    } finally q.stop()
  }

  test("stream-static enrichment == batch join, broadcast in the batch plan") {
    val dir = Files.createTempDirectory("graft-enrich-stream").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    val dim = Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"), col("c_mktsegment"))

    val q = EventStream.enrich(EventStream.readEvents(spark, dir), dim,
        "user_id", "c_custkey")
      .select(col("event_id"), col("c_mktsegment"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "streaming query did not terminate")
      // the static side must broadcast: no shuffle on the unbounded side,
      // no stateful join operator in the micro-batch plan
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming
          .runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      assert(!plan.contains("StreamingSymmetricHashJoin"), plan.take(2000))
    } finally q.stop()

    val streamed = spark.table("enrich_out")
      .as[(Long, String)].collect().toSet
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .join(dim, col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("upsertSink maintains a keyed table across micro-batches (streaming CDC apply)") {
    import org.apache.spark.sql.Row
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Row(id, new java.sql.Timestamp(1700000000000L + min * 60000L), user, typ, 0.0, "{}")
    implicit val enc = org.apache.spark.sql.Encoders.row(EventStream.eventSchema)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row](spark)
    val target = Files.createTempDirectory("graft-upsert-target").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-upsert-ckpt").toString

    // per-batch profile: last event per user (ts, then event_id tiebreak)
    def profile(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("ts").as("last_ts"), col("event_type").as("last_type"))
    }
    val q = EventStream.upsertSink(src.toDF(), target, Seq("user_id"), ckpt)(profile)
    try {
      src.addData(Seq(ev(1, 1L, 0, "view"), ev(2, 2L, 5, "click")))
      q.processAllAvailable()
      src.addData(Seq(ev(3, 1L, 10, "purchase"), ev(4, 3L, 12, "signup")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.parquet(target)
      .select(col("user_id"), col("last_type"))
      .as[(Long, String)].collect().toSet
    // user 1 updated by batch 2, user 2 carried over, user 3 inserted
    assert(got == Set((1L, "purchase"), (2L, "click"), (3L, "signup")))
  }

  test("upsertSink recovers an interrupted staged swap") {
    import org.apache.spark.sql.Row
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Row(id, new java.sql.Timestamp(1700000000000L + min * 60000L), user, typ, 0.0, "{}")
    implicit val enc = org.apache.spark.sql.Encoders.row(EventStream.eventSchema)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row](spark)
    val target = Files.createTempDirectory("graft-upsert-rec").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-upsert-rec-ckpt").toString
    def profile(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"))
    }
    val q = EventStream.upsertSink(src.toDF(), target, Seq("user_id"), ckpt)(profile)
    try {
      src.addData(Seq(ev(1, 1L, 0, "view")))
      q.processAllAvailable()
      // simulate a crash between delete(target) and rename(staging):
      // the COMPLETE table sits at .staging, target is gone
      val conf = spark.sparkContext.hadoopConfiguration
      val tp = new org.apache.hadoop.fs.Path(target)
      val sp = new org.apache.hadoop.fs.Path(target + ".staging")
      val fs = tp.getFileSystem(conf)
      assert(fs.rename(tp, sp), "test setup: could not stage the table")
      // next batch must first finish the swap, then merge on top of it
      src.addData(Seq(ev(2, 2L, 5, "click")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(target)
      .as[(Long, String)].collect().toSet
    // user 1 survived the interrupted swap, user 2 merged in after it
    assert(got == Set((1L, "view"), (2L, "click")))
  }

  test("upsertSink discards a PARTIAL staging dir instead of promoting it") {
    // the first-ever batch has no target yet, so "no target + staging
    // present" alone cannot distinguish an interrupted swap from a
    // crash mid-staging-write — only a staging dir with the committer's
    // _SUCCESS marker may be promoted; a footer-less partial dir must
    // be cleared (promoting it would wedge every replay's read)
    import org.apache.spark.sql.Row
    def ev(id: Long, user: Long, min: Long, typ: String) =
      Row(id, new java.sql.Timestamp(1700000000000L + min * 60000L), user, typ, 0.0, "{}")
    implicit val enc = org.apache.spark.sql.Encoders.row(EventStream.eventSchema)
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Row](spark)
    val target = Files.createTempDirectory("graft-upsert-part").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-upsert-part-ckpt").toString
    // simulate the crash BEFORE any batch: partial parquet write (no
    // _SUCCESS, truncated file), no target
    val stagingDir = java.nio.file.Paths.get(target + ".staging")
    java.nio.file.Files.createDirectories(stagingDir)
    java.nio.file.Files.write(stagingDir.resolve("part-00000.parquet"),
      "not a parquet footer".getBytes)
    def profile(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"))
    }
    val q = EventStream.upsertSink(src.toDF(), target, Seq("user_id"), ckpt)(profile)
    try {
      src.addData(Seq(ev(1, 1L, 0, "view")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(target)
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "view")))
    assert(!java.nio.file.Files.exists(stagingDir), "stale staging must be cleared")
  }

  test("streaming dedup == batch dropDuplicates on static input") {
    // stage the static events table as a stream; dedup on
    // (user_id, event_type) must match the batch distinct-key count
    val dir = Files.createTempDirectory("graft-dedup-stream").toString
    Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    val q = EventStream.dedupEvents(
        EventStream.readEvents(spark, dir), Seq("user_id", "event_type"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate")
    val streamed = spark.table("dedup_out").count()
    val batch = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "event_type").distinct().count()
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
  }

  test("streaming dedup drops cross-batch duplicates exactly once, restart-safe") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val base = Files.createTempDirectory("graft-dedup-eo")
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)

    def runOnce(): Unit = {
      val q = EventStream.dedupEvents(input.toDS().toDF(), Seq("user_id"),
          watermark = "2 hours")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(60000), "streaming query did not terminate")
    }

    input.addData(Seq(SessionEvent(1L, ts(0)), SessionEvent(1L, ts(1)),
      SessionEvent(2L, ts(2))))
    runOnce() // user 1 deduped within the batch
    // "restart": same checkpoint — user 1's state must survive, so its
    // batch-2 duplicate is dropped; user 3 is new
    input.addData(Seq(SessionEvent(1L, ts(3)), SessionEvent(3L, ts(4))))
    runOnce()
    val users = spark.read.parquet(sink)
      .select("user_id").as[Long].collect().sorted.toSeq
    assert(users == Seq(1L, 2L, 3L), users.toString)
  }

  test("sessionizer tolerates out-of-order events across micro-batches") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)
    // one continuous query, two micro-batches: batch 2 carries a LATE
    // event (5 min) then 40 min — 40 is only 20 past the true last
    // event (20), so the session must NOT close (a backwards-moving
    // session end would close it at 35-min apparent gap)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ooo_sessions")
      .start()
    try {
      input.addData(Seq(SessionEvent(7L, ts(0)), SessionEvent(7L, ts(20))))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(7L, ts(5)), SessionEvent(7L, ts(40))))
      q.processAllAvailable()
      assert(spark.table("ooo_sessions").count() == 0,
        spark.table("ooo_sessions").collect().mkString(","))
    } finally q.stop()
  }

  test("ancient late events within one gap merge into one late session") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_cluster")
      .start()
    try {
      input.addData(Seq(SessionEvent(9L, ts(200)), SessionEvent(9L, ts(210))))
      q.processAllAvailable()
      // a late CLUSTER: 0 and 10 min are within one gap of each other,
      // both more than a gap before the open session (200) — batch
      // semantics merge them into ONE session of 2 events. The cluster
      // is HELD one invocation for cross-batch stragglers (round-9),
      // so nothing closes yet…
      input.addData(Seq(SessionEvent(9L, ts(0)), SessionEvent(9L, ts(10))))
      q.processAllAvailable()
      assert(spark.table("late_cluster").count() == 0,
        spark.table("late_cluster").collect().mkString(","))
      // …and the next batch for the key (nothing extends the hold)
      // closes it as ONE merged session
      input.addData(Seq(SessionEvent(9L, ts(220))))
      q.processAllAvailable()
      val out = spark.table("late_cluster").as[EventStream.SessionOut].collect()
      assert(out.length == 1, out.mkString(","))
      assert(out.head.n_events == 2 && out.head.start_us == 0L &&
        out.head.end_us == 10L * 60L * 1000000L)
    } finally q.stop()
  }

  test("late cluster SPLIT across micro-batches merges via the held state") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_split")
      .start()
    try {
      input.addData(Seq(SessionEvent(11L, ts(200)), SessionEvent(11L, ts(210))))
      q.processAllAvailable()
      // the ancient-late cluster arrives SPLIT across two micro-batches
      // (0,10 then 20): pre-round-9 the batch boundary split it into
      // two emitted sessions; the held state must merge all three as
      // batch q_sessionize does
      input.addData(Seq(SessionEvent(11L, ts(0)), SessionEvent(11L, ts(10))))
      q.processAllAvailable()
      input.addData(Seq(SessionEvent(11L, ts(20))))
      q.processAllAvailable()
      assert(spark.table("late_split").count() == 0,
        spark.table("late_split").collect().mkString(","))
      // a batch that does NOT extend the hold closes it, merged
      input.addData(Seq(SessionEvent(11L, ts(215))))
      q.processAllAvailable()
      val out = spark.table("late_split").as[EventStream.SessionOut].collect()
      assert(out.length == 1, out.mkString(","))
      assert(out.head.n_events == 3 && out.head.start_us == 0L &&
        out.head.end_us == 20L * 60L * 1000000L, out.mkString(","))
    } finally q.stop()
  }

  test("late cluster merges when a merge event pulls the open start backward") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_pullback")
      .start()
    try {
      input.addData(Seq(SessionEvent(4L, ts(100))))
      q.processAllAvailable()
      // batch 2: 69 is ancient-late vs start=100 (gap 30), but 71 then
      // merges and moves start to 71 — 69 is now within gap of the open
      // session, so batch semantics make ONE session {69,71,100}: no
      // closed session may be emitted
      input.addData(Seq(SessionEvent(4L, ts(69)), SessionEvent(4L, ts(71))))
      q.processAllAvailable()
      assert(spark.table("late_pullback").count() == 0,
        spark.table("late_pullback").collect().mkString(","))
      // a later event beyond the gap closes it: must be the merged 69..100
      input.addData(Seq(SessionEvent(4L, ts(200))))
      q.processAllAvailable()
      val out = spark.table("late_pullback").as[EventStream.SessionOut].collect()
      assert(out.length == 1 && out.head.n_events == 3 &&
        out.head.start_us == 69L * 60L * 1000000L &&
        out.head.end_us == 100L * 60L * 1000000L, out.mkString(","))
    } finally q.stop()
  }

  test("late cluster merges even when the session closes mid-batch") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SessionEvent](spark)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_midbatch")
      .start()
    try {
      input.addData(Seq(SessionEvent(5L, ts(100))))
      q.processAllAvailable()
      // ONE batch: 69 (late), 71 (pulls start back to 71 — now within
      // gap of 69), 500 (closes the session IN the same batch). Batch
      // semantics: one merged closed session {69,71,100}, open {500}.
      input.addData(Seq(SessionEvent(5L, ts(69)), SessionEvent(5L, ts(71)),
        SessionEvent(5L, ts(500))))
      q.processAllAvailable()
      val out = spark.table("late_midbatch").as[EventStream.SessionOut].collect()
      assert(out.length == 1 && out.head.n_events == 3 &&
        out.head.start_us == 69L * 60L * 1000000L &&
        out.head.end_us == 100L * 60L * 1000000L, out.mkString(","))
    } finally q.stop()
  }

  test("stateful sessionizer closes sessions on gap (mapGroupsWithState)") {
    import EventStream.SessionEvent
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // user 1: events at 0,10,20 min (one session), then 60,65 (second)
    val evs = Seq(
      SessionEvent(1L, ts(0)), SessionEvent(1L, ts(10)), SessionEvent(1L, ts(20)),
      SessionEvent(1L, ts(60)), SessionEvent(1L, ts(65)),
      SessionEvent(2L, ts(5)))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent](
      spark)
    input.addData(evs)
    val q = EventStream.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "streaming query did not terminate")
      // first session of user 1 closes when the 60-min event arrives
      val closed = spark.table("sessions_out")
        .as[EventStream.SessionOut].collect()
      assert(closed.exists(s => s.user_id == 1L && s.n_events == 3 &&
        s.start_us == 0L && s.end_us == 20L * 60L * 1000000L))
    } finally q.stop()
  }
}
