package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import scala.util.chaining._

/** Structured Streaming surface: the engine's event-time operators as
  * streams. The reference has no streaming (SURVEY §2.11); this is
  * part of the forward-looking extension surface. Batch queries
  * (`q_event_window`, `q_sessionize`) define the semantics; these
  * stream versions are tested for batch-equivalence on static input.
  *
  * Scale notes: watermark bounds state; the windowed agg shuffles
  * partial aggregates only; session state is per-key and O(1) per
  * event (`mapGroupsWithState`), the standard pattern for million-key
  * session tracking on a real cluster.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files
    * (files appearing in the dir == arriving micro-batches).
    * `maxFilesPerTrigger` > 0 bounds each micro-batch to that many
    * files — without it a backlog (or Trigger.AvailableNow over
    * pre-existing files) drains in ONE batch, which hides multi-batch
    * state handoff and, at scale, balloons the first batch. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(eventSchema)
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).parquet(dir)
  }

  /** Tumbling 1-day count/sum per event_type with a 1-hour watermark —
    * the streaming twin of `q_event_window` (decimal accumulation for
    * the double sum, same as the batch side's determinism contract). */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding (hopping) windowed counts — the streaming twin of
    * `q_window_hopping`: 1-day windows every 12 h, each event in
    * exactly 2 windows. Watermark bounds state to the windows still
    * open (2 per type at any watermark position); the explode-by-2
    * happens before the map-side combine, so the shuffle still moves
    * one partial row per (partition, window, type). */
  def slidingCounts(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Windowed distinct users via HLL — the streaming answer to
    * count-distinct: exact `countDistinct` needs per-key set state
    * (unbounded within a window and unsupported in streaming aggs);
    * `approx_count_distinct` keeps one mergeable fixed-size sketch per
    * (window, type) group, so state is O(groups), not O(users) — the
    * only shape that survives both 100 TB/day volume and long windows.
    * Same rsd/error contract as batch `q_approx_distinct`. */
  def uniqueUsersPerWindow(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("cnt"))
      .select(to_date(col("w.start")).as("day"), col("event_type"),
        col("approx_users"), col("cnt"))

  /** Continuous exact dedup — the streaming twin of `q_dedup_exact`'s
    * semantics anchor: first arrival of a key wins, duplicates within
    * the watermark window are dropped exactly once across micro-batches
    * (state survives restarts via the checkpoint).
    *
    * `dropDuplicatesWithinWatermark` keys state by the dedup columns
    * and EVICTS entries once the watermark passes them — the property
    * that makes continuous dedup viable on an unbounded stream (plain
    * `dropDuplicates` state grows forever). Consequence: a duplicate
    * arriving later than `watermark` after its first occurrence is NOT
    * dropped — at 100 TB/day that bound is the knob trading state size
    * against dedup horizon. For LLM-pipeline content dedup, key on the
    * content hash (e.g. `md5(text)`) instead of business keys. */
  def dedupEvents(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static dimension enrichment: left-join each event against
    * a static (batch) dimension table. THE daily-pipeline join — events
    * are unbounded, the dimension is a lookup table — and the one join
    * Structured Streaming runs stateless: the static side re-resolves
    * per micro-batch and, broadcast, ships to every task, so the
    * unbounded side is never shuffled and no join state accrues (the
    * EventStreamSpec pins BroadcastHashJoin in the micro-batch plan).
    * At 100 TB-of-events scale that is the difference between a
    * watermark-bounded stateful join and a free map-side lookup;
    * dimensions too big to broadcast belong in `correlate` instead. */
  def enrich(events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    // dataset-qualified keys: bare col() would be ambiguous whenever
    // both sides share the key's name (the most natural call)
    events.join(broadcast(dim), events(eventKey) === dim(dimKey), "left")

  /** Watermarked stream-stream inner join: correlate each left event
    * with the same user's right events in the following `windowMinutes`
    * — e.g. view→purchase attribution. Both sides carry watermarks and
    * the join condition carries the event-time interval, so Spark can
    * BOUND the join state: left rows are evicted once the right
    * watermark passes `a_ts + window`, right rows once the left
    * watermark passes them — the property that makes a stream-stream
    * join runnable forever at scale (an unconstrained join buffers both
    * streams in full). State is keyed by user_id; the shuffle is one
    * hash exchange per side on the same key. */
  def correlate(left: DataFrame, right: DataFrame,
      windowMinutes: Long = 30, watermark: String = "1 hour"): DataFrame = {
    val a = left.withWatermark("ts", watermark)
      .select(col("event_id").as("a_id"), col("user_id"),
        col("ts").as("a_ts"), col("event_type").as("a_type"))
    val b = right.withWatermark("ts", watermark)
      .select(col("event_id").as("b_id"), col("user_id").as("b_user"),
        col("ts").as("b_ts"), col("event_type").as("b_type"))
    a.join(b,
      col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select("a_id", "b_id", "user_id", "a_type", "b_type", "a_ts", "b_ts")
  }

  /** Sink-owned commit marker. Both upsert sinks used to key liveness/
    * completeness solely on the committer's `_SUCCESS`, which common
    * production configs disable
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`) — the
    * bucketed sink would then read EVERY accumulated table as a
    * partial first write and wipe it each micro-batch (round-11
    * ADVICE). The sinks now write their own marker after each
    * committed batch, so liveness never depends on committer config;
    * `_SUCCESS` is still honored for tables written by older builds. */
  private[streaming] val CommitMarker = "_graft_commit"

  private def touchMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit =
    fs.create(new org.apache.hadoop.fs.Path(dir, CommitMarker), true).close()

  private def hasMarker(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(dir, CommitMarker)) ||
      fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))

  /** Streaming MERGE INTO: maintain a keyed parquet table from a
    * stream via per-micro-batch upsert (`foreachBatch` + Merge.upsert)
    * — the streaming CDC-apply pattern. `profile` collapses each
    * micro-batch to one row per key (e.g. last event per user); the
    * batch then upserts into `targetDir` read-eagerly (localCheckpoint
    * BEFORE the overwrite — reading lazily from the dir being
    * rewritten would race). Restart safety: foreachBatch can REPLAY a
    * batch after a crash; a per-key last-write-wins profile makes the
    * re-apply idempotent, which is exactly-once for the table. At
    * scale the target is a bucketed table and only touched buckets
    * rewrite (engine/Merge.scala scaladoc); the relational core and
    * the idempotency argument are unchanged. */
  def upsertSink(updates: DataFrame, targetDir: String, keys: Seq[String],
      checkpointDir: String)(profile: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val upd = profile(batch.toDF())
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(targetDir)
        // staged swap: a direct overwrite deletes the old table BEFORE
        // the new write commits, so a mid-write crash loses the table.
        // Writing to a staging dir first means a crash during the write
        // leaves the live table untouched; after the staging write is
        // COMPLETE the swap is delete+rename. A crash between those two
        // leaves a complete staging dir and no target — recovered below.
        // Completeness is judged by the sink-owned [[CommitMarker]]
        // (written after the staging write returns; the committer's
        // _SUCCESS is honored too for pre-marker staging dirs): on the
        // FIRST-ever batch no target exists yet, so "no target +
        // staging present" alone cannot distinguish an interrupted
        // swap from a crash mid-staging-write — promoting a
        // footer-less partial dir would wedge every replay's read.
        val staging = new org.apache.hadoop.fs.Path(targetDir + ".staging")
        val fs = target.getFileSystem(conf)
        if (!fs.exists(target) && hasMarker(fs, staging))
          require(fs.rename(staging, target),
            s"recovery rename $staging -> $target failed")
        // stale staging (partial write, or complete-but-target-exists
        // from an interrupted delete) is dead weight either way: the
        // batch below recomputes from the live table + replayed input
        if (fs.exists(staging))
          require(fs.delete(staging, true),
            s"could not clear stale staging dir $staging")
        val merged =
          if (fs.exists(target)) {
            val tgt = spark.read.parquet(targetDir).localCheckpoint(true)
            // the increment is batch-sized — the key-uniqueness check is
            // cheap here and a duplicate-key profile would otherwise
            // compound duplicates into the table every micro-batch
            graft.engine.Merge.upsert(tgt, upd, keys, checkUniqueKeys = true)
          } else upd
        merged.write.mode("overwrite").parquet(staging.toString)
        touchMarker(fs, staging)
        // a silently-failed swap step would surface batches later as a
        // confusing recovery case — fail THIS batch loudly instead
        if (fs.exists(target))
          require(fs.delete(target, true), s"delete of $target failed")
        require(fs.rename(staging, target),
          s"swap rename $staging -> $target failed")
        ()
      }
      .start()
      .pipe(diagnosed)

  /** Bucketed COPY-ON-WRITE streaming upsert: the 100 TB form of
    * [[upsertSink]]. The plain sink rewrites the WHOLE target every
    * micro-batch — fine for profile tables, quadratic pain once the
    * accumulated table dwarfs the increments. Here the target is laid
    * out in `nBuckets` hash-bucket partition dirs (bucket =
    * pmod(hash(keys), n), a stable function of the merge keys), and a
    * micro-batch (1) computes which buckets its keys touch — a
    * driver-side list bounded by nBuckets, never by rows; (2) reads
    * ONLY those bucket dirs (partition-pruned scan); (3) merges; (4)
    * rewrites ONLY those dirs via dynamic partition overwrite. Per
    * batch the rewrite fraction is touched/nBuckets — for a daily
    * increment against a year's corpus that is the increment's key
    * spread, not the corpus (BucketedUpsertSinkSpec measures untouched
    * dirs byte-identical).
    *
    * Durability trade-off vs [[upsertSink]]: the staged-swap sink
    * commits the whole table atomically; dynamic partition overwrite
    * commits per partition, so a crash mid-commit can leave a touched
    * bucket at the old version while another is new. Replay makes that
    * safe: foreachBatch re-delivers the batch, the per-key
    * last-write-wins profile makes re-merge idempotent, and UNTOUCHED
    * buckets were never at risk. */
  def upsertSinkBucketed(updates: DataFrame, targetDir: String,
      keys: Seq[String], nBuckets: Int, checkpointDir: String)
      (profile: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // bucket id appended BEFORE the merge so target and update
        // agree on it (it is a pure function of the merge keys)
        val upd = profile(batch.toDF())
          .withColumn("part_bucket",
            pmod(hash(keys.map(col): _*), lit(nBuckets)))
          .localCheckpoint(true)
        val target = new org.apache.hadoop.fs.Path(targetDir)
        val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // liveness = a commit marker, not bare dir existence: a crash
        // during the FIRST batch write leaves a partial target (moved
        // part files, no marker) that the merge branch would read as
        // the real table on replay — clear the debris and let the
        // re-delivered batch rewrite it. The SINK-OWNED marker is
        // written after every committed batch (initial AND
        // dynamic-overwrite), so liveness holds even where the
        // committer's _SUCCESS is disabled; _SUCCESS alone still
        // counts for tables committed by older builds.
        val live = fs.exists(target) && hasMarker(fs, target)
        if (!live) {
          if (fs.exists(target)) {
            // only provable first-write debris may be auto-cleared: a
            // committed table of THIS sink always carries the marker,
            // so a marker-less dir holding anything but THIS SINK's
            // write shapes (part_bucket=* dirs, _temporary, hidden
            // files) is a foreign dataset — refuse, don't destroy.
            // Root-level part-* files are deliberately NOT whitelisted:
            // this sink always writes partitionBy("part_bucket"), so a
            // root part file can only be someone else's unpartitioned
            // table (e.g. committed under marksuccessfuljobs=false).
            // This diagnosis runs FIRST: its "move it aside" advice is
            // the safe one for a misconfigured targetDir, and the
            // marker-restore advice below must never be issued for a
            // dir that is not even sink-shaped.
            val foreign = fs.listStatus(target).map(_.getPath.getName)
              .filterNot(n => n.startsWith("_") || n.startsWith(".") ||
                n.startsWith("part_bucket="))
            require(foreign.isEmpty,
              s"refusing to clear $target: it has no commit marker but " +
                s"holds non-debris entries [${foreign.mkString(", ")}] — " +
                "not provably this sink's partial first write; move it " +
                "aside or delete it manually")
            // THIS sink's partial first write can only exist while
            // batch 0 is replaying: every committed batch (including
            // the one whose crash a replay recovers) left a marker
            // behind, so a sink-shaped marker-less target at
            // batchId > 0 means the marker was removed externally —
            // live data, never debris (round-12 ADVICE: the name-based
            // whitelist above alone could not tell a foreign dataset
            // partitioned by a column literally named part_bucket from
            // first-write debris)
            require(batchId == 0L,
              s"refusing to clear $target: no commit marker but the " +
                s"checkpoint shows batch ${batchId - 1} already " +
                "committed — the sink-owned marker was removed " +
                "externally; restore it (touch " +
                s"$targetDir/$CommitMarker) if the table is intact, " +
                "or move the directory aside")
            require(fs.delete(target, true),
              s"clearing partial first write at $target failed")
          }
          upd.write.partitionBy("part_bucket").parquet(targetDir)
        } else {
          val touched = upd.select("part_bucket").distinct()
            .collect().map(_.getInt(0)) // bounded by nBuckets, not rows
          // read eagerly (localCheckpoint) BEFORE the overwrite below
          // rewrites the very dirs being read
          val tgt = spark.read.parquet(targetDir)
            .filter(col("part_bucket").isin(touched.map(Integer.valueOf): _*))
            .localCheckpoint(true)
          graft.engine.Merge
            .upsert(tgt, upd, keys, checkUniqueKeys = true)
            .write.partitionBy("part_bucket").mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(targetDir)
        }
        // marker LAST: a crash before this line leaves either no table
        // (first write — debris-cleared and rewritten on replay) or the
        // previous batch's marker (merge — re-merged idempotently)
        touchMarker(fs, target)
        ()
      }
      .start()
      .pipe(diagnosed)

  /** Sessionizer state-schema version: bumped when the keyed state
    * layout changes. v2 since round 10 (`lateAge` joined
    * [[SessionFullState]]) — a checkpoint written by a v1 build fails
    * Spark's state-store schema check on restore, BY DESIGN: restart
    * the query with a fresh checkpoint directory (the sessionizer's
    * state is reconstructible from the stream; SURVEY §2.11 documents
    * the rule). [[diagnoseStateRestore]] names this instead of leaving
    * the operator with a raw STATE_STORE_*_SCHEMA_NOT_COMPATIBLE. */
  val SessionStateSchemaVersion = 2

  private val stateSchemaRule: String =
    "graft streaming state-schema mismatch: the checkpoint being " +
      "restored was written by a build whose keyed state layout " +
      "differs from this one (for the sessionizer, state schema is v" +
      SessionStateSchemaVersion + " since round 10 — SessionFullState " +
      "gained `lateAge`) and cannot migrate — delete the checkpoint " +
      "directory and restart fresh (state is reconstructible from the " +
      "stream). Do NOT set " +
      "spark.sql.streaming.stateStore.stateSchemaCheck=false: decoding " +
      "old state bytes with the new layout is silent corruption. " +
      "See SURVEY.md §2.11 'state-schema note'."

  /** Maps Spark's state-store schema-incompatibility (anywhere in `t`'s
    * cause chain — it usually surfaces wrapped in a
    * StreamingQueryException) to an [[IllegalStateException]] carrying
    * the documented migration rule; any other throwable is returned
    * unchanged. Wrap awaitTermination/processAllAvailable:
    * `try q.awaitTermination() catch { case e: Throwable => throw
    * EventStream.diagnoseStateRestore(e) }`. */
  def diagnoseStateRestore(t: Throwable): Throwable = {
    def chain(x: Throwable, seen: Set[Throwable] = Set.empty): List[Throwable] =
      if (x == null || seen(x)) Nil
      else x :: chain(x.getCause, seen + x)
    val hit = chain(t).exists { c =>
      val cond = c match {
        case st: org.apache.spark.SparkThrowable =>
          Option(st.getCondition).getOrElse("")
        case _ => ""
      }
      cond.startsWith("STATE_STORE_KEY_SCHEMA_NOT_COMPATIBLE") ||
        cond.startsWith("STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE") ||
        Option(c.getMessage).exists(m =>
          m.contains("does not match existing state") ||
            m.contains("StateSchemaNotCompatible"))
    }
    if (hit) new IllegalStateException(stateSchemaRule, t) else t
  }

  /** Wires [[diagnoseStateRestore]] into a running query: the returned
    * delegate is the same StreamingQuery, but awaitTermination /
    * processAllAvailable rethrow a state-schema restore failure under
    * its documented name instead of the raw Spark condition, and the
    * POLLED path — [[DiagnosedStreamingQuery.diagnosedException]] —
    * applies the same mapping (round-12 ADVICE: `exception` alone
    * still surfaced the raw condition to operators who never block on
    * the query). Every query THIS module starts is wrapped; wrap
    * user-started session queries (the sessionizers return Datasets,
    * so their query handle is user-constructed) the same way:
    * `EventStream.diagnosed(ds.writeStream…start())`. */
  def diagnosed(q: org.apache.spark.sql.streaming.StreamingQuery)
      : DiagnosedStreamingQuery =
    new DiagnosedStreamingQuery(q)

  /** [[diagnosed]]'s delegate. `exception` still returns Spark's
    * StreamingQueryException verbatim (the class is not publicly
    * constructible, so it cannot be re-wrapped in kind) —
    * [[diagnosedException]] is the polling accessor that carries the
    * documented migration rule when the failure is a state-schema
    * restore; monitoring code should prefer it. */
  final class DiagnosedStreamingQuery(
      q: org.apache.spark.sql.streaming.StreamingQuery)
      extends org.apache.spark.sql.streaming.StreamingQuery {
    private def mapped[T](body: => T): T =
      try body catch { case t: Throwable => throw diagnoseStateRestore(t) }
    def name: String = q.name
    def id: java.util.UUID = q.id
    def runId: java.util.UUID = q.runId
    def sparkSession: org.apache.spark.sql.SparkSession = q.sparkSession
    def isActive: Boolean = q.isActive
    def exception
        : Option[org.apache.spark.sql.streaming.StreamingQueryException] =
      q.exception
    /** [[exception]] passed through [[diagnoseStateRestore]]: a
      * state-schema restore failure polls as the named
      * IllegalStateException (original attached as cause); any other
      * failure polls as the raw StreamingQueryException. */
    def diagnosedException: Option[Throwable] =
      q.exception.map(diagnoseStateRestore)
    def status: org.apache.spark.sql.streaming.StreamingQueryStatus =
      q.status
    def recentProgress
        : Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      q.recentProgress
    def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      q.lastProgress
    def awaitTermination(): Unit = mapped(q.awaitTermination())
    def awaitTermination(timeoutMs: Long): Boolean =
      mapped(q.awaitTermination(timeoutMs))
    def processAllAvailable(): Unit = mapped(q.processAllAvailable())
    def stop(): Unit = q.stop()
    def explain(): Unit = q.explain()
    def explain(extended: Boolean): Unit = q.explain(extended)
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessionRevEvent(user_id: Long, ts: java.sql.Timestamp,
      rev: Long)
  final case class SessionState(start: Long, end: Long, n: Long, rev: Long)
  /** Keyed session state: the open session plus an optional HELD
    * ancient-late session (round-9: late clusters arriving more than a
    * gap before the open session used to close at micro-batch end, so
    * a cluster SPLIT across batches split into two sessions where
    * batch q_sessionize merges them — holding the late session one
    * invocation lets the next batch's stragglers merge in). */
  final case class SessionFullState(cur: SessionState,
      late: Option[SessionState], lateAge: Int = 0)
  final case class SessionOut(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long)
  final case class SessionRevOut(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long, rev_cents: Long)

  /** Shared stateful-session core: 30-min inactivity gap closes a
    * session, and each session carries an ADDITIVE payload (event
    * count + revenue cents) that merges under the same late-cluster
    * rules as the count. [[sessionize]] is the count-only view;
    * [[sessionRevenue]] is the q_session_dist twin. */
  private def sessionCore(events: Dataset[SessionRevEvent],
      gapMinutes: Long, evictWithTimeout: Boolean,
      maxHoldInvocations: Int = Int.MaxValue): Dataset[SessionRevOut] = {
    require(maxHoldInvocations >= 1,
      s"maxHoldInvocations must be >= 1, got $maxHoldInvocations")
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, evs: Iterator[SessionRevEvent],
        state: GroupState[SessionFullState]): Iterator[SessionRevOut] = {
      if (state.hasTimedOut) {
        val st = state.get
        state.remove()
        val s = st.cur
        return st.late match {
          // flush order and merge rule match the in-batch close path
          case Some(l) if s.start - l.end <= gapUs =>
            Iterator(SessionRevOut(userId, s.n + l.n,
              math.min(l.start, s.start), s.end, s.rev + l.rev))
          case Some(l) =>
            Iterator(SessionRevOut(userId, l.n, l.start, l.end, l.rev),
              SessionRevOut(userId, s.n, s.start, s.end, s.rev))
          case None =>
            Iterator(SessionRevOut(userId, s.n, s.start, s.end, s.rev))
        }
      }
      // full microsecond precision: getTime truncates to ms, getNanos
      // carries the in-second fraction (batch q_sessionize uses
      // unix_micros — equivalence requires matching precision)
      val sorted = evs.map { e =>
        ((e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L, e.rev)
      }.toArray.sortBy(_._1)
      val prior = state.getOption
      // ── island merge ──  This batch's events plus the carried-over
      // open session and held ancient-late session are sorted by start
      // and linearly merged on the gap rule — EXACTLY batch
      // q_sessionize's interval semantics over the visible multiset
      // ((n, rev) are additive, start/end are min/max, so merging is
      // associative and order-free within an island). Flags:
      //   - allAncient: every member arrived strictly more than a gap
      //     BEFORE the round-start open session (the only islands a
      //     future straggler could still legitimately join — forward
      //     islands close on gap, the streaming emission contract);
      //   - touched: contains an event from THIS batch. A held late
      //     island nothing touched has had a full extra invocation to
      //     grow and closes now (liveness: one invocation, not forever).
      case class Isl(start: Long, end: Long, n: Long, rev: Long,
          allAncient: Boolean, touched: Boolean)
      val curStart0 = prior.map(_.cur.start)
      val items =
        sorted.map { case (t, r) =>
          Isl(t, t, 1L, r, curStart0.exists(cs => t < cs - gapUs), touched = true)
        } ++
        prior.map(p =>
          Isl(p.cur.start, p.cur.end, p.cur.n, p.cur.rev, false, false)) ++
        prior.flatMap(_.late).map(l =>
          Isl(l.start, l.end, l.n, l.rev, allAncient = true, touched = false))
      val islands = items.sortBy(i => (i.start, i.end))
        .foldLeft(List.empty[Isl]) {
          case (h :: rest, i) if i.start - h.end <= gapUs =>
            Isl(h.start, math.max(h.end, i.end), h.n + i.n, h.rev + i.rev,
              h.allAncient && i.allAncient, h.touched || i.touched) :: rest
          case (acc, i) => i :: acc
        }.reverse
      // the final island (it contains the open session or a newer
      // event, so it is never all-ancient) stays open; of the islands
      // before it, the LAST pure ancient-late cluster this batch
      // touched is held for next-batch stragglers — anywhere before
      // cur, not only adjacent to it: a batch can carry a late
      // fragment AND a new forward session, and the fragment must
      // still hold or its next-batch half re-splits. All other
      // islands — earlier ancient clusters, old open sessions outrun
      // by a newer event, untouched holds — close now, in time order.
      val newCur = islands.last
      val (closeNow0, hold0) = {
        val init = islands.init
        val idx = init.lastIndexWhere(i => i.allAncient && i.touched)
        if (idx >= 0) (init.patch(idx, Nil, 1), Some(init(idx)))
        else (init, None)
      }
      // ── hold-age bound ──  A key fed ONE ancient straggler per batch
      // keeps its hold "touched" every invocation, so the untouched-
      // close liveness rule alone never fires — batch-faithful (batch
      // would merge the whole trickle) but unbounded state IN TIME.
      // `maxHoldInvocations` caps it: a hold CHAIN (this invocation's
      // hold interval overlapping the prior invocation's — merges only
      // extend, so overlap ⇔ continuation) that has been alive that
      // many invocations closes now instead of holding again; the next
      // straggler then starts a NEW session (a deliberate divergence
      // from batch semantics, documented in SURVEY §2.11 — the default
      // Int.MaxValue keeps the exact batch-faithful behavior).
      val prevLate = prior.flatMap(_.late)
      val chained = (hold0, prevLate) match {
        case (Some(h), Some(o)) => h.start <= o.end && h.end >= o.start
        case _ => false
      }
      val age =
        if (hold0.isEmpty) 0
        else if (chained) math.min(prior.get.lateAge, Int.MaxValue - 1) + 1
        else 1
      val (closeNow, hold) =
        if (hold0.isDefined && age > maxHoldInvocations)
          (closeNow0 :+ hold0.get, None)
        else (closeNow0, hold0)
      val closed = closeNow.sortBy(i => (i.start, i.end)).map(i =>
        SessionRevOut(userId, i.n, i.start, i.end, i.rev))
      state.update(SessionFullState(
        SessionState(newCur.start, newCur.end, newCur.n, newCur.rev),
        hold.map(i => SessionState(i.start, i.end, i.n, i.rev)),
        if (hold.isDefined) age else 0))
      if (evictWithTimeout) state.setTimeoutDuration(gapMinutes * 60L * 1000L)
      closed.iterator
    }

    val timeoutConf =
      if (evictWithTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }

  /** Stateful sessionizer: 30-min inactivity gap closes a session —
    * the streaming twin of `q_sessionize`, via `flatMapGroupsWithState`.
    * Emits sessions as they close (a newer event beyond the gap).
    *
    * `evictWithTimeout = true` additionally registers a processing-time
    * timeout so idle keys flush their last open session and free state
    * — required for unbounded keyspaces in production, but it keeps
    * the query permanently "live" (a micro-batch per trigger even with
    * no data), so one-shot/AvailableNow runs should leave it off. */
  def sessionize(events: Dataset[SessionEvent], gapMinutes: Long = 30,
      evictWithTimeout: Boolean = false,
      maxHoldInvocations: Int = Int.MaxValue): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    sessionCore(events.map(e => SessionRevEvent(e.user_id, e.ts, 0L)),
        gapMinutes, evictWithTimeout, maxHoldInvocations)
      .map(o => SessionOut(o.user_id, o.n_events, o.start_us, o.end_us))
  }

  /** Streaming session depth/revenue — the streaming twin of batch
    * `q_session_dist`: closed sessions emit (depth, exact revenue
    * cents) and the batch histogram is one fold over the emissions
    * (bucket by least(depth, 10), count / count(rev > 0) / sum / max).
    * State is four scalars per user (the sessionizer's three plus the
    * revenue accumulator — still O(1) per event); revenue merges under
    * the same late-cluster rules as the count, so a late burst that
    * batch semantics would merge carries its cents along.
    * SessionDistStreamSpec pins closed-session equality against a
    * scalar recompute of the batch session definition. */
  def sessionRevenue(events: Dataset[SessionRevEvent], gapMinutes: Long = 30,
      evictWithTimeout: Boolean = false,
      maxHoldInvocations: Int = Int.MaxValue): Dataset[SessionRevOut] =
    sessionCore(events, gapMinutes, evictWithTimeout, maxHoldInvocations)

  final case class AdmitEvent(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp)
  final case class AdmitOut(event_id: Long, user_id: Long, rank: Long)

  /** Streaming per-key admission cap — the streaming counterpart of
    * q_sample_quota's "at most N per group": each key admits its first
    * `n` events and drops the rest, the ingest throttle a collection
    * pipeline runs at the edge (per-user contribution caps, abuse
    * limits, bounded sampling of unbounded streams). Admission is
    * first-come across micro-batches (ordered by event time then id
    * WITHIN a batch, so replaying a batch is deterministic); state is
    * ONE counter per key — O(keys), never O(events) — the only
    * admission-control state shape that survives an unbounded stream. */
  def admitFirstN(events: Dataset[AdmitEvent], n: Long): Dataset[AdmitOut] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[AdmitEvent],
        state: GroupState[Long]): Iterator[AdmitOut] = {
      var admitted = state.getOption.getOrElse(0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[AdmitOut]
      evs.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (admitted < n) {
          admitted += 1
          out += AdmitOut(e.event_id, userId, admitted)
        }
      }
      state.update(admitted)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class PatternEvent(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, event_type: String)
  final case class PatternState(stage: Int, hits: Long)
  final case class PatternHit(user_id: Long, purchase_id: Long, n_hits: Long)

  /** Streaming sequence-pattern detection (CEP) — the streaming twin
    * of batch `q_event_pattern`: per user, a view → click → purchase
    * run with no error between completes a conversion; each completion
    * emits a hit (carrying the finishing purchase's id and the user's
    * running hit count) and resets the machine for the next run. Where
    * the batch query materializes the whole history string and runs a
    * regex, the stream keeps TWO integers per user (stage ∈ {0,1,2},
    * hit count) — O(keys) state, the only shape an unbounded stream
    * admits — and the machine is the regex: stage k = "matched the
    * first k literals with no intervening error" (AnalyticsOpsSpec
    * pins the machine ≡ regex on batch data; the streaming spec pins
    * single-batch ≡ multi-batch). Events sort by (event-time,
    * event_id) WITHIN a micro-batch, so replaying a batch is
    * deterministic; cross-batch order is arrival order (the documented
    * streaming residual — a conversion split across batches with a
    * late error between them resolves by arrival). */
  final case class AnomalyEvent(event_id: Long, event_type: String,
      ts: java.sql.Timestamp, value: Double)
  final case class MomentState(n: Long, s1: Long, s2: Long)
  final case class AnomalyHit(event_id: Long, event_type: String,
      value: Double, z: Double, n_seen: Long)

  /** Streaming z-score anomaly detection — the streaming twin of batch
    * `q_standardize`: per event type, maintain running moments and
    * flag events whose value sits more than `zThreshold` deviations
    * from the mean of everything SEEN BEFORE them (prequential — the
    * event never tests against a mean it already moved, so the first
    * |z|>τ spike after warm-up is caught, not absorbed). State is
    * three integers per key (n, Σv, Σv² in 1e-4 fixed point) —
    * O(keys), exact, order-free; z uses the batch operator's cleared
    * formula z = (n·x − s1)/√(n·s2 − s1²). Int64 horizon: Σv² ≲ 9e18
    * holds to ~290k max-magnitude events per key; a production stream
    * widens s2 to a split 128-bit accumulator at the same API.
    * Warm-up: nothing flags before `minN` observations. Events order
    * by (event-time, id) within a micro-batch (deterministic replay);
    * cross-batch order is arrival order, the documented streaming
    * residual shared with [[detectPattern]]. */
  def detectAnomalies(events: Dataset[AnomalyEvent], zThreshold: Double,
      minN: Long = 30L): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    def fn(eventType: String, evs: Iterator[AnomalyEvent],
        state: GroupState[MomentState]): Iterator[AnomalyHit] = {
      var st = state.getOption.getOrElse(MomentState(0L, 0L, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
      evs.toArray
        .sortBy(e => ((e.ts.getTime / 1000L) * 1000000L +
          e.ts.getNanos / 1000L, e.event_id))
        .foreach { e =>
          val vfp = math.floor(e.value * 10000.0).toLong
          if (st.n >= minN) {
            val num = (st.n * vfp - st.s1).toDouble
            val den = math.sqrt((st.n * st.s2 - st.s1 * st.s1).toDouble)
            val z = if (den == 0.0) { if (num == 0.0) 0.0 else Double.PositiveInfinity * math.signum(num) }
              else num / den
            if (math.abs(z) > zThreshold)
              out += AnomalyHit(e.event_id, eventType, e.value, z, st.n)
          }
          st = MomentState(st.n + 1, st.s1 + vfp, st.s2 + vfp * vfp)
        }
      state.update(st)
      out.iterator
    }
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class SketchEvent(user_id: Long, event_type: String)
  final case class BottomKState(hvs: List[Long], users: List[Long])
  final case class SketchOut(event_type: String, size: Long, h_k: Long,
      est_ndv: Long, users: Seq[Long])

  /** Streaming bottom-k distinct sketch — the streaming twin of batch
    * `q_bottomk`, and the proof that the sketch is truly mergeable:
    * the state after ANY sequence of micro-batches equals the batch
    * bottom-k of the union (min-k of a set is order-free), so the
    * streaming answer is exactly the batch answer at every point of
    * the stream — BottomKStreamSpec pins this against q_bottomk on
    * the same corpus. State per key is k (hash, user) pairs (k=5 here,
    * production k≈256 — O(k) bytes per key regardless of stream
    * length); the hash is the [[graft.functions.HashSample]] md5
    * construction evaluated JVM-side, bit-identical to the SQL twin.
    * Emission is Update-mode: one refreshed sketch row per key per
    * micro-batch, carrying the (k−1)·2³²/h₍ₖ₎ cardinality probe. */
  def bottomKSketch(events: Dataset[SketchEvent],
      k: Int = 5): Dataset[SketchOut] = {
    import events.sparkSession.implicits._
    def hv(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def fn(et: String, evs: Iterator[SketchEvent],
        state: GroupState[BottomKState]): SketchOut = {
      val prev = state.getOption
        .map(s => s.hvs.zip(s.users)).getOrElse(Nil)
      val merged = (prev ++ evs.map(e => (hv(e.user_id), e.user_id)))
        .distinct.sorted.take(k)
      state.update(BottomKState(merged.map(_._1), merged.map(_._2)))
      val hk = merged.last._1
      SketchOut(et, merged.size.toLong, hk,
        if (merged.size == k) (k - 1).toLong * 4294967296L / hk else -1L,
        merged.map(_._2))
    }
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  final case class BinEvent(key: String, bin: Long)
  final case class HistState(bins: Map[Long, Long], n: Long)
  final case class DriftOut(key: String, n: Long, tvd_num: Long, tvd: Double)

  /** Streaming total-variation drift monitor — the streaming twin of
    * batch `q_tvd`: per key, accumulate a bin histogram in state and
    * after every micro-batch emit TVD against a FIXED reference
    * histogram (the training distribution), via the same cleared-
    * integer form Σ|c·n_ref − r·n| / (2·n_ref·n) with the identical
    * division order, so the streamed value over the full corpus is
    * BIT-EQUAL to the batch query (TvdStreamSpec pins it). State is
    * the bounded fixed-point bin map (≤ ~5k bins by construction) —
    * O(bins) per key regardless of stream length; the reference rides
    * the closure (dictionary-sized, a broadcast at scale). */
  def tvdDrift(events: Dataset[BinEvent],
      ref: Map[String, Map[Long, Long]]): Dataset[DriftOut] = {
    import events.sparkSession.implicits._
    def fn(key: String, evs: Iterator[BinEvent],
        state: GroupState[HistState]): DriftOut = {
      val st = state.getOption.getOrElse(HistState(Map.empty, 0L))
      var bins = st.bins
      var n = st.n
      evs.foreach { e =>
        bins = bins.updated(e.bin, bins.getOrElse(e.bin, 0L) + 1L)
        n += 1L
      }
      state.update(HistState(bins, n))
      val refH = ref.getOrElse(key, Map.empty)
      val nRef = refH.values.sum
      if (nRef == 0L)
        // a key with NO reference mass is maximal drift by definition
        // (the observed distribution shares zero mass with the
        // reference) — without this guard the cleared-integer form
        // degenerates to 0/0 = NaN and every `tvd > x` threshold
        // comparison is silently false, so a brand-new key would
        // never be flagged. tvd_num carries n (= the un-cleared
        // numerator Σ|0 − c·1| against an empty reference).
        DriftOut(key, n, n, 1.0)
      else {
        val num = (bins.keySet ++ refH.keySet).toSeq.map { b =>
          math.abs(refH.getOrElse(b, 0L) * n - bins.getOrElse(b, 0L) * nRef)
        }.sum
        // division order matches batch q_tvd exactly: num/2/n_ref/n
        DriftOut(key, n, num,
          num.toDouble / 2.0 / nRef.toDouble / n.toDouble)
      }
    }
    events.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  final case class CdcEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String, value: Double)
  final case class CdcState(n_live: Long, live_since: Long,
      last_type: String, last_value: Double)
  final case class CdcOut(user_id: Long, n_live: Long, live_since: Long,
      last_type: String, last_value: Double)

  /** Streaming CDC fold — the streaming twin of batch `q_cdc_apply`:
    * per user, fold the changelog into current state with DELETE
    * tombstones (`error` events clear ALL accumulated state; later
    * events re-insert). State is four scalars per key — O(1) per
    * event regardless of history length, the million-key pattern.
    * Emission is Update-mode: one refreshed state row per user per
    * micro-batch; a tombstoned user emits n_live = 0 (the retraction
    * a downstream sink turns into a DELETE).
    *
    * Ordering contract: in-batch events sort by (event time,
    * event_id) — identical to the batch query's window order; ACROSS
    * micro-batches events apply in arrival order (the standard
    * streaming-CDC behavior — a source that replays the log in time
    * order, like the file source over dated files, reproduces the
    * batch fold exactly; CdcStreamSpec pins that equality). */
  def cdcApplyStream(events: Dataset[CdcEvent]): Dataset[CdcOut] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[CdcEvent],
        state: GroupState[CdcState]): CdcOut = {
      var st = state.getOption.getOrElse(CdcState(0L, 0L, null, 0.0))
      evs.toArray
        .sortBy(e => ((e.ts.getTime / 1000L) * 1000000L +
          e.ts.getNanos / 1000L, e.event_id))
        .foreach { e =>
          if (e.event_type == "error") st = CdcState(0L, 0L, null, 0.0)
          else {
            val sinceU = (e.ts.getTime / 1000L) * 1000000L + e.ts.getNanos / 1000L
            st = CdcState(st.n_live + 1L,
              if (st.n_live == 0L) sinceU else st.live_since,
              e.event_type, e.value)
          }
        }
      state.update(st)
      CdcOut(userId, st.n_live, st.live_since, st.last_type, st.last_value)
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  def detectPattern(events: Dataset[PatternEvent]): Dataset[PatternHit] = {
    import events.sparkSession.implicits._
    def fn(userId: Long, evs: Iterator[PatternEvent],
        state: GroupState[PatternState]): Iterator[PatternHit] = {
      var st = state.getOption.getOrElse(PatternState(0, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[PatternHit]
      evs.toArray
        .sortBy(e => ((e.ts.getTime / 1000L) * 1000000L +
          e.ts.getNanos / 1000L, e.event_id))
        .foreach { e =>
          e.event_type match {
            case "error" => st = st.copy(stage = 0)
            case "view" => if (st.stage == 0) st = st.copy(stage = 1)
            case "click" => if (st.stage == 1) st = st.copy(stage = 2)
            case "purchase" => if (st.stage == 2) {
              st = PatternState(0, st.hits + 1)
              out += PatternHit(userId, e.event_id, st.hits)
            }
            case _ => ()
          }
        }
      state.update(st)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class SweepEvent(nk: Long, d: Long, delta: Long)
  final case class SweepState(openPrev: Long, peak: Long, peak_day: Long,
      curDay: Long, curNet: Long)
  final case class SweepOut(nk: Long, open: Long, peak_open: Long,
      peak_day: Long)

  /** Streaming concurrency monitor — the streaming twin of batch
    * `q_peak_concurrency` (Intervals.sweepPeak): per key, fold dated
    * ±deltas into (current open, running peak, first day the peak was
    * reached). State is five scalars per key — O(1) per event, the
    * million-key pattern. The peak is a property of the END-OF-DAY
    * level, so the in-progress day is BUFFERED in state as
    * (curDay, curNet) and folds into the committed peak only when a
    * later day arrives — a day whose deltas straddle micro-batches
    * (+3 in one batch, −2 in the next) therefore never commits a
    * partial level the batch query's net end-of-day level would not
    * reach. Emissions provisionally close the in-progress day, so
    * every emitted row equals batch sweepPeak applied to exactly the
    * prefix of data seen so far (SweepStreamSpec pins the equality,
    * including a day split across batches). Strict `>` on the peak
    * update keeps the EARLIEST peak day (the batch argmax tie-break).
    * Contract: days arrive non-decreasing across micro-batches. */
  def sweepStream(events: Dataset[SweepEvent]): Dataset[SweepOut] = {
    import events.sparkSession.implicits._
    val NoDay = Long.MinValue
    def fn(nk: Long, evs: Iterator[SweepEvent],
        state: GroupState[SweepState]): SweepOut = {
      var st = state.getOption.getOrElse(
        SweepState(0L, Long.MinValue, 0L, NoDay, 0L))
      evs.toArray.groupBy(_.d).toArray.sortBy(_._1)
        .foreach { case (d, des) =>
          val net = des.map(_.delta).sum
          if (st.curDay == NoDay) st = st.copy(curDay = d, curNet = net)
          else if (d <= st.curDay) st = st.copy(curNet = st.curNet + net)
          else {
            val lvl = st.openPrev + st.curNet
            st =
              if (lvl > st.peak) SweepState(lvl, lvl, st.curDay, d, net)
              else SweepState(lvl, st.peak, st.peak_day, d, net)
          }
        }
      state.update(st)
      // provisional close: the in-progress day's net counts as its
      // end-of-day level for the emission, but stays revisable in state
      if (st.curDay == NoDay) SweepOut(nk, 0L, st.peak, st.peak_day)
      else {
        val lvl = st.openPrev + st.curNet
        if (lvl > st.peak) SweepOut(nk, lvl, lvl, st.curDay)
        else SweepOut(nk, lvl, st.peak, st.peak_day)
      }
    }
    events.groupByKey(_.nk)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  final case class BarTick(d: Long, us: Long, event_id: Long, fp: Long)
  final case class BarState(firstKey: (Long, Long), open: Long, high: Long,
      low: Long, lastKey: (Long, Long), close: Long, n: Long)
  final case class BarOut(d: Long, open_fp: Long, high_fp: Long,
      low_fp: Long, close_fp: Long, n_ticks: Long)

  /** Streaming OHLC bars — the streaming twin of batch `q_ohlc`: per
    * day key, fold ticks into (open, high, low, close, count). State
    * is seven scalars per key; open/close carry their (time,
    * event_id) keys so a late-arriving tick still lands in the right
    * slot (min/max on the TOTAL order, not arrival order — this fold
    * is therefore arrival-order-INSENSITIVE, unlike the sweep's
    * prefix sum: any replay order reaches the batch bars, BarsStream
    * Spec pins equality on a deliberately shuffled replay). The
    * closed-day emission is what an incremental bar store upserts. */
  def barsStream(events: Dataset[BarTick]): Dataset[BarOut] = {
    import events.sparkSession.implicits._
    def fn(d: Long, evs: Iterator[BarTick],
        state: GroupState[BarState]): BarOut = {
      var st = state.getOption.orNull
      evs.foreach { e =>
        val k = (e.us, e.event_id)
        st =
          if (st == null)
            BarState(k, e.fp, e.fp, e.fp, k, e.fp, 1L)
          else BarState(
            if (Ordering[(Long, Long)].lt(k, st.firstKey)) k else st.firstKey,
            if (Ordering[(Long, Long)].lt(k, st.firstKey)) e.fp else st.open,
            math.max(st.high, e.fp), math.min(st.low, e.fp),
            if (Ordering[(Long, Long)].gt(k, st.lastKey)) k else st.lastKey,
            if (Ordering[(Long, Long)].gt(k, st.lastKey)) e.fp else st.close,
            st.n + 1L)
      }
      state.update(st)
      BarOut(d, st.open, st.high, st.low, st.close, st.n)
    }
    events.groupByKey(_.d)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  final case class GrowthEvent(user_id: Long, d: Long)
  final case class GrowthEventTs(user_id: Long, d: Long,
      ets: java.sql.Timestamp)
  final case class GrowthState(firstDay: Long, lastDay: Long,
      churnedAt: Long)
  final case class GrowthOut(user_id: Long, d: Long, role: String)

  /** Streaming growth accounting — the streaming twin of batch
    * `q_growth_acct`, now covering ALL FOUR roles: per user, three
    * scalars of state (first active day, last active day, last
    * emitted churn day) classify every fresh active day as it
    * arrives ("new" on the first ever, "retained" when yesterday was
    * active, "resurrected" after a dark gap). CHURN is an ABSENCE,
    * so it emits on one of two triggers, whichever comes first:
    * (a) an EVENT-TIME TIMEOUT — churn at lastDay+1 is knowable once
    * the watermark passes the end of day lastDay+1, so each update
    * arms a timeout there and the dark user's churn emits from state
    * with no further events; or (b) a resurrecting arrival, which
    * closes the previous run and emits its churn alongside the
    * "resurrected" row. `churnedAt` dedups the two paths — each run
    * end emits exactly once. Emissions are per (user, day) — the
    * batch day-grain counts are one fold over them; GrowthStreamSpec
    * pins all four classes to batch q_growth_acct on a day-ordered
    * replay. In-batch days fold in day order; duplicate days
    * collapse. The horizon rule matches batch: churn at day d needs
    * the watermark past d's end, just as the batch query never
    * reports churn beyond its last observed day.
    *
    * ONE DELIBERATE DIVERGENCE: churn lands at the user's true
    * lastDay+1 in event time even when that calendar day has zero
    * corpus-wide activity, while batch q_growth_acct's day-grain
    * report left-joins churn onto days with ≥1 active user and so
    * silently drops churn on a fully-dark day. The stream is the
    * finer-grained truth; a consumer reconciling against the batch
    * report must restrict to (or re-bucket onto) batch-reported
    * days. GrowthStreamSpec pins both sides: exact per-day equality
    * on batch-reported days, and dark-day churn accounted in total. */
  def growthStream(events: Dataset[GrowthEvent]): Dataset[GrowthOut] = {
    import events.sparkSession.implicits._
    val NoChurn = Long.MinValue
    def fn(uid: Long, evs: Iterator[GrowthEventTs],
        state: GroupState[GrowthState]): Iterator[GrowthOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[GrowthOut]
      if (state.hasTimedOut) {
        val st = state.get
        if (st.churnedAt != st.lastDay + 1) {
          out += GrowthOut(uid, st.lastDay + 1, "churned")
          state.update(st.copy(churnedAt = st.lastDay + 1))
        }
        // run closed; the next arrival (a resurrection) re-arms
      } else {
        var st = state.getOption.orNull
        evs.map(_.d).toArray.distinct.sorted.foreach { d =>
          if (st == null) {
            out += GrowthOut(uid, d, "new")
            st = GrowthState(d, d, NoChurn)
          } else if (d > st.lastDay) {
            if (d == st.lastDay + 1) {
              out += GrowthOut(uid, d, "retained")
              st = GrowthState(st.firstDay, d, st.churnedAt)
            } else {
              val churnDay = st.lastDay + 1
              if (st.churnedAt != churnDay)
                out += GrowthOut(uid, churnDay, "churned")
              out += GrowthOut(uid, d, "resurrected")
              st = GrowthState(st.firstDay, d, churnDay)
            }
          } // d <= lastDay: replayed/duplicate day — already classified
        }
        if (st != null) {
          state.update(st)
          // knowable once the watermark passes END of day lastDay+1 =
          // start of day lastDay+2 (clamped above the watermark: the
          // API rejects a timeout at or before it)
          state.setTimeoutTimestamp(math.max(
            (st.lastDay + 2) * 86400000L,
            state.getCurrentWatermarkMs() + 1))
        }
      }
      out.iterator
    }
    // the event time of an active-day record is the day's CLOSE
    // ((d+1)·86400): day-0 records would otherwise sit exactly on the
    // initial watermark (epoch 0) and be dropped as late, and "the
    // watermark passed day d" reads directly as "day d is over"
    events
      .withColumn("ets", expr("timestamp_seconds((d + 1) * 86400)"))
      .as[GrowthEventTs]
      .withWatermark("ets", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
