package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total",...} for the driver.
  *
  * Each query is executed through the noop sink so the FULL physical
  * plan runs (a bare count() would let Catalyst elide top-level sorts
  * and projections). A warm-up query first: JVM/codegen/parquet-footer
  * warm-up otherwise lands on whichever query runs first.
  *
  * Host-load variance on a shared box measured ~2× on single runs
  * (round 1: 64 s vs 128 s, same code), which would drown any
  * round-over-round regression signal — so every query runs
  * SPARK_GRAFT_ITERS times (default 3) and the reported per-query and
  * total numbers are MEDIANS; single-run min/max totals are emitted
  * alongside for a noise bound.
  */
object Bench {
  /** Pass-`p` sweep order (1-based) for an `iters`-pass run: the
    * sorted name list rotated by (p−1)·n/iters. Extracted so
    * BenchScheduleSpec can pin the rotation (round-13 verdict item 2:
    * a fixed alphabetical sweep made per-query mins sample the same
    * wall-clock position every pass, so slow host drift masqueraded
    * as movement of whatever queries sat at the sweep tail — this
    * one line of measurement infrastructure now underwrites every
    * round-over-round claim and must not be revertible silently).
    * Deterministic (no RNG): same code + box ⇒ same schedule. */
  private[graft] def passOrder(names: Seq[String], pass: Int,
      iters: Int): Seq[String] = {
    val off =
      if (names.isEmpty) 0
      else (((pass - 1).toLong * names.size / iters) % names.size).toInt
    names.drop(off) ++ names.take(off)
  }

  /** Median of box-floor probe samples; -1.0 when empty (probe
    * failed). Extracted so BenchScheduleSpec can pin the statistic —
    * the floor is a MEDIAN on purpose: the probe measures the
    * TYPICAL per-job scheduling latency of this box, and a min would
    * report the one lucky sample the sweep's 270 queries never get. */
  private[graft] def floorStat(samples: Seq[Double]): Double =
    if (samples.isEmpty) -1.0
    else {
      val s = samples.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

  /** The exact stdout lines of a run, in print order: the full
    * per-query record first, the compact summary LAST — the driver
    * captures only the tail of stdout and the full line overflows it
    * every round, so the captured tail must always end with one
    * complete, parseable JSON object (r12 verdict: BENCH_r12.json
    * had parsed:null). Extracted so the spec can pin the order. */
  private[graft] def outputLines(fullJson: String,
      compactJson: String): Seq[String] = Seq(fullJson, compactJson)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ── deterministic class-load order (round-12 verdict item 1) ──
    // Force the FULL query registry (270 closures across 22 modules,
    // transitively class-loading the whole operator surface) BEFORE
    // the first Spark job. The r11 harness rewrite dropped an
    // incidental pre-warm-up `SparkEntry.queries` reference, so those
    // classes loaded DURING/AFTER the first compiled jobs — and
    // late class loading invalidates the JIT's class-hierarchy-based
    // speculative inlining in shared Spark/Scala infrastructure, a
    // degradation that persists for the whole process. Measured round
    // 12 (same library, same box, interleaved A/B, 3+ replicates per
    // arm): registry-first q_tok_vocab 2.0–2.1 s; registry-after-
    // first-job 2.8–3.2 s (q_mix_weights_tok/q_pack_sequences_tok
    // move 1.1→1.6 s the same way) — the whole round-11 "VocabTok
    // trio" shift. GC logs rule the collector out (~100 ms total
    // pauses, zero full GCs, both arms; -Xms/-Xmx pinning and
    // ParallelGC measurably change nothing). See SCALE.md round-12.
    val registrySize = SparkEntry.queries.size
    require(registrySize > 0, "query registry is empty")

    // Between-queries unpersist of dead localCheckpoint frames —
    // shared with Verify (SessionHygiene scaladoc has the rationale;
    // SPARK_GRAFT_KEEP_CHECKPOINTS=1 is the A/B lever).
    def dropDeadCheckpoints(): Unit =
      SessionHygiene.dropDeadCheckpoints(spark)

    def runFull(name: String): Double = {
      val t0 = System.nanoTime()
      // finally: a FAILED query's checkpoint blocks must not leak into
      // the next query's timed region either
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      } finally dropDeadCheckpoints()
    }

    // warm-up (not reported): small scan+agg touches parquet + codegen
    def canaryRun(): Double = {
      val t0 = System.nanoTime()
      graft.engine.Tables(spark, sfDir, "nation").groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // min of 3: a single sample still carries scheduler jitter — the
    // min filters it the same way the per-query mins do
    def canarySample(): Double = (1 to 3).map(_ => canaryRun()).min
    // JVM warm-up before pass 1: run the canary until two CONSECUTIVE
    // runs agree within 10% (capped) — parquet footers, codegen, and
    // the first JIT plateau, without hand-picking a run count.
    def canarySettle(): Unit = {
      var prev = canaryRun()
      var attempts = 1
      var settled = false
      while (!settled && attempts < 10) {
        val cur = canaryRun()
        settled = math.abs(cur - prev) <= 0.10 * math.max(cur, prev)
        prev = cur
        attempts += 1
      }
    }
    try canarySettle() catch { case _: Throwable => () }

    // ── box-floor probe (round-16, r15 verdict item 2) ──  The r15
    // host adjudication proved this VM family's dominant noise axis
    // is PER-JOB scheduling latency (varies ~2× across fleet boxes)
    // while bulk throughput varies only ~1.2× — previously
    // re-derived by hand from q_wordcount's raw ratio on every diff.
    // Measure it directly: the median wall time of 10 trivial
    // ONE-PARTITION jobs (one task, no shuffle, no parquet) is a
    // pure sample of the submit→schedule→execute→finish floor that
    // every one of the ~270 sweep jobs pays per Spark job. The first
    // probe runs AFTER canarySettle (the JIT plateau is paid) and
    // BEFORE pass 1; emitted as floor_sec beside the canaries so the
    // archive self-describes the floor axis (bench_diff.py prints
    // the cross-run floor ratio next to the canary ratio).
    def floorRun(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L, 1L, 1)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Per-PASS probes (round-16 triage): the axis drifts on
    // tens-of-minutes timescales on this VM family (measured same-box,
    // same-afternoon: 0.035 → 0.052 with zero CPU steal and zero PSI
    // pressure, while q_wordcount stayed flat and the iterative graph
    // family moved ×1.3–1.8 with it), so a single pre-sweep sample
    // goes stale before the scored passes finish. One 10-job probe
    // runs before pass 1 and after every pass (~0.5 s each, outside
    // all query timings); floor_sec is the median of the per-probe
    // medians and floor_probes preserves the trajectory so a diff
    // reader can see WHEN the floor moved within the sweep.
    val floorProbes = scala.collection.mutable.ArrayBuffer[Double]()
    // ── family-shaped probe (round-16 triage, second finding) ──
    // The one-partition floor does NOT span the whole latency space:
    // a same-afternoon episode showed the iterative graph family
    // (q_kcore 1.28→2.6, q_graph_cc 3.5→4.7–5.1 — ALSO on unchanged
    // round-start code, so not a regression) elevated while
    // floor_probes sat BELOW the clean-window value and q_wordcount
    // was flat. What that family uniquely does per round is one
    // keyed SHUFFLE + one eager localCheckpoint (BlockManager write)
    // + a job submit — so this probe is shaped exactly like one such
    // round, ×3 rounds on a 1000-row frame: when the family moves
    // and iter_probes moves with it while floor_probes stays flat,
    // the mover is the shuffle/checkpoint axis, not code.
    def iterRun(): Double = {
      val t0 = System.nanoTime()
      var df = spark.range(0L, 1000L, 1L, 4)
        .selectExpr("id % 97 as k", "id as v")
      var r = 0
      while (r < 3) {
        df = df.groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("v").as("v"))
          .selectExpr("k % 89 as k", "v")
          .localCheckpoint(true)
        r += 1
      }
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      dropDeadCheckpoints() // probe blocks must not accumulate
      dt
    }
    val iterProbes = scala.collection.mutable.ArrayBuffer[Double]()
    // A failed probe appends the -1.0 sentinel rather than being
    // skipped (round-17, r16 ADVICE): the trajectories' stated
    // purpose is letting a diff reader see WHEN within the sweep an
    // axis moved, so entry k must always be the probe taken after
    // pass k — dropping a failure would shift every later entry left
    // and desynchronize floor_probes from iter_probes. The summary
    // floor_sec/iter_sec medians take only the non-negative entries.
    def floorProbe(): Unit = {
      floorProbes += (try floorStat((1 to 10).map(_ => floorRun()))
                      catch { case _: Throwable => -1.0 })
      iterProbes += (try floorStat((1 to 3).map(_ => iterRun()))
                     catch { case _: Throwable => -1.0 })
    }
    floorProbe()

    // SPARK_GRAFT_ONLY=q_a,q_b restricts to named queries — targeted
    // regression timing without the full 269-query sweep; the JSON
    // shape is unchanged so diff tooling works on partial runs too
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail loudly on a misspelled or empty selection — a filter that
    // silently matches zero queries makes a targeted regression run
    // "pass" without timing anything
    only.foreach { sel =>
      val unknown = sel -- SparkEntry.queries.keySet
      require(sel.nonEmpty && unknown.isEmpty,
        if (sel.isEmpty) "SPARK_GRAFT_ONLY is set but selects no queries"
        else s"SPARK_GRAFT_ONLY names unknown queries: " +
          unknown.toSeq.sorted.mkString(", "))
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // ── noise canary ──  The same trivial scan timed right after
    // pass 1 and again after the last pass. Three r10 measurements of
    // identical code disagreed 1.4× while every RELATIVE improvement
    // reproduced — pure host interference, indistinguishable in the
    // artifact from "the code got slower". The end/start ratio of a
    // fixed query is that missing attribution: ~1 on a quiet box, a
    // uniform inflation when the host got busier mid-sweep
    // (bench_diff.py prints it next to any flagged regression).
    // The START anchor sits AFTER pass 1, not at process start
    // (round-12 verdict item 2): a process-start anchor measures
    // tiered-JIT warm-up, not environment — the r11 artifact shipped
    // start 0.198 / end 0.075 (ratio 0.38) on a steady box, and no
    // canary-only settle loop reaches the deep-warm state that 270
    // queries × pass 1 produce (measured this round: a 10-attempt
    // settle still anchored at 0.227 vs an end of 0.079). After
    // pass 1 both anchors sit in the same warmth regime AND the
    // start anchor aligns exactly with the window the gate actually
    // scores (queries_p2min = passes 2..n).
    // On a SINGLE-pass run the scored window IS pass 1 (p2min falls
    // back to it), and a post-pass-1 start anchor would sit
    // back-to-back with the end anchor — blind to interference during
    // the only pass. There the anchor stays BEFORE the sweep (settled
    // above, so the JIT bias is bounded); multi-pass runs get the
    // aligned post-pass-1 anchor.
    var canaryStart =
      if (iters == 1)
        try canarySample() catch { case _: Throwable => -1.0 }
      else -1.0
    // iterate over full passes (not per-query loops): back-to-back
    // repeats of one query overstate cache warmth; pass-level repeats
    // reproduce the driver's measurement shape.
    // Each pass runs the queries in a deterministically ROTATED order
    // (round-13, verdict item 2): a fixed alphabetical sweep made
    // per-query mins sample the same wall-clock position every pass,
    // so slow host drift masqueraded as movement of whatever queries
    // sat at the sweep tail (the r12 re-archive note had to argue
    // "alphabetical-tail host noise" for exactly that cluster). With
    // pass p starting at offset (p-1)·n/iters, each query's min is
    // sampled from sweep positions spread across the pass, and an
    // order-correlated cluster can no longer form. Deterministic (no
    // RNG): same code + box ⇒ same schedule, so runs stay comparable.
    val passes = (1 to iters).map { p =>
      val order = passOrder(names, p, iters)
      val r = order.map(n => n -> runFull(n)).toMap
      if (p == 1 && iters > 1)
        canaryStart = try canarySample() catch { case _: Throwable => -1.0 }
      floorProbe()
      r
    }
    val floorSec = floorStat(floorProbes.toSeq.filter(_ >= 0))
    val iterSec = floorStat(iterProbes.toSeq.filter(_ >= 0))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val med = names.map(n => n -> {
      val ok = passes.map(_(n)).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else median(ok)
    })
    // per-query MIN alongside the median: the min is the best noise
    // bound a shared host offers, so a reader can separate regression
    // (min moved) from noise (only the median moved) without a re-run
    val mins = names.map(n => n -> {
      val ok = passes.map(_(n)).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    })
    // steady-state min: min of passes 2..n. Artifact-backed queries pay
    // their build-once cost in pass 1 only, so queries_min mixes "build
    // got slower" into "steady state got slower"; the regression gate
    // prefers this field when both archives carry it (bench_diff.py).
    // Falls back to the all-pass min on a single-pass run.
    val p2mins = names.map(n => n -> {
      val tail = passes.drop(1)
      val ok = (if (tail.nonEmpty) tail else passes).map(_(n)).filter(_ >= 0)
      if (ok.isEmpty) -1.0 else ok.min
    })
    // 3-decimal (ms) per-query values (round-13, verdict item 4): the
    // full-precision doubles made the per-query line ~11 KB for no
    // information — ms precision is already below host noise. Medians
    // and mins are computed at full precision; only printing rounds.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = med.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val qsMin = mins.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val qsP2 = p2mins.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val canaryEnd = try canarySample() catch { case _: Throwable => -1.0 }
    // a query failing in ANY pass is failed — an intermittent crash
    // must not hide behind the median of its surviving passes
    val failed = names.collect { case n if passes.exists(_(n) < 0) => "\"" + n + "\"" }
    val total = med.map(_._2).filter(_ >= 0).sum
    val passTotals = passes.map(_.values.filter(_ >= 0).sum)
    // failed queries are named explicitly — a breaking query must never
    // read as a smaller (faster-looking) total with a clean exit
    val summaryFields =
      s""""canary_start_sec":${f3(canaryStart)},"canary_end_sec":${f3(canaryEnd)},""" +
      s""""floor_sec":${f3(floorSec)},""" +
      s""""floor_probes":${floorProbes.map(f3).mkString("[", ",", "]")},""" +
      s""""iter_sec":${f3(iterSec)},""" +
      s""""iter_probes":${iterProbes.map(f3).mkString("[", ",", "]")},""" +
      s""""failed":${failed.mkString("[", ",", "]")},"iters":$iters,""" +
      s""""pass_total_min":${f3(passTotals.min)},"pass_total_max":${f3(passTotals.max)},""" +
      s""""sf":"$sfDir""""
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"queries_p2min":$qsP2,""" + summaryFields + "}"
    // the driver captures only the last ~2000 chars of stdout, and the
    // full per-query line overflows that every round (r12 verdict
    // item: BENCH_r12.json had parsed:null). The compact summary —
    // same shape minus the three per-query maps — prints LAST, so the
    // captured tail always ends with one complete, parseable JSON
    // object; the full record stays in the line above and in
    // bench_last.json (committed per round as BENCH_LOCAL_rNN).
    // outputLines owns the order; BenchScheduleSpec pins it.
    val compact = s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""detail":"per-query maps on the previous stdout line and bench_last.json",""" +
      summaryFields + "}"
    outputLines(json, compact).foreach(println)
    // partial (SPARK_GRAFT_ONLY) runs must not clobber the full-run
    // record the round-over-round diffs depend on
    if (only.isEmpty)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_last.json"),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] bench_last.json write failed: ${e.getMessage}")
      }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
