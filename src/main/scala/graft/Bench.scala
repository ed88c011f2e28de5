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
      // ~50 query sites localCheckpoint per-invocation frames (rank
      // vectors, CC labels, ANN probe sets); their blocks are only
      // reclaimable after a driver GC lets ContextCleaner see the dead
      // RDDs, and the default periodicGC interval (30 min) is longer
      // than the whole sweep — so dead blocks pile up across 270
      // queries × 3 passes (the "session pressure" measured in
      // SCALE.md's round-10 graph-trio notes). One minute is the
      // standard production mitigation for long-lived sessions.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runFull(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up (not reported): small scan+agg touches parquet + codegen
    try SparkEntry.queries.keys.headOption.foreach { _ =>
      graft.engine.Tables(spark, sfDir, "nation").groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

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
    // iterate over full passes (not per-query loops): back-to-back
    // repeats of one query overstate cache warmth; pass-level repeats
    // reproduce the driver's measurement shape
    val passes = (1 to iters).map(_ => names.map(n => n -> runFull(n)).toMap)
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
    val qs = med.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMin = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a query failing in ANY pass is failed — an intermittent crash
    // must not hide behind the median of its surviving passes
    val failed = names.collect { case n if passes.exists(_(n) < 0) => "\"" + n + "\"" }
    val total = med.map(_._2).filter(_ >= 0).sum
    val passTotals = passes.map(_.values.filter(_ >= 0).sum)
    // failed queries are named explicitly — a breaking query must never
    // read as a smaller (faster-looking) total with a clean exit
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,""" +
      s""""failed":${failed.mkString("[", ",", "]")},"iters":$iters,""" +
      s""""pass_total_min":${passTotals.min},"pass_total_max":${passTotals.max},""" +
      s""""sf":"$sfDir"}"""
    println(json)
    // the driver captures only the stdout TAIL, which truncated ~60 of
    // 126 per-query medians out of round 4's artifact — the file copy
    // is the complete record (best-effort: a read-only cwd must not
    // fail the bench itself)
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
