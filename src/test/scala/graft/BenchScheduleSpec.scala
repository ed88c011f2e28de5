package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the three bench-harness measurement invariants (round-13
  * verdict item 2). These few lines of infrastructure now carry every
  * round-over-round performance claim — a silent revert of any of
  * them would quietly re-bias the archives:
  *
  *  (a) per-pass sweep ROTATION — distinct offsets across passes, so
  *      a query's min samples different wall-clock positions and an
  *      order-correlated host-drift cluster cannot form;
  *  (b) the full query REGISTRY is forced before the first Spark job
  *      (late class loading invalidates JIT speculative inlining in
  *      shared infrastructure — the r11 "VocabTok trio" shift);
  *  (c) the COMPACT summary is the last stdout line, so the driver's
  *      truncated tail capture always ends in parseable JSON.
  *
  * (a) and (c) are pinned functionally against the extracted helpers
  * main() actually calls. (b) is a statement-order property inside
  * main() that no unit test can observe without running a full bench;
  * it is pinned structurally against the source text — crude, but red
  * on exactly the revert that matters.
  */
class BenchScheduleSpec extends AnyFunSuite {

  private val names = ('a' to 'l').map(c => s"q_$c")

  /** Bench.scala source text for the structural pins, resolved from
    * the project root (round-14 ADVICE: a bare relative path broke
    * whenever the test JVM's working directory was not the project
    * root — walk up to build.sbt instead). */
  private def benchSource(): String = {
    var rootDir = java.nio.file.Paths.get(
      sys.props("user.dir")).toAbsolutePath.normalize
    while (rootDir != null &&
        !java.nio.file.Files.exists(rootDir.resolve("build.sbt")))
      rootDir = rootDir.getParent
    assert(rootDir != null, "project root (build.sbt) not found above user.dir")
    java.nio.file.Files.readString(
      rootDir.resolve("src/main/scala/graft/Bench.scala"))
  }

  test("(a) rotation: pass offsets are distinct for iters=3 and cover " +
      "distinct sweep positions") {
    val iters = 3
    val orders = (1 to iters).map(p => Bench.passOrder(names, p, iters))
    // every pass is a rotation (same membership, a permutation)
    orders.foreach(o => assert(o.sorted == names.sorted))
    // the offsets (position of the alphabetically-first name) are
    // DISTINCT — a fixed-order revert collapses them all to 0
    val offsets = orders.map(_.indexOf(names.head))
    assert(offsets.distinct.size == iters,
      s"pass offsets must be distinct, got $offsets")
    // and the rotation is the contiguous kind (drop/take), not a
    // shuffle: each order must be names rotated by its own offset
    orders.zip(offsets).foreach { case (o, off) =>
      val rot = names.drop((names.size - off) % names.size) ++
        names.take((names.size - off) % names.size)
      assert(o == rot, s"pass order is not a contiguous rotation: $o")
    }
  }

  test("(a) rotation: deterministic — same inputs, same schedule") {
    for (p <- 1 to 3)
      assert(Bench.passOrder(names, p, 3) == Bench.passOrder(names, p, 3))
    // single-pass runs sweep in sorted order (offset 0): partial and
    // full runs stay comparable with the historical archives
    assert(Bench.passOrder(names, 1, 1) == names)
    assert(Bench.passOrder(Nil, 1, 3) == Nil)
  }

  test("(c) the compact summary is the LAST output line") {
    val full = """{"metric":"total","value":1.0,"unit":"sec","queries":{}}"""
    val compact = """{"metric":"total","value":1.0,"unit":"sec","detail":"x"}"""
    val lines = Bench.outputLines(full, compact)
    assert(lines.last == compact,
      "driver tail capture truncates — the compact record must print last")
    assert(lines == Seq(full, compact))
  }

  test("(d) box-floor probe: floorStat is a median with a -1 empty " +
      "sentinel, probed warm and before pass 1, emitted as floor_sec") {
    // the statistic: MEDIAN (typical per-job latency, not the one
    // lucky min the sweep never gets), -1.0 when the probe failed
    assert(Bench.floorStat(Nil) == -1.0)
    assert(Bench.floorStat(Seq(0.3)) == 0.3)
    assert(Bench.floorStat(Seq(9.0, 1.0, 2.0)) == 2.0)
    assert(Bench.floorStat(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    // structural pins against main(): the probe runs AFTER the canary
    // settle (JIT plateau paid — a cold probe measures warm-up, not
    // the box) and BEFORE the scored passes; the artifact carries the
    // field. A revert silently drops the per-job-latency axis every
    // r16+ archive self-describes (SCALE.md round-15 host
    // adjudication).
    val src = benchSource()
    val settle = src.indexOf("try canarySettle()")
    val probe = src.indexOf("floorStat((1 to")
    val pass1 = src.indexOf("val passes = (1 to iters)")
    assert(settle >= 0 && probe >= 0 && pass1 >= 0,
      "canary settle / floor probe / pass loop anchors missing")
    assert(settle < probe && probe < pass1,
      "floor probe must run after canarySettle and before pass 1")
    assert(src.contains("\"floor_sec\":${f3(floorSec)}"),
      "summary fields must emit floor_sec")
    // per-PASS probing (round-16 triage): the floor axis drifts on
    // tens-of-minutes timescales, so a single pre-sweep sample goes
    // stale — every pass must re-probe (first call before pass 1,
    // second call inside the pass loop) and the trajectory must ship
    val calls = "floorProbe()".r.findAllIn(src).size
    assert(calls >= 3, // def site + pre-pass call + in-loop call
      s"expected the floor probe before pass 1 AND per pass, found $calls mentions")
    assert(src.indexOf("floorProbe()\n      r\n    }") > pass1 ||
        src.substring(pass1).contains("floorProbe()"),
      "the pass loop must re-probe the floor after each pass")
    assert(src.contains("\"floor_probes\":"),
      "summary fields must emit the floor_probes trajectory")
    // the SECOND axis (round-16 triage): the iterative family's
    // per-round shuffle+localCheckpoint constant moves independently
    // of the one-partition floor — the probe must be family-shaped
    // (a groupBy shuffle and an eager localCheckpoint per round) and
    // its trajectory must ship beside the floor's
    val iter = src.indexOf("def iterRun()")
    assert(iter >= 0 && iter < pass1,
      "family-shaped iter probe missing or after the pass loop")
    assert(src.substring(iter, src.indexOf("val iterProbes"))
        .contains("localCheckpoint(true)"),
      "the iter probe must pay a localCheckpoint per round (the " +
        "family's per-round constant)")
    assert(src.contains("\"iter_sec\":") && src.contains("\"iter_probes\":"),
      "summary fields must emit iter_sec and the iter_probes trajectory")
    // positional alignment (round-17, r16 ADVICE): a failed probe
    // appends the -1.0 sentinel rather than being skipped — entry k
    // is always the probe after pass k, and the two trajectories can
    // never desynchronize; the summary medians must then take only
    // the non-negative entries
    assert(!src.contains("if (m >= 0) floorProbes") &&
        !src.contains("if (im >= 0) iterProbes"),
      "a failed probe must append the -1.0 sentinel, not be skipped")
    assert(src.contains("floorProbes.toSeq.filter(_ >= 0)") &&
        src.contains("iterProbes.toSeq.filter(_ >= 0)"),
      "floor_sec/iter_sec must be medians of the non-negative entries")
  }

  test("(b) registry force precedes the first Spark job in main() " +
      "(structural pin)") {
    val src = benchSource()
    val force = src.indexOf("SparkEntry.queries.size")
    // the first job any run submits: the canary settle before pass 1.
    // Anchor on the CALL site (round-14 ADVICE: a bare indexOf of
    // 'canarySettle()' matched the def site, so moving the def above
    // the force went red while the pinned property was unchanged)
    val firstJob = src.indexOf("try canarySettle()")
    assert(force >= 0, "registry force (SparkEntry.queries.size) missing")
    assert(firstJob >= 0, "canary settle call (first Spark job) missing")
    assert(force < firstJob,
      "the full query registry must be forced BEFORE the first Spark " +
        "job — late class loading invalidates JIT speculative inlining " +
        "for the whole process (SCALE.md round-12)")
    // and main() still routes through the pinned helpers — a revert
    // that inlines a fixed order would pass (a) vacuously
    assert(src.contains("passOrder(names, p, iters)"),
      "main() must take its sweep order from passOrder")
    assert(src.contains("outputLines(json, compact).foreach(println)"),
      "main() must print through outputLines")
  }
}
