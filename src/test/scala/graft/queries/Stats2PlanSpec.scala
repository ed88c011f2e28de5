package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.execution.SparkPlan

import graft.{SparkEntry, SparkSuite}

/** Plan contracts for the round-7 session operators — each scale claim
  * in the query docs is pinned against the physical plan:
  *   - moment statistics are aggregate-only (no join, bounded
  *     exchanges);
  *   - every no-partition window consumes a PRE-AGGREGATED (bin- or
  *     dictionary-sized) input, never the raw scan;
  *   - model/bounds tables come back as broadcasts;
  *   - the only nested-loop products are documented bounded
  *     broadcasts (Theil–Sen's ≤31-row daily self-pair).
  */
class Stats2PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  // windows are asserted on the OPTIMIZED LOGICAL plan: AQE wraps the
  // physical tree in AdaptiveSparkPlanExec, whose collect() sees no
  // children before execution
  private def logical(name: String): LogicalPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan

  test("moment statistics plan no joins and bounded exchanges") {
    Seq("q_corr", "q_ttest_welch", "q_burstiness").foreach { q =>
      val p = plan(q).toString
      assert(!p.contains("Join"), s"$q should be aggregate-only:\n${p.take(1200)}")
      val ex = "Exchange".r.findAllIn(p).size
      assert(ex <= 3, s"$q grew $ex exchanges:\n${p.take(1200)}")
    }
  }

  test("global windows consume pre-aggregated bounded inputs") {
    // KS/MW bins, the daily series, the vocab dictionary: a
    // no-partition WindowExec is only scale-safe if an aggregate
    // already shrank its input below it
    Seq("q_ks_2samp", "q_mannwhitney", "q_ewma", "q_cusum", "q_theilsen",
      "q_vocab_coverage", "q_benford").foreach { q =>
      val windows = logical(q).collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$q expected a window")
      windows.foreach { w =>
        if (w.partitionSpec.isEmpty) {
          // a GlobalLimit bounds the input even harder than an
          // Aggregate — q_vocab_coverage's top-31 TakeOrdered frame
          // rides a localCheckpoint (round-17 review), so the
          // aggregate below it is hidden behind the LogicalRDD
          // boundary and the limit IS the visible bound
          val bounded = w.child.collect {
            case a: Aggregate => a: LogicalPlan
            case l: GlobalLimit => l: LogicalPlan
          }
          assert(bounded.nonEmpty,
            s"$q has a no-partition window over un-aggregated, " +
              s"un-limited input:\n" + w.treeString.take(1200))
        }
      }
    }
  }

  test("per-key windows are partitioned on the natural key") {
    Seq("q_streak", "q_interarrival", "q_gini", "q_winsorize").foreach { q =>
      val windows = logical(q).collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$q expected a window")
      windows.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"$q window lost its partitioning (single-task sort at scale)"))
    }
  }

  test("attribution's rank-1 filter becomes a partial WindowGroupLimit") {
    // the scalable top-1-per-purchase shape: Catalyst rewrites the
    // rn = 1 filter into WindowGroupLimit (partial group-limit BEFORE
    // the exchange — candidates collapse to 1/purchase map-side);
    // the rank window itself stays partitioned by purchase, and the
    // only no-partition window (channel share) sits above the 3-row
    // channel aggregate
    val lp = logical("q_attribution")
    assert(lp.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => g
    }.nonEmpty, "expected the rank-1 WindowGroupLimit rewrite:\n" +
      lp.treeString.take(1500))
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "rank window must partition by purchase")
    windows.filter(_.partitionSpec.isEmpty).foreach(w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        "share window must consume the channel aggregate"))
  }

  test("winsorize clamps through a broadcast bounds join") {
    val p = plan("q_winsorize").toString
    assert(p.contains("BroadcastHashJoin"),
      "p05/p95 bounds must broadcast back onto the scan:\n" + p.take(1500))
  }

  test("bigram LM model joins broadcast at runtime via AQE, not a hint") {
    // Round-9: the forced broadcast hints on the c12/c1 model tables
    // are gone (add-one smoothing forbids a min-count floor, so the
    // raw tables are Heaps-law-unbounded at 100 TB and a hint is an
    // OOM). The scale contract is now AQE's: when the trained model
    // IS dictionary-sized, the runtime re-plan must still convert the
    // model joins to broadcasts. Execute, then read the final
    // adaptive plan.
    val df = SparkEntry.queries("q_bigram_lm")(spark, sf)
    df.collect() // executes THIS plan, so AQE finalizes it in place
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"),
      "expected an executed adaptive plan:\n" + p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "AQE must convert the dictionary-sized model joins to broadcasts:\n" +
        p.take(2000))
  }

  test("rarity's uncapped freq join broadcasts at runtime via AQE, not a hint") {
    // Same contract for q_text_rarity: its hapax output forbids a
    // min-count floor, so the unigram table must NOT be hint-forced;
    // AQE broadcasts it only when it is actually dictionary-sized.
    val df = SparkEntry.queries("q_text_rarity")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "AQE must broadcast the dictionary-sized freq table at this SF:\n" +
        p.take(2000))
  }

  test("attribution's candidate join is banded on (user, 3-day bucket)") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = logical("q_attribution").collect { case j: Join => j }
    val cand = joins.filter(_.condition.isDefined)
      .map(j => conjuncts(j.condition.get))
      .filter(_.exists(c => !c.isInstanceOf[EqualTo]))
      .head
    val eqs = cand.collect { case e: EqualTo => e }
    assert(eqs.size >= 2,
      s"need (user, band) equi keys: ${cand.mkString(" && ")}")
    assert(eqs.exists(_.references.exists(_.name.startsWith("tb"))),
      s"one equi key must be the 3-day bucket: ${eqs.mkString(" && ")}")
    assert(cand.exists(c => !c.isInstanceOf[EqualTo]),
      "the exact band must survive as a residual")
  }

  test("theilsen's pair product is a bounded broadcast; attribution is not a product") {
    val ts = plan("q_theilsen").toString
    assert(ts.contains("BroadcastNestedLoopJoin"),
      "daily self-pairing should be a broadcast product of the ≤31-row series:\n" +
        ts.take(1500))
    val at = plan("q_attribution").toString
    assert(!at.contains("BroadcastNestedLoopJoin") &&
      !at.contains("CartesianProduct"),
      "attribution must equi-join on user, never a product:\n" + at.take(1500))
  }
}
