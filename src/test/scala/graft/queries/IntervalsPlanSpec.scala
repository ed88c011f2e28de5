package graft.queries

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}

import graft.{SparkEntry, SparkSuite}

/** Plan contracts for the round-7 closing batches — each scale claim
  * in the query docs pinned against the plan:
  *   - sweep-line/interval windows partition on their natural key
  *     (supplier / nation / returnflag / purchase), never global over
  *     the raw scan;
  *   - the decision stump's candidate evaluation never multiplies the
  *     corpus (no nested-loop product anywhere in its plan);
  *   - every no-partition window (ABC's cumulative walk, Wilcoxon's
  *     rank, the stump argmin, funnel-time medians, sketch ranks)
  *     consumes an input an Aggregate or selective Filter already
  *     shrank — the Stats2PlanSpec rule extended to the new batch.
  */
class IntervalsPlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def logical(name: String): LogicalPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("interval/sweep windows partition on the natural key") {
    Seq("q_interval_merge", "q_peak_concurrency", "q_weighted_median",
      "q_attribution_linear", "q_ndcg").foreach { q =>
      val windows = logical(q).collect { case w: LWindow => w }
      assert(windows.nonEmpty, s"$q expected windows")
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$q has a no-partition window over corpus-sized input")
    }
  }

  test("linear attribution's candidate join is banded on (user, 7-day bucket)") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = logical("q_attribution_linear").collect {
      case j: Join => j
    }
    val cand = joins.filter(_.condition.isDefined)
      .map(j => conjuncts(j.condition.get))
      .filter(_.exists(c => !c.isInstanceOf[EqualTo]))
      .head
    val eqs = cand.collect { case e: EqualTo => e }
    assert(eqs.size >= 2,
      s"need (user, band) equi keys: ${cand.mkString(" && ")}")
    assert(eqs.exists(_.references.exists(_.name.startsWith("tb"))),
      s"one equi key must be the 7-day bucket: ${eqs.mkString(" && ")}")
  }

  test("harmonic centrality: top-k head, no products") {
    val p = physical("q_harmonic_cent")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q_harmonic_cent grew a product:\n${p.take(1500)}")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 head must be TakeOrderedAndProject, not a full sort:\n" +
        p.take(1500))
  }

  test("decision stump never multiplies the corpus") {
    val p = physical("q_decision_stump")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q_decision_stump grew a product:\n${p.take(1500)}")
    // the candidate argmin is a no-partition window — legal only over
    // the per-(feature,bucket) histogram, which an Aggregate produced
    val windows = logical("q_decision_stump").collect { case w: LWindow => w }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"stump argmin window over un-aggregated input:\n" +
          w.treeString.take(1200))
    }
  }

  test("global cumulative walks ride pre-aggregated inputs") {
    Seq("q_abc", "q_wilcoxon", "q_ohlc").foreach { q =>
      val windows = logical(q).collect { case w: LWindow => w }
      windows.filter(_.partitionSpec.isEmpty).foreach { w =>
        assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
          s"$q no-partition window over un-aggregated input:\n" +
            w.treeString.take(1200))
      }
    }
  }
}
