package graft.queries

import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}

import graft.{SparkEntry, SparkSuite}

/** Plan-shape contracts for the TPC-H composites (round-6 verdict
  * item 2): the brand filter must sit BELOW Q17's per-part threshold
  * aggregate — at 100× scale an unfiltered full-lineitem aggregate
  * dominates the query while only ~1/25 of parts survive the filter. */
class CompositePlanSpec extends SparkSuite {

  test("q_tpch_q17: threshold aggregate input is brand-filtered (semi join below the agg)") {
    val plan = SparkEntry.queries("q_tpch_q17")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan
    // every aggregate in the plan must see a LeftSemi join somewhere
    // beneath it — i.e. no aggregate consumes the raw lineitem scan
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty)
    val groupedAggs = aggs.filter(_.groupingExpressions.nonEmpty)
    assert(groupedAggs.nonEmpty, "expected the per-part threshold aggregate")
    groupedAggs.foreach { a =>
      val semiBelow = a.child.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semiBelow.nonEmpty,
        s"threshold aggregate consumes unfiltered input:\n${a.treeString.take(2000)}")
    }
  }
}
