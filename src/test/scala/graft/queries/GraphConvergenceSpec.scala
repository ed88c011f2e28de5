package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Epsilon-terminated PageRank contract: on a directed graph WITH
  * dangling nodes, the distributed iteration must converge to exactly
  * the fixed point a scalar reference of the identical integer map
  * computes — fixed-point micro-unit arithmetic means EXACT equality,
  * not approximate. (The analytic stationary distribution of the
  * damped walk is this map's fixed point; integer flooring makes it
  * reproducible bit-for-bit.) */
class GraphConvergenceSpec extends SparkSuite {

  private val BaseU = 150000L
  private val RankOneU = 1000000L

  /** Scalar twin of Graph.pageRankConverged's per-round update. */
  private def scalarPageRank(edges: Seq[(String, String)], epsUnits: Long,
      maxRounds: Int): (Map[String, Long], Int) = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val dangling = nodes.filterNot(outdeg.contains)
    var ranks = nodes.map(_ -> RankOneU).toMap
    var delta = Long.MaxValue
    var round = 0
    while (delta > epsUnits && round < maxRounds) {
      val dShare = dangling.map(ranks).sum / n
      val sums = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (s, _) => ranks(s) / outdeg(s) }.sum
        }
      val next = nodes.map { nd =>
        nd -> (BaseU + (85L * (sums.getOrElse(nd, 0L) + dShare)) / 100L)
      }.toMap
      delta = nodes.map(nd => math.abs(next(nd) - ranks(nd))).max
      ranks = next
      round += 1
    }
    assert(delta <= epsUnits, s"scalar reference did not converge")
    (ranks, round)
  }

  // directed graph with structure + a dangling node: d has no
  // out-edges, so its mass must be redistributed, not silently lost
  private val edgeList = Seq(
    "a" -> "b", "a" -> "c", "b" -> "c", "c" -> "a", "c" -> "d",
    "e" -> "a", "e" -> "d")

  test("distributed converged ranks == scalar reference, exactly") {
    import spark.implicits._
    val edges = edgeList.toDF("src", "dst")
    val got = Graph.pageRankConverged(edges, epsUnits = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (want, rounds) = scalarPageRank(edgeList, epsUnits = 10L, maxRounds = 64)
    assert(rounds > 3, s"fixture should need real iteration depth, took $rounds")
    assert(got == want, s"got $got\nwant $want")
  }

  test("dangling mass is redistributed, not lost") {
    import spark.implicits._
    val edges = edgeList.toDF("src", "dst")
    val ranks = Graph.pageRankConverged(edges, epsUnits = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // with dangling redistribution total mass stays ~N·1e6 (floor ops
    // shave at most a few units per node per round); dropping d's mass
    // would depress the total by its damped rank share every round
    val total = ranks.values.sum
    val n = ranks.size
    assert(total > n * RankOneU * 95L / 100L,
      s"mass leaked: total $total over $n nodes")
    // d receives from c and e, so it must sit strictly above the base
    assert(ranks("d") > BaseU + RankOneU / 2,
      s"dangling node starved: ${ranks("d")}")
  }

  test("epsilon-converged result on the symmetric query graph is stable") {
    // the declared q_pagerank graph (no dangling nodes by
    // construction): the converged variant must run and agree with the
    // scalar reference built from the same edges
    // epsilon sits above the integer-quantization noise floor: the 10
    // supplier hubs have in-degree in the hundreds, so per-round floor
    // jitter keeps max-delta at ~400 micro-units forever — 1000 is the
    // documented in-degree-scaled choice (Graph.pageRankConverged)
    val edges = Graph.custSuppEdges(spark, "/root/testdata/sf0.001")
    val scalarEdges = edges.collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    val got = Graph.pageRankConverged(edges, epsUnits = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (want, _) = scalarPageRank(scalarEdges, epsUnits = 1000L, maxRounds = 64)
    assert(got == want)
  }
}
