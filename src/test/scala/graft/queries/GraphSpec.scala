package graft.queries

import graft.SparkSuite

/** PageRank unit tests over hand-built edge lists, checked against a
  * local reference simulator running the SAME micro-unit integer
  * arithmetic as the distributed loop (and the DuckDB oracle). */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Local fixed-point PageRank with identical integer semantics —
    * including the node universe: rankLoop derives nodes from SRC only
    * (its callers guarantee outdeg ≥ 1 via symmetric construction), so
    * the simulator must too, or a pure-sink node would diverge. */
  private def localPr(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val sums = edges.groupBy(_._2).view.mapValues(
        _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
      r = nodes.map(n => n -> (150000L + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def distPr(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(String, Long)].collect().toMap

  test("3-node symmetric path matches the local simulator") {
    // a — b — c (undirected): b is the hub and must outrank a and c
    val e = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val got = distPr(e, 3)
    assert(got == localPr(e, 3))
    assert(got("b") > got("a") && got("a") == got("c"))
  }

  test("star graph: hub rank dominates and leaves stay symmetric") {
    val leaves = (1 to 5).map(i => s"l$i")
    val e = leaves.flatMap(l => Seq("hub" -> l, l -> "hub"))
    val got = distPr(e, 3)
    assert(got == localPr(e, 3))
    assert(leaves.map(got).distinct.size == 1)
    assert(got("hub") > got("l1"))
  }

  test("nHop: min-hop BFS labels on a path, unreachable nodes absent") {
    // a—b—c—d—e (undirected), seed {a}: dist a=0 b=1 c=2 d=3, e beyond 3 hops
    val path = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e")
    val e = path.flatMap { case (x, y) => Seq(x -> y, y -> x) }
    val seeds = Seq("a").toDF("node")
    val got = Graph.nHop(e.toDF("src", "dst"), seeds, 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("nHop: revisiting an already-labeled node keeps the smaller hop") {
    // triangle a-b-c plus spur c-d; b and c are both dist 1, d is 2
    val und = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")
    val e = und.flatMap { case (x, y) => Seq(x -> y, y -> x) }
    val got = Graph.nHop(e.toDF("src", "dst"), Seq("a").toDF("node"), 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("bucketed edge artifact: rank loop has zero edge-side exchanges") {
    // the bucketed layout IS the shuffle — degree agg, degree join, and
    // every iteration's rank join must consume HashPartitioning(src)
    // from the scan; only rank-vector (node/dst-keyed) exchanges and
    // the final sort may move data
    val edges = Graph.custSuppEdges(spark, "/root/testdata/sf0.001")
    val plan = Graph.rankLoop(edges, 3).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(src"),
      s"edge-side exchange found:\n${plan.take(4000)}")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"expected a bucketed scan:\n${plan.take(2000)}")
  }

  test("triangleCount: hand-built graph counts each triangle once") {
    // 1-2-3 and 2-3-4 are triangles; 4-5 is a pendant edge
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r = Graph.triangleCount(e).as[(Long, Long)].head()
    assert(r == ((2L, 6L)))
  }

  test("orientByDegree: hub orders last, adjacency obeys the sqrt(2E) bound") {
    // star: hub 0 (lowest id, degree 6) + leaves 1..6, plus one
    // leaf-leaf edge making a single triangle. Id-orientation would
    // give adj(0) its full degree; degree-orientation must point
    // every star edge INTO the hub.
    val e = (1L to 6L).map(l => (0L, l)) :+ (1L, 2L)
    val edges = e.toDF("u", "v")
    val oriented = Graph.orientByDegree(edges).as[(Long, Long)].collect()
    assert(oriented.length == e.length)
    // undirected edge set preserved
    assert(oriented.map { case (a, b) => (a min b, a max b) }.sorted.toSeq ==
      e.map { case (a, b) => (a min b, a max b) }.sorted)
    oriented.filter(_._2 == 0L).foreach { case (u, _) => assert(u != 0L) }
    assert(!oriented.exists(_._1 == 0L), "hub must have zero out-neighbors")
    val maxAdj = oriented.groupBy(_._1).map(_._2.size).max
    assert(maxAdj <= math.sqrt(2.0 * e.length),
      s"out-adjacency $maxAdj exceeds sqrt(2E)")
    val r = Graph.triangleCount(edges).as[(Long, Long)].head()
    assert(r == ((1L, 7L)), "count must be orientation-invariant")
  }

  test("q_triangles input graph is non-vacuous (round-6 verdict item 1)") {
    // the part co-purchase graph must stay SPARSE — the supplier
    // co-occurrence graph it replaced was the complete K_n, whose
    // triangle count is C(n,3) with no computation to evidence
    val edges = Graph.partCoPurchase(spark, "/root/testdata/sf0.001", 2L)
      .cache()
    val nEdges = edges.count()
    val n = edges.select("u")
      .union(edges.select(org.apache.spark.sql.functions.col("v").as("u")))
      .distinct().count()
    val (tris, ecnt) = Graph.triangleCount(edges).as[(Long, Long)].head()
    edges.unpersist()
    assert(n > 2 && nEdges > 0 && ecnt == nEdges)
    val density = 2.0 * nEdges / (n.toDouble * (n - 1))
    assert(density < 0.5, s"graph density $density is near-complete ($nEdges edges, $n nodes)")
    val complete = n * (n - 1) * (n - 2) / 6
    assert(tris < complete, s"triangle count $tris equals the complete graph's C($n,3)")
  }

  test("kCore: triangle survives 2-core peeling, pendant and path dissolve") {
    // triangle {1,2,3} + pendant 3-4, plus isolated path 5-6:
    // 2-core = exactly the triangle, every member at induced degree 2
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.kCore(e, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: fixed rounds report the not-yet-converged frontier deterministically") {
    // long path 1-2-3-4-5-6: each round peels both endpoints; after 2
    // rounds nodes 3,4 remain (degree 1 in the induced subgraph —
    // NOT a 2-core, reported as-is because rounds are fixed)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("u", "v")
    val got = Graph.kCore(e, k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 4L -> 1L))
    // one more round empties it
    assert(Graph.kCore(e, k = 2, rounds = 3).count() == 0L)
  }

  test("labelProp: components converge to their min id, rounds bound the hop radius") {
    // path 1-2-3-4 plus separate edge 10-11
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("u", "v")
    val r3 = Graph.labelProp(e, 3).as[(Long, Long)].collect().toMap
    assert(r3 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    // 1 round: node 4 has only seen node 3's ORIGINAL label
    val r1 = Graph.labelProp(e, 1).as[(Long, Long)].collect().toMap
    assert(r1(4L) == 3L && r1(2L) == 1L && r1(3L) == 2L)
  }

  test("pprLoop: matches a scalar simulator; mass cannot outrun the hop radius") {
    def localPpr(edges: Seq[(String, String)], seeds: Set[String],
        iters: Int): Map[String, Long] = {
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val nodes = edges.map(_._1).distinct
      var r = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
      for (_ <- 1 to iters) {
        val sums = edges.groupBy(_._2).view.mapValues(
          _.map { case (src, _) => r(src) / deg(src) }.sum).toMap
        r = nodes.map(n => n ->
          ((if (seeds(n)) 150000L else 0L) + 85L * sums.getOrElse(n, 0L) / 100L)).toMap
      }
      r
    }
    // path c—x—y—z—w, seed {c}: w is 4 hops out, 3 iterations cannot
    // reach it; everything nearer carries positive mass
    val und = Seq("c" -> "x", "x" -> "y", "y" -> "z", "z" -> "w")
    val e = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val got = Graph.pprLoop(e.toDF("src", "dst"), Seq("c"), 3)
      .as[(String, Long)].collect().toMap
    assert(got == localPpr(e, Set("c"), 3))
    assert(got("w") == 0L && got("z") > 0L && got("c") > 0L)
  }

  test("directed chain with un-reached node: left join keeps base rank") {
    // x → y → z, plus isolated self-pointing w (w → w keeps outdeg ≥ 1).
    val e = Seq("x" -> "y", "y" -> "z", "z" -> "x", "w" -> "w")
    val got = distPr(e, 2)
    assert(got == localPr(e, 2))
  }
}
