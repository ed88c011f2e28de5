package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Iterative graph analytics over the star-schema-derived link graph.
  *
  * The reference's flagship demo workload is web-graph in-degree
  * (`wg_maple.py`/`wg_juice.py`, re-expressed in
  * `workloads/Workloads.scala`); this module carries the natural next
  * step a graph user asks for — PageRank — as a declared, oracle-checked
  * query. The rank loop is the same shape a 1000-executor job would run:
  * the edge list is a build-once Scratch artifact, the edge+degree
  * relation is cached hash-partitioned on the join key and reused by
  * every iteration, each iteration exchanges only the node-sized rank
  * vector plus one dst-keyed aggregation — nothing driver-side.
  *
  * Determinism contract: ranks are BIGINT micro-units (1.0 ≡ 10⁶), all
  * updates are integer multiply/floor-divide (`div` in Spark, `//` in
  * DuckDB — both truncate toward zero on the non-negative values here),
  * and BIGINT sums are exact in any accumulation order. No doubles
  * anywhere, so the oracle hash can never drift by a ulp.
  */
object Graph {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Damping 0.85 in micro-units: r' = 150000 + (85 · Σ contrib) / 100. */
  private val BaseU = 150000L
  private val RankOneU = 1000000L

  /** Symmetric bipartite customer↔supplier graph: an (undirected) edge
    * for every (customer, supplier) pair that shares at least one order.
    * Prefixes keep the two key spaces disjoint in one string node id.
    *
    * Persisted as a Scratch artifact: the edge list is a derived table
    * every graph query starts from — a deployment materializes it once
    * per corpus version (the orders⋈lineitem distinct is ~40% of a
    * cold pageRank run); here it builds on first use per (JVM, corpus)
    * and q_pagerank/q_nhop and every later bench pass read the parquet. */
  private def custSuppEdges(s: SparkSession, dir: String): DataFrame = {
    val path = graft.engine.Scratch.cached("graph_edges", dir) { p =>
      val pairs = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("a"),
                concat(lit("s"), col("l_suppkey")).as("b"))
        .distinct()
      pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
        .write.parquet(p)
    }
    s.read.parquet(path)
  }

  /** Fixed-iteration PageRank on a symmetric edge list. The symmetric
    * construction means every node has out-degree ≥ 1, so there is no
    * dangling mass to redistribute and the per-iteration update is
    * exactly: r'(n) = base + damping · Σ_{(m,n)∈E} r(m)/outdeg(m).
    *
    * 100 TB shape: `ed` (edges ⋈ out-degrees) is the big relation — it
    * materializes once and every iteration shuffles it by `src` for the
    * rank join, then by `dst` for the contribution sum. The rank vector
    * is O(nodes) and re-derives per iteration; for deep iteration counts
    * the componentsOf RDD-rebase idiom (Dedup.scala:369) bounds the plan
    * tree — at the fixed 3 iterations here the lineage stays shallow.
    */
  private[graft] def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // The edge relation is computed once and CACHED hash-partitioned
    // on src: InMemoryRelation preserves its child's output
    // partitioning, so each iteration's rank join exchanges only the
    // node-sized rank vector, never the edge relation. (localCheckpoint
    // is NOT enough — LogicalRDD comes back UnknownPartitioning and
    // every iteration re-shuffles the edges; measured 6.5 s → see
    // SCALE.md.) The web-scale shape: ranks are far too big to
    // broadcast, edges far too big to move more than once.
    val ed = edges.join(outdeg, "src").repartition(col("src")).cache()
    val nodes = ed.select(col("src").as("node")).distinct()
    var ranks = nodes.withColumn("r", lit(RankOneU))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(ranks, ed("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("cs"))
      ranks = nodes
        .join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(BaseU) + expr("(85 * coalesce(cs, 0L)) div 100")).as("r"))
    }
    // materialize the node-sized result, then release the cache — the
    // componentsOf discipline: no persisted state outlives the call
    val out = ranks.orderBy("node").localCheckpoint(true)
    ed.unpersist()
    out
  }

  /** Fixed-depth BFS with min-hop labels: every node reachable from the
    * seed set within `hops` edge traversals, labeled with its BFS
    * distance. Each round joins the known frontier (node-sized) against
    * the cached src-partitioned edge relation and re-minimizes — the
    * candidate label is the round number, so a node keeps the first
    * round that reached it. Same cache discipline as [[pageRank]]. */
  private[graft] def nHop(edges: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    val ed = edges.repartition(col("src")).cache()
    var d = seeds.withColumn("dist", lit(0L))
    for (k <- 1 to hops) {
      val nxt = d.join(ed, d("node") === ed("src"))
        .select(col("dst").as("node"), lit(k.toLong).as("dist"))
      d = d.unionByName(nxt).groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    val out = d.orderBy("node").localCheckpoint(true)
    ed.unpersist()
    out
  }

  private val seedNodes: Seq[String] = (0 to 9).map(i => s"c$i")

  private def nhopIterSql(k: Int, prev: String): String =
    s"""d$k AS (SELECT node, MIN(dist) AS dist FROM (
       |  SELECT node, dist FROM $prev
       |  UNION ALL
       |  SELECT e.dst AS node, CAST($k AS BIGINT) AS dist
       |  FROM $prev p JOIN e ON e.src = p.node) GROUP BY node)""".stripMargin

  /** One unrolled oracle iteration; `prev` names the previous rank CTE. */
  private def iterSql(k: Int, prev: String): String =
    s"""r$k AS (
       |  SELECT n.node,
       |         CAST($BaseU + (85 * COALESCE(s.cs, 0)) // 100 AS BIGINT) AS r
       |  FROM n LEFT JOIN (
       |    SELECT e.dst, SUM(p.r // d.deg) AS cs
       |    FROM e JOIN d ON e.src = d.src
       |           JOIN $prev p ON p.node = e.src
       |    GROUP BY e.dst) s ON s.dst = n.node)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── PageRank, 3 fixed iterations, integer micro-unit arithmetic ──
    Q("q_pagerank",
      (s, dir) => pageRank(custSuppEdges(s, dir), 3),
      Some(s"""WITH co AS (
              |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              |e AS (SELECT a AS src, b AS dst FROM co
              |      UNION ALL SELECT b AS src, a AS dst FROM co),
              |d AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
              |n AS (SELECT DISTINCT src AS node FROM e),
              |r0 AS (SELECT node, CAST($RankOneU AS BIGINT) AS r FROM n),
              |${iterSql(1, "r0")},
              |${iterSql(2, "r1")},
              |${iterSql(3, "r2")}
              |SELECT node, r FROM r3 ORDER BY node""".stripMargin)),

    // ── 3-hop BFS reachability with min-hop labels from a seed set ──
    Q("q_nhop",
      (s, dir) => {
        val edges = custSuppEdges(s, dir)
        val seeds = edges.select(col("src").as("node")).distinct()
          .filter(col("node").isin(seedNodes: _*))
        nHop(edges, seeds, 3)
      },
      Some(s"""WITH co AS (
              |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
              |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
              |e AS (SELECT a AS src, b AS dst FROM co
              |      UNION ALL SELECT b AS src, a AS dst FROM co),
              |d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
              |       FROM e WHERE src IN (${seedNodes.map(n => s"'$n'").mkString(", ")})),
              |${nhopIterSql(1, "d0")},
              |${nhopIterSql(2, "d1")},
              |${nhopIterSql(3, "d2")}
              |SELECT node, dist FROM d3 ORDER BY node""".stripMargin))
  )
}
