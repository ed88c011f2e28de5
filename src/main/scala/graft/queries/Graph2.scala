package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Link-analysis and recommendation operators over the derived graphs
  * (round-7 extension batch: HITS, item-item CF, weighted SSSP).
  *
  * Same determinism contract as [[Graph]]: every score is integer
  * arithmetic (BIGINT sums of BIGINT terms, truncating `div` only at
  * fixed-point emission), so the oracle hash can never drift by a ulp,
  * and every LIMIT cut carries a total tie-break order.
  *
  * Reference analog: the web-graph workload family
  * (`/root/reference` wg_maple.py/wg_juice.py computes in-degree —
  * HITS iteration 1's authority vector IS in-degree; these queries
  * carry the iterated forms a graph user runs next).
  */
object Graph2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Weighted part co-purchase edges (u < v, w = distinct orders
    * containing both). The WEIGHT-KEEPING sibling of
    * [[Graph.partCoPurchase]] (which drops w after thresholding):
    * item-item CF needs the co-occurrence count as the cosine
    * numerator and SSSP uses it as inverse edge cost. Same build-once
    * BUCKETED artifact discipline — one pairing shuffle per (corpus,
    * threshold), every consumer scans a u-clustered table. Kept as a
    * SEPARATE artifact name from part_cooc_ms2 so existing cached
    * layouts stay valid (cachedTable memoizes by name; silently
    * changing a name's schema would read a stale layout). */
  private[queries] def coPurchaseW(s: SparkSession, dir: String,
      minShared: Long): DataFrame = {
    val table = graft.engine.Bucketing.cachedTable(
      s, s"part_cooc_w_ms$minShared", dir, "u", 16) {
      val op = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      op.select(col("o"), col("p").as("u"))
        .join(op.select(col("o").as("o2"), col("p").as("v")),
          col("o") === col("o2") && col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
        .filter(col("w") >= minShared)
    }
    s.table(table)
  }

  /** Shared oracle prelude: the distinct (order, part) incidence and
    * the weighted co-purchase edge list, mirrored from the artifact
    * build above. */
  private val opEdgeSql: String =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |ew AS (SELECT a.p AS u, b.p AS v, CAST(count(*) AS BIGINT) AS w
      |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |       GROUP BY a.p, b.p HAVING count(*) >= 2)""".stripMargin

  /** One unrolled Bellman-Ford oracle round over the symmetric
    * weighted edges (`ee(s, d, cost)`): relax every edge out of the
    * previous frontier, keep the per-node min. */
  private def ssspIterSql(k: Int, prev: String): String =
    s"""d$k AS (SELECT node, MIN(dist) AS dist FROM (
       |  SELECT node, dist FROM $prev
       |  UNION ALL
       |  SELECT e.d AS node, p.dist + e.cost AS dist
       |  FROM $prev p JOIN ee e ON e.s = p.node) GROUP BY node)""".stripMargin

  /** Two unnormalized HITS iterations over a bipartite incidence
    * (c, sp): a₁ = in-degree, h₁ = Σ a₁ over a hub's authorities,
    * a₂ = Σ h₁ over an authority's hubs — every score an exact
    * BIGINT (see q_hits scaladoc for why normalization is elided). */
  private[queries] def hitsScores(cs: DataFrame): DataFrame = {
    val a1 = cs.groupBy(col("sp")).agg(count(lit(1)).as("a1"))
    val h1 = cs.join(a1, "sp")
      .groupBy(col("c")).agg(sum(col("a1")).as("h1"))
    val a2 = cs.join(h1, "c")
      .groupBy(col("sp")).agg(sum(col("h1")).as("a2"))
    a1.join(a2, "sp").select(col("sp"), col("a1"), col("a2"))
  }

  /** Fixed-round Bellman-Ford from a seed set over directed weighted
    * edges (s, d, cost): after round k each node's dist is the exact
    * min-cost path using ≤ k edges (nodes unreached in k hops are
    * absent). Integer costs ⇒ exact BIGINT distances. */
  private[queries] def ssspLoop(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    val und = edges.localCheckpoint(true)
    var dist = seeds.select(col("node")).withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relax = und.join(dist, und("s") === dist("node"))
        .select(col("d").as("node"), (col("dist") + col("cost")).as("dist"))
      dist = dist.unionByName(relax)
        .groupBy("node").agg(min(col("dist")).as("dist"))
    }
    dist
  }

  /** Shared oracle CTE: the symmetric co-purchase edge list `ee(s, d)`
    * (both directions of every u < v edge). */
  private val symEdgeSql: String =
    """op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e0 AS (SELECT a.p AS u, b.p AS v
      |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
      |       GROUP BY a.p, b.p HAVING count(*) >= 2),
      |ee AS (SELECT u AS s, v AS d FROM e0
      |       UNION ALL SELECT v AS s, u AS d FROM e0)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── degree assortativity of the co-purchase graph ──
    // Pearson correlation between the degrees at the two ends of an
    // edge — positive: hubs link hubs (social-network shape);
    // negative: hubs link leaves (star/dependency shape). Over the
    // SYMMETRIC edge list both marginals are identical, so the
    // denominator n·Σx² − (Σx)² is a plain integer and
    // r = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) is PURE RATIONAL — no
    // sqrt, emitted as truncating micro-unit fixed point, hash-exact.
    // One degree aggregate + one edge⋈degree join per side + a 1-row
    // moment aggregate. Headroom (round-14 audit — this query's own
    // r7 comment deferred the widening; the design point calls it
    // due): with ~1e11 symmetric edges and hub degrees ~1e6, a
    // per-edge dx·dy term is ~1e12 and Σxy passes 2^63 at ~1e7 such
    // terms — an ANSI ArithmeticException under the Spark 4 default
    // (silent wrap with ANSI off) while the DuckDB twin sums in
    // HUGEINT. Σxy/Σxx therefore accumulate DECIMAL(38,0) (the
    // per-row product rides the EDGE table — itself an aggregate,
    // two joins above the scan) and the cleared 1-row products run
    // decimal too: n·Σxy ~ 1e28 and ×10⁶ ~ 1e34 for realistic
    // magnitudes, inside 38 digits (an adversarial 1e11-edge/1e6-hub
    // corpus tops 38 digits and fails LOUDLY — never a wrapped wrong
    // number). `div` returns BIGINT for decimal inputs, so assort_fp
    // keeps its declared type and tested-SF hashes pin.
    Q("q_assortativity",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val e = Graph.partCoPurchase(s, dir, 2L)
        val und = e.select(col("u").as("s"), col("v").as("d"))
          .unionByName(e.select(col("v").as("s"), col("u").as("d")))
        val deg = und.groupBy(col("s").as("node")).agg(count(lit(1)).as("dg"))
          .localCheckpoint(true)
        und
          // node-scaled degree table: no broadcast hint (AQE decides)
          .join(deg.select(col("node").as("s"), col("dg").as("dx")), Seq("s"))
          .join(deg.select(col("node").as("d"), col("dg").as("dy")), Seq("d"))
          .agg(count(lit(1)).as("n"),
            sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
            sum(dec(col("dx")) * col("dy")).as("sxy"),
            sum(dec(col("dx")) * col("dx")).as("sxx"))
          .select(col("n"),
            expr("(n * sxy - sx * cast(sy as decimal(38,0))) * 1000000L " +
                "div (n * sxx - sx * cast(sx as decimal(38,0)))")
              .as("assort_fp"))
      },
      Some(s"""WITH $symEdgeSql,
              |dg AS (SELECT s AS node, CAST(count(*) AS BIGINT) AS dg
              |       FROM ee GROUP BY s),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |        SUM(CAST(a.dg AS HUGEINT)) AS sx,
              |        SUM(CAST(b.dg AS HUGEINT)) AS sy,
              |        SUM(CAST(a.dg AS HUGEINT) * b.dg) AS sxy,
              |        SUM(CAST(a.dg AS HUGEINT) * a.dg) AS sxx
              |      FROM ee JOIN dg a ON a.node = ee.s
              |              JOIN dg b ON b.node = ee.d)
              |SELECT n, CAST((n * sxy - sx * sy) * 1000000
              |          // (n * sxx - sx * sx) AS BIGINT) AS assort_fp
              |FROM m""".stripMargin)),

    // ── modularity of the 3-round label-propagation communities ──
    // The quality score for q_labelprop's partition: Q = Σ_c [e_c/m −
    // (d_c/2m)²] over communities c (e_c = intra-community edges,
    // d_c = total degree in c, m = |E|). Cleared to integers:
    // Q = Σ_c (4·m·e_c − d_c²) / (4·m²) — emitted as micro-unit
    // fixed point, hash-exact. Community stats are two keyed
    // aggregates against the node-sized label vector; the labels
    // re-run the SAME 3-round loop as q_labelprop (and the oracle
    // unrolls the same rounds), so the score evidences THAT declared
    // partition, not an arbitrary one.
    // The cleared per-community term and the 4m² divisor run
    // DECIMAL(38,0) on the COMMUNITY cell table (round-14 audit):
    // 4·m·e_c and d_c² are products of two edge-count-sized factors,
    // so at the ~1e11-edge design point they sit at ~4e22 — past
    // int64, an ANSI ArithmeticException under the Spark 4 default
    // (silent wrap with ANSI off) — while the DuckDB twin multiplies
    // in HUGEINT; ×10⁶ tops at ~4e29, inside 38 digits. q_fp
    // (|Q|·10⁶ ≤ 10⁶) and the declared num_sum column stay BIGINT —
    // num_sum's final cast fails overtly at the declared-type
    // boundary, never silently (the q_decay_trend precedent).
    Q("q_modularity",
      (s, dir) => {
        val e = Graph.partCoPurchase(s, dir, 2L)
        val labels = Graph.labelProp(e, 3).localCheckpoint(true)
        // 1-row edge count rides a broadcast, never a driver collect
        // (the q_argmax_ties idiom)
        val mdf = e.agg(count(lit(1)).as("m"))
        val intra = e
          .join(labels.select(col("node").as("u"), col("lbl").as("lu")), Seq("u"))
          .join(labels.select(col("node").as("v"), col("lbl").as("lv")), Seq("v"))
          .filter(col("lu") === col("lv"))
          .groupBy(col("lu").as("comm")).agg(count(lit(1)).as("e_in"))
        val und = e.select(col("u").as("node"))
          .unionByName(e.select(col("v").as("node")))
        val dsum = und.groupBy("node").agg(count(lit(1)).as("dg"))
          .join(labels, "node")
          .groupBy(col("lbl").as("comm")).agg(sum(col("dg")).as("d_sum"))
        dsum.join(intra, Seq("comm"), "left")
          .crossJoin(broadcast(mdf))
          .withColumn("num",
            lit(4L) * col("m").cast(
                org.apache.spark.sql.types.DecimalType(38, 0)) *
              coalesce(col("e_in"), lit(0L)) -
              col("d_sum").cast(
                org.apache.spark.sql.types.DecimalType(38, 0)) * col("d_sum"))
          .groupBy("m")
          .agg(count(lit(1)).as("n_comms"), sum(col("num")).as("num_sum_dec"))
          .select(col("n_comms"), col("m"),
            col("num_sum_dec").cast("long").as("num_sum"),
            expr("num_sum_dec * 1000000L " +
                "div (4L * cast(m as decimal(38,0)) * m)").as("q_fp"))
      },
      Some("""WITH op AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e0 AS (SELECT a.p AS u, b.p AS v
             |       FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             |       GROUP BY a.p, b.p HAVING count(*) >= 2),
             |ee AS (SELECT u AS s, v AS d FROM e0
             |       UNION ALL SELECT v AS s, u AS d FROM e0),
             |l0 AS (SELECT DISTINCT s AS node, s AS lbl FROM ee),
             |l1 AS (SELECT node, MIN(lbl) AS lbl FROM (
             |  SELECT node, lbl FROM l0
             |  UNION ALL
             |  SELECT e.d AS node, l0.lbl FROM ee e JOIN l0 ON l0.node = e.s)
             |  GROUP BY node),
             |l2 AS (SELECT node, MIN(lbl) AS lbl FROM (
             |  SELECT node, lbl FROM l1
             |  UNION ALL
             |  SELECT e.d AS node, l1.lbl FROM ee e JOIN l1 ON l1.node = e.s)
             |  GROUP BY node),
             |l3 AS (SELECT node, MIN(lbl) AS lbl FROM (
             |  SELECT node, lbl FROM l2
             |  UNION ALL
             |  SELECT e.d AS node, l2.lbl FROM ee e JOIN l2 ON l2.node = e.s)
             |  GROUP BY node),
             |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
             |intra AS (SELECT lu.lbl AS comm, CAST(count(*) AS BIGINT) AS e_in
             |          FROM e0 JOIN l3 lu ON lu.node = e0.u
             |                  JOIN l3 lv ON lv.node = e0.v
             |          WHERE lu.lbl = lv.lbl GROUP BY lu.lbl),
             |dsum AS (SELECT l3.lbl AS comm, CAST(SUM(dg.dg) AS BIGINT) AS d_sum
             |         FROM (SELECT s AS node, CAST(count(*) AS BIGINT) AS dg
             |               FROM ee GROUP BY s) dg
             |         JOIN l3 ON l3.node = dg.node GROUP BY l3.lbl),
             |terms AS (SELECT d.comm,
             |            4 * CAST(mm.m AS HUGEINT) * COALESCE(i.e_in, 0)
             |              - CAST(d.d_sum AS HUGEINT) * d.d_sum AS num
             |          FROM dsum d LEFT JOIN intra i ON i.comm = d.comm
             |          CROSS JOIN mm)
             |SELECT CAST(count(*) AS BIGINT) AS n_comms, mm.m AS m,
             |       CAST(SUM(num) AS BIGINT) AS num_sum,
             |       CAST(SUM(num) * 1000000
             |         // (4 * CAST(mm.m AS HUGEINT) * mm.m) AS BIGINT) AS q_fp
             |FROM terms CROSS JOIN mm GROUP BY mm.m""".stripMargin)),

    // ── HITS hubs & authorities (2 fixed iterations, pure integer) ──
    // Bipartite customer→supplier link graph: hubs = customers,
    // authorities = suppliers. Unnormalized power iteration keeps
    // every score an exact BIGINT (a₁ = in-degree; h₁ = Σ a₁ over a
    // customer's suppliers; a₂ = Σ h₁ over a supplier's customers) —
    // the per-iteration L2 normalization of textbook HITS only
    // rescales, so the top-k ORDER is identical and the integers are
    // hash-exact. 100 TB: each iteration is one join of the bucketed
    // incidence artifact against a node-sized score vector + one
    // keyed sum — the custSuppEdges/pageRank shape; at extreme
    // iteration counts unnormalized scores grow geometrically, so a
    // deep-iteration deployment switches to micro-unit fixed-point
    // with per-round max-rescale (the pageRank micro-unit idiom).
    Q("q_hits",
      (s, dir) =>
        hitsScores(Graph.custSupp(s, dir))
          .orderBy(col("a2").desc, col("sp"))
          .limit(20),
      Some("""WITH cs AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |a1 AS (SELECT sp, CAST(count(*) AS BIGINT) AS a1
             |       FROM cs GROUP BY sp),
             |h1 AS (SELECT c, CAST(SUM(a1.a1) AS BIGINT) AS h1
             |       FROM cs JOIN a1 ON cs.sp = a1.sp GROUP BY c),
             |a2 AS (SELECT cs.sp, CAST(SUM(h1.h1) AS BIGINT) AS a2
             |       FROM cs JOIN h1 ON cs.c = h1.c GROUP BY cs.sp)
             |SELECT a1.sp, a1.a1, a2.a2
             |FROM a1 JOIN a2 ON a1.sp = a2.sp
             |ORDER BY a2.a2 DESC, a1.sp LIMIT 20""".stripMargin)),

    // ── item-item collaborative filtering (co-purchase cosine) ──
    // The "customers who bought X also bought Y" primitive: cosine
    // similarity between parts over the order-incidence vectors,
    // cos²(i,j) = w²ᵢⱼ/(nᵢ·nⱼ) in fixed point — squaring keeps the
    // score MONOTONE in cosine (all terms non-negative) while staying
    // entirely in integer arithmetic (no sqrt, no doubles). Inverted-
    // index shape: pairs come from the bucketed co-purchase artifact
    // (never all-pairs — candidates require a shared order), the
    // part-frequency table is broadcast (parts ≪ lineitem; at 100 TB
    // it stays millions of rows — a few hundred MB — or falls back to
    // a join on the bucketed u key). w²·10⁶ needs headroom: BIGINT
    // carries w up to ~3·10⁶ before a production corpus moves the
    // numerator to DECIMAL(38,0).
    Q("q_itemcf",
      (s, dir) => {
        val ew = coPurchaseW(s, dir, 2L)
        val op = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        // parts-sized; materialized ONCE — both broadcast sides read
        // the checkpoint instead of re-running the distinct+aggregate
        val n = op.groupBy(col("p")).agg(count(lit(1)).as("n"))
          .localCheckpoint(true)
        // parts-scaled count table: no broadcast hint (AQE decides)
        ew.join(n.select(col("p").as("u"), col("n").as("nu")), Seq("u"))
          .join(n.select(col("p").as("v"), col("n").as("nv")), Seq("v"))
          // cosine² as a product of two already-reduced per-mille
          // factors (the q_gains overflow discipline): w²·10⁶ wraps
          // int64 once w passes ~3e6 co-raters, while each factor
          // w·10³ div n is ≤ 10³ (w ≤ n by construction) and the
          // product lands back on the 10⁶ scale; the two truncations
          // are identical in both engines
          .withColumn("cos2_fp",
            expr("(w * 1000L div nu) * (w * 1000L div nv)"))
          .select("u", "v", "w", "nu", "nv", "cos2_fp")
          .orderBy(col("cos2_fp").desc, col("u"), col("v"))
          .limit(30)
      },
      Some(s"""WITH $opEdgeSql,
              |n AS (SELECT p, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY p)
              |SELECT u, v, w, nu.n AS nu, nv.n AS nv,
              |  (w * 1000 // nu.n) * (w * 1000 // nv.n) AS cos2_fp
              |FROM ew JOIN n nu ON nu.p = ew.u JOIN n nv ON nv.p = ew.v
              |ORDER BY cos2_fp DESC, u, v LIMIT 30""".stripMargin)),

    // ── degree distribution of the co-purchase graph ──
    // The graph-profile operator run before choosing any algorithm
    // parameter (k for k-core, salting for adjacency skew): node
    // count per exact degree. Two keyed integer aggregates — node-
    // sized then degree-sized output; the heavy tail (or its absence)
    // is exactly what the round-6 triangle-vacuity audit had to
    // establish by hand.
    Q("q_degree_dist",
      (s, dir) => {
        val e = Graph.partCoPurchase(s, dir, 2L)
        val und = e.select(col("u").as("node"))
          .unionByName(e.select(col("v").as("node")))
        und.groupBy("node").agg(count(lit(1)).as("deg"))
          .groupBy("deg").agg(count(lit(1)).as("n_nodes"))
          .orderBy("deg")
      },
      Some("""WITH op AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (
             |  SELECT a.p AS u, b.p AS v
             |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
             |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
             |nd AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
             |dg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
             |       FROM nd GROUP BY node)
             |SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
             |FROM dg GROUP BY deg ORDER BY deg""".stripMargin)),

    // ── weighted single-source shortest paths (3 Bellman-Ford rounds) ──
    // The weighted generalization of q_nhop's BFS: edge cost =
    // 10⁶ div w (stronger co-purchase = cheaper hop), distances from
    // the seed parts (id ≤ 20) relax for 3 fixed rounds — after round
    // k every node holds the exact min-cost path using ≤ k edges
    // (Bellman-Ford invariant; fixed rounds keep the oracle an
    // unrolled CTE, the pageRankConverged epsilon-loop is the
    // production fixpoint form). Integer costs make every distance an
    // exact BIGINT. Per round: one join of the materialized-once
    // symmetric edge list against the node-sized frontier + one min
    // aggregate — edges never recompute, the distance vector is the
    // only thing that moves.
    Q("q_sssp",
      (s, dir) => {
        val ew = coPurchaseW(s, dir, 2L)
        val und = ew
          .select(col("u").as("s"), col("v").as("d"),
            expr("1000000L div w").as("cost"))
          .unionByName(ew.select(col("v").as("s"), col("u").as("d"),
            expr("1000000L div w").as("cost")))
        val seeds = und.select(col("s").as("node")).distinct()
          .filter(col("node") <= 20)
        ssspLoop(und, seeds, 3).orderBy("node")
      },
      Some(s"""WITH $opEdgeSql,
              |ee AS (SELECT u AS s, v AS d, 1000000 // w AS cost FROM ew
              |       UNION ALL SELECT v AS s, u AS d, 1000000 // w AS cost FROM ew),
              |d0 AS (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS dist
              |       FROM ee WHERE s <= 20),
              |${ssspIterSql(1, "d0")},
              |${ssspIterSql(2, "d1")},
              |${ssspIterSql(3, "d2")}
              |SELECT node, dist FROM d3 ORDER BY node""".stripMargin)),

    // ── bounded-radius harmonic centrality (radius 2) ──
    // Harmonic closeness Σ 1/d(u,v) truncated at 2 hops, in exact
    // micro-units: deg·10⁶ + (|reach≤2| − deg)·5·10⁵. Full closeness
    // needs all-pairs BFS (quadratic); the radius-bounded form is the
    // standard curation-grade centrality — the frontier expansion is
    // ONE self-join of the materialized-once symmetric edge list
    // (cost Σ deg², bounded; a whale-hub graph caps the adjacency
    // first — the Dedup.capBuckets discipline), then a distinct and a
    // count per node. Top-100 head with a deterministic (score, node)
    // tie-break = TakeOrderedAndProject, never a full result sort.
    Q("q_harmonic_cent",
      (s, dir) => {
        val e = Graph.partCoPurchase(s, dir, 2L)
        val und = e.select(col("u").as("s"), col("v").as("d"))
          .unionByName(e.select(col("v").as("s"), col("u").as("d")))
          .localCheckpoint(true)
        val hop2 = und.select(col("s").as("a"), col("d").as("m"))
          .join(und.select(col("s").as("m"), col("d").as("b")), Seq("m"))
          .filter(col("b") =!= col("a"))
          .select(col("a").as("s"), col("b").as("d"))
        val reach = und.unionByName(hop2).distinct()
          .groupBy("s").agg(count(lit(1)).as("reach2"))
        val deg = und.groupBy("s").agg(count(lit(1)).as("deg"))
        deg.join(reach, Seq("s"))
          .select(col("s").as("node"), col("deg"), col("reach2"),
            (col("deg") * 1000000L + (col("reach2") - col("deg")) * 500000L)
              .as("harmonic_ppm"))
          .orderBy(col("harmonic_ppm").desc, col("node"))
          .limit(100)
      },
      Some(s"""WITH $symEdgeSql,
              |n2 AS (SELECT DISTINCT a.s AS s, b.d AS d
              |       FROM ee a JOIN ee b ON a.d = b.s WHERE b.d <> a.s),
              |r AS (SELECT s, d FROM ee UNION SELECT s, d FROM n2),
              |dg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg
              |       FROM ee GROUP BY s),
              |rc AS (SELECT s, CAST(count(*) AS BIGINT) AS reach2
              |       FROM r GROUP BY s)
              |SELECT dg.s AS node, deg, reach2,
              |  deg * 1000000 + (reach2 - deg) * 500000 AS harmonic_ppm
              |FROM dg JOIN rc ON dg.s = rc.s
              |ORDER BY harmonic_ppm DESC, node LIMIT 100""".stripMargin))
  )
}
