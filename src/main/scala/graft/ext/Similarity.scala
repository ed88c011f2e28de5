package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.Tables
import graft.functions.VecOps.{vec_dot, vec_norm2}
import graft.queries.Q

/** Similarity search + embedding near-dup over `embeddings`
  * (64-dim float vectors).
  *
  * Cosine is computed with the codegen'd [[graft.functions.VecDot]]
  * expression — a strict left-to-right fold, so the DuckDB oracles'
  * sequential `list_reduce` computes the bit-identical double.
  *
  * Scale design:
  *   - brute-force top-k keeps the small query side broadcast, scans
  *     the corpus once, and avoids a global sort via per-query
  *     windowed top-k (partial top-k per partition under AQE);
  *   - the LSH path buckets vectors by 8 random-hyperplane sign bits
  *     (deterministic literal planes) so candidate generation is an
  *     equi-join on the bucket key — the pattern that survives 1000
  *     executors; re-ranking is exact cosine within buckets only.
  */
object Similarity {

  /** Deterministic ±1 hyperplanes, seed 42; `planesFor(8)` is the
    * shipped configuration (RECALL.md justifies the choice), larger n
    * extends the same sequence for the recall harness sweeps. */
  def planesFor(n: Int): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(42)
    Seq.fill(n)(Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }

  /** Shipped hyperplanes: 8 planes × 64 dims. */
  val planes: Seq[Seq[Double]] = planesFor(8)

  /** Sign-bucket column for an arbitrary plane set (codegen'd dots). */
  def bucketColFor(ps: Seq[Seq[Double]], e: Column): Column = {
    val bits = ps.map { p =>
      // D suffix: plain 1.0 would parse as DECIMAL(2,1), not DOUBLE
      val lit = p.map(d => s"${d}D").mkString("array(", ", ", ")")
      when(vec_dot(e, expr(lit)) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Corpus-side membership cap per sign bucket: a flood of identical
    * vectors lands in one bucket and would make the candidate join
    * quadratic on one executor. Membership is ranked deterministically
    * by vec_id and truncated; queries still probe their full bucket.
    * Measured max bucket on the driver corpora is 8 (sf0.01) / 30
    * (sf0.1), so the cap is invisible there (asserted in
    * DedupSkewSpec); exact-dedup-first remains the documented contract
    * for mass duplication. */
  val lshBucketCap = 256

  /** Embedding near-dup cosine threshold — ONE definition interpolated
    * into the [[fullVectorPairs]] builder AND every DuckDB oracle that
    * replays it (pair report, resolve, incremental, DBSCAN ε-graph), so
    * the artifact and its oracles cannot drift on the gate. */
  val embedDupCos = 0.4

  /** Shared embedding prep (double cast + norm) — package-visible so
    * the recall harness/specs measure against the exact production
    * pipeline rather than a hand-rolled copy that can drift. */
  private[ext] def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", sqrt(vec_norm2(col("e"))))

  /** DuckDB: double-cast embedding + norm, as CTE body. */
  private val duckEmb =
    """SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (acc, x) -> acc + x)) AS nrm
      |FROM embeddings""".stripMargin

  /** DuckDB sequential dot of two double-list columns. The length
    * guard mirrors [[graft.functions.VecDot]]'s null-on-mismatch
    * contract exactly (range-indexing alone would yield NULL only when
    * `b` is the shorter side). */
  private def duckDot(a: String, b: String): String =
    s"""(CASE WHEN len($a) <> len($b) THEN NULL ELSE
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])),
       |    (acc, x) -> acc + x) END)""".stripMargin

  /** Cosine with a zero-norm guard. A zero embedding (the common
    * missing-value fill in real corpora) otherwise yields 0/0 = NaN,
    * and NaN sorts as the LARGEST double in both engines — so one junk
    * vector would top every ANN top-k list and pass every `cos >=
    * threshold` dedup gate (NaN >= x is true in the DESC-sort world
    * both sides use). Similarity to nothing is 0. [[duckCos]] is the
    * oracle twin; fixture embeddings have no zero norms (full or
    * truncated prefixes), so every pinned hash is unchanged. */
  private def cosine(aE: Column, aN: Column, bE: Column, bN: Column): Column =
    when(aN * bN === 0.0, lit(0.0))
      .otherwise(vec_dot(aE, bE) / (aN * bN))

  /** DuckDB twin of [[cosine]] (same zero-norm guard). */
  private def duckCos(ae: String, an: String, be: String, bn: String): String =
    s"""(CASE WHEN $an * $bn = 0 THEN CAST(0 AS DOUBLE)
       |  ELSE ${duckDot(ae, be)} / ($an * $bn) END)""".stripMargin

  // ── deterministic k-means (Lloyd) for the IVF codebook ──
  //
  // Both engines run the IDENTICAL iteration: init = the first K
  // vectors as centroids; each step assigns every vector to the
  // centroid minimizing the Euclidean distance key
  // `dot(c,c) - 2*dot(x,c)` (ties on lowest cid) and recomputes
  // dimension-wise means with floor(x·10⁹) fixed-point accumulation
  // (order-independent exact integer sums, deterministic divisions) —
  // so Spark and the DuckDB oracle derive bit-identical codebooks,
  // assignments, and therefore identical IVF results. At cluster scale
  // the fit runs on a sample (centroid count and iteration count are
  // tiny); assignment stays a broadcast join over the full corpus.

  val ivfK = 16
  val ivfIters = 3

  /** Distance key for argmin assignment: dot(c,c) - 2*dot(x,c). */
  private def distKey(e: Column, ce: Column): Column =
    vec_dot(ce, ce) - lit(2.0) * vec_dot(e, ce)

  private def duckDistKey(e: String, ce: String): String =
    s"${duckDot(ce, ce)} - 2 * ${duckDot(e, ce)}"

  /** Cross every row of `df` with every codebook entry — as a literal
    * explode, NOT a join: the codebook is K = [[ivfK]] rows by
    * construction, so it's fetched to the driver (bounded, the
    * q_approx_percentile idiom) and inlined as a literal array that a
    * Generate expands inside codegen. A condition-less
    * `join(broadcast(cent))` plans as BroadcastNestedLoopJoin — same
    * work here, but a plan node that at ANY other cardinality is a
    * scale bug; this shape keeps the K-bounded cross impossible to
    * confuse with one. Result order independence: consumers rank by
    * (dk, cid), never by entry order. */
  private def explodeCentroids(df: DataFrame, cent: DataFrame): DataFrame = {
    val rows = cent.select(col("cid").cast("long"), col("ce")).collect()
    require(rows.nonEmpty && rows.length <= 4 * ivfK,
      s"codebook unexpectedly sized ${rows.length} — not a bounded fetch")
    val entries = rows.map { r =>
      struct(lit(r.getLong(0)).as("cid"),
        array(r.getSeq[Double](1).map(lit(_)): _*).as("ce"))
    }
    df.select(col("*"), explode(array(entries.toSeq: _*)).as("c"))
      .withColumn("cid", col("c.cid")).withColumn("ce", col("c.ce"))
      .drop("c")
  }

  /** Assign each vector to its nearest centroid (cid tie-break). */
  private def assignCells(v: DataFrame, cent: DataFrame): DataFrame =
    explodeCentroids(v, cent)
      .withColumn("dk", distKey(col("e"), col("ce")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dk"), col("cid"))))
      .filter(col("rn") === 1)
      .select("vec_id", "cid")

  /** Dimension-wise fixed-point-exact means of each cluster. The
    * accumulation quantizes each element with `floor(x·10⁹)` into
    * DECIMAL(38,0) (exact, order-free integer sums; HUGEINT on the
    * DuckDB side) — the Holt-backtest idiom — NOT a double→DECIMAL
    * cast: a value landing exactly on a 9-decimal tie (any odd
    * multiple of 2⁻¹⁰, representable in float) rounds HALF_UP in
    * Spark but half-even in DuckDB, diverging the codebook by one
    * quantum and every downstream assignment with it (the
    * q_cluster_outlier lesson). floor of the identical IEEE product
    * is bit-equal on both engines; the mean is two deterministic
    * double divisions in fixed order. */
  private def centroidsOf(v: DataFrame, assign: DataFrame): DataFrame =
    assign.join(v.select("vec_id", "e"), "vec_id")
      .select(col("cid"), posexplode(col("e")))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(floor(col("col") * lit(1e9)).cast(DecimalType(38, 0)))
        .cast("double") / count(lit(1)) / lit(1e9)).as("m"))
      .groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
        .as("ce"))

  /** Lloyd iterations over `fit` from `seeds` → final codebook.
    * Eager local checkpoint per iteration (the componentsOf pattern):
    * the materialized state is tiny — N assignment rows / K centroid
    * rows — and without truncation every consumer replays the whole
    * nested Lloyd lineage (cent is read by both probes and cells). */
  private def lloydCodebook(fit: DataFrame, seeds: DataFrame): DataFrame = {
    var assign = assignCells(fit, seeds).localCheckpoint(true)
    (1 to ivfIters).foreach { _ =>
      assign = assignCells(fit, centroidsOf(fit, assign)).localCheckpoint(true)
    }
    centroidsOf(fit, assign).localCheckpoint(true)
  }

  /** Trained codebook + final cell assignment: `ivfIters` Lloyd steps
    * from the first-K init, then one last codebook + assignment pass so
    * cells and probes share the same centroids. FULL-corpus fit — the
    * exhaustively-oracled variant; [[kmeansFitSampled]] is the shape a
    * deployment runs. */
  def kmeansFit(v: DataFrame): (DataFrame, DataFrame) = {
    val cent = lloydCodebook(v,
      v.filter(col("vec_id") < ivfK)
        .select(col("vec_id").as("cid"), col("e").as("ce")))
    (cent, assignCells(v, cent))
  }

  /** Codebook trained on a DETERMINISTIC 1/`sampleMod` hash-sample of
    * the corpus (the q_sample_hash idiom: md5-keyed, so the same rows
    * sample on every run and engine), full corpus assigned via the
    * broadcast codebook. This decouples training cost from corpus
    * size — the centroid estimate needs sample-many vectors, not
    * corpus-many, so at 100 TB the `ivfIters`+1 fit passes touch a
    * fixed-size sample and the full corpus is scanned exactly once
    * (the assignment). Seeds: the `ivfK` lowest-id sampled vectors
    * (distributed TakeOrdered — no global sort). */
  def kmeansFitSampled(v: DataFrame, sampleMod: Int): (DataFrame, DataFrame) = {
    val vs = v.filter(expr(graft.functions.HashSample.spark("vec_id", sampleMod)))
    val seeds = vs.orderBy("vec_id").limit(ivfK)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    val cent = lloydCodebook(vs, seeds)
    (cent, assignCells(v, cent))
  }

  /** Build the PERSISTED IVF index at `path`: `cent/` (cid, ce — the
    * sample-trained codebook) and `cells/` (vec_id, cid — the full
    * corpus assignment, laid out by cid so a probe's candidate fetch is
    * co-located). The build-once artifact an ANN deployment writes per
    * corpus version; probes read it instead of retraining in-query. */
  /** Declared on-disk layout of the IVF index — folded into the
    * Scratch cache key (a layout change re-keys the artifact, so a
    * durable root can never serve the old schema) and enforced by
    * [[graft.engine.Scratch.writeDeclared]] at build time (a builder
    * edit without the matching declaration update fails loudly). */
  val ivfIndexOuts: Seq[(String, org.apache.spark.sql.types.StructType)] = Seq(
    "cent" -> org.apache.spark.sql.types.StructType.fromDDL(
      "cid BIGINT, ce ARRAY<DOUBLE>"),
    "cells" -> org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, cid BIGINT"))

  /** ONE write path for both IVF index builders (full and sampled
    * fit): the declared-layout enforcement and the cid-clustered
    * cells layout live here so the two artifacts can never drift. */
  private def writeIvfIndex(cent: DataFrame, cells: DataFrame,
      path: String): Unit = {
    val declared = ivfIndexOuts.toMap
    graft.engine.Scratch.writeDeclared(cent, declared("cent"), s"$path/cent")
    graft.engine.Scratch.writeDeclared(cells.repartition(col("cid")),
      declared("cells"), s"$path/cells")
  }

  def buildIvfIndex(v: DataFrame, path: String, sampleMod: Int): Unit = {
    val (cent, cells) = kmeansFitSampled(v, sampleMod)
    writeIvfIndex(cent, cells, path)
  }

  /** The shared Scratch-cached [[buildIvfIndex]] artifact every IVF
    * consumer (q_ann_ivf_sampled, q_cluster_balance, q_silhouette,
    * q_cluster_outlier) resolves — one build per (root, corpus,
    * layout); the declared-layout fingerprint rides the key, and so do
    * the ALGORITHM constants (k, iteration count, sample modulus, the
    * mean-arithmetic version tag): the schema alone cannot tell two
    * parameterizations apart, so a durable root would otherwise keep
    * serving the stale fit after a constant change (the same rule
    * applies to vec_pairs and both LSH index keys below). */
  private def ivfIdxArtifact(s: SparkSession, dir: String): String =
    graft.engine.Scratch.cached("ivf_idx",
      s"$dir outs=${graft.engine.Scratch.outsKey(ivfIndexOuts)} " +
        s"k=$ivfK iters=$ivfIters mod=$ivfSampleMod mean=fx9") { path =>
      buildIvfIndex(emb(s, dir).select("vec_id", "e", "nrm")
        .localCheckpoint(true), path, ivfSampleMod)
    }

  /** Build-once FULL-fit IVF index (the q_ann_ivf training): same
    * declared layout as the sampled index, its own Scratch root. The
    * deterministic Lloyd fit is definitional for q_ann_ivf — the
    * DuckDB oracle replays it bit-identically — but it is a pure
    * function of the corpus, so it builds once per (root, corpus,
    * layout) and the declared query PROBES (round-10: re-training the
    * `ivfIters`+1 Lloyd passes per invocation was the whole 2.6 s
    * bench cost; the probe itself is ~0.5 s, matching
    * q_ann_ivf_sampled). */
  private def ivfIdxFullArtifact(s: SparkSession, dir: String): String =
    graft.engine.Scratch.cached("ivf_idx_full",
      s"$dir outs=${graft.engine.Scratch.outsKey(ivfIndexOuts)} " +
        s"k=$ivfK iters=$ivfIters mean=fx9") { path =>
      val v = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
      val (cent, cells) = kmeansFit(v)
      writeIvfIndex(cent, cells, path)
    }

  /** DuckDB twin of the Lloyd fit + full assignment: recursive-CTE
    * Lloyd over fit source `fit` (aliased `v` inside each subquery so
    * the shared distance keys apply), seeded by `seedsSql`; the final
    * `cells` assignment always runs over the FULL corpus CTE `v`.
    * Emits CTE bodies `assign` (iterations, final = iter [[ivfIters]]),
    * `af`, `cent` (final codebook) and `cells` (full assignment). */
  private def duckKmeansFor(fit: String, seedsSql: String): String = {
    val initDk = duckDistKey("v.e", "s.e")
    val stepDk = duckDistKey("v.e", "c.ce")
    s"""assign(iter, vec_id, cid) AS (
       |  SELECT 0, vec_id, cid FROM (
       |    SELECT v.vec_id, s.vec_id AS cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ($initDk) ASC, s.vec_id ASC) AS rn
       |    FROM $fit v CROSS JOIN ($seedsSql) s)
       |  WHERE rn = 1
       |  UNION ALL
       |  SELECT prev_iter + 1, vec_id, cid FROM (
       |    SELECT c.iter AS prev_iter, v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ($stepDk) ASC, c.cid ASC) AS rn
       |    FROM $fit v CROSS JOIN (
       |      SELECT iter, cid, list(m ORDER BY d) AS ce FROM (
       |        SELECT a.iter, a.cid, t.d,
       |          CAST(SUM(CAST(floor(v2.e[t.d] * 1e9) AS HUGEINT)) AS DOUBLE)
       |            / COUNT(*) / 1e9 AS m
       |        FROM assign a JOIN $fit v2 ON v2.vec_id = a.vec_id
       |        CROSS JOIN range(1, 65) t(d)
       |        GROUP BY a.iter, a.cid, t.d)
       |      GROUP BY iter, cid) c)
       |  WHERE rn = 1 AND prev_iter < $ivfIters
       |),
       |af AS (SELECT vec_id, cid FROM assign WHERE iter = $ivfIters),
       |cent AS (
       |  SELECT cid, list(m ORDER BY d) AS ce FROM (
       |    SELECT a.cid, t.d,
       |      CAST(SUM(CAST(floor(v2.e[t.d] * 1e9) AS HUGEINT)) AS DOUBLE)
       |        / COUNT(*) / 1e9 AS m
       |    FROM af a JOIN $fit v2 ON v2.vec_id = a.vec_id
       |    CROSS JOIN range(1, 65) t(d)
       |    GROUP BY a.cid, t.d)
       |  GROUP BY cid),
       |cells AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ($stepDk) ASC, c.cid ASC) AS rn
       |    FROM v CROSS JOIN cent c)
       |  WHERE rn = 1)""".stripMargin
  }

  /** [[duckKmeansFor]] at the full-fit configuration (twin of
    * [[kmeansFit]]). */
  private def duckKmeans: String =
    duckKmeansFor("v", s"SELECT vec_id, e FROM v WHERE vec_id < $ivfK")

  /** Sample modulus for the deployed (sampled-fit) IVF index: 1/4 of
    * the corpus trains the codebook. */
  val ivfSampleMod = 4

  /** THE IVF probe, shared by the in-query-fit and persisted-index
    * variants: queries (vec_id 100–107) pick their 2 nearest cells of
    * the broadcast codebook, candidates come from the cell equi-join,
    * exact cosine re-rank, top-5. Works identically whether cent/cells
    * were just trained or read from a parquet artifact. */
  private[ext] def ivfProbe(v0: DataFrame, cent: DataFrame,
      cells: DataFrame): DataFrame = {
    // materialize the corpus prep once: v is referenced THREE times
    // (probe filter, candidate join-back, query side) — lazily each
    // reference replays the parquet scan + double-cast + norm (the
    // lshMultiRank/componentsOf lesson, previously paid ~3 corpus
    // scans per probe). Same bound as the LSH rankers' v0 contract:
    // the embedding working set, already checkpointed by every other
    // ANN path.
    val v = v0.localCheckpoint(true)
    val probes = explodeCentroids(
        v.filter(col("vec_id") >= 100 && col("vec_id") < 108), cent)
      .withColumn("dk", distKey(col("e"), col("ce")))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dk"), col("cid"))))
      .filter(col("crn") <= 2)
      .select(col("vec_id").as("query_id"), col("cid"))
    val q = v.select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val cand = cells.join(probes, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .join(v, "vec_id").join(q, "query_id")
      .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("cos"))
      .orderBy("query_id", "rnk")
  }

  /** DuckDB twin of [[ivfProbe]] (expects `v`, `cent`, `cells`). */
  private def duckIvfProbeTail: String =
    s"""probes AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT v.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY (${duckDistKey("v.e", "c.ce")}) ASC, c.cid ASC) AS crn
       |    FROM v CROSS JOIN cent c
       |    WHERE v.vec_id >= 100 AND v.vec_id < 108)
       |  WHERE crn <= 2),
       |cand AS (SELECT p.query_id, a.vec_id FROM cells a JOIN probes p USING (cid)
       |         WHERE a.vec_id <> p.query_id),
       |scored AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |  ${duckCos("qv.e", "qv.nrm", "nv.e", "nv.nrm")} AS cos
       |  FROM cand
       |  JOIN v qv ON qv.vec_id = cand.query_id
       |  JOIN v nv ON nv.vec_id = cand.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
       |    AS rnk FROM scored)
       |SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** Exact brute-force cosine top-k relation (query_id, neighbor_id,
    * rnk, cos) for queries `vec_id < maxQ` — one corpus scan, queries
    * broadcast. Shared by q_ann_bruteforce and the RRF fusion. */
  private def bruteRank(v: DataFrame, maxQ: Int, k: Int): DataFrame = {
    val q = v.filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val joined = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    joined.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("cos"))
  }

  /** Multi-table LSH top-k relation (query_id, neighbor_id, rnk, cos)
    * for queries `vec_id < maxQ`: capped sign-bucket equi-join
    * candidates, exact cosine re-rank. `v0` must be materialized by the
    * caller — it feeds the bucket explode AND both re-rank join-backs
    * (three lazy references — the componentsOf lesson, SCALE.md round
    * 3). Shared by q_ann_lsh_multi and the RRF fusion. */
  private def lshMultiRank(v0: DataFrame, maxQ: Int, k: Int): DataFrame = {
    val b = multiTableBuckets(v0)
    val bc = Dedup.capBuckets(b, Seq("bucket"), "vec_id", lshBucketCap)
    val qb = b.filter(col("vec_id") < maxQ)
      .select(col("vec_id").as("query_id"), col("bucket"))
    val pairs = bc.join(qb, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val scored = pairs
      .join(v0, "vec_id")
      .join(v0.select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn")), "query_id")
      .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("cos"))
  }

  /** Spark-side sign-bucket from the shipped planes. */
  private def bucketCol: Column = bucketColFor(planes, col("e"))

  /** Multi-table LSH configuration (RECALL.md): L independent tables of
    * r planes each. Recall 1-(1-p^r)^L is tuned by L at fixed per-query
    * cost fraction L/2^r of the corpus — measured recall@5 = 0.31 on
    * the (near-uniform, worst-case) synthetic embeddings at 1/8 corpus
    * cost, vs 0.0125 for the single-bucket 8-plane query. Plane i of
    * table t is global plane t*r+i of the same seed-42 sequence. */
  val lshTables = 8
  val lshPlanesPerTable = 6

  private def multiPlanes: Seq[Seq[Seq[Double]]] = {
    val all = planesFor(lshTables * lshPlanesPerTable)
    (0 until lshTables).map(t =>
      all.slice(t * lshPlanesPerTable, (t + 1) * lshPlanesPerTable))
  }

  /** (vec_id, bucket) membership for L sign tables of r planes each —
    * the shared candidate substrate for multi-table ANN probing AND
    * embedding near-dup candidate generation. Plane i of table t is
    * global plane t*r+i of the seed-42 sequence, so configurations
    * nest. */
  def multiTableBucketsParam(v: DataFrame, tables: Int,
      planesPerTable: Int): DataFrame = {
    val all = planesFor(tables * planesPerTable)
    val sigs = (0 until tables).map { t =>
      val ps = all.slice(t * planesPerTable, (t + 1) * planesPerTable)
      concat(lit(s"t$t|"), bucketColFor(ps, col("e")))
    }
    v.select(col("vec_id"), explode(array(sigs: _*)).as("bucket"))
  }

  /** Shipped-configuration membership ([[lshTables]] × [[lshPlanesPerTable]]). */
  private def multiTableBuckets(v: DataFrame): DataFrame =
    multiTableBucketsParam(v, lshTables, lshPlanesPerTable)

  /** Skew-capped within-bucket candidate pairs (id1 < id2) from the
    * multi-table sign buckets, deduplicated across tables.
    *
    * Scale contract: unlike a data-blocking key with bounded
    * cardinality (label, lang, length band — blocks grow with the
    * corpus, pair join goes quadratic), the bucket-space size L·2^r is
    * an OPERATING PARAMETER: hold per-bucket occupancy constant by
    * growing r with log2(corpus) (r ≈ log2(n) − log2(target occupancy))
    * and candidate volume stays linear in corpus size at fixed recall
    * per cosine band — LshScalingSpec pins exactly this rule. The
    * per-bucket cap is the skew backstop (a flood of identical vectors
    * lands in one bucket), bounding worst-case per-bucket work at
    * C(cap, 2) regardless of corpus. */
  def lshCandidatePairsParam(v: DataFrame, tables: Int, planesPerTable: Int,
      cap: Int = lshBucketCap): DataFrame = {
    val capped = Dedup.capBuckets(multiTableBucketsParam(v, tables, planesPerTable),
      Seq("bucket"), "vec_id", cap)
    capped.as("ca").join(capped.as("cb"),
        col("ca.bucket") === col("cb.bucket") &&
          col("ca.vec_id") < col("cb.vec_id"))
      .select(col("ca.vec_id").as("id1"), col("cb.vec_id").as("id2"))
      .distinct()
  }

  /** [[lshCandidatePairsParam]] at the shipped configuration. */
  def lshCandidatePairs(v: DataFrame, cap: Int = lshBucketCap): DataFrame =
    lshCandidatePairsParam(v, lshTables, lshPlanesPerTable, cap)

  /** Build the PERSISTED multi-table LSH index at `path` — the ANN
    * sibling of [[graft.ext.Dedup.buildBandIndex]]:
    *   - `buckets/` (bucket, vec_id): skew-capped sign-bucket
    *     membership across all L tables, laid out by bucket;
    *   - `vectors/` (vec_id, e, nrm): the re-rank join-back side.
    * Probes hash only their own query vectors and equi-join the
    * artifact; the corpus is never re-bucketed per query batch. */
  /** Declared LSH-index layout — same contract as [[ivfIndexOuts]]:
    * keyed into the Scratch cache, enforced at build time. */
  val lshIndexOuts: Seq[(String, org.apache.spark.sql.types.StructType)] = Seq(
    "buckets" -> org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, bucket STRING"),
    "vectors" -> org.apache.spark.sql.types.StructType.fromDDL(
      "vec_id BIGINT, e ARRAY<DOUBLE>, nrm DOUBLE"))

  def buildLshIndex(v: DataFrame, path: String): Unit = {
    val declared = lshIndexOuts.toMap
    graft.engine.Scratch.writeDeclared(
      Dedup.capBuckets(multiTableBuckets(v), Seq("bucket"), "vec_id", lshBucketCap)
        .repartition(col("bucket")),
      declared("buckets"), s"$path/buckets")
    graft.engine.Scratch.writeDeclared(
      v.select("vec_id", "e", "nrm").repartition(col("vec_id")),
      declared("vectors"), s"$path/vectors")
  }

  /** Multi-table LSH ANN probing a PREBUILT [[buildLshIndex]] artifact:
    * query-side buckets computed fresh (queries are the daily-varying
    * side), corpus-side membership + re-rank vectors read from the
    * index. Identical relation to the in-query variant — the artifact
    * is deterministic. */
  def annTopKAgainst(queries: DataFrame, indexPath: String, k: Int): DataFrame = {
    val s = queries.sparkSession
    val bc = s.read.parquet(s"$indexPath/buckets")
    val corpus = s.read.parquet(s"$indexPath/vectors")
    val qb = multiTableBuckets(queries)
      .withColumnRenamed("vec_id", "query_id")
    val pairs = bc.join(qb, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val scored = pairs
      .join(corpus, "vec_id")
      .join(queries.select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("nrm").as("qn")), "query_id")
      .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("cos"))
      .orderBy("query_id", "rnk")
  }

  /** Scratch-cached [[cosineVerifiedPairs]] artifact (threshold 0.4)
    * over the whole embedding corpus of `dir` — the embedding twin of
    * `Dedup.fullBandIndex`: the LSH bucket explode + O(collisions)
    * verify joins are paid once per corpus version, every consumer
    * (pair report, cluster resolve) probes the persisted relation.
    * The pair relation is deterministic in the corpus (seed-pinned
    * planes, IEEE-exact cosine), so riding the artifact leaves every
    * oracle hash unchanged. */
  private val vecPairsOut = org.apache.spark.sql.types.StructType.fromDDL(
    "id1 BIGINT, id2 BIGINT, cos DOUBLE")

  def fullVectorPairs(s: SparkSession, dir: String): String =
    graft.engine.Scratch.cached("vec_pairs",
      s"$dir schema=${graft.engine.Scratch.schemaKey(vecPairsOut)} " +
        s"thr=$embedDupCos lsh=${lshTables}x$lshPlanesPerTable " +
        s"cap=$lshBucketCap seed=42") { path =>
      val v = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
      graft.engine.Scratch.writeDeclared(
        cosineVerifiedPairs(v, embedDupCos).select("id1", "id2", "cos"),
        vecPairsOut, path)
    }

  /** Cosine-verified near-dup pairs (id1, id2, cos ≥ threshold) over
    * the sign-bucket candidates — ONE definition behind the
    * [[fullVectorPairs]] artifact both q_dedup_embed (pairs) and
    * q_dedup_embed_resolve (clusters) probe, so the verify stage can
    * never drift between them. Expects `v` already materialized
    * (three lazy references). */
  private def cosineVerifiedPairs(v: DataFrame, threshold: Double): DataFrame =
    lshCandidatePairs(v)
      .join(v.select(col("vec_id").as("id1"),
        col("e").as("e1"), col("nrm").as("n1")), "id1")
      .join(v.select(col("vec_id").as("id2"),
        col("e").as("e2"), col("nrm").as("n2")), "id2")
      .withColumn("cos", cosine(col("e1"), col("n1"), col("e2"), col("n2")))
      .filter(col("cos") >= threshold)

  /** DuckDB sign-bucket for an arbitrary plane set. */
  private def duckBucketFor(ps: Seq[Seq[Double]]): String =
    ps.map { p =>
      val lit = p.mkString("[", ", ", "]")
      s"(CASE WHEN ${duckDot("e", lit)} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  private def duckBucket: String = duckBucketFor(planes)

  /** DuckDB list of all multi-table sign signatures for one vector. */
  private def duckSigList: String =
    multiPlanes.zipWithIndex.map { case (ps, t) =>
      s"'t$t|' || ${duckBucketFor(ps)}"
    }.mkString(", ")

  /** DuckDB twin of [[cosineVerifiedPairs]] as a CTE body (expects
    * `v` and `cand` in scope; emits `vp(id1, id2, cos)` unfiltered —
    * consumers apply their threshold). */
  private def duckCosineVerified: String =
    s"""vp AS (SELECT id1, id2,
       |  ${duckCos("a.e", "a.nrm", "b.e", "b.nrm")} AS cos
       |  FROM cand JOIN v a ON a.vec_id = cand.id1
       |            JOIN v b ON b.vec_id = cand.id2)""".stripMargin

  /** DuckDB twin of [[lshCandidatePairs]] as CTE bodies (expects a CTE
    * `v(vec_id, e, nrm, …)` in scope; emits `cand(id1, id2)`). */
  private def duckLshCandidatePairs: String =
    s"""b AS (SELECT vec_id, unnest([$duckSigList]) AS bucket FROM v),
       |bc AS (SELECT vec_id, bucket FROM (
       |  SELECT vec_id, bucket,
       |    row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
       |  FROM b) WHERE rn <= $lshBucketCap),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM bc a JOIN bc b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── embedding-cosine near-dup: LSH sign-bucket candidates + exact ──
    // cosine verification. Candidate pairs come from the SAME capped
    // multi-table sign buckets as q_ann_lsh_multi (collision-driven, so
    // volume tracks near-dup density, never corpus²) — the round-2
    // same-label blocking key had bounded cardinality, so its blocks
    // grew linearly with the corpus and the within-block pair join went
    // quadratic at scale. Approximate by design: a pair no table
    // collides is missed (collision prob rises steeply with cosine —
    // RECALL.md quantifies the table/plane trade-off).
    Q("q_dedup_embed",
      (s, dir) => {
        // probe the persisted pair artifact (built once per corpus —
        // the first call pays the bucket explode + verify joins)
        s.read.parquet(fullVectorPairs(s, dir))
          .orderBy("id1", "id2")
      },
      Some(
        s"""WITH v AS ($duckEmb),
           |$duckLshCandidatePairs,
           |$duckCosineVerified
           |SELECT id1, id2, cos FROM vp WHERE cos >= $embedDupCos
           |ORDER BY id1, id2""".stripMargin)),

    // ── embedding dedup end-to-end: candidates → cosine verify → ──
    // connected components → keep decision. The embedding twin of
    // q_dedup_resolve: same componentsOf fixpoint, same recursive-CTE
    // oracle closure, so the hash check covers the whole chain from
    // sign buckets to the per-cluster keep bit.
    Q("q_dedup_embed_resolve",
      (s, dir) => {
        val comp = Dedup.componentsOf(
          s.read.parquet(fullVectorPairs(s, dir)).select("id1", "id2"))
        emb(s, dir).select(col("vec_id"))
          .join(comp.withColumnRenamed("n", "vec_id"), Seq("vec_id"), "left")
          .withColumn("keep_id", coalesce(col("lbl"), col("vec_id")))
          .withColumn("is_kept", col("keep_id") === col("vec_id"))
          .select("vec_id", "keep_id", "is_kept")
          .orderBy("vec_id")
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |$duckLshCandidatePairs,
           |$duckCosineVerified,
           |vpt AS (SELECT id1, id2 FROM vp WHERE cos >= $embedDupCos),
           |${Dedup.duckClosure("vpt")}
           |SELECT d.vec_id,
           |  coalesce(c.lbl, d.vec_id) AS keep_id,
           |  coalesce(c.lbl, d.vec_id) = d.vec_id AS is_kept
           |FROM v d LEFT JOIN comp c ON c.n = d.vec_id
           |ORDER BY vec_id""".stripMargin)),

    // ── brute-force cosine top-k (the exact baseline) ──
    Q("q_ann_bruteforce",
      (s, dir) =>
        bruteRank(emb(s, dir).select("vec_id", "e", "nrm"), 8, 10)
          .orderBy("query_id", "rnk"),
      Some(
        s"""WITH v AS ($duckEmb),
           |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 8),
           |p AS (SELECT q.query_id, v.vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM v JOIN q ON v.vec_id <> q.query_id),
           |r AS (SELECT query_id, neighbor_id, cos,
           |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           |    AS rnk FROM p)
           |SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin)),

    // ── matryoshka two-stage ANN: truncated-prefix prefilter, exact ──
    // re-rank (the MRL retrieval pattern — Kusupati et al. 2022).
    // Stage 1 scores the corpus on the FIRST 16 of 64 dims (4× less
    // bandwidth/compute on the side that scales with corpus size) and
    // keeps 50 candidates per query; stage 2 re-ranks only those with
    // the full-dim exact cosine. At 100 TB the truncated columns are
    // the only thing the corpus scan reads (a real deployment stores
    // the prefix as its own column chunk), and stage-2 cost is
    // queries × 50 regardless of corpus size. Works on raw slices
    // here; MRL-trained embeddings concentrate more signal in the
    // prefix and prune harder at the same k.
    Q("q_ann_mrl",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e", "nrm")
          .withColumn("et", expr("slice(e, 1, 16)"))
          .withColumn("nt", sqrt(vec_norm2(col("et"))))
        val q = v.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qn"), col("et").as("qet"), col("nt").as("qnt"))
        val stage1 = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("tcos",
            vec_dot(col("qet"), col("et")) / (col("qnt") * col("nt")))
        val w1 = Window.partitionBy(col("query_id"))
          .orderBy(col("tcos").desc, col("vec_id"))
        val cand = stage1.withColumn("crk", row_number().over(w1))
          .filter(col("crk") <= 50)
        val w2 = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        cand.withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
          .withColumn("rnk", row_number().over(w2).cast(LongType))
          .filter(col("rnk") <= 10)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("rnk"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      Some(
        s"""WITH v AS ($duckEmb),
           |t AS (SELECT vec_id, e, nrm, e[1:16] AS et,
           |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           |    list_transform(e[1:16], x -> x * x)), (acc, x) -> acc + x)) AS nt
           |  FROM v),
           |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, et AS qet,
           |  nt AS qnt FROM t WHERE vec_id < 8),
           |s1 AS (SELECT q.query_id, t.vec_id, t.e, t.nrm, q.qe, q.qn,
           |  ${duckCos("qet", "qnt", "et", "nt")} AS tcos
           |  FROM t JOIN q ON t.vec_id <> q.query_id),
           |c AS (SELECT *, row_number() OVER (PARTITION BY query_id
           |  ORDER BY tcos DESC, vec_id) AS crk FROM s1),
           |r0 AS (SELECT query_id, vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM c WHERE crk <= 50),
           |r AS (SELECT query_id, neighbor_id, cos,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos DESC, neighbor_id) AS rnk FROM r0)
           |SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin)),

    // ── int8-quantized cosine ANN: per-vector symmetric scalar ──
    // quantization (q = round(x·127/max|x|), the faiss SQ8 scheme) cut
    // to exact integer arithmetic — at 100 TB this is the 4× memory /
    // bandwidth lever that lets a corpus-scan rank run from RAM: the
    // scan side carries i8-range ints instead of f32, the dot product
    // is an exact i64 fold (no float-order nondeterminism at ANY
    // parallelism), and only the final normalize touches doubles.
    // Same broadcast-queries/one-corpus-scan shape as the brute-force
    // baseline; QuantizedAnnSpec pins recall@10 against it.
    Q("q_ann_quantized",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e")
          .withColumn("mx", expr("array_max(transform(e, x -> abs(x)))"))
          // a zero vector has no direction — cosine is undefined, and
          // x / mx would be NaN whose BIGINT cast THROWS under Spark
          // 4's ANSI default (zero-filled missing embeddings are
          // common in real corpora; the oracle filter mirrors this)
          .filter(col("mx") > 0.0)
          .withColumn("qi", expr(
            "transform(e, x -> CAST(floor(x / mx * 127.0 + 0.5) AS BIGINT))"))
          .withColumn("qn", expr(
            "sqrt(CAST(aggregate(transform(qi, x -> x * x), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x) AS DOUBLE))"))
          .select("vec_id", "qi", "qn")
        val q = v.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("qi").as("qa"),
            col("qn").as("qan"))
        val joined = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("qdot", expr(
            "aggregate(zip_with(qa, qi, (x, y) -> x * y), " +
              "CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
          .withColumn("qcos",
            col("qdot").cast("double") / (col("qan") * col("qn")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("qcos").desc, col("vec_id"))
        joined.withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 10)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("rnk"), col("qcos"))
          .orderBy("query_id", "rnk")
      },
      Some(
        s"""WITH v0 AS ($duckEmb),
           |m AS (SELECT vec_id, e,
           |  list_max(list_transform(e, x -> abs(x))) AS mx FROM v0),
           |vq AS (SELECT vec_id,
           |  list_transform(e, x -> CAST(floor(x / mx * 127.0 + 0.5) AS BIGINT))
           |    AS qi FROM m WHERE mx > 0.0),
           |n AS (SELECT vec_id, qi,
           |  sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(qi, x -> x * x)), (acc, x) -> acc + x) AS DOUBLE))
           |    AS qn FROM vq),
           |q AS (SELECT vec_id AS query_id, qi AS qa, qn AS qan FROM n
           |      WHERE vec_id < 8),
           |p AS (SELECT q.query_id, n.vec_id AS neighbor_id,
           |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(1, len(qa) + 1), i -> qa[i] * qi[i])),
           |    (acc, x) -> acc + x) AS DOUBLE) / (qan * qn) AS qcos
           |  FROM n JOIN q ON n.vec_id <> q.query_id),
           |r AS (SELECT query_id, neighbor_id, qcos,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY qcos DESC, neighbor_id) AS BIGINT) AS rnk FROM p)
           |SELECT query_id, neighbor_id, rnk, qcos FROM r WHERE rnk <= 10
           |ORDER BY query_id, rnk""".stripMargin)),

    // ── IVF ANN: TRAINED k-means codebook, coarse-quantize to cells, ──
    // probe nprobe nearest cells, exact re-rank. The codebook is a
    // deterministic seeded Lloyd fit (see kmeansFit) reproduced
    // bit-identically by the DuckDB oracle's recursive CTE, so the
    // whole pipeline — training included — is hash-checked. Scale
    // shape: fit on a sample, broadcast the codebook for assignment
    // (corpus scanned once), candidate gen via cell equi-join, queries
    // touch only their probed cells' partitions.
    Q("q_ann_ivf",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e", "nrm")
        val idx = ivfIdxFullArtifact(s, dir)
        ivfProbe(v, s.read.parquet(s"$idx/cent"),
          s.read.parquet(s"$idx/cells"))
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |$duckKmeans,
           |$duckIvfProbeTail""".stripMargin)),

    // ── IVF ANN from the PERSISTED, sample-trained index: the shape a ──
    // deployment runs. The codebook is trained on a deterministic 1/4
    // md5-hash sample (training cost decoupled from corpus size), the
    // full-corpus cell assignment + codebook are Scratch artifacts
    // (built once per (JVM, corpus) — the local stand-in for the
    // durable index a pipeline writes per corpus version), and the
    // query itself only probes. The DuckDB oracle reproduces the
    // sampled Lloyd bit-identically, so training-on-a-sample is inside
    // the hash check, not a trust-me; IvfSampledSpec pins recall parity
    // with the full fit and that the probe plan reads only the index +
    // embeddings.
    Q("q_ann_ivf_sampled",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e", "nrm")
        val idx = ivfIdxArtifact(s, dir)
        ivfProbe(v, s.read.parquet(s"$idx/cent"),
          s.read.parquet(s"$idx/cells"))
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |vs AS (SELECT vec_id, e FROM v
           |  WHERE ${graft.functions.HashSample.duck("vec_id", ivfSampleMod)}),
           |${duckKmeansFor("vs",
               s"SELECT vec_id, e FROM vs ORDER BY vec_id LIMIT $ivfK")},
           |$duckIvfProbeTail""".stripMargin)),

    // ── LSH-bucketed ANN (the scale path: equi-join on sign bucket) ──
    Q("q_ann_lsh",
      (s, dir) => {
        val v = emb(s, dir).withColumn("bucket", bucketCol)
          .select("vec_id", "e", "nrm", "bucket")
        val q = v.filter(col("vec_id") < 64)
          .select(col("vec_id").as("query_id"), col("e").as("qe"),
            col("nrm").as("qn"), col("bucket"))
        val vc = Dedup.capBuckets(v, Seq("bucket"), "vec_id", lshBucketCap)
        val cand = vc.join(q, Seq("bucket")).filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        cand.withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 5)
          .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"), col("cos"))
          .orderBy("query_id", "rnk")
      },
      Some(
        s"""WITH v0 AS ($duckEmb),
           |v AS (SELECT vec_id, e, nrm, $duckBucket AS bucket FROM v0),
           |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, bucket
           |      FROM v WHERE vec_id < 64),
           |vc AS (SELECT vec_id, e, nrm, bucket FROM (
           |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
           |  FROM v) WHERE rn <= $lshBucketCap),
           |p AS (SELECT q.query_id, vc.vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM vc JOIN q USING (bucket) WHERE vc.vec_id <> q.query_id),
           |r AS (SELECT query_id, neighbor_id, cos,
           |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           |    AS rnk FROM p)
           |SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin)),

    // ── multi-table LSH ANN: L tables of r planes, union of buckets ──
    // The production recall knob: each table is an independent chance
    // to collide with a true neighbor (recall 1-(1-p^r)^L at cost
    // L/2^r of the corpus per query — corpus-size-independent
    // fraction). Candidate pairs distinct across tables, then exact
    // re-rank; corpus-side buckets skew-capped like q_ann_lsh.
    Q("q_ann_lsh_multi",
      (s, dir) => {
        val v0 = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
        lshMultiRank(v0, 64, 5).orderBy("query_id", "rnk")
      },
      Some(duckLshMultiTopK)),

    // ── multi-table LSH ANN from the PERSISTED index: the deployed ──
    // probe shape. Corpus bucket membership + re-rank vectors are
    // Scratch artifacts ([[buildLshIndex]], built once per
    // (JVM, corpus)); the query hashes only its own query vectors and
    // equi-joins the index — completing the artifact trio (band index,
    // IVF index, LSH index). Identical relation to q_ann_lsh_multi,
    // shared oracle; LshIndexSpec pins index-only corpus-side scans.
    Q("q_ann_lsh_idx",
      (s, dir) => {
        val idx = graft.engine.Scratch.cached("lsh_idx",
          s"$dir outs=${graft.engine.Scratch.outsKey(lshIndexOuts)} " +
            s"lsh=${lshTables}x$lshPlanesPerTable cap=$lshBucketCap " +
            "seed=42") { path =>
          buildLshIndex(
            emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true),
            path)
        }
        annTopKAgainst(
          emb(s, dir).select("vec_id", "e", "nrm").filter(col("vec_id") < 64),
          idx, 5)
      },
      Some(duckLshMultiTopK)),

    // ── incremental embedding dedup: the daily probe for vectors — ──
    // completes the {exact, near-text, embedding} × {full-corpus,
    // incremental} matrix. The increment (vec_id % 10 = 7 as the
    // deterministic stand-in for "today's batch") hashes ONLY its own
    // vectors into sign buckets and equi-joins the corpus-side
    // PREBUILT index ([[buildLshIndex]] over the corpus partition, a
    // Scratch artifact); candidates are cosine-verified at the
    // q_dedup_embed threshold. Candidate volume tracks increment ×
    // bucket density, never increment × corpus — and the corpus is
    // never re-bucketed per batch.
    Q("q_dedup_embed_incremental",
      (s, dir) => {
        val all = emb(s, dir).select("vec_id", "e", "nrm")
        val idx = graft.engine.Scratch.cached("lsh_idx_corpus",
          s"$dir outs=${graft.engine.Scratch.outsKey(lshIndexOuts)} " +
            s"lsh=${lshTables}x$lshPlanesPerTable cap=$lshBucketCap " +
            "seed=42") { path =>
          buildLshIndex(
            all.filter(col("vec_id") % 10 =!= 7).localCheckpoint(true), path)
        }
        val inc = all.filter(col("vec_id") % 10 === 7)
        val bc = s.read.parquet(s"$idx/buckets")
        val corpus = s.read.parquet(s"$idx/vectors")
        val ib = multiTableBuckets(inc).withColumnRenamed("vec_id", "inc_id")
        bc.join(ib, Seq("bucket"))
          .select(col("inc_id"), col("vec_id").as("dup_of")).distinct()
          .join(corpus.select(col("vec_id").as("dup_of"), col("e").as("ce"),
            col("nrm").as("cn")), "dup_of")
          .join(inc.select(col("vec_id").as("inc_id"), col("e").as("qe"),
            col("nrm").as("qn")), "inc_id")
          .withColumn("cos", cosine(col("qe"), col("qn"), col("ce"), col("cn")))
          .filter(col("cos") >= embedDupCos)
          .select(col("inc_id").as("vec_id"), col("dup_of"), col("cos"))
          .orderBy("vec_id", "dup_of")
      },
      Some(
        s"""WITH v AS ($duckEmb),
           |b AS (SELECT vec_id, unnest([$duckSigList]) AS bucket FROM v
           |      WHERE vec_id % 10 <> 7),
           |bc AS (SELECT vec_id, bucket FROM (
           |  SELECT vec_id, bucket,
           |    row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
           |  FROM b) WHERE rn <= $lshBucketCap),
           |ib AS (SELECT vec_id AS inc_id, unnest([$duckSigList]) AS bucket
           |       FROM v WHERE vec_id % 10 = 7),
           |pairs AS (SELECT DISTINCT inc_id, bc.vec_id AS dup_of
           |  FROM bc JOIN ib USING (bucket)),
           |scored AS (SELECT p.inc_id AS vec_id, p.dup_of,
           |  ${duckCos("qv.e", "qv.nrm", "nv.e", "nv.nrm")} AS cos
           |  FROM pairs p
           |  JOIN v qv ON qv.vec_id = p.inc_id
           |  JOIN v nv ON nv.vec_id = p.dup_of)
           |SELECT vec_id, dup_of, cos FROM scored WHERE cos >= $embedDupCos
           |ORDER BY vec_id, dup_of""".stripMargin)),

    // ── cluster-balanced curation (SemDeDup / DoReMi-style mixing) ──
    // Semantic clusters as sampling strata: assign every vector to its
    // IVF cell (the SAME persisted sampled-fit index q_ann_ivf_sampled
    // probes — built once per (JVM, corpus), zero training in-query),
    // then cap each cell at 20 by the md5 hash order (the q_sample_hash
    // reproducibility idiom). Over-represented semantic neighborhoods
    // are clipped, sparse ones survive whole — the cluster-balancing
    // step of a curation pipeline, riding the vector index it already
    // maintains. Per-cell counts ship alongside so the mixing decision
    // is auditable. One keyed shuffle over the cells relation; the
    // WindowGroupLimit shape caps partial per shuffle side.
    Q("q_cluster_balance",
      (s, dir) => {
        val idx = ivfIdxArtifact(s, dir)
        val cells = s.read.parquet(s"$idx/cells")
        val stats = cells.groupBy(col("cid")).agg(count(lit(1)).as("n_cell"))
        val w = Window.partitionBy(col("cid"))
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        cells
          .withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= 20)
          .join(stats, "cid")
          .select(col("cid"), col("n_cell"), col("rk"), col("vec_id"))
          .orderBy("cid", "rk")
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |vs AS (SELECT vec_id, e FROM v
           |  WHERE ${graft.functions.HashSample.duck("vec_id", ivfSampleMod)}),
           |${duckKmeansFor("vs",
               s"SELECT vec_id, e FROM vs ORDER BY vec_id LIMIT $ivfK")},
           |stats AS (SELECT cid, count(*) AS n_cell FROM cells GROUP BY cid),
           |r AS (SELECT cid, vec_id,
           |  CAST(row_number() OVER (PARTITION BY cid
           |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS BIGINT) AS rk
           |  FROM cells)
           |SELECT r.cid, s.n_cell, r.rk, r.vec_id
           |FROM r JOIN stats s USING (cid)
           |WHERE rk <= 20 ORDER BY cid, rk""".stripMargin)),

    // ── reciprocal-rank fusion: ensemble of retrievers (hybrid search) ──
    // The standard way to combine rankings that score on incomparable
    // scales: fused(d) = Σ_lists 1/(60 + rank_list(d)). Here the exact
    // brute-force top-10 fuses with the multi-table LSH top-5 (both
    // relations shared verbatim with their standalone queries) — a
    // retriever ensemble where the cheap approximate list can promote
    // what the other ranks low, the shape hybrid dense+lexical search
    // uses. The RRF contribution is FIXED-POINT (10⁹ div (60+rnk),
    // exact BIGINT) so the fused scores hash-match; ranks, not scores,
    // enter the formula, so no float comparability assumptions at all.
    // Cost: the two retrievals (corpus scan + bucket equi-join) plus
    // one (query, neighbor)-keyed aggregate over ≤15 rows per query.
    Q("q_rank_fusion",
      (s, dir) => {
        val v0 = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
        val dense = bruteRank(v0, 8, 10)
          .select(col("query_id"), col("neighbor_id"), col("rnk"))
        val sparse = lshMultiRank(v0, 64, 5).filter(col("query_id") < 8)
          .select(col("query_id"), col("neighbor_id"), col("rnk"))
        val fused = dense.unionByName(sparse)
          .withColumn("c", expr("1000000000L div (60 + rnk)"))
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg(sum(col("c")).as("rrf_fp"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_fp").desc, col("neighbor_id"))
        fused.withColumn("fused_rank", row_number().over(w).cast(LongType))
          .filter(col("fused_rank") <= 5)
          .select(col("query_id"), col("fused_rank"), col("neighbor_id"), col("rrf_fp"))
          .orderBy("query_id", "fused_rank")
      },
      Some(
        s"""WITH $duckLshMultiCtes,
           |bq AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v
           |       WHERE vec_id < 8),
           |bp AS (SELECT q.query_id, v2.vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM v v2 JOIN bq q ON v2.vec_id <> q.query_id),
           |br AS (SELECT query_id, neighbor_id,
           |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           |    AS rnk FROM bp),
           |un AS (SELECT query_id, neighbor_id, rnk FROM br WHERE rnk <= 10
           |  UNION ALL
           |  SELECT query_id, neighbor_id, rnk FROM r
           |  WHERE rnk <= 5 AND query_id < 8),
           |f AS (SELECT query_id, neighbor_id,
           |  CAST(SUM(1000000000 // (60 + rnk)) AS BIGINT) AS rrf_fp
           |  FROM un GROUP BY query_id, neighbor_id),
           |fr AS (SELECT query_id, neighbor_id, rrf_fp,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY rrf_fp DESC, neighbor_id) AS BIGINT) AS fused_rank
           |  FROM f)
           |SELECT query_id, fused_rank, neighbor_id, rrf_fp FROM fr
           |WHERE fused_rank <= 5 ORDER BY query_id, fused_rank""".stripMargin)),

    // ── k-NN classification (leave-one-out, k = 5) ──
    // The label-propagation use of the ANN substrate: predict each
    // probe vector's label by majority vote among its 5 nearest
    // corpus neighbors (exact cosine, LOO — the probe itself
    // excluded). Probe set = vec_id % 10 = 0 (the q_setsim_join
    // probe-vs-corpus shape: at 100 TB the probe batch is the daily
    // increment and the corpus side flows through the LSH/IVF bucket
    // routes above — brute force here IS the oracle-grade baseline
    // those routes are recall-measured against). Vote ties break on
    // the smaller label; neighbor ranking ties on (cos DESC, vec_id)
    // — deterministic both sides. Output is per-probe (true, pred,
    // hit) — the confusion/accuracy heads aggregate it downstream.
    Q("q_knn_classify",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "label", "e", "nrm")
        val q = v.filter(col("vec_id") % 10 === 0)
          .select(col("vec_id").as("query_id"), col("label").as("true_label"),
            col("e").as("qe"), col("nrm").as("qn"))
        val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos", cosine(col("qe"), col("qn"), col("e"), col("nrm")))
        val wRank = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id"))
        val votes = scored
          .withColumn("rnk", row_number().over(wRank))
          .filter(col("rnk") <= 5)
          .groupBy(col("query_id"), col("true_label"), col("label"))
          .agg(count(lit(1)).as("nvotes"))
        val wVote = Window.partitionBy("query_id")
          .orderBy(col("nvotes").desc, col("label"))
        votes
          .withColumn("vr", row_number().over(wVote))
          .filter(col("vr") === 1)
          .select(col("query_id"), col("true_label"),
            col("label").cast("long").as("pred_label"),
            (col("label") === col("true_label")).cast("long").as("hit"))
          .withColumn("true_label", col("true_label").cast("long"))
          .orderBy("query_id")
      },
      Some(
        s"""WITH v AS ($duckEmb),
           |q AS (SELECT vec_id AS query_id, label AS true_label,
           |  e AS qe, nrm AS qn FROM v WHERE vec_id % 10 = 0),
           |p AS (SELECT q.query_id, q.true_label, v.label, v.vec_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM v JOIN q ON v.vec_id <> q.query_id),
           |r AS (SELECT query_id, true_label, label,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos DESC, vec_id) AS rnk FROM p),
           |vt AS (SELECT query_id, true_label, label,
           |  CAST(count(*) AS BIGINT) AS nvotes
           |  FROM r WHERE rnk <= 5 GROUP BY query_id, true_label, label),
           |w AS (SELECT query_id, true_label, label, nvotes,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY nvotes DESC, label) AS vr FROM vt)
           |SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
           |  CAST(label AS BIGINT) AS pred_label,
           |  CAST(label = true_label AS BIGINT) AS hit
           |FROM w WHERE vr = 1 ORDER BY query_id""".stripMargin)),

    // ── simplified silhouette of the IVF clustering (per-cell) ──
    // Clustering-quality evaluation of the SAME persisted sampled-fit
    // index q_ann_ivf_sampled probes: per vector, a = distance to its
    // own centroid, b = distance to the nearest OTHER centroid,
    // s = (b − a)/max(a, b) — the centroid-based (simplified)
    // silhouette, which needs one corpus × K broadcast pass instead of
    // the classic formula's all-pairs distances (quadratic; never at
    // 100 TB). Distances are IEEE-exact sqrt over the shared
    // sequential-fold dots; each s quantizes to NANO fixed point with
    // an EXPLICIT floor(s·10⁹) — not a DECIMAL cast: double→DECIMAL
    // rounds HALF_UP off the exact binary expansion in Spark but
    // half-even off the shortest decimal in DuckDB, and a sqrt output
    // landing on a decimal tie diverges by one ulp of the quantum
    // (caught live on q_cluster_outlier: a = 0.98085612023250002).
    // floor of the identical IEEE product is engine-exact; integer
    // sums are order-free. The oracle retrains the sampled Lloyd
    // bit-identically — the evaluation is inside the hash check end
    // to end.
    Q("q_silhouette",
      (s, dir) => {
        // SAME Scratch name as q_ann_ivf_sampled — one shared artifact,
        // whichever query runs first builds it (identical builder)
        val v = emb(s, dir).select("vec_id", "e", "nrm")
        val idx = ivfIdxArtifact(s, dir)
        val cent = s.read.parquet(s"$idx/cent")
        val cells = s.read.parquet(s"$idx/cells")
          .select(col("vec_id"), col("cid").as("own"))
        val dist = sqrt(greatest(lit(0.0),
          vec_dot(col("e"), col("e")) - lit(2.0) * vec_dot(col("e"), col("ce"))
            + vec_dot(col("ce"), col("ce"))))
        val ab = v.join(cells, "vec_id")
          .crossJoin(broadcast(cent))
          .withColumn("dist", dist)
          .groupBy(col("vec_id"), col("own"))
          .agg(min(when(col("cid") === col("own"), col("dist"))).as("a"),
            min(when(col("cid") =!= col("own"), col("dist"))).as("b"))
        ab.withColumn("sn",
            floor(when(greatest(col("a"), col("b")) > 0.0,
              (col("b") - col("a")) / greatest(col("a"), col("b")))
              .otherwise(0.0) * 1e9).cast("long"))
          .groupBy(col("own").as("cid"))
          .agg(count(lit(1)).as("n_vecs"),
            (sum(col("sn")).cast("double") / lit(1e9) /
              count(lit(1)).cast("double")).as("mean_sil"))
          .orderBy("cid")
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |vs AS (SELECT vec_id, e FROM v
           |  WHERE ${graft.functions.HashSample.duck("vec_id", ivfSampleMod)}),
           |${duckKmeansFor("vs",
               s"SELECT vec_id, e FROM vs ORDER BY vec_id LIMIT $ivfK")},
           |d AS (SELECT cl.vec_id, cl.cid AS own, c.cid,
           |    sqrt(greatest(0.0, ${duckDot("v.e", "v.e")}
           |      - 2.0 * ${duckDot("v.e", "c.ce")}
           |      + ${duckDot("c.ce", "c.ce")})) AS dist
           |  FROM cells cl JOIN v ON v.vec_id = cl.vec_id
           |  CROSS JOIN cent c),
           |ab AS (SELECT vec_id, own,
           |    MIN(CASE WHEN cid = own THEN dist END) AS a,
           |    MIN(CASE WHEN cid <> own THEN dist END) AS b
           |  FROM d GROUP BY vec_id, own),
           |sq AS (SELECT own AS cid,
           |    CAST(floor((CASE WHEN greatest(a, b) > 0.0
           |         THEN (b - a) / greatest(a, b) ELSE 0.0 END) * 1e9)
           |      AS BIGINT) AS sn
           |  FROM ab)
           |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
           |  CAST(SUM(sn) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE)
           |    AS mean_sil
           |FROM sq GROUP BY cid ORDER BY cid""".stripMargin)),

    // ── centroid z-score anomaly detection (per IVF cell) ──
    // Embedding-space outlier gate: a vector is anomalous when its
    // distance to its OWN centroid exceeds the cell's mean + 2σ — the
    // distribution-relative threshold a curation pipeline uses to
    // quarantine junk embeddings (corrupt rows, wrong-modality
    // vectors) before they poison ANN recall. Linear: one corpus pass
    // against the broadcast codebook for a, one 16-row stats table,
    // one join-back to count exceedances (the q_boxplot two-pass
    // shape). Exactness: a and a² quantize to NANO fixed point with
    // an explicit floor (see q_silhouette's comment — a DECIMAL cast
    // diverges on decimal ties, caught live on THIS query) so cell
    // sums are order-free int64; mean/σ/threshold then compute from
    // exactly-agreed inputs in one identical IEEE expression tree
    // (sqrt correctly rounded). Same persisted index as
    // q_ann_ivf_sampled/q_silhouette — build once, audit free.
    Q("q_cluster_outlier",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e", "nrm")
        val idx = ivfIdxArtifact(s, dir)
        val cent = s.read.parquet(s"$idx/cent")
        val cells = s.read.parquet(s"$idx/cells")
          .select(col("vec_id"), col("cid"))
        val aCol = sqrt(greatest(lit(0.0),
          vec_dot(col("e"), col("e")) - lit(2.0) * vec_dot(col("e"), col("ce"))
            + vec_dot(col("ce"), col("ce"))))
        val pts = v.join(cells, "vec_id")
          .join(broadcast(cent), "cid")
          .withColumn("a", aCol)
          .withColumn("an", floor(col("a") * 1e9).cast("long"))
          .withColumn("a2n", floor(col("a") * col("a") * 1e9).cast("long"))
          .select("cid", "vec_id", "a", "an", "a2n")
        val stats = pts.groupBy("cid")
          .agg(count(lit(1)).as("n"),
            (sum(col("an")).cast("double") / lit(1e9) /
              count(lit(1)).cast("double")).as("mean_a"),
            (sum(col("a2n")).cast("double") / lit(1e9) /
              count(lit(1)).cast("double")).as("m2"))
          .withColumn("std_a", sqrt(greatest(lit(0.0),
            col("m2") - col("mean_a") * col("mean_a"))))
        pts.join(broadcast(stats.select("cid", "n", "mean_a", "std_a")), "cid")
          .groupBy(col("cid"))
          .agg(max(col("n")).as("n_vecs"),
            max(col("mean_a")).as("mean_a"), max(col("std_a")).as("std_a"),
            sum(when(col("a") > col("mean_a") + lit(2.0) * col("std_a"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy("cid")
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |vs AS (SELECT vec_id, e FROM v
           |  WHERE ${graft.functions.HashSample.duck("vec_id", ivfSampleMod)}),
           |${duckKmeansFor("vs",
               s"SELECT vec_id, e FROM vs ORDER BY vec_id LIMIT $ivfK")},
           |pts AS (SELECT cl.cid, cl.vec_id,
           |    sqrt(greatest(0.0, ${duckDot("v.e", "v.e")}
           |      - 2.0 * ${duckDot("v.e", "c.ce")}
           |      + ${duckDot("c.ce", "c.ce")})) AS a
           |  FROM cells cl JOIN v ON v.vec_id = cl.vec_id
           |  JOIN cent c ON c.cid = cl.cid),
           |ptq AS (SELECT cid, vec_id, a,
           |    CAST(floor(a * 1e9) AS BIGINT) AS an,
           |    CAST(floor(a * a * 1e9) AS BIGINT) AS a2n FROM pts),
           |st AS (SELECT cid, CAST(count(*) AS BIGINT) AS n,
           |    CAST(SUM(an) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE)
           |      AS mean_a,
           |    CAST(SUM(a2n) AS DOUBLE) / 1e9 / CAST(count(*) AS DOUBLE)
           |      AS m2
           |  FROM ptq GROUP BY cid),
           |sf AS (SELECT cid, n, mean_a,
           |    sqrt(greatest(0.0, m2 - mean_a * mean_a)) AS std_a FROM st)
           |SELECT p.cid, MAX(n) AS n_vecs, MAX(mean_a) AS mean_a,
           |  MAX(std_a) AS std_a,
           |  CAST(SUM(CASE WHEN p.a > mean_a + 2.0 * std_a THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_outliers
           |FROM ptq p JOIN sf ON p.cid = sf.cid
           |GROUP BY p.cid ORDER BY p.cid""".stripMargin)),

    // ── MMR diversified re-rank (maximal marginal relevance) ──
    // The search-result diversification head (Carbonell & Goldstein
    // 1998): greedily pick 5 of the top-8 brute candidates, each step
    // maximizing relevance MINUS the max similarity to anything
    // already picked (λ = ½ — scale-free, so the score is just
    // cos_rel − max_sim). The greedy recursion is BOUNDED (k = 5), so
    // both engines unroll it: the Spark side loops 4 DataFrame steps
    // (plan depth fixed, candidate/pair relations checkpointed once),
    // the oracle unrolls the same 4 steps as generated CTEs (the
    // ssspIterSql idiom). Per-query work is candidates² = 64 sims —
    // corpus cost stays the ONE brute/ANN retrieval that feeds it.
    // All comparisons are on engine-identical doubles with the
    // (score DESC, neighbor_id) tie-break.
    Q("q_mmr",
      (s, dir) => {
        val v = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
        val cand = bruteRank(v, 4, 8)
          .join(v, col("vec_id") === col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"), col("cos"),
            col("e"), col("nrm"))
          .localCheckpoint(true)
        val pairs = cand.select(col("query_id").as("pq"),
            col("neighbor_id").as("a"), col("e").as("ea"), col("nrm").as("na"))
          .join(cand.select(col("query_id").as("pq"),
            col("neighbor_id").as("b"), col("e").as("eb"), col("nrm").as("nb")),
            Seq("pq"))
          .filter(col("a") =!= col("b"))
          .select(col("pq"), col("a"), col("b"),
            cosine(col("ea"), col("na"), col("eb"), col("nb")).as("sim"))
          .localCheckpoint(true)
        var selected = cand
          .withColumn("rn", row_number().over(Window.partitionBy("query_id")
            .orderBy(col("cos").desc, col("neighbor_id"))))
          .filter(col("rn") === 1)
          .select(col("query_id"), col("neighbor_id").as("nid"),
            lit(1L).as("step"))
        for (k <- 2 to 5) {
          val pen = pairs
            .join(selected.select(col("query_id").as("pq"),
              col("nid").as("b")), Seq("pq", "b"))
            .groupBy(col("pq").as("query_id"), col("a").as("neighbor_id"))
            .agg(max(col("sim")).as("pen"))
          val pick = cand
            .join(selected.select(col("query_id"), col("nid").as("neighbor_id")),
              Seq("query_id", "neighbor_id"), "left_anti")
            .join(pen, Seq("query_id", "neighbor_id"))
            .withColumn("score", col("cos") - col("pen"))
            .withColumn("rn", row_number().over(Window
              .partitionBy("query_id")
              .orderBy(col("score").desc, col("neighbor_id"))))
            .filter(col("rn") === 1)
            .select(col("query_id"), col("neighbor_id").as("nid"),
              lit(k.toLong).as("step"))
          selected = selected.unionByName(pick).localCheckpoint(true)
        }
        selected
          .join(cand.select(col("query_id"), col("neighbor_id").as("nid"),
            col("cos")), Seq("query_id", "nid"))
          .select(col("query_id"), col("step"),
            col("nid").as("neighbor_id"), col("cos"))
          .orderBy("query_id", "step")
      },
      Some {
        val steps = (2 to 5).map { k =>
          s"""pen$k AS (SELECT p.pq AS query_id, p.a AS neighbor_id,
             |    MAX(p.sim) AS pen
             |  FROM p JOIN sel${k - 1} s ON p.pq = s.query_id AND p.b = s.nid
             |  GROUP BY p.pq, p.a),
             |pick$k AS (SELECT query_id, neighbor_id AS nid FROM (
             |    SELECT c.query_id, c.neighbor_id,
             |      row_number() OVER (PARTITION BY c.query_id
             |        ORDER BY c.cos - pen.pen DESC, c.neighbor_id) AS rn
             |    FROM c JOIN pen$k pen ON pen.query_id = c.query_id
             |      AND pen.neighbor_id = c.neighbor_id
             |    WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} s
             |      WHERE s.query_id = c.query_id AND s.nid = c.neighbor_id))
             |  WHERE rn = 1),
             |sel$k AS (SELECT query_id, nid, step FROM sel${k - 1}
             |  UNION ALL SELECT query_id, nid, $k FROM pick$k)""".stripMargin
        }.mkString(",\n")
        s"""WITH v AS ($duckEmb),
           |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v
           |      WHERE vec_id < 4),
           |sc AS (SELECT q.query_id, v.vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM v JOIN q ON v.vec_id <> q.query_id),
           |c AS (SELECT query_id, neighbor_id, cos FROM (
           |    SELECT query_id, neighbor_id, cos,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY cos DESC, neighbor_id) AS rnk FROM sc)
           |  WHERE rnk <= 8),
           |p AS (SELECT ca.query_id AS pq, ca.neighbor_id AS a,
           |    cb.neighbor_id AS b,
           |    ${duckCos("va.e", "va.nrm", "vb.e", "vb.nrm")} AS sim
           |  FROM c ca JOIN c cb ON ca.query_id = cb.query_id
           |    AND ca.neighbor_id <> cb.neighbor_id
           |  JOIN v va ON va.vec_id = ca.neighbor_id
           |  JOIN v vb ON vb.vec_id = cb.neighbor_id),
           |sel1 AS (SELECT query_id, neighbor_id AS nid,
           |    CAST(1 AS BIGINT) AS step FROM (
           |    SELECT query_id, neighbor_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
           |      AS rn FROM c) WHERE rn = 1),
           |$steps
           |SELECT s.query_id, CAST(s.step AS BIGINT) AS step,
           |  s.nid AS neighbor_id, c.cos
           |FROM sel5 s JOIN c ON c.query_id = s.query_id
           |  AND c.neighbor_id = s.nid
           |ORDER BY s.query_id, s.step""".stripMargin
      }),

    // ── DBSCAN-style density clustering over the pair artifact ──
    // Density clustering without k: a vector is CORE when it has ≥ 2
    // cosine-[[embedDupCos]] neighbors (the ε-graph IS the persisted
    // [[fullVectorPairs]] artifact — the expensive stage is already
    // paid and shared with q_dedup_embed/_resolve); clusters are
    // connected components of the core-core subgraph
    // (pointer-jumping [[Dedup.componentsOf]]); non-core vectors
    // with a core neighbor join that neighbor's cluster as BORDER
    // (min-label tie-break); everything else is NOISE. The ε-graph
    // comes from LSH candidates, so this is DBSCAN over the
    // recall-measured approximate neighborhood (RECALL.md) — exactly
    // how production density clustering runs at corpus scale, and
    // the oracle replays the same LSH pipeline so the approximation
    // is inside the hash check. Convention: minPts counts NEIGHBORS
    // (excludes self) — ≥ 2 here: the near-uniform synthetic
    // embeddings carry weak cosine structure (RECALL.md), with a max
    // pair-graph degree of 2/2/4 at the three driver SFs (probed), so
    // ≥ 3 would make every vector noise (vacuous); ≥ 2 yields a real
    // core/border/noise mix at every SF and reads as "has at least
    // two near-duplicates".
    Q("q_dbscan",
      (s, dir) => {
        val pairs = s.read.parquet(fullVectorPairs(s, dir))
          .select("id1", "id2").localCheckpoint(true)
        val und = pairs.select(col("id1").as("n"), col("id2").as("d"))
          .unionByName(pairs.select(col("id2").as("n"), col("id1").as("d")))
        val core = und.groupBy("n").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= 2).select("n").localCheckpoint(true)
        val ce = pairs
          .join(core.select(col("n").as("id1")), Seq("id1"), "left_semi")
          .join(core.select(col("n").as("id2")), Seq("id2"), "left_semi")
        val coreLbl = core
          .join(Dedup.componentsOf(ce), Seq("n"), "left")
          .withColumn("lbl", coalesce(col("lbl"), col("n")))
        val borderLbl = und
          .join(coreLbl.select(col("n").as("d"), col("lbl")), Seq("d"))
          .join(core, Seq("n"), "left_anti")
          .groupBy("n").agg(min(col("lbl")).as("blbl"))
        emb(s, dir).select("vec_id")
          .join(coreLbl.select(col("n").as("vec_id"),
            col("lbl").as("clbl")), Seq("vec_id"), "left")
          .join(borderLbl.select(col("n").as("vec_id"), col("blbl")),
            Seq("vec_id"), "left")
          .select(col("vec_id"),
            when(col("clbl").isNotNull, "core")
              .when(col("blbl").isNotNull, "border")
              .otherwise("noise").as("role"),
            coalesce(col("clbl"), col("blbl"), lit(-1L)).as("cluster"))
          .orderBy("vec_id")
      },
      Some(
        s"""WITH RECURSIVE v AS ($duckEmb),
           |$duckLshCandidatePairs,
           |$duckCosineVerified,
           |vpt AS (SELECT id1, id2 FROM vp WHERE cos >= $embedDupCos),
           |und AS (SELECT id1 AS n, id2 AS d FROM vpt
           |        UNION ALL SELECT id2, id1 FROM vpt),
           |core AS (SELECT n FROM (
           |    SELECT n, count(*) AS dg FROM und GROUP BY n)
           |  WHERE dg >= 2),
           |ce AS (SELECT id1, id2 FROM vpt
           |  WHERE id1 IN (SELECT n FROM core)
           |    AND id2 IN (SELECT n FROM core)),
           |${Dedup.duckClosure("ce")},
           |cl AS (SELECT co.n, COALESCE(c.lbl, co.n) AS lbl
           |       FROM core co LEFT JOIN comp c ON c.n = co.n),
           |bl AS (SELECT u.n, MIN(cl.lbl) AS blbl FROM und u
           |       JOIN cl ON cl.n = u.d
           |       WHERE u.n NOT IN (SELECT n FROM core)
           |       GROUP BY u.n)
           |SELECT d.vec_id,
           |  CASE WHEN cl.lbl IS NOT NULL THEN 'core'
           |       WHEN bl.blbl IS NOT NULL THEN 'border'
           |       ELSE 'noise' END AS role,
           |  COALESCE(cl.lbl, bl.blbl, -1) AS cluster
           |FROM v d LEFT JOIN cl ON cl.n = d.vec_id
           |LEFT JOIN bl ON bl.n = d.vec_id
           |ORDER BY vec_id""".stripMargin)),

    // ── ANN recall@5 as a DECLARED, oracle-checked query ──
    // The index-health metric a deployment monitors per corpus
    // version: per query, how many of the exact brute-force top-5
    // does the multi-table LSH top-5 recover? Both relations are the
    // SAME definitions their standalone queries ship (bruteRank /
    // lshMultiRank — zero drift possible), the per-query recall is
    // exact ppm, and the corpus-mean rides along (micro-unit div).
    // RECALL.md's measured tables come from specs; THIS puts the
    // recall computation itself inside the per-round hash gate, so a
    // silent index regression (bucket drift, plane change) fails
    // correctness, not just a spec threshold.
    Q("q_ann_recall",
      (s, dir) => {
        val v0 = emb(s, dir).select("vec_id", "e", "nrm").localCheckpoint(true)
        val truth = bruteRank(v0, 8, 5)
          .select(col("query_id"), col("neighbor_id"))
        val got = lshMultiRank(v0, 64, 5).filter(col("query_id") < 8)
          .select(col("query_id"), col("neighbor_id"))
        val hits = truth.join(got, Seq("query_id", "neighbor_id"),
            "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("h"))
        val per = truth.select("query_id").distinct()
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("h"), lit(0L)).as("hits"),
            (coalesce(col("h"), lit(0L)) * 200000L).as("recall_ppm"))
        per
          .withColumn("mean_recall_ppm",
            expr("sum(recall_ppm) over ()") /
              count(lit(1)).over(Window.partitionBy()))
          .orderBy("query_id")
      },
      Some(
        s"""WITH $duckLshMultiCtes,
           |bq AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM v
           |       WHERE vec_id < 8),
           |bp AS (SELECT q.query_id, v2.vec_id AS neighbor_id,
           |  ${duckCos("qe", "qn", "e", "nrm")} AS cos
           |  FROM v v2 JOIN bq q ON v2.vec_id <> q.query_id),
           |br AS (SELECT query_id, neighbor_id,
           |  row_number() OVER (PARTITION BY query_id
           |    ORDER BY cos DESC, neighbor_id) AS rnk FROM bp),
           |truth AS (SELECT query_id, neighbor_id FROM br WHERE rnk <= 5),
           |got AS (SELECT query_id, neighbor_id FROM r
           |        WHERE rnk <= 5 AND query_id < 8),
           |h AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS h
           |  FROM truth t JOIN got g ON g.query_id = t.query_id
           |    AND g.neighbor_id = t.neighbor_id
           |  GROUP BY t.query_id),
           |per AS (SELECT q.query_id,
           |    CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
           |    CAST(COALESCE(h.h, 0) * 200000 AS BIGINT) AS recall_ppm
           |  FROM (SELECT DISTINCT query_id FROM truth) q
           |  LEFT JOIN h ON h.query_id = q.query_id)
           |SELECT query_id, hits, recall_ppm,
           |  CAST(SUM(recall_ppm) OVER () AS BIGINT) /
           |    CAST(count(*) OVER () AS BIGINT) AS mean_recall_ppm
           |FROM per ORDER BY query_id""".stripMargin))
  )

  /** DuckDB twin of the multi-table LSH top-k relation — shared by the
    * in-query and prebuilt-index variants (the index is deterministic,
    * so both compute the identical relation). */
  private lazy val duckLshMultiTopK: String =
    s"""WITH $duckLshMultiCtes
       |SELECT query_id, neighbor_id, rnk, cos FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin

  /** The CTE chain of [[duckLshMultiTopK]] without the final SELECT —
    * reused by the RRF fusion oracle (which also needs the shared `v`
    * embedding CTE and the ranked relation `r`). */
  private lazy val duckLshMultiCtes: String =
    s"""v AS ($duckEmb),
       |b AS (SELECT vec_id, unnest([$duckSigList]) AS bucket FROM v),
       |bc AS (SELECT vec_id, bucket FROM (
       |  SELECT vec_id, bucket,
       |    row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rn
       |  FROM b) WHERE rn <= $lshBucketCap),
       |qb AS (SELECT vec_id AS query_id, bucket FROM b WHERE vec_id < 64),
       |pairs AS (SELECT DISTINCT qb.query_id, bc.vec_id
       |  FROM bc JOIN qb USING (bucket) WHERE bc.vec_id <> qb.query_id),
       |scored AS (SELECT p.query_id, p.vec_id AS neighbor_id,
       |  ${duckCos("qv.e", "qv.nrm", "nv.e", "nv.nrm")} AS cos
       |  FROM pairs p
       |  JOIN v qv ON qv.vec_id = p.query_id
       |  JOIN v nv ON nv.vec_id = p.vec_id),
       |r AS (SELECT query_id, neighbor_id, cos,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
       |    AS rnk FROM scored)""".stripMargin
}
