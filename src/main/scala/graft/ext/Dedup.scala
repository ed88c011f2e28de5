package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.queries.Q

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Four families over `documents`:
  *   - exact (content-hash group-by),
  *   - MinHash + LSH banding (shingle → minhash → band → bucket join),
  *   - SimHash (token-vote fingerprint),
  *   - n-gram Jaccard verification fed by the MinHash band candidates.
  *
  * Scale design: every candidate-generation step is an equi-join on a
  * deterministic bucket key (band signature / fingerprint), capped per
  * bucket ([[bucketCap]]) against mass-duplication skew, so at 100 TB
  * each family is shuffle-on-key + bounded per-bucket work — no
  * quadratic cross join anywhere. Per-token hashing is ONE md5 (the
  * dominant interpreted cost), widened to k minhash functions by cheap
  * linear permutations `(a*h + b) mod p` — the classic construction —
  * and to simhash bits by bit extraction. All integer arithmetic, so
  * the DuckDB oracles compute bit-identical values.
  */
object Dedup {

  /** Mersenne prime 2^31-1: products a*h stay under 2^63. */
  private val P = 2147483647L

  /** Fixed (a, b) pairs for the k=8 linear minhash permutations. */
  val perms: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (69069L, 362437L), (1664525L, 1013904223L),
    (22695477L, 7777L), (134775813L, 1L), (214013L, 2531011L),
    (16843009L, 826366247L), (1588635695L, 99991L))

  val nBands = 4 // bands of r = 2 rows over the 8 minhashes

  // ── shared building blocks (Spark SQL expr strings) ──
  //
  // Token hashing: ONE md5 per word (`hw`), then each word-3-gram
  // shingle hash is the integer combination hw[i]*961 + hw[i+1]*31 +
  // hw[i+2] — no shingle strings are ever built and no per-shingle
  // md5 runs. Values stay < 2^43 (hw < 2^32), so the arithmetic is
  // exact in both engines. 31-word vocabulary makes unigrams
  // degenerate (every doc shares most words); 3-gram shingles
  // discriminate near-dups cleanly. Sorted + distinct so the
  // codegen'd merge-walk intersect applies; min/band consumers are
  // order-insensitive.

  private val hwSpark = graft.functions.TokenHash.spark("split(text, ' ')")
  private val hwDuck = graft.functions.TokenHash.duck("string_split(text, ' ')")

  private val hsSpark =
    "array_sort(array_distinct(CASE WHEN size(hw) >= 3 THEN " +
      "transform(sequence(1, size(hw) - 2), " +
      "i -> element_at(hw, i) * 961 + element_at(hw, i + 1) * 31 + element_at(hw, i + 2)) " +
      "ELSE hw END))"
  private val hsDuck =
    "list_sort(list_distinct(CASE WHEN len(hw) >= 3 THEN " +
      "list_transform(range(1, len(hw) - 1), " +
      "i -> hw[i] * 961 + hw[i+1] * 31 + hw[i+2]) ELSE hw END))"

  /** Per-(band, sig) membership cap for candidate generation.
    *
    * Skew guard: a corpus with thousands of copies of one document puts
    * them all in one band bucket, turning the within-bucket pair join
    * quadratic on one executor. Bucket membership is therefore ranked
    * deterministically by doc_id and truncated at this cap, bounding
    * per-bucket pair work at C(64,2) ≈ 2k pairs regardless of corpus.
    * Contract: mass duplication is the EXACT family's job — run
    * q_dedup_exact-style content-hash dedup first, then near-dup on the
    * survivors; the cap is the backstop, not the mechanism. Measured on
    * the driver corpora the largest bucket holds 3 (sf0.01) / 10
    * (sf0.1) docs, so the cap is invisible there (results identical
    * with and without it — asserted in DedupSkewSpec).
    */
  val bucketCap = 64

  /** q_entity_resolve's supplier-id offset into the unified entity-id
    * space: 10^12 clears any reachable TPC-H key (custkey = 150k x sf)
    * where the previous 10^6 collided from sf >= 7 onward. */
  private val EntityOffset = 1000000000000L

  /** THE skew-cap idiom, shared by every candidate generator (band
    * buckets, incremental corpus buckets, LSH sign buckets): bucket
    * membership ranked deterministically by `orderCol`, truncated at
    * `cap`. One definition so cap semantics (tie-breaking, accounting)
    * can never drift between generators.
    *
    * PRECONDITION: `orderCol` must be UNIQUE within each `partCols`
    * group (all call sites use a primary key — doc_id / vec_id).
    * row_number breaks ties by partition-internal row order, so a
    * non-unique orderCol would make cap membership nondeterministic
    * across runs and break oracle hash parity; add a tiebreaker column
    * before reusing this with a non-key ordering. */
  private[ext] def capBuckets(df: DataFrame, partCols: Seq[String],
      orderCol: String, cap: Int): DataFrame =
    df.withColumn("rn",
        row_number().over(
          Window.partitionBy(partCols.map(col): _*).orderBy(orderCol)))
      .filter(col("rn") <= cap)
      .drop("rn")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Any documents-shaped frame (doc_id, text, …) → + (hw, hs). */
  def shingled(docsDf: DataFrame): DataFrame =
    docsDf
      .withColumn("hw", expr(hwSpark))
      .withColumn("hs", expr(hsSpark))

  /** documents → (doc_id, hs) with shingle-hash array, built once. */
  private[ext] def hashedShingles(s: SparkSession, dir: String): DataFrame =
    shingled(docs(s, dir))

  /** Deterministic (a, b) pairs for k linear minhash permutations —
    * the parameter-sweep generator behind the recall harness
    * (RECALL.md); the shipped 8 stay the hand-picked [[perms]]. */
  def minhashPerms(k: Int): Seq[(Long, Long)] = {
    val rnd = new java.util.Random(0x5eed)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
  }

  /** (doc_id, hs) → exploded (doc_id, band, sig) band signatures for an
    * arbitrary (perms, bands × rowsPerBand) LSH configuration. */
  def bandBucketsParam(sh0: DataFrame, ps: Seq[(Long, Long)],
      bands: Int, rowsPerBand: Int): DataFrame = {
    require(ps.size >= bands * rowsPerBand, "not enough permutations")
    // a NULL/empty shingle array (null or too-short text on arbitrary
    // "documents-shaped" production frames) yields all-NULL minhashes,
    // and Spark's concat_ws SWALLOWS nulls — every such doc would land
    // in one shared "" signature bucket and cross-pair, while the
    // DuckDB twins' `||` propagates NULL and never pairs them. Neither
    // has shingles to verify against, so the correct semantics on both
    // engines is "no shingles, no buckets" (size(NULL) is NULL here,
    // so the predicate drops both shapes; fixture docs all have >= 10
    // words — no pinned hash moves)
    val sh = sh0.filter(size(col("hs")) > 0)
    val sig = sh.select(
      col("doc_id") +:
        ps.zipWithIndex.map { case ((a, b), i) =>
          // reduce h below 2^31 first: a * h must stay under 2^63
          expr(s"array_min(transform(hs, h -> ($a * (h % $P) + $b) % $P))").as(s"m$i")
        }: _*)
    sig.select(
        col("doc_id"),
        posexplode(array((0 until bands).map(b =>
          concat_ws("_", (0 until rowsPerBand).map(r =>
            col(s"m${rowsPerBand * b + r}").cast("string")): _*)): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "sig"))
  }

  /** (doc_id, hs) → exploded (doc_id, band, sig) — shipped config. */
  def bandBuckets(sh: DataFrame): DataFrame =
    bandBucketsParam(sh, perms, nBands, 2)

  /** [[bandCandidates]] for an arbitrary LSH configuration. */
  def bandCandidatesParam(sh: DataFrame, ps: Seq[(Long, Long)], bands: Int,
      rowsPerBand: Int, cap: Int = bucketCap): DataFrame =
    pairsOf(capBuckets(bandBucketsParam(sh, ps, bands, rowsPerBand),
      Seq("band", "sig"), "doc_id", cap))

  /** Capped (doc_id, band, sig) bucket rows → distinct candidate pairs
    * (id1 < id2): ONE definition of the pair self-join, consumed by
    * the in-query generator ([[bandCandidatesParam]]) and the
    * persisted-index generator ([[candidatesFromIndex]]) so pair
    * semantics can never drift between them. */
  private def pairsOf(capped: DataFrame): DataFrame =
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

  /** Candidate near-dup pairs (id1 < id2) via the skew-capped
    * band-bucket equi-join. This is THE candidate generator: both the
    * LSH family and the Jaccard verification feed from it, so candidate
    * volume tracks near-dup density (band collisions), never corpus².
    * The rank window shuffles on the same (band, sig) key the join
    * uses, so at scale this is one keyed repartition reused twice. */
  def bandCandidates(sh: DataFrame, cap: Int = bucketCap): DataFrame =
    bandCandidatesParam(sh, perms, nBands, 2, cap)

  private[ext] val duckHashedShingles =
    s"""tk AS (SELECT doc_id, lang, n_chars, $hwDuck AS hw FROM documents),
       |h AS (SELECT doc_id, lang, n_chars, $hsDuck AS hs FROM tk)""".stripMargin

  /** DuckDB minhash select list (emits m0..m7 from a CTE with `hs`). */
  private val duckMinhashList: String =
    perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hs, h -> ($a * (h % $P) + $b) % $P)) AS m$i"
    }.mkString(", ")

  /** DuckDB band-signature list (m-pairs → varchar sigs). */
  private val duckBandList: String =
    (0 until nBands)
      .map(b => s"m${2 * b}::VARCHAR || '_' || m${2 * b + 1}::VARCHAR")
      .mkString(", ")

  /** DuckDB twin of [[bandBuckets]] + [[bandCandidates]] as CTE bodies
    * (expects `h` from [[duckHashedShingles]] in scope). */
  private[ext] val duckBandCandidates: String =
    s"""mh AS (SELECT doc_id, $duckMinhashList FROM h),
       |bands AS (SELECT doc_id, unnest([$duckBandList]) AS sig,
       |          unnest(range($nBands)) AS band FROM mh),
       |capped AS (SELECT doc_id, band, sig FROM (
       |  SELECT doc_id, band, sig,
       |    row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
       |  FROM bands) WHERE rn <= $bucketCap),
       |cand AS (SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  /** DuckDB twin of [[verifiedPairsFromIndex]]'s verification stage as
    * a `vp(id1, id2)` CTE (expects `h` and `cand` in scope):
    * exact-Jaccard threshold over the band candidates. ONE definition
    * consumed by q_dedup_resolve and the end-to-end funnel so the
    * verification stage the oracles replay can never drift from the
    * Spark side's threshold or formula. */
  private[ext] def duckVerifiedPairs(threshold: Double): String =
    s"""vp AS (SELECT id1, id2 FROM (
       |  SELECT id1, id2,
       |    len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS inter,
       |    len(a.hs) AS la, len(b.hs) AS lb
       |  FROM cand JOIN h a ON a.doc_id = cand.id1
       |            JOIN h b ON b.doc_id = cand.id2)
       |  WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= $threshold)""".stripMargin

  /** DuckDB transitive-closure CTE bodies over a pair relation
    * `src(id1, id2)`: emits `edges`, recursive `reach`, and
    * `comp(n, lbl)` with lbl = component minimum — the oracle twin of
    * [[componentsOf]], shared by q_dedup_resolve and
    * q_dedup_embed_resolve so the closure semantics can never drift.
    * Callers must open their WITH as `WITH RECURSIVE`. */
  private[ext] def duckClosure(src: String): String =
    s"""edges AS (SELECT id1 AS n, id2 AS m FROM $src
       |          UNION SELECT id2, id1 FROM $src),
       |reach(n, m) AS (
       |  SELECT n, m FROM edges
       |  UNION
       |  SELECT r.n, e.m FROM reach r JOIN edges e ON e.n = r.m),
       |comp AS (SELECT n, least(n, min(m)) AS lbl FROM reach GROUP BY n)""".stripMargin

  /** Exact-Jaccard verification of candidate pairs: join the shingle
    * arrays back on both keys, codegen'd merge-walk intersection,
    * threshold filter. ONE definition consumed by the whole-corpus
    * path ([[verifiedPairsFromIndex]]) and the incremental path
    * ([[incrementalNearDups]]) so the two can never drift. */
  private def jaccardVerify(cand: DataFrame, left: DataFrame,
      right: DataFrame, leftKey: String, rightKey: String,
      threshold: Double): DataFrame =
    cand
      .join(left.select(col("doc_id").as(leftKey), col("hs").as("hs1")), leftKey)
      .join(right.select(col("doc_id").as(rightKey), col("hs").as("hs2")), rightKey)
      .withColumn("inter",
        graft.functions.VecOps.sorted_intersect_count(col("hs1"), col("hs2")))
      .withColumn("jac",
        col("inter").cast("double") /
          (expr("size(hs1)") + expr("size(hs2)") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col(leftKey), col(rightKey), col("jac"))

  /** Connected components of a pair graph by min-label propagation
    * WITH pointer jumping: each round every node takes the min label
    * in its closed neighborhood AND adopts its label's own label
    * (shortcutting), so the label reach doubles per round and the
    * fixpoint arrives in ~log2(diameter) rounds — chain-shaped
    * low-threshold similarity graphs converge as fast as the
    * near-clique dup clusters. Iteration stops when no label changed;
    * the fixpoint is the exact component minimum, so the result is
    * data-independent of the round count and matches the oracle's
    * transitive closure. Scale shape: each round is one keyed shuffle
    * over the EDGE set plus one node-sized label join — no driver
    * collect, no quadratic step. */
  def componentsOf(pairs0: DataFrame, maxRounds: Int = 32,
      hopsPerRound: Int = 2): DataFrame = {
    require(hopsPerRound == 1 || hopsPerRound == 2,
      s"hopsPerRound must be 1 or 2, got $hopsPerRound")
    // The pair graph feeds BOTH edge directions, the self-loop node
    // set, and the initial labels — five lazy references in all. The
    // upstream pipeline producing it (candidate join + verification)
    // is the expensive part, so materialize the (result-sized) pair
    // set exactly once before fanning out. cache + eager count, not
    // localCheckpoint: the cache is released on every exit path below
    // (a local checkpoint has no lineage left and could never be).
    // The select wrapper gives this function its OWN cache entry —
    // Spark caching is not reference-counted, so caching/unpersisting
    // the caller's frame directly would silently drop a cache the
    // caller still holds (reads still hit any caller cache through
    // plan substitution).
    val pairs = pairs0.select(col("id1"), col("id2")).cache()
    pairs.count()
    // undirected closed neighborhood: both directions + self-loops
    val nodes = pairs.select(col("id1").as("n"))
      .union(pairs.select(col("id2").as("n"))).distinct()
    // cached PRE-PARTITIONED on the per-round join key: every round
    // joins edges on m, and a cache that already carries
    // HashPartitioning(m) feeds both hops without re-exchanging the
    // edge set — one shuffle stage per hop per round gone, and at
    // scale the edge relation (the big side) never moves after this
    val edges = pairs.select(col("id1").as("n"), col("id2").as("m"))
      .union(pairs.select(col("id2").as("n"), col("id1").as("m")))
      .union(nodes.select(col("n"), col("n").as("m")))
      .repartition(col("m"))
      .cache()
    var labels = nodes.select(col("n"), col("n").as("lbl")).cache()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // `hopsPerRound` edge hops per materialized round, ONE job:
      // every materialization (cache + count + rebase) costs a fixed
      // multi-stage latency that dwarfs the data movement on
      // result-sized pair graphs, so a round can do as much monotone
      // work as a constant-size plan allows — hop 1 takes the closed-
      // neighborhood min, an optional hop 2 repeats it over hop 1's
      // labels in the same plan. The second hop pays on deep graphs
      // (the sf0.1 embed-resolve pair graph: 12 → 7.6 s end to end)
      // and LOSES on shallow near-clique graphs where hop 1 already
      // reaches the fixpoint and round count can't drop below 2 —
      // there the extra 2 shuffle stages per round are pure latency
      // (q_dedup_resolve measured 2.9 → 4.2 s under 2-hop; its call
      // site passes hopsPerRound = 1). The self-loop edge (n, n)
      // threads n's ROUND-START label through the hops (hop 1 emits
      // it as `prev`, hop 2 re-selects it at m = n), so the
      // convergence check is still an extra aggregate over the same
      // groups instead of a second join + count against the previous
      // labels.
      val h1 = edges
        .join(labels.select(col("n").as("m"), col("lbl")), "m")
        .groupBy("n").agg(
          min("lbl").as("lbl"),
          min(when(col("m") === col("n"), col("lbl"))).as("prev"))
      val prop =
        if (hopsPerRound == 1) h1
        else edges
          .join(h1.select(col("n").as("m"), col("lbl"), col("prev")), "m")
          .groupBy("n").agg(
            min("lbl").as("lbl"),
            min(when(col("m") === col("n"), col("prev"))).as("prev"))
      // pointer jumping: also adopt the label's OWN label (one extra
      // join on the round-start label table, which is node-sized, not
      // edge-sized). Neighbor-min alone converges in diameter rounds —
      // a low-threshold similarity graph grows chains, and diameter
      // rounds is both wall-clock and a maxRounds liability at larger
      // corpora; shortcutting makes the round count logarithmic (on
      // top of the 2-hop halving). Every step is a monotone min over
      // node ids within a component, so the invariant (label = some
      // node id in the same component, ≥ the component min) is
      // preserved and the combined fixpoint is the same neighbor-min
      // fixpoint — the result is unchanged (PropertiesSpec pins it vs
      // union-find).
      // jump against the round-start table: a fresher (post-2-hop)
      // jump target was measured to save zero rounds on the sf0.1
      // embed graph while recomputing prop twice per round — the
      // cached round-start labels are the cheaper equal-strength jump
      val nextPlan =
        if (round == 0) prop // identity labels: the shortcut is a no-op
        else prop.as("p")
          .join(labels.select(col("n").as("g_n"), col("lbl").as("g_lbl")),
            col("p.lbl") === col("g_n"), "left")
          .select(col("p.n").as("n"),
            least(col("p.lbl"), coalesce(col("g_lbl"), col("p.lbl"))).as("lbl"),
            col("p.prev").as("prev"))
      // rebase the round result onto its RDD: with labels referenced
      // TWICE per round, the Catalyst plan TREE doubles every round
      // (trees don't share subplans — round ~20 OOMs building the plan
      // string), while the RDD DAG shares nodes and stays linear. The
      // LogicalRDD leaf keeps the per-round plan constant-size AND
      // fully unpersistable (a per-round localCheckpoint would leak
      // permanent RDDs — the non-convergence property pins zero leaks).
      val next = labels.sparkSession
        .createDataFrame(nextPlan.toDF().rdd, nextPlan.schema).cache()
      changed = next.filter(col("lbl") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      round += 1
    }
    // non-convergence must fail LOUDLY: a silently-partial labeling
    // would keep extra docs per cluster and diverge from the oracle's
    // transitive closure (a >32-eccentricity near-dup chain is
    // pathological input, not a working configuration). Caches are
    // released BEFORE the throw — the session is shared.
    if (changed != 0) { labels.unpersist(); edges.unpersist(); pairs.unpersist() }
    require(changed == 0,
      s"componentsOf did not converge in $maxRounds rounds " +
        s"($changed labels still changing) — with pointer jumping the reach " +
        s"doubles per round, so raise maxRounds (32 already covers reach ~2^32)")
    // truncate the iterative lineage (the GraphX pattern): without
    // this, every downstream use replays `round` joins AND re-derives
    // the edge set per round. The eager local checkpoint materializes
    // exactly the component labels (result-sized, not an intermediate
    // cache); a long-lived deployment would use a reliable checkpoint
    // dir instead. The loop caches are released here.
    val out = labels.select("n", "lbl").localCheckpoint(true)
    labels.unpersist()
    edges.unpersist()
    pairs.unpersist()
    out
  }

  /** Increment-vs-corpus near-dup probe — the operation a production
    * pipeline runs daily: band buckets of the incoming increment probed
    * against the (skew-capped) band buckets of the accumulated corpus,
    * candidates then verified with exact Jaccard. Candidate volume
    * tracks increment size × near-dup density (band collisions), never
    * increment × corpus. At 100 TB the corpus band table is the
    * persisted artifact (built once, bucketed by (band, sig), reused
    * every day) and the probe is an equi-join that shuffles only the
    * increment. */
  def incrementalNearDups(inc: DataFrame, corp: DataFrame,
      threshold: Double, cap: Int = bucketCap): DataFrame = {
    val shInc = shingled(inc).select(col("doc_id"), col("hs")).localCheckpoint(true)
    val shCorp = shingled(corp).select(col("doc_id"), col("hs")).localCheckpoint(true)
    val probe = bandBuckets(shInc)
    val corpusBuckets =
      capBuckets(bandBuckets(shCorp), Seq("band", "sig"), "doc_id", cap)
    val cand = probe
      .join(corpusBuckets.withColumnRenamed("doc_id", "dup_of"), Seq("band", "sig"))
      .select(col("doc_id"), col("dup_of")).distinct()
    jaccardVerify(cand, shInc, shCorp, "doc_id", "dup_of", threshold)
  }

  /** Declared band-index layout — folded into the Scratch cache keys
    * (a layout change re-keys the artifact under durable roots) and
    * enforced by [[graft.engine.Scratch.writeDeclared]] on every
    * build AND append (drift fails loudly at write time). */
  val bandIndexOuts: Seq[(String, org.apache.spark.sql.types.StructType)] = Seq(
    "buckets" -> org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, band INT, sig STRING"),
    "shingles" -> org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, hs ARRAY<BIGINT>"))

  /** Build the PERSISTED corpus-side near-dup index at `path` — the
    * build-once artifact a daily pipeline probes instead of
    * re-shingling the corpus per batch:
    *
    *   - `buckets/`  (band, sig, doc_id): the skew-capped band-bucket
    *     table, laid out by (band, sig) so each probe bucket's members
    *     are co-located (one file group per key range);
    *   - `shingles/` (doc_id, hs): the shingle-hash arrays for the
    *     exact-Jaccard verify join-back.
    *
    * The artifact is deterministic in the corpus (capBuckets ranks by
    * the unique doc_id), so probes against it are oracle-stable. At
    * deployment scale both tables are written once per corpus version
    * to durable storage ([[graft.engine.Bucketing]] makes the layouts
    * metastore-bucketed so the probe join and verify join-back shuffle
    * ONLY the increment); the repartition here gives the plain-parquet
    * stand-in the same co-location. */
  def buildBandIndex(corpus: DataFrame, path: String,
      cap: Int = bucketCap): Unit = {
    val sh = shingled(corpus).select(col("doc_id"), col("hs"))
      .localCheckpoint(true)
    val declared = bandIndexOuts.toMap
    graft.engine.Scratch.writeDeclared(
      capBuckets(bandBuckets(sh), Seq("band", "sig"), "doc_id", cap)
        .repartition(col("band"), col("sig")),
      declared("buckets"), s"$path/buckets")
    graft.engine.Scratch.writeDeclared(sh.repartition(col("doc_id")),
      declared("shingles"), s"$path/shingles")
  }

  /** Absorb an ADMITTED increment into a persisted [[buildBandIndex]]
    * artifact — the index-maintenance half of the daily loop: without
    * it, tomorrow's probe can't see today's admissions and near-dups
    * arriving one day apart slip through. Parquet APPEND of the
    * increment's band-bucket and shingle rows — increment-sized I/O,
    * the corpus-sized index files are never rewritten.
    *
    * Appends bypass the per-(band, sig) skew cap (a cap is a GLOBAL
    * rank per bucket — enforcing it on append would mean reading the
    * bucket back); until the next [[compactBandIndex]] a hot bucket
    * may exceed the cap, which errs in the benign direction: probes
    * see a superset of candidates (more verify work, never less
    * recall). The cap is restored by the periodic compaction.
    *
    * Crash/retry contract (parquet appends are not transactional):
    * the increment is anti-joined against the SHINGLE table (docs
    * already fully absorbed become a no-op — a retried daily job is
    * idempotent and shingle rows can never duplicate, which matters
    * because duplicate shingles would duplicate every verify output
    * row), and buckets append BEFORE shingles. A crash between the
    * two leaves bucket rows whose verify join-back finds no shingles
    * (temporarily weaker recall, never wrong pairs) — and the RETRY
    * still sees those docs as unabsorbed and re-appends both tables;
    * the duplicated bucket rows are harmless because every candidate
    * consumer applies distinct() before verification. */
  def appendToBandIndex(inc: DataFrame, indexPath: String): Unit = {
    val s = inc.sparkSession
    val absorbed = s.read.parquet(s"$indexPath/shingles").select("doc_id")
    val sh = shingled(inc).select(col("doc_id"), col("hs"))
      .join(absorbed, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val declared = bandIndexOuts.toMap
    graft.engine.Scratch.writeDeclared(
      bandBuckets(sh).repartition(col("band"), col("sig")),
      declared("buckets"), s"$indexPath/buckets", mode = "append")
    graft.engine.Scratch.writeDeclared(sh.repartition(col("doc_id")),
      declared("shingles"), s"$indexPath/shingles", mode = "append")
  }

  /** Periodic maintenance for an append-grown band index: re-rank each
    * (band, sig) bucket by doc_id, truncate at the cap, rewrite
    * co-clustered. Because cap membership is the lowest-`cap` doc_ids
    * of the bucket regardless of arrival order, a compacted
    * appended-to index is IDENTICAL to one rebuilt from scratch over
    * the union corpus (BandIndexMaintenanceSpec pins the equality) —
    * append+compact is the incremental path to the same artifact,
    * at increment + index cost instead of corpus-reshingle cost. */
  def compactBandIndex(s: SparkSession, indexPath: String,
      cap: Int = bucketCap): Unit = {
    // STAGED swap, never an in-place overwrite: overwrite deletes the
    // only durable copy BEFORE the rewrite commits, so a crash (or an
    // executor loss recomputing a truncated-lineage checkpoint) would
    // leave a Scratch-marked index permanently truncated — every later
    // process would trust the marker and serve it. Writing the capped
    // table to a sibling dir (through the declared-layout enforcement,
    // like every other index write) and renaming keeps the live index
    // intact at every instant; the recovery branch finishes a swap
    // that crashed between delete and rename.
    val buckets = new org.apache.hadoop.fs.Path(s"$indexPath/buckets")
    val staging = new org.apache.hadoop.fs.Path(s"$indexPath/buckets.compact")
    val fs = buckets.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(buckets)) {
      require(fs.exists(staging),
        s"band index at $indexPath has neither buckets nor a staged compact")
      require(fs.rename(staging, buckets),
        s"recovery rename $staging -> $buckets failed")
      return
    }
    if (fs.exists(staging))
      require(fs.delete(staging, true), s"could not clear stale $staging")
    graft.engine.Scratch.writeDeclared(
      capBuckets(s.read.parquet(buckets.toString),
          Seq("band", "sig"), "doc_id", cap)
        .repartition(col("band"), col("sig")),
      bandIndexOuts.toMap.apply("buckets"), staging.toString)
    require(fs.delete(buckets, true), s"delete of $buckets failed")
    require(fs.rename(staging, buckets),
      s"swap rename $staging -> $buckets failed")
  }

  /** Scratch-cached [[buildBandIndex]] artifact over the corpus
    * partition (doc_id % 10 ≠ 7) of `dir` — ONE artifact shared by
    * every daily-probe consumer (q_dedup_incremental_idx and the
    * incremental curation funnel), durable across processes under a
    * GRAFT_SCRATCH_DIR root. */
  def corpusBandIndex(s: SparkSession, dir: String): String =
    graft.engine.Scratch.cached("band_idx",
      s"$dir outs=${graft.engine.Scratch.outsKey(bandIndexOuts)} " +
        s"cap=$bucketCap bands=${nBands}x2 perms=${perms.size}") { path =>
      buildBandIndex(docs(s, dir).filter(col("doc_id") % 10 =!= 7), path)
    }

  /** Scratch-cached [[buildBandIndex]] artifact over the WHOLE corpus
    * of `dir` — the self-dedup twin of [[corpusBandIndex]], consumed
    * by the batch curation funnel's near-dup stage. */
  def fullBandIndex(s: SparkSession, dir: String): String =
    graft.engine.Scratch.cached("band_idx_all",
      s"$dir outs=${graft.engine.Scratch.outsKey(bandIndexOuts)} " +
        s"cap=$bucketCap bands=${nBands}x2 perms=${perms.size}") { path =>
      buildBandIndex(docs(s, dir), path)
    }

  /** Candidate pair set from a PREBUILT [[buildBandIndex]] artifact —
    * the persisted (already skew-capped) bucket table self-joined on
    * (band, sig). Identical to `bandCandidates(hashedShingles(…))`
    * because the index build runs the same shingle → bucket → cap
    * pipeline; the per-token md5 pass is paid once per corpus version
    * instead of once per query. */
  def candidatesFromIndex(s: SparkSession, indexPath: String): DataFrame =
    pairsOf(s.read.parquet(s"$indexPath/buckets"))

  /** Exact-Jaccard verified near-dup pairs from a PREBUILT
    * [[buildBandIndex]] artifact instead of re-shingling the corpus
    * in-query: [[candidatesFromIndex]] verified against the persisted
    * shingle table. The index is deterministic in the corpus, so the
    * relation — and any oracle hash over it — is IDENTICAL to the
    * in-query path (the q_dedup_ngram / q_dedup_resolve verification
    * stage); the per-token md5 pass (the dominant cost) is paid once
    * per corpus version instead of once per query. */
  def verifiedPairsFromIndex(s: SparkSession, indexPath: String,
      threshold: Double): DataFrame = {
    val sh = s.read.parquet(s"$indexPath/shingles")
    jaccardVerify(candidatesFromIndex(s, indexPath), sh, sh,
      "id1", "id2", threshold)
  }

  /** Increment probed against a PREBUILT [[buildBandIndex]] artifact:
    * the daily-pipeline fast path. Unlike [[incrementalNearDups]]
    * (which shingles + buckets the corpus in-query), the corpus-side
    * cost here is a scan of the index tables — the increment is the
    * only side that gets shingled, bucketed, and shuffled. Candidate
    * volume still tracks increment × band-collision density. */
  def incrementalNearDupsAgainst(inc: DataFrame, indexPath: String,
      threshold: Double): DataFrame = {
    val s = inc.sparkSession
    val shInc = shingled(inc).select(col("doc_id"), col("hs"))
      .localCheckpoint(true)
    val cand = bandBuckets(shInc)
      .join(s.read.parquet(s"$indexPath/buckets")
        .withColumnRenamed("doc_id", "dup_of"), Seq("band", "sig"))
      .select(col("doc_id"), col("dup_of")).distinct()
    jaccardVerify(cand, shInc, s.read.parquet(s"$indexPath/shingles"),
      "doc_id", "dup_of", threshold)
  }

  /** Catalog table holding the PERSISTED corpus content-hash relation
    * (doc_id, h) for `dir`, BUCKETED BY h — built once per (JVM, dir).
    * This is the corpus side a daily exact-dedup pipeline maintains:
    * bucketed on the anti-join key, so the nightly probe shuffles ONLY
    * the increment (the corpus branch reads co-located buckets with no
    * exchange — IncrementalBucketedSpec pins the plan). */
  def hashCorpusTable(s: SparkSession, dir: String): String =
    // the generic build-once bucketed-artifact helper: schema-keyed
    // Scratch cache, lost-catalog re-registration, key memoization and
    // the prefix-ownership guard all come with it (this used to be a
    // ~20-line hand copy of the same logic, minus the memo and guard)
    graft.engine.Bucketing.cachedTable(s, "hash_corpus", dir, "h", 8,
      owner = "Dedup.hashCorpusTable") {
      docs(s, dir).filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), md5(col("text")).as("h"))
    }

  /** Oracle for the incremental exact-dedup relation (shared by the
    * in-query and bucketed-corpus variants). */
  private val duckIncrementalExact: String =
    """WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
      |inc AS (SELECT * FROM d WHERE doc_id % 10 = 7),
      |corp AS (SELECT * FROM d WHERE doc_id % 10 <> 7)
      |SELECT h, min(doc_id) AS keep_id, count(*) AS dup_cnt
      |FROM inc WHERE NOT EXISTS (SELECT 1 FROM corp WHERE corp.h = inc.h)
      |GROUP BY h ORDER BY h NULLS LAST""".stripMargin

  /** Oracle for the incremental near-dup relation (shared by the
    * in-query and prebuilt-index variants — the index is deterministic,
    * so both compute the identical relation). */
  private val duckIncrementalNear: String =
    s"""WITH $duckHashedShingles,
       |mh AS (SELECT doc_id, $duckMinhashList FROM h),
       |bands AS (SELECT doc_id, unnest([$duckBandList]) AS sig,
       |          unnest(range($nBands)) AS band FROM mh),
       |bi AS (SELECT doc_id, band, sig FROM bands WHERE doc_id % 10 = 7),
       |bcap AS (SELECT doc_id, band, sig FROM (
       |  SELECT doc_id, band, sig,
       |    row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
       |  FROM bands WHERE doc_id % 10 <> 7) WHERE rn <= $bucketCap),
       |cand AS (SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS dup_of
       |  FROM bi i JOIN bcap c ON i.band = c.band AND i.sig = c.sig),
       |p AS (SELECT cand.doc_id, cand.dup_of,
       |  len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS inter,
       |  len(a.hs) AS la, len(b.hs) AS lb
       |  FROM cand JOIN h a ON a.doc_id = cand.doc_id
       |            JOIN h b ON b.doc_id = cand.dup_of)
       |SELECT doc_id, dup_of, CAST(inter AS DOUBLE) / (la + lb - inter) AS jac
       |FROM p WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.8
       |ORDER BY doc_id, dup_of""".stripMargin

  /** CTE bodies (expects `h` from [[duckHashedShingles]] in scope)
    * computing `nd(doc_id, dup_of)`: verified near-dups of the probe
    * docs (ids from the `probeIds` CTE, column doc_id) against the
    * skew-capped corpus-side (doc_id % 10 ≠ 7) band buckets — the
    * oracle twin of [[incrementalNearDupsAgainst]] over
    * [[corpusBandIndex]], parameterized on the probe set so the
    * curation funnel can probe with its gated survivors. */
  private[ext] def duckIncrementalNearBodies(probeIds: String): String =
    s"""mh AS (SELECT doc_id, $duckMinhashList FROM h),
       |bands AS (SELECT doc_id, unnest([$duckBandList]) AS sig,
       |          unnest(range($nBands)) AS band FROM mh),
       |bi AS (SELECT doc_id, band, sig FROM bands
       |       WHERE doc_id IN (SELECT doc_id FROM $probeIds)),
       |bcap AS (SELECT doc_id, band, sig FROM (
       |  SELECT doc_id, band, sig,
       |    row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
       |  FROM bands WHERE doc_id % 10 <> 7) WHERE rn <= $bucketCap),
       |ndcand AS (SELECT DISTINCT i.doc_id AS doc_id, c.doc_id AS dup_of
       |  FROM bi i JOIN bcap c ON i.band = c.band AND i.sig = c.sig),
       |nd AS (SELECT doc_id, dup_of FROM (
       |  SELECT ndcand.doc_id, ndcand.dup_of,
       |    len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS inter,
       |    len(a.hs) AS la, len(b.hs) AS lb
       |  FROM ndcand JOIN h a ON a.doc_id = ndcand.doc_id
       |              JOIN h b ON b.doc_id = ndcand.dup_of)
       |  WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.8)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ── exact dedup: content hash, keep lowest doc_id ──
    Q("q_dedup_exact",
      (s, dir) =>
        docs(s, dir)
          .groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy(col("h").asc_nulls_last),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dup_cnt
             |FROM documents GROUP BY md5(text) ORDER BY h NULLS LAST""".stripMargin)),

    // ── MinHash + LSH: candidate near-dup pairs via band-bucket equi-join ──
    // Rides the persisted band index (round-10: the in-query variant
    // re-paid the per-token md5 shingle pass — the module's dominant
    // cost — every invocation; the index build is deterministic in the
    // corpus, so the candidate relation is identical).
    Q("q_dedup_minhash",
      (s, dir) =>
        candidatesFromIndex(s, fullBandIndex(s, dir)).orderBy("id1", "id2"),
      Some(
        s"""WITH $duckHashedShingles,
           |$duckBandCandidates
           |SELECT id1, id2 FROM cand ORDER BY id1, id2""".stripMargin)),

    // ── SimHash: 16-bit token-vote fingerprint, cluster by fingerprint ──
    // One md5 per token; bit i of the fingerprint = sign of the sum of
    // (2*bit_i(token_hash) - 1) votes.
    Q("q_dedup_simhash",
      (s, dir) => {
        val fp = (0 until 16).map { i =>
          s"(CASE WHEN aggregate(ht, 0, (acc, h) -> acc + " +
            s"(CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END)) > 0 " +
            s"THEN '1' ELSE '0' END)"
        }.mkString("concat(", ", ", ")")
        docs(s, dir)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("ht", expr(graft.functions.TokenHash.spark("ws")))
          .withColumn("fp", expr(fp))
          .groupBy(col("fp"))
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
          .filter(col("n_docs") > 1)
          .orderBy("fp")
      },
      Some {
        val fp = (0 until 16).map { i =>
          s"(CASE WHEN list_sum(list_transform(ht, h -> " +
            s"CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
            s"THEN '1' ELSE '0' END)"
        }.mkString(" || ")
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |ht AS (SELECT doc_id, ${graft.functions.TokenHash.duck("ws")} AS ht FROM t),
           |f AS (SELECT doc_id, $fp AS fp FROM ht)
           |SELECT fp, count(*) AS n_docs, min(doc_id) AS keep_id
           |FROM f GROUP BY fp HAVING count(*) > 1 ORDER BY fp""".stripMargin
      }),

    // ── near-dup cluster resolution: the dedup pipeline's last stage ──
    // verified pairs → connected components → keep the min-id doc per
    // cluster. Spark: fixpoint min-label propagation (componentsOf,
    // hopsPerRound = 1: the 0.8-Jaccard text pair graph is near-clique
    // clusters where the first hop reaches the fixpoint — a second hop
    // per round measured pure stage-latency overhead here, 2.9 → 4.2 s
    // at sf0.1); oracle: recursive-CTE transitive closure — both
    // compute the exact component minimum, so the hash check covers
    // the full pipeline candidates → verification → clustering → keep
    // decision.
    // Rides the persisted band index like the batch curation funnel
    // (round-10) — the verify stage reads the artifact's shingle
    // table, never re-shingling the corpus in-query.
    Q("q_dedup_resolve",
      (s, dir) => {
        val comp = componentsOf(
          verifiedPairsFromIndex(s, fullBandIndex(s, dir), 0.8),
          hopsPerRound = 1)
        docs(s, dir).select(col("doc_id"))
          .join(comp.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
          .withColumn("keep_id", coalesce(col("lbl"), col("doc_id")))
          .withColumn("is_kept", col("keep_id") === col("doc_id"))
          .select("doc_id", "keep_id", "is_kept")
          .orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE $duckHashedShingles,
           |$duckBandCandidates,
           |${duckVerifiedPairs(0.8)},
           |${duckClosure("vp")}
           |SELECT d.doc_id,
           |  coalesce(c.lbl, d.doc_id) AS keep_id,
           |  coalesce(c.lbl, d.doc_id) = d.doc_id AS is_kept
           |FROM documents d LEFT JOIN comp c ON c.n = d.doc_id
           |ORDER BY doc_id""".stripMargin)),

    // ── n-gram Jaccard: exact set-similarity verification over the ──
    // MinHash band candidates. Candidate volume therefore tracks
    // near-dup density (band collisions), not corpus size — the old
    // (lang, n_chars div 100) blocking key had bounded cardinality, so
    // its blocks grew linearly with the corpus and the pair join went
    // quadratic at scale. Intersection runs on the int shingle hashes
    // via the codegen'd merge walk over the persisted shingle table.
    // Rides the persisted band index (round-10, same amortization as
    // q_dedup_resolve — identical relation, md5 pass paid once).
    Q("q_dedup_ngram",
      (s, dir) =>
        verifiedPairsFromIndex(s, fullBandIndex(s, dir), 0.8)
          .orderBy("id1", "id2"),
      Some(
        s"""WITH $duckHashedShingles,
           |$duckBandCandidates,
           |p AS (SELECT id1, id2,
           |  len(list_filter(a.hs, x -> list_contains(b.hs, x))) AS inter,
           |  len(a.hs) AS la, len(b.hs) AS lb
           |  FROM cand JOIN h a ON a.doc_id = cand.id1
           |            JOIN h b ON b.doc_id = cand.id2)
           |SELECT id1, id2, CAST(inter AS DOUBLE) / (la + lb - inter) AS jac
           |FROM p WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.8
           |ORDER BY id1, id2""".stripMargin)),

    // ── incremental exact dedup: new batch anti-joined against corpus ──
    // The daily-pipeline shape the whole-corpus self-join families
    // don't cover: an increment (doc_id % 10 = 7 as the deterministic
    // stand-in for "today's batch") is content-hash anti-joined against
    // the accumulated corpus, then deduped within itself. At scale the
    // corpus side is a persisted hash table bucketed by h, so the
    // anti-join shuffles only the increment. NOT EXISTS (not NOT IN) in
    // the oracle: a NULL hash must survive the anti-join in both
    // engines.
    Q("q_dedup_incremental",
      (s, dir) => {
        val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
        val inc = d.filter(col("doc_id") % 10 === 7)
        val corp = d.filter(col("doc_id") % 10 =!= 7)
        inc.join(corp.select("h"), Seq("h"), "left_anti")
          .groupBy("h")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy(col("h").asc_nulls_last)
      },
      Some(duckIncrementalExact)),

    // ── incremental exact dedup against the PERSISTED bucketed corpus ──
    // The [[hashCorpusTable]] variant: the corpus content-hash relation
    // is a catalog table bucketed by h, so the anti-join reads
    // co-located corpus buckets with NO exchange and shuffles only the
    // increment — closing the gap the in-query variant documents (its
    // unbucketed corpus side sort-merges BOTH sides). Identical
    // relation, shared oracle; IncrementalBucketedSpec pins the
    // exchange-free corpus branch.
    Q("q_dedup_incremental_bkt",
      (s, dir) => {
        val corp = s.table(hashCorpusTable(s, dir))
        docs(s, dir).select(col("doc_id"), md5(col("text")).as("h"))
          .filter(col("doc_id") % 10 === 7)
          .join(corp.select("h"), Seq("h"), "left_anti")
          .groupBy("h")
          .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_cnt"))
          .orderBy(col("h").asc_nulls_last)
      },
      Some(duckIncrementalExact)),

    // ── incremental near-dup: increment probed against corpus buckets ──
    // (see [[incrementalNearDups]] for the scale contract). Output: each
    // increment doc with every verified corpus near-duplicate — the
    // relation a pipeline uses to drop or link incoming docs.
    Q("q_dedup_incremental_near",
      (s, dir) => {
        val d = docs(s, dir)
        incrementalNearDups(
          d.filter(col("doc_id") % 10 === 7),
          d.filter(col("doc_id") % 10 =!= 7), 0.8)
          .orderBy("doc_id", "dup_of")
      },
      Some(duckIncrementalNear)),

    // ── incremental near-dup against the PERSISTED index: the probe a ──
    // production pipeline actually runs daily. The corpus band-bucket
    // and shingle tables are prebuilt Scratch artifacts (built once per
    // (JVM, corpus), the local stand-in for the durable-store artifact
    // a deployment writes per corpus version); the query shingles ONLY
    // the increment and probes. Identical relation to
    // q_dedup_incremental_near — the index is deterministic — so the
    // oracle is shared; BandIndexSpec separately pins that the probe
    // plan's corpus-side scans hit the index, not `documents`.
    Q("q_dedup_incremental_idx",
      (s, dir) =>
        incrementalNearDupsAgainst(
          docs(s, dir).filter(col("doc_id") % 10 === 7),
          corpusBandIndex(s, dir), 0.8)
          .orderBy("doc_id", "dup_of"),
      Some(duckIncrementalNear)),

    // ── benchmark-contamination check: the pre-training audit every ──
    // LLM pipeline owes its eval suite. A held-out benchmark set
    // (doc_id % 97 = 0 as the deterministic stand-in) is matched
    // against the corpus by SHARED SHINGLE COUNT via an inverted
    // index: explode each side's shingle-hash set, equi-join on the
    // hash, count matches per (doc, bench) pair, threshold (>= 2 shared
    // 3-gram shingles here - tuned to the synthetic corpus; a real
    // deployment raises the n-gram order and the bar together). The
    // corpus side stays linear (one exploded row per shingle) and the
    // join key is the shingle hash — never an all-pairs doc×bench
    // comparison, so a 100 TB corpus × 10k-doc benchmark runs as one
    // broadcast-friendly equi-join. hs is distinct per doc, so the
    // count IS the exact intersection size.
    Q("q_contamination",
      (s, dir) => {
        val sh = hashedShingles(s, dir).select(col("doc_id"), col("hs"))
          .localCheckpoint(true)
        val ex = sh.filter(col("doc_id") % 97 =!= 0)
          .select(col("doc_id"), explode(col("hs")).as("h"))
        val bx = sh.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("bench_id"), explode(col("hs")).as("h"))
        ex.join(broadcast(bx), "h")
          .groupBy("doc_id", "bench_id")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy("doc_id", "bench_id")
      },
      Some(
        s"""WITH $duckHashedShingles,
           |ex AS (SELECT doc_id, unnest(hs) AS sh FROM h WHERE doc_id % 97 <> 0),
           |bx AS (SELECT doc_id AS bench_id, unnest(hs) AS sh FROM h
           |       WHERE doc_id % 97 = 0),
           |m AS (SELECT doc_id, bench_id, count(*) AS n_shared
           |      FROM ex JOIN bx USING (sh) GROUP BY doc_id, bench_id)
           |SELECT doc_id, bench_id, n_shared FROM m WHERE n_shared >= 2
           |ORDER BY doc_id, bench_id""".stripMargin)),

    // ── cross-document duplicate-span scoring: per doc, the fraction ──
    // of its distinct 5-grams that occur in at least one OTHER
    // document — the 5-gram-granular form of exact-substring dedup
    // (Lee et al. 2021's suffix-array pass): docs built from shared
    // boilerplate or near-copies score high even when no single pair
    // crosses a near-dup threshold. Shape is the contamination inverted
    // index generalized to all-docs: explode each doc's DISTINCT gram
    // set (one row per doc-gram — linear in corpus tokens), one keyed
    // aggregate for document frequency, one equi-join back — never a
    // doc×doc comparison, so the 100 TB cost is two shuffles on the
    // gram hash. df >= 2 means "this doc plus at least one other"
    // because the per-doc sets are distinct.
    Q("q_dedup_substring",
      (s, dir) => {
        val grams = docs(s, dir)
          .withColumn("hw",
            expr(graft.functions.TokenHash.spark("split(text, ' ')")))
          .filter(expr("size(hw)") >= 5)
          .select(col("doc_id"), explode(expr(
            s"array_distinct(${graft.functions.NgramHash.spark("hw")})"))
            .as("gh"))
          .localCheckpoint(true) // shared by the df agg AND the join-back
        val dfreq = grams.groupBy("gh")
          .agg(count(lit(1)).as("df"))
        grams.join(dfreq, "gh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
          .withColumn("dup_frac",
            col("n_shared").cast("double") / col("n_grams"))
          .orderBy("doc_id")
      },
      Some {
        val hw = graft.functions.TokenHash.duck("string_split(text, ' ')")
        val ng = graft.functions.NgramHash.duck("hw")
        s"""WITH t AS (SELECT doc_id, $hw AS hw FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct($ng)) AS gh
           |      FROM t WHERE len(hw) >= 5),
           |dfreq AS (SELECT gh, count(*) AS df FROM g GROUP BY gh),
           |m AS (SELECT doc_id,
           |        CAST(count(*) AS BIGINT) AS n_grams,
           |        CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           |          AS n_shared
           |      FROM g JOIN dfreq USING (gh) GROUP BY doc_id)
           |SELECT doc_id, n_grams, n_shared,
           |  CAST(n_shared AS DOUBLE) / n_grams AS dup_frac
           |FROM m ORDER BY doc_id""".stripMargin
      }),

    // ── entity resolution: fuzzy pairs → components → canonical row ──
    // Record linkage ACROSS sources as the full three-stage pipeline:
    // (1) candidate pairs by blocked edit distance (the q_fuzzy_join
    // discipline — block on a cheap key, levenshtein only inside
    // blocks, never the cross product) over a UNIFIED id space
    // (customers as-is, suppliers offset by 10^12 — disjoint by
    // construction at ANY reachable TPC-H scale: custkeys are
    // 150k x sf, so a 10^6 offset would collide at sf >= 7 and weld
    // unrelated customer/supplier rows into one entity); (2) transitive
    // clustering with [[componentsOf]] (a fuzzy match is not
    // transitive — A~B and B~C links A and C into one entity even if
    // lev(A,C) = 2, exactly what the closure expresses and a plain
    // pair list does not); (3) canonical election: the min-id member
    // (the component label) wins, and every row reports its cluster
    // and size. The block is the 8-digit prefix of the 9-digit name
    // suffix: these ids are DENSE and sequential, so any wider
    // edit-distance ball chains block-to-block until the closure
    // swallows the table (measured: a 6-digit block collapses 1,600
    // records into 2 "entities") — real-name typos are sparse where
    // synthetic ids are not, and the tight block is what keeps
    // cluster size bounded (≤ 11 here) while the lev verify still
    // guards the match contract. Scale shape: blocks are the shuffle
    // key, the pair graph is match-sized, the CC rounds are
    // edge-keyed shuffles — the tables themselves never cross-join.
    Q("q_entity_resolve",
      (s, dir) => {
        def src(table: String, key: String, name: String, off: Long) =
          Tables(s, dir, table).select(
            (col(key).cast("long") + lit(off)).as("eid"),
            lit(if (off == 0L) "c" else "s").as("src"),
            expr(s"substring($name, 10)").as("sfx"),
            expr(s"substring($name, 10, 8)").as("blk"))
        val e = src("customer", "c_custkey", "c_name", 0L)
          .unionByName(src("supplier", "s_suppkey", "s_name", EntityOffset))
          .localCheckpoint(true) // referenced by both join sides + output
        val pairs = e.select(col("eid").as("id1"), col("sfx").as("sfx1"),
            col("blk"))
          .join(e.select(col("eid").as("id2"), col("sfx").as("sfx2"),
            col("blk")), "blk")
          .filter(col("id1") < col("id2") &&
            levenshtein(col("sfx1"), col("sfx2")) <= 1)
          .select("id1", "id2")
        val comp = componentsOf(pairs, hopsPerRound = 1)
        val byCluster = Window.partitionBy(col("cluster_id"))
        e.join(comp.withColumnRenamed("n", "eid"), Seq("eid"), "left")
          .withColumn("cluster_id", coalesce(col("lbl"), col("eid")))
          .withColumn("is_canonical", col("cluster_id") === col("eid"))
          .withColumn("n_members", count(lit(1)).over(byCluster))
          .select("eid", "src", "cluster_id", "is_canonical", "n_members")
          .orderBy("eid")
      },
      Some(s"""WITH RECURSIVE e AS (
             |  SELECT CAST(c_custkey AS BIGINT) AS eid, 'c' AS src,
             |    substring(c_name, 10) AS sfx, substring(c_name, 10, 8) AS blk
             |  FROM customer
             |  UNION ALL
             |  SELECT CAST(s_suppkey + $EntityOffset AS BIGINT), 's',
             |    substring(s_name, 10), substring(s_name, 10, 8)
             |  FROM supplier),
             |p AS (SELECT a.eid AS id1, b.eid AS id2
             |      FROM e a JOIN e b ON a.blk = b.blk AND a.eid < b.eid
             |      WHERE levenshtein(a.sfx, b.sfx) <= 1),
             |${duckClosure("p")}
             |SELECT e.eid, e.src, coalesce(c.lbl, e.eid) AS cluster_id,
             |  coalesce(c.lbl, e.eid) = e.eid AS is_canonical,
             |  CAST(count(*) OVER (PARTITION BY coalesce(c.lbl, e.eid))
             |    AS BIGINT) AS n_members
             |FROM e LEFT JOIN comp c ON c.n = e.eid
             |ORDER BY e.eid""".stripMargin))
  )
}
