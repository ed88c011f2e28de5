package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import graft.queries.Q

/** Training-data curation pipeline operators: JSON property
  * extraction, PII scrubbing (redaction + pseudonymization), and the
  * end-to-end document curation query combining quality scoring,
  * language gating, and exact-dedup canonicalization — the composite
  * every LLM data pipeline runs before tokenization. All per-row or
  * single-window — no extra shuffles beyond the dedup partition.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Layout tag for [[binSrcArtifact]] — the one Scratch artifact
    * whose payload is raw files (WAV assets) rather than parquet, so
    * [[graft.engine.Scratch.schemaKey]] can't fingerprint it
    * automatically. The tag spells out every construction decision a
    * reader depends on (selection predicate, filename contract, RIFF
    * parameters, sample synthesis); editing the builder REQUIRES
    * bumping it, which re-keys the artifact exactly like a schema
    * fingerprint would — the same stale-durable-root hazard
    * `writeDeclared` closes for parquet artifacts. Pinned by
    * BinSrcLayoutSpec. */
  private[graft] val BinSrcLayout =
    "wav_v1 file=<doc_id>.wav sel=doc_id%50==0 rate=8000+(id%3)*4000 " +
      "ch=1 samp=le16((utf8&0xff)*64)"

  /** Build-once directory of real WAV files rendered from the 2%
    * probe documents via the distributed Hadoop FS API (never a
    * driver loop) — the multimodal landing layout q_source_binaryfile
    * scans through Spark's binaryFile source. `layout` parameterized
    * for the spec only; production call sites use the default. */
  private[graft] def binSrcArtifact(s: SparkSession, dir: String,
      layout: String = BinSrcLayout): String =
    graft.engine.Scratch.cached("bin_src", s"$dir layout=$layout") { p =>
      val conf = new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration)
      import s.implicits._
      t(s, dir, "documents").filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .foreachPartition { (it: Iterator[(Long, String)]) =>
          val fs = org.apache.hadoop.fs.FileSystem
            .get(new java.net.URI(p), conf.value)
          it.foreach { case (id, text) =>
            val rate = 8000 + (id % 3).toInt * 4000
            val samples = text.getBytes("UTF-8")
              .map(b => ((b & 0xff) * 64).toShort)
            val bytes = MediaDecoder.wavBytes(rate, 1, samples)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(s"$p/$id.wav"), true)
            // exception-safe: a mid-write failure (disk full, task
            // kill) must not leak the stream handle into the retry
            try out.write(bytes) finally out.close()
          }
        }
    }

  /** Last-event-wins per-user profile snapshot over an event slice —
    * ONE definition (with [[duckUserProfile]] as its oracle twin)
    * consumed by q_merge_upsert AND q_table_diff, so the two can never
    * drift on what a "profile" is (they previously carried verbatim
    * copies; the curationScored/duckCurationScoredFrom pattern). */
  private def userProfileOf(part: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    part
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("n"))
  }

  /** DuckDB twin of [[userProfileOf]]: a parenthesized subquery over
    * `events` with the given (possibly empty) `WHERE …` suffix. */
  private def duckUserProfile(pred: String): String =
    s"""(SELECT user_id, ts AS last_ts, event_type AS last_type, n
       |  FROM (SELECT user_id, ts, event_type,
       |          row_number() OVER (PARTITION BY user_id
       |            ORDER BY ts DESC, event_id DESC) AS rn,
       |          CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
       |        FROM events$pred)
       |  WHERE rn = 1)""".stripMargin

  /** q_pack_sequences body, parameterized on the per-document token
    * counter (whitespace vs VocabTok) with [[duckPackSequences]] as
    * the oracle twin — the base query and its _tok variant share ONE
    * definition of the packing arithmetic, so a budget/chunk-formula
    * change can never drift between them. */
  private def packSequences(s: SparkSession, dir: String,
      tokens: Column, wide: Boolean = false): DataFrame = {
    val budget = 2048
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    // `wide = true` for the VocabTok variant only: the greedy-vocab
    // regex count is the one token counter whose per-row cost dwarfs
    // the fan-out exchange (q_pack_sequences_tok 1.22 → 0.73 s at
    // sf0.1/32; the whitespace variant measured SLOWER fanned —
    // OPTIMIZATION_r17.md has the A/B)
    (if (wide) graft.engine.Tables.wide(s, dir, "documents")
     else t(s, dir, "documents"))
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(32)).as("bucket"),
        tokens.cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk_id",
        floor((col("cum") - col("n_tokens")) / lit(budget)))
      .select("doc_id", "bucket", "chunk_id", "n_tokens")
      .orderBy("doc_id")
  }

  private def duckPackSequences(tokensSql: String): String =
    s"""WITH d AS (SELECT doc_id, doc_id % 32 AS bucket,
       |  $tokensSql AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, bucket, n_tokens,
       |  sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id)
       |    AS cum FROM d)
       |SELECT doc_id, bucket,
       |CAST((cum - n_tokens) // 2048 AS BIGINT) AS chunk_id,
       |n_tokens FROM c ORDER BY doc_id""".stripMargin

  /** q_mix_weights body, parameterized the same way: ONE definition of
    * the fixed-point temperature weighting (floor(√n·10⁶) in
    * DECIMAL(28,0), exact integer total) for the whitespace and
    * tokenizer-faithful variants. */
  private def mixWeights(s: SparkSession, dir: String,
      tokens: Column, wide: Boolean = false): DataFrame = {
    // same wide-only-for-VocabTok rationale as [[packSequences]]
    // (q_mix_weights_tok 1.06 → 0.63 s; whitespace variant slower
    // fanned)
    val toks = (if (wide) graft.engine.Tables.wide(s, dir, "documents")
                else t(s, dir, "documents"))
      .withColumn("n_tok", tokens.cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("w",
        floor(sqrt(col("n_tokens").cast("double")) * lit(1e6))
          .cast(DecimalType(28, 0)))
    toks
      .withColumn("w_total", sum(col("w")).over(Window.partitionBy()))
      .withColumn("share",
        col("w").cast("double") / col("w_total").cast("double"))
      .select(col("source"), col("n_tokens"), col("share"))
      .orderBy("source")
  }

  private def duckMixWeights(tokensSql: String): String =
    s"""WITH toks AS (
       |  SELECT source,
       |    CAST(SUM($tokensSql) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, n_tokens,
       |  CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS DECIMAL(28,0)) AS w
       |  FROM toks)
       |SELECT source, n_tokens,
       |  CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share
       |FROM w
       |ORDER BY source""".stripMargin

  /** THE curation scoring: quality (length gate + stopword ratio) and
    * exact-dedup canonical bit per document. One definition consumed by
    * q_curation and the end-to-end funnel (q_pipeline_e2e) so the two
    * can never drift; same contract for the DuckDB twins below. */
  private def curationScored(docsDf: DataFrame): DataFrame = {
    val sw = TextAnalysis.stopwords.map("'" + _ + "'").mkString(",")
    val byContent = Window.partitionBy(md5(col("text")))
    docsDf
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", expr("size(ws)").cast("long"))
      .withColumn("stop_ratio",
        expr(s"size(filter(ws, w -> w IN ($sw)))").cast("double") / col("n_words"))
      .withColumn("quality",
        expr("CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END") +
          col("stop_ratio") * 2.0)
      .withColumn("canonical",
        (col("doc_id") === min(col("doc_id")).over(byContent)).cast("int"))
  }

  /** DuckDB twin of [[curationScored]] over an arbitrary
    * documents-shaped source relation: CTEs ct/cm/cq ending with
    * (doc_id, lang, n_chars, text, n_words, stop_ratio, quality,
    * canonical). Parameterized on the source so the batch funnel
    * (whole corpus) and the incremental funnel (dated increment —
    * canonical is then WITHIN the batch, exactly like the Spark side's
    * window over the filtered frame) replay the same scoring. */
  private def duckCurationScoredFrom(src: String): String = {
    val sw = TextAnalysis.stopwords.map("'" + _ + "'").mkString(",")
    s"""ct AS (SELECT doc_id, lang, n_chars, text, string_split(text, ' ') AS ws
       |       FROM $src),
       |cm AS (SELECT doc_id, lang, n_chars, text,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(len(list_filter(ws, w -> w IN ($sw))) AS DOUBLE) / len(ws)
       |    AS stop_ratio FROM ct),
       |cq AS (SELECT doc_id, lang, n_chars, text, n_words, stop_ratio,
       |  (CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END + stop_ratio * 2.0)
       |    AS quality,
       |  CAST(doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS INT)
       |    AS canonical FROM cm)""".stripMargin
  }

  private val duckCurationScored: String = duckCurationScoredFrom("documents")

  val queries: Seq[Q] = Seq(

    // ── deterministic hash sampling: the reproducible alternative to ──
    // rand(). Keyed on md5(pk), so the SAME rows are sampled on every
    // run, every engine, every cluster size — a rand() sample is
    // neither (and breaks any oracle). Stratification is free: the
    // modulus partitions the keyspace uniformly, and the sampled set
    // is stable under corpus growth (new rows hash independently).
    Q("q_sample_hash",
      (s, dir) =>
        t(s, dir, "documents")
          .filter(expr(graft.functions.HashSample.spark("doc_id", 10)))
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang, n_chars FROM documents
             |WHERE ${graft.functions.HashSample.duck("doc_id", 10)}
             |ORDER BY doc_id""".stripMargin)),

    // ── data profiling: per-column completeness / cardinality / range ──
    // The quality gate a pipeline runs before training: ONE aggregate
    // over the table computes every measure for every profiled column
    // (single scan, all partial-aggregate), then `stack` pivots the
    // wide row into one row per column so downstream constraint checks
    // (null-rate <= x, cardinality >= y) are plain filters. min/max
    // aggregate in the column's NATIVE type and cast after — a string
    // min/max would report n_chars ∈ ['100', '99'].
    Q("q_dq_profile",
      (s, dir) => {
        val cols = Seq("lang", "n_chars", "source")
        val measures = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_null"),
            count_distinct(col(c)).as(s"${c}_distinct"),
            min(col(c)).cast("string").as(s"${c}_min"),
            max(col(c)).cast("string").as(s"${c}_max"))
        }
        val stackArgs = cols.map(c =>
          s"'$c', n_rows, ${c}_null, ${c}_distinct, ${c}_min, ${c}_max").mkString(", ")
        t(s, dir, "documents")
          .agg(measures.head, measures.tail: _*)
          .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
            "(column_name, n_rows, n_null, n_distinct, min_str, max_str)")
          .orderBy("column_name")
      },
      Some("""SELECT column_name, n_rows, n_null, n_distinct, min_str, max_str FROM (
             |  SELECT 'lang' AS column_name, count(*) AS n_rows,
             |    CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |    count(DISTINCT lang) AS n_distinct,
             |    CAST(min(lang) AS VARCHAR) AS min_str, CAST(max(lang) AS VARCHAR) AS max_str
             |  FROM documents
             |  UNION ALL
             |  SELECT 'n_chars', count(*),
             |    CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    count(DISTINCT n_chars),
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
             |  FROM documents
             |  UNION ALL
             |  SELECT 'source', count(*),
             |    CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    count(DISTINCT source),
             |    CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
             |  FROM documents)
             |ORDER BY column_name""".stripMargin)),

    // ── JSON property extraction from event payloads ──
    // from_json with an explicit schema, not get_json_object: the
    // path-based extractor re-parses per call (~100µs/row measured);
    // the schema'd parse is one pass and plans into codegen.
    Q("q_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            from_json(col("props"), "k BIGINT", Map.empty[String, String])
              .getField("k").as("k"),
            col("event_type"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |event_type
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── PII scrub: redact numerics, pseudonymize the user key ──
    Q("q_pii_redact",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
            md5(col("user_id").cast("string")).as("pseudo_uid"))
          .orderBy("event_id"),
      Some("""SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
             |md5(CAST(user_id AS VARCHAR)) AS pseudo_uid
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── the curation composite: dedup-canonical + quality + lang gate ──
    Q("q_curation",
      (s, dir) =>
        curationScored(t(s, dir, "documents"))
          .withColumn("kept",
            (col("canonical") === 1 && col("quality") >= 0.7 &&
              col("lang").isin("en", "de", "es", "fr", "zh")).cast("int"))
          .select("doc_id", "n_words", "stop_ratio", "quality", "canonical", "kept")
          .orderBy("doc_id"),
      Some(
        s"""WITH $duckCurationScored
           |SELECT doc_id, n_words, stop_ratio, quality, canonical,
           |CAST(canonical = 1 AND quality >= 0.7
           |     AND lang IN ('en','de','es','fr','zh') AS INT) AS kept
           |FROM cq ORDER BY doc_id""".stripMargin)),

    // ── relative-threshold quality gate: keep the corpus's top ──
    // quartile. Absolute thresholds (q_curation's 0.7) drift as the
    // corpus mix shifts; real curation gates on the DISTRIBUTION —
    // "keep the best 25%" stays meaningful across crawls. Two passes:
    // the exact p75 collapses to ONE driver scalar (the q_tfidf
    // bounded-fetch idiom — a 1-row crossJoin would plan the banned
    // BroadcastNestedLoopJoin), then a map-only filter against it.
    // Scale shape (round-17 group-array sweep): the built-in exact
    // `percentile` buffers every distinct quality value of the WHOLE
    // corpus in one unspillable aggregation map — quality is a
    // continuous ratio, so that is corpus-scaled. The p75 now comes
    // from GridRank.percentileCont: quality ∈ [0, 2.5] by
    // construction (0 or 0.5 plus 2·stop_ratio), so the 1e-6
    // fixed-point grid bounds the bucket table at ≤2.5e6+1 rows
    // regardless of corpus, and the interpolation replays Spark's
    // formula bit-for-bit (PercentileContSpec). Same interpolation on
    // both engines (percentile ↔ quantile_cont over identical doubles
    // — the q_percentile parity), so the boundary compare is exact.
    Q("q_quality_gate_rel",
      (s, dir) => {
        val scored = curationScored(t(s, dir, "documents"))
        // scored is deliberately NOT checkpointed (round-17 review):
        // it is DOCUMENT-grain, so the histogram pass, the target-
        // bucket pass, and the final filter re-evaluate the scoring
        // projection per scan — CPU paid ~3x, but each scan prunes
        // columns and a corpus materialization (with text) would
        // dwarf it at 100 TB
        val p75 = graft.engine.GridRank.percentileCont(scored,
            col("quality"), v => floor(v * 1000000).cast("long"),
            Seq(0.75 -> "p75"))
          .head().getDouble(0)
        scored.filter(col("quality") >= p75)
          .select(col("doc_id"), col("lang"), col("quality"))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH $duckCurationScored,
           |thr AS (SELECT quantile_cont(quality, 0.75) AS p75 FROM cq)
           |SELECT doc_id, lang, quality FROM cq, thr
           |WHERE quality >= thr.p75 ORDER BY doc_id""".stripMargin)),

    // ── sequence packing: assign docs to fixed token-budget chunks ──
    // The pre-tokenization packing pass every training pipeline runs:
    // documents fill 2048-token chunks contiguously (chunk = floor of
    // the running token count BEFORE the doc / budget). Global packing
    // is inherently sequential, so it parallelizes by id-mod bucket —
    // each bucket packs independently under one keyed window (shuffle
    // on bucket, sort by doc_id within), trading ≤1 partial chunk per
    // bucket for full parallelism. The bucket count is the parallelism
    // knob: size it so corpus/buckets fits one executor's window sort
    // (at 100 TB that means ~10⁵ buckets, not 32) — it is a LITERAL
    // here only because the DuckDB oracle is a static SQL string.
    Q("q_pack_sequences",
      (s, dir) => packSequences(s, dir, size(split(col("text"), " "))),
      Some(duckPackSequences("CAST(len(string_split(text, ' ')) AS BIGINT)"))),

    // ── sequence packing under TOKENIZER budgets: q_pack_sequences ──
    // with the whitespace counter swapped for the VocabTok greedy
    // longest-match count. The budget scales with the honest token
    // count (a CJK doc's real cost, ~3.3× the whitespace count even on
    // this Latin fixture), so chunks stop overflowing at train time.
    // Same bucket-parallel window shape; the tokenizer is cross-engine
    // exact, so the oracle is full-fidelity.
    Q("q_pack_sequences_tok",
      (s, dir) => packSequences(s, dir, regexp_count(col("text"),
        lit(graft.functions.VocabTok.sparkPattern)), wide = true),
      Some(duckPackSequences(graft.functions.VocabTok.duck("text")))),

    // ── deterministic stratified train/val/test split ──
    // The assignment every training pipeline needs BEFORE any of the
    // sampling above matters: each doc lands in a split by its md5
    // hash bucket (90/5/5 here) — reproducible on any engine and any
    // cluster size, stable under corpus growth (new docs hash
    // independently, existing assignments never churn — re-assigning
    // history is how eval sets leak into training), and stratification
    // comes free because a uniform hash is uniform within every
    // language stratum. Per-row relation (no shuffle at all before the
    // presentation sort); the per-split per-lang counts a pipeline
    // monitors are one aggregate away.
    Q("q_split_assign",
      (s, dir) => {
        val bucket = graft.functions.HashSample.sparkBucket("doc_id", 100)
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            expr(bucket).as("bucket"),
            expr(s"CASE WHEN $bucket < 90 THEN 'train' " +
              s"WHEN $bucket < 95 THEN 'val' ELSE 'test' END").as("split"))
          .orderBy("doc_id")
      },
      Some {
        val bucket = graft.functions.HashSample.duckBucket("doc_id", 100)
        s"""SELECT doc_id, lang, $bucket AS bucket,
           |CASE WHEN $bucket < 90 THEN 'train'
           |     WHEN $bucket < 95 THEN 'val' ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin
      }),

    // ── deterministic training-data shuffle: hash order + shards ──
    // The "shuffle the corpus before training" step, reproducibly:
    // each doc's md5-prefix hash (the engine's shared idiom) is its
    // sort key, shard = hash % 16, position = rank within the shard
    // by (hash, doc_id). Same order on any engine, any cluster size,
    // any run — and adding documents never reorders existing pairs
    // beyond their insertion points (hashes don't churn). 100 TB
    // shape: the window partitions BY SHARD (never a global
    // single-partition window) — each shard's rank is independent, so
    // the op scales with shard count; a trainer reads shard files in
    // (shard, pos) order.
    Q("q_shard_shuffle",
      (s, dir) => {
        val h = graft.functions.HashSample.sparkRaw("doc_id")
        t(s, dir, "documents")
          .select(col("doc_id"), expr(h).as("h"))
          .withColumn("shard", col("h") % 16)
          .withColumn("pos", row_number().over(
            Window.partitionBy(col("shard"))
              .orderBy(col("h"), col("doc_id"))).cast("bigint"))
          .select("doc_id", "h", "shard", "pos")
          .orderBy("doc_id")
      },
      Some {
        val h = graft.functions.HashSample.duckRaw("doc_id")
        s"""WITH d AS (SELECT doc_id, $h AS h FROM documents)
           |SELECT doc_id, h, h % 16 AS shard,
           |  CAST(row_number() OVER (PARTITION BY h % 16
           |    ORDER BY h, doc_id) AS BIGINT) AS pos
           |FROM d ORDER BY doc_id""".stripMargin
      }),

    // ── partition-pruned layout: write-partitioned-by-lang, pruned read ──
    // The storage-layout half of the 100 TB story: a corpus laid out
    // `partitionBy(lang)` turns a language filter into directory
    // pruning — the scan never opens non-matching partitions (the plan
    // shows the IN-list under PartitionFilters, asserted in
    // PartitionPruningSpec). The query materializes the derivative
    // layout to scratch (the once-per-corpus build step a deployment
    // persists), then runs the pruned aggregate over it.
    Q("q_partition_pruned",
      (s, dir) => {
        // The lang-partitioned derivative is deterministic in its
        // input, so it is a once-per-(JVM, input dir) Scratch artifact:
        // the first invocation's build IS the operator's layout stage
        // (a deployment persists exactly this artifact); a 3-pass bench
        // pays the corpus write once and passes 2+ run only the pruned
        // scan.
        val frame = t(s, dir, "documents")
        val scratch = graft.engine.Scratch.cached("part_docs",
          s"$dir schema=${graft.engine.Scratch.schemaKey(frame.schema)} " +
            "partitionBy=lang") { path =>
          frame.write.mode("overwrite").partitionBy("lang").parquet(path)
        }
        s.read.parquet(scratch)
          .filter(col("lang").isin("en", "de"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("doc_id")).as("n_ids"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |count(DISTINCT doc_id) AS n_ids
             |FROM documents WHERE lang IN ('en', 'de')
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── co-bucketed fact-fact join: the zero-exchange layout ──
    // orders ⋈ lineitem on orderkey over tables PERSISTED bucketBy the
    // join key ([[graft.engine.Bucketing]], built once per JVM+corpus):
    // the join AND the per-order aggregate run without a single hash
    // exchange — the bucket layout is the shuffle, paid at write time
    // (BucketedQuerySpec pins the exchange-free plan with broadcast
    // disabled; only the final presentation sort range-partitions).
    // Grouping is on the STREAMED side's key (l_orderkey) so the plan
    // stays exchange-free under both join strategies. At 100 TB this
    // layout is the difference between reshuffling two fact tables
    // every query and reading co-located buckets.
    Q("q_join_bucketed",
      (s, dir) => {
        val (tOrders, tLines) = graft.engine.Bucketing.tpchTables(s, dir)
        s.table(tOrders).join(s.table(tLines),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
              .as("sum_qty"),
            min(col("o_totalprice")).as("total_price"))
          .select(col("l_orderkey").as("orderkey"),
            col("n_items"), col("sum_qty"), col("total_price"))
          .orderBy("orderkey")
      },
      Some("""SELECT l_orderkey AS orderkey, count(*) AS n_items,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |min(o_totalprice) AS total_price
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY l_orderkey ORDER BY orderkey""".stripMargin)),

    // ── sorted compaction as a declared operator: compact + cluster, ──
    // then range-scan the skip-friendly layout. The corpus is rewritten
    // once per (JVM, dir) through Layout.compact(sortBy = n_chars) —
    // range-partitioned files, sorted within, so every file/row-group
    // covers a narrow n_chars band and the range filter below prunes
    // at the parquet-footer level (CompactionSpec measures the
    // scan-row reduction; this query pins the end-to-end result). The
    // round-robin compact variant would serve the same rows but scan
    // everything.
    Q("q_compact_sorted",
      (s, dir) => {
        val compacted = graft.engine.Scratch.cached("compact_sorted",
          s"$dir schema=${graft.engine.Scratch.schemaKey(
            t(s, dir, "documents").schema)} target=4m sort=n_chars") { p =>
          graft.engine.Layout.compact(s, s"$dir/documents.parquet", p,
            targetBytes = 4L * 1024 * 1024, sortBy = Seq("n_chars"))
        }
        s.read.parquet(compacted)
          .filter(col("n_chars") >= 500 && col("n_chars") < 900)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents WHERE n_chars >= 500 AND n_chars < 900
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── CSV source: schema'd line-split ingestion round-trip ──
    // The reference's SDFS stores plain text files; the engine's
    // non-parquet ingest surface is the same schema-EXPLICIT read
    // (no inference pass — inference is a full extra scan at 100 TB).
    // CSV splits per line so the scan parallelizes like any file
    // source, but carries no column pruning or predicate pushdown —
    // an INGEST format: the first pipeline step converts it to
    // parquet (q_compact_sorted / Bucketing are that step's layouts).
    // The aggregate proves every column and row survived the trip.
    Q("q_source_csv",
      (s, dir) => {
        val csv = graft.engine.Scratch.cached("csv_src",
          s"$dir schema=${graft.engine.Scratch.schemaKey(
            t(s, dir, "documents").schema)} format=csv") { p =>
          // splittable-CSV ingest contract: records are LINES, so the
          // writer flattens embedded newlines (1-char-for-1-char, so
          // every length the aggregate below checks is preserved) —
          // the multiLine reader alternative makes files unsplittable
          // and must never reach a 100 TB scan
          t(s, dir, "documents")
            .withColumn("text", regexp_replace(col("text"), "[\\r\\n]", " "))
            .write.option("header", "true").csv(p)
        }
        s.read.option("header", "true")
          .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          .csv(csv)
          .groupBy("lang")
          // Spark's CSV reader hands an empty string back as NULL —
          // coalesce so a zero-length doc contributes 0 to the sum on
          // both engines instead of silently dropping out of it
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(length(col("text")), lit(0L))).as("sum_len"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS sum_len,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── binaryFile source: one-opaque-asset-per-file ingestion ──
    // The multimodal landing layout: raw assets as individual files,
    // read through Spark's binaryFile source (path/length/content —
    // the scan parallelizes per file, content arrives as an opaque
    // column exactly like the parquet-binary multimodal plumbing).
    // Build once (Scratch): the 2% probe docs render to REAL WAV
    // files via the distributed Hadoop FS API (never a driver loop);
    // the read path parses the asset id FROM THE FILENAME (the
    // ingest-manifest contract), pushes the bytes through the
    // production RIFF parser, and re-derives the sample sum from the
    // PCM payload. The oracle recomputes every field analytically
    // from the construction arithmetic (doc text is pure ASCII —
    // probed, octet_length ≡ length — so the byte-wise sample sum is
    // a char-wise ord sum in SQL). A header-layout or endianness
    // regression anywhere in the write→scan→parse chain breaks the
    // hash.
    Q("q_source_binaryfile",
      (s, dir) => {
        import s.implicits._
        val bin = binSrcArtifact(s, dir)
        s.read.format("binaryFile").load(s"$bin/*.wav")
          .select(col("path"), col("length"), col("content"))
          .as[(String, Long, Array[Byte])]
          .map { case (path, len, content) =>
            val id = path.split('/').last.stripSuffix(".wav").toLong
            val m = MediaDecoder.decode(content)
            val bb = java.nio.ByteBuffer
              .wrap(content, 44, content.length - 44)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var sum = 0L
            while (bb.remaining() >= 2) sum += bb.getShort()
            (id, len, m.sample_rate, m.n_frames, sum)
          }
          .toDF("asset_id", "n_bytes", "sample_rate", "n_frames",
            "sample_sum")
          .orderBy("asset_id")
      },
      Some("""SELECT doc_id AS asset_id,
             |  CAST(44 + 2 * octet_length(encode(text)) AS BIGINT)
             |    AS n_bytes,
             |  CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
             |  CAST(64 * coalesce(
             |    list_sum(list_transform(range(1, length(text) + 1),
             |      i -> ord(substr(text, i, 1)))), 0) AS BIGINT)
             |    AS sample_sum
             |FROM documents WHERE doc_id % 50 = 0
             |ORDER BY asset_id""".stripMargin)),

    // ── JSONL source: the dominant raw-corpus interchange format ──
    // Same contract as q_source_csv (explicit schema, line-split
    // parallel scan, ingest-only) — JSON escaping carries free text
    // (newlines included) that CSV cannot without multiLine=true,
    // which makes files unsplittable and must never reach a 100 TB
    // scan.
    Q("q_source_jsonl",
      (s, dir) => {
        val js = graft.engine.Scratch.cached("jsonl_src",
          s"$dir schema=${graft.engine.Scratch.schemaKey(
            t(s, dir, "documents").schema)} format=json") { p =>
          t(s, dir, "documents").write.json(p)
        }
        s.read
          .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          .json(js)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_len"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("source")
      },
      Some("""SELECT source, count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS sum_len,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents GROUP BY source ORDER BY source""".stripMargin)),

    // ── ORC source: the columnar interchange format round-trip ──
    // Unlike CSV/JSONL above, ORC is a real ANALYTICAL format: typed
    // columns, per-stripe min/max indexes, predicate pushdown and
    // column pruning — a second warehouse's tables arrive this way and
    // the engine reads them natively (Spark bundles the reader; no
    // extra dependency). The aggregate proves full-fidelity transport
    // (every column, row, and text byte), and the filter exercises the
    // pushdown path the text formats can't offer. DuckDB reads no ORC,
    // so the oracle recomputes from the SAME rows' parquet origin —
    // which is exactly the round-trip claim.
    Q("q_source_orc",
      (s, dir) => {
        val orc = graft.engine.Scratch.cached("orc_src",
          s"$dir schema=${graft.engine.Scratch.schemaKey(
            t(s, dir, "documents").schema)} format=orc") { p =>
          t(s, dir, "documents").write.orc(p)
        }
        s.read.orc(orc)
          .filter(col("n_chars") >= 300)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("text"))).as("sum_len"),
            min("doc_id").as("min_id"), max("doc_id").as("max_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(sum(length(text)) AS BIGINT) AS sum_len,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents WHERE n_chars >= 300
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── z-ordered layout: the two-dimensional data-skipping variant ──
    // of q_compact_sorted. The derivative is clustered on the morton
    // interleave of (n_chars, doc_id), so THIS box filter — which a
    // single-key n_chars sort could only prune on one side of — skips
    // files on both dimensions (ZorderSpec measures the scan-row
    // reduction against the single-key layout; this query pins the
    // end-to-end result).
    Q("q_zorder",
      (s, dir) => {
        val z = graft.engine.Scratch.cached("zorder",
          s"$dir schema=${graft.engine.Scratch.schemaKey(
            t(s, dir, "documents").schema)} z=(n_chars,doc_id) target=256k") { p =>
          graft.engine.Layout.compactZ(s, s"$dir/documents.parquet", p,
            ("n_chars", "doc_id"), targetBytes = 256L * 1024)
        }
        s.read.parquet(z)
          .filter(col("n_chars") >= 500 && col("n_chars") < 900 &&
            col("doc_id") >= 100 && col("doc_id") < 300)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy("lang")
      },
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |min(doc_id) AS min_id, max(doc_id) AS max_id
             |FROM documents
             |WHERE n_chars >= 500 AND n_chars < 900
             |  AND doc_id >= 100 AND doc_id < 300
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── per-group quota sampling: cap each language at N docs, chosen ──
    // uniformly and reproducibly by md5-hash order (the stratified
    // downsampling step of a data-mixing recipe — rand() would pick
    // different rows per run/engine/cluster). The rank-limit window is
    // the scale shape: Spark's WindowGroupLimit pushes the per-group
    // top-N below the shuffle, so each partition forwards at most N
    // rows per lang instead of sorting whole language partitions
    // (asserted in PlanAudit). doc_id breaks (impossible-in-practice)
    // md5 ties so the cut is deterministic.
    Q("q_sample_quota",
      (s, dir) => {
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        t(s, dir, "documents")
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 20)
          .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
          .orderBy("lang", "rk")
      },
      Some("""SELECT lang, rk, doc_id, n_chars FROM (
             |  SELECT lang, doc_id, n_chars,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
             |  FROM documents)
             |WHERE rk <= 20
             |ORDER BY lang, rk""".stripMargin)),

    // ── temperature-scaled source mixing weights: the DoReMi/data- ──
    // mixture step that decides how much of each source a training run
    // draws. Token counts per source (one partial+final aggregate),
    // then w = sqrt(tokens) — temperature α = 0.5, flattening the
    // source distribution — normalized into sampling shares. sqrt is
    // IEEE-exact in both engines; the weights are fixed-pointed
    // (floor(√n·10⁶), exact integer sum) so the normalizing total is
    // bit-identical regardless of accumulation order, and the window
    // that carries it is bounded by the number of SOURCES (20 here,
    // thousands at most in production — never row-scaled).
    Q("q_mix_weights",
      (s, dir) => mixWeights(s, dir, expr("size(split(text, ' '))")),
      Some(duckMixWeights("len(string_split(text, ' '))"))),

    // ── mix weights under TOKENIZER-faithful budgets: the q_mix_weights ──
    // recipe with the whitespace counter swapped for the VocabTok
    // greedy longest-match subword count (q_tok_vocab). Whitespace
    // budgets under-count CJK by an order of magnitude, so the two
    // variants disagree most exactly where quota-balancing matters —
    // the measured zh share delta is recorded in SCALE.md. Same
    // fixed-point temperature weighting, same oracle discipline (the
    // tokenizer is cross-engine exact, see VocabTok).
    Q("q_mix_weights_tok",
      (s, dir) => mixWeights(s, dir, regexp_count(col("text"),
        lit(graft.functions.VocabTok.sparkPattern)), wide = true),
      Some(duckMixWeights(graft.functions.VocabTok.duck("text")))),

    // ── the end-to-end curation funnel: corpus in, training set out ──
    // ONE declared lazy plan chaining the stages a production pipeline
    // runs before tokenization: quality gate (curationScored) → exact-
    // dedup canonical → near-dup cluster keep (band candidates →
    // Jaccard verify → connected components, the q_dedup_resolve
    // machinery) → per-language quota by md5-hash order. Every stage's
    // scale shape is documented at its operator; the funnel adds no
    // new shuffle beyond them (the two windows — canonical and quota —
    // partition on different keys and Catalyst pipelines the rest).
    // The near-dup pairs come from the PERSISTED whole-corpus band
    // index (fullBandIndex) — the index is deterministic in the
    // corpus, so the relation (and the oracle hash) is identical to
    // re-shingling in-query, and the dominant per-token md5 pass is
    // paid once per corpus version instead of per funnel run.
    // The oracle rebuilds the whole funnel from the SHARED fragments,
    // so the hash check covers stage composition, not just each stage.
    Q("q_pipeline_e2e",
      (s, dir) => {
        val comp = Dedup.componentsOf(
          Dedup.verifiedPairsFromIndex(s, Dedup.fullBandIndex(s, dir), 0.8),
          hopsPerRound = 1)
        val surv = curationScored(t(s, dir, "documents"))
          .filter(col("quality") >= 0.7 && col("canonical") === 1 &&
            col("lang").isin("en", "de", "es", "fr", "zh"))
          .join(comp.withColumnRenamed("n", "doc_id"), Seq("doc_id"), "left")
          .filter(coalesce(col("lbl"), col("doc_id")) === col("doc_id"))
        val w = Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        surv.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 50)
          .select(col("lang"), col("rk"), col("doc_id"))
          .orderBy("lang", "rk")
      },
      Some(
        s"""WITH RECURSIVE $duckCurationScored,
           |${Dedup.duckHashedShingles},
           |${Dedup.duckBandCandidates},
           |${Dedup.duckVerifiedPairs(0.8)},
           |${Dedup.duckClosure("vp")},
           |surv AS (SELECT cq.doc_id, cq.lang
           |  FROM cq LEFT JOIN comp c ON c.n = cq.doc_id
           |  WHERE cq.quality >= 0.7 AND cq.canonical = 1
           |    AND cq.lang IN ('en','de','es','fr','zh')
           |    AND coalesce(c.lbl, cq.doc_id) = cq.doc_id),
           |r AS (SELECT lang, doc_id,
           |  CAST(row_number() OVER (PARTITION BY lang
           |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           |  FROM surv)
           |SELECT lang, rk, doc_id FROM r WHERE rk <= 50
           |ORDER BY lang, rk""".stripMargin)),

    // ── THE daily operation: incremental curation funnel over ──
    // persisted corpus state. The batch funnel above is the from-
    // scratch run; THIS is what a production pipeline executes every
    // day: a dated increment (doc_id % 10 = 7, the repo's standing
    // increment convention) flows quality gate → in-batch exact
    // canonical → anti-join against the corpus's PERSISTED bucketed
    // content-hash table → near-dup probe against the corpus's
    // PERSISTED band index → Merge.upsert of the survivors' per-
    // language profile into the PERSISTED corpus profile → per-
    // language quota (share) refresh. Composition is where state-
    // consistency bugs live (a doc that dedups against one corpus
    // version but merges into another): every corpus-side relation
    // here is the SAME Scratch artifact the standalone operators use
    // (hashCorpusTable / corpusBandIndex), and the daily plan never
    // scans the corpus documents at all — PipelineIncrementalSpec pins
    // that the executed plan reads artifacts + increment only. The
    // gated-survivor set is batch-sized and fans out three ways
    // (probe, anti-join, profile), so it materializes once.
    // Output: the refreshed corpus profile — per language, total docs,
    // total chars, docs the increment added, and the post-merge quota
    // share (exact-integer counts; share is one IEEE-exact division).
    Q("q_pipeline_incremental",
      (s, dir) => {
        val hashTbl = Dedup.hashCorpusTable(s, dir)
        val bandIdx = Dedup.corpusBandIndex(s, dir)
        val profile = graft.engine.Scratch.cachedFrame("corpus_profile", dir) {
          t(s, dir, "documents").filter(col("doc_id") % 10 =!= 7)
            .groupBy("lang")
            .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        }
        val gated = curationScored(
            t(s, dir, "documents").filter(col("doc_id") % 10 === 7))
          .filter(col("quality") >= 0.7 && col("canonical") === 1 &&
            col("lang").isin("en", "de", "es", "fr", "zh"))
        val exactNew = gated
          .withColumn("h", md5(col("text")))
          .join(s.table(hashTbl).select("h"), Seq("h"), "left_anti")
          .select("doc_id", "text", "lang", "n_chars")
          .localCheckpoint(true)
        val nearDup = Dedup
          .incrementalNearDupsAgainst(exactNew, bandIdx, 0.8)
          .select("doc_id").distinct()
        val fresh = exactNew.join(nearDup, Seq("doc_id"), "left_anti")
        // cached: consumed three times (Merge's key check, the merged
        // plan, the n_new join-back) — without this the band probe +
        // verify + anti-join subtree re-executes per consumer. cache()
        // (lazy), NOT localCheckpoint: the plan keeps its artifact
        // lineage, which PipelineIncrementalSpec pins (scans = band
        // index + hash table + profile + increment, never corpus
        // documents); at most one row per language
        val incProf = fresh.groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .cache()
        val add = (tc: Column, u: Column) =>
          coalesce(tc, lit(0L)) + coalesce(u, lit(0L))
        val merged = graft.engine.Merge.upsert(
          profile, incProf, Seq("lang"),
          combine = Map("n_docs" -> add, "sum_chars" -> add),
          checkUniqueKeys = true)
        merged
          .join(incProf.select(col("lang"), col("n_docs").as("n_new")),
            Seq("lang"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("share", col("n_docs").cast("double") /
            sum(col("n_docs")).over(Window.partitionBy()).cast("double"))
          .select("lang", "n_docs", "sum_chars", "n_new", "share")
          .orderBy("lang")
      },
      Some(
        s"""WITH ${duckCurationScoredFrom(
              "(SELECT * FROM documents WHERE doc_id % 10 = 7)")},
           |g AS (SELECT doc_id, text, lang, n_chars FROM cq
           |      WHERE quality >= 0.7 AND canonical = 1
           |        AND lang IN ('en','de','es','fr','zh')),
           |x AS (SELECT g.doc_id, g.lang, g.n_chars FROM g
           |      WHERE NOT EXISTS (SELECT 1 FROM documents c
           |        WHERE c.doc_id % 10 <> 7 AND md5(c.text) = md5(g.text))),
           |${Dedup.duckHashedShingles},
           |${Dedup.duckIncrementalNearBodies("x")},
           |fresh AS (SELECT doc_id, lang, n_chars FROM x
           |          WHERE NOT EXISTS (SELECT 1 FROM nd
           |                            WHERE nd.doc_id = x.doc_id)),
           |incprof AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |            FROM fresh GROUP BY lang),
           |corpprof AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |                    CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |             FROM documents WHERE doc_id % 10 <> 7 GROUP BY lang),
           |merged AS (SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           |                  CAST(SUM(sum_chars) AS BIGINT) AS sum_chars
           |           FROM (SELECT * FROM corpprof
           |                 UNION ALL SELECT * FROM incprof)
           |           GROUP BY lang)
           |SELECT m.lang, m.n_docs, m.sum_chars,
           |  COALESCE(i.n_docs, CAST(0 AS BIGINT)) AS n_new,
           |  CAST(m.n_docs AS DOUBLE) / CAST(SUM(m.n_docs) OVER () AS DOUBLE)
           |    AS share
           |FROM merged m LEFT JOIN incprof i ON i.lang = m.lang
           |ORDER BY m.lang""".stripMargin)),

    // ── MERGE INTO (upsert): CDC refresh of a per-user profile table ──
    // target = last-event profile from the first half of the month,
    // updates = same profile over the second half; Merge.upsert gives
    // the current table — matched users take the update row wholesale
    // (last-write-wins), new users insert. One full-outer shuffle on
    // the key; at 100 TB the target side is bucketed so only the
    // increment ships (engine/Merge.scala scaladoc).
    Q("q_merge_upsert",
      (s, dir) => {
        val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
        graft.engine.Merge.upsert(
          userProfileOf(ev.filter(col("ts") < cutoff)),
          userProfileOf(ev.filter(col("ts") >= cutoff)),
          Seq("user_id"))
          .orderBy("user_id")
      },
      Some(s"""WITH tp AS ${duckUserProfile(
              " WHERE ts < TIMESTAMP '2024-01-16 00:00:00'")},
             |up AS ${duckUserProfile(
              " WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'")}
             |SELECT COALESCE(u.user_id, t.user_id) AS user_id,
             |  CASE WHEN u.user_id IS NOT NULL THEN u.last_ts ELSE t.last_ts END AS last_ts,
             |  CASE WHEN u.user_id IS NOT NULL THEN u.last_type ELSE t.last_type END AS last_type,
             |  CASE WHEN u.user_id IS NOT NULL THEN u.n ELSE t.n END AS n
             |FROM tp t FULL OUTER JOIN up u ON t.user_id = u.user_id
             |ORDER BY user_id""".stripMargin)),

    // ── table reconciliation: symmetric diff with per-column drill ──
    // The CDC-validation operator: given two snapshots of the same
    // keyed table (here the q_merge_upsert profile at mid-month vs
    // month-end), report every key that is only in one side or
    // changed, naming WHICH columns moved. One full-outer shuffle on
    // the key (bucketed snapshots make it exchange-free — the
    // q_join_bucketed artifact pattern); null-safe compares so a
    // null-vs-value move is a reported diff, not a silent match. The
    // column list is emitted in fixed schema order on both engines.
    Q("q_table_diff",
      (s, dir) => {
        val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
        val ev = t(s, dir, "events")
        val a = userProfileOf(ev.filter(col("ts") < cutoff))
        val b = userProfileOf(ev)
        val diffs = array(
          when(!(col("a.last_ts") <=> col("b.last_ts")), lit("last_ts")),
          when(!(col("a.last_type") <=> col("b.last_type")), lit("last_type")),
          when(!(col("a.n") <=> col("b.n")), lit("n")))
        a.as("a").join(b.as("b"),
            col("a.user_id") === col("b.user_id"), "full_outer")
          .select(
            coalesce(col("a.user_id"), col("b.user_id")).as("user_id"),
            when(col("a.user_id").isNull, lit("only_b"))
              .when(col("b.user_id").isNull, lit("only_a"))
              .when(!(col("a.last_ts") <=> col("b.last_ts")) ||
                !(col("a.last_type") <=> col("b.last_type")) ||
                !(col("a.n") <=> col("b.n")), lit("diff"))
              .otherwise(lit("same")).as("status"),
            when(col("a.user_id").isNull || col("b.user_id").isNull, lit(""))
              .otherwise(concat_ws(",",
                filter(diffs, x => x.isNotNull))).as("changed_cols"))
          .filter(col("status") =!= "same")
          .orderBy("user_id")
      },
      Some(s"""WITH tp AS ${duckUserProfile(
              " WHERE ts < TIMESTAMP '2024-01-16 00:00:00'")},
             |up AS ${duckUserProfile("")},
             |j AS (SELECT COALESCE(a.user_id, b.user_id) AS user_id,
             |  CASE WHEN a.user_id IS NULL THEN 'only_b'
             |       WHEN b.user_id IS NULL THEN 'only_a'
             |       WHEN a.last_ts IS DISTINCT FROM b.last_ts
             |         OR a.last_type IS DISTINCT FROM b.last_type
             |         OR a.n IS DISTINCT FROM b.n THEN 'diff'
             |       ELSE 'same' END AS status,
             |  CASE WHEN a.user_id IS NULL OR b.user_id IS NULL THEN ''
             |       ELSE ltrim(
             |         CASE WHEN a.last_ts IS DISTINCT FROM b.last_ts
             |              THEN ',last_ts' ELSE '' END ||
             |         CASE WHEN a.last_type IS DISTINCT FROM b.last_type
             |              THEN ',last_type' ELSE '' END ||
             |         CASE WHEN a.n IS DISTINCT FROM b.n
             |              THEN ',n' ELSE '' END, ',') END AS changed_cols
             |FROM tp a FULL OUTER JOIN up b ON a.user_id = b.user_id)
             |SELECT user_id, status, changed_cols FROM j
             |WHERE status <> 'same' ORDER BY user_id""".stripMargin)),

    // ── SCD Type-2 history build: per-user event_type change intervals ──
    // The dimension-history twin of q_merge_upsert: collapse the event
    // stream into versioned validity intervals (valid_from inclusive,
    // valid_to exclusive, NULL = current). Change-point detection via
    // lag over (ts, event_id), then version numbering and lead() for
    // the closing timestamp — two window passes, both partitioned by
    // user_id (no global window), one shuffle total since they share
    // the partitioning. The 100 TB shape of "build the SCD2 dimension
    // from CDC logs" — the heavy input collapses to O(change points)
    // before the second pass.
    Q("q_scd2",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val changes = t(s, dir, "events")
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        changes
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to", lead(col("ts"), 1).over(w))
          .select(col("user_id"), col("version"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"))
          .orderBy("user_id", "version")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type,
             |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |c AS (SELECT user_id, event_id, ts, event_type FROM x
             |      WHERE prev_type IS NULL OR prev_type <> event_type)
             |SELECT user_id,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS version,
             |  event_type, ts AS valid_from,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
             |FROM c ORDER BY user_id, version""".stripMargin)),

    // ── key-skew diagnostic: the "should this join be salted?" probe ──
    // Distribution profile of per-key frequencies for a join/agg key:
    // key count, max, exact p50/p90/p99, and max/median skew ratio.
    // This is the measurement the saltedJoin policy (MapleJuice
    // hot-key-only salting) acts on — run it BEFORE burning a shuffle
    // on salting everything. The keyed count collapses the fact table
    // to key-cardinality; the percentiles over that relation ride
    // GridRank.percentileContByValue (round-17 group-array sweep:
    // keys GROW with the corpus, and the built-in exact percentile
    // would buffer every distinct count in one unspillable map —
    // distinct positive integers summing to N number at most √(2N),
    // so the prefix-walked value histogram is ≤ √(2N) ≈ 4.5e5 rows
    // at N = 1e11, sublinear in corpus, and the corpus-side work is
    // the one distributed groupBy). Interpolation replays Spark's
    // formula bit-for-bit (PercentileContSpec); same
    // percentile↔quantile_cont parity as q_percentile.
    Q("q_skew_profile",
      (s, dir) => {
        val c = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
        // n_keys and max_cnt read off the SAME value histogram as the
        // percentiles (round-17 review: a separate c.agg re-ran the
        // fact-table groupBy a second time)
        graft.engine.GridRank.percentileContByValue(c, col("cnt"),
            Seq(0.5 -> "med_cnt", 0.9 -> "p90_cnt", 0.99 -> "p99_cnt"),
            nOut = Some("n_keys"), maxOut = Some("max_cnt"))
          .select(col("n_keys"), col("max_cnt"), col("med_cnt"),
            col("p90_cnt"), col("p99_cnt"),
            (col("max_cnt").cast("double") / col("med_cnt")).as("skew_ratio"))
      },
      Some("""WITH c AS (SELECT l_suppkey, count(*) AS cnt
             |  FROM lineitem GROUP BY l_suppkey)
             |SELECT count(*) AS n_keys, max(cnt) AS max_cnt,
             |  quantile_cont(cnt, 0.5) AS med_cnt,
             |  quantile_cont(cnt, 0.9) AS p90_cnt,
             |  quantile_cont(cnt, 0.99) AS p99_cnt,
             |  CAST(max(cnt) AS DOUBLE) / quantile_cont(cnt, 0.5) AS skew_ratio
             |FROM c""".stripMargin)),

    // ── sliding-window chunking with stride overlap ──
    // The context-length chunker that turns long documents into
    // training sequences: fixed 32-token windows every 24 tokens
    // (8-token overlap so no span is ever split across a boundary
    // without a witness chunk containing it whole). Per-row explode —
    // chunk count is linear in tokens, zero shuffle before the
    // presentation sort, so at 100 TB this is a map-only pass. Each
    // chunk carries its md5 so downstream chunk-level dedup can run
    // without re-materializing text; the oracle recomputes every hash
    // from DuckDB's own slice of the same token array — an off-by-one
    // in the start index, the tail-chunk length, or the join
    // separator breaks the hash match.
    Q("q_chunk_stride",
      (s, dir) => {
        val maxTok = 32L
        val stride = 24L
        t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n", size(col("toks")).cast("long"))
          // docs are non-empty (n >= 1), so (n-1)/stride >= 0 and the
          // sequence never runs backwards
          .withColumn("chunk_idx", explode(sequence(lit(0L),
            ((col("n") - 1L) / lit(stride)).cast("long"))))
          .withColumn("start_tok", col("chunk_idx") * stride)
          .withColumn("chunk_tokens",
            least(lit(maxTok), col("n") - col("start_tok")))
          .withColumn("chunk_hash", md5(concat_ws(" ",
            slice(col("toks"), (col("start_tok") + 1L).cast("int"),
              col("chunk_tokens").cast("int")))))
          .select("doc_id", "chunk_idx", "start_tok", "chunk_tokens",
            "chunk_hash")
          .orderBy("doc_id", "chunk_idx")
      },
      // chunk indices via unnest(range(...)) — per-document, UNCAPPED,
      // matching the Spark side's sequence() exactly (a previous fixed
      // generate_series(0, 8) cross join silently capped the oracle at
      // 9 chunks, i.e. 217+-token documents would have mis-oracled;
      // generate_series cannot take lateral column args in DuckDB,
      // range() as a scalar list can)
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
             |  FROM documents),
             |c AS (SELECT doc_id, toks, n,
             |  unnest(range(0, (n - 1) // 24 + 1)) AS i FROM d)
             |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |  CAST(i * 24 AS BIGINT) AS start_tok,
             |  CAST(LEAST(32, n - i * 24) AS BIGINT) AS chunk_tokens,
             |  md5(array_to_string(
             |    toks[CAST(i * 24 + 1 AS BIGINT)
             |         : CAST(i * 24 + LEAST(32, n - i * 24) AS BIGINT)],
             |    ' ')) AS chunk_hash
             |FROM c
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ── incremental view maintenance: fold of increments == recompute ──
    // The algebra a warehouse's incremental refresh rests on: per-key
    // additive aggregates maintained by folding dated increments into
    // the running state via Merge.upsert's combine hooks (counter +=
    // delta, decimal-exact sum += delta) must equal a from-scratch
    // recompute over the union — the oracle IS that recompute, so any
    // drift in the fold (a dropped slice, a non-associative combine, a
    // null mishandled on an unmatched side) is a hash mismatch. Sums
    // accumulate in DECIMAL so the three-way fold and the one-shot
    // aggregate round identically (the dsum discipline); the cast to
    // double happens ONCE at the end. Each fold is one full-outer
    // shuffle on user_id over state- and increment-sized relations —
    // at 100 TB the state is the bucketed corpus profile and only
    // increments move (the q_merge_upsert deployment story).
    Q("q_ivm_counts",
      (s, dir) => {
        val ev = t(s, dir, "events")
        def incr(lo: String, hi: String): DataFrame = ev
          .filter(col("ts") >= lit(lo).cast("timestamp") &&
            col("ts") < lit(hi).cast("timestamp"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 6))).as("v_dec"))
        val slices = Seq(
          incr("2024-01-01 00:00:00", "2024-01-11 00:00:00"),
          incr("2024-01-11 00:00:00", "2024-01-21 00:00:00"),
          incr("2024-01-21 00:00:00", "2024-02-01 00:00:00"))
        val folded = slices.reduce { (state, inc) =>
          graft.engine.Merge.upsert(state, inc, Seq("user_id"), combine = Map(
            "n_events" -> ((st, u) =>
              coalesce(st, lit(0L)) + coalesce(u, lit(0L))),
            "v_dec" -> ((st, u) =>
              coalesce(st, lit(0).cast(DecimalType(18, 6))) +
                coalesce(u, lit(0).cast(DecimalType(18, 6))))))
        }
        folded
          .select(col("user_id"), col("n_events"),
            col("v_dec").cast("double").as("v_sum"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v_sum
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── incremental view maintenance of a JOIN view (bilinear rule) ──
    // Extends q_ivm_counts' additive fold to a two-relation view:
    // V = γ(orders ⋈ customer) maintained under increments to BOTH
    // sides via the bilinear delta rule
    //   Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
    // (ΔA = orders after the cutoff date; ΔB = a customer-key slice
    // standing in for newly-registered customers). The three delta
    // joins aggregate to nation grain and fold into the old state
    // with Merge.upsert's additive combine; the oracle recomputes
    // γ(A ⋈ B) from scratch, so a missing delta term (the classic
    // IVM bug is dropping ΔA ⋈ ΔB), a double-counted slice, or a
    // non-associative combine is a hash mismatch. Counts + DECIMAL
    // sums keep every fold order-free exact. 100 TB shape: each
    // delta join is increment × (bucketed base) — the base relations
    // never rescan in full; the folds are nation-grain upserts.
    Q("q_ivm_join",
      (s, dir) => {
        val cutoff = lit("1997-01-01").cast("date")
        val orders = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_totalprice"),
            to_date(col("o_orderdate")).as("od"))
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val aOld = orders.filter(col("od") < cutoff)
        val dA = orders.filter(col("od") >= cutoff)
        val bOld = cust.filter(col("c_custkey") % 10 =!= 3)
        val dB = cust.filter(col("c_custkey") % 10 === 3)
        def view(o: DataFrame, c: DataFrame): DataFrame = o
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).as("p_dec"))
        val state = view(aOld, bOld)
        val deltas = Seq(view(dA, bOld), view(aOld, dB), view(dA, dB))
        val folded = deltas.foldLeft(state) { (st, inc) =>
          graft.engine.Merge.upsert(st, inc, Seq("c_nationkey"), combine = Map(
            "n_orders" -> ((a, b) =>
              coalesce(a, lit(0L)) + coalesce(b, lit(0L))),
            "p_dec" -> ((a, b) =>
              coalesce(a, lit(0).cast(DecimalType(18, 2))) +
                coalesce(b, lit(0).cast(DecimalType(18, 2))))))
        }
        folded
          .select(col("c_nationkey"), col("n_orders"),
            col("p_dec").cast("double").as("p_sum"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS p_sum
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ── weighted sampling: deterministic hash-lottery priorities ──
    // Weighted sampling without replacement, reproducible across runs,
    // engines, and cluster sizes (rand() is none of those): each row
    // gets `w` lottery tickets, its priority is the MIN of `w`
    // independent md5 draws — computed per-row inside ONE array
    // expression (no explode, no shuffle), so higher-weight rows hold
    // stochastically smaller priorities and the global top-k is the
    // weighted sample. The top-50 plans as TakeOrderedAndProject
    // (per-partition partial top-k, driver merges 50-row heaps — never
    // a full sort). The md5 hex strings compare identically in both
    // engines, so the selected set is hash-exact. The upweighted
    // languages here are exactly the quota-protected ones (en for
    // coverage, zh for the tokenizer-budget story — q_mix_weights).
    Q("q_sample_weighted",
      (s, dir) =>
        t(s, dir, "documents")
          .withColumn("w", expr(
            """CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 3
              |  WHEN 'de' THEN 2 ELSE 1 END""".stripMargin).cast("long"))
          .withColumn("pri", expr(
            """array_min(transform(sequence(1L, w),
              |  i -> md5(concat(cast(doc_id AS STRING), ':',
              |                  cast(i AS STRING)))))""".stripMargin))
          .select(col("doc_id"), col("lang"), col("w"), col("pri"))
          .orderBy(col("pri"))
          .limit(50),
      Some("""WITH t AS (SELECT doc_id, lang,
             |  CAST(CASE lang WHEN 'en' THEN 4 WHEN 'zh' THEN 3
             |    WHEN 'de' THEN 2 ELSE 1 END AS BIGINT) AS w FROM documents),
             |p AS (SELECT doc_id, lang, w,
             |  list_min(list_transform(generate_series(1, w),
             |    i -> md5(doc_id::VARCHAR || ':' || i::VARCHAR))) AS pri
             |  FROM t)
             |SELECT doc_id, lang, w, pri FROM p
             |ORDER BY pri LIMIT 50""".stripMargin))
  )
}
