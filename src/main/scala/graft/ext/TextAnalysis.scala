package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.queries.Q

/** Text-analysis operators: language-ID (n-gram profile scoring),
  * quality scoring (length/stopword/punctuation ratios), token
  * counting (whitespace + BPE-ish regex), and rolling-hash document
  * fingerprinting.
  *
  * All per-document (embarrassingly parallel — no shuffle except the
  * final deterministic orderBy), all pure Catalyst expressions, all
  * arithmetic exact-integer or single-rounding double so the DuckDB
  * oracle computes bit-identical values.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Fanned-out documents scan (Tables.wide) for the two queries whose
    * per-row scan-stage work dwarfs one exchange — the greedy-vocab
    * regex count (q_tok_vocab: 2.21 → 0.95 s at sf0.1/32 cores) and
    * the 5-gram md5 walk (q_text_repetition: 1.09 → 0.74 s). The
    * other text queries measured SLOWER under a blanket fan-out (the
    * extra exchange costs more than their per-row work; full A/B in
    * OPTIMIZATION_r17.md), so they keep the bare scan. */
  private def wideDocs(s: SparkSession, dir: String): DataFrame =
    Tables.wide(s, dir, "documents")

  /** Occurrences of literal `pat` in `col` via the replace trick —
    * identical semantics in Spark and DuckDB. */
  private def occSql(c: String, pat: String): String =
    s"(length($c) - length(replace($c, '$pat', ''))) / ${pat.length}"

  /** Per-language character-bigram profiles for the heuristic n-gram
    * language scorer (top function-word bigrams per language). */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("ch", "ei", "en", "de"),
    "en" -> Seq("th", "he", "in", "er"),
    "es" -> Seq("la", "os", "es", "ar"),
    "fr" -> Seq("le", "re", "ou", "ai"),
    "zh" -> Seq("sh", "ng", "zh", "ia"))

  /** Small stopword list used by the quality score. */
  val stopwords: Seq[String] = Seq("a", "the", "of", "to", "and", "in")

  /** True-log BM25 twin of `q_bm25` (k1 = 1.2, b = 0.75, double
    * precision, Lucene idf ln(1 + (2N−2df+1)/(2df+1)) — the +1 keeps
    * the idf positive when df > N/2, which is exactly the regime the
    * driver corpus is in: the query terms hit ~77% of docs, so the
    * RAW Robertson log idf is negative there and inverts the ranking
    * entirely (measured 0/10 top-10 overlap — the classic negative-idf
    * pathology every production BM25 patches). Against this Lucene
    * form the rational variant ranks 9/10 identically (RECALL.md).
    * NOT oracle-checked: libm `log` is not bit-reproducible across
    * engines, so fidelity is pinned instead by Bm25Spec — a scalar
    * recompute of the identical formula must agree to 1e-9 relative.
    * Same 100 TB shape as q_bm25: tf prunes to the query terms before
    * grouping, df and the 1-row (N, TT) aggregate broadcast. */
  def bm25LogScores(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val dtok = docs(s, dir).select(col("doc_id"),
      explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("token"))
    val dl = dtok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val glob = dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("tt"))
    val tf = dtok.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(glob))
      // avgdl = tt/nn, so b's length norm 1−b+b·dl/avgdl clears to
      // 0.25 + 0.75·dl·nn/tt; tf·(k1+1) = 2.2·tf
      .withColumn("score", expr(
        """ln(1.0D + (2.0D * nn - 2.0D * df + 1.0D) / (2.0D * df + 1.0D)) *
          |(2.2D * tf) /
          |(tf + 1.2D * (0.25D + 0.75D * dl * nn / tt))""".stripMargin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("score")).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
  }

  val queries: Seq[Q] = Seq(

    // ── rarity scoring: corpus-global token statistics joined back ──
    // into per-row scoring — the two-pass shape of a perplexity/quality
    // filter, with deterministic rational arithmetic instead of a
    // language model (no transcendental functions: libm log differs
    // across engines in the last ulp). Pass 1: corpus unigram
    // frequencies (one keyed shuffle, partial aggregation). Pass 2:
    // per-token 1/freq (single deterministic division, cast to
    // DECIMAL(18,12) for order-free summation), averaged per doc, plus
    // the hapax fraction (tokens seen exactly once in the corpus).
    // The freq table carries NO broadcast hint: the hapax output
    // forbids a min-count floor, so on an open-vocabulary web corpus
    // the raw unigram table is Heaps-law-unbounded (billions of rows
    // at 100 TB) — a forced hint there overrides Spark's size checks
    // and OOMs the executors. AQE broadcasts it when it is actually
    // dictionary-sized (spec-pinned) and falls back to the shuffle
    // the token stream already pays for the groupBy otherwise.
    Q("q_text_rarity",
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val freq = toks.groupBy("w").agg(count(lit(1)).as("freq"))
        toks.join(freq, "w")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            (sum(expr("CAST(1.0D / freq AS DECIMAL(18,12))")).cast("double") /
              count(lit(1))).as("avg_inv_freq"),
            (sum(when(col("freq") === 1, 1L).otherwise(0L)).cast("double") /
              count(lit(1))).as("hapax_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |freq AS (SELECT w, count(*) AS freq FROM toks GROUP BY w)
             |SELECT doc_id, count(*) AS n_tokens,
             |  CAST(SUM(CAST(1.0::DOUBLE / freq AS DECIMAL(18,12))) AS DOUBLE)
             |    / count(*) AS avg_inv_freq,
             |  CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / count(*) AS hapax_ratio
             |FROM toks JOIN freq USING (w)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ── language ID: argmax of bigram-profile scores (first wins ties) ──
    // Scores are materialized once as columns; the argmax CASE only
    // references them (the naive form re-evaluates every replace-chain
    // per CASE branch — 25x the work).
    Q("q_text_langid",
      (s, dir) => {
        val langs = profiles.map(_._1)
        // tie-break = first language in declared order with max score
        val pred = langs.map { l =>
          val geAll = langs.map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $geAll THEN '$l'"
        }.mkString("CASE ", " ", " ELSE '??' END")
        docs(s, dir)
          .select(
            col("doc_id") +: col("lang").as("actual") +:
              profiles.map { case (l, pats) =>
                val sc = pats.map(p => s"(${occSql("text", p)})").mkString(" + ")
                expr(sc).cast("double").as(s"score_$l")
              }: _*)
          .withColumn("predicted", expr(pred))
          .withColumn("hit", (col("predicted") === col("actual")).cast("int"))
          .orderBy("doc_id")
      },
      Some {
        val langs = profiles.map(_._1)
        val scoreCols = profiles.map { case (l, pats) =>
          val sc = pats.map(p => s"(${occSql("text", p)})").mkString(" + ")
          s"CAST($sc AS DOUBLE) AS score_$l"
        }.mkString(", ")
        val pred = langs.map { l =>
          val geAll = langs.map(o => s"score_$l >= score_$o").mkString(" AND ")
          s"WHEN $geAll THEN '$l'"
        }.mkString("CASE ", " ", " ELSE '??' END")
        s"""WITH sc AS (SELECT doc_id, lang AS actual, $scoreCols FROM documents)
           |SELECT doc_id, actual, ${langs.map(l => s"score_$l").mkString(", ")},
           |$pred AS predicted, CAST(($pred) = actual AS INT) AS hit
           |FROM sc ORDER BY doc_id""".stripMargin
      }),

    // ── quality score: length / stopword / punctuation heuristics ──
    Q("q_text_quality",
      (s, dir) =>
        docs(s, dir)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_words", expr("size(ws)").cast("long"))
          .withColumn("stop_cnt",
            expr(s"size(filter(ws, w -> w IN (${stopwords.map("'" + _ + "'").mkString(",")})))")
              .cast("long"))
          .withColumn("punct_cnt",
            expr("length(text) - length(regexp_replace(text, '[.!?,;]', ''))").cast("long"))
          .withColumn("stop_ratio", col("stop_cnt").cast("double") / col("n_words"))
          .withColumn("quality",
            expr("CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END") +
              col("stop_ratio") * 2.0 -
              col("punct_cnt").cast("double") / col("n_chars"))
          .select("doc_id", "n_words", "stop_cnt", "punct_cnt", "stop_ratio", "quality")
          .orderBy("doc_id"),
      Some {
        val sw = stopwords.map("'" + _ + "'").mkString(",")
        s"""WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws,
           |  CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS BIGINT)
           |    AS punct_cnt
           |  FROM documents),
           |m AS (SELECT doc_id, n_chars, punct_cnt,
           |  CAST(len(ws) AS BIGINT) AS n_words,
           |  CAST(len(list_filter(ws, w -> w IN ($sw))) AS BIGINT) AS stop_cnt
           |  FROM t)
           |SELECT doc_id, n_words, stop_cnt, punct_cnt,
           |  CAST(stop_cnt AS DOUBLE) / n_words AS stop_ratio,
           |  (CASE WHEN n_words >= 20 THEN 0.5 ELSE 0.0 END
           |    + CAST(stop_cnt AS DOUBLE) / n_words * 2.0
           |    - CAST(punct_cnt AS DOUBLE) / n_chars) AS quality
           |FROM m ORDER BY doc_id""".stripMargin
      }),

    // ── token counting: whitespace tokens + BPE-ish regex pieces ──
    Q("q_text_tokens",
      (s, dir) =>
        docs(s, dir)
          .withColumn("ws_tokens", expr("size(split(text, ' '))").cast("long"))
          .withColumn("bpe_tokens",
            expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").cast("long"))
          .select("doc_id", "ws_tokens", "bpe_tokens")
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             |  AS bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── tokenizer-faithful token accounting: greedy longest-match ──
    // over the inlined VocabTok subword vocabulary. The run-based
    // q_text_tokens counter above lumps a CJK sentence into ONE token
    // per script run — systematically under-budgeting exactly the
    // languages quota-balancing protects; here CJK counts one token
    // per character and English words split into BPE-ish subword
    // units. Greedy longest-match compiles to a longest-first regex
    // alternation, identical under Java regex and RE2 (VocabTok
    // scaladoc), so the count is fully oracle-checked — no golden-file
    // fallback. tok_per_word (one IEEE-exact division) is the
    // under-count diagnostic: ~1 for en/de, ≫1 for zh.
    Q("q_tok_vocab",
      (s, dir) =>
        wideDocs(s, dir)
          .withColumn("ws_tokens", expr("size(split(text, ' '))").cast("long"))
          .withColumn("vocab_tokens",
            regexp_count(col("text"),
              lit(graft.functions.VocabTok.sparkPattern)).cast("long"))
          .withColumn("tok_per_word",
            col("vocab_tokens").cast("double") / col("ws_tokens").cast("double"))
          .select("doc_id", "lang", "ws_tokens", "vocab_tokens", "tok_per_word")
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang,
             |CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             |${graft.functions.VocabTok.duck("text")} AS vocab_tokens,
             |CAST(${graft.functions.VocabTok.duck("text")} AS DOUBLE) /
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_per_word
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── rolling-hash document fingerprint (md5-seeded polynomial) ──
    // Token hashes materialize once (transform), the fold is then pure
    // integer arithmetic.
    // ── within-document repetition: the Gopher/C4 duplicate-n-gram ──
    // quality rule. rep_frac = 1 − distinct 5-grams / total 5-grams:
    // boilerplate, chorus-like spam, and decoding loops score high and
    // get filtered before training. Pure per-row expression (no
    // shuffle): ONE md5 per word (shared TokenHash idiom), 5-grams as
    // exact integer polynomials (hw < 2^32, coefficient sum 31⁴+…+1 <
    // 2^20 → products < 2^52, i64-exact in both engines), one double
    // division at the end.
    Q("q_text_repetition",
      (s, dir) => {
        val ngSpark = graft.functions.NgramHash.spark("hw")
        wideDocs(s, dir)
          .withColumn("hw",
            expr(graft.functions.TokenHash.spark("split(text, ' ')")))
          .withColumn("n_grams",
            when(expr("size(hw)") >= 5, expr(s"size($ngSpark)")).otherwise(0)
              .cast("long"))
          .withColumn("n_distinct",
            when(expr("size(hw)") >= 5,
              expr(s"size(array_distinct($ngSpark))")).otherwise(0)
              .cast("long"))
          .withColumn("rep_frac",
            when(col("n_grams") > 0,
              lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))
              .otherwise(0.0))
          .select("doc_id", "n_grams", "n_distinct", "rep_frac")
          .orderBy("doc_id")
      },
      Some {
        val ngDuck = graft.functions.NgramHash.duck("hw")
        s"""WITH t AS (SELECT doc_id,
           |  ${graft.functions.TokenHash.duck("string_split(text, ' ')")} AS hw
           |  FROM documents),
           |g AS (SELECT doc_id,
           |  CASE WHEN len(hw) >= 5 THEN CAST(len($ngDuck) AS BIGINT)
           |       ELSE 0 END AS n_grams,
           |  CASE WHEN len(hw) >= 5
           |       THEN CAST(len(list_distinct($ngDuck)) AS BIGINT)
           |       ELSE 0 END AS n_distinct
           |  FROM t)
           |SELECT doc_id, n_grams, n_distinct,
           |CASE WHEN n_grams > 0
           |     THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_grams
           |     ELSE 0.0 END AS rep_frac
           |FROM g ORDER BY doc_id""".stripMargin
      }),

    Q("q_text_fingerprint",
      (s, dir) =>
        docs(s, dir)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("hw", expr(graft.functions.TokenHash.spark("ws")))
          .withColumn("fp",
            expr("aggregate(hw, CAST(0 AS BIGINT), (acc, x) -> " +
              "(acc * 1000003 + x) % 1000000007)"))
          .select("doc_id", "fp")
          .orderBy("doc_id"),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
              |SELECT doc_id,
              |list_reduce(list_prepend(CAST(0 AS BIGINT), ${graft.functions.TokenHash.duck("ws")}),
              |  (acc, x) -> (acc * 1000003 + x) % 1000000007) AS fp
              |FROM t ORDER BY doc_id""".stripMargin)),

    // ── inverted index: token → document-frequency + sorted postings ──
    // The search-engine build step as one keyed shuffle: explode word
    // tokens, distinct (token, doc), group by token. Postings cap at 8
    // ids per token — the full list is the real artifact, the cap
    // keeps the oracle row bounded. 100 TB shape (round-17
    // group-array sweep): the old form collect_list'ed a token's FULL
    // postings before slicing — for a stopword token that is a
    // corpus-document-count array in one unspillable aggregation
    // buffer. The cap now happens BEFORE the collect: a per-token
    // row_number window (WindowExec sorts spill to disk — a hot token
    // costs I/O, never memory) marks the 8 smallest doc_ids, and
    // collect_list gathers only those (null-skipping `when`), so the
    // buffer is ≤8 elements for any token. df still counts the full
    // postings. The window and the groupBy share the token hash
    // partitioning — still one keyed shuffle.
    Q("q_inverted_index",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("token").orderBy("doc_id")
        docs(s, dir)
          .select(col("doc_id"),
            explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("token"))
          .distinct()
          .withColumn("rn", row_number().over(w))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("df"),
               // string-joined postings: the driver's compare (and
               // check.py) hashes scalar cells, not nested arrays
               concat_ws(",",
                 sort_array(collect_list(
                   when(col("rn") <= 8, col("doc_id"))))).as("postings"))
          .orderBy("token")
      },
      Some("""WITH ex AS (SELECT doc_id,
             |  unnest(regexp_extract_all(text, '[a-z]+')) AS token FROM documents),
             |tok AS (SELECT DISTINCT doc_id, token FROM ex)
             |SELECT token, count(*) AS df,
             |       array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS postings
             |FROM tok GROUP BY token ORDER BY token""".stripMargin)),

    // ── tf-idf top-5 terms per document (rational-idf fixed point) ──
    // Classic two-statistic ranking: tf per (doc, token), df per token,
    // score = tf · N/df. The idf stays RATIONAL (score_fp = tf·N·10⁴/df,
    // truncating BIGINT division) instead of tf·ln(N/df): libm log is
    // not correctly-rounded and differs across engines in the last ulp,
    // while the rational form is bit-exact in both — same monotone
    // ordering per fixed tf, deterministic hash. Top-5 via row_number
    // with a total tiebreak; the rnk<=5 filter plans as WindowGroupLimit
    // (partial per-shuffle-side top-k, the scalable shape).
    Q("q_tfidf",
      (s, dir) => {
        val ex = docs(s, dir)
          .select(col("doc_id"),
            explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("token"))
        val tf = ex.groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("tf"))
        val df = ex.select("doc_id", "token").distinct()
          .groupBy(col("token")).agg(count(lit(1)).as("df"))
        // corpus size as a bounded driver fetch (ONE scalar — the
        // q_approx_percentile idiom): a 1-row crossJoin would plan the
        // banned BroadcastNestedLoopJoin
        val nDocs = docs(s, dir).agg(count(lit(1))).head().getLong(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("score_fp").desc, col("token"))
        tf.join(df, "token")
          // tf·N·10⁴ runs DECIMAL(38,0) (round-14 headroom audit): at
          // N ≈ 1e11 docs the all-long product passes 2^63 once tf
          // exceeds ~900 — a spammy repeated-token doc — as an ANSI
          // ArithmeticException (silent wrap with ANSI off), even
          // when the final QUOTIENT is small because df is large.
          // One decimal multiply per (doc, token) row of the tf
          // aggregate, nothing on the token explode; `div` returns
          // BIGINT so score_fp keeps its declared type (a df=1,
          // tf≥1e4 score would top int64 itself and fails overtly at
          // the declared-type boundary — the q_decay_trend precedent).
          .withColumn("score_fp",
            expr(s"(cast(tf as decimal(38,0)) * ${nDocs}L * 10000) div df"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .select(col("doc_id"), col("rnk"), col("token"), col("tf"), col("score_fp"))
          .orderBy("doc_id", "rnk")
      },
      Some("""WITH ex AS (SELECT doc_id,
             |  unnest(regexp_extract_all(text, '[a-z]+')) AS token FROM documents),
             |tf AS (SELECT doc_id, token, count(*) AS tf FROM ex GROUP BY doc_id, token),
             |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM ex GROUP BY token),
             |sc AS (SELECT t.doc_id, t.token, t.tf,
             |         CAST((CAST(t.tf AS HUGEINT) * n.n * 10000) // d.df
             |           AS BIGINT) AS score_fp
             |       FROM tf t JOIN df d ON t.token = d.token
             |       CROSS JOIN (SELECT count(*) AS n FROM documents) n),
             |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             |         ORDER BY score_fp DESC, token) AS BIGINT) AS rnk FROM sc)
             |SELECT doc_id, rnk, token, tf, score_fp FROM rk
             |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin)),

    // ── BPE merge-candidate ranking: corpus bigram frequencies ──
    // The counting step a tokenizer-training run does every merge
    // round: adjacent token pairs over the whole corpus, ranked by
    // frequency with a total tiebreak (count desc, pair asc). The
    // pair expansion is a per-row transform (linear in tokens, no
    // shuffle); the count is ONE keyed aggregate with partial
    // (map-side) combine; the top-20 plans as TakeOrderedAndProject —
    // never a full sort. At 100 TB the shuffled relation is the
    // distinct-bigram vocabulary, not the corpus.
    Q("q_vocab_bigrams",
      (s, dir) => {
        docs(s, dir)
          .select(split(col("text"), " ").as("toks"))
          // n = 1 would make sequence(1, 0) run BACKWARDS (Spark's
          // default step is -1 when start > stop) — gate it out
          .filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
              .stripMargin)).as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair"))
          .limit(20)
      },
      // positions via per-row unnest(range(...)) — the q_chunk_stride
      // idiom: UNCAPPED, so a regenerated fixture with longer docs can
      // never silently under-enumerate the oracle (round-15; the old
      // generate_series(1, 99) matched the Spark side only because
      // fixture docs stay short)
      Some("""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
             |p AS (SELECT toks[i] || ' ' || toks[i + 1] AS pair
             |      FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d))
             |SELECT pair, count(*) AS cnt FROM p
             |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 20""".stripMargin)),

    // ── bigram-LM likelihood scoring: the perplexity-filter shape ──
    // The KenLM-style quality gate every curation pipeline runs: train
    // a language model ON the corpus, score each document by how
    // likely the model finds it, drop the tail. Here the model is a
    // corpus-trained bigram table with Laplace smoothing, and the
    // score is kept RATIONAL (fp = (c2+1)·10⁶ div (c1+V), truncating
    // BIGINT division) instead of a log-prob — libm log differs across
    // engines in the last ulp (the q_tfidf idf discipline), while the
    // mean transition likelihood is bit-exact in both and orders
    // documents the same way for a fixed length. Two keyed aggregates
    // build the model; V is ONE bounded driver scalar (the q_tfidf
    // nDocs idiom); the scoring pass is a single scan. The model
    // joins carry NO broadcast hint: Laplace smoothing needs every
    // bigram (no min-count floor), and on an open-vocabulary corpus
    // the raw bigram table is Heaps-law-unbounded — AQE broadcasts
    // when the trained model is actually dictionary-sized and falls
    // back to the token-keyed shuffle the aggregates already paid
    // for otherwise (no forced-hint OOM at 100 TB).
    Q("q_lm_quality",
      (s, dir) => {
        val bg = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> named_struct('w1', element_at(toks, i),
              |                    'w2', element_at(toks, i + 1)))""".stripMargin))
            .as("p"))
          .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
        val v = docs(s, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .agg(count_distinct(col("w"))).head().getLong(0)
        val scored = bg
          .join(c2, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          // (c2+1)·10⁶ runs DECIMAL(38,0) (round-14 headroom audit):
          // c2 is a corpus-wide bigram count (~1e14 at 1e11 docs ×
          // ~1e3 tokens), so the all-long product passes 2^63 at
          // ~9e12 occurrences of ONE bigram — plausible for "the the"
          // class bigrams — as an ANSI ArithmeticException, while the
          // smoothed likelihood fp ≤ 10⁶ always fits. One decimal
          // multiply per scored transition row; `div` returns BIGINT.
          .withColumn("fp",
            expr(s"(cast(c2 + 1L as decimal(38,0)) * 1000000L) " +
              s"div (c1 + ${v}L)"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_trans"), sum(col("fp")).as("sum_fp"))
        docs(s, dir).select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .withColumn("n_trans", coalesce(col("n_trans"), lit(0L)))
          .withColumn("sum_fp", coalesce(col("sum_fp"), lit(0L)))
          .withColumn("mean_lik",
            when(col("n_trans") > 0,
              col("sum_fp").cast("double") / col("n_trans")).otherwise(0.0))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             |       FROM (SELECT doc_id, toks,
             |             unnest(range(1, len(toks))) AS i FROM d)),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
             |v AS (SELECT count(DISTINCT w) AS v FROM
             |        (SELECT unnest(string_split(text, ' ')) AS w FROM documents)),
             |sc AS (SELECT bg.doc_id,
             |         CAST((CAST(c2.c2 + 1 AS HUGEINT) * 1000000)
             |           // (c1.c1 + v.v) AS BIGINT) AS fp
             |       FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
             |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trans,
             |          CAST(sum(fp) AS BIGINT) AS sum_fp FROM sc GROUP BY doc_id)
             |SELECT dd.doc_id, coalesce(n_trans, 0) AS n_trans,
             |  coalesce(sum_fp, 0) AS sum_fp,
             |  CASE WHEN coalesce(n_trans, 0) > 0
             |       THEN CAST(sum_fp AS DOUBLE) / n_trans ELSE 0.0 END AS mean_lik
             |FROM documents dd LEFT JOIN agg ON agg.doc_id = dd.doc_id
             |ORDER BY dd.doc_id""".stripMargin)),

    // ── BM25-style ranked retrieval (rational log-free idf variant) ──
    // The IR ranking the inverted index exists to serve: top-10 docs
    // for a 3-term query with k1=6/5, b=3/4. Everything stays
    // RATIONAL: the Robertson idf's log is replaced by its argument
    // (2N−2df+1)/(2df+1) — libm log is not cross-engine safe (the
    // q_tfidf discipline). NOTE this is a deliberate VARIANT, not
    // Okapi BM25: the per-term swap is monotone, but the per-doc
    // score is a SUM across terms, and a monotone transform of each
    // addend does not preserve the ranking of sums — docs matching
    // different term subsets can order differently than under the
    // true-log score. Bm25Spec quantifies the divergence against the
    // double-precision log twin ([[bm25LogScores]], RECALL.md); this
    // rational form is the oracle-checked query. The tf
    // normalization is cleared of fractions by multiplying numerator
    // and denominator by 10·TT (TT = total corpus tokens, avgdl =
    // TT/N): score_fp = 10⁴·(2N−2df+1)·22·TT·tf /
    // ((2df+1)·(10·TT·tf + 3·TT + 9·dl·N)), one truncating division
    // per (doc, term). The cleared products run DECIMAL(38,0)
    // (round-15 audit — the old "worst factor ≈ 2·10¹⁶ at sf0.1 —
    // int64-safe" note was sf-static: at TT ≈ 1e14 tokens and
    // N ≈ 1e11 docs the all-long numerator is ~4e30·tf and the
    // denominator ~2e26·tf, both far past 2^63 — an ANSI
    // ArithmeticException under the Spark 4 default, silent wrap with
    // ANSI off — while both fit 38 digits to tf ~2e7, i.e. any real
    // document). The decimal rides the (doc, term)-grain tf rows,
    // never the token explode; `div` returns BIGINT so score_fp keeps
    // its declared type, and the DuckDB twin clears in HUGEINT.
    // Per-doc totals are INTEGER sums (order-free), so
    // the final ranking hash-matches the oracle exactly. 100 TB
    // shape: tf filters to the query terms BEFORE grouping (the scan
    // prunes to matching tokens), df and the 1-row (N, TT) aggregate
    // broadcast, dl joins tf on doc_id — one token-keyed shuffle for
    // dl, one for tf, and TakeOrderedAndProject caps the result.
    Q("q_bm25",
      (s, dir) => {
        val terms = Seq("vector", "filter", "merge")
        val dtok = docs(s, dir).select(col("doc_id"),
          explode(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("token"))
        val dl = dtok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        val glob = dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("tt"))
        val tf = dtok.filter(col("token").isin(terms: _*))
          .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
        tf.join(broadcast(dfreq), Seq("token"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(glob))
          .withColumn("score_fp", expr(
            """(10000L * cast(2L*nn - 2L*df + 1L as decimal(38,0)) * 22L * tt * tf) div
              |(cast(2L*df + 1L as decimal(38,0)) *
              |  (cast(10L as decimal(38,0))*tt*tf + 3L*tt + 9L*dl*nn))""".stripMargin))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_terms"), sum(col("score_fp")).as("bm25_fp"))
          .orderBy(col("bm25_fp").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH dtok AS (SELECT doc_id,
             |    unnest(regexp_extract_all(text, '[a-z]+')) AS token
             |  FROM documents),
             |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             |       FROM dtok GROUP BY doc_id),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS nn,
             |             CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
             |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
             |       FROM dtok WHERE token IN ('vector', 'filter', 'merge')
             |       GROUP BY doc_id, token),
             |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
             |          FROM tf GROUP BY token),
             |sc AS (SELECT tf.doc_id,
             |    CAST((10000 * CAST(2*nn - 2*df + 1 AS HUGEINT) * 22 * tt * tf)
             |      // (CAST(2*df + 1 AS HUGEINT)
             |           * (CAST(10 AS HUGEINT)*tt*tf + 3*tt + 9*dl*nn)) AS BIGINT)
             |      AS score_fp
             |  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id)
             |       CROSS JOIN g)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
             |       CAST(SUM(score_fp) AS BIGINT) AS bm25_fp
             |FROM sc GROUP BY doc_id
             |ORDER BY bm25_fp DESC, doc_id LIMIT 10""".stripMargin)),

    // ── bigram PMI: collocation strength ranking ──
    // The phrase-mining primitive (PMI = log P(xy)/(P(x)P(y))) with
    // the log dropped — the ratio itself ranks identically PER PAIR
    // and stays deterministic: all counts are exact BIGINTs, and each
    // FACTOR casts to DOUBLE individually before the multiplies
    // (round-15 audit — the old "products ≪ 2^53" note was sf-static:
    // at 1e14 corpus tokens the all-long c2·nu² is ~1e28 and would
    // ANSI-abort, and even DECIMAL(38,0) tops out at c2·nu² ~1e42;
    // each COUNT stays < 2^53 at any realistic corpus, so the
    // fixed-order double products are correctly-rounded identically
    // in both engines, and below 2^53 they are bit-identical to the
    // old exact-int path — the q_hellinger reform). Support floor
    // c2 ≥ 5 kills the
    // noise tail — but the floor applies to BIGRAMS only: the unigram
    // table joined back for cu1/cu2 stays uncapped, so it carries NO
    // broadcast hint (Heaps-law-unbounded on an open-vocabulary
    // corpus; AQE broadcasts when it is actually dictionary-sized,
    // and the floored bigram side it joins onto is already tiny).
    // 100 TB shape: map-side combine shrinks both count tables before
    // any exchange; top-20 plans as TakeOrderedAndProject, never a
    // full sort.
    Q("q_pmi",
      (s, dir) => {
        val toks = docs(s, dir).select(split(col("text"), " ").as("toks"))
        val uni = toks.select(explode(col("toks")).as("w"))
        val cu = uni.groupBy("w").agg(count(lit(1)).as("c"))
        val bg = toks.filter(size(col("toks")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, size(toks) - 1),
              |  i -> struct(element_at(toks, i) AS w1,
              |              element_at(toks, i + 1) AS w2))""".stripMargin))
            .as("p"))
          .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        val glob = uni.agg(count(lit(1)).as("nu"))
          .crossJoin(bg.agg(count(lit(1)).as("nb")))
        bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
          .filter(col("c2") >= 5L)
          .join(cu.select(col("w").as("w1"), col("c").as("cu1")), Seq("w1"))
          .join(cu.select(col("w").as("w2"), col("c").as("cu2")), Seq("w2"))
          .crossJoin(broadcast(glob))
          .withColumn("pmi", expr(
            "(CAST(c2 AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE)) " +
              "/ (CAST(nb AS DOUBLE) * CAST(cu1 AS DOUBLE) * CAST(cu2 AS DOUBLE))"))
          .select("w1", "w2", "c2", "cu1", "cu2", "pmi")
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
             |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
             |       FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)),
             |u AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
             |cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM u GROUP BY w),
             |g AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM bg) AS nb,
             |             (SELECT CAST(count(*) AS BIGINT) FROM u) AS nu),
             |p AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg
             |      GROUP BY w1, w2 HAVING count(*) >= 5)
             |SELECT w1, w2, c2, cu1.c AS cu1, cu2.c AS cu2,
             |  (CAST(c2 AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE))
             |    / (CAST(nb AS DOUBLE) * CAST(cu1.c AS DOUBLE) * CAST(cu2.c AS DOUBLE)) AS pmi
             |FROM p JOIN cu cu1 ON cu1.w = p.w1
             |       JOIN cu cu2 ON cu2.w = p.w2 CROSS JOIN g
             |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin)),

    // ── novelty scoring: fraction of a doc's shingles FIRST seen there ──
    // The marginal-contribution signal a curation pipeline ranks by:
    // how much of a document's content is new relative to everything
    // with a smaller doc_id (ingestion order). Per doc: distinct word
    // 3-grams; a shingle is NOVEL in the doc that owns its corpus-wide
    // MIN doc_id. novelty_fp = novel·10⁶ div distinct — truncating
    // BIGINT, hash-exact. Shape: shingle explode is map-only; one
    // shingle-keyed aggregate builds the first-seen table (inverted
    // index — the q_contamination machinery); one join back on the
    // shingle key. Never all-pairs, never a window over the corpus.
    // Short docs (< 3 tokens) have zero shingles → novelty 0, kept.
    Q("q_novelty",
      (s, dir) => {
        val sh = docs(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(toks) - 2),
              |  i -> concat_ws(' ', element_at(toks, i),
              |    element_at(toks, i + 1), element_at(toks, i + 2)))"""
              .stripMargin)).as("sh"))
          .distinct()
        val firstSeen = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
        val perDoc = sh.join(firstSeen, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
        docs(s, dir).select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
          .withColumn("n_novel", coalesce(col("n_novel"), lit(0L)))
          .withColumn("novelty_fp",
            when(col("n_shingles") > 0,
              expr("n_novel * 1000000L div n_shingles")).otherwise(0L))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
             |          FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |    toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS sh
             |  FROM (SELECT doc_id, toks,
             |        unnest(range(1, len(toks) - 1)) AS i FROM d)),
             |fs AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
             |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |    CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_novel
             |  FROM sh JOIN fs USING (sh) GROUP BY doc_id)
             |SELECT dd.doc_id, coalesce(n_shingles, 0) AS n_shingles,
             |  coalesce(n_novel, 0) AS n_novel,
             |  CASE WHEN coalesce(n_shingles, 0) > 0
             |       THEN (n_novel * 1000000) // n_shingles ELSE 0 END
             |    AS novelty_fp
             |FROM documents dd LEFT JOIN pd ON pd.doc_id = dd.doc_id
             |ORDER BY dd.doc_id""".stripMargin)),

    // ── positional phrase / proximity search ──
    // The retrieval verb the flat inverted index (q_inverted_index)
    // can't answer: exact phrase occurrences ("part filter" adjacent)
    // and proximity hits (the terms within 3 positions, in order),
    // per document. Shape: the positional postings of ONLY the two
    // query terms (the scan prunes on the token filter — postings
    // lists, never the corpus), doc-keyed equi join with the position
    // band as a residual; per-doc occurrence counts in one aggregate.
    // At 100 TB the positional index is a persisted artifact keyed by
    // term (the q_inverted_index build extended with posexplode), and
    // this query touches exactly two postings lists.
    Q("q_phrase_search",
      (s, dir) => {
        val pos = docs(s, dir)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos0", "w")))
          .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("w"))
        val t1 = pos.filter(col("w") === "part")
          .select(col("doc_id"), col("pos").as("p1"))
        val t2 = pos.filter(col("w") === "filter")
          .select(col("doc_id").as("d2"), col("pos").as("p2"))
        t1.join(t2, col("doc_id") === col("d2") &&
            col("p2") >= col("p1") + 1 && col("p2") <= col("p1") + 3)
          .groupBy("doc_id")
          .agg(sum(when(col("p2") === col("p1") + 1, 1L).otherwise(0L))
            .as("phrase_cnt"), count(lit(1)).as("prox_cnt"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
             |          FROM documents),
             |p AS (SELECT doc_id, i AS pos, toks[i] AS w
             |      FROM (SELECT doc_id, toks,
             |            unnest(range(1, len(toks) + 1)) AS i FROM d)),
             |t1 AS (SELECT doc_id, pos AS p1 FROM p WHERE w = 'part'),
             |t2 AS (SELECT doc_id, pos AS p2 FROM p WHERE w = 'filter')
             |SELECT doc_id,
             |  CAST(SUM(CASE WHEN p2 = p1 + 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS phrase_cnt,
             |  CAST(count(*) AS BIGINT) AS prox_cnt
             |FROM t1 JOIN t2 USING (doc_id)
             |WHERE p2 BETWEEN p1 + 1 AND p1 + 3
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
