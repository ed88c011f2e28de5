package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.queries.Q

/** Round-7 text-statistics extension: bigram language-model scoring,
  * vocabulary coverage curves, and top-k term drift — the corpus-audit
  * operators a training-data pipeline runs before tokenizer/mixture
  * decisions. Determinism: every per-token rational goes through the
  * [[TextAnalysis]] DECIMAL(18,12) fixed-point idiom (identical
  * quantization in Spark and DuckDB) so order-free sums hash-match;
  * ranks break ties lexicographically.
  */
object TextAnalysis2 {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  val queries: Seq[Q] = Seq(

    // ── add-one-smoothed bigram LM score per document ──
    // The rational (log-free) LM quality signal: avg over a doc's
    // bigrams of p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V), with c from the
    // corpus itself and V = |vocab|. Each p is one double division
    // (identical in both engines) quantized to DECIMAL(18,12) so the
    // per-doc SUM is order-free-exact; the average is one final cast
    // + divide. A log-perplexity twin would only differ by the libm
    // log (the q_bm25 precedent — rational form is the oracle-able
    // one). Shape at 100 TB: the count-model joins carry NO
    // broadcast hint — add-one smoothing forbids a min-count floor,
    // so the raw bigram/unigram tables are Heaps-law-unbounded on an
    // open-vocabulary corpus and a forced hint is the OOM class the
    // round-8 audit removed elsewhere. AQE broadcasts them when the
    // model is actually dictionary-sized (Stats2PlanSpec pins the
    // sf0.001 runtime plan) and shuffles otherwise; the lead()
    // window partitions per doc (no global sort).
    Q("q_bigram_lm",
      (s, dir) => {
        val toks = docs(s, dir).select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
        val big = toks
          .withColumn("w2", lead(col("w"), 1).over(byDoc))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("w").as("w1"), col("w2"))
        val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
        val v = toks.agg(countDistinct(col("w")).as("v"))
        big
          .join(c12, Seq("w1", "w2"))
          .join(c1, Seq("w1"))
          .crossJoin(broadcast(v))
          .withColumn("p", expr(
            "CAST(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE) AS DECIMAL(18,12))"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            (sum(col("p")).cast("double") / count(lit(1))).as("avg_p"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
             |          FROM documents),
             |big AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
             |        FROM (SELECT doc_id, toks,
             |              unnest(range(1, len(toks))) AS i FROM d)),
             |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
             |        FROM big GROUP BY w1, w2),
             |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
             |       FROM big GROUP BY w1),
             |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM
             |      (SELECT unnest(string_split(text, ' ')) AS w FROM documents))
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(SUM(CAST(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)
             |    AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS avg_p
             |FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ── vocabulary coverage curve (top-k token mass) ──
    // Tokenizer-design primitive: what fraction of corpus token mass
    // do the k most frequent terms cover? Terms ranked by (count
    // desc, term) — the lexicographic tie-break makes the curve
    // deterministic; coverage = cum/total is one double division per
    // emitted k. The one full pass is the term-count aggregate.
    // Scale shape (round-17): the curve only emits k ≤ 31, so the
    // rank window never touches the raw dictionary — vocab grows
    // Heaps-law-sublinearly but is NOT corpus-independent, so the
    // top-31 terms are first selected by a distributed
    // orderBy().limit() (TakeOrderedAndProject: per-partition top-31,
    // merged — no single-task vocab sort) and the window runs over
    // exactly ≤31 rows. The strict (cnt DESC, w) total order makes
    // the capped ranks identical to ranks over the full dictionary;
    // total token mass comes from a separate map-side-combined
    // aggregate, broadcast back — hash-identical to the uncapped
    // form, which the DuckDB twin keeps as the independent oracle.
    Q("q_vocab_coverage",
      (s, dir) => {
        val freq = docs(s, dir)
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cnt"))
          // pinned: the top-31 selection AND the total-mass aggregate
          // both consume freq, and pruning defeats exchange reuse —
          // one docs scan, vocab-grain materialization (round-17
          // review)
          .localCheckpoint()
        val top = freq.orderBy(col("cnt").desc, col("w")).limit(31)
        val ord = Window.orderBy(col("cnt").desc, col("w"))
        val cum = Window.orderBy(col("cnt").desc, col("w"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        top
          .withColumn("k", row_number().over(ord).cast("long"))
          .withColumn("cum", sum(col("cnt")).over(cum))
          .crossJoin(broadcast(freq.agg(sum(col("cnt")).as("total"))))
          .filter(col("k").isin(1L, 2L, 4L, 8L, 16L, 31L))
          .select(col("k"), col("w"), col("cnt"), col("cum"),
            (col("cum").cast("double") / col("total").cast("double"))
              .as("coverage"))
          .orderBy("k")
      },
      Some("""WITH freq AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM
             |  (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  GROUP BY w),
             |rk AS (SELECT w, cnt,
             |  CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT) AS k,
             |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, w
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             |  CAST(SUM(cnt) OVER () AS BIGINT) AS total
             |  FROM freq)
             |SELECT k, w, cnt, cum,
             |  CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
             |FROM rk WHERE k IN (1, 2, 4, 8, 16, 31) ORDER BY k""".stripMargin)),

    // ── top-k term drift between two corpus shards ──
    // Distribution-drift monitor: rank the top-10 terms in each
    // doc_id-parity shard and report the union with both ranks (NULL
    // = absent from that shard's top-10). The deterministic (count
    // desc, term) rank makes the drift table stable; downstream, the
    // NULL pattern IS the drift signal (Jaccard computes from it).
    // The parity split reuses one scan (conditional aggregation, not
    // two scans). Scale shape (round-17): only ranks ≤ 10 survive,
    // so neither rank window runs over the vocab-sized count table
    // (Heaps-law sublinear, not corpus-independent) — each shard's
    // top-10 is selected by a distributed orderBy().limit(10)
    // (TakeOrderedAndProject) and ranked over its own ≤10-row frame;
    // the strict (count DESC, term) total order makes the capped
    // ranks identical to full-table ranks, and the full-outer join
    // on the term reconstructs the union with NULLs exactly where
    // the old rank>10 filter produced them. Hash-identical to the
    // uncapped form, which the DuckDB twin keeps as the independent
    // oracle of the rewrite.
    Q("q_topk_drift",
      (s, dir) => {
        val cnts = docs(s, dir)
          .select((col("doc_id") % 2 === 0).as("even"),
            explode(split(col("text"), " ")).as("w"))
          .groupBy("w")
          .agg(sum(when(col("even"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("even"), 1L).otherwise(0L)).as("cb"))
          // pinned: both shard top-10s consume cnts — one docs scan,
          // vocab-grain materialization (round-17 review)
          .localCheckpoint()
        val ta = cnts.orderBy(col("ca").desc, col("w")).limit(10)
          .withColumn("rank_a", row_number()
            .over(Window.orderBy(col("ca").desc, col("w"))).cast("long"))
        val tb = cnts.orderBy(col("cb").desc, col("w")).limit(10)
          .withColumn("rank_b", row_number()
            .over(Window.orderBy(col("cb").desc, col("w"))).cast("long"))
        ta.join(tb, Seq("w", "ca", "cb"), "full_outer")
          .select(col("w"), col("rank_a"), col("rank_b"),
            col("ca"), col("cb"))
          .orderBy("w")
      },
      Some("""WITH cnts AS (
             |  SELECT w,
             |    CAST(SUM(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |    CAST(SUM(CASE WHEN NOT even THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |  FROM (SELECT doc_id % 2 = 0 AS even,
             |          unnest(string_split(text, ' ')) AS w FROM documents)
             |  GROUP BY w),
             |rk AS (SELECT w, ca, cb,
             |  CAST(row_number() OVER (ORDER BY ca DESC, w) AS BIGINT) AS rank_a,
             |  CAST(row_number() OVER (ORDER BY cb DESC, w) AS BIGINT) AS rank_b
             |  FROM cnts)
             |SELECT w,
             |  CASE WHEN rank_a <= 10 THEN rank_a END AS rank_a,
             |  CASE WHEN rank_b <= 10 THEN rank_b END AS rank_b,
             |  ca, cb
             |FROM rk WHERE rank_a <= 10 OR rank_b <= 10
             |ORDER BY w""".stripMargin)),

    // ── Simpson lexical diversity per document source ──
    // λ = Σ c(c−1) / (n(n−1)) — the probability two tokens drawn
    // without replacement from a source's stream are the same type.
    // EXACT integers end to end, one double division; 1/λ is the
    // "effective vocabulary". The per-(source, term) count is the one
    // full pass; the source rollup is dictionary×sources-sized. The
    // log-free twin of Shannon diversity — same reason q_bm25 ships
    // its rational idf. Σc(c−1) and n(n−1) run DECIMAL(38,0)
    // (round-14 headroom audit — this query's old "~1e5× headroom"
    // note measured sf0.1 and forgot c scales LINEARLY with the
    // corpus): at ~1e13 tokens/source a stopword's c(c−1) is ~1e25
    // and n(n−1) ~1e26, both far past 2^63 — ANSI ArithmeticException
    // under the Spark 4 default (silent wrap with ANSI off) while the
    // DuckDB twin computes HUGEINT. The decimal lands on the
    // dictionary-grain count table and the per-source moment rows,
    // never the token explode; decimal→double rounds identically to
    // long→double on the same integer, so tested-SF hashes pin.
    Q("q_simpson",
      (s, dir) => {
        val dec = (x: org.apache.spark.sql.Column) =>
          x.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val c = docs(s, dir)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val lam = (col("sc").cast("double") /
          (dec(col("n")) * (col("n") - 1)).cast("double"))
        c.groupBy("source")
          .agg(sum(col("c")).as("n"), countDistinct(col("w")).as("vocab"),
            sum(dec(col("c")) * (col("c") - 1)).as("sc"))
          .select(col("source"), col("n"), col("vocab"), lam.as("simpson"),
            (lit(1.0) / lam).as("eff_vocab"))
          .orderBy("source")
      },
      Some("""WITH c AS (
             |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM
             |  (SELECT source, unnest(string_split(text, ' ')) AS w
             |   FROM documents) GROUP BY source, w),
             |m AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
             |  CAST(count(DISTINCT w) AS BIGINT) AS vocab,
             |  SUM(CAST(c AS HUGEINT) * (c - 1)) AS sc
             |  FROM c GROUP BY source)
             |SELECT source, n, vocab,
             |  CAST(CAST(sc AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(n AS HUGEINT) * (n - 1) AS VARCHAR) AS DOUBLE)
             |    AS simpson,
             |  1.0 / (CAST(CAST(sc AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(n AS HUGEINT) * (n - 1) AS VARCHAR) AS DOUBLE))
             |    AS eff_vocab
             |FROM m ORDER BY source""".stripMargin)),

    // ── RAKE keyword extraction (degree/frequency over stopword-split
    // phrases) ──
    // Candidate phrases are maximal stopword-free runs (stopwords:
    // 'a', 'the' in this corpus); a word's degree sums the lengths of
    // every phrase containing it, and score = degree/freq favors
    // words that co-occur in long phrases. Phrase ids come from a
    // CUMULATIVE stopword count per document (a per-doc window — no
    // global sort); degree/freq are exact ints and the score is one
    // double division. Both count tables are dictionary-sized, so
    // the ranking window is bounded at any corpus size.
    Q("q_rake",
      (s, dir) => {
        val stop = Seq("a", "the")
        val pos = docs(s, dir).select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val byDoc = Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cw = pos
          .withColumn("pid",
            sum(when(col("w").isin(stop: _*), 1L).otherwise(0L)).over(byDoc))
          .filter(!col("w").isin(stop: _*))
          .select(col("doc_id"), col("pid"), col("w"))
        val plen = cw.groupBy("doc_id", "pid").agg(count(lit(1)).as("plen"))
        cw.join(plen, Seq("doc_id", "pid"))
          .groupBy("w")
          .agg(sum(col("plen")).as("degree"), count(lit(1)).as("freq"))
          .withColumn("score",
            col("degree").cast("double") / col("freq").cast("double"))
          .orderBy(col("score").desc, col("w"))
          .limit(15)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
             |          FROM documents),
             |p AS (SELECT doc_id, i AS pos, toks[i] AS w
             |      FROM (SELECT doc_id, toks,
             |            unnest(range(1, len(toks) + 1)) AS i FROM d)),
             |s AS (SELECT doc_id, pos, w,
             |  CAST(SUM(CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END)
             |    OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pid
             |  FROM p),
             |cw AS (SELECT doc_id, pid, w FROM s WHERE w NOT IN ('a', 'the')),
             |plen AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS plen
             |  FROM cw GROUP BY doc_id, pid),
             |deg AS (SELECT w, CAST(SUM(plen) AS BIGINT) AS degree,
             |  CAST(count(*) AS BIGINT) AS freq
             |  FROM cw JOIN plen USING (doc_id, pid) GROUP BY w)
             |SELECT w, degree, freq,
             |  CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS score
             |FROM deg ORDER BY score DESC, w LIMIT 15""".stripMargin)))
}
