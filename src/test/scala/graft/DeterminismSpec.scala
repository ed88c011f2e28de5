package graft

import org.apache.spark.sql.SparkSession

/** Declared-query output must never depend on physical execution
  * choices — the property the reference implicitly relied on (its D4
  * hash bucketing leaked into file layout but not results) and the one
  * that makes 1000-executor runs reproducible. */
class DeterminismSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private def collectAll(s: SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(s, dir).collect().map(_.toString).toSeq

  test("representative queries are invariant to shuffle partition count") {
    val names = Seq("q_groupby_sum", "q_dedup_minhash", "q_asof_join",
      "q_window_rank", "q_ann_lsh", "q_chain",
      // round-4 additions: hash-order quota window, integer-dot ANN,
      // fixed-point-normalized shares, decimal HAVING, inverted-index
      // span scoring — each a distinct determinism mechanism
      "q_sample_quota", "q_ann_quantized", "q_mix_weights",
      "q_tpch_q18", "q_dedup_substring",
      // round-7 additions: DECIMAL(38) moment accumulation, double
      // PMI ratio under top-k, converged pointer-jumping labels,
      // per-shard rank windows, min-doc first-seen attribution
      "q_standardize", "q_pmi", "q_graph_cc", "q_shard_shuffle",
      "q_novelty",
      // round-7 session-2 additions, one per new mechanism: wide-
      // decimal cleared moments (corr), doubled tie-averaged ranks on
      // a no-partition window (mannwhitney), DECIMAL-quantized
      // rational sums (anova, bigram LM), bounded pair self-product
      // argmin (theilsen), WindowGroupLimit rank-1 (attribution),
      // jackknife block replicates, bottom-k hash minima
      "q_corr", "q_mannwhitney", "q_anova", "q_bigram_lm",
      "q_theilsen", "q_attribution", "q_jackknife", "q_bottomk")
    val base = names.map(n => n -> collectAll(spark, n)).toMap
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      names.foreach { n =>
        assert(collectAll(spark, n) == base(n), s"$n changed under 1 partition")
      }
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      names.foreach { n =>
        assert(collectAll(spark, n) == base(n), s"$n changed under 17 partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
