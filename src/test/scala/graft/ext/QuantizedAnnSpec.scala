package graft.ext

import graft.{SparkEntry, SparkSuite}

/** Int8-quantized ANN must stay close to the exact baseline: same
  * queries, same k — the quantized top-10 should recover most of the
  * exact top-10 (SQ8 keeps ~7 bits of mantissa per element, so on any
  * non-adversarial corpus the rank error is at the list tail). Also
  * pins the exactness contract: the quantized dot is integer
  * arithmetic, so two runs are bit-identical at any parallelism.
  */
class QuantizedAnnSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("quantized recall@10 >= 0.7 of the exact brute-force top-10") {
    val exact = pairs("q_ann_bruteforce")
    val quant = pairs("q_ann_quantized")
    assert(exact.nonEmpty)
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.7, s"quantized recall $recall < 0.7")
  }

  test("quantized scores are reproducible across runs (integer dot)") {
    val a = SparkEntry.queries("q_ann_quantized")(spark, dir)
      .select("query_id", "neighbor_id", "qcos").collect().toSeq
    val b = SparkEntry.queries("q_ann_quantized")(spark, dir)
      .select("query_id", "neighbor_id", "qcos").collect().toSeq
    assert(a == b)
  }

  test("mrl recall@10 >= 0.4 at sf0.001 (deterministic — no seeds, no sampling)") {
    // on the near-uniform synthetic embeddings a 16/64-dim prefix is a
    // weak signal (RECALL.md's structural bound); measured 0.475 here,
    // and the number is exact — every stage is deterministic
    val exact = pairs("q_ann_bruteforce")
    val mrl = pairs("q_ann_mrl")
    val recall = (exact intersect mrl).size.toDouble / exact.size
    assert(recall >= 0.4, s"mrl recall $recall < 0.4")
  }

  test("mrl recall@10 >= 0.4 at sf0.01 where the prefilter actually cuts") {
    def pairsAt(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairsAt("q_ann_bruteforce")
    val mrl = pairsAt("q_ann_mrl")
    val recall = (exact intersect mrl).size.toDouble / exact.size
    assert(recall >= 0.4, s"mrl recall $recall < 0.4")
  }
}
