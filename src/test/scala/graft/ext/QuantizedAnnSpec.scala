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
}
