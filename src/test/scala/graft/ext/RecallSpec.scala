package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Recall floors for the approximate candidate generators (measured
  * sweeps in RECALL.md; this spec pins the shipped configurations so a
  * parameter regression fails the build). Corpus and ground truth are
  * deterministic, so the asserted numbers are exact reproductions. */
class RecallSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Brute-force cosine top-k truth over the PRODUCTION embedding prep
    * ([[Similarity.emb]]) for an arbitrary query predicate. */
  private def bruteTruth(queryPred: org.apache.spark.sql.Column, k: Int): Set[(Long, Long)] = {
    val v = Similarity.emb(spark, dir).select("vec_id", "e", "nrm")
    val q = v.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        graft.functions.VecOps.vec_dot(col("qe"), col("e")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    pairs(scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k).select("query_id", "vec_id"))
  }

  test("shipped MinHash-LSH (4 bands x 2) recall >= 0.95 on the labeled corpus") {
    val sh = Dedup.shingled(RecallHarness.labeledCorpus(spark)).cache()
    try {
      val truth = RecallHarness.truthPairs(sh, 0.8)
      val pr = RecallHarness.prOf(Dedup.bandCandidates(sh), truth)
      assert(pr.nTruth > 100, s"degenerate truth set: ${pr.nTruth}")
      assert(pr.recall >= 0.95, s"recall ${pr.recall} (measured 0.9925 at ship time)")
    } finally sh.unpersist()
  }

  test("trained IVF (nprobe 2/16) recall@5 >= 0.3 vs brute force") {
    val truth = bruteTruth(col("vec_id") >= 100 && col("vec_id") < 108, 5)
    val ivf = Similarity.queries.find(_.name == "q_ann_ivf").get
    val got = pairs(ivf.fn(spark, dir).select("query_id", "neighbor_id"))
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.3, s"IVF recall $recall (measured 0.375 at ship time)")
  }

  test("embed near-dup candidates (8x6 sign buckets) recall >= 0.3 at cos >= 0.4") {
    val (_, pr) = RecallHarness.embedDedupSweep(spark, dir, Seq(0.4)).head
    assert(pr.nTruth >= 50, s"degenerate truth set: ${pr.nTruth}")
    assert(pr.recall >= 0.3, s"recall ${pr.recall} (measured 0.3939 at ship time)")
  }

  test("clustered fixture: shipped configs reach production-grade recall") {
    // the driver embeddings are near-uniform — the documented LSH/IVF
    // worst case; this planted-centroid fixture has the separation
    // profile of real embedding corpora (intra-cluster cos ~0.86,
    // inter ~0.12) and the same shipped parameters must recover
    // production-grade recall there (measured at ship time: 8x6 LSH
    // 0.97, IVF 1.00, MRL 0.75, single-bucket-8 0.23 — all exact
    // reproductions, the fixture and planes are seeded)
    val cv = RecallHarness.clusteredEmb(spark).cache()
    try {
      cv.count()
      val truth = pairs(RecallHarness.annTopKV(cv, 0, 5, 64))
      val single = pairs(RecallHarness.annTopKV(cv, 8, 5, 64))
      val (multiDf, _) = RecallHarness.annTopKMultiV(cv,
        Similarity.lshTables, Similarity.lshPlanesPerTable, 5, 64)
      val rSingle = (single & truth).size.toDouble / truth.size
      val rMulti = (pairs(multiDf) & truth).size.toDouble / truth.size
      assert(rMulti >= 0.9, s"clustered 8x6 recall $rMulti (measured 0.9719)")
      assert(rSingle >= 0.15, s"clustered single-8 recall $rSingle (measured 0.2344)")
      assert(RecallHarness.ivfRecall(cv) >= 0.95,
        "clustered IVF recall (measured 1.0000)")
      assert(RecallHarness.mrlRecall(cv) >= 0.7,
        "clustered MRL recall (measured 0.7500)")
    } finally cv.unpersist()
  }

  test("multi-table LSH ANN (8x6) recall@5 >= 0.25 and >> single-bucket") {
    val truth = bruteTruth(col("vec_id") < 64, 5)
    val single = pairs(RecallHarness.annTopK(spark, dir, 8, 5, 64))
    val (multiDf, _) = RecallHarness.annTopKMulti(spark, dir,
      Similarity.lshTables, Similarity.lshPlanesPerTable, 5, 64)
    val multi = pairs(multiDf)
    val rMulti = (multi & truth).size.toDouble / truth.size
    val rSingle = (single & truth).size.toDouble / truth.size
    assert(rMulti >= 0.25, s"multi-table recall $rMulti (measured 0.31 at ship time)")
    assert(rMulti > rSingle * 5, s"multi $rMulti vs single $rSingle")
  }
}
