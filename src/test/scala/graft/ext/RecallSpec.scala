package graft.ext

import graft.SparkSuite

/** Recall floors for the approximate candidate generators (measured
  * sweeps in RECALL.md; this spec pins the shipped configurations so a
  * parameter regression fails the build). Corpus and ground truth are
  * deterministic, so the asserted numbers are exact reproductions. */
class RecallSpec extends SparkSuite {

  test("shipped MinHash-LSH (4 bands x 2) recall >= 0.95 on the labeled corpus") {
    val sh = Dedup.shingled(RecallHarness.labeledCorpus(spark)).cache()
    try {
      val truth = RecallHarness.truthPairs(sh, 0.8)
      val pr = RecallHarness.prOf(Dedup.bandCandidates(sh), truth)
      assert(pr.nTruth > 100, s"degenerate truth set: ${pr.nTruth}")
      assert(pr.recall >= 0.95, s"recall ${pr.recall} (measured 0.9925 at ship time)")
    } finally sh.unpersist()
  }

  test("multi-table LSH ANN (8x6) recall@5 >= 0.25 and >> single-bucket") {
    val dir = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(RecallHarness.annTopK(spark, dir, 0, 5, 64))
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
