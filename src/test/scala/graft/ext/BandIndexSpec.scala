package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The persisted band-index contract: probing a prebuilt index must
  * (a) compute the exact same relation as the in-query corpus path and
  * (b) touch ONLY the index artifact on the corpus side — the entire
  * point of the artifact is that the daily probe never re-reads or
  * re-shingles the corpus table.
  */
class BandIndexSpec extends SparkSuite {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // corpus with a near-dup pair family + distinct docs; increment
  // carries one near-dup of the corpus and one novel doc
  private val base =
    "the quick brown fox jumps over the lazy dog again and again today " +
      "while the rain falls softly on the quiet green hills of the north"
  private val corpus = mkDocs(Seq(
    1L -> base,
    2L -> (base + " extra"),
    3L -> ("completely different words about spark engines and parquet files " +
      "built for large scale analytics pipelines running every single day"),
    4L -> base.replace("fox", "cat")))
  private val inc = mkDocs(Seq(
    101L -> (base + " tonight"),
    102L -> ("nothing like anything else in this tiny corpus at all truly " +
      "unique content that shares no shingles with any other document")))

  test("index probe equals the in-query incremental path") {
    val idx = java.nio.file.Files.createTempDirectory("band_idx_spec_").toString
    Dedup.buildBandIndex(corpus, idx)
    val viaIndex = Dedup.incrementalNearDupsAgainst(inc, idx, 0.5)
      .orderBy("doc_id", "dup_of").collect().toSeq
    val direct = Dedup.incrementalNearDups(inc, corpus, 0.5)
      .orderBy("doc_id", "dup_of").collect().toSeq
    assert(viaIndex == direct)
    assert(viaIndex.nonEmpty, "expected at least one verified near-dup")
    assert(viaIndex.forall(_.getLong(0) == 101L),
      "only the near-dup increment doc should match")
  }

  test("probe plan's file scans read only the index artifact") {
    val idx = java.nio.file.Files.createTempDirectory("band_idx_spec2_").toString
    Dedup.buildBandIndex(corpus, idx)
    val probe = Dedup.incrementalNearDupsAgainst(inc, idx, 0.5)
    // sparkPlan, not executedPlan: AQE wraps the tree in an
    // AdaptiveSparkPlanExec whose collect() doesn't descend
    val scans = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.nonEmpty, "expected the probe to scan the index files")
    assert(scans.forall(_.contains(idx)),
      s"probe scanned non-index files: ${scans.mkString(", ")}")
  }

  test("skew cap is baked into the artifact") {
    // 10 identical docs all land in the same band buckets; cap 2 must
    // bound artifact bucket membership at build time
    val dupCorpus = mkDocs((1L to 10L).map(i => i -> base))
    val idx = java.nio.file.Files.createTempDirectory("band_idx_spec3_").toString
    Dedup.buildBandIndex(dupCorpus, idx, cap = 2)
    val perBucket = spark.read.parquet(s"$idx/buckets")
      .groupBy("band", "sig").count().agg(max("count")).head().getLong(0)
    assert(perBucket <= 2, s"bucket membership $perBucket exceeds cap")
  }
}
