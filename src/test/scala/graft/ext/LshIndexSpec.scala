package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The persisted LSH-index contract (ANN sibling of BandIndexSpec):
  * probing the prebuilt index must equal the in-query multi-table
  * path, and the corpus side must come from the artifact — only the
  * query vectors are read from the embeddings table. */
class LshIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("index probe equals the in-query multi-table ANN") {
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx_spec_").toString
    val v = Similarity.emb(spark, dir).select("vec_id", "e", "nrm")
      .localCheckpoint(true)
    Similarity.buildLshIndex(v, idx)
    val viaIndex = Similarity
      .annTopKAgainst(v.filter(col("vec_id") < 64), idx, 5)
      .collect().toSeq
    val inQuery = Similarity.queries.find(_.name == "q_ann_lsh_multi").get
      .fn(spark, dir).collect().toSeq
    assert(viaIndex.nonEmpty)
    assert(viaIndex == inQuery)
  }

  test("probe file scans touch only the index and the query vectors") {
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx_spec2_").toString
    Similarity.buildLshIndex(
      Similarity.emb(spark, dir).select("vec_id", "e", "nrm")
        .localCheckpoint(true), idx)
    val probe = Similarity.annTopKAgainst(
      Similarity.emb(spark, dir).select("vec_id", "e", "nrm")
        .filter(col("vec_id") < 64), idx, 5)
    val scans = probe.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.forall(p => p.contains(idx) || p.contains("embeddings")),
      s"unexpected scan targets: ${scans.mkString(", ")}")
  }
}
