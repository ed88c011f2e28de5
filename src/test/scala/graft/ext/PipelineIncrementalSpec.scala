package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The incremental curation funnel's state contract: the daily plan
  * must read ONLY the persisted corpus-side artifacts (bucketed hash
  * table, band index, corpus profile) plus the (batch-sized,
  * materialized-once) increment — never the corpus documents table.
  * Re-scanning the corpus per day is exactly the cost the persisted
  * artifacts exist to eliminate at 100 TB. */
class PipelineIncrementalSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("daily plan reads artifacts + increment only — never corpus documents") {
    val df = graft.SparkEntry.queries("q_pipeline_incremental")(spark, dir)
    // sparkPlan, not executedPlan: AQE wraps the tree in an
    // AdaptiveSparkPlanExec whose collect() doesn't descend. The
    // fan-out aggregate (incProf) is cache()d — consumed three times —
    // so the walk must also descend through InMemoryTableScanExec into
    // the cached plan: what the cache READS is still part of what the
    // daily plan reads
    def fileScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString).toSeq
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          fileScans(m.relation.cachedPlan)
        // the cached plan is itself AQE-wrapped (collect does not
        // descend into AdaptiveSparkPlanExec's inner tree). initialPlan,
        // not executedPlan: the cache is materialized eagerly by the
        // query's key check, and AQE's FINAL plan can legitimately
        // elide scans (an empty anti-join side folds the join away),
        // while the initial plan is what the query DECLARES it reads
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          fileScans(a.initialPlan)
      }.flatten
    val scans = fileScans(df.queryExecution.sparkPlan)
    assert(scans.nonEmpty, "expected artifact file scans in the daily plan")
    assert(!scans.exists(_.contains("documents.parquet")),
      s"daily plan scanned corpus documents: ${scans.mkString(", ")}")
    // positive shape: the near-dup probe rides the band index, the
    // quota refresh rides the persisted profile
    assert(scans.exists(_.contains("band_idx")),
      s"expected a band-index scan, got: ${scans.mkString(", ")}")
    assert(scans.exists(_.contains("corpus_profile")),
      s"expected a corpus-profile scan, got: ${scans.mkString(", ")}")
    // the increment enters as the materialized-once survivor set (the
    // gating + exact anti-join ran eagerly, batch-sized)
    assert(df.queryExecution.sparkPlan.toString.contains("ExistingRDD"),
      "expected the checkpointed increment survivor set in the plan")
  }

  test("funnel composition: merged profile = corpus profile + admitted increment") {
    val out = graft.SparkEntry.queries("q_pipeline_incremental")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val corp = graft.engine.Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 7)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every corpus language survives the merge (pass-through rows)
    assert(out.keySet == corp.keySet ||
      corp.keySet.subsetOf(out.keySet), s"${out.keySet} vs ${corp.keySet}")
    // additive-merge identity per language: merged − corpus = admitted
    out.foreach { case (lang, (nDocs, _, nNew, _)) =>
      val base = corp.get(lang).map(_._1).getOrElse(0L)
      assert(nDocs - base == nNew,
        s"$lang: merged $nDocs − corpus $base != n_new $nNew")
    }
    // the increment is live at this SF: something must be admitted,
    // and quota shares must form a distribution
    assert(out.values.map(_._3).sum > 0, "expected admitted increment docs")
    val shareSum = out.values.map(_._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"shares sum to $shareSum")
  }
}
