package graft.ext

import graft.{SparkEntry, SparkSuite}

/** The persisted vector-pair artifact's contract: after the build,
  * the pair query is a pure probe — its plan scans ONLY the artifact
  * (no embeddings scan, no bucket explode, no verify joins). */
class VecPairsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q_dedup_embed probes the artifact: one scan, no explode, no join") {
    val df = SparkEntry.queries("q_dedup_embed")(spark, sf)
    df.collect() // force the build (first call pays it)
    val plan = SparkEntry.queries("q_dedup_embed")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "probe plan scans the embeddings table:\n" + plan.take(1500))
    assert(!plan.contains("Generate") && !plan.contains("Join"),
      "probe plan re-runs candidate generation:\n" + plan.take(1500))
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly the artifact scan, got $scans")
  }

  test("resolve equals pair-closure: every kept id is its cluster min") {
    import org.apache.spark.sql.functions._
    val resolve = SparkEntry.queries("q_dedup_embed_resolve")(spark, sf)
    val bad = resolve.filter(col("is_kept") && col("keep_id") =!= col("vec_id")).count()
    assert(bad == 0)
    // keep_id is always <= vec_id (min-label components)
    val order = resolve.filter(col("keep_id") > col("vec_id")).count()
    assert(order == 0, s"$order rows with keep_id above vec_id")
  }
}
