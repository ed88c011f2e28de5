package graft.ext

import graft.{SparkEntry, SparkSuite}

/** Plan contracts for the round-5 analytics operators — the scale
  * claims live in the physical plan, not the row counts. */
class AnalyticsPlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_sample_weighted plans TakeOrderedAndProject, no exchange") {
    val p = plan("q_sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a partial heap merge, not a full sort:\n" + p.take(1200))
    // the lottery priority is a per-row expression — the ONLY data
    // movement is the driver-side 50-row heap merge
    assert(!p.contains("Exchange"),
      "weighted sampling must not shuffle the corpus:\n" + p.take(1200))
  }

  test("q_lm_quality model joins broadcast at runtime via AQE, not a hint") {
    // Round-9: the c2/c1 hints are gone (Laplace smoothing forbids a
    // min-count floor → the raw tables are corpus-vocab-scaled and a
    // forced hint is a 100 TB OOM). AQE must still converge on
    // broadcasts at this SF where the model IS dictionary-sized.
    val df = SparkEntry.queries("q_lm_quality")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "AQE must broadcast the dictionary-sized model joins:\n" + p.take(2000))
  }

  test("q_assoc_rules: top-k is partial (TakeOrderedAndProject)") {
    val p = plan("q_assoc_rules")
    assert(p.contains("TakeOrderedAndProject"),
      "rule ranking must not full-sort the pair relation:\n" + p.take(1200))
  }

  test("q_pmi: unigram joins AQE-broadcast at runtime, top-20 is partial") {
    // Round-9: the cu hints are gone (the ≥5 floor applies to bigrams
    // only; the unigram table stays uncapped → no forced broadcast).
    val df = SparkEntry.queries("q_pmi")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "AQE must broadcast the dictionary-sized unigram joins:\n" + p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "PMI top-20 must not full-sort the bigram vocabulary:\n" + p.take(1200))
  }

  test("q_feature_hash: one shuffle (the keyed count), explode is map-side") {
    val p = plan("q_feature_hash")
    // feature expansion + hashing ride the scan; the only exchanges
    // are the (user, slot) aggregate and the presentation sort
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"feature hashing grew $exchanges exchanges:\n" + p.take(1500))
  }

  test("q_standardize and q_target_encode broadcast their moment tables") {
    Seq("q_standardize", "q_target_encode").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$q must broadcast the group moments, not shuffle the fact side:\n" +
          p.take(1500))
    }
  }

  test("graph consumers scan the bucketed co-purchase artifact exchange-free on u") {
    // the artifact IS the shuffle: adjacency/degree aggregates keyed on
    // u must consume the bucket layout, not re-exchange the edge list
    val p = plan("q_triangles")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "q_triangles must scan the bucketed part_cooc artifact:\n" + p.take(1500))
    assert(!p.contains("Exchange hashpartitioning(u#") ||
      !p.contains("Exchange hashpartitioning(u,"),
      "edge-side exchange on u found:\n" + p.take(1500))
  }

  test("q_rolling_active expands the day-sized activation relation only") {
    val df = SparkEntry.queries("q_rolling_active")(spark, sf)
    // correctness of the window semantics: WAU(d) >= DAU(d) always,
    // and WAU(d) >= DAU(d-1 .. d-6) users seen that day still count
    val rows = df.collect().map(r =>
      (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau) =>
      assert(wau >= dau, s"day $d: wau $wau < dau $dau")
    }
    // first observed day: the window covers only that day => wau == dau
    val first = rows.minBy(_._1)
    assert(first._2 == first._3,
      s"first day ${first._1}: wau ${first._3} != dau ${first._2}")
  }
}
