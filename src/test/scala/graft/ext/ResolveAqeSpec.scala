package graft.ext

import graft.{SparkEntry, SparkSuite}

/** Round-9 verdict item 4: the resolve-family queries lost their r8
  * bench margin to the broadcast-hint removal, and the accepted trade
  * is only sound if AQE actually hands the node-scaled relations back
  * as runtime broadcasts when they are genuinely small. Pinned here
  * for the two largest regressors: the component-label join-back in
  * q_dedup_embed_resolve and q_entity_resolve executes as a
  * BroadcastHashJoin in the FINAL adaptive plan at test scale —
  * chosen by AQE from runtime sizes, not forced by a hint (the plans
  * contain no ResolvedHint). At 10^9 nodes the same plan degrades to
  * a shuffle join instead of an executor OOM, which is the point of
  * the removal. */
class ResolveAqeSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  Seq("q_dedup_embed_resolve", "q_entity_resolve").foreach { q =>
    test(s"$q label join-back broadcasts via AQE, not a hint") {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // executes THIS plan so AQE finalizes it in place
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"),
        s"expected an executed adaptive plan:\n${p.take(800)}")
      assert(p.contains("BroadcastHashJoin"),
        s"AQE must broadcast the component-label table at this SF:\n" +
          p.take(2000))
      val hinted = df.queryExecution.analyzed.toString.contains("ResolvedHint")
      assert(!hinted, s"$q must not force the strategy with a hint")
    }
  }
}
