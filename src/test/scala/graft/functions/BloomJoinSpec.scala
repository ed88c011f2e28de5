package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** The bloom prefilter's claims: (1) exact-superset — it never drops
  * a row the exact join would keep, so composed results equal the
  * plain join; (2) the PLAN puts might_contain below the join
  * exchange, where it cuts what the shuffle carries; (3) it actually
  * filters (non-matching keys dropped at the measured density). */
class BloomJoinSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("prefilter + exact join equals the plain join") {
    import spark.implicits._
    val dim = spark.range(0, 50).selectExpr("id * 3 AS k")
    val fact = spark.range(0, 20000).selectExpr("id % 400 AS k", "id AS v")
    val pre = BloomJoin.prefilter(fact, col("k"), dim, col("k"), 64L, 8192L)
    val got = pre.join(dim.distinct(), "k").agg(count(lit(1)), sum("v")).head()
    val want = fact.join(dim.distinct(), "k").agg(count(lit(1)), sum("v")).head()
    assert(got == want, s"bloom-composed $got != plain $want")
    // the prefilter really drops non-matching keys: of 400 distinct
    // fact keys only 50 match; even with false positives the kept
    // fraction must be far below 1 (fp rate at 8192 bits / 50 keys ≪ 1%)
    val kept = pre.count().toDouble / fact.count()
    assert(kept < 0.2, s"prefilter kept $kept of the fact side")
  }

  test("q_join_bloom plans might_contain below the join exchange") {
    val df = SparkEntry.queries("q_join_bloom")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom filter absent:\n" + plan.take(1500))
    // the filter must sit on the scan side (below the join), not on
    // the join output: in the formatted plan the Filter containing
    // might_contain references the fact column, and appears before
    // any join node in bottom-up order — cheap structural proxy:
    // the string index of might_contain is AFTER the last SortMergeJoin/
    // BroadcastHashJoin header index (executedPlan prints top-down,
    // children after parents)
    val joinIdx = math.max(plan.indexOf("SortMergeJoin"), plan.indexOf("BroadcastHashJoin"))
    assert(joinIdx >= 0, "no join in plan:\n" + plan.take(1500))
    assert(plan.indexOf("might_contain") > joinIdx,
      "might_contain not below the join:\n" + plan.take(2000))
  }

  test("sizing contract rejects non-positive parameters") {
    import spark.implicits._
    val d = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] {
      BloomJoin.prefilter(d, col("k"), d, col("k"), 0L, 64L)
    }
  }
}
