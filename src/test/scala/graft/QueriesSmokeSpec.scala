package graft

/** Every declared query runs on sf0.001 and yields a NON-EMPTY
  * result. (Value correctness is the driver's DuckDB gate —
  * scripts/check.py.) The non-emptiness floor is the vacuity guard:
  * an oracle hash-match on an empty result proves nothing — both the
  * TIMESTAMP_NTZ drift (160 silently-empty date filters) and the
  * original q_join_range (events-2024 ⋈ orders-1998, structurally
  * zero rows) sailed through the gate green. Any query whose empty
  * result is ever LEGITIMATE must be listed in `mayBeEmpty` with a
  * reason — currently none are. */
class QueriesSmokeSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  private val mayBeEmpty: Set[String] = Set.empty

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (mayBeEmpty(name)) assert(n >= 0)
      else assert(n > 0, s"$name returned ZERO rows at sf0.001 — vacuous " +
        "evidence; fix the query parameters or justify it in mayBeEmpty")
    }
  }

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
