package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Fixture/reader drift canary (round-6 verdict item 3): the
  * TIMESTAMP_NTZ fixture regeneration produced 1970-era timestamps
  * under the old nanos÷1000 read, which SILENTLY emptied every
  * absolute-date filter while 160 hashes kept matching (both engines
  * agreed on the empty results). This spec fails LOUDLY instead:
  * every table must be non-empty, and the events timestamps must land
  * inside the generator's 2024 window — a wrong unit conversion moves
  * them by ~54 years and trips the assertion immediately.
  */
class FixtureCanarySpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("every fixture table is non-empty") {
    Tables.all.foreach { name =>
      assert(Tables(spark, sf, name).limit(1).count() == 1L,
        s"fixture table $name is empty or unreadable")
    }
  }

  test("events timestamps land in the generator's window (unit-drift canary)") {
    val inWindow = Tables(spark, sf, "events")
      .filter(col("ts") >= lit("2023-01-01") && col("ts") < lit("2026-01-01"))
      .count()
    assert(inWindow > 0L,
      "no events inside 2023-2026 — ts reader/fixture unit drift " +
        "(nanos read as micros lands in 1970; micros read as nanos in 2000s±)")
    // and the date-filter surface the original bug silently emptied:
    // a day-grain absolute filter must select rows
    val oneDay = Tables(spark, sf, "events")
      .filter(to_date(col("ts")) === lit("2024-01-05")).count()
    assert(oneDay > 0L, "an absolute-date filter selects nothing — drift")
  }
}
