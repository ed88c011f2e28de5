package graft

import org.apache.spark.sql.SparkSession

/** Manual driver-style smoke: `sbt "Test/runMain graft.EntrySmoke"` —
  * calls SparkEntry.entry exactly as the driver does and prints the
  * row count (driver checks rows > 0). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, false)
    println(s"ENTRY_ROWS=${df.count()}")
    // fixture canary (FixtureCanarySpec is the test-suite twin): a
    // ts-unit drift silently empties every absolute-date filter while
    // hashes keep matching — fail the smoke loudly instead
    val sf = "/root/testdata/sf0.001"
    val canary = graft.engine.Tables(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("ts") >= "2023-01-01" &&
        org.apache.spark.sql.functions.col("ts") < "2026-01-01").count()
    require(canary > 0L,
      "CANARY: no events in 2023-2026 — fixture/reader ts drift")
    println(s"CANARY_EVENT_ROWS=$canary")
    spark.stop()
  }
}
