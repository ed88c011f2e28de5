package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The events ts-probe's routing contract (round-12 review): only the
  * real parquet TIMESTAMP(NANOS) refusal may select the raw-long
  * `div 1000` fallback — anything else reading the micros data as
  * nanos lands every timestamp in 1970 with no error anywhere. */
class TablesSpec extends SparkSuite {

  test("native micros/NTZ events read with real timestamps") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    val y = ev.select(min(year(col("ts")))).head().getInt(0)
    assert(y > 2000, s"fixture timestamps must be modern, got year $y")
  }

  test("an un-annotated int64 ts column is refused, never unit-guessed") {
    // a generator drifting to plain int64 (no TIMESTAMP logical type)
    // probes natively as LongType; guessing the nanos fallback would
    // read micros-as-nanos -> silent 1970 timestamps. Refusal is the
    // only safe behavior.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tables-rawlong")
    val path = dir.resolve("events.parquet").toString
    Seq((1L, 1700000000000000L, 1L, "view", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(path)
    val e = intercept[IllegalStateException] {
      Tables(spark, dir.toString, "events")
    }
    assert(e.getMessage.contains("unexpected native type"), e.getMessage)
    assert(e.getMessage.contains("refusing to guess"), e.getMessage)
  }

  test("a transient failure propagates and does not poison the probe cache") {
    // missing file: must throw (not cache a fallback decision); once
    // the file appears, the same path must read fine
    val dir = Files.createTempDirectory("graft-tables-transient")
    intercept[Exception] { Tables(spark, dir.toString, "events") }
    import spark.implicits._
    Seq((1L, new java.sql.Timestamp(1700000000000L), 1L, "view", 0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dir.resolve("events.parquet").toString)
    val y = Tables(spark, dir.toString, "events")
      .select(min(year(col("ts")))).head().getInt(0)
    assert(y > 2000, s"recovered read must be native, got year $y")
  }
}
