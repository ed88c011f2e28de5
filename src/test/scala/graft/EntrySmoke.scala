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
    spark.stop()
  }
}
