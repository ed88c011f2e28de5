package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Loader for the driver's parquet test tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * map to its microsecond TimestampType. An explicit LongType schema
    * reads the raw nanos WITHOUT any session-global legacy flag; the
    * generator emits whole microseconds, so `div 1000` is exact. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events")
      spark.read.schema(eventsRawSchema).parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else spark.read.parquet(s"$dir/$name.parquet")
}
