package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Loader for the driver's parquet test tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fallback for generators that write events.ts as parquet
    * TIMESTAMP(NANOS), which Spark 4 refuses to map to its microsecond
    * TimestampType. An explicit LongType schema reads the raw nanos
    * WITHOUT any session-global legacy flag; those generators emit
    * whole microseconds, so `div 1000` is exact. */
  private val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Whether `path`'s ts column reads natively — TIMESTAMP(MICROS)
    * (isAdjustedToUTC either way; sessions pin UTC, so the NTZ cast is
    * the identity wall-clock). Probed ONCE per path by asking Spark for
    * the footer schema — the NANOS case throws at schema conversion,
    * never at execution. */
  private val tsNative = new ConcurrentHashMap[String, java.lang.Boolean]()

  private def eventsNative(spark: SparkSession, path: String): Boolean =
    tsNative.computeIfAbsent(path, { p =>
      try {
        spark.read.parquet(p).schema("ts").dataType match {
          case TimestampType | TimestampNTZType => true
          case _ => false
        }
      } catch { case _: Exception => false }
    })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      val path = s"$dir/$name.parquet"
      if (eventsNative(spark, path))
        spark.read.parquet(path)
          .withColumn("ts", expr("cast(ts as timestamp)"))
      else
        spark.read.schema(eventsRawSchema).parquet(path)
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
}
