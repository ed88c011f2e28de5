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

  /** True only for the ONE failure that selects the raw-nanos fallback:
    * Spark 4 refusing to map parquet TIMESTAMP(NANOS) into its
    * microsecond TimestampType at footer-schema conversion
    * (PARQUET_TYPE_ILLEGAL / "Illegal Parquet type ... NANOS"). Any
    * other exception — transient IO, a momentarily-absent file — must
    * PROPAGATE, never silently pick the `div 1000` read: a micros file
    * flowing through the nanos path yields 1970-era timestamps and
    * silently empties every absolute-date filter. */
  private def isNanosRefusal(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    // NANOS must co-occur with the parquet marker: a bare
    // PARQUET_TYPE_ILLEGAL clause would match ANY illegal-typed column
    // (e.g. a TIME(MILLIS) field beside a perfectly valid micros ts)
    // and route the file into the div-1000 read — the exact
    // silent-1970 corruption this predicate exists to prevent
    // (round-12 review, reproduced live)
    (m.contains("NANOS") &&
      (m.contains("Parquet") || m.contains("PARQUET"))) ||
      Option(e.getCause).exists(isNanosRefusal)
  }

  private def eventsNative(spark: SparkSession, path: String): Boolean = {
    val cached = tsNative.get(path)
    if (cached != null) cached.booleanValue()
    else {
      // probe OUTSIDE the cache insert: a non-NANOS failure rethrows
      // and leaves the cache empty, so a transient error can't poison
      // the path's reader choice for the rest of the JVM
      val native =
        try {
          spark.read.parquet(path).schema("ts").dataType match {
            case TimestampType | TimestampNTZType => true
            // an unexpected NATIVE ts type (e.g. a generator drifting
            // to plain un-annotated int64) must THROW, not guess: the
            // div-1000 fallback is exact only for the NANOS refusal,
            // and guessing here reads micros-as-nanos — silent
            // 1970-era timestamps (round-12 review, reproduced live)
            case other => throw new IllegalStateException(
              s"events.ts at $path has unexpected native type " +
                s"${other.catalogString} — expected a parquet TIMESTAMP " +
                "(micros or NTZ), or TIMESTAMP(NANOS) which selects the " +
                "raw-long fallback; refusing to guess a unit")
          }
        } catch { case e: Exception if isNanosRefusal(e) => false }
      tsNative.put(path, native)
      native
    }
  }

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
