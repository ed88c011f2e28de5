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

  /** Primary key per table — the deterministic shuffle key for the
    * starved-scan fan-out below (hash on a unique key spreads evenly
    * and, unlike round-robin `repartition(n)`, needs no
    * sort-before-repartition pass and assigns rows to partitions
    * independently of input order). */
  private val pk: Map[String, String] = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** (rowGroups, rows) of a parquet file, probed once per path from
    * the footer (the [[tsNative]] discipline — the footer is already
    * read once per path for the events ts-type probe). */
  private val layout = new ConcurrentHashMap[String, (Int, Long)]()

  private def fileLayout(spark: SparkSession, path: String): (Int, Long) = {
    val hit = layout.get(path)
    if (hit != null) hit
    else {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(path)
      val v =
        if (p.getFileSystem(conf).getFileStatus(p).isDirectory)
          // multi-file layout (the normal production shape): scans
          // already parallelize at file granularity, so report "wide
          // enough" and let [[wide]] return the bare scan untouched
          (Int.MaxValue, Long.MaxValue)
        else {
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(p, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try (r.getRowGroups.size, r.getRecordCount)
          finally r.close()
        }
      layout.putIfAbsent(path, v)
      v
    }
  }

  /** Scale-adaptive scan fan-out for PER-ROW-COMPUTE-HEAVY consumers
    * (optimization round 17, guide §2.5 "input skew: one huge
    * unsplittable file … repartition immediately after the read").
    * Parquet scans parallelize at ROW-GROUP granularity, and the
    * driver fixtures are single-file, single-row-group — so a
    * scan-stage computation (regex tokenization, levenshtein blocks,
    * the profile Expand) runs in ONE task regardless of core count
    * (measured: q_profile's aggregate job 5.4 s in one task on 32
    * cores; q_tok_vocab's regex pass 1.3 s). When the footer says the
    * scan cannot reach the session's parallelism, fan out by hashing
    * the table's primary key — a DETERMINISTIC exchange (same rows →
    * same partitions every run, engine, and cluster size; no
    * round-robin retry hazard and no sort-before-repartition pass,
    * guide §2.5). Catalyst pushes filters and column pruning THROUGH
    * the repartition (PushDownPredicates / ColumnPruning handle
    * RepartitionOperation), so PushedFilters/ReadSchema at the scan
    * are unchanged — TablesFanOutSpec pins both. The explicit
    * partition count makes the shuffle origin REPARTITION_BY_NUM,
    * which AQE never re-coalesces — the fan-out cannot be silently
    * undone by the 64 MB advisory size on these small-byte,
    * high-cost-per-row tables.
    *
    * OPT-IN ([[wide]]), never the default read path: a full-sweep A/B
    * at sf0.1/32 cores measured the blanket version (fan out every
    * starved scan) a NET LOSS — the compute-bound queries won big
    * (q_tok_vocab 0.43×, q_fuzzy_join 0.39×, q_profile 0.60×) but the
    * ~200 cheap relational queries each paid +0.3–0.8 s for the extra
    * exchange (one more AQE stage materialization + a single-threaded
    * map-side serialization of the whole table), a ~+100 s cohort
    * regression on this stage-latency-dominated box. Only call sites
    * whose downstream per-row work measurably dwarfs one exchange use
    * [[wide]]; each site cites its A/B in OPTIMIZATION_r17.md.
    *
    * Scale behaviour: target partitions = min(defaultParallelism,
    * rows/64), so tiny tables never shuffle, and any production
    * layout whose row groups already cover the cores (rowGroups ≥
    * target — the normal 100 TB case) returns the bare scan
    * untouched. */
  def wide(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = apply(spark, dir, name)
    val (rowGroups, rows) = fileLayout(spark, s"$dir/$name.parquet")
    val p = spark.sparkContext.defaultParallelism
    val target = math.min(p.toLong, math.max(1L, rows / 64L)).toInt
    if (rowGroups >= target || target <= 1) df
    else df.repartition(target, org.apache.spark.sql.functions.col(pk(name)))
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
