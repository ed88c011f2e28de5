package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, floor, lit, max, min, shiftleft}

/** Storage-layout maintenance: the small-files antidote.
  *
  * Streaming sinks, per-key writers, and fine-grained partitioning all
  * accrete thousands of KB-scale files; at 100 TB the resulting
  * listing + open overhead dominates scan time (every file is a
  * driver-side listing entry and an executor-side open/footer-read).
  * `compact` rewrites a parquet directory into ~targetBytes-sized
  * files: size the output file count from the ACTUAL input bytes
  * (recursive FileSystem listing, no data pass), one `repartition`
  * shuffle, one write. Run it where a deployment runs
  * OPTIMIZE/rewrite-data-files — after each ingest batch, before
  * heavy query windows.
  *
  * Rows are preserved, directory layout is not: a hive-partitioned
  * input comes back flat (partition columns become data columns). To
  * keep a partitioned layout, compact each partition directory —
  * that is also the parallel/incremental shape at scale.
  */
object Layout {

  final case class CompactStats(filesBefore: Long, filesAfter: Long, bytes: Long)

  /** Recursive count + byte total of the .parquet files under `dir`. */
  private def parquetStats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }

  /** Rewrite `inDir` (parquet, flat or partitioned) into `outDir` with
    * ~`targetBytes` files. Returns before/after listing stats;
    * row-for-row equal content (asserted in CompactionSpec).
    *
    * `sortBy` non-empty makes compaction ALSO the data-skipping
    * primitive (the OPTIMIZE … ZORDER analog for a single key prefix):
    * rows are range-partitioned across the output files and sorted
    * within each, so every file/row-group/page covers a narrow
    * min-max band of the key and a later range filter prunes whole
    * row groups from the scan (parquet footer + column-index stats) —
    * CompactionSpec asserts the scan-row reduction. The default
    * round-robin `repartition` balances bytes best but destroys any
    * clustering, so compacted tables get NO skipping on subsequent
    * range filters; a deployment compacting a time-series or
    * key-ordered table should always pass its filter key here. */
  /** Shared prologue of both compaction forms: validates the knobs and
    * paths (cheap checks BEFORE any data pass), sizes the output file
    * count from the actual input bytes, and returns (nIn, bytes, nOut).
    * One definition so the sizing rule and its guards cannot drift
    * between the flat and z-order forms (round-12 review). */
  private def plan(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Long, Long, Int) = {
    // targetBytes = 0 would size nOut to Int.MaxValue (a two-billion-
    // partition shuffle); negative silently produced ONE giant file
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // self-overwrite guard, BEFORE the stats pass: Spark's own check
    // fires only at write time — after compactZ's full min/max scan —
    // and compares exact qualified paths (best-effort here too; a
    // filesystem alias that qualifies differently is on the caller).
    // Ancestor/descendant nesting is rejected too (round-12 ADVICE):
    // an outDir under inDir is read while being overwritten (the
    // recursive input listing sees the partial output), and an inDir
    // under outDir is destroyed by the overwrite — same contract as
    // Cli.requireDisjoint.
    val conf = spark.sparkContext.hadoopConfiguration
    def qual(d: String) = {
      val p = new Path(d); p.getFileSystem(conf).makeQualified(p).toString
    }
    val (qi, qo) = (qual(inDir), qual(outDir))
    // strip any trailing slash before comparing/appending the
    // separator (round-13 ADVICE): a ROOT dir qualifies WITH one
    // (qual("/") = "file:/"), so the old qo + "/" was "file://" and
    // a path nested under the root never matched the prefix — the
    // overwrite guard silently waved the one case that destroys the
    // most data through
    def norm(q: String) = q.stripSuffix("/")
    val (ni, no) = (norm(qi), norm(qo))
    require(ni != no && !ni.startsWith(no + "/") && !no.startsWith(ni + "/"),
      s"compaction input and output must not overlap ('$inDir' vs " +
        s"'$outDir'); write to a disjoint dir and swap")
    val (nIn, bytes) = parquetStats(spark, inDir)
    require(nIn > 0, s"no parquet files under $inDir — nothing to compact")
    (nIn, bytes, math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt))
  }

  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): CompactStats = {
    val (nIn, bytes, nOut) = plan(spark, inDir, outDir, targetBytes)
    val df = spark.read.parquet(inDir)
    val laid =
      if (sortBy.isEmpty) df.repartition(nOut)
      else df.repartitionByRange(nOut, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.head, sortBy.tail: _*)
    laid.write.mode("overwrite").parquet(outDir)
    val (nAfter, _) = parquetStats(spark, outDir)
    CompactStats(nIn, nAfter, bytes)
  }

  /** Spread the low 16 bits of a non-negative long one position apart
    * (…abcd → …0a0b0c0d) — the classic morton magic-number ladder,
    * exact integer column ops end to end. */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order compaction: like [[compact]] with `sortBy`, but clustered
    * on the morton interleave of TWO dimensions, so every output file
    * covers a narrow box in (d1, d2) space and parquet min/max stats
    * prune the scan for filters on EITHER dimension (or a box over
    * both) — the OPTIMIZE … ZORDER analog. A single-key sort only
    * skips on its prefix; the time-series table that is also filtered
    * by user, or the (n_chars, doc_id) box scan, needs this layout.
    *
    * Each dimension is linearly bucketed into 16 bits between its own
    * min and max — one bounded stat fetch (4 doubles; a 100 TB
    * deployment reads these from table statistics instead). The morton
    * key is computed per row, range-partitioned, sorted within, and
    * DROPPED before the write — the skipping comes from each file's
    * narrower min/max on the REAL columns, not from storing the key. */
  def compactZ(spark: SparkSession, inDir: String, outDir: String,
      zCols: (String, String),
      targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val (nIn, bytes, nOut) = plan(spark, inDir, outDir, targetBytes)
    val df = spark.read.parquet(inDir)
    val (c1, c2) = (col(zCols._1).cast("double"), col(zCols._2).cast("double"))
    val r = df.agg(min(c1), max(c1), min(c2), max(c2)).head()
    // empty input (0-row part files are a normal artifact of filtered
    // writes) or an all-null/non-numeric dimension yields null stats —
    // fail with the cause, not an NPE out of getDouble. Finiteness is
    // part of the contract (round-12 review): ONE NaN row makes max()
    // NaN and `mx > mn` false, silently collapsing the whole dimension
    // to bucket 0 (no skipping, no error); one +Infinity row buckets
    // every finite row to 0 the same way. Refuse loudly — a corpus
    // carrying non-finite values must clean them before layout.
    require((0 to 3).forall(i =>
        !r.isNullAt(i) && java.lang.Double.isFinite(r.getDouble(i))),
      s"compactZ needs rows and FINITE numeric stats for $zCols under " +
        s"$inDir — got $r (a NaN/Infinity row would silently collapse " +
        "the dimension's bucketing)")
    def bucket(c: Column, mn: Double, mx: Double): Column =
      if (mx > mn) floor((c - lit(mn)) * lit(65535.0) / lit(mx - mn)).cast("long")
      else lit(0L)
    val z = spread16(bucket(c1, r.getDouble(0), r.getDouble(1)))
      .bitwiseOR(shiftleft(spread16(bucket(c2, r.getDouble(2), r.getDouble(3))), 1))
    df.withColumn("__z", z)
      .repartitionByRange(nOut, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
    val (nAfter, _) = parquetStats(spark, outDir)
    CompactStats(nIn, nAfter, bytes)
  }
}
