package graft.engine

import java.nio.file.Files

import graft.SparkSuite

/** Small-files compaction: a directory fragmented into many KB-scale
  * parts must rewrite into few target-sized files with identical
  * content — the layout-maintenance pass a 100 TB deployment runs
  * after every streaming/ingest batch. */
class CompactionSpec extends SparkSuite {

  test("compact rewrites a fragmented directory to sized files, content-equal") {
    val base = Files.createTempDirectory("graft-compact")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    // fragment: 64 tiny files (the streaming-sink accretion shape)
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(64).write.parquet(in)

    val stats = Layout.compact(spark, in, out, targetBytes = 512L * 1024)
    assert(stats.filesBefore == 64, stats.toString)
    assert(stats.filesAfter < 16, s"still fragmented: $stats")
    assert(stats.filesAfter >= 1 && stats.bytes > 0)

    // content identical (multiset): same rows, nothing lost or doubled
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sorted compaction enables row-group skipping on range filters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Files.createTempDirectory("graft-compact-sort")
    val in = base.resolve("in").toString
    val flat = base.resolve("flat").toString
    val sorted = base.resolve("sorted").toString
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(64).write.parquet(in)

    // small target → many output files, so a narrow range filter can
    // prune at FILE granularity (row-group min/max) and the assertion
    // doesn't hinge on page-index behavior
    val sFlat = Layout.compact(spark, in, flat, targetBytes = 64L * 1024)
    val sSorted = Layout.compact(spark, in, sorted, targetBytes = 64L * 1024,
      sortBy = Seq("l_orderkey"))
    assert(sFlat.filesAfter >= 4 && sSorted.filesAfter >= 4,
      s"need several files for skipping to show: $sFlat / $sSorted")

    // rows preserved under the sorted layout too
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(sorted)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // a narrow range filter: the sorted layout must emit far fewer
    // rows from the scan (row-group/page min-max pruning); the
    // round-robin layout spreads the range over every file, so its
    // scan emits ~everything. AQE off so executedPlan exposes the
    // scan node's metrics directly.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scannedRows(dir: String): Long = {
        val maxKey = spark.read.parquet(dir)
          .agg(org.apache.spark.sql.functions.max("l_orderkey"))
          .head().getLong(0)
        val df = spark.read.parquet(dir)
          .filter(org.apache.spark.sql.functions.col("l_orderkey") <= maxKey / 20)
        // collect(), not a write: a write wraps the plan in its OWN
        // QueryExecution and this df's scan metrics would stay zero
        df.collect()
        df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f.metrics("numOutputRows").value
        }.sum
      }
      val rowsSorted = scannedRows(sorted)
      val rowsFlat = scannedRows(flat)
      assert(rowsSorted > 0, "filter should match some rows")
      assert(rowsSorted * 2 < rowsFlat,
        s"sorted scan $rowsSorted not meaningfully below flat scan $rowsFlat")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("bad knobs and self-overwrite are refused before any data pass (round-12 review)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compact-guards")
    val in = base.resolve("in").toString
    Seq((1L, 2.0), (2L, 3.0)).toDF("k", "d").write.parquet(in)
    // targetBytes = 0 used to size a ~2-billion-partition shuffle;
    // negative silently produced one giant file
    for (bad <- Seq(0L, -1L)) {
      val e = intercept[IllegalArgumentException] {
        Layout.compact(spark, in, base.resolve("out").toString, bad)
      }
      assert(e.getMessage.contains("targetBytes"), e.getMessage)
    }
    // in == out would delete the input mid-read under mode(overwrite);
    // nesting either way is the same hazard via the recursive listing
    // (round-12 ADVICE) — all three shapes refused before any data pass
    for (out <- Seq(in, s"$in/nested/out", base.toString)) {
      val eSelf = intercept[IllegalArgumentException] {
        Layout.compact(spark, in, out)
      }
      assert(eSelf.getMessage.contains("must not overlap"), eSelf.getMessage)
    }
    // the filesystem ROOT qualifies WITH a trailing slash ("file:/"),
    // which the old raw prefix check turned into "file://" — a dir
    // nested under the root (i.e., everything) was never rejected
    // (round-13 ADVICE). Root as INPUT is the safe arm to pin: if the
    // guard regresses, the failure is a doomed read, not a write to /
    val eRoot = intercept[IllegalArgumentException] {
      Layout.compact(spark, "/", base.resolve("out3").toString)
    }
    assert(eRoot.getMessage.contains("must not overlap"), eRoot.getMessage)
    // a NaN row makes max() NaN and used to silently collapse the
    // z-dimension to one bucket — refused with the cause named
    val nanIn = base.resolve("nan").toString
    Seq((1L, 2.0), (2L, Double.NaN)).toDF("k", "d").write.parquet(nanIn)
    val eNan = intercept[IllegalArgumentException] {
      Layout.compactZ(spark, nanIn, base.resolve("out2").toString, ("k", "d"))
    }
    assert(eNan.getMessage.contains("FINITE"), eNan.getMessage)
  }

  test("compact handles a hive-partitioned layout (recursive listing)") {
    val base = Files.createTempDirectory("graft-compact-part")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .repartition(8).write.partitionBy("lang").parquet(in)

    val stats = Layout.compact(spark, in, out, targetBytes = 4L * 1024 * 1024)
    // nested parts were counted (a top-level-only listing would see 0
    // files, size the output from bytes=0, and funnel it into 1 task)
    assert(stats.filesBefore > 8 && stats.bytes > 0, stats.toString)
    // rows preserved; lang comes back as a data column (documented)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(b.columns.contains("lang"))
  }
}
