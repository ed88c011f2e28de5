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
