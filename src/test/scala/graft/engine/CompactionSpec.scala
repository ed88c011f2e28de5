package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

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
    assert(stats.filesAfter >= 1 && stats.rows > 0)

    // content identical (multiset): same rows, nothing lost or doubled
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == stats.rows)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
