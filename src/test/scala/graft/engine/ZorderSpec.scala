package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.{col, max}

import graft.SparkSuite

/** Z-order compaction must (a) preserve rows and (b) beat a
  * single-key-sorted layout on a filter over the OTHER dimension —
  * the whole point of interleaving: a layout sorted by l_orderkey has
  * every file spanning the full l_partkey domain (no pruning), while
  * the morton layout confines each file to a (orderkey, partkey) box
  * so the partkey filter skips most files from their footer stats. */
class ZorderSpec extends SparkSuite {

  test("z-ordered layout preserves rows and skips on the second dimension") {
    val base = Files.createTempDirectory("graft-zorder")
    val in = base.resolve("in").toString
    val sorted = base.resolve("sorted").toString
    val zed = base.resolve("zed").toString
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(64).write.parquet(in)

    val sSorted = Layout.compact(spark, in, sorted, targetBytes = 64L * 1024,
      sortBy = Seq("l_orderkey"))
    val sZ = Layout.compactZ(spark, in, zed, ("l_orderkey", "l_partkey"),
      targetBytes = 64L * 1024)
    assert(sSorted.filesAfter >= 4 && sZ.filesAfter >= 4,
      s"need several files for skipping to show: $sSorted / $sZ")

    // rows preserved (multiset)
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(zed)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)

    // narrow filter on the NON-sort dimension: the orderkey-sorted
    // layout cannot prune at all, the z layout prunes by partkey
    // min/max per file. AQE off so executedPlan exposes scan metrics.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def scannedRows(dir: String): Long = {
        val maxKey = spark.read.parquet(dir).agg(max("l_partkey"))
          .head().getLong(0)
        val df = spark.read.parquet(dir).filter(col("l_partkey") <= maxKey / 20)
        df.collect()
        df.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f.metrics("numOutputRows").value
        }.sum
      }
      val rowsZ = scannedRows(zed)
      val rowsSorted = scannedRows(sorted)
      assert(rowsZ > 0, "filter should match some rows")
      assert(rowsZ * 2 < rowsSorted,
        s"z scan $rowsZ not meaningfully below single-key scan $rowsSorted")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
