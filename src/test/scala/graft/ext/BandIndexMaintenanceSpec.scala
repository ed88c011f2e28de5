package graft.ext

import graft.SparkSuite

/** The index-maintenance half of the daily dedup loop: admitted
  * increments are APPENDED to the persisted band index
  * (increment-sized I/O), and the periodic compaction restores the
  * skew cap — after which the index is IDENTICAL to one rebuilt from
  * scratch over the union corpus. Without the append, near-dups
  * arriving on consecutive days slip through: that failure is pinned
  * as the negative control. */
class BandIndexMaintenanceSpec extends SparkSuite {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today " +
      "while the rain falls softly on the quiet green hills of the north"
  private val other =
    "completely different words about spark engines and parquet files " +
      "built for large scale analytics pipelines running every single day"

  private val corpus = mkDocs(Seq(1L -> other, 2L -> (other + " extra")))
  // day 1 admits a doc unrelated to the corpus…
  private val inc1 = mkDocs(Seq(101L -> base))
  // …day 2 brings a near-dup OF DAY 1's admission (not of the corpus)
  private val inc2 = mkDocs(Seq(201L -> (base + " tonight")))

  test("appended index catches day-2 near-dups of day-1 admissions") {
    val idx = java.nio.file.Files.createTempDirectory("band_maint_").toString
    Dedup.buildBandIndex(corpus, idx)
    // negative control: before the append, day 2's probe sees nothing
    val before = Dedup.incrementalNearDupsAgainst(inc2, idx, 0.5).collect()
    assert(before.isEmpty,
      s"day-2 doc must not match the corpus-only index: ${before.toSeq}")
    // day 1 close: admit inc1, absorb it into the index
    Dedup.appendToBandIndex(inc1, idx)
    val after = Dedup.incrementalNearDupsAgainst(inc2, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((201L, 101L)),
      s"day-2 probe must see day-1's admission: $after")
  }

  test("append + compact == rebuild from scratch over the union") {
    val grown = java.nio.file.Files.createTempDirectory("band_maint_g_").toString
    val fresh = java.nio.file.Files.createTempDirectory("band_maint_f_").toString
    Dedup.buildBandIndex(corpus, grown)
    Dedup.appendToBandIndex(inc1, grown)
    Dedup.compactBandIndex(spark, grown)
    import org.apache.spark.sql.functions.col
    Dedup.buildBandIndex(corpus.unionByName(inc1), fresh)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("band"), col("sig"), col("doc_id"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$grown/buckets") == rows(s"$fresh/buckets"))
    // and probing either index yields the same relation
    def probe(p: String) = Dedup.incrementalNearDupsAgainst(inc2, p, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(grown) == probe(fresh))
  }

  test("a retried append is a no-op; a crashed compact swap recovers") {
    // parquet appends are not transactional, so the daily job WILL be
    // retried: absorbing the same increment twice must not duplicate
    // shingle rows (duplicates would double every verify output row)
    val idx = java.nio.file.Files.createTempDirectory("band_maint_r_").toString
    Dedup.buildBandIndex(corpus, idx)
    Dedup.appendToBandIndex(inc1, idx)
    def shingleRows() = spark.read.parquet(s"$idx/shingles").count()
    val once = shingleRows()
    Dedup.appendToBandIndex(inc1, idx) // the retry
    assert(shingleRows() == once, "retried append duplicated shingle rows")
    val after = Dedup.incrementalNearDupsAgainst(inc2, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == Set((201L, 101L)))
    // crash between compact's delete and rename: buckets gone, the
    // complete staged table still present — the next compact call must
    // finish the swap instead of dying on the missing dir
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = new org.apache.hadoop.fs.Path(s"$idx/buckets")
    val staged = new org.apache.hadoop.fs.Path(s"$idx/buckets.compact")
    assert(fs.rename(buckets, staged), "test setup: stage the table")
    Dedup.compactBandIndex(spark, idx)
    assert(fs.exists(buckets) && !fs.exists(staged),
      "recovery must promote the staged compact")
    assert(Dedup.incrementalNearDupsAgainst(inc2, idx, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((201L, 101L)))
  }

  test("compaction restores the skew cap after appends") {
    import org.apache.spark.sql.functions.{col, max}
    val idx = java.nio.file.Files.createTempDirectory("band_maint_c_").toString
    // 6 identical docs at build, 6 more appended: cap 4 exceeded until compact
    Dedup.buildBandIndex(mkDocs((1L to 6L).map(i => i -> base)), idx, cap = 4)
    Dedup.appendToBandIndex(mkDocs((11L to 16L).map(i => i -> base)), idx)
    def maxBucket() = spark.read.parquet(s"$idx/buckets")
      .groupBy("band", "sig").count().agg(max("count")).head().getLong(0)
    assert(maxBucket() > 4, "append is allowed to exceed the cap")
    Dedup.compactBandIndex(spark, idx, cap = 4)
    assert(maxBucket() <= 4, "compaction must restore the cap")
    // cap keeps the LOWEST doc_ids of the union, same as a fresh build
    val kept = spark.read.parquet(s"$idx/buckets")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L))
  }
}
