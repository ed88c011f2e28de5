package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Storage-layout maintenance: the small-files antidote.
  *
  * Streaming sinks, per-key writers, and fine-grained partitioning all
  * accrete thousands of KB-scale files; at 100 TB the resulting
  * listing + open overhead dominates scan time (every file is a
  * driver-side listing entry and an executor-side open/footer-read).
  * `compact` rewrites a parquet directory into ~targetBytes-sized
  * files: size the output file count from the ACTUAL input bytes
  * (FileSystem listing, no data pass), one `repartition` shuffle, one
  * write. Run it where a deployment runs OPTIMIZE/rewrite-data-files —
  * after each ingest batch, before heavy query windows.
  */
object Layout {

  final case class CompactStats(
      filesBefore: Long, filesAfter: Long, bytes: Long, rows: Long)

  /** Rewrite `inDir` (parquet) into `outDir` with ~`targetBytes`
    * files. Returns before/after listing stats; row-for-row equal
    * content (asserted in CompactionSpec). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactStats = {
    val fs = new Path(inDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(inDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inDir)
    df.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val outParts = fs.listStatus(new Path(outDir))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    CompactStats(parts.length.toLong, outParts.toLong, bytes,
      spark.read.parquet(outDir).count())
  }
}
