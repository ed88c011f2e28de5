package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Tables
import graft.queries.Q

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * environment): [[StubDecoder.decode]] is a deterministic fake that
  * stands in for a JNI/codec call. Everything around it — the binary
  * schema, the `mapPartitions` batch shape (the Scala analog of
  * `mapInPandas`: one iterator per partition, decoder state initialized
  * once per partition, not per row), partitioning, and the typed
  * feature output — is real Spark and tested.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); per-partition decoder init amortizes model/codec load
  * exactly like a Pandas UDF batch would; `repartition(n)` controls
  * decode parallelism independently of input file layout.
  */
object Multimodal {

  /** A multimodal asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features (fixed-width, columnar-friendly). */
  final case class AssetFeatures(
      asset_id: Long, modality: String, n_bytes: Long,
      checksum: Long, feature: Array[Double])

  /** Deterministic stand-in for the real codec: byte histogram moments.
    * A real deployment swaps this object for the JNI/codec binding —
    * the Spark plumbing does not change. */
  object StubDecoder {
    def decode(payload: Array[Byte]): Array[Double] = {
      var sum = 0L; var sq = 0.0
      var i = 0
      while (i < payload.length) {
        val v = payload(i) & 0xff
        sum += v; sq += v.toDouble * v
        i += 1
      }
      val n = math.max(payload.length, 1)
      Array(payload.length.toDouble, sum.toDouble / n, sq / n)
    }
  }

  /** Real multimodal ingestion path: a directory of opaque media files
    * as rows (path, modificationTime, length, content: binary) via
    * Spark's binaryFile source — at 100 TB the listing parallelizes
    * and payloads stay distributed; pair with [[extractFeatures]]. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)

  /** Build an assets table from `documents` (text bytes stand in for
    * media payloads; modality assigned round-robin). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
  }

  /** The batch feature-extraction operator: one decoder per partition,
    * streamed rows — the `mapInPandas` shape, JVM-native. */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init (codec / model handle lives here)
      val decoder = StubDecoder
      it.map { a =>
        val f = decoder.decode(a.payload)
        val crc = new java.util.zip.CRC32
        crc.update(a.payload)
        AssetFeatures(a.asset_id, a.modality, a.payload.length.toLong,
          crc.getValue, f)
      }
    }
  }

  /** Oracle-checked slice of the pipeline: binary payload metadata
    * (byte length is computable in both engines; the stub features are
    * covered by ScalaTest instead). */
  val queries: Seq[Q] = Seq(
    Q("q_multimodal_meta",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("doc_id").as("asset_id"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
            octet_length(col("text")).cast(LongType).as("n_bytes"))
          .orderBy("asset_id"),
      Some("""SELECT doc_id AS asset_id,
             |(['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
             |FROM documents ORDER BY asset_id""".stripMargin))
  )
}
