package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.engine.Tables
import graft.queries.Q

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed in partition-sized batches.
  *
  * Decoding is REAL and pure-JVM ([[MediaDecoder]]): `javax.imageio`
  * for PNG/BMP/GIF, a hand-rolled RIFF/WAVE parser for audio, and a
  * byte-histogram fallback so unreadable payloads still produce a row.
  * The batch shape is `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator per partition, decoder state initialized
  * once per partition, not per row).
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collect); per-partition decoder init amortizes model/codec load
  * exactly like a Pandas UDF batch would; `repartition(n)` controls
  * decode parallelism independently of input file layout.
  */
object Multimodal {

  /** A multimodal asset row: opaque payload + typed metadata. */
  final case class Asset(asset_id: Long, modality: String, payload: Array[Byte])

  /** Extracted features (fixed-width, columnar-friendly). Image fields
    * are -1 for non-images, audio fields -1/-1.0 for non-audio. */
  final case class AssetFeatures(
      asset_id: Long, modality: String, n_bytes: Long, checksum: Long,
      format: String, width: Int, height: Int,
      sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Double,
      feature: Array[Double])

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
      val decoder = MediaDecoder
      it.map { a =>
        val m = decoder.decode(a.payload)
        val crc = new java.util.zip.CRC32
        crc.update(a.payload)
        AssetFeatures(a.asset_id, a.modality, a.payload.length.toLong,
          crc.getValue, m.format, m.width, m.height,
          m.sample_rate, m.channels, m.n_frames, m.duration_ms, m.feature)
      }
    }
  }

  /** Oracle-checked slices of the pipeline: payload metadata, plus a
    * REAL decode round-trip — WAV payloads are synthesized per row with
    * analytically-known parameters, pushed through the actual RIFF
    * parser ([[MediaDecoder.decode]]) in the mapPartitions batch shape,
    * and DuckDB recomputes the expected metadata from the construction
    * arithmetic. A decoder regression (endianness, chunk walk, frame
    * math) breaks the hash match. Image decoding is covered by
    * golden-file ScalaTests (pixel data is not DuckDB-expressible). */
  val queries: Seq[Q] = Seq(
    Q("q_multimodal_decode",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            val decoder = MediaDecoder // per-partition codec handle
            it.map { case (id, text) =>
              val rate = 8000 + (id % 3).toInt * 4000
              val samples = text.getBytes("UTF-8").map(b => ((b & 0xff) * 64).toShort)
              val m = decoder.decode(decoder.wavBytes(rate, 1, samples))
              (id, m.format, m.sample_rate, m.channels, m.n_frames, m.duration_ms)
            }
          }
          .toDF("asset_id", "format", "sample_rate", "channels", "n_frames", "duration_ms")
          .orderBy("asset_id")
      },
      Some("""SELECT doc_id AS asset_id, 'wav' AS format,
             |CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
             |CAST(1 AS INT) AS channels,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
             |CAST(octet_length(encode(text)) AS BIGINT) * 1000.0::DOUBLE
             |  / (8000 + (doc_id % 3) * 4000) AS duration_ms
             |FROM documents ORDER BY asset_id""".stripMargin)),

    // Same construction as q_multimodal_decode, video edition: MP4
    // payloads synthesized per row with analytically-known mvhd/tkhd
    // parameters, pushed through the real ISO-BMFF box walk, DuckDB
    // recomputing the expected metadata from the construction
    // arithmetic — a box-walk regression (endianness, version offsets,
    // fixed-point dims, duration math) breaks the hash match.
    Q("q_multimodal_video",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            val decoder = MediaDecoder // per-partition codec handle
            it.map { case (id, text) =>
              val ts = 600 + (id % 5).toInt * 120
              // Long: Int arithmetic would overflow past ~71 MB of text
              // and silently diverge from the oracle's BIGINT arithmetic
              // (mp4Bytes rejects anything beyond u32 loudly)
              val dur = text.getBytes("UTF-8").length.toLong * 30
              val nTracks = 1 + (id % 3).toInt
              val dims = (0 until nTracks).map(i => (320 + 16 * i, 240 + 16 * i))
              val codecs = (0 until nTracks).map(i =>
                Seq("avc1", "hev1", "mp4a")(((id + i) % 3).toInt))
              val m = decoder.decode(decoder.mp4Bytes(ts, dur, dims, codecs))
              (id, m.format, m.width, m.height, m.sample_rate, m.n_frames,
                m.duration_ms, m.codec)
            }
          }
          .toDF("asset_id", "format", "width", "height", "timescale",
            "n_tracks", "duration_ms", "codec")
          .orderBy("asset_id")
      },
      Some("""SELECT doc_id AS asset_id, 'mp4' AS format,
             |CAST(320 AS INT) AS width, CAST(240 AS INT) AS height,
             |CAST(600 + (doc_id % 5) * 120 AS INT) AS timescale,
             |CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
             |(octet_length(encode(text)) * 30 * 1000.0::DOUBLE)
             |  / (600 + (doc_id % 5) * 120) AS duration_ms,
             |(['avc1', 'hev1', 'mp4a'])[CAST(doc_id % 3 AS INT) + 1] AS codec
             |FROM documents ORDER BY asset_id""".stripMargin)),

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
