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
      decoder.imageIoInMemory()
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
            decoder.imageIoInMemory()
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
            decoder.imageIoInMemory()
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

    // Frame sampling: MP4 payloads synthesized per row with REAL
    // stts/stsz/stco sample tables (analytically-known deltas and
    // sizes), pushed through the actual sample-table walk
    // (MediaDecoder.frames), every 3rd frame kept — the keyframe/
    // stride sampler a video corpus runs before feature extraction.
    // DuckDB recomputes the expected table from the construction
    // arithmetic: a run-length expansion bug, a pts accumulation bug,
    // or an off-by-one in the stsz walk breaks the hash match.
    Q("q_multimodal_frames",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            val decoder = MediaDecoder // per-partition codec handle
            decoder.imageIoInMemory()
            it.flatMap { id =>
              val mts = 1000 + (id % 4).toInt * 500 // media timescale
              val n = 10 + (id % 7).toInt
              val delta = 100 + (id % 3).toInt * 50
              val sizes = Array.tabulate(n)(i => ((id * 17 + i * 13) % 999 + 1).toInt)
              val p = decoder.mp4Bytes(600, 0L, Seq((320, 240)), Seq("avc1"),
                Some(decoder.FrameSpec(mts, delta, sizes)))
              val ft = decoder.frames(p)
              ft.frames.iterator.filter(_.idx % 3 == 0).map { f =>
                // pts exact: ptsUnits = idx*delta <= 4000 (integer-exact
                // in double), one multiply + one divide, same tree as SQL
                (id, f.idx, f.ptsUnits * 1000.0 / ft.timescale, f.size)
              }
            }
          }
          .toDF("asset_id", "frame_idx", "pts_ms", "frame_bytes")
          .orderBy("asset_id", "frame_idx")
      },
      Some("""SELECT d.doc_id AS asset_id,
             |  CAST(i.i AS INT) AS frame_idx,
             |  (i.i * (100 + (d.doc_id % 3) * 50) * 1000.0)
             |    / (1000 + (d.doc_id % 4) * 500) AS pts_ms,
             |  CAST((d.doc_id * 17 + i.i * 13) % 999 + 1 AS BIGINT) AS frame_bytes
             |FROM documents d, generate_series(0, 15) i(i)
             |WHERE i.i < 10 + d.doc_id % 7 AND i.i % 3 = 0
             |ORDER BY asset_id, frame_idx""".stripMargin)),

    // Nearest-neighbor resize: BMP payloads synthesized per row with an
    // analytic pixel function, decoded by the REAL ImageIO path,
    // resized by the integer floor mapping (x*srcW/dstW) — the
    // thumbnail/normalize step of an image corpus. The oracle
    // recomputes both checksums (value sum + position-weighted sum)
    // straight from the pixel function over the target grid: a wrong
    // index mapping, a channel swap, or a lossy round-trip breaks it.
    Q("q_multimodal_resize",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id")).as[Long]
          .mapPartitions { it =>
            // per-partition codec handle; its init also disables the
            // ImageIO disk-backed stream cache (4.4x on this path)
            val decoder = MediaDecoder
            decoder.imageIoInMemory()
            it.map { id =>
              val sw = 16 + (id % 5).toInt
              val sh = 12 + (id % 7).toInt
              val img = new java.awt.image.BufferedImage(
                sw, sh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < sh) {
                var x = 0
                while (x < sw) {
                  val g = ((x * 7 + y * 13 + id * 31) % 256).toInt
                  img.setRGB(x, y, g * 0x010101) // gray: R=G=B=g, lossless in BMP
                  x += 1
                }
                y += 1
              }
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "bmp", out)
              val dec = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(out.toByteArray))
              val r = decoder.resizeNearest(dec, 8, 6)
              var sumv = 0L
              var pos = 0L
              var yy = 0
              while (yy < 6) {
                var xx = 0
                while (xx < 8) {
                  val v = (r.getRGB(xx, yy) & 0xff).toLong // blue == gray
                  sumv += v
                  pos += v * (yy * 8 + xx + 1)
                  xx += 1
                }
                yy += 1
              }
              (id, sw, sh, 8, 6, sumv, pos)
            }
          }
          .toDF("asset_id", "src_w", "src_h", "dst_w", "dst_h",
            "pix_sum", "pix_pos")
          .orderBy("asset_id")
      },
      Some("""SELECT d.doc_id AS asset_id,
             |  CAST(16 + d.doc_id % 5 AS INT) AS src_w,
             |  CAST(12 + d.doc_id % 7 AS INT) AS src_h,
             |  CAST(8 AS INT) AS dst_w, CAST(6 AS INT) AS dst_h,
             |  CAST(SUM((((x.x * (16 + d.doc_id % 5)) // 8) * 7
             |          + ((y.y * (12 + d.doc_id % 7)) // 6) * 13
             |          + d.doc_id * 31) % 256) AS BIGINT) AS pix_sum,
             |  CAST(SUM(((((x.x * (16 + d.doc_id % 5)) // 8) * 7
             |           + ((y.y * (12 + d.doc_id % 7)) // 6) * 13
             |           + d.doc_id * 31) % 256) * (y.y * 8 + x.x + 1)) AS BIGINT) AS pix_pos
             |FROM documents d,
             |     generate_series(0, 7) x(x), generate_series(0, 5) y(y)
             |GROUP BY d.doc_id
             |ORDER BY asset_id""".stripMargin)),

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
