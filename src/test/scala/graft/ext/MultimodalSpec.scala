package graft.ext

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  private def imageBytes(fmt: String, w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no JDK writer for $fmt")
    out.toByteArray
  }

  test("asset pipeline: binary payloads → per-partition batch decode") {
    val assets = Multimodal.assets(spark, "/root/testdata/sf0.001")
      .repartition(3) // decode parallelism decoupled from file layout
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.nonEmpty)
    // text payloads are not decodable media → fallback decoder:
    // feature(0) = byte length, checksum = CRC32, format = unknown
    feats.foreach { f =>
      assert(f.feature.length == 3)
      assert(f.format == "unknown")
      assert(f.feature(0) == f.n_bytes.toDouble)
      assert(Set("image", "audio", "video").contains(f.modality))
    }
  }

  test("binaryFile source ingests an opaque media directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(dir.resolve("b.img"), Array[Byte](9, 8, 7))
    java.nio.file.Files.write(dir.resolve("skip.txt"), Array[Byte](0))
    val df = Multimodal.readBinaryDir(spark, dir.toString, "*.img")
    val rows = df.select("path", "length").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(3L, 4L))
  }

  test("golden images: PNG/BMP/GIF dimensions + luminance via ImageIO") {
    for (fmt <- Seq("png", "bmp", "gif")) {
      val m = MediaDecoder.decode(imageBytes(fmt, 5, 3, 0xffffff)) // white
      assert(m.format == fmt, s"$fmt sniffed as ${m.format}")
      assert(m.width == 5 && m.height == 3)
      assert(m.sample_rate == -1 && m.n_frames == -1L)
      // white pixels: luminance 255 exactly (GIF palettizes but white survives)
      assert(math.abs(m.feature(2) - 255.0) < 1e-9, s"$fmt lum ${m.feature(2)}")
    }
    // mid-gray PNG: lossless, luminance = 128 exactly
    val gray = MediaDecoder.decode(imageBytes("png", 4, 4, 0x808080))
    assert(math.abs(gray.feature(2) - 128.0) < 1e-9)
  }

  test("golden JPEG: sniffed by magic, dimensions exact, luminance within lossy band") {
    // JPEG is the format a real multimodal corpus is mostly made of —
    // covered as evidence, not an assumption. Dimensions survive the
    // lossy codec exactly; a uniform mid-gray field compresses to DC
    // coefficients only, so decoded luminance stays within a narrow
    // band of 128 (not bit-exact like PNG).
    val m = MediaDecoder.decode(imageBytes("jpg", 6, 4, 0x808080))
    assert(m.format == "jpeg", s"sniffed as ${m.format}")
    assert(m.width == 6 && m.height == 4)
    assert(m.sample_rate == -1 && m.n_frames == -1L)
    assert(math.abs(m.feature(2) - 128.0) < 2.0, s"jpeg lum ${m.feature(2)}")
    // truncated JPEG must fall back, not throw
    val trunc = MediaDecoder.decode(imageBytes("jpg", 6, 4, 0x808080).take(8))
    assert(trunc.format == "unknown")
  }

  test("golden WAV: RIFF parse recovers rate/channels/frames/duration") {
    val samples = Array.tabulate(16000)(i => (i % 256 - 128).toShort)
    val m = MediaDecoder.decode(MediaDecoder.wavBytes(16000, 1, samples))
    assert(m.format == "wav")
    assert(m.sample_rate == 16000 && m.channels == 1)
    assert(m.n_frames == 16000L)
    assert(math.abs(m.duration_ms - 1000.0) < 1e-9)
    // stereo: frames halve
    val st = MediaDecoder.decode(MediaDecoder.wavBytes(8000, 2, samples))
    assert(st.channels == 2 && st.n_frames == 8000L)
    assert(math.abs(st.duration_ms - 1000.0) < 1e-9)
    // mean |amplitude| of the sawtooth is exactly the analytic value
    val expAmp = samples.map(s => math.abs(s.toDouble)).sum / samples.length
    assert(math.abs(m.feature(2) - expAmp) < 1e-9)
  }

  test("golden MP4: box walk recovers timescale/duration/tracks/dims") {
    val m = MediaDecoder.decode(
      MediaDecoder.mp4Bytes(600, 1234, Seq((320, 240), (640, 480))))
    assert(m.format == "mp4")
    assert(m.sample_rate == 600, s"timescale ${m.sample_rate}") // timescale
    assert(m.n_frames == 2L, s"tracks ${m.n_frames}") // track count
    assert(m.width == 320 && m.height == 240, s"dims ${m.width}x${m.height}")
    assert(math.abs(m.duration_ms - 1234 * 1000.0 / 600) < 1e-9)
    assert(m.channels == -1)
    assert(m.codec == "", "no stsd written → no codec claimed")
    // stsd descent: first track's sample-entry fourcc is the codec
    val c = MediaDecoder.decode(MediaDecoder.mp4Bytes(600, 1234,
      Seq((320, 240), (640, 480)), Seq("hev1", "mp4a")))
    assert(c.codec == "hev1", s"codec ${c.codec}")
    assert(c.width == 320 && c.n_frames == 2L) // stsd didn't disturb tkhd
    // zero tracks: metadata still parses, no dims
    val none = MediaDecoder.decode(MediaDecoder.mp4Bytes(1000, 500, Seq.empty))
    assert(none.format == "mp4" && none.n_frames == 0L && none.width == -1)
    assert(math.abs(none.duration_ms - 500.0) < 1e-9)
  }

  test("adversarial MP4 box sizes terminate (no overflow walk/OOB)") {
    def be(i: Long): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .putInt(i.toInt).array()
    // top-level box claiming u32 size 0xFFFFFFF8 — must stop, not wrap
    val evil = be(16) ++ "ftypisomAAAA".getBytes("US-ASCII") ++
      be(0xFFFFFFF8L) ++ "moov".getBytes("US-ASCII")
    assert(MediaDecoder.decode(evil).format == "unknown")
    // 64-bit largesize Long.MaxValue — off+size overflow guard
    val evil2 = be(16) ++ "ftypisomAAAA".getBytes("US-ASCII") ++
      be(1) ++ "moov".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(8).putLong(Long.MaxValue).array()
    assert(MediaDecoder.decode(evil2).format == "unknown")
    // box size smaller than its header — must not loop forever
    val evil3 = be(16) ++ "ftypisomAAAA".getBytes("US-ASCII") ++
      be(3) ++ "moov".getBytes("US-ASCII")
    assert(MediaDecoder.decode(evil3).format == "unknown")
  }

  test("truncated/garbage payloads fall back instead of throwing") {
    val garbage = Array[Byte](0x42, 0x13, 0x37)
    assert(MediaDecoder.decode(garbage).format == "unknown")
    val truncatedWav = MediaDecoder.wavBytes(8000, 1, Array[Short](1, 2, 3)).take(20)
    assert(MediaDecoder.decode(truncatedWav).format == "unknown")
    val truncatedPng = imageBytes("png", 3, 3, 0).take(12)
    assert(MediaDecoder.decode(truncatedPng).format == "unknown")
  }

  test("golden frame table: stts run-length expands, pts accumulates, stsz sizes") {
    val p = MediaDecoder.mp4Bytes(600, 300, Seq((320, 240)), Seq("avc1"),
      Some(MediaDecoder.FrameSpec(1000, 100, Array(5, 6, 7))))
    val ft = MediaDecoder.frames(p)
    assert(ft.timescale == 1000, s"media timescale ${ft.timescale}")
    assert(ft.frames.map(f => (f.idx, f.ptsUnits, f.size)).toSeq ==
      Seq((0, 0L, 5L), (1, 100L, 6L), (2, 200L, 7L)))
    // the sample tables didn't disturb the metadata walk
    val m = MediaDecoder.decode(p)
    assert(m.sample_rate == 600 && m.codec == "avc1" && m.width == 320)
    // stride sampler keeps every nth frame by index
    val s2 = MediaDecoder.frameSample(p, 2)
    assert(s2.frames.map(_.idx).toSeq == Seq(0, 2))
    // a table-less payload (the old construction) yields an empty table
    val bare = MediaDecoder.frames(MediaDecoder.mp4Bytes(600, 300, Seq((320, 240))))
    assert(bare.timescale == -1 && bare.frames.isEmpty)
    // garbage / truncated payloads never throw
    assert(MediaDecoder.frames(Array[Byte](1, 2, 3)).frames.isEmpty)
    assert(MediaDecoder.frames(p.take(40)).frames.isEmpty)
  }

  test("adversarial frame tables: lying entry counts cannot allocate unbounded") {
    // stts claiming 2^30 samples in one run-length entry — the expansion
    // cap must reject it (empty table), not try to materialize 2^30 longs
    val p = MediaDecoder.mp4Bytes(600, 300, Seq((320, 240)), Seq("avc1"),
      Some(MediaDecoder.FrameSpec(1000, 100, Array(5))))
    // locate the stts box and rewrite its sample_count to 2^30
    val idx = {
      var i = -1
      var o = 0
      while (i < 0 && o + 4 <= p.length) {
        if (p(o) == 's' && p(o + 1) == 't' && p(o + 2) == 't' && p(o + 3) == 's') i = o
        o += 1
      }
      i
    }
    assert(idx > 0, "stts box present in the fixture")
    val evil = p.clone()
    // body starts at idx+4: ver/flags(4) entry_count(4) count(4) delta(4)
    val countOff = idx + 4 + 8
    evil(countOff) = 0x40; evil(countOff + 1) = 0; evil(countOff + 2) = 0; evil(countOff + 3) = 0
    assert(MediaDecoder.frames(evil).frames.isEmpty)
  }

  test("golden resize: integer nearest mapping, exact pixels") {
    // 4x2 source with distinct pixels; resize to 2x2 samples src
    // columns (0*4/2, 1*4/2) = (0, 2) and rows (0*2/2, 1*2/2) = (0, 1)
    val img = new BufferedImage(4, 2, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, (y * 4 + x) * 0x010101)
    val r = MediaDecoder.resizeNearest(img, 2, 2)
    assert(r.getWidth == 2 && r.getHeight == 2)
    assert((r.getRGB(0, 0) & 0xff) == 0 && (r.getRGB(1, 0) & 0xff) == 2)
    assert((r.getRGB(0, 1) & 0xff) == 4 && (r.getRGB(1, 1) & 0xff) == 6)
    // identity resize is a pixel-exact copy
    val id = MediaDecoder.resizeNearest(img, 4, 2)
    for (y <- 0 until 2; x <- 0 until 4)
      assert(id.getRGB(x, y) == img.getRGB(x, y))
    // upscale replicates: 2x1 -> 4x1 maps x*2/4 = (0,0,1,1)
    val up = MediaDecoder.resizeNearest(
      { val i2 = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
        i2.setRGB(0, 0, 0x0a0a0a); i2.setRGB(1, 0, 0x141414); i2 }, 4, 1)
    assert((0 until 4).map(up.getRGB(_, 0) & 0xff) == Seq(10, 10, 20, 20))
  }

  test("adversarial RIFF chunk sizes terminate (no sign-flip loop/OOB)") {
    // chunk size 0xFFFFFFF8: as Int this is -8 and a naive `off += 8+size`
    // walk spins forever; as u32 Long it runs past the payload and stops
    val evil = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("junk".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .putInt(0)
      .array()
    val m = MediaDecoder.decode(evil) // must return, not hang/throw
    assert(m.format == "unknown")
    // size 0x80000000 (negative as Int) likewise
    val evil2 = evil.clone()
    evil2(16) = 0; evil2(17) = 0; evil2(18) = 0; evil2(19) = 0x80.toByte
    assert(MediaDecoder.decode(evil2).format == "unknown")
  }
}
