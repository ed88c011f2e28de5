package graft.ext

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Pure-JVM media decoding for multimodal columns — real codecs, zero
  * external dependencies:
  *
  *   - images: `javax.imageio` (PNG / BMP / GIF / JPEG ship with the
  *     JDK) — dimensions + mean-luminance feature from the decoded
  *     pixels;
  *   - audio: a hand-rolled RIFF/WAVE chunk parser (fmt + data) —
  *     sample rate, channels, frame count, duration, mean |amplitude|
  *     for 16-bit PCM;
  *   - anything else: byte-histogram moments (the universal fallback),
  *     so the pipeline never drops a row for an unreadable payload.
  *
  * Decoders are stateless objects: per-partition "init" in
  * [[Multimodal.extractFeatures]] costs nothing here but marks where a
  * JNI codec handle would live. Video container metadata (MP4 /
  * ISO-BMFF) is parsed with a hand-rolled big-endian box walk — mvhd
  * timescale/duration, track count, tkhd dimensions; the frames
  * themselves stay undecoded (no JDK video codec), flowing as opaque
  * binary.
  */
object MediaDecoder {

  /** Disable ImageIO's disk-backed stream cache for this JVM — the
    * default spills every read/write through a temp FILE in
    * java.io.tmpdir, a disk round-trip (and a same-dir file-creation
    * contention point across executor threads) per asset. Every
    * payload here is an in-memory byte array, so the disk cache is
    * pure overhead: measured 4.4x on the resize path (20k small BMPs:
    * 3.0 s cached vs 0.67 s in-memory, 1 thread).
    *
    * EXPLICIT and idempotent (not only an object-init side effect):
    * the setting is JVM-global, so call sites invoke it at decoder-
    * handle setup rather than depending on which class happened to
    * initialize first; any unrelated ImageIO user sharing the JVM
    * that needs the disk cache back can re-enable it after its own
    * reads — the decoders re-assert per partition. */
  def imageIoInMemory(): Unit = ImageIO.setUseCache(false)

  // also at object init, so even a call site that only references the
  // handle gets the in-memory config deterministically
  imageIoInMemory()

  /** Typed decode result. Image fields are -1 for non-images, audio
    * fields -1/-1.0 for non-audio; `feature` is always 3 doubles. */
  final case class Media(
      format: String,
      width: Int, height: Int,
      sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Double,
      feature: Array[Double],
      codec: String = "") // stsd fourcc of the first track (mp4 only)

  def decode(payload: Array[Byte]): Media =
    // belt over the per-format guards: NO malformed payload may throw
    // out of a decoder (the pipeline keeps the row with fallback
    // features instead of failing the task)
    try {
      if (isWav(payload)) decodeWav(payload)
      else if (isMp4(payload)) decodeMp4(payload)
      else sniffImage(payload) match {
        case Some(fmt) => decodeImage(payload, fmt)
        case None      => fallback(payload, "unknown")
      }
    } catch { case _: Exception => fallback(payload, "unknown") }

  // ── format sniffing (magic numbers) ──

  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p'

  private def sniffImage(p: Array[Byte]): Option[String] =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      Some("png")
    else if (p.length >= 4 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')
      Some("gif")
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M')
      Some("bmp")
    else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8 &&
        (p(2) & 0xff) == 0xff)
      // the format a real multimodal corpus is mostly made of; the JDK
      // ships both the reader and (for the fixture) the writer
      Some("jpeg")
    else None

  // ── images: JDK ImageIO ──

  /** Decompression-bomb bound: a few-KB payload can DECLARE huge
    * dimensions (60000² ≈ 14 GB of ARGB) — ImageIO would then OOM the
    * task as an Error the Exception belt never catches. Dimensions are
    * read from the HEADER first (no pixel decode) and capped here;
    * 64 MPix ≈ 256 MB decoded, comfortably above any real asset. */
  private val MaxImagePixels = 64L * 1024 * 1024

  private def decodeImage(p: Array[Byte], fmt: String): Media = {
    // header-first: reader dims come from metadata, so the bomb check
    // runs BEFORE any pixel allocation; truncated payloads throw into
    // decode()'s catch-all as before
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(p))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return fallback(p, "unknown")
      val reader = readers.next()
      reader.setInput(iis)
      val img =
        try {
          val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
          if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > MaxImagePixels)
            return fallback(p, "unknown")
          reader.read(0)
        } finally reader.dispose()
      if (img == null) return fallback(p, "unknown")
      val (w, h) = (img.getWidth, img.getHeight)
      // mean luminance (Rec. 601) over decoded pixels — the "content
      // feature". Row-wise bulk getRGB: one color-model conversion per
      // row instead of per pixel (same ARGB ints, same sum).
      var lum = 0.0
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val rgb = row(x)
          lum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      Media(fmt, w, h, -1, -1, -1L, -1.0,
        Array(w.toDouble, h.toDouble, lum / math.max(w.toLong * h, 1L)))
    } finally iis.close()
  }

  // ── audio: RIFF/WAVE chunk walk ──

  private def le16(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
  private def le32(p: Array[Byte], o: Int): Long =
    (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)

  private def decodeWav(p: Array[Byte]): Media = {
    var off = 12L // past RIFF<size>WAVE; Long: chunk sizes are u32
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= p.length) {
      val o = off.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val size = le32(p, o + 4) // 0 .. 0xFFFFFFFF — NEVER .toInt (sign flip
      // would walk the offset backwards: infinite loop / OOB on crafted sizes)
      // size >= 16: a lying small fmt size would read the NEXT chunk's
      // header bytes as channels/rate/bits (fabricated metadata)
      if (id == "fmt " && size >= 16 && o + 24 <= p.length) {
        channels = le16(p, o + 10)
        rate = le32(p, o + 12).toInt
        bits = le16(p, o + 22)
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = math.min(size, (p.length - dataOff).toLong)
      }
      // chunks are word-aligned: odd sizes carry a pad byte; Long
      // arithmetic keeps a lying size field monotone (loop terminates)
      off += 8L + size + (size & 1L)
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataOff < 0)
      return fallback(p, "unknown")
    val bytesPerFrame = channels * (bits / 8)
    val frames = if (bytesPerFrame > 0) dataLen / bytesPerFrame else 0L
    val durationMs = frames * 1000.0 / rate
    // mean |amplitude| for 16-bit PCM; byte-mean fallback otherwise
    var amp = 0.0
    var n = 0L
    if (bits == 16) {
      var i = dataOff
      while (i + 1 < dataOff + dataLen) {
        amp += math.abs(le16(p, i).toShort.toDouble); n += 1; i += 2
      }
    } else {
      var i = dataOff
      while (i < dataOff + dataLen) { amp += (p(i) & 0xff).toDouble; n += 1; i += 1 }
    }
    Media("wav", -1, -1, rate, channels, frames, durationMs,
      Array(frames.toDouble, rate.toDouble, amp / math.max(n, 1L)))
  }

  // ── video: MP4 / ISO-BMFF box walk (header arithmetic only — the ──
  // JDK ships no video codec, so frames stay undecoded; container
  // metadata is pure big-endian parsing, same style as the RIFF walk)

  private def be32(p: Array[Byte], o: Int): Long =
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  private def be64(p: Array[Byte], o: Int): Long =
    (be32(p, o) << 32) | be32(p, o + 4)

  /** Metadata extracted: mvhd timescale + duration (→ duration_ms),
    * trak count, the first nonzero tkhd width/height (16.16 fixed),
    * and the first track's stsd sample-description fourcc (the codec
    * id, via the real trak → mdia → minf → stbl → stsd descent).
    * Field mapping in [[Media]]: `sample_rate` carries the timescale
    * (ticks/second), `n_frames` the track count; `channels` stays -1.
    * Guards mirror the RIFF parser: u32/u64 sizes never truncated, a
    * lying size (smaller than its own header, or past the parent box)
    * stops that walk level instead of reading foreign bytes. */
  // walk the boxes of `p` in [start, end): f(type, bodyStart, boxEnd).
  // Shared by the metadata walk and the sample-table walk.
  private def walkBoxes(p: Array[Byte], start: Long, end: Long)(
      f: (String, Long, Long) => Unit): Unit = {
    var off = start
    var continue = true
    while (continue && off + 8 <= end) {
      var size = be32(p, off.toInt)
      var hdr = 8L
      if (size == 1L && off + 16 <= end) { size = be64(p, off.toInt + 8); hdr = 16L }
      else if (size == 0L) size = end - off // "extends to end of file"
      // lying size: smaller than its own header, or overrunning the
      // parent — stop this level (end - off cannot overflow; off + size
      // with a crafted 64-bit size could)
      if (size < hdr || size > end - off) continue = false
      else {
        val id = new String(p, off.toInt + 4, 4, "US-ASCII")
        f(id, off + hdr, off + size)
        off += size
      }
    }
  }

  private def decodeMp4(p: Array[Byte]): Media = {
    var timescale = -1L; var duration = -1L
    var tracks = 0L
    var w = -1; var h = -1
    var codec = ""

    def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Unit =
      walkBoxes(p, start, end)(f)

    walk(0, p.length) { (id, s, e) =>
      if (id == "moov") walk(s, e) { (id2, s2, e2) =>
        if (id2 == "mvhd" && s2 + 4 <= e2) {
          val v = p(s2.toInt) & 0xff
          // FullBox: ver/flags(4); v0: cre(4) mod(4) ts(4) dur(4);
          //                        v1: cre(8) mod(8) ts(4) dur(8)
          if (v == 1 && s2 + 32 <= e2) {
            timescale = be32(p, s2.toInt + 20); duration = be64(p, s2.toInt + 24)
          } else if (v == 0 && s2 + 20 <= e2) {
            timescale = be32(p, s2.toInt + 12); duration = be32(p, s2.toInt + 16)
          }
        } else if (id2 == "trak") {
          tracks += 1
          walk(s2, e2) { (id3, s3, e3) =>
            // tkhd width/height: 16.16 fixed, always the box's last 8
            // bytes (v0 body 84 B, v1 96 B — offset-from-end is
            // version-agnostic)
            if (id3 == "tkhd" && e3 - s3 >= 84 && w < 0) {
              val tw = (be32(p, (e3 - 8).toInt) >> 16).toInt
              val th = (be32(p, (e3 - 4).toInt) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th }
            } else if (id3 == "mdia" && codec.isEmpty) {
              // trak → mdia → minf → stbl → stsd: FullBox(4) +
              // entry_count(4), then the first sample entry is itself
              // a box — size(4) at s+8, its FOURCC (the codec id) at
              // s+12. Bounds-checked like every other read; the first
              // track with a parseable entry wins.
              walk(s3, e3) { (id4, s4, e4) =>
                if (id4 == "minf") walk(s4, e4) { (id5, s5, e5) =>
                  if (id5 == "stbl") walk(s5, e5) { (id6, s6, e6) =>
                    if (id6 == "stsd" && s6 + 16 <= e6 &&
                        be32(p, s6.toInt + 4) >= 1 && codec.isEmpty)
                      codec = new String(p, s6.toInt + 12, 4, "US-ASCII")
                  }
                }
              }
            }
          }
        }
      }
    }
    if (timescale <= 0 || duration < 0) return fallback(p, "unknown")
    val durationMs = duration * 1000.0 / timescale
    // mvhd timescale is u32; the Media field is an Int — a timescale
    // above 2^31 would .toInt to a NEGATIVE "sample rate" (silently
    // corrupt metadata) while duration_ms stayed right. Clamp to the
    // documented -1 sentinel instead; durationMs above already used
    // the full Long value.
    val tsField = if (timescale <= Int.MaxValue) timescale.toInt else -1
    Media("mp4", w, h, tsField, -1, tracks, durationMs,
      Array(tracks.toDouble, timescale.toDouble, durationMs), codec)
  }

  // ── video frame sampling: stts/stsz sample-table walk ──

  /** One sample (frame) from an MP4 sample table: decode index,
    * presentation time in media-timescale units (cumulative stts
    * decode deltas BEFORE this sample PLUS its ctts composition
    * offset when the track carries one — B-frame tracks store pts =
    * dts + offset, and ignoring ctts would report decode timestamps
    * as presentation times), and byte size from stsz (`-1` = the
    * table carried no size information, distinct from a real
    * zero-byte sample). */
  final case class Frame(idx: Int, ptsUnits: Long, size: Long)

  /** A track's frame table: the mdhd media timescale (ticks/second —
    * pts_ms = ptsUnits * 1000.0 / timescale) and the frames in DECODE
    * order, each carrying its presentation time. `timescale == -1`
    * and empty frames means no parseable sample table was found. */
  final case class FrameTable(timescale: Int, frames: Array[Frame])

  // crafted entry counts could claim 2^31 samples in a 100-byte box;
  // every per-sample read is bounds-checked, but cap the expansion so
  // a lying run-length can't allocate unbounded memory either
  private val MaxFrames = 1 << 22

  /** Parse the FIRST track's sample table (trak → mdia → mdhd +
    * minf → stbl → stts/stsz): the frame-sampling entry point. Frames
    * themselves stay undecoded opaque bytes (no JDK video codec); the
    * table is what a sampler needs — per-frame pts and size. Malformed
    * or table-less payloads return an empty [[FrameTable]], never
    * throw (same contract as [[decode]]'s fallback). */
  def frames(p: Array[Byte]): FrameTable = try {
    if (!isMp4(p)) return FrameTable(-1, Array.empty)
    // the COMMITTED tables — written only when one trak yields a full
    // parse, so tables from different tracks can never mix (round-12
    // review: globally-accumulated deltas/sizes let trak 1's byte
    // sizes pair with trak 2's timing — a fabricated frame table)
    var mediaTs = -1
    var deltas: Array[Long] = null
    var sizes: Array[Long] = null
    var offsets: Array[Long] = null // ctts composition offsets (pts = dts + off)
    var constSize = -1L
    var done = false // first track with an stts wins

    // (count, value) run-length expansion shared by stts and ctts;
    // crafted entry counts are capped at MaxFrames (null = unusable)
    def runLengths(s: Long, e: Long, signedValues: Boolean): Array[Long] = {
      if (s + 8 > e) return null
      val entries = be32(p, s.toInt + 4)
      val out = Array.newBuilder[Long]
      var total = 0L
      var i = 0L
      var ok = true
      while (ok && i < entries) {
        val o = s + 8 + i * 8
        if (o + 8 > e) ok = false
        else {
          val count = be32(p, o.toInt)
          val raw = be32(p, o.toInt + 4)
          val value = if (signedValues) raw.toInt.toLong else raw
          if (total + count > MaxFrames) ok = false
          else {
            var j = 0L
            while (j < count) { out += value; j += 1 }
            total += count
          }
        }
        i += 1
      }
      if (ok) out.result() else null
    }

    walkBoxes(p, 0, p.length) { (id, s, e) =>
      if (id == "moov") walkBoxes(p, s, e) { (id2, s2, e2) =>
        if (id2 == "trak" && !done) {
          // per-TRACK working state, committed as a unit below
          var tTs = -1
          var tDeltas: Array[Long] = null
          var tSizes: Array[Long] = null
          var tOffsets: Array[Long] = null
          var tConst = -1L
          walkBoxes(p, s2, e2) { (id3, s3, e3) =>
            if (id3 == "mdia") walkBoxes(p, s3, e3) { (id4, s4, e4) =>
              if (id4 == "mdhd" && s4 + 4 <= e4) {
                val v = p(s4.toInt) & 0xff
                // FullBox: v0 cre(4) mod(4) ts(4) dur(4); v1 cre(8) mod(8) ts(4) dur(8)
                if (v == 0 && s4 + 16 <= e4) tTs = be32(p, s4.toInt + 12).toInt
                else if (v == 1 && s4 + 24 <= e4) tTs = be32(p, s4.toInt + 20).toInt
              } else if (id4 == "minf") walkBoxes(p, s4, e4) { (id5, s5, e5) =>
                if (id5 == "stbl") walkBoxes(p, s5, e5) { (id6, s6, e6) =>
                  if (id6 == "stts" && tDeltas == null)
                    tDeltas = runLengths(s6, e6, signedValues = false)
                  else if (id6 == "ctts" && tOffsets == null && s6 + 4 <= e6) {
                    // composition offsets: v0 stores u32, v1 stores s32
                    // (negative offsets legal); pts = dts + offset
                    val v = p(s6.toInt) & 0xff
                    tOffsets = runLengths(s6, e6, signedValues = v == 1)
                  } else if (id6 == "stsz" && s6 + 12 <= e6 && tSizes == null) {
                    // ver/flags(4) sample_size(4) sample_count(4) [sizes]
                    val sampleSize = be32(p, s6.toInt + 4)
                    val count = be32(p, s6.toInt + 8)
                    if (sampleSize > 0) tConst = sampleSize
                    else if (count <= MaxFrames &&
                        s6 + 12 + count * 4 <= e6) {
                      tSizes = Array.tabulate(count.toInt)(i =>
                        be32(p, (s6 + 12 + i * 4L).toInt))
                    }
                  }
                }
              }
            }
          }
          if (tDeltas != null) {
            mediaTs = tTs; deltas = tDeltas; sizes = tSizes
            offsets = tOffsets; constSize = tConst
            done = true
          }
        }
      }
    }
    if (deltas == null || mediaTs <= 0) return FrameTable(-1, Array.empty)
    val n =
      if (sizes != null) math.min(deltas.length, sizes.length)
      else deltas.length
    var dts = 0L
    val out = new Array[Frame](n)
    var i = 0
    while (i < n) {
      // size -1 = "no size information" (stsz absent/rejected), NOT a
      // zero-byte sample — a byte-budgeting sampler must see unknown
      val sz =
        if (sizes != null) sizes(i)
        else constSize // -1 sentinel when the table carried no sizes
      val off = if (offsets != null && i < offsets.length) offsets(i) else 0L
      out(i) = Frame(i, dts + off, sz)
      dts += deltas(i)
      i += 1
    }
    FrameTable(mediaTs, out)
  } catch { case _: Exception => FrameTable(-1, Array.empty) }

  /** Every-`nth`-frame sample of [[frames]] — the frame-sampling
    * operator's kernel (a keyframe/stride sampler over the table). */
  def frameSample(p: Array[Byte], nth: Int): FrameTable = {
    require(nth >= 1, s"stride must be >= 1, got $nth")
    val ft = frames(p)
    FrameTable(ft.timescale, ft.frames.filter(_.idx % nth == 0))
  }

  // ── image resize: nearest-neighbor with integer index mapping ──

  /** Nearest-neighbor resize: target pixel (x, y) samples source pixel
    * ((x * srcW) / dstW, (y * srcH) / dstH) — pure integer floor
    * mapping, so the result is bit-deterministic across JVMs (no
    * float rounding, no interpolation kernel). The per-asset batch
    * shape lives in [[Multimodal]]; this is the per-image kernel. */
  def resizeNearest(img: java.awt.image.BufferedImage,
      dstW: Int, dstH: Int): java.awt.image.BufferedImage = {
    require(dstW > 0 && dstH > 0, s"target dims must be positive: ${dstW}x$dstH")
    val (sw, sh) = (img.getWidth, img.getHeight)
    val out = new java.awt.image.BufferedImage(
      dstW, dstH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // row-wise bulk getRGB/setRGB: one color-model conversion per row
    // instead of per pixel (~10x on this measured-hot path); the x
    // index map is precomputed once — both produce the identical ARGB
    // ints, so the bit-determinism contract is unchanged
    val xmap = Array.tabulate(dstW)(x => (x.toLong * sw / dstW).toInt)
    val srcRow = new Array[Int](sw)
    val dstRow = new Array[Int](dstW)
    var y = 0
    while (y < dstH) {
      val sy = (y.toLong * sh / dstH).toInt
      img.getRGB(0, sy, sw, 1, srcRow, 0, sw)
      var x = 0
      while (x < dstW) { dstRow(x) = srcRow(xmap(x)); x += 1 }
      out.setRGB(0, y, dstW, 1, dstRow, 0, dstW)
      y += 1
    }
    out
  }

  // ── fallback: byte-histogram moments (former stub semantics) ──

  private def fallback(p: Array[Byte], fmt: String): Media = {
    var sum = 0L; var sq = 0.0
    var i = 0
    while (i < p.length) {
      val v = p(i) & 0xff
      sum += v; sq += v.toDouble * v
      i += 1
    }
    val n = math.max(p.length, 1)
    Media(fmt, -1, -1, -1, -1, -1L, -1.0,
      Array(p.length.toDouble, sum.toDouble / n, sq / n))
  }

  // ── WAV construction (16-bit PCM mono/stereo) — used by tests and
  // the oracle-checked decode query to synthesize real payloads ──

  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // ── MP4 construction (ftyp + mdat + moov[mvhd, trak(tkhd)*]) — used
  // by tests and the oracle-checked video query to synthesize real
  // ISO-BMFF payloads with analytically-known metadata ──

  /** Sample-table spec for [[mp4Bytes]]'s FIRST track: mdhd media
    * timescale, constant stts delta, per-sample stsz sizes. */
  final case class FrameSpec(timescale: Int, delta: Int, sizes: Array[Int])

  def mp4Bytes(timescale: Int, duration: Long,
      trackDims: Seq[(Int, Int)], codecs: Seq[String] = Nil,
      frameSpec: Option[FrameSpec] = None): Array[Byte] = {
    require(codecs.isEmpty || codecs.length == trackDims.length,
      "codecs must be absent or one per track")
    frameSpec.foreach { fs =>
      require(fs.timescale > 0 && fs.delta > 0 && fs.sizes.nonEmpty,
        "frame spec needs positive timescale/delta and at least one sample")
    }
    require(codecs.forall(c => c.length == 4 && c.forall(_ < 128)),
      "codec fourcc must be 4 ASCII chars")
    // mvhd/tkhd v0 carry duration as u32: the decode side reads it back
    // unsigned (be32 → Long), so any value in [0, 2^32) round-trips via
    // putInt's bit pattern — but a wider value would silently truncate
    // and diverge from an oracle computing the arithmetic in BIGINT.
    require(duration >= 0 && duration <= 0xFFFFFFFFL,
      s"duration $duration does not fit a v0 mvhd u32")
    def box(tp: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + body.length) // BE default
      buf.putInt(8 + body.length).put(tp.getBytes("US-ASCII")).put(body)
      buf.array()
    }
    val unityMatrix = Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100) // v0 body
      b.putInt(0) // version 0 + flags
      b.putInt(0).putInt(0) // creation, modification
      b.putInt(timescale).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, rsvd
      b.putLong(0) // reserved
      unityMatrix.foreach(b.putInt)
      (0 until 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(trackDims.length + 1) // next_track_ID
      b.array()
    })
    val traks = trackDims.zipWithIndex.map { case ((tw, th), i) =>
      val tkhd = box("tkhd", {
        val b = java.nio.ByteBuffer.allocate(84) // v0 body
        b.putInt(0x000007) // version 0 + flags (enabled|in-movie|in-preview)
        b.putInt(0).putInt(0) // creation, modification
        b.putInt(i + 1).putInt(0).putInt(duration.toInt) // track_ID, rsvd, duration
        b.putLong(0) // reserved
        b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, alt, vol, rsvd
        unityMatrix.foreach(b.putInt)
        b.putInt(tw << 16).putInt(th << 16) // 16.16 fixed width/height
        b.array()
      })
      // mdia → minf → stbl → stsd with one sample entry: FullBox(4) +
      // entry_count(4), then the entry box (8-byte SampleEntry base:
      // 6 reserved + 2 data_reference_index) whose type IS the codec
      val stsdOpt = codecs.lift(i).map { c =>
        val entry = box(c, Array[Byte](0, 0, 0, 0, 0, 0, 0, 1))
        box("stsd", {
          val b = java.nio.ByteBuffer.allocate(8 + entry.length)
          b.putInt(0).putInt(1).put(entry) // ver/flags, entry_count, entry
          b.array()
        })
      }
      // sample tables (first track only): stts as one run-length entry,
      // stsz with explicit per-sample sizes, stco with the single mdat
      // chunk offset — plus an mdhd carrying the MEDIA timescale the
      // pts arithmetic runs in (distinct from the mvhd movie timescale)
      val fsOpt = if (i == 0) frameSpec else None
      val tables = fsOpt.map { fs =>
        val n = fs.sizes.length
        val stts = box("stts", {
          val b = java.nio.ByteBuffer.allocate(16)
          b.putInt(0).putInt(1).putInt(n).putInt(fs.delta)
          b.array()
        })
        val stsz = box("stsz", {
          val b = java.nio.ByteBuffer.allocate(12 + 4 * n)
          b.putInt(0).putInt(0).putInt(n) // ver/flags, sample_size=0, count
          fs.sizes.foreach(b.putInt)
          b.array()
        })
        val stco = box("stco", {
          val b = java.nio.ByteBuffer.allocate(12)
          b.putInt(0).putInt(1).putInt(32) // one chunk: mdat body offset
          b.array()
        })
        stts ++ stsz ++ stco
      }
      val mdhd = fsOpt.map { fs =>
        box("mdhd", {
          val b = java.nio.ByteBuffer.allocate(24) // v0 body
          b.putInt(0) // version 0 + flags
          b.putInt(0).putInt(0) // creation, modification
          b.putInt(fs.timescale)
          b.putInt(fs.delta * fs.sizes.length) // duration in media units
          b.putShort(0x55c4.toShort).putShort(0) // language "und", pre_defined
          b.array()
        })
      }
      val stblKids = stsdOpt.getOrElse(Array.emptyByteArray) ++
        tables.getOrElse(Array.emptyByteArray)
      val mdia =
        if (stblKids.isEmpty) Array.emptyByteArray
        else box("mdia", mdhd.getOrElse(Array.emptyByteArray) ++
          box("minf", box("stbl", stblKids)))
      box("trak", tkhd ++ mdia)
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
        "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", Array[Byte](0xde.toByte, 0xad.toByte))
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ mdat ++ moov
  }
}
