package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Sample-table parsing contracts the synthetic [[MediaDecoder.mp4Bytes]]
  * fixtures cannot express (round-12 review): multi-track files where
  * tables must not mix across tracks, ctts composition offsets
  * (B-frame pts != dts), and the unknown-size sentinel. Boxes are
  * hand-built big-endian, same conventions as mp4Bytes. */
class MediaDecoderSpec extends AnyFunSuite {

  private def box(tp: String, body: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8 + body.length)
    b.putInt(8 + body.length).put(tp.getBytes("US-ASCII")).put(body)
    b.array()
  }
  private def beInts(xs: Int*): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(4 * xs.length)
    xs.foreach(b.putInt)
    b.array()
  }
  private def mdhd(ts: Int, dur: Int): Array[Byte] =
    box("mdhd", beInts(0, 0, 0, ts, dur) ++ Array[Byte](0x55, 0xc4.toByte, 0, 0))
  private def stts(pairs: (Int, Int)*): Array[Byte] =
    box("stts", beInts(0 +: pairs.length +:
      pairs.flatMap(p => Seq(p._1, p._2)): _*))
  private def ctts(version: Int, pairs: (Int, Int)*): Array[Byte] =
    box("ctts", beInts((version << 24) +: pairs.length +:
      pairs.flatMap(p => Seq(p._1, p._2)): _*))
  private def stsz(sizes: Int*): Array[Byte] =
    box("stsz", beInts(0 +: 0 +: sizes.length +: sizes: _*))
  private def trak(kids: Array[Byte]): Array[Byte] =
    box("trak", box("mdia", kids))
  private def mp4(traks: Array[Byte]*): Array[Byte] = {
    val ftyp = box("ftyp", "isomXXXXisom2".take(8).getBytes("US-ASCII"))
    // mvhd v0: ver/flags, cre, mod, ts, dur (enough for the walk)
    val mvhd = box("mvhd", beInts(0, 0, 0, 1000, 5000) ++ new Array[Byte](80))
    ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)
  }

  test("tables from different tracks never mix: first FULL parse wins") {
    // trak 1 carries ONLY an stsz (no stts — e.g. a hint track shape);
    // trak 2 carries a complete stts+stsz. The committed table must be
    // trak 2's as a UNIT — pre-fix, trak 1's sizes paired with trak
    // 2's timing into a fabricated table
    val t1 = trak(mdhd(1000, 100) ++
      box("minf", box("stbl", stsz(111, 222, 333))))
    val t2 = trak(mdhd(90000, 3000) ++
      box("minf", box("stbl", stts(2 -> 1500) ++ stsz(10, 20))))
    val ft = MediaDecoder.frames(mp4(t1, t2))
    assert(ft.timescale == 90000, s"expected trak 2's timescale, got $ft")
    assert(ft.frames.map(_.size).toSeq == Seq(10L, 20L),
      s"sizes must come from the SAME track as the timing: ${ft.frames.toSeq}")
    assert(ft.frames.map(_.ptsUnits).toSeq == Seq(0L, 1500L))
  }

  test("ctts composition offsets shift pts off the stts decode times") {
    // 3 samples, constant decode delta 100; ctts v0 offsets 200,0,100
    // (a classic B-frame reorder): pts = dts + offset
    val t = trak(mdhd(1000, 300) ++
      box("minf", box("stbl",
        stts(3 -> 100) ++ ctts(0, 1 -> 200, 1 -> 0, 1 -> 100) ++
          stsz(5, 6, 7))))
    val ft = MediaDecoder.frames(mp4(t))
    assert(ft.frames.map(_.ptsUnits).toSeq == Seq(200L, 100L, 300L),
      s"pts must include composition offsets: ${ft.frames.toSeq}")
  }

  test("ctts v1 signed negative offsets are honored") {
    val t = trak(mdhd(1000, 200) ++
      box("minf", box("stbl",
        stts(2 -> 100) ++ ctts(1, 1 -> 100, 1 -> -50) ++ stsz(5, 6))))
    val ft = MediaDecoder.frames(mp4(t))
    assert(ft.frames.map(_.ptsUnits).toSeq == Seq(100L, 50L),
      s"v1 ctts offsets are signed: ${ft.frames.toSeq}")
  }

  test("a track without any stsz reports size -1 (unknown), not 0") {
    val t = trak(mdhd(1000, 200) ++
      box("minf", box("stbl", stts(2 -> 100))))
    val ft = MediaDecoder.frames(mp4(t))
    assert(ft.frames.nonEmpty &&
      ft.frames.forall(_.size == -1L),
      s"unknown size must be the -1 sentinel: ${ft.frames.toSeq}")
  }

  test("a declared-huge image payload falls back instead of decoding") {
    // a tiny BMP whose header DECLARES enormous dimensions: the
    // header-first cap must route it to the byte-moment fallback
    // (pre-fix: ImageIO tried to allocate the full raster)
    val b = java.nio.ByteBuffer.allocate(62)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(62)
    b.putInt(40).putInt(60000).putInt(60000) // BITMAPINFOHEADER w/h
    b.putShort(1).putShort(24).putInt(0).putInt(0)
    b.putInt(0).putInt(0).putInt(0).putInt(0)
    val m = MediaDecoder.decode(b.array())
    assert(m.width == -1 && m.height == -1,
      s"bomb dimensions must not be reported as a decoded image: $m")
  }
}
