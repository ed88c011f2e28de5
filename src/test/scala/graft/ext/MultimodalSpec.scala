package graft.ext

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {

  test("asset pipeline: binary payloads → per-partition batch decode") {
    val assets = Multimodal.assets(spark, "/root/testdata/sf0.001")
      .repartition(3) // decode parallelism decoupled from file layout
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.nonEmpty)
    // deterministic stub: feature(0) = byte length, checksum = CRC32
    feats.foreach { f =>
      assert(f.feature.length == 3)
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

  test("stub decoder is deterministic and batch-shape independent") {
    val payload = "hello graft".getBytes("UTF-8")
    val f1 = Multimodal.StubDecoder.decode(payload)
    val f2 = Multimodal.StubDecoder.decode(payload)
    assert(f1.toSeq == f2.toSeq)
    assert(f1(0) == payload.length.toDouble)
  }
}
