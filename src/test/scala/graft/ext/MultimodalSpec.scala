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

  test("stub decoder is deterministic and batch-shape independent") {
    val payload = "hello graft".getBytes("UTF-8")
    val f1 = Multimodal.StubDecoder.decode(payload)
    val f2 = Multimodal.StubDecoder.decode(payload)
    assert(f1.toSeq == f2.toSeq)
    assert(f1(0) == payload.length.toDouble)
  }
}
