package graft.engine

import java.nio.file.Files

import graft.SparkSuite

class SdfsSpec extends SparkSuite {

  private def newSdfs(): (Sdfs, java.nio.file.Path) = {
    val root = Files.createTempDirectory("graft-sdfs")
    (new Sdfs(spark, root.toString), root)
  }

  test("put / get / ls / global / delete round-trip (S4-S7)") {
    val (sdfs, root) = newSdfs()
    val local = Files.createTempFile("graft", ".txt")
    Files.writeString(local, "k1,v1\nk2,v2\n")

    sdfs.put(local.toString, "data.txt")
    assert(sdfs.global() == Seq("data.txt"))
    assert(sdfs.ls("data.txt").nonEmpty)

    val back = Files.createTempFile("graft-back", ".txt")
    sdfs.get("data.txt", back.toString)
    assert(Files.readString(back) == "k1,v1\nk2,v2\n")

    assert(sdfs.delete("data.txt"))
    assert(sdfs.global().isEmpty)
  }

  test("putDf / read round-trip for DataFrame sinks (S8)") {
    import spark.implicits._
    val (sdfs, _) = newSdfs()
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    sdfs.putDf(df, "kv")
    val back = sdfs.read("kv").as[(String, Long)].collect().toMap
    assert(back == Map("a" -> 1L, "b" -> 2L))
  }

  test("multi-format sinks: csv / json / orc round-trip (source parity)") {
    import spark.implicits._
    val (sdfs, _) = newSdfs()
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    Seq("json", "orc").foreach { fmt =>
      sdfs.putDf(df, s"kv_$fmt", fmt)
      val back = sdfs.read(s"kv_$fmt", fmt).as[(String, Long)].collect().toMap
      assert(back == Map("a" -> 1L, "b" -> 2L), fmt)
    }
    // csv loses types without a schema — read back with one
    sdfs.putDf(df, "kv_csv", "csv")
    val back = spark.read.schema("k STRING, v BIGINT")
      .csv(s"${sdfs.read("kv_csv", "csv").inputFiles.head.split("/part-").head}")
      .as[(String, Long)].collect().toMap
    assert(back == Map("a" -> 1L, "b" -> 2L))
  }
}
