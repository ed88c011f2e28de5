package graft.engine

import java.nio.file.Files

import graft.SparkSuite
import graft.ext.Pipeline

/** The `bin_src` artifact was the last Scratch root keyed by `dir`
  * alone (round-10 verdict item 2): its payload is raw WAV files, so
  * the parquet schema fingerprint can't apply — a builder edit under a
  * durable root would have silently kept serving the old byte layout.
  * The hand-rolled layout tag ([[Pipeline.BinSrcLayout]]) closes that:
  * this spec pins that the tag rides the cache key (same tag reuses
  * across a restart, a bumped tag re-keys and rebuilds while leaving
  * the prior artifact intact for any process still resolving it). */
class BinSrcLayoutSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def withDurableRoot(f: java.nio.file.Path => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_binsrc_spec")
    Scratch.durableRootOverride = Some(dir.toString)
    Scratch.resetForTest()
    try f(dir)
    finally {
      Scratch.durableRootOverride = None
      Scratch.resetForTest()
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  private def wavCount(path: String): Int = {
    val d = new java.io.File(path)
    Option(d.listFiles()).map(_.count(_.getName.endsWith(".wav"))).getOrElse(0)
  }

  test("layout tag keys the artifact: reuse on match, rebuild on bump") {
    withDurableRoot { _ =>
      val p1 = Pipeline.binSrcArtifact(spark, sf)
      assert(Scratch.buildCount == 1)
      val n1 = wavCount(p1)
      assert(n1 > 0, "builder must materialize wav assets")

      Scratch.resetForTest() // restart: memo gone, disk survives
      val p2 = Pipeline.binSrcArtifact(spark, sf)
      assert(Scratch.buildCount == 0,
        "unchanged layout tag must reuse the durable artifact")
      assert(p2 == p1)

      Scratch.resetForTest()
      // a builder edit = a tag bump: must re-key to a NEW path and
      // rebuild, leaving the old artifact bytes untouched
      val p3 = Pipeline.binSrcArtifact(spark, sf, layout = "wav_v2_test")
      assert(Scratch.buildCount == 1,
        "bumped layout tag must rebuild, not serve the stale layout")
      assert(p3 != p1)
      assert(wavCount(p1) == n1, "prior-layout artifact must stay intact")
      assert(wavCount(p3) == n1)
    }
  }
}
