package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.SparkSuite

/** The artifact schema-fingerprint contract (round-9): a builder whose
  * output layout changes must REBUILD under a durable root, never
  * serve the prior layout — the generalization of the round-8
  * tau_prefix "v2" hand-bump, which existed precisely because a schema
  * change without a key change kept resolving to stale data. Three
  * mechanisms are pinned here:
  *   - [[Scratch.cachedFrame]]: the frame's schema rides the key, so
  *     an edited builder re-keys and rebuilds while an unchanged one
  *     still reuses across a (simulated) restart;
  *   - [[Scratch.outsKey]]: a declared multi-output layout's
  *     fingerprint changes when any declared schema changes;
  *   - [[Scratch.writeDeclared]]: a builder writing a frame that
  *     drifted from its declaration fails LOUDLY at build time (the
  *     declaration is the cache key — drift would resurrect the
  *     silent-stale hazard). */
class ScratchSchemaSpec extends SparkSuite {

  private def withDurableRoot(f: => Unit): Unit = {
    val dir = Files.createTempDirectory("graft_schema_spec")
    Scratch.durableRootOverride = Some(dir.toString)
    Scratch.resetForTest()
    try f
    finally {
      Scratch.durableRootOverride = None
      Scratch.resetForTest()
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }
  }

  test("cachedFrame: schema change rebuilds; unchanged schema reuses") {
    import spark.implicits._
    withDurableRoot {
      val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      val got1 = Scratch.cachedFrame("sschema", "corpusX")(v1)
      assert(Scratch.buildCount == 1)
      assert(got1.columns.toSeq == Seq("id", "tag"))

      Scratch.resetForTest() // restart: memo gone, disk survives
      // identical builder: durable reuse, zero builds
      val got2 = Scratch.cachedFrame("sschema", "corpusX")(v1)
      assert(Scratch.buildCount == 0,
        "unchanged schema must reuse the durable artifact")
      assert(got2.count() == 2)

      Scratch.resetForTest()
      // the builder now emits a different layout under the SAME
      // logical key — the fingerprint must re-key and rebuild, and the
      // read-back must carry the NEW schema, not the v1 parquet
      val v2 = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score")
      val got3 = Scratch.cachedFrame("sschema", "corpusX")(v2)
      assert(Scratch.buildCount == 1,
        "changed schema must rebuild, not serve the stale layout")
      assert(got3.columns.toSeq == Seq("id", "score"))
      assert(got3.schema("score").dataType.typeName == "double")
    }
  }

  test("cachedFrame reentrancy under a durable root: nested builds, " +
      "restart reuse, schema change leaves the old artifact intact") {
    import spark.implicits._
    withDurableRoot {
      // the tau_prefix -> tok_sets shape: the OUTER builder resolves
      // another cachedFrame artifact inside its own build
      def inner = Scratch.cachedFrame("sreent", "inner")(
        Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "tok"))
      def outerV1 = Scratch.cachedFrame("sreent", "outer")(
        inner.groupBy("id").agg(count(lit(1)).as("n")))

      assert(outerV1.count() == 2)
      assert(Scratch.buildCount == 2, "outer + inner each build once")

      Scratch.resetForTest() // restart: memos gone, durable disk survives
      assert(outerV1.count() == 2)
      assert(Scratch.buildCount == 0,
        "post-restart, both artifacts must resolve from markers — " +
          "including the nested resolve inside the outer schema probe")

      // capture the old outer artifact's on-disk location via its
      // marker (the marker records the full key, schema fingerprint
      // included) before swapping the builder
      val rootDir = java.nio.file.Paths.get(
        Scratch.durableRootOverride.get, "sreent")
      def markers = {
        val s = Files.list(rootDir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(_.toString.endsWith(".done")).toVector
        } finally s.close()
      }
      val oldMarkers = markers
      assert(oldMarkers.size == 2)

      Scratch.resetForTest()
      // the outer builder now emits a different layout under the SAME
      // logical key: outer must re-key + rebuild (still through the
      // reentrant inner resolve), inner must be reused from disk, and
      // the OLD outer artifact must remain intact for any process
      // still resolving the old key
      val outerV2 = Scratch.cachedFrame("sreent", "outer")(
        inner.groupBy("id").agg(count(lit(1)).cast("double").as("score")))
      assert(outerV2.columns.toSeq == Seq("id", "score"))
      assert(Scratch.buildCount == 1,
        "only the re-keyed outer may rebuild; inner reuses its marker")
      assert(markers.size == 3, "schema change adds a key, never replaces")
      oldMarkers.foreach { m =>
        val art = java.nio.file.Paths.get(
          m.toString.stripSuffix(".done"))
        assert(Files.exists(art), s"old artifact $art must stay intact")
        val s = Files.list(art)
        val hasParquet =
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.exists(_.toString.endsWith(".parquet"))
          } finally s.close()
        assert(hasParquet, s"old artifact $art must keep its parquet")
      }
    }
  }

  test("outsKey changes when any declared output schema changes") {
    val a = Seq(
      "cent" -> StructType.fromDDL("cid BIGINT, ce ARRAY<DOUBLE>"),
      "cells" -> StructType.fromDDL("vec_id BIGINT, cid BIGINT"))
    val b = Seq(
      "cent" -> StructType.fromDDL("cid BIGINT, ce ARRAY<DOUBLE>"),
      "cells" -> StructType.fromDDL("vec_id BIGINT, cid INT")) // cid narrowed
    assert(Scratch.outsKey(a) != Scratch.outsKey(b))
    assert(Scratch.outsKey(a) == Scratch.outsKey(a.map(identity)))
  }

  test("writeDeclared refuses a frame that drifted from its declaration") {
    import spark.implicits._
    val declared = StructType.fromDDL("id BIGINT, tag STRING")
    val drifted = Seq((1L, 2L)).toDF("id", "tag") // tag is BIGINT now
    val out = Files.createTempDirectory("graft_wd").resolve("x")
    val e = intercept[IllegalStateException] {
      Scratch.writeDeclared(drifted, declared, out.toString)
    }
    assert(e.getMessage.contains("schema drift"))
    assert(!Files.exists(out), "a drifted write must not materialize")
  }
}
