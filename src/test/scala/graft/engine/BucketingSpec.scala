package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Co-located joins via bucketed tables: pre-shuffling both sides into
  * the same bucket layout removes the per-query Exchange — at 100 TB,
  * bucketing fact tables on their join key turns every downstream join
  * into a local zip of buckets. */
class BucketingSpec extends SparkSuite {

  test("bucketed join plans without an Exchange on either side") {
    // force the sort-merge path (tiny test tables would broadcast,
    // which hides exactly the shuffle bucketing is meant to remove)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables(spark, "/root/testdata/sf0.001", "orders")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, "/root/testdata/sf0.001", "customer")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be exchange-free:\n$plan")
    assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("an EMPTY bucketed artifact survives a lost-catalog re-registration") {
    // a zero-row builder writes only _SUCCESS; schema inference over
    // that dir throws, so re-registration must use the builder's plan
    // schema (round-12 review: pre-fix, every lost-catalog resolution
    // of an empty artifact crashed permanently)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bkt-empty").toString
    Scratch.durableRootOverride = Some(dir)
    Scratch.resetForTest()
    try {
      def build = Seq((1L, "x")).toDF("k", "v").filter(col("k") < 0) // 0 rows
      val t1 = Bucketing.cachedTable(spark, "emptyspec", "d1", "k", 2,
        owner = "empty-spec")(build)
      assert(spark.table(t1).count() == 0)
      // "restart": catalog entry survives in the session, so drop it to
      // simulate the fresh-session lost-catalog path, and reset the
      // in-JVM memos (disk + marker survive)
      spark.sql(s"DROP TABLE `$t1`")
      Scratch.resetForTest()
      Scratch.durableRootOverride = Some(dir)
      val t2 = Bucketing.cachedTable(spark, "emptyspec", "d1", "k", 2,
        owner = "empty-spec")(build)
      assert(t2 == t1, "deterministic name must be stable across restarts")
      assert(spark.table(t2).count() == 0,
        "the empty artifact must re-register from the builder schema")
    } finally {
      Scratch.durableRootOverride = None
      Scratch.resetForTest()
    }
  }

  test("a same-named catalog entry pointing at a STALE location is re-pointed") {
    // table names encode only the artifact key hash, not the scratch
    // root — an entry left by another root must not be silently served
    // (round-12 review)
    import spark.implicits._
    val dirA = Files.createTempDirectory("graft-bkt-rootA").toString
    val dirB = Files.createTempDirectory("graft-bkt-rootB").toString
    def build = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    try {
      Scratch.durableRootOverride = Some(dirA)
      Scratch.resetForTest()
      val t1 = Bucketing.cachedTable(spark, "relocspec", "d1", "k", 2,
        owner = "reloc-spec")(build)
      assert(spark.table(t1).count() == 2)
      // root swap with the SESSION (and its catalog entry) surviving:
      // the same key resolves to a path under dirB now
      Scratch.durableRootOverride = Some(dirB)
      Scratch.resetForTest()
      val t2 = Bucketing.cachedTable(spark, "relocspec", "d1", "k", 2,
        owner = "reloc-spec")(build)
      assert(t2 == t1, "same key, same deterministic name")
      val loc = spark.sql(s"DESCRIBE FORMATTED `$t2`")
        .where(col("col_name") === "Location").head().getString(1)
      assert(loc.contains(dirB.split('/').last),
        s"catalog entry must be re-pointed at the new root, got $loc")
      assert(spark.table(t2).count() == 2)
    } finally {
      Scratch.durableRootOverride = None
      Scratch.resetForTest()
    }
  }

  test("cachedTable: a prefix reused from a second call site fails loudly") {
    import spark.implicits._
    // the schema-keyed cache cannot tell two builders with the SAME
    // schema apart, so the contract is one builder (= one call site)
    // per prefix — pre-fix, the second site was silently served the
    // first builder's artifact; now it throws
    // ONE literal call site, reused — the owner; mirrors production
    // shape (every prefix's cachedTable call lives inside one helper)
    def resolve() = Bucketing.cachedTable(spark, "sitespec", "dirX", "id", 2)(
      Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    val t1 = resolve()
    assert(spark.table(t1).columns.toSeq == Seq("id", "tag"))
    val e = intercept[IllegalStateException] {
      Bucketing.cachedTable(spark, "sitespec", "dirX", "id", 2)(
        Seq((9L, "z"), (8L, "y"), (7L, "x")).toDF("id", "tag"))
    }
    assert(e.getMessage.contains("must be unique per builder"))
    // the owning site keeps working after the rejected claim
    val names = (1 to 2).map(_ => resolve())
    assert(names.distinct == Seq(t1))
  }

  test("cachedTable: two builders through ONE shared helper still fail loudly") {
    import spark.implicits._
    // round-11 verdict item 3: the call-site default is wrapper-blind —
    // two different builders routed through a single helper line would
    // present the SAME site and pass silently. Helpers therefore thread
    // an explicit per-builder owner token, which the ownership map keys
    // on instead of the (shared) stack position.
    def resolveVia(owner: String, df: => org.apache.spark.sql.DataFrame) =
      Bucketing.cachedTable(spark, "helperspec", "dirY", "id", 2,
        owner = owner)(df)
    val t1 = resolveVia("builderA", Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    assert(spark.table(t1).columns.toSeq == Seq("id", "tag"))
    val e = intercept[IllegalStateException] {
      resolveVia("builderB", Seq((9L, "z")).toDF("id", "tag"))
    }
    assert(e.getMessage.contains("owner 'builderA'") &&
      e.getMessage.contains("owner 'builderB'"))
    // the inverse misfire is fixed too: the SAME builder resolved from
    // a SECOND call line sharing the owner token no longer throws
    val t2 = Bucketing.cachedTable(spark, "helperspec", "dirY", "id", 2,
      owner = "builderA")(Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    assert(t2 == t1)
  }
}
