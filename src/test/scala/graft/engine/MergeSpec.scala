package graft.engine

import org.apache.spark.sql.functions.{coalesce, lit}

import graft.SparkSuite

/** Merge.upsert semantics: last-write-wins on match (explicit nulls
  * honored), pass-through, insert with null target-only columns, and
  * per-column combine overrides. */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    .toDF("k", "name", "cnt")

  test("matched rows take the update, unmatched pass through, new keys insert") {
    val updates = Seq((2L, "B2", 7L), (9L, "new", 1L)).toDF("k", "name", "cnt")
    val out = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "B2", 7L), (3L, "c", 30L), (9L, "new", 1L)))
  }

  test("update columns may be a subset; explicit null in an update wins") {
    val updates = Seq((3L, null.asInstanceOf[String])).toDF("k", "name")
    val out = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, Option[String], Long)].collect().toSeq
    // row 3: name explicitly nulled by the update, cnt (not in updates) kept
    assert(out == Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, None, 30L)))
  }

  test("combine override: additive counter across match and insert") {
    val updates = Seq((1L, 5L), (9L, 2L)).toDF("k", "cnt")
    val add = (t: org.apache.spark.sql.Column, u: org.apache.spark.sql.Column) =>
      coalesce(t, lit(0L)) + coalesce(u, lit(0L))
    val out = Merge.upsert(target, updates, Seq("k"), Map("cnt" -> add))
      .orderBy("k").select("k", "cnt").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 15L), (2L, 20L), (3L, 30L), (9L, 2L)))
  }

  test("contract violations fail fast") {
    intercept[IllegalArgumentException] {
      Merge.upsert(target, Seq((1L, 1L)).toDF("k", "nope"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(target, Seq(1L).toDF("cnt"), Seq("k"))
    }
  }

  private def rootMessages(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ rootMessages(t.getCause)

  test("checkUniqueKeys: duplicate update keys fail IN the merge execution, naming the key") {
    // the check rides the SAME plan the join consumes (no separate
    // eager pre-scan — round-12 review closed a check-vs-use race), so
    // the violation surfaces when the merged result executes
    val dup = Seq((2L, "x", 1L), (2L, "y", 2L)).toDF("k", "name", "cnt")
    val merged = Merge.upsert(target, dup, Seq("k"), checkUniqueKeys = true)
    val e = intercept[Throwable](merged.collect())
    assert(rootMessages(e).exists(m =>
      m.contains("merge-key contract") && m.contains("(2)")),
      s"expected the named key-contract failure, got: ${rootMessages(e)}")
  }

  test("checkUniqueKeys: a null update key fails instead of silently inserting") {
    val nullKey = Seq((Option.empty[Long], "x", 1L), (Some(9L), "y", 2L))
      .toDF("k", "name", "cnt")
    val merged = Merge.upsert(target, nullKey, Seq("k"), checkUniqueKeys = true)
    val e = intercept[Throwable](merged.collect())
    assert(rootMessages(e).exists(_.contains("merge-key contract")),
      s"expected the key-contract failure, got: ${rootMessages(e)}")
  }

  test("checkUniqueKeys: a clean increment merges identically to the unchecked path") {
    val updates = Seq((2L, "B2", 7L), (9L, "new", 1L)).toDF("k", "name", "cnt")
    val checked = Merge.upsert(target, updates, Seq("k"), checkUniqueKeys = true)
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    val unchecked = Merge.upsert(target, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(checked == unchecked)
    assert(checked == Seq((1L, "a", 10L), (2L, "B2", 7L), (3L, "c", 30L), (9L, "new", 1L)))
  }
}
