package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.VecOps.{vec_dot, vec_norm2}

class VecOpsSpec extends SparkSuite {
  import spark.implicits._

  test("vec_dot matches a sequential fold exactly (codegen path)") {
    val a = Seq(1.5, -2.0, 3.25, 0.125)
    val b = Seq(0.5, 4.0, -1.0, 8.0)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val got = Seq((a, b)).toDF("a", "b")
      .select(vec_dot(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(got == expected) // bit-exact, not approx
  }

  test("vec_dot agrees with the interpreted HOF form on real embeddings") {
    val df = graft.engine.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("e", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .select(
        vec_norm2(col("e")).as("fast"),
        expr("aggregate(transform(e, x -> x * x), CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
          .as("slow"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows.nonEmpty && rows.forall { case (f, s) => f == s })
  }

  test("sorted_intersect_count matches array_intersect semantics") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(4L), Seq(4L))).toDF("a", "b")
    val got = df.select(
      VecOps.sorted_intersect_count(col("a"), col("b")).as("fast"),
      expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("ref"))
      .as[(Long, Long)].collect()
    assert(got.forall { case (f, r) => f == r }, got.toSeq.toString)
  }

  test("vec_dot of mismatched lengths is null (undefined, not truncated)") {
    val rows = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0)),
      (Seq(1.0, 2.0), Seq(10.0, 10.0))).toDF("a", "b")
      .select(vec_dot(col("a"), col("b")).as("d"))
      .collect()
    assert(rows(0).isNullAt(0)) // mismatch → null, matching the DuckDB twin
    assert(rows(1).getDouble(0) == 30.0)
    // null propagates through the interpreted path too
    val interp = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(vec_dot(col("a"), col("b")).as("d"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(interp.collect()(0).isNullAt(0))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null ELEMENTS poison both functions to null, never 0-reads") {
    // getDouble/getLong on a null slot silently reads 0 — the
    // composable aggregate/zip_with form and the DuckDB list twins
    // both return NULL, so the codegen'd forms must too
    val r = spark.range(1).select(
      VecOps.vec_dot(expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        expr("array(2.0D, 3.0D)")).as("d"),
      VecOps.sorted_intersect_count(expr("array(0L, 5L)"),
        expr("array(CAST(NULL AS BIGINT), 5L)")).as("c"),
      VecOps.vec_dot(expr("array(1.0D, 2.0D)"),
        expr("array(2.0D, 3.0D)")).as("d_ok"),
      VecOps.sorted_intersect_count(expr("array(0L, 5L)"),
        expr("array(0L, 5L)")).as("c_ok")).collect().head
    assert(r.isNullAt(0), "vec_dot over a null element must be null")
    assert(r.isNullAt(1), "sorted_intersect_count over a null element must be null")
    assert(r.getDouble(2) == 8.0 && r.getLong(3) == 2L,
      "null-free inputs must be unaffected")
  }

  test("a TRAILING null element is poison too, on both codegen and interpreted paths") {
    // round-12 review (confirmed live): the old in-loop guard only
    // checked positions the merge walk visited, so a null past the
    // point where one array is exhausted returned a count — and
    // array_sort puts nulls LAST, making that exactly the realistic
    // position. The contract is position-independent; round 13
    // enforces it with a tail scan over the unvisited remainder
    // instead of round 12's full pre-scan (one traversal, not two).
    def probe() = spark.range(1).select(
      VecOps.sorted_intersect_count(expr("array(1L, CAST(NULL AS BIGINT))"),
        expr("array(1L)")).as("c_trail"),
      VecOps.sorted_intersect_count(expr("array(1L)"),
        expr("array(1L, CAST(NULL AS BIGINT))")).as("c_trail_r"),
      VecOps.vec_dot(expr("array(1.0D, CAST(NULL AS DOUBLE))"),
        expr("array(2.0D, 3.0D)")).as("d_trail")).collect().head
    val cg = probe()
    assert(cg.isNullAt(0) && cg.isNullAt(1) && cg.isNullAt(2),
      s"codegen path must null on trailing null elements, got $cg")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val in = probe()
      assert(in.isNullAt(0) && in.isNullAt(1) && in.isNullAt(2),
        s"interpreted path must null on trailing null elements, got $in")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
