package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSuite
import graft.engine.Tables

class TopKPerKeySpec extends SparkSuite {

  test("TopKPerKey matches the window row_number form exactly") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val viaOp = TopK.perKey(orders, 3,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice") -> false, col("o_orderkey") -> true))
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).toSet
    val viaWindow = orders
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(_.toString).toSet
    assert(viaOp == viaWindow)
    assert(viaOp.nonEmpty)
  }

  test("plan contains the custom exec and exactly one keyed exchange") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val df = TopK.perKey(orders, 2,
      Seq(col("o_custkey")), Seq(col("o_totalprice") -> false))
    df.collect() // let AQE finalize the plan before reading it
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("hashpartitioning(o_custkey"), plan)
    // no SortExec needed — the heap replaces the sort
    assert(!plan.contains("(Sort"), plan)
  }

  test("k must be positive (fail fast, not mid-job)") {
    import spark.implicits._
    val df = Seq((1, 10)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      TopK.perKey(df, 0, Seq(col("k")), Seq(col("v") -> true))
    }
  }

  test("k larger than group size returns the whole group") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val out = TopK.perKey(df, 99, Seq(col("k")), Seq(col("v") -> true))
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 10), (1, 20), (2, 5)))
  }

  test("0.0 and -0.0 are ONE key (float keys normalized)") {
    import spark.implicits._
    // UnsafeRow grouping keys compare by bytes and Spark only inserts
    // NormalizeFloatingNumbers above its own grouping operators — the
    // operator normalizes its keys itself, or this key splits in two
    val df = Seq((0.0, 1L), (-0.0, 2L), (-0.0, 3L)).toDF("k", "v")
    val got = TopK.perKey(df, 1, Seq(col("k")), Seq(col("v") -> true))
      .select("v").as[Long].collect().toSeq
    assert(got == Seq(1L), s"0.0/-0.0 split into multiple heaps: $got")
  }

  test("misuse fails fast with a named error, not deep in planning") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "v")
    // all-aggregate columns analyze to an Aggregate node (a mixed
    // key/aggregate select already fails Spark's own MISSING_GROUP_BY
    // analysis) — the operator names the misuse instead of a raw cast
    val eAgg = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(sum(col("k"))), Seq(sum(col("v")) -> true))
    }
    assert(eAgg.getMessage.contains("row-level expressions"), eAgg.getMessage)
    val eKeys = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq.empty, Seq(col("v") -> true))
    }
    assert(eKeys.getMessage.contains("keyCols"), eKeys.getMessage)
    val eOrd = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(col("k")), Seq.empty)
    }
    assert(eOrd.getMessage.contains("orderCols"), eOrd.getMessage)
  }

  test("resolution-layer misuse is refused, never silently misaligned (round-12 review)") {
    import spark.implicits._
    val df = Seq((1L, 2L, Seq(1L, 2L))).toDF("k", "v", "arr")
    // a star expands to several expressions: splitAt/zip would silently
    // misalign keys and order — must be a named error
    val eStar = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(col("*")), Seq(col("v") -> true))
    }
    assert(eStar.getMessage.contains("single expressions"), eStar.getMessage)
    // a generator analyzes to Project-over-Generate: pre-fix it slipped
    // through the aggregate guard, multiplying rows and adding columns
    val eGen = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(col("k")), Seq(explode(col("arr")) -> true))
    }
    assert(eGen.getMessage.contains("generator or window"), eGen.getMessage)
    // a window function likewise analyzes to Project-over-Window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("v"))
    val eWin = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(col("k")), Seq(row_number().over(w) -> true))
    }
    assert(eWin.getMessage.contains("generator or window"), eWin.getMessage)
    // map-typed keys have no canonical binary form (entry order splits
    // one logical key across heaps/partitions) — Spark's own groupBy
    // rejects them; so does the operator
    val dfm = Seq((Map(1 -> 2), 1L)).toDF("mk", "v")
    val eMap = intercept[IllegalArgumentException] {
      TopK.perKey(dfm, 1, Seq(col("mk")), Seq(col("v") -> true))
    }
    assert(eMap.getMessage.contains("map"), eMap.getMessage)
    // nondeterministic expressions would fail partition-init inside
    // executors — refused at the API
    val eRand = intercept[IllegalArgumentException] {
      TopK.perKey(df, 1, Seq(col("k")), Seq(rand() -> true))
    }
    assert(eRand.getMessage.contains("deterministic"), eRand.getMessage)
    // the logical node itself guards k: the strategy is session-wide,
    // so a directly-built plan must fail at construction
    val eK = intercept[IllegalArgumentException] {
      TopKPerKey(0, Seq.empty, Seq.empty,
        org.apache.spark.sql.GraftBridge.logicalPlan(df))
    }
    assert(eK.getMessage.contains("positive"), eK.getMessage)
  }

  test("outputPartitioning propagates: same-key downstream agg adds no exchange") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("k", "v")
    val downstream = TopK.perKey(df, 1, Seq(col("k")), Seq(col("v") -> true))
      .groupBy("k").count()
    val plan = downstream.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"expected ONLY the operator's own keyed exchange, got $exchanges:\n$plan")
    assert(downstream.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(1L -> 1L, 2L -> 1L))
  }
}
