package graft.engine

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the GridRank decomposition's exactness: every rank / running
  * sum / ntile it produces must be BIT-IDENTICAL to the naive
  * unpartitioned-window form it replaces — on data built to hit the
  * edges (ties inside a bucket, cross-bucket ties on the coarse key,
  * singleton buckets, a bucket holding most of the data, ascending
  * AND descending orders, n < k ntiles). The production queries keep
  * their DuckDB twins in the naive form, so the oracle gate also
  * re-proves the decomposition per query per round; this spec is the
  * direct, adversarial unit proof.
  */
class GridRankSpec extends SparkSuite {

  import spark.implicits._

  // 400 rows, keys deliberately collided: key = (i*7) % 50 gives ~8
  // rows per key; bucket = key div 8 puts several keys per bucket
  // (cross-bucket ties impossible on the full (key, id) order, but
  // key-ties straddle WITHIN buckets); id unique tie-break. One key
  // (13) is inflated to dominate its bucket.
  private def df = ((0 until 400).map(i => ((i * 7) % 50).toLong) ++
      Seq.fill(120)(13L))
    .zipWithIndex.map { case (k, i) => (k, i.toLong) }
    .toDF("key", "id")

  // SYMMETRIC row-set equality plus a count check (round-17 review:
  // a one-directional except() stays green when the grid side DROPS
  // rows — precisely the null-bucket join failure mode)
  private def assertSameRows(grid: org.apache.spark.sql.DataFrame,
      naive: org.apache.spark.sql.DataFrame, cols: String*): Unit = {
    val g = grid.select(cols.head, cols.tail: _*)
    val n = naive.select(cols.head, cols.tail: _*)
    assert(grid.count() == naive.count())
    assert(g.except(n).isEmpty && n.except(g).isEmpty)
  }

  test("rowNumber matches the naive global window, asc and desc") {
    val naiveAsc = df.withColumn("rn",
      row_number().over(Window.orderBy(col("key").asc, col("id").asc))
        .cast("long"))
    val gridAsc = GridRank.rowNumber(df, expr("key div 8"),
      bucketAsc = true, Seq(col("key").asc, col("id").asc), "rn", "n")
    assertSameRows(gridAsc, naiveAsc, "id", "rn")
    assert(gridAsc.select("n").distinct().as[Long].head() == 520L)

    val naiveDesc = df.withColumn("rn",
      row_number().over(Window.orderBy(col("key").desc, col("id").asc))
        .cast("long"))
    val gridDesc = GridRank.rowNumber(df, expr("key div 8"),
      bucketAsc = false, Seq(col("key").desc, col("id").asc), "rn", "n")
    assertSameRows(gridDesc, naiveDesc, "id", "rn")
  }

  test("rowNumber keeps NULL leading keys, placed exactly like the " +
      "naive window (nulls first on asc, last on desc)") {
    val sdf = (Seq[Option[Long]](None, Some(3L), None, Some(40L),
        Some(3L), Some(11L)) ++ (0 until 50).map(i => Some(i.toLong % 7)))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("key", "id")
    for (asc <- Seq(true, false)) {
      val kOrd = if (asc) col("key").asc else col("key").desc
      val naive = sdf.withColumn("rn",
        row_number().over(Window.orderBy(kOrd, col("id").asc))
          .cast("long"))
      val grid = GridRank.rowNumber(sdf, expr("key div 8"),
        bucketAsc = asc, Seq(kOrd, col("id").asc), "rn", "n")
      assertSameRows(grid, naive, "id", "rn")
      assert(grid.select("n").distinct().as[Long].head() == 56L)
    }
  }

  test("runningSum matches the naive global cumulative window") {
    val v = col("key") * 3 + 1
    val naive = df.withColumn("cum",
      sum(v).over(Window.orderBy(col("key").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val grid = GridRank.runningSum(df, expr("key div 8"),
      bucketAsc = false, Seq(col("key").desc, col("id").asc), v,
      "cum", "tot")
    assertSameRows(grid, naive, "id", "cum")
    val tot = df.select(sum(v)).as[Long].head()
    assert(grid.select("tot").distinct().as[Long].head() == tot)
  }

  test("rowNumber is exact on SIGNED keys (div truncates toward " +
      "zero, not floor — a coarser bucket at the sign boundary, " +
      "still monotone)") {
    // keys straddle zero so `key div 8` maps (-7..7) -> 0: the sign
    // boundary's bucket is twice as wide as floor-division would
    // give, which is exactly why the contract demands only
    // MONOTONICITY of the coarsening, not equal widths. -1000
    // inflated to dominate its bucket.
    val sdf = ((-40 to 40).map(i => (i * 7 % 50).toLong) ++
        Seq.fill(60)(-1000L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("key", "id")
    val naive = sdf.withColumn("rn",
      row_number().over(Window.orderBy(col("key").asc, col("id").asc))
        .cast("long"))
    val grid = GridRank.rowNumber(sdf, expr("key div 8"),
      bucketAsc = true, Seq(col("key").asc, col("id").asc), "rn", "n")
    assertSameRows(grid, naive, "id", "rn")
    assert(grid.select("n").distinct().as[Long].head() == 141L)
  }

  test("ntileFromRowNumber matches the built-in ntile for every " +
      "n in 1..23 and k in {4, 5, 10}, including n < k") {
    for (n <- 1 to 23; k <- Seq(4, 5, 10)) {
      val base = (1 to n).map(_.toLong).toDF("i")
        .withColumn("n", lit(n.toLong))
      val naive = base.withColumn("t",
        ntile(k).over(Window.orderBy("i")).cast("long"))
      val closed = base.withColumn("t",
        GridRank.ntileFromRowNumber(col("i"), col("n"), k))
      val mism = closed.select("i", "t").except(naive.select("i", "t"))
      assert(mism.isEmpty, s"n=$n k=$k: ${mism.collect().toSeq}")
    }
  }
}
