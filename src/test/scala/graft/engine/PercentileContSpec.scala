package graft.engine

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins GridRank.percentileCont bit-for-bit against Spark's exact
  * `percentile` aggregate — the interpolation formula, its two early
  * returns, and the rank selection must all agree, or a double
  * diverges by an ulp and the oracle hash gate would catch it a
  * round too late. Data is built to hit the edges: heavy duplicate
  * blocks (the lowerVal == higherVal early return), n = 1/2/3,
  * integer-valued doubles, and fractional positions from awkward
  * percentages.
  */
class PercentileContSpec extends SparkSuite {

  import spark.implicits._

  private val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50",
    0.75 -> "p75", 0.9 -> "p90", 0.99 -> "p99", 1.0 -> "p100")

  private def check(xs: Seq[Double], bucket: org.apache.spark.sql.Column
      => org.apache.spark.sql.Column): Unit = {
    val df = xs.toDF("v")
    val want = df.agg(
      expr(s"percentile(v, array(${ps.map(_._1).mkString(",")}))"))
      .head().getSeq[Double](0)
    // both forms against the built-in: the grid decomposition AND the
    // bucket==value specialization (the latter is exact for ANY
    // doubles — ties collapse per distinct value)
    for (got <- Seq(
        GridRank.percentileCont(df, col("v"), bucket, ps).head(),
        GridRank.percentileContByValue(df, col("v"), ps).head());
      i <- ps.indices) {
      val g = got.getDouble(i)
      assert(java.lang.Double.doubleToRawLongBits(g) ==
        java.lang.Double.doubleToRawLongBits(want(i)),
        s"${ps(i)._2} on n=${xs.size}: got $g want ${want(i)}")
    }
  }

  test("random doubles, several sizes, fine and coarse grids") {
    val rng = new scala.util.Random(4213)
    for (n <- Seq(1, 2, 3, 7, 100, 5000)) {
      val xs = Seq.fill(n)(rng.nextDouble() * 2.5)
      check(xs, v => floor(v * 1000000).cast("long"))
      check(xs, v => floor(v * 10).cast("long")) // coarse: fat buckets
    }
  }

  test("duplicate blocks and integer-valued doubles (count shape)") {
    val rng = new scala.util.Random(77)
    // power-law-ish integer counts with heavy ties — the q_skew_profile
    // shape, bucket = the value itself
    val xs = Seq.fill(2000)((1 + rng.nextInt(rng.nextInt(40) + 1)).toDouble)
    check(xs, v => v.cast("long"))
    // one giant tie block straddling every percentile
    check(Seq.fill(500)(3.25) ++ Seq(1.0, 9.0),
      v => (v * 4).cast("long"))
  }

  test("null values are skipped and NaN ranks greatest, like the " +
      "built-in (round-17 review)") {
    val df = (Seq(3.0, 1.0, Double.NaN, 2.0).map(Option(_)) ++
      Seq(None, None)).toDF("v")
    val want = df.agg(
      expr(s"percentile(v, array(${ps.map(_._1).mkString(",")}))"))
      .head().getSeq[Double](0)
    for (got <- Seq(
        GridRank.percentileCont(df, col("v"),
          v => floor(v * 10).cast("long"), ps).head(),
        GridRank.percentileContByValue(df, col("v"), ps).head());
      i <- ps.indices)
      assert(java.lang.Double.doubleToRawLongBits(got.getDouble(i)) ==
        java.lang.Double.doubleToRawLongBits(want(i)),
        s"${ps(i)._2}: got ${got.getDouble(i)} want ${want(i)}")
    // all-null input -> one all-null row, like the built-in's null
    val allNull = Seq[Option[Double]](None, None).toDF("v")
    val row = GridRank.percentileContByValue(allNull, col("v"), ps).head()
    assert(ps.indices.forall(row.isNullAt))
  }

  test("nOut/maxOut extras read off the same histogram") {
    val xs = Seq(5.0, 2.0, 2.0, 9.0, 1.0)
    val r = GridRank.percentileContByValue(xs.toDF("v"), col("v"),
      Seq(0.5 -> "p50"), nOut = Some("n"), maxOut = Some("mx")).head()
    assert(r.getDouble(0) == 2.0 && r.getLong(1) == 5L &&
      r.getLong(2) == 9L)
    // empty input: count semantics (0), max/percentile null
    val e = GridRank.percentileContByValue(
      Seq.empty[Double].toDF("v"), col("v"),
      Seq(0.5 -> "p50"), nOut = Some("n"), maxOut = Some("mx")).head()
    assert(e.isNullAt(0) && e.getLong(1) == 0L && e.isNullAt(2))
  }
}
