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
}
