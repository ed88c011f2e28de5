package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** Pins the int64-headroom widenings (rounds 13–14) at the magnitudes
  * they exist for. The DuckDB oracle gate is structurally blind to
  * this class — at tested SFs the long and decimal forms produce
  * identical integers — so these cases drive the widened aggregate
  * SHAPES with design-point-sized inputs (x ≈ 3e9, products ≥ 2^63)
  * and assert:
  *
  *  1. the decimal form is EXACT past the int64 edge (checked against
  *     BigInt arithmetic computed outside Spark), and
  *  2. the all-long form fails LOUDLY under Spark 4's ANSI default
  *     (ArithmeticException), never a silent wrap — the failure mode
  *     every audit comment in Stats/MlEval/Behavior/Graph2 now
  *     documents, which this spec keeps true: if someone turns ANSI
  *     off session-wide, case 2 goes red and the comments (and the
  *     severity calculus of the whole audit) must be revisited.
  */
class HeadroomSpec extends SparkSuite {

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(38, 0))

  test("q_changepoint/q_acf shape: sum(dec(x)*x) exact past 2^63") {
    import spark.implicits._
    // 31 "daily counts" at the 100 TB magnitude: x ≈ 3e9+d, so one
    // x·x term is ~9.4e18 > 2^63 and the 31-day sum is ~2.9e20
    val xs = (0L until 31L).map(d => 3070000000L + d * 1000L)
    val expected = xs.map(x => BigInt(x) * BigInt(x)).sum
    val got = xs.toDF("x")
      .agg(sum(dec(col("x")) * col("x")).as("qt"))
      .head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == expected,
      s"decimal moment sum must stay exact past 2^63: $got vs $expected")
  }

  test("all-long x*x at design magnitude fails loudly under ANSI") {
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the audit's failure-mode comments assume ANSI on (Spark 4 " +
        "default); if this flips, silent wrap returns and every " +
        "headroom verdict must be re-derived")
    val e = intercept[Exception] {
      Seq(3070000000L).toDF("x")
        .agg(sum(col("x") * col("x"))).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[ArithmeticException] ||
        c.getClass.getName.contains("Arithmetic") ||
        String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
      s"long overflow must surface as an arithmetic error, got: $e")
  }

  test("q_funnel_time shape: sum(cast(lat as decimal)) div n exact " +
      "past 2^63, result BIGINT") {
    import spark.implicits._
    // three horizon-scale latencies whose long sum would overflow
    val lats = Seq(4000000000000000000L, 4000000000000000000L,
      2000000000000000001L)
    val expected = lats.map(BigInt(_)).sum / lats.size
    val row = lats.toDF("lat")
      .agg(expr("sum(cast(lat as decimal(38,0))) div count(1)").as("mean"))
      .head()
    // `div` (IntegralDivide) must return BIGINT even for decimal
    // inputs — the declared-schema contract of the widened queries
    assert(row.schema("mean").dataType.typeName == "long",
      s"div must emit BIGINT, got ${row.schema("mean").dataType}")
    assert(BigInt(row.getLong(0)) == expected)
  }

  test("q_assortativity shape: cleared decimal products exact at " +
      "adversarial magnitudes") {
    import spark.implicits._
    // edges with hub-scale degrees: dx·dy ~1e12, n·Σxy·10⁶ ≫ 2^63
    val edges = Seq((900000L, 1100000L), (1000000L, 1000000L),
      (1200000L, 800000L), (700000L, 1300000L))
    val n = BigInt(edges.size)
    val sx = edges.map(e => BigInt(e._1)).sum
    val sy = edges.map(e => BigInt(e._2)).sum
    val sxy = edges.map(e => BigInt(e._1) * BigInt(e._2)).sum
    val sxx = edges.map(e => BigInt(e._1) * BigInt(e._1)).sum
    val expected = ((n * sxy - sx * sy) * BigInt(1000000)) /
      (n * sxx - sx * sx) // both negative here: BigInt / truncates
    val got = edges.toDF("dx", "dy")
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(dec(col("dx")) * col("dy")).as("sxy"),
        sum(dec(col("dx")) * col("dx")).as("sxx"))
      .select(
        expr("(n * sxy - sx * cast(sy as decimal(38,0))) * 1000000L " +
          "div (n * sxx - sx * cast(sx as decimal(38,0)))").as("fp"))
      .head().getLong(0)
    assert(BigInt(got) == expected,
      s"cleared decimal correlation must match BigInt: $got vs $expected")
  }

  test("q_decay_trend shape: decimal weight sum exact past 2^63; the " +
      "declared BIGINT boundary fails overtly, never wraps") {
    import spark.implicits._
    // 2^29-scale shiftleft weights, enough rows that the exact sum
    // passes int64: 20 × (2^29 · 2^31) = 20 · 2^60 ≈ 2.3e19 > 2^63
    val df = Seq.fill(20)(0L).toDF("age")
      .withColumn("w", expr(
        "CAST(shiftleft(1L, 29) AS DECIMAL(38,0)) * 2147483648L"))
    val exact = df.agg(sum(col("w")).as("s")).head().getDecimal(0)
    assert(BigInt(exact.toBigInteger) ==
      BigInt(20) * (BigInt(1) << 29) * (BigInt(1) << 31),
      "decimal weight accumulation must stay exact past 2^63")
    // the final cast to the declared output type: under ANSI an
    // oversized score THROWS (the failure mode the round-13/14
    // comments document) — an overt error at the type boundary, not
    // a wrapped wrong number
    val e = intercept[Exception] {
      df.agg(sum(col("w")).cast("long").as("score")).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
        String.valueOf(c.getMessage).toLowerCase.matches(
          "(?s).*(overflow|cannot be represented|cast).*") ||
        c.isInstanceOf[ArithmeticException]),
      s"oversized BIGINT cast must fail overtly under ANSI, got: $e")
  }

  test("q_modularity shape: 4·m·e_c − d_c² exact at 1e11-edge scale") {
    import spark.implicits._
    val m = 100000000000L // 1e11 edges
    val cells = Seq((60000000000L, 140000000000L),
      (40000000000L, 60000000000L))
    val expected = cells.map { case (eIn, dSum) =>
      BigInt(4) * BigInt(m) * BigInt(eIn) - BigInt(dSum) * BigInt(dSum)
    }.sum * BigInt(1000000) / (BigInt(4) * BigInt(m) * BigInt(m))
    val got = cells.toDF("e_in", "d_sum")
      .withColumn("m", lit(m))
      .withColumn("num",
        lit(4L) * col("m").cast(DecimalType(38, 0)) * col("e_in") -
          col("d_sum").cast(DecimalType(38, 0)) * col("d_sum"))
      .groupBy("m").agg(sum(col("num")).as("num_sum_dec"))
      .select(expr("num_sum_dec * 1000000L " +
        "div (4L * cast(m as decimal(38,0)) * m)").as("q_fp"))
      .head().getLong(0)
    assert(BigInt(got) == expected,
      s"modularity cell algebra must match BigInt: $got vs $expected")
  }
}
