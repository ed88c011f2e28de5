package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSuite

/** Pins the int64-headroom widenings (rounds 13–15) at the magnitudes
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

  test("q_corr/q_pca2 shape (round-15): decimal moment accumulators " +
      "exact past 2^63") {
    import spark.implicits._
    // scan-grain fixed-point pairs at the 100 TB magnitude: per-row
    // x·y ≈ 5.5e10 stays long, but a handful of rows already push the
    // Σxy accumulator past 2^63 when scaled — model it directly with
    // row values whose products sum past the edge
    // per-row products stay below 2^63 (4.2e18 each — the real
    // queries bound them at 5.5e10); only the ACCUMULATOR crosses it
    val rows = Seq.fill(3)((2000000000L, 2100000000L))
    val expSxy = rows.map(r => BigInt(r._1) * BigInt(r._2)).sum
    assert(expSxy > BigInt(Long.MaxValue), "test must cross 2^63")
    val got = rows.toDF("x", "y")
      .agg(sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"))
      .head()
    assert(BigInt(got.getDecimal(0).toBigInteger) == expSxy,
      "decimal sxy accumulator must stay exact past 2^63")
    // sy/sxx deliberately stay long (the scan-accumulator cost bar —
    // see q_corr's in-code note): their design-point holds rely on the
    // ANSI loud-failure backstop, which the ANSI pin below keeps true
  }

  test("q_ks_2samp/q_tvd/q_mannwhitney shape (round-15): cleared " +
      "count products exact past 2^63; KS's declared BIGINT boundary " +
      "fails overtly") {
    import spark.implicits._
    // bin counts at corpus scale: c·n ≈ 2.5e21 per product
    val bins = Seq((50000000000L, 1000000000L),
      (20000000000L, 30000000000L))
    val n1 = bins.map(b => BigInt(b._1)).sum
    val n2 = bins.map(b => BigInt(b._2)).sum
    // q_tvd: Σ|c1·n2 − c2·n1| exact in decimal
    val expNum = bins.map { case (c1, c2) =>
      (BigInt(c1) * n2 - BigInt(c2) * n1).abs
    }.sum
    val df = bins.toDF("c1", "c2")
      .withColumn("n1", lit(n1.toLong)).withColumn("n2", lit(n2.toLong))
    val num = df
      .agg(sum(abs(dec(col("c1")) * col("n2") - dec(col("c2")) * col("n1")))
        .as("num")).head().getDecimal(0)
    assert(BigInt(num.toBigInteger) == expNum,
      s"cleared density products must stay exact: $num vs $expNum")
    // q_mannwhitney: dec(c1)·rankterm exact
    val expR = bins.map { case (c1, _) => BigInt(c1) * BigInt(3L * n2.toLong) }.sum
    val r12 = df.agg(sum(dec(col("c1")) * (col("n2") * 3L)).as("r"))
      .head().getDecimal(0)
    assert(BigInt(r12.toBigInteger) == expR)
    // q_ks_2samp's d_num output keeps BIGINT: past 2^63 the boundary
    // cast fails OVERTLY under ANSI (the q_modularity precedent)
    val e = intercept[Exception] {
      df.agg(max(dec(col("c1")) * col("n2")).cast("long")).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
        String.valueOf(c.getMessage).toLowerCase.matches(
          "(?s).*(overflow|cannot be represented|cast).*") ||
        c.isInstanceOf[ArithmeticException]),
      s"oversized d_num boundary cast must fail overtly, got: $e")
  }

  test("q_kendall shape (round-15): sign logic agrees with the product " +
      "form at edge magnitudes where the product would overflow") {
    import spark.implicits._
    // deltas at ±3e9+: da·db ≈ ±9.6e18 crosses 2^63 — sign logic must
    // classify concordance without any product
    val ds = Seq((3100000000L, 3100000000L), (3100000000L, -3100000000L),
      (-3100000000L, -3100000000L), (0L, 3100000000L), (3100000000L, 0L))
    val expC = ds.count { case (a, b) => (a > 0 && b > 0) || (a < 0 && b < 0) }
    val expD = ds.count { case (a, b) => (a > 0 && b < 0) || (a < 0 && b > 0) }
    val row = ds.toDF("da", "db")
      .agg(
        sum(when((col("da") > 0 && col("db") > 0) ||
          (col("da") < 0 && col("db") < 0), 1L).otherwise(0L)).as("c"),
        sum(when((col("da") > 0 && col("db") < 0) ||
          (col("da") < 0 && col("db") > 0), 1L).otherwise(0L)).as("d"))
      .head()
    assert(row.getLong(0) == expC && row.getLong(1) == expD,
      "sign-logic concordance must match the mathematical definition")
  }

  test("q_abc shape (round-15): decimal threshold compare and ppm " +
      "division exact at corpus-cents scale") {
    import spark.implicits._
    // cum/tot at 2.3e18 cents: cum·100 ≈ 2.3e20 must compare exactly
    val rows = Seq((1840000000000000000L, 2300000000000000000L), // 80%
      (1840000000000000001L, 2300000000000000000L)) // just past
    val out = rows.toDF("cum", "tot")
      .select((dec(col("cum")) * 100 <= dec(col("tot")) * 80).as("isA"),
        expr("cast(cum as decimal(38,0)) * 1000000 div tot").as("ppm"))
      .collect()
    assert(out(0).getBoolean(0) && !out(1).getBoolean(0),
      "decimal threshold compare must be exact at the 80% boundary")
    assert(out(0).getLong(1) == 800000L && out(1).getLong(1) == 800000L,
      "ppm integral division must be exact and BIGINT-typed")
  }

  test("q_bm25/q_pmi shapes (round-15): cleared retrieval products " +
      "exact/stable at corpus-token scale") {
    import spark.implicits._
    // q_bm25: TT ≈ 1e14, N ≈ 1e11 — the cleared decimal quotient must
    // match BigInt arithmetic where the all-long form passes 2^63
    val (nn, tt, df, tfv, dl) = (100000000000L, 100000000000000L, 3L, 2000L, 900L)
    val num = BigInt(10000) * (2 * BigInt(nn) - 2 * df + 1) * 22 * tt * tfv
    val den = (2 * BigInt(df) + 1) *
      (10 * BigInt(tt) * tfv + 3 * BigInt(tt) + 9 * dl * BigInt(nn))
    assert(num > BigInt(Long.MaxValue) && den > BigInt(Long.MaxValue))
    val got = Seq((nn, tt, df, tfv, dl)).toDF("nn", "tt", "df", "tf", "dl")
      .select(expr(
        """(10000L * cast(2L*nn - 2L*df + 1L as decimal(38,0)) * 22L * tt * tf) div
          |(cast(2L*df + 1L as decimal(38,0)) *
          |  (cast(10L as decimal(38,0))*tt*tf + 3L*tt + 9L*dl*nn))""".stripMargin)
        .as("fp")).head().getLong(0)
    assert(BigInt(got) == num / den,
      s"bm25 decimal clearing must match BigInt: $got vs ${num / den}")
    // q_pmi: per-factor double casts — each count < 2^53 is exact, so
    // the fixed-order product is the correctly-rounded true ratio even
    // where the integer product (~1e42) fits in NO engine integer type
    val (c2, nu, nb, cu1, cu2) =
      (9000000000000L, 100000000000000L, 99000000000000L,
        8000000000000L, 6000000000000L)
    val expected = (c2.toDouble * nu.toDouble * nu.toDouble) /
      (nb.toDouble * cu1.toDouble * cu2.toDouble)
    val gotPmi = Seq((c2, nu, nb, cu1, cu2))
      .toDF("c2", "nu", "nb", "cu1", "cu2")
      .select(expr(
        "(CAST(c2 AS DOUBLE) * CAST(nu AS DOUBLE) * CAST(nu AS DOUBLE)) " +
          "/ (CAST(nb AS DOUBLE) * CAST(cu1 AS DOUBLE) * CAST(cu2 AS DOUBLE))")
        .as("pmi")).head().getDouble(0)
    assert(gotPmi == expected, s"pmi factor-double form: $gotPmi vs $expected")
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

  test("q_holt_backtest ratio shape (round-16): decimal eh·10⁶ exact " +
      "past 2^63; the all-long ratio clearing aborts") {
    import spark.implicits._
    // design point: eh = Σ floor(|err|·10⁶) ≈ 2e16 micro-units — the
    // r14 row bounded the ACCUMULATOR (~450× headroom) but missed
    // the ratio clearing eh·10⁶ ≈ 2e22, the exact
    // sf-static-bound-in-the-comment escape the audit method warns
    // about. The decimal product must match BigInt; the long form
    // must fail loudly under ANSI, never wrap.
    val eh = 20000000000000000L
    val en = 17000000000000000L
    val expected = BigInt(eh) * 1000000 / BigInt(en)
    val got = Seq((eh, en)).toDF("eh", "en")
      .select(expr(
        "(cast(eh as decimal(38,0)) * 1000000L) div greatest(en, 1L)"))
      .head().getLong(0)
    assert(BigInt(got) == expected,
      s"decimal ratio clearing must match BigInt: $got vs $expected")
    val e = intercept[Exception] {
      Seq((eh, en)).toDF("eh", "en")
        .select(expr("eh * 1000000L div greatest(en, 1L)")).head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[ArithmeticException] ||
        c.getClass.getName.contains("Arithmetic") ||
        String.valueOf(c.getMessage).toLowerCase.contains("overflow")),
      s"long ratio overflow must surface as an arithmetic error, got: $e")
  }

  test("q_ewma shape (round-16): the fold form runs past day 62 where " +
      "the old closed form's long weight topped out, and replays the " +
      "IEEE recursion bit-exactly") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // 100 daily counts at the 100 TB magnitude (x ≈ 3e9) — 38 days
    // past the old 2^(t−1) long-weight ceiling. The fold form has no
    // weights; its contract is "the identical sequence of
    // IEEE-binary64 ops in both engines", so the Spark result must
    // equal the same left fold run on the JVM bit-for-bit (and the
    // DuckDB twin is the same fold — oracle-verified at tested SFs,
    // cross-checked at 100 days in SCALE.md round-16).
    val xs = (0L until 100L).map(i => 3070000000L + i * 1000L)
    val cum = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = xs.zipWithIndex.map { case (x, d) => (d.toLong, x) }
      .toDF("d", "x")
      .withColumn("px", collect_list(col("x")).over(cum))
      .orderBy("d")
      .select(expr("aggregate(transform(px, v -> cast(v as double)), " +
        "cast(null as double), (s, v) -> if(s is null, v, (s + v) / 2D))"))
      .collect().map(_.getDouble(0))
    val ref = xs.tail.scanLeft(xs.head.toDouble)((s, x) => (s + x) / 2.0)
    assert(got.length == 100)
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      assert(g == r, s"day $i: Spark fold $g != JVM fold $r")
    }
    // the ceiling this replaced was SILENT, not loud: Spark's
    // shiftleft follows Java's mod-64 shift semantics, so the old
    // weight 2^(t−1) wraps at day 65 (1 << 64 == 1) instead of
    // raising — the one headroom site where ANSI would NOT have
    // caught the overflow, which is why the fold reform (not a
    // decimal widening) was the right close
    val wrapped = spark.range(1).select(
      expr("shiftleft(cast(1 as bigint), 64)")).head().getLong(0)
    assert(wrapped == 1L,
      s"shiftleft wrap semantics changed ($wrapped) — re-derive the " +
        "q_ewma reform rationale if this ever fails")
  }
}
