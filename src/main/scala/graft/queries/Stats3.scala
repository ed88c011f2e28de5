package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Third statistics batch: variance decomposition (ANOVA F), a closed-
  * form 2-variable PCA, the Lorenz concentration curve, and Cramér's V
  * effect size. New determinism wrinkle handled here: these statistics
  * SUM RATIONALS with unequal denominators (per-group s²/n terms,
  * per-cell χ² parts), where double summation order would differ
  * between engines — each term is quantized to a fixed DECIMAL scale
  * first (the [[graft.ext.TextAnalysis]] DECIMAL(18,12) idiom), so the
  * sums are order-free-exact and the final metric is one IEEE-exact
  * expression over exactly-agreed inputs.
  */
object Stats3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── one-way ANOVA F across event types on value ──
    // F = (SSB/(k−1)) / (SSW/(N−k)) with SSB = Σ_g s_g²/n_g − S²/N and
    // SSW = Q − Σ_g s_g²/n_g, over exact fixed-point group moments
    // (s_g int64, q_g decimal). The k per-group s²/n rationals are
    // quantized to DECIMAL(28,6) before summing (k=5 terms — exact,
    // order-free); S²/N and Q are exact. Two keyed aggregates (group
    // moments → 1 row); the F statistic computes from k+3 numbers at
    // any scale. Units cancel in the SSB/SSW ratio, so the 1e-4
    // fixed-point scale needs no back-correction.
    Q("q_anova",
      (s, dir) => {
        val g = t(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * lit(10000.0)).cast("long").as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_g"), sum(col("y")).as("s_g"),
            sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("q_g"))
        val m = g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("nn"),
          sum(col("s_g")).as("ss"),
          sum(col("q_g")).as("qq"),
          sum(expr(
            "CAST(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS DECIMAL(28,6))"))
            .as("bsum"))
        val bsumD = col("bsum").cast("double")
        val grand = (col("ss").cast("double") * col("ss").cast("double") /
          col("nn").cast("double"))
        val ssb = bsumD - grand
        val ssw = col("qq").cast("double") - bsumD
        m.select(col("k"), col("nn").as("n"),
            ((ssb / (col("k") - 1).cast("double")) /
              (ssw / (col("nn") - col("k")).cast("double"))).as("f"))
      },
      Some("""WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_g,
             |    CAST(SUM(y) AS BIGINT) AS s_g,
             |    SUM(CAST(y AS HUGEINT) * y) AS q_g
             |  FROM (SELECT event_type,
             |          CAST(floor(value * 10000.0) AS BIGINT) AS y FROM events)
             |  GROUP BY event_type),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |  CAST(SUM(n_g) AS BIGINT) AS nn,
             |  CAST(SUM(s_g) AS BIGINT) AS ss,
             |  SUM(q_g) AS qq,
             |  SUM(CAST(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
             |        / CAST(n_g AS DOUBLE) AS DECIMAL(28,6))) AS bsum
             |  FROM g)
             |SELECT k, nn AS n,
             |  ((CAST(bsum AS DOUBLE)
             |      - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
             |    / CAST(k - 1 AS DOUBLE))
             |  / ((CAST(CAST(qq AS VARCHAR) AS DOUBLE) - CAST(bsum AS DOUBLE))
             |    / CAST(nn - k AS DOUBLE)) AS f
             |FROM m""".stripMargin)),

    // ── closed-form 2-variable PCA per group (qty vs price) ──
    // Eigen-decomposition of the 2×2 covariance, cleared of means by
    // the ×n² trick: with a = n·Σxx−(Σx)², b = n·Σyy−(Σy)², c =
    // n·Σxy−ΣxΣy (exact decimals, VARCHAR-routed casts), λ± =
    // ((a+b) ± √((a−b)²+4c²))/2. Emitted scale-free: explained
    // variance ratio λ₊/(a+b) and the principal-axis slope tan θ =
    // c/(λ₊−b·n²-units…) — i.e. the fixed expression c/(lam1−b).
    // One moment aggregate per group; the eigen algebra runs on 6
    // numbers per group.
    Q("q_pca2",
      (s, dir) => {
        val m = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_quantity") * lit(100.0)).cast("long").as("x"),
            floor(col("l_extendedprice") * lit(100.0)).cast("long").as("y"))
          .groupBy("rf")
          // sxy accumulates DECIMAL(38,0) (round-15 audit — the q_corr
          // sibling widening: Σxy ≈ 3e21 at the 100 TB design point
          // passes 2^63; the per-row product stays long ≤ 5.5e10).
          // sy (~8×) and sxx (~3.5×) hold with the ANSI loud-failure
          // backstop — scan accumulators widen only when they overflow
          // at the design point (the A/B priced each scan-side decimal
          // at ~15–25% on this query; see q_corr's note)
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum((col("x") * col("y")).cast(DecimalType(38, 0))).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
        val a = (dec(col("n")) * col("sxx") - dec(col("sx")) * col("sx"))
          .cast("double")
        val b = (dec(col("n")) * col("syy") - dec(col("sy")) * col("sy"))
          .cast("double")
        val cc = (dec(col("n")) * col("sxy") - dec(col("sx")) * col("sy"))
          .cast("double")
        val lam1 = (a + b + sqrt((a - b) * (a - b) + lit(4.0) * cc * cc)) / lit(2.0)
        m.select(col("rf"), col("n"),
            (lam1 / (a + b)).as("evr"),
            (cc / (lam1 - b)).as("axis_t"))
          .orderBy("rf")
      },
      Some("""WITH m AS (
             |  SELECT rf, CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    SUM(x * y) AS sxy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    SUM(CAST(y AS HUGEINT) * y) AS syy
             |  FROM (SELECT l_returnflag AS rf,
             |          CAST(floor(l_quantity * 100.0) AS BIGINT) AS x,
             |          CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS y
             |        FROM lineitem) GROUP BY rf),
             |e AS (SELECT rf, n,
             |  CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE) AS a,
             |  CAST(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR) AS DOUBLE) AS b,
             |  CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE) AS c
             |  FROM m)
             |SELECT rf, n,
             |  ((a + b + sqrt((a - b) * (a - b) + 4.0 * c * c)) / 2.0) / (a + b) AS evr,
             |  c / ((a + b + sqrt((a - b) * (a - b) + 4.0 * c * c)) / 2.0 - b) AS axis_t
             |FROM e ORDER BY rf""".stripMargin)),

    // ── Lorenz concentration curve (revenue deciles) ──
    // Customers ranked ascending by exact-cents revenue; decile d of
    // customer i is ((i−1)·10) div n + 1, and the curve point is the
    // cumulative revenue share at each decile boundary. The companion
    // curve to q_gini (G = 1 − 2·∫Lorenz). The fact scan is the only
    // full pass; the customer-grain rank then rides the GridRank
    // decomposition (round-17 window sweep — customers GROW with the
    // corpus, so the old unpartitioned rank window serialized a
    // dimension-sized sort into one task): bucket = rev div 10⁴
    // ($100 bands; per-customer revenue is bounded by customer
    // BEHAVIOR — order count × price domain, ~2.4e8 cents under the
    // TPC-H generators — not by corpus size, so the bucket table is
    // ≤ ~2.4e4 rows at any scale and the within-bucket rank
    // distributes). Hash-identical to the naive rank under the
    // strict (rev, custkey) order; the DuckDB twin keeps the naive
    // form as the independent oracle. Decile rollup is 10 rows.
    Q("q_lorenz",
      (s, dir) => {
        val rev = t(s, dir, "orders")
          .select(col("o_custkey"),
            floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
          .groupBy("o_custkey").agg(sum(col("cents")).as("rev"))
          // pinned: GridRank consumes rev twice (bucket agg + join
          // side) and pruning defeats exchange reuse — one fact scan,
          // customer-grain materialization (round-17 review)
          .localCheckpoint()
        graft.engine.GridRank.rowNumber(rev, expr("rev div 10000"),
            bucketAsc = true,
            Seq(col("rev").asc, col("o_custkey").asc), "i", "n")
          .withColumn("d", expr("((i - 1) * 10) div n + 1"))
          .groupBy("d")
          .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("d_rev"))
          .withColumn("cum_rev", sum(col("d_rev"))
            .over(Window.orderBy("d")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("total", sum(col("d_rev")).over(Window.partitionBy()))
          .select(col("d"), col("n_cust"),
            (col("cum_rev").cast("double") / col("total").cast("double"))
              .as("cum_share"))
          .orderBy("d")
      },
      Some("""WITH rev AS (
             |  SELECT o_custkey,
             |    CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS rev
             |  FROM orders GROUP BY o_custkey),
             |rk AS (SELECT rev,
             |  CAST(row_number() OVER (ORDER BY rev, o_custkey) AS BIGINT) AS i,
             |  CAST(count(*) OVER () AS BIGINT) AS n FROM rev),
             |dec AS (SELECT ((i - 1) * 10) // n + 1 AS d,
             |  CAST(count(*) AS BIGINT) AS n_cust, CAST(SUM(rev) AS BIGINT) AS d_rev
             |  FROM rk GROUP BY 1),
             |c AS (SELECT d, n_cust,
             |  CAST(SUM(d_rev) OVER (ORDER BY d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev,
             |  CAST(SUM(d_rev) OVER () AS BIGINT) AS total FROM dec)
             |SELECT d, n_cust,
             |  CAST(cum_rev AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
             |FROM c ORDER BY d""".stripMargin)),

    // ── Cramér's V effect size (event type × weekend) ──
    // V = √(χ²/(N·(min(r,c)−1))) — the scale-free companion to
    // q_chisq's raw cells. The per-cell χ² parts are rationals with
    // unequal denominators, so each is quantized to DECIMAL(28,8)
    // before the order-free sum (10 cells — exact); r, c, N are
    // exact counts carried through the same 1-row aggregate.
    Q("q_cramer_v",
      (s, dir) => {
        val cell = t(s, dir, "events")
          .withColumn("is_weekend",
            expr("(unix_micros(ts) div 86400000000L) % 7 IN (2, 3)"))
          .groupBy(col("event_type"), col("is_weekend"))
          .agg(count(lit(1)).as("o"))
        val withTotals = cell
          .withColumn("r",
            sum(col("o")).over(Window.partitionBy(col("event_type"))))
          .withColumn("c",
            sum(col("o")).over(Window.partitionBy(col("is_weekend"))))
          .withColumn("tot", sum(col("o")).over(Window.partitionBy()))
          // the clearing products o·tot / r·c / r·c·tot multiply
          // corpus-scale counts (round-15 audit — the q_chisq class
          // the r13 Stats sweep widened but this sibling kept long):
          // at 1e11 events o·tot ≈ 1e22 and r·c·tot ≈ 1e33, so both
          // numerator and denominator clear in DECIMAL(38,0) on the
          // ≤10-row cell grid before the double quantization (DuckDB:
          // HUGEINT with the VARCHAR→DOUBLE route)
          .withColumn("part", expr(
            """CAST((CAST(CAST(o AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)
              |  * CAST(CAST(o AS DECIMAL(38,0)) * tot - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE))
              | / CAST(CAST(r AS DECIMAL(38,0)) * c * tot AS DOUBLE) AS DECIMAL(28,8))""".stripMargin))
        withTotals
          .agg(countDistinct(col("event_type")).as("rr"),
            countDistinct(col("is_weekend")).as("cc"),
            max(col("tot")).as("n"), sum(col("part")).as("chi2q"))
          .select(col("rr"), col("cc"), col("n"),
            col("chi2q").cast("double").as("chi2"),
            sqrt(col("chi2q").cast("double") /
              (col("n") * (least(col("rr"), col("cc")) - 1)).cast("double"))
              .as("v"))
      },
      Some("""WITH cell AS (
             |  SELECT event_type,
             |    (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS is_weekend,
             |    CAST(count(*) AS BIGINT) AS o
             |  FROM events GROUP BY 1, 2),
             |tt AS (SELECT event_type, is_weekend, o,
             |  CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             |  CAST(SUM(o) OVER (PARTITION BY is_weekend) AS BIGINT) AS c,
             |  CAST(SUM(o) OVER () AS BIGINT) AS tot FROM cell),
             |p AS (SELECT event_type, is_weekend, tot,
             |  CAST((CAST(CAST(CAST(o AS HUGEINT) * tot - CAST(r AS HUGEINT) * c AS VARCHAR) AS DOUBLE)
             |      * CAST(CAST(CAST(o AS HUGEINT) * tot - CAST(r AS HUGEINT) * c AS VARCHAR) AS DOUBLE))
             |    / CAST(CAST(CAST(r AS HUGEINT) * c * tot AS VARCHAR) AS DOUBLE) AS DECIMAL(28,8)) AS part
             |  FROM tt),
             |m AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS rr,
             |  CAST(count(DISTINCT is_weekend) AS BIGINT) AS cc,
             |  CAST(MAX(tot) AS BIGINT) AS n, SUM(part) AS chi2q FROM p)
             |SELECT rr, cc, n, CAST(chi2q AS DOUBLE) AS chi2,
             |  sqrt(CAST(chi2q AS DOUBLE)
             |    / CAST(n * (least(rr, cc) - 1) AS DOUBLE)) AS v
             |FROM m""".stripMargin)),

    // ── total-variation drift between the two halves of the month ──
    // TVD(P,Q) = ½·Σ_bins |p_i − q_i|, cleared of both rational
    // densities: Σ|c₁ᵢ·n₂ − c₂ᵢ·n₁| / (2·n₁·n₂) — exact integers
    // (DECIMAL accumulation; see the widening note below). The
    // log-free drift metric (the PSI
    // role without PSI's log): 0 = identical, 1 = disjoint. Bins are
    // the 0.1 fixed-point value grid, so the drift table is bounded
    // (~5k bins) and the one full pass is the bin-count aggregate.
    Q("q_tvd",
      (s, dir) => {
        val binned = t(s, dir, "events")
          .select((expr(
            s"(unix_micros(ts) - ${1704067200000000L}L) div 86400000000L") < 15)
            .as("h1"),
            floor(col("value") * lit(10.0)).cast("long").as("v"))
          .groupBy("v")
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("c1"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("c2"))
        val all = Window.partitionBy()
        // the cleared-density products c·n multiply two corpus-scaled
        // counts (round-15 audit — the "Σ ≤ 1.2e13" note above is
        // sf0.1-static): at 1e11 events c1·n2 ≈ 1e21 passes 2^63, so
        // the products and their sum run DECIMAL(38,0) on the ≤5k-row
        // bin table (DuckDB: HUGEINT + the VARCHAR→DOUBLE route)
        val dd = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        binned
          .withColumn("n1", sum(col("c1")).over(all))
          .withColumn("n2", sum(col("c2")).over(all))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            sum(abs(dd(col("c1")) * col("n2") - dd(col("c2")) * col("n1")))
              .as("num"))
          .select(col("n1"), col("n2"),
            (col("num").cast("double") / lit(2.0) /
              col("n1").cast("double") / col("n2").cast("double")).as("tvd"))
      },
      Some(s"""WITH b AS (
              |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 < 15 AS h1,
              |    CAST(floor(value * 10.0) AS BIGINT) AS v
              |  FROM events),
              |cell AS (SELECT v,
              |  CAST(SUM(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              |  CAST(SUM(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
              |  FROM b GROUP BY v),
              |tt AS (SELECT c1, c2,
              |  CAST(SUM(c1) OVER () AS BIGINT) AS n1,
              |  CAST(SUM(c2) OVER () AS BIGINT) AS n2 FROM cell)
              |SELECT MAX(n1) AS n1, MAX(n2) AS n2,
              |  CAST(CAST(SUM(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1)) AS VARCHAR) AS DOUBLE) / 2.0
              |    / CAST(MAX(n1) AS DOUBLE) / CAST(MAX(n2) AS DOUBLE) AS tvd
              |FROM tt""".stripMargin)),

    // ── bottom-k hash sketch per group (distinct sample + NDV probe) ──
    // The k smallest md5 values of the DISTINCT user set per event
    // type — simultaneously (a) a uniform sample of distinct users
    // (mergeable: bottom-k of a union = bottom-k of bottom-ks — the
    // at-scale re-aggregation never revisits rows) and (b) a
    // cardinality probe: est = (k−1)·2³²/h₍ₖ₎. k=5 keeps the output
    // oracle-small and the estimate deliberately noisy (±50% — a
    // production sketch uses k≈256; the algebra is k-independent);
    // both engines compute identical values so the gate is the hash
    // itself, no envelope needed.
    Q("q_bottomk",
      (s, dir) => {
        val h = t(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct()
          .withColumn("hv", expr(graft.functions.HashSample.sparkRaw("user_id")))
        val w = Window.partitionBy("event_type").orderBy(col("hv"), col("user_id"))
        h.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 5)
          .withColumn("est_ndv",
            when(col("rn") === 5, expr("(4 * 4294967296L) div hv")))
          .select(col("event_type"), col("rn"), col("user_id"), col("hv"),
            col("est_ndv"))
          .orderBy("event_type", "rn")
      },
      Some(s"""WITH h AS (SELECT DISTINCT event_type, user_id,
              |    ${graft.functions.HashSample.duckRaw("user_id")} AS hv
              |  FROM events),
              |rk AS (SELECT event_type, user_id, hv,
              |  CAST(row_number() OVER (PARTITION BY event_type
              |    ORDER BY hv, user_id) AS BIGINT) AS rn
              |  FROM h)
              |SELECT event_type, rn, user_id, hv,
              |  CASE WHEN rn = 5 THEN (4 * 4294967296) // hv END AS est_ndv
              |FROM rk WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin)),

    // ── delete-one-block jackknife SE of the mean ──
    // The distributed-native confidence interval: rows hash into 32
    // blocks; replicate b's mean drops block b (mean_b = (S−s_b)/
    // (N−n_b) from the 32-row block-moment table), and SE² =
    // (B−1)/B · Σ(mean_b − m̄)². Replicate means and squared
    // deviations are doubles quantized to DECIMAL(28,12) before their
    // 32-term sums (order-free-exact); everything upstream is exact
    // integers. One keyed aggregate over the scan — the jackknife
    // itself runs on 32 rows at any scale.
    Q("q_jackknife",
      (s, dir) => {
        val blocks = t(s, dir, "events")
          .select(floor(col("value") * lit(10000.0)).cast("long").as("y"),
            expr(graft.functions.HashSample.sparkBucket("event_id", 32)).as("b"))
          .groupBy("b")
          .agg(count(lit(1)).as("n_b"), sum(col("y")).as("s_b"))
        val tot = Window.partitionBy()
        val rep = blocks
          .withColumn("nn", sum(col("n_b")).over(tot))
          .withColumn("ss", sum(col("s_b")).over(tot))
          .withColumn("mean_b", expr(
            """CAST(CAST(ss - s_b AS DOUBLE) / CAST(nn - n_b AS DOUBLE) / 1e4
              | AS DECIMAL(28,12))""".stripMargin))
        val m = rep
          // ÷32 runs in DOUBLE (exact: 32 = 2⁵) then re-quantizes —
          // decimal÷int scale rules differ between engines, double
          // division does not
          .withColumn("mbar",
            (sum(col("mean_b")).over(tot).cast("double") / lit(32.0))
              .cast(DecimalType(28, 12)))
          .withColumn("dev2", expr(
            """CAST(CAST(mean_b - mbar AS DOUBLE) * CAST(mean_b - mbar AS DOUBLE)
              | AS DECIMAL(28,12))""".stripMargin))
        m.agg(max(col("nn")).as("n"),
            max(col("ss")).as("sum_fp"),
            sum(col("dev2")).as("ssd"))
          .select(col("n"),
            (col("sum_fp").cast("double") / col("n").cast("double") / lit(1e4))
              .as("mean"),
            sqrt(col("ssd").cast("double") * lit(31.0) / lit(32.0)).as("se"))
      },
      Some(s"""WITH blocks AS (
              |  SELECT ${graft.functions.HashSample.duckBucket("event_id", 32)} AS b,
              |    CAST(count(*) AS BIGINT) AS n_b,
              |    CAST(SUM(CAST(floor(value * 10000.0) AS BIGINT)) AS BIGINT) AS s_b
              |  FROM events GROUP BY 1),
              |rep AS (SELECT n_b, s_b,
              |  CAST(SUM(n_b) OVER () AS BIGINT) AS nn,
              |  CAST(SUM(s_b) OVER () AS BIGINT) AS ss FROM blocks),
              |mb AS (SELECT nn, ss,
              |  CAST(CAST(ss - s_b AS DOUBLE) / CAST(nn - n_b AS DOUBLE) / 1e4
              |    AS DECIMAL(28,12)) AS mean_b FROM rep),
              |dv AS (SELECT nn, ss, mean_b,
              |  CAST(CAST(SUM(mean_b) OVER () AS DOUBLE) / 32.0
              |    AS DECIMAL(28,12)) AS mbar FROM mb),
              |d2 AS (SELECT nn, ss,
              |  CAST(CAST(mean_b - mbar AS DOUBLE) * CAST(mean_b - mbar AS DOUBLE)
              |    AS DECIMAL(28,12)) AS dev2 FROM dv)
              |SELECT MAX(nn) AS n,
              |  CAST(MAX(ss) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE) / 1e4 AS mean,
              |  sqrt(CAST(SUM(dev2) AS DOUBLE) * 31.0 / 32.0) AS se
              |FROM d2""".stripMargin)),

    // ── leading-edge debounce (burst collapse preview) ──
    // Events closer than 5 s to their predecessor (same user)
    // collapse into the burst head: new-burst flag = gap NULL or
    // > 5e6 µs, per-user lag window on the natural key. Emits per
    // event type how many rows survive debouncing — the volume
    // preview before a pipeline inserts the collapse. Gap flags are
    // exact integer comparisons; ties produce 0-gaps that collapse
    // deterministically regardless of tie order only when the head
    // choice is fixed — the (us, event_id) lag ordering pins it.
    Q("q_debounce",
      (s, dir) => {
        val u = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(u))
          .withColumn("keep", col("gap").isNull || col("gap") > 5000000L)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
          .select(col("event_type"), col("n"), col("kept"),
            (col("kept").cast("double") / col("n").cast("double"))
              .as("keep_ratio"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_us(ts) AS us FROM events),
             |g AS (SELECT event_type,
             |  us - lag(us, 1) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id) AS gap FROM e),
             |k AS (SELECT event_type,
             |  CASE WHEN gap IS NULL OR gap > 5000000 THEN 1 ELSE 0 END AS keep
             |  FROM g)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(keep) AS BIGINT) AS kept,
             |  CAST(SUM(keep) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS keep_ratio
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── split-conformal 90% interval half-width per group ──
    // q̂ = the ⌈0.9(n+1)⌉-th smallest |v − mean| per event type, with
    // the residual CLEARED to an exact integer |n·v_fp − s| (the
    // z-score numerator — no division before the rank). The rank
    // picks a VALUE (order-deterministic under ties); one final
    // division un-clears it. The conformal-prediction calibration
    // step: mean ± q̂ covers ≥90% of held-out values by construction.
    // Group moments broadcast back (one aggregate + one rank window
    // per natural key).
    Q("q_conformal",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * lit(10000.0)).cast("long").as("v"))
        val m = e.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        val r = e.join(broadcast(m), "event_type")
          .withColumn("res", abs(col("n") * col("v") - col("s")))
        val w = Window.partitionBy("event_type").orderBy("res")
        r.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") === least(
            expr("(9 * (n + 1) + 9) div 10"), col("n")))
          .select(col("event_type"), col("n"),
            (col("res").cast("double") / col("n").cast("double") / lit(1e4))
              .as("qhat"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(floor(value * 10000.0) AS BIGINT) AS v FROM events),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(v) AS BIGINT) AS s FROM e GROUP BY event_type),
             |r AS (SELECT e.event_type, n,
             |  abs(n * v - s) AS res FROM e JOIN m USING (event_type)),
             |rk AS (SELECT event_type, n, res,
             |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY res)
             |    AS BIGINT) AS rk FROM r)
             |SELECT event_type, n,
             |  CAST(res AS DOUBLE) / CAST(n AS DOUBLE) / 1e4 AS qhat
             |FROM rk WHERE rk = least((9 * (n + 1) + 9) // 10, n)
             |ORDER BY event_type""".stripMargin)),

    // ── 5% trimmed mean per group (robust location) ──
    // Drops the bottom/top 5% BY RANK (k05 = ceil(n/20), k95 =
    // ceil(19n/20)) and averages the exact-cents middle — the robust
    // companion to q_winsorize's clamping (trimming excludes,
    // winsorizing saturates). Interior sum and count are exact int64;
    // the mean is one division. Same per-group rank shape, same
    // documented approx-quantile swap at the 100 TB tier.
    Q("q_trimmed_mean",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * lit(100.0)).cast("long").as("cents"))
        val w = Window.partitionBy("rf").orderBy("cents", "rf")
        li.withColumn("r", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("rf")))
          .filter(col("r") > expr("(n + 19) div 20") &&
            col("r") <= expr("(19 * n + 19) div 20"))
          .groupBy("rf")
          .agg(count(lit(1)).as("kept"), sum(col("cents")).as("s"))
          .select(col("rf"), col("kept"),
            (col("s").cast("double") / col("kept").cast("double") / lit(100.0))
              .as("trimmed_mean"))
          .orderBy("rf")
      },
      Some("""WITH li AS (SELECT l_returnflag AS rf,
             |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents
             |  FROM lineitem),
             |rk AS (SELECT rf, cents,
             |  CAST(row_number() OVER (PARTITION BY rf ORDER BY cents, rf)
             |    AS BIGINT) AS r,
             |  CAST(count(*) OVER (PARTITION BY rf) AS BIGINT) AS n FROM li),
             |mid AS (SELECT rf, cents FROM rk
             |  WHERE r > (n + 19) // 20 AND r <= (19 * n + 19) // 20),
             |m AS (SELECT rf, CAST(count(*) AS BIGINT) AS kept,
             |  CAST(SUM(cents) AS BIGINT) AS s FROM mid GROUP BY rf)
             |SELECT rf, kept,
             |  CAST(s AS DOUBLE) / CAST(kept AS DOUBLE) / 100.0 AS trimmed_mean
             |FROM m ORDER BY rf""".stripMargin)),

    // ── Hellinger distance between the month halves ──
    // H = √(1 − BC), BC = Σ√(p_i·q_i) = Σ√(c₁ᵢ·c₂ᵢ)/√(n₁·n₂). The
    // per-bin √(c₁·c₂) doubles are quantized to DECIMAL(28,8) before
    // the order-free sum (the q_cramer_v mechanism); the final
    // expression is a fixed √/÷ chain. Complements q_tvd: TVD is the
    // L1 drift, Hellinger weights small-mass disagreements more —
    // both on the same bounded 0.1-grid bin table.
    Q("q_hellinger",
      (s, dir) => {
        val cell = t(s, dir, "events")
          .select((expr(
            s"(unix_micros(ts) - ${1704067200000000L}L) div 86400000000L") < 15)
            .as("h1"),
            floor(col("value") * lit(10.0)).cast("long").as("v"))
          .groupBy("v")
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("c1"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("c2"))
        val all = Window.partitionBy()
        cell
          .withColumn("n1", sum(col("c1")).over(all))
          .withColumn("n2", sum(col("c2")).over(all))
          // the geometric-mean product c1·c2 multiplies two bin counts
          // that can both be corpus-scaled on a whale bin (round-15
          // audit): 5e10·5e10 ≈ 2.5e21 passes int64, so the factors
          // cast to DOUBLE individually BEFORE the multiply — each
          // count is exactly representable below 2^53, the product is
          // one correctly-rounded IEEE multiply in both engines, and
          // the sqrt quantizes to DECIMAL(28,8) as before (values
          // below 2^53 are bit-identical to the old int-product path)
          .withColumn("bcq", expr(
            "CAST(sqrt(CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)) AS DECIMAL(28,8))"))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            sum(col("bcq")).as("bcs"))
          .select(col("n1"), col("n2"),
            (col("bcs").cast("double") / sqrt(col("n1").cast("double")) /
              sqrt(col("n2").cast("double"))).as("bc"),
            sqrt(greatest(lit(0.0),
              lit(1.0) - col("bcs").cast("double") /
                sqrt(col("n1").cast("double")) /
                sqrt(col("n2").cast("double")))).as("h"))
      },
      Some(s"""WITH b AS (
              |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 < 15 AS h1,
              |    CAST(floor(value * 10.0) AS BIGINT) AS v
              |  FROM events),
              |cell AS (SELECT v,
              |  CAST(SUM(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              |  CAST(SUM(CASE WHEN NOT h1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
              |  FROM b GROUP BY v),
              |tt AS (SELECT c1, c2,
              |  CAST(SUM(c1) OVER () AS BIGINT) AS n1,
              |  CAST(SUM(c2) OVER () AS BIGINT) AS n2,
              |  CAST(sqrt(CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)) AS DECIMAL(28,8)) AS bcq
              |  FROM cell)
              |SELECT MAX(n1) AS n1, MAX(n2) AS n2,
              |  CAST(SUM(bcq) AS DOUBLE) / sqrt(CAST(MAX(n1) AS DOUBLE))
              |    / sqrt(CAST(MAX(n2) AS DOUBLE)) AS bc,
              |  sqrt(greatest(0.0, 1.0
              |    - CAST(SUM(bcq) AS DOUBLE) / sqrt(CAST(MAX(n1) AS DOUBLE))
              |      / sqrt(CAST(MAX(n2) AS DOUBLE)))) AS h
              |FROM tt""".stripMargin)),

    // ── Wilcoxon signed-rank (paired two-sample test) ──
    // The PAIRED complement of q_mannwhitney: day i of the month's
    // first half pairs with day i+15, the test statistic ranks the
    // |differences| of the paired daily counts. Zero differences drop
    // (the standard convention); ties share an average rank carried as
    // DOUBLED integer ranks (2·avg = 2·min_rank + ties − 1 — the
    // q_spearman doubling trick, so rank arithmetic never leaves
    // int64). W⁺ and W⁻ are exact; the normal-approximation z is one
    // identical IEEE expression over them (sqrt is correctly rounded
    // per IEEE — the q_ab_test precedent). The corpus-sized stage is
    // the daily aggregate; everything after runs on ≤15 rows.
    Q("q_wilcoxon",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr(s"(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L").as("d"))
          .agg(count(lit(1)).as("n"))
        val pr = daily.filter(col("d") < 15)
          .select(col("d").as("da"), col("n").as("n1"))
          .join(daily.select(col("d").as("db"), col("n").as("n2")),
            col("db") === col("da") + 15)
          .withColumn("diff", col("n2") - col("n1"))
        val np = pr.agg(count(lit(1)).as("n_pairs"))
        val nz = pr.filter(col("diff") =!= 0)
          .withColumn("ad", abs(col("diff")))
        val ranked = nz
          .withColumn("rmin", rank().over(Window.orderBy("ad")).cast("long"))
          .withColumn("ties", count(lit(1)).over(Window.partitionBy("ad")))
          .withColumn("dr", col("rmin") * 2L + col("ties") - 1L)
        ranked.agg(count(lit(1)).as("n_eff"),
            sum(when(col("diff") > 0, col("dr")).otherwise(0L))
              .as("w_plus_x2"),
            sum(when(col("diff") < 0, col("dr")).otherwise(0L))
              .as("w_minus_x2"))
          .crossJoin(broadcast(np))
          .select(col("n_pairs"), col("n_eff"), col("w_plus_x2"),
            col("w_minus_x2"),
            expr("""(CAST(w_plus_x2 AS DOUBLE) / 2.0
                 |  - CAST(n_eff * (n_eff + 1) AS DOUBLE) / 4.0)
                 | / sqrt(CAST(n_eff * (n_eff + 1) * (2 * n_eff + 1)
                 |   AS DOUBLE) / 24.0)""".stripMargin).as("z"))
      },
      Some("""WITH daily AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS d,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |pr AS (SELECT a.d AS da, a.n AS n1, b.n AS n2, b.n - a.n AS diff
             |  FROM daily a JOIN daily b ON b.d = a.d + 15 WHERE a.d < 15),
             |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pr),
             |nz AS (SELECT diff, abs(diff) AS ad FROM pr WHERE diff <> 0),
             |rk AS (SELECT diff,
             |    CAST(rank() OVER (ORDER BY ad) AS BIGINT) * 2
             |      + CAST(count(*) OVER (PARTITION BY ad) AS BIGINT) - 1
             |      AS dr
             |  FROM nz),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n_eff,
             |    CAST(SUM(CASE WHEN diff > 0 THEN dr ELSE 0 END) AS BIGINT)
             |      AS w_plus_x2,
             |    CAST(SUM(CASE WHEN diff < 0 THEN dr ELSE 0 END) AS BIGINT)
             |      AS w_minus_x2
             |  FROM rk)
             |SELECT n_pairs, n_eff, w_plus_x2, w_minus_x2,
             |  (CAST(w_plus_x2 AS DOUBLE) / 2.0
             |    - CAST(n_eff * (n_eff + 1) AS DOUBLE) / 4.0)
             |  / sqrt(CAST(n_eff * (n_eff + 1) * (2 * n_eff + 1)
             |    AS DOUBLE) / 24.0) AS z
             |FROM ag, np""".stripMargin)),

    // ── ABC / Pareto classification ──
    // Inventory analytics: parts classed A/B/C by cumulative revenue
    // share (A while cum ≤ 80%, B ≤ 95%, C rest), thresholds compared
    // CLEARED (cum·100 ≤ tot·80 — no percentage division ever
    // happens). Revenue is exact cents via the DECIMAL psum recipe;
    // the cumulative walk sorts once under the (revenue DESC, partkey)
    // total order. One keyed aggregate + one global-ordered window
    // over the PART-grain rollup (parts ≪ lineitems; at 100 TB the
    // part table is the small side by construction) + a 3-row class
    // aggregate.
    Q("q_abc",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .as("rev"))
          // pinned: one lineitem scan feeds both GridRank consumers
          // (part-grain materialization; round-17 review)
          .localCheckpoint()
        // The cleared threshold compares (cum·100 vs tot·80) and the
        // ppm scaling multiply corpus-total cents (round-15 audit): at
        // 100 TB tot ≈ 2.3e18, so cum·100 ≈ 2.3e20 and Σrev·10⁶ ≈
        // 2.3e24 pass 2^63 — both run DECIMAL(38,0) on the part-grain
        // walk / 3-row class aggregate (DuckDB: HUGEINT; `div` on
        // decimal returns BIGINT, ppm ≤ 10⁶, so the output schema is
        // unchanged). cum/tot themselves hold at ~4× with the ANSI
        // loud-failure backstop.
        // The cumulative walk rides the GridRank decomposition
        // (round-17 window sweep — parts GROW with the corpus, so
        // the old unpartitioned cum window serialized a part-grain
        // sort into one task): bucket = rev div 10⁴; per-PART
        // revenue is bounded by part behavior (~30 lineitems/part
        // under the TPC-H generators × the price domain, ≲3e8
        // cents), not corpus size, so the bucket table stays ≤ ~3e4
        // rows at any scale. Hash-identical under the strict
        // (rev DESC, partkey) order; the twin keeps the naive form.
        val dd = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        graft.engine.GridRank.runningSum(rev, expr("rev div 10000"),
            bucketAsc = false,
            Seq(col("rev").desc, col("l_partkey").asc), col("rev"),
            "cum", "tot")
          .withColumn("cls",
            when(dd(col("cum")) * 100 <= dd(col("tot")) * 80, "A")
              .when(dd(col("cum")) * 100 <= dd(col("tot")) * 95, "B")
              .otherwise("C"))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("rev")).as("revenue_cents"),
            expr("sum(cast(rev as decimal(38,0))) * 1000000 div max(tot)")
              .as("share_ppm"))
          .orderBy("cls")
      },
      Some("""WITH rev AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
             |      AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem GROUP BY l_partkey),
             |c AS (SELECT l_partkey, rev,
             |    CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum,
             |    CAST(SUM(rev) OVER () AS BIGINT) AS tot
             |  FROM rev),
             |k AS (SELECT CASE WHEN CAST(cum AS HUGEINT) * 100 <= CAST(tot AS HUGEINT) * 80 THEN 'A'
             |             WHEN CAST(cum AS HUGEINT) * 100 <= CAST(tot AS HUGEINT) * 95 THEN 'B'
             |             ELSE 'C' END AS cls, rev, tot
             |  FROM c)
             |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(SUM(rev) AS BIGINT) AS revenue_cents,
             |  CAST(SUM(CAST(rev AS HUGEINT)) * 1000000 // MAX(tot) AS BIGINT) AS share_ppm
             |FROM k GROUP BY cls ORDER BY cls""".stripMargin)),

    // ── KMV (θ-sketch) set INTERSECTION estimate ──
    // What HLL cannot do: estimate |A ∩ B| from two mergeable bottom-k
    // sketches (A = 1995 buyers, B = 2000 buyers — overlap probed
    // non-vacuous at every driver SF: ~66% Jaccard with both sets
    // 10×–200× the sketch size at sf0.01+). Each side keeps its k = 64
    // smallest md5 hashes (the q_bottomk substrate); θ = min of the
    // two kth values (2³² when a side is exact, degrading gracefully
    // to the exact count); the estimator is |common below θ| · 2³²
    // div θ — all int64, no doubles anywhere. The exact intersection
    // rides along as the verification arm (the q_approx_distinct
    // discipline: the envelope is IN the hash-checked result).
    // At 100 TB the two sketches are 64 rows each regardless of
    // corpus — the intersection estimate costs two sketch builds (one
    // keyed top-k each) plus a 64-row join. The bottom-64 selection
    // is a distributed orderBy().limit(64) (TakeOrderedAndProject:
    // per-partition bottom-64, merged), never a single-task
    // row_number over all distinct buyers (round-17 window sweep) —
    // the strict (hv, ck) total order makes the selected set
    // identical, and the DuckDB twin keeps the naive rank form as
    // the independent oracle.
    Q("q_sketch_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def buyers(y0: String, y1: String): DataFrame = o
          .filter(col("o_orderdate") >= lit(y0) &&
            col("o_orderdate") < lit(y1))
          .select(col("o_custkey").as("ck")).distinct()
          .withColumn("hv",
            expr(graft.functions.HashSample.sparkRaw("ck")))
        def sketch(d: DataFrame): DataFrame =
          d.orderBy(col("hv"), col("ck")).limit(64)
        val a = buyers("1995-01-01", "1996-01-01")
        val b = buyers("2000-01-01", "2001-01-01")
        val (ska, skb) = (sketch(a), sketch(b))
        def kth(sk: DataFrame, alias: String): DataFrame = sk
          .agg(count(lit(1)).as("c"), max(col("hv")).as("mx"))
          .select(when(col("c") === 64L, col("mx"))
            .otherwise(4294967296L).as(alias))
        val theta = kth(ska, "ka").crossJoin(kth(skb, "kb"))
          .select(least(col("ka"), col("kb")).as("theta"))
        val common = ska.select(col("ck"), col("hv"))
          .join(skb.select(col("ck")), "ck")
          .crossJoin(broadcast(theta))
          .filter(col("hv") < col("theta"))
          .groupBy(col("theta"))
          .agg(count(lit(1)).as("n_common"))
        val exact = a.select("ck").join(b.select("ck"), "ck")
          .agg(count(lit(1)).as("exact_inter"))
        val sizes = a.agg(count(lit(1)).as("ndv_a"))
          .crossJoin(b.agg(count(lit(1)).as("ndv_b")))
        common
          .select(lit(64L).as("k"), col("theta"), col("n_common"),
            expr("n_common * 4294967296L div theta").as("est_inter"))
          .crossJoin(broadcast(exact))
          .crossJoin(broadcast(sizes))
      },
      Some(s"""WITH a AS (SELECT DISTINCT o_custkey AS ck,
              |    ${graft.functions.HashSample.duckRaw("o_custkey")} AS hv
              |  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              |    AND o_orderdate < TIMESTAMP '1996-01-01'),
              |b AS (SELECT DISTINCT o_custkey AS ck,
              |    ${graft.functions.HashSample.duckRaw("o_custkey")} AS hv
              |  FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
              |    AND o_orderdate < TIMESTAMP '2001-01-01'),
              |ska AS (SELECT ck, hv FROM (SELECT ck, hv,
              |    row_number() OVER (ORDER BY hv, ck) AS rn FROM a)
              |  WHERE rn <= 64),
              |skb AS (SELECT ck, hv FROM (SELECT ck, hv,
              |    row_number() OVER (ORDER BY hv, ck) AS rn FROM b)
              |  WHERE rn <= 64),
              |th AS (SELECT least(
              |    (SELECT CASE WHEN count(*) = 64 THEN MAX(hv)
              |            ELSE 4294967296 END FROM ska),
              |    (SELECT CASE WHEN count(*) = 64 THEN MAX(hv)
              |            ELSE 4294967296 END FROM skb)) AS theta),
              |cm AS (SELECT theta, CAST(count(*) AS BIGINT) AS n_common
              |  FROM ska JOIN skb USING (ck), th
              |  WHERE ska.hv < theta GROUP BY theta)
              |SELECT CAST(64 AS BIGINT) AS k, CAST(theta AS BIGINT) AS theta,
              |  n_common, n_common * 4294967296 // theta AS est_inter,
              |  (SELECT CAST(count(*) AS BIGINT)
              |   FROM a JOIN b USING (ck)) AS exact_inter,
              |  (SELECT CAST(count(*) AS BIGINT) FROM a) AS ndv_a,
              |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS ndv_b
              |FROM cm""".stripMargin)),

    // ── cross-correlation function (lead/lag between two series) ──
    // Does one signal LEAD the other? CCF(ℓ) = corr(views_t,
    // purchases_{t+ℓ}) for ℓ ∈ [−3, 3] over the daily series — the
    // does-marketing-predict-sales primitive q_acf can't express
    // (ACF is one series against itself). Per lag the moments are
    // exact int64 over the ALIGNED overlap (each lag has its own n —
    // the standard CCF convention), and r is the same IEEE
    // expression tree q_corr ships. The corpus-sized stage is ONE
    // day×type aggregate; the 7-lag×30-day alignment join runs on
    // the bounded daily table.
    Q("q_crosscorr",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr(s"(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L").as("d"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
          .localCheckpoint(true)
        val lags = s.range(-3, 4).select(col("id").as("lag"))
        val aligned = daily.select(col("d"), col("x"))
          .crossJoin(broadcast(lags))
          .join(daily.select(col("d").as("d2"), col("y")),
            col("d2") === col("d") + col("lag"))
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        // day-count products in DECIMAL(38,0) over the ≤30-row aligned
        // table (free — the q_corr discipline, round-13 review): at
        // 100 TB the per-day counts make x·y and the cleared products
        // pass int64 while the DuckDB twin's HUGEINT stays exact
        val dd = (c: org.apache.spark.sql.Column) =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        aligned.groupBy("lag")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(dd(col("x")) * col("y")).as("sxy"),
            sum(dd(col("x")) * col("x")).as("sxx"),
            sum(dd(col("y")) * col("y")).as("syy"))
          .select(col("lag"), col("n"),
            ((d(dd(col("n")) * col("sxy") - dd(col("sx")) * col("sy"))) /
              (sqrt(d(dd(col("n")) * col("sxx") - dd(col("sx")) * col("sx"))) *
                sqrt(d(dd(col("n")) * col("syy") - dd(col("sy")) * col("sy")))))
              .as("r"))
          .orderBy("lag")
      },
      Some("""WITH daily AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS d,
             |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS x,
             |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |lags AS (SELECT CAST(i AS BIGINT) AS lag
             |         FROM generate_series(-3, 3) t(i)),
             |al AS (SELECT l.lag, a.x, b.y
             |  FROM daily a CROSS JOIN lags l
             |  JOIN daily b ON b.d = a.d + l.lag),
             |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
             |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
             |    SUM(CAST(y AS HUGEINT) * y) AS syy
             |  FROM al GROUP BY lag)
             |SELECT lag, n,
             |  CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
             |      AS VARCHAR) AS DOUBLE) /
             |  (sqrt(CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
             |       AS VARCHAR) AS DOUBLE)) *
             |   sqrt(CAST(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
             |       AS VARCHAR) AS DOUBLE))) AS r
             |FROM m ORDER BY lag""".stripMargin)),

    // ── PACF (3 lags, unrolled Durbin–Levinson) ──
    // The AR-order-selection companion of q_acf: the partial
    // autocorrelation at lag k strips the influence of lags < k, and
    // the cutoff pattern is how an AR(p) is identified. Input is the
    // SAME banded-ACF sequence q_acf declares (identical moment
    // formula, identical double division); the Durbin–Levinson
    // recursion is BOUNDED (3 lags) so it unrolls into one identical
    // IEEE expression tree in both engines — the q_holt
    // bounded-recursion discipline, no iteration anywhere. Corpus
    // cost: the one day-grain aggregate; everything else is a 1-row
    // computation at any scale.
    Q("q_pacf",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr(s"(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L").as("d"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(true)
        // decimal moments/products over the ~30-row daily table — the
        // same round-13 widening q_acf received (per-day x·x at the
        // int64 edge at 100 TB; the recursion below is unchanged)
        val dd = (c: org.apache.spark.sql.Column) =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val glob = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(dd(col("x")) * col("x")).as("sxx"))
        val ks = daily.sparkSession.range(1, 4).select(col("id").as("k"))
        val acf = daily.crossJoin(broadcast(ks)).alias("a")
          .join(broadcast(daily.select(col("d").as("d2"), col("x").as("x2"))),
            col("d2") === col("a.d") + col("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("m"), sum(dd(col("a.x")) * col("x2")).as("sxy"),
            sum(col("a.x")).as("head"), sum(col("x2")).as("tail"))
          .crossJoin(broadcast(glob))
          .select(col("k"),
            ((dd(col("n")) * col("n") * col("sxy") -
              dd(col("n")) * col("s") * (col("head") + col("tail")) +
              dd(col("m")) * col("s") * col("s")).cast("double") /
              (dd(col("n")) * col("n") * col("sxx") -
                dd(col("n")) * col("s") * col("s")).cast("double")).as("r"))
        acf.groupBy()
          .agg(max(when(col("k") === 1, col("r"))).as("r1"),
            max(when(col("k") === 2, col("r"))).as("r2"),
            max(when(col("k") === 3, col("r"))).as("r3"))
          .selectExpr("r1", "r2", "r3", "r1 AS pacf1",
            "(r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2",
            """(r3 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r2
              | - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
              | / (1.0 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r1
              | - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2) AS pacf3"""
              .stripMargin.replace("\n", ""))
      },
      Some("""WITH daily AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS d,
             |    CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(x) AS BIGINT) AS s,
             |  SUM(CAST(x AS HUGEINT) * x) AS sxx FROM daily),
             |p AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
             |  SUM(CAST(a.x AS HUGEINT) * b.x) AS sxy,
             |  CAST(SUM(a.x) AS BIGINT) AS head,
             |  CAST(SUM(b.x) AS BIGINT) AS tail
             |  FROM daily a, generate_series(1, 3) t(k), daily b
             |  WHERE b.d = a.d + k GROUP BY k),
             |acf AS (SELECT k,
             |  CAST(CAST(CAST(n AS HUGEINT)*n*sxy - CAST(n AS HUGEINT)*s*(head + tail)
             |    + CAST(m AS HUGEINT)*s*s AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(n AS HUGEINT)*n*sxx - CAST(n AS HUGEINT)*s*s
             |        AS VARCHAR) AS DOUBLE) AS r
             |  FROM p, g),
             |w AS (SELECT MAX(CASE WHEN k = 1 THEN r END) AS r1,
             |  MAX(CASE WHEN k = 2 THEN r END) AS r2,
             |  MAX(CASE WHEN k = 3 THEN r END) AS r3 FROM acf)
             |SELECT r1, r2, r3, r1 AS pacf1,
             |  (r2 - r1 * r1) / (1.0 - r1 * r1) AS pacf2,
             |  (r3 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r2
             |   - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
             |  / (1.0 - (r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1) * r1
             |   - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2) AS pacf3
             |FROM w""".stripMargin)),

    // ── distribution-free median confidence interval ──
    // Uncertainty on the median WITHOUT a distributional assumption:
    // the binomial order-statistic interval — ranks
    // ⌊(n − 1.96√n)/2⌋ and ⌈(n + 1.96√n)/2⌉ + 1 (clamped into
    // [1, n]) bracket the true median at ~95% for any continuous
    // distribution. sqrt is IEEE-correctly-rounded and floor/ceil of
    // the identical expression are deterministic, so the rank
    // indices — and therefore the picked values — hash-match. One
    // keyed window sort (shared shape with q_boxplot), one
    // conditional aggregate; the CI math runs on per-group scalars.
    Q("q_median_ci",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 10000).cast("long").as("fp"),
            col("event_id"))
        val w = Window.partitionBy("event_type")
          .orderBy(col("fp"), col("event_id"))
        e.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy("event_type")))
          .withColumn("lo_rank", expr(
            "greatest(1L, CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE)))" +
              " / 2.0) AS BIGINT))"))
          .withColumn("hi_rank", expr(
            "least(n, CAST(ceil((n + 1.96 * sqrt(CAST(n AS DOUBLE)))" +
              " / 2.0) AS BIGINT) + 1)"))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("fp")))
              .as("median_fp"),
            max(when(col("rn") === col("lo_rank"), col("fp"))).as("ci_lo_fp"),
            max(when(col("rn") === col("hi_rank"), col("fp"))).as("ci_hi_fp"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(floor(value * 10000) AS BIGINT) AS fp, event_id
             |  FROM events),
             |r AS (SELECT event_type, fp,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY fp, event_id) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
             |  FROM e),
             |k AS (SELECT event_type, fp, rn, n,
             |    greatest(1, CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE)))
             |      / 2.0) AS BIGINT)) AS lo_rank,
             |    least(n, CAST(ceil((n + 1.96 * sqrt(CAST(n AS DOUBLE)))
             |      / 2.0) AS BIGINT) + 1) AS hi_rank
             |  FROM r)
             |SELECT event_type, MAX(n) AS n,
             |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN fp END) AS BIGINT)
             |    AS median_fp,
             |  CAST(MAX(CASE WHEN rn = lo_rank THEN fp END) AS BIGINT)
             |    AS ci_lo_fp,
             |  CAST(MAX(CASE WHEN rn = hi_rank THEN fp END) AS BIGINT)
             |    AS ci_hi_fp
             |FROM k GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
