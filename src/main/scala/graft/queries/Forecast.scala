package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Forecasting operators (round-7 extension batch).
  *
  * Determinism: Holt's recursion uses α = β = 1/2 — every smoothing
  * step is a multiply-by-0.5 (exact in binary floating point) and
  * additions of dyadic rationals whose combined magnitude stays far
  * inside the 53-bit mantissa (daily counts ≤ ~2²⁰ with ≤ ~2⁻³⁵
  * fractional resolution over a month of days), so the level/trend
  * iterates are EXACT dyadic rationals on both engines — the hash can
  * never drift by a ulp. A production deployment wanting arbitrary
  * α keeps the same shape with fixed-point micro-unit arithmetic
  * (the pageRank idiom).
  */
object Forecast {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── Holt's linear (double-exponential) smoothing per event type ──
    // Daily event counts fold through level/trend recursion
    //   l_t = ½·y_t + ½·(l_{t−1} + b_{t−1})
    //   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1}
    // initialized l₁ = y₁, b₁ = 0; output the final state and the
    // 1-step-ahead forecast l + b per type. The recursion is
    // inherently sequential IN THE SERIES — but the series is
    // day-grain (bounded by calendar days, not corpus size), so the
    // 100 TB shape is: one distributed day×type aggregate over the
    // events (the only corpus-sized stage), then a per-type
    // `aggregate()` higher-order fold over a ≤365-element array —
    // codegen'd, no UDF, no driver loop. The oracle runs the same
    // recursion as a RECURSIVE CTE over the day index.
    Q("q_holt",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        daily.groupBy("event_type")
          .agg(expr("array_sort(collect_list(struct(day, y)))").as("ser"))
          .withColumn("ys", expr("transform(ser, x -> x.y)"))
          .withColumn("st", expr(
            """aggregate(
              |  slice(ys, 2, size(ys) - 1),
              |  named_struct('l', ys[0], 'b', cast(0.0 as double)),
              |  (acc, y) -> named_struct(
              |    'l', 0.5D * y + 0.5D * (acc.l + acc.b),
              |    'b', 0.5D * (0.5D * y + 0.5D * (acc.l + acc.b) - acc.l)
              |         + 0.5D * acc.b),
              |  acc -> acc)""".stripMargin))
          .select(col("event_type"), size(col("ys")).cast("long").as("n_days"),
            col("st.l").as("level"), col("st.b").as("trend"),
            (col("st.l") + col("st.b")).as("forecast"))
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |idx AS (SELECT event_type, y,
             |          row_number() OVER (PARTITION BY event_type
             |            ORDER BY day) AS i
             |        FROM d),
             |hw(event_type, i, l, b) AS (
             |  -- anchor types BIND the recursion's types in DuckDB: 0.0
             |  -- unadorned is DECIMAL and would silently quantize every
             |  -- iterate — cast to DOUBLE explicitly
             |  SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE)
             |  FROM idx WHERE i = 1
             |  UNION ALL
             |  SELECT h.event_type, h.i + 1,
             |         0.5 * x.y + 0.5 * (h.l + h.b),
             |         0.5 * (0.5 * x.y + 0.5 * (h.l + h.b) - h.l) + 0.5 * h.b
             |  FROM hw h JOIN idx x
             |    ON x.event_type = h.event_type AND x.i = h.i + 1),
             |fin AS (SELECT event_type, MAX(i) AS n FROM hw GROUP BY 1)
             |SELECT h.event_type, f.n AS n_days, h.l AS level, h.b AS trend,
             |       h.l + h.b AS forecast
             |FROM hw h JOIN fin f
             |  ON f.event_type = h.event_type AND h.i = f.n
             |ORDER BY h.event_type""".stripMargin)),

    // ── trailing-7-day rolling EXACT median of daily revenue ──
    // The robust-smoothing twin of the mean-based EWMA/Holt surface:
    // for each order day, the lower median of the trailing ≤7 days'
    // revenue totals (in exact cents — DECIMAL-scaled BIGINT). The
    // window is day-grain, so the frame holds ≤7 values: collect,
    // sort, pick rank (n+1) div 2 — all integer, hash-exact, no
    // approx-percentile sketch needed at this grain. The corpus-sized
    // stage is the one day aggregate; the window runs over day-count
    // rows. The oracle picks the identical rank via a range self-join
    // (no reliance on any engine's quantile tie/interpolation rule).
    Q("q_rolling_median",
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(expr("cast(o_totalprice as decimal(18,2)) * 100"))
            .cast("long").as("cents"))
        // RANGE frame over epoch-day numbers, not a row frame: the
        // calendar has gaps, and "trailing 7 days" must skip them the
        // same way the oracle's BETWEEN day-interval join does
        val w7 = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
        daily
          .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
          // collect the ≤7-value frame, sort, pick the lower median:
          // [] indexing is 0-based, rank (n+1) div 2 is 1-based
          .withColumn("win", sort_array(collect_list(col("cents")).over(w7)))
          .withColumn("med7_cents",
            expr("win[(size(win) + 1) div 2 - 1]"))
          .select(col("day"), col("cents"), col("med7_cents"))
          .orderBy("day")
      },
      Some("""WITH d AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
             |              AS BIGINT) AS cents
             |  FROM orders GROUP BY 1),
             |w AS (SELECT a.day, b.cents AS c
             |      FROM d a JOIN d b
             |        ON b.day BETWEEN a.day - INTERVAL 6 DAY AND a.day),
             |r AS (SELECT day, c,
             |        row_number() OVER (PARTITION BY day ORDER BY c) AS rn,
             |        count(*) OVER (PARTITION BY day) AS n
             |      FROM w)
             |SELECT d.day, d.cents, r.c AS med7_cents
             |FROM d JOIN r ON r.day = d.day AND r.rn = (r.n + 1) // 2
             |ORDER BY d.day""".stripMargin)),

    // ── forecast backtest: mean absolute error vs the naive model ──
    // The evaluation half of forecasting: walk the same daily series
    // and score 1-step-ahead Holt (forecast for day t+1 = l_t + b_t)
    // against the NAIVE forecast (ŷ_{t+1} = y_t) by total absolute
    // error in exact micro-units. The fold carries (l, b, prev_y,
    // err_holt, err_naive) through the same dyadic recursion —
    // errors quantize to BIGINT micro-units at each step, so the
    // comparison is hash-exact. A model that can't beat naive on
    // this corpus reads as ratio_fp ≥ 10⁶ honestly rather than
    // hiding behind float noise.
    Q("q_holt_backtest",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(col("event_type"),
            to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        daily.groupBy("event_type")
          .agg(expr("array_sort(collect_list(struct(day, y)))").as("ser"))
          .withColumn("ys", expr("transform(ser, x -> x.y)"))
          .withColumn("st", expr(
            // err accumulators are micro-unit BIGINTs of |forecast − y|;
            // the forecast for the CURRENT y is the PREVIOUS (l+b) /
            // prev_y, accumulated before folding y into the state
            """aggregate(
              |  slice(ys, 2, size(ys) - 1),
              |  named_struct('l', ys[0], 'b', cast(0.0 as double),
              |               'py', ys[0],
              |               'eh', cast(0L as bigint), 'en', cast(0L as bigint)),
              |  (acc, y) -> named_struct(
              |    'l', 0.5D * y + 0.5D * (acc.l + acc.b),
              |    'b', 0.5D * (0.5D * y + 0.5D * (acc.l + acc.b) - acc.l)
              |         + 0.5D * acc.b,
              |    'py', y,
              |    'eh', acc.eh + cast(floor(abs((acc.l + acc.b) - y) * 1000000D) as bigint),
              |    'en', acc.en + cast(floor(abs(acc.py - y) * 1000000D) as bigint)),
              |  acc -> acc)""".stripMargin))
          .select(col("event_type"),
            (size(col("ys")) - 1).cast("long").as("n_preds"),
            col("st.eh").as("abs_err_holt_fp"),
            col("st.en").as("abs_err_naive_fp"),
            // ratio < 10⁶ ⇔ Holt beats naive on this series.
            // eh·10⁶ runs DECIMAL(38,0) (round-16 audit): the r14 row
            // bounded the ACCUMULATOR (Σ floor(|err|·10⁶) ≈ 2e16 at
            // 3e9-events/day design, ~450×) but missed this ratio
            // clearing — eh·10⁶ ≈ 2e22 passes 2^63, an ANSI
            // ArithmeticException in all-long form. One decimal
            // multiply on the per-event-type row (~5 rows); `div`
            // returns BIGINT so ratio_fp keeps its declared type
            // (a naive-perfect en=0 series at design eh would top
            // int64 in the quotient itself and fails overtly at the
            // declared-type boundary — the q_decay_trend precedent).
            expr("(cast(st.eh as decimal(38,0)) * 1000000L) " +
              "div greatest(st.en, 1L)").as("ratio_fp"))
          .orderBy("event_type")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |         CAST(count(*) AS DOUBLE) AS y
             |  FROM events GROUP BY 1, 2),
             |idx AS (SELECT event_type, y,
             |          row_number() OVER (PARTITION BY event_type
             |            ORDER BY day) AS i
             |        FROM d),
             |hw(event_type, i, l, b, py, eh, en) AS (
             |  SELECT event_type, CAST(1 AS BIGINT), y, CAST(0.0 AS DOUBLE), y,
             |         CAST(0 AS BIGINT), CAST(0 AS BIGINT)
             |  FROM idx WHERE i = 1
             |  UNION ALL
             |  SELECT h.event_type, h.i + 1,
             |         0.5 * x.y + 0.5 * (h.l + h.b),
             |         0.5 * (0.5 * x.y + 0.5 * (h.l + h.b) - h.l) + 0.5 * h.b,
             |         x.y,
             |         h.eh + CAST(floor(abs((h.l + h.b) - x.y) * 1000000) AS BIGINT),
             |         h.en + CAST(floor(abs(h.py - x.y) * 1000000) AS BIGINT)
             |  FROM hw h JOIN idx x
             |    ON x.event_type = h.event_type AND x.i = h.i + 1),
             |fin AS (SELECT event_type, MAX(i) AS n FROM hw GROUP BY 1)
             |SELECT h.event_type, f.n - 1 AS n_preds,
             |       h.eh AS abs_err_holt_fp, h.en AS abs_err_naive_fp,
             |       CAST((CAST(h.eh AS HUGEINT) * 1000000)
             |      // greatest(h.en, 1) AS BIGINT) AS ratio_fp
             |FROM hw h JOIN fin f
             |  ON f.event_type = h.event_type AND h.i = f.n
             |ORDER BY h.event_type""".stripMargin)),

    // ── OHLC bars (time-series downsampling) ──
    // The financial-bars / telemetry-downsample operator: per day,
    // open (first value by the (event time, event_id) total order),
    // high, low, close (last), and the tick count — the lossy day
    // grain a dashboard reads instead of raw events. Values in exact
    // 1e-4 fixed point (the MlEval scored convention). ONE map-side-
    // combinable aggregate (round-13 review): open/close are
    // min/max over the (us, event_id, fp) struct — lexicographic
    // comparison over all-LONG fields, exact, and the streaming-twin
    // BarState fold uses the identical total order — where the
    // previous form ran TWO full window sorts (asc + desc row_number)
    // over the events just to mark rn=1. At 100 TB that is the
    // difference between one combine-then-shuffle of day-sized
    // partials and two whole-corpus sorts. Bars remain the canonical
    // incremental rollup: day partitions close and never recompute
    // (the q_sketch_rollup story, minus the sketch).
    Q("q_ohlc",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(expr("(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L").as("d"),
            expr("unix_micros(ts)").as("us"), col("event_id"),
            floor(col("value") * 10000).cast("long").as("fp"))
        e.groupBy("d")
          .agg(
            min(struct(col("us"), col("event_id"), col("fp")))
              .getField("fp").as("open_fp"),
            max(col("fp")).as("high_fp"), min(col("fp")).as("low_fp"),
            max(struct(col("us"), col("event_id"), col("fp")))
              .getField("fp").as("close_fp"),
            count(lit(1)).as("n_ticks"))
          .orderBy("d")
      },
      Some("""WITH e AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS d,
             |    epoch_us(ts) AS us, event_id,
             |    CAST(floor(value * 10000) AS BIGINT) AS fp
             |  FROM events),
             |r AS (SELECT d, fp,
             |    row_number() OVER (PARTITION BY d
             |      ORDER BY us, event_id) AS rna,
             |    row_number() OVER (PARTITION BY d
             |      ORDER BY us DESC, event_id DESC) AS rnd
             |  FROM e)
             |SELECT d, CAST(MAX(CASE WHEN rna = 1 THEN fp END) AS BIGINT)
             |    AS open_fp,
             |  MAX(fp) AS high_fp, MIN(fp) AS low_fp,
             |  CAST(MAX(CASE WHEN rnd = 1 THEN fp END) AS BIGINT) AS close_fp,
             |  CAST(count(*) AS BIGINT) AS n_ticks
             |FROM r GROUP BY d ORDER BY d""".stripMargin)),

    // ── TWAP: time-weighted average (q_ohlc's honest mean) ──
    // A tick's value holds until the NEXT tick (the last of the day
    // holds to midnight), so the day's average weights each value by
    // its holding duration — the standard telemetry/market rollup when
    // ticks arrive unevenly (an unweighted mean over-counts bursts).
    // dt comes from lead() inside the same (day, time, event_id)
    // window sort the bars use; TWAP = Σ fp·dt div Σ dt, all int64
    // (fp ≤ ~10⁵ × Σdt ≤ 8.64·10¹⁰ — within headroom by construction:
    // Σdt telescopes to day-end − first tick, never more than a day;
    // Stats3Spec pins the telescoping law and low ≤ TWAP ≤ high).
    Q("q_twap",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(expr("(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L").as("d"),
            expr("unix_micros(ts) - 1704067200000000L").as("us"),
            col("event_id"),
            floor(col("value") * 10000).cast("long").as("fp"))
        val wAsc = Window.partitionBy("d").orderBy(col("us"), col("event_id"))
        e.withColumn("dt",
            coalesce(lead(col("us"), 1).over(wAsc),
              (col("d") + 1L) * 86400000000L) - col("us"))
          .groupBy("d")
          .agg(count(lit(1)).as("n_ticks"), sum(col("dt")).as("span_us"),
            expr("sum(fp * dt) div sum(dt)").as("twap_fp"))
          .orderBy("d")
      },
      Some("""WITH e AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 AS d,
             |    epoch_us(ts) - 1704067200000000 AS us, event_id,
             |    CAST(floor(value * 10000) AS BIGINT) AS fp
             |  FROM events),
             |w AS (SELECT d, fp,
             |    COALESCE(lead(us) OVER (PARTITION BY d
             |      ORDER BY us, event_id), (d + 1) * 86400000000) - us AS dt
             |  FROM e)
             |SELECT d, CAST(count(*) AS BIGINT) AS n_ticks,
             |  CAST(SUM(dt) AS BIGINT) AS span_us,
             |  CAST(SUM(fp * dt) AS BIGINT) // CAST(SUM(dt) AS BIGINT)
             |    AS twap_fp
             |FROM w GROUP BY d ORDER BY d""".stripMargin))
  )
}
