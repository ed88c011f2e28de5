package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables
import graft.functions.HashSample

/** Statistical analytics with the repo's determinism contract.
  *
  * The rule that makes these oracle-hashable: accumulate MOMENTS as
  * exact integers (fixed-point where the input is double), then apply
  * a FIXED tree of IEEE-correctly-rounded ops (+,−,×,÷,sqrt are all
  * exactly rounded per IEEE-754 — unlike log/exp, they cannot differ
  * between engines). Sums commute exactly, the scalar math is written
  * with identical parenthesization in both engines, so regression
  * slopes and z-statistics hash-match bit-for-bit.
  */
object Stats {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** 2024-01-01 00:00:00 UTC in epoch microseconds (the events table
    * spans January 2024; rebasing keeps x small enough that every
    * moment below stays int64-exact). */
  private val EpochJan2024Us = 1704067200000000L

  val queries: Seq[Q] = Seq(

    // ── per-group OLS: value regressed on hour-of-month ──
    // slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²) over EXACT integer
    // moments: x = hour offset (0..743), y in fixed-point 1e-4 units
    // (the floor·10⁴ product idiom). Headroom (round-13 review): the
    // all-long form's n·Σxy was ~1e18 at sf0.1 — ONE order of
    // magnitude under 2^63, so sf1 would already overflow: an
    // ArithmeticException under Spark 4's ANSI default (a silent
    // wrap with ANSI off), either way diverging from the DuckDB
    // oracle's exact HUGEINT sums. Σxy therefore
    // accumulates DECIMAL(38,0) (per-row product is a cheap long —
    // ≤744·y_fp ~ 4e9 — only the sum needs width; the q_standardize
    // s2 precedent) and the final n·moment products compute in
    // decimal over the ≤|event_type| moment rows, which is free. The
    // remaining long moments hold to ~10¹¹ rows/group (sx ≤ 7e13,
    // sy ≤ 6e17, sxx ≤ 6e16 there) — the 100 TB design point. The
    // final slope/intercept are ONE double division each (correctly
    // rounded, engine-identical; decimal→double rounds identically to
    // long→double on the same integer). One partial+final aggregate,
    // one shuffle of 5 moment rows per group — the textbook
    // distributed regression shape (moments, never the raw points).
    Q("q_linreg",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        t(s, dir, "events")
          .withColumn("x", expr(s"(unix_micros(ts) - ${EpochJan2024Us}L) div 3600000000L"))
          .withColumn("y_fp", floor(col("value") * lit(10000.0)).cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y_fp")).as("sy"),
            sum(dec(col("x") * col("y_fp"))).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            (((dec(col("n")) * col("sxy") - dec(col("sx")) * col("sy")).cast("double")) /
              ((dec(col("n")) * col("sxx") - dec(col("sx")) * col("sx")).cast("double")) / lit(1e4))
              .as("slope"),
            ((col("sy").cast("double") / lit(1e4) -
              ((dec(col("n")) * col("sxy") - dec(col("sx")) * col("sy")).cast("double") /
                (dec(col("n")) * col("sxx") - dec(col("sx")) * col("sx")).cast("double") / lit(1e4)) *
                col("sx").cast("double")) / col("n").cast("double")).as("intercept"))
          .orderBy("event_type")
      },
      Some(s"""WITH m AS (
              |  SELECT event_type, count(*) AS n,
              |    SUM(x) AS sx, SUM(y_fp) AS sy,
              |    SUM(x * y_fp) AS sxy, SUM(x * x) AS sxx
              |  FROM (SELECT event_type,
              |          (epoch_us(ts) - ${EpochJan2024Us}) // 3600000000 AS x,
              |          CAST(floor(value * 10000.0) AS BIGINT) AS y_fp
              |        FROM events) GROUP BY event_type)
              |SELECT event_type, n,
              |  CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              |      AS VARCHAR) AS DOUBLE)
              |    / CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
              |        AS VARCHAR) AS DOUBLE) / 1e4 AS slope,
              |  (CAST(sy AS DOUBLE) / 1e4 -
              |   (CAST(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              |       AS VARCHAR) AS DOUBLE)
              |      / CAST(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
              |          AS VARCHAR) AS DOUBLE) / 1e4)
              |     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
              |FROM m ORDER BY event_type""".stripMargin)),

    // ── two-proportion A/B z-test on hash-split arms ──
    // Arms from the md5 hash-sample idiom (reproducible, engine-equal
    // split); conversion = purchase within day 1-3. The z statistic
    // uses only exactly-rounded ops over exact integer counts, so the
    // double hashes match. Per-user collapse first (one keyed
    // aggregate), then a 2-row arm aggregate — at any scale the test
    // statistic computes from 4 integers.
    Q("q_ab_test",
      (s, dir) => {
        // arm totals as ONE conditional global aggregate — a 1×1
        // cross of per-arm aggregates would plan the
        // BroadcastNestedLoopJoin this repo bans (q_approx_percentile
        // precedent)
        val u = t(s, dir, "events")
          .groupBy(col("user_id"))
          // conversion = purchased within the first 3 days — a rare-enough
          // event that both arms stay non-degenerate at every test SF
          // (an "ever purchased" flag saturates to 100% on this data and
          // the z-statistic would never leave its NULL guard)
          .agg(max(when(col("event_type") === "purchase" &&
              col("ts") < lit("2024-01-04 00:00:00").cast("timestamp"), 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("isa", expr(HashSample.spark("user_id", 2)))
        val pPool = (col("c_a") + col("c_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double")
        u.agg(
            sum(when(col("isa"), 1L).otherwise(0L)).as("n_a"),
            sum(when(col("isa"), col("conv")).otherwise(0L)).as("c_a"),
            sum(when(!col("isa"), 1L).otherwise(0L)).as("n_b"),
            sum(when(!col("isa"), col("conv")).otherwise(0L)).as("c_b"))
          .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
            // degenerate designs (empty arm, 0% or 100% pooled rate)
            // have zero variance — NULL z, not an ANSI divide-by-zero
            when(col("n_a") > 0 && col("n_b") > 0 &&
                col("c_a") + col("c_b") > 0 &&
                col("c_a") + col("c_b") < col("n_a") + col("n_b"),
              (col("c_a").cast("double") / col("n_a").cast("double") -
                col("c_b").cast("double") / col("n_b").cast("double")) /
                sqrt(pPool * (lit(1.0) - pPool) *
                  (lit(1.0) / col("n_a").cast("double") +
                   lit(1.0) / col("n_b").cast("double")))).as("z"))
      },
      Some(s"""WITH u AS (SELECT user_id,
              |    MAX(CASE WHEN event_type = 'purchase'
              |              AND ts < TIMESTAMP '2024-01-04 00:00:00'
              |         THEN 1 ELSE 0 END) AS conv
              |  FROM events GROUP BY user_id),
              |ab AS (SELECT
              |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              |    CAST(SUM(CASE WHEN isa THEN conv ELSE 0 END) AS BIGINT) AS c_a,
              |    CAST(SUM(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              |    CAST(SUM(CASE WHEN NOT isa THEN conv ELSE 0 END) AS BIGINT) AS c_b
              |  FROM (SELECT conv, ${HashSample.duck("user_id", 2)} AS isa FROM u))
              |SELECT n_a, c_a, n_b, c_b,
              |  CASE WHEN n_a > 0 AND n_b > 0 AND c_a + c_b > 0
              |            AND c_a + c_b < n_a + n_b THEN
              |  (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
              |   CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
              |  sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
              |       (1.0 - CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
              |       (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
              |  ELSE NULL END AS z
              |FROM ab""".stripMargin)),

    // ── cohort retention: users active k weeks after their first week ──
    // The activation/retention triangle. The heavy stream collapses to
    // distinct (user, week) FIRST (one keyed shuffle, partial distinct
    // per partition); cohort assignment is a user-keyed min; the final
    // count groups a user-week-sized relation. Integer week indexes
    // ((ts − epoch_2024) // 1 week) keep every value BIGINT-exact.
    Q("q_cohort",
      (s, dir) => {
        val uw = t(s, dir, "events")
          .select(col("user_id"),
            expr(s"(unix_micros(ts) - ${EpochJan2024Us}L) div 604800000000L").as("w"))
          .distinct()
        val ch = uw.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
        uw.join(ch, "user_id")
          .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("week_offset"))
          .agg(count(lit(1)).as("users"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(s"""WITH uw AS (SELECT DISTINCT user_id,
              |    (epoch_us(ts) - ${EpochJan2024Us}) // 604800000000 AS w
              |  FROM events),
              |ch AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
              |SELECT ch.cw AS cohort_week, uw.w - ch.cw AS week_offset,
              |  count(*) AS users
              |FROM uw JOIN ch USING (user_id)
              |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin)),

    // ── day-over-day deltas: the daily-report staple ──
    // Daily counts per type, then lag() along the day axis (window
    // partitioned by type — never a global window). First day's delta
    // is NULL, not zero: absence of a prior day is not a zero change.
    Q("q_dod_delta",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
        daily
          .withColumn("delta", col("cnt") - lag(col("cnt"), 1).over(w))
          .select(col("event_type"), col("day"), col("cnt"), col("delta"))
          .orderBy("event_type", "day")
      },
      Some("""WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |    event_type, count(*) AS cnt
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, day, cnt,
             |  cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS delta
             |FROM d ORDER BY event_type, day""".stripMargin)),

    // ── robust outlier detection: median absolute deviation per group ──
    // The robust-statistics alternative to z-scores (mean/stddev are
    // dragged by the outliers they're meant to find; median/MAD have a
    // 50% breakdown point). Three grouped passes: median, then the
    // deviation median, then the flag count — each a partial+final
    // aggregate over group-sized relations. Exactness: l_quantity is
    // integral, so the interpolated medians land on .5 grid points,
    // deviations on a .25 grid — every value is a short binary
    // fraction both engines represent exactly (the q_percentile
    // parity), and the 1.5·MAD threshold compare is exact. A .5-grid
    // never equals 1.5·(.25-grid) off-grid, so no boundary ulp case
    // exists. The 1.5 multiplier (vs the usual 3) is tuned to the
    // corpus: uniform quantities have thin tails, and 3·MAD would gate
    // out nothing — the mechanism, not the thresholds, is the operator.
    Q("q_outlier_mad",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val med = li.groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("med"))
        val mad = li.join(broadcast(med), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(min(col("med")).as("med"),
            expr("percentile(abs(l_quantity - med), 0.5)").as("mad"),
            count(lit(1)).as("n"))
        li.join(broadcast(mad), "l_returnflag")
          .withColumn("is_out",
            (abs(col("l_quantity") - col("med")) > col("mad") * 1.5).cast("long"))
          .groupBy(col("l_returnflag"))
          .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
            min(col("n")).as("n"), sum(col("is_out")).as("n_outliers"))
          .orderBy("l_returnflag")
      },
      Some("""WITH med AS (SELECT l_returnflag,
             |    quantile_cont(l_quantity, 0.5) AS med
             |  FROM lineitem GROUP BY l_returnflag),
             |mad AS (SELECT l.l_returnflag, min(m.med) AS med,
             |    quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
             |  GROUP BY l.l_returnflag)
             |SELECT d.l_returnflag, min(d.med) AS med, min(d.mad) AS mad,
             |  min(d.n) AS n,
             |  CAST(SUM(CASE WHEN abs(l.l_quantity - d.med) > d.mad * 1.5
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM mad d JOIN lineitem l ON l.l_returnflag = d.l_returnflag
             |GROUP BY d.l_returnflag
             |ORDER BY d.l_returnflag""".stripMargin)),

    // ── First-order Markov transition matrix over user event streams ──
    // Per user, events ordered by (ts, event_id — the unique
    // tiebreaker); every adjacent pair is one (src → dst) transition.
    // One window shuffle on user_id (the sessionize shape), one keyed
    // aggregate over the tiny (src, dst) domain, one window over src
    // for the row-normalizing denominator. p is a SINGLE division of
    // two exact longs — correctly rounded identically in any engine.
    // 100 TB: state is O(|event_type|²), never O(events); the only
    // big shuffle keys on user_id, which AQE splits if skewed.
    Q("q_markov",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .groupBy(col("event_type").as("src"), col("dst"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("denom", sum(col("cnt")).over(Window.partitionBy(col("src"))))
          .withColumn("p", col("cnt").cast("double") / col("denom").cast("double"))
          .orderBy("src", "dst")
      },
      Some("""WITH tr AS (
             |  SELECT event_type AS src,
             |    LEAD(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS dst
             |  FROM events),
             |c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
             |      FROM tr WHERE dst IS NOT NULL GROUP BY src, dst)
             |SELECT src, dst, cnt,
             |  CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT) AS denom,
             |  CAST(cnt AS DOUBLE) /
             |    CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS p
             |FROM c ORDER BY src, dst""".stripMargin)),

    // ── Exponentially-decayed trending score (half-life = 1 day) ──
    // weight(e) = 2^(29 − age_days) for events in the trailing 30
    // days of the corpus — powers of two via integer shiftleft, so
    // the score is an EXACT integer sum: no float decay drift, any
    // accumulation order. The weights accumulate DECIMAL(38,0)
    // (round-13 review): the all-long sum held only to ~2e9 trailing
    // events (2^63 / 2^29) and past that would die mid-aggregate
    // (ANSI ArithmeticException under the Spark 4 default; a silent
    // wrap with ANSI off), below the design point; decimal keeps the
    // sum exact to 10³⁸. The final BIGINT cast — the declared output
    // type, matching the oracle — still THROWS under ANSI on a score
    // too large for int64 (NULL with ANSI off): an overt failure at
    // the declared-type boundary, never a wrapped wrong number. The anchor date is a 1-row broadcast
    // (never a driver round-trip); the rest is one partial+final
    // aggregate over event_type.
    Q("q_decay_trend",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val anchor = ev.agg(max(to_date(col("ts"))).as("maxd"))
        ev.crossJoin(broadcast(anchor))
          .withColumn("age", datediff(col("maxd"), to_date(col("ts"))))
          .filter(col("age") < 30)
          .groupBy(col("event_type"))
          .agg(sum(expr(
              "CAST(shiftleft(1L, cast(29 - age as int)) AS DECIMAL(38,0))"))
              .cast("long").as("score"),
            count(lit(1)).as("cnt"))
          .orderBy("event_type")
      },
      Some("""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
             |a AS (
             |  SELECT event_type,
             |    datediff('day', CAST(ts AS DATE), maxd) AS age
             |  FROM events, mx
             |  WHERE datediff('day', CAST(ts AS DATE), maxd) < 30)
             |SELECT event_type,
             |  CAST(SUM(1::BIGINT << CAST(29 - age AS INTEGER)) AS BIGINT) AS score,
             |  CAST(COUNT(*) AS BIGINT) AS cnt
             |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── chi-square test of independence: event_type × weekend ──
    // The contingency table is exact integer counts (one keyed
    // aggregate over the raw events; row/column/grand totals are
    // window sums over the ≤|event_type|·2 CELLS, never the rows).
    // Weekend-ness is pure integer epoch arithmetic — (days since
    // epoch) mod 7 ∈ {2,3} ⇔ Sat/Sun (1970-01-01 was a Thursday) —
    // because dayofweek() numbering differs between engines. Each
    // cell's χ² contribution (o−e)²/e is algebraically rearranged to
    // (o·T − r·c)²/(r·c·T). The products run in DECIMAL(38,0) over
    // the ≤|event_type|·2 CELLS — free, and necessary (round-13
    // review): o and T are both corpus-sized counts, so the all-long
    // o·T overflows once the corpus passes ~3e9 events (√2^63) — far
    // below the 100 TB design point; under Spark 4's ANSI default
    // that is a query-killing ArithmeticException (a silent wrap
    // with ANSI off), while the DuckDB twin computes the same
    // product in HUGEINT. diff ≲ 1e22 and r·c·T ≲ 1e33 both
    // sit well inside 38 digits; the double evaluation
    // (diff·diff)/(r·c·T) is three IEEE-correctly-rounded ops with an
    // identical tree in both engines — bit-exact (decimal→double
    // rounds identically to long→double on the same integer).
    // Per-cell output, no cross-cell double sum (double addition
    // order is engine-defined; a consumer sums the ≤10 contributions
    // driver-side). */
    Q("q_chisq",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        val cell = t(s, dir, "events")
          .withColumn("is_weekend",
            expr("(unix_micros(ts) div 86400000000L) % 7 IN (2, 3)"))
          .groupBy(col("event_type"), col("is_weekend"))
          .agg(count(lit(1)).as("o"))
        cell
          .withColumn("r",
            sum(col("o")).over(Window.partitionBy(col("event_type"))))
          .withColumn("c",
            sum(col("o")).over(Window.partitionBy(col("is_weekend"))))
          .withColumn("tot", sum(col("o")).over(Window.partitionBy()))
          .withColumn("diff",
            dec(col("o")) * col("tot") - dec(col("r")) * col("c"))
          .withColumn("chi2_part",
            (col("diff").cast("double") * col("diff").cast("double")) /
              (dec(col("r")) * col("c") * col("tot")).cast("double"))
          .select("event_type", "is_weekend", "o", "r", "c", "chi2_part")
          .orderBy("event_type", "is_weekend")
      },
      Some("""WITH cell AS (
             |  SELECT event_type,
             |    (epoch_us(ts) // 86400000000) % 7 IN (2, 3) AS is_weekend,
             |    CAST(count(*) AS BIGINT) AS o
             |  FROM events GROUP BY 1, 2),
             |tt AS (SELECT event_type, is_weekend, o,
             |  CAST(SUM(o) OVER (PARTITION BY event_type) AS BIGINT) AS r,
             |  CAST(SUM(o) OVER (PARTITION BY is_weekend) AS BIGINT) AS c,
             |  CAST(SUM(o) OVER () AS BIGINT) AS tot FROM cell)
             |SELECT event_type, is_weekend, o, r, c,
             |  (CAST(CAST(CAST(o AS HUGEINT) * tot - CAST(r AS HUGEINT) * c
             |      AS VARCHAR) AS DOUBLE)
             |   * CAST(CAST(CAST(o AS HUGEINT) * tot - CAST(r AS HUGEINT) * c
             |       AS VARCHAR) AS DOUBLE))
             |    / CAST(CAST(CAST(r AS HUGEINT) * c * tot AS VARCHAR) AS DOUBLE)
             |    AS chi2_part
             |FROM tt ORDER BY event_type, is_weekend""".stripMargin)),

    // ── autocorrelation of the daily event-count series, lags 1..7 ──
    // r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)², cleared of the rational
    // mean μ=S/n by multiplying through by n². Moments and products
    // run in DECIMAL(38,0) over the ~30-row daily aggregate — free,
    // and needed at the design point (round-13 review): a 100 TB
    // month has x ≈ 3e9 events/day, so a single x·x term is ~9e18
    // (at the int64 edge) and the cleared products (n·S·2S, S²) pass
    // 10²² — the all-long form fails there (ANSI ArithmeticException
    // under the Spark 4 default; a silent wrap with ANSI off) while
    // the DuckDB oracle's HUGEINT moments stay exact; at tested SFs
    // the values are identical integers either way. r_k is ONE double division
    // of two exact integers. The daily series is one keyed aggregate;
    // the 7 lag pairings are joins over the ~30-row aggregate — cost
    // lives in the first aggregate, the lag algebra is free. A weekly
    // cycle in the synthetic data would surface as r_7 > r_1; the
    // oracle recomputes the identical moments, so agreement pins the
    // clearing algebra itself. */
    Q("q_acf",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(DecimalType(38, 0))
        val daily = t(s, dir, "events")
          .groupBy(expr(
            s"(unix_micros(ts) - ${EpochJan2024Us}L) div 86400000000L").as("d"))
          .agg(count(lit(1)).as("x"))
        val glob = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(dec(col("x")) * col("x")).as("sxx"))
        val ks = daily.sparkSession.range(1, 8).select(col("id").as("k"))
        daily.crossJoin(broadcast(ks)).alias("a")
          .join(broadcast(daily.select(col("d").as("d2"), col("x").as("x2"))),
            col("d2") === col("a.d") + col("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("m"), sum(dec(col("a.x")) * col("x2")).as("sxy"),
            sum(col("a.x")).as("head"), sum(col("x2")).as("tail"))
          .crossJoin(broadcast(glob))
          .select(col("k"), col("m"),
            ((dec(col("n")) * col("n") * col("sxy") -
              dec(col("n")) * col("s") * (col("head") + col("tail")) +
              dec(col("m")) * col("s") * col("s")).cast("double") /
              (dec(col("n")) * col("n") * col("sxx") -
                dec(col("n")) * col("s") * col("s")).cast("double")).as("acf"))
          .orderBy("k")
      },
      Some(s"""WITH daily AS (
              |  SELECT (epoch_us(ts) - ${EpochJan2024Us}) // 86400000000 AS d,
              |    CAST(count(*) AS BIGINT) AS x
              |  FROM events GROUP BY 1),
              |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |  CAST(SUM(x) AS BIGINT) AS s,
              |  SUM(CAST(x AS HUGEINT) * x) AS sxx FROM daily),
              |p AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
              |  SUM(CAST(a.x AS HUGEINT) * b.x) AS sxy,
              |  CAST(SUM(a.x) AS BIGINT) AS head,
              |  CAST(SUM(b.x) AS BIGINT) AS tail
              |  FROM daily a, generate_series(1, 7) t(k), daily b
              |  WHERE b.d = a.d + k GROUP BY k)
              |SELECT CAST(k AS BIGINT) AS k, m,
              |  CAST(CAST(CAST(n AS HUGEINT)*n*sxy - CAST(n AS HUGEINT)*s*(head + tail)
              |    + CAST(m AS HUGEINT)*s*s AS VARCHAR) AS DOUBLE)
              |    / CAST(CAST(CAST(n AS HUGEINT)*n*sxx - CAST(n AS HUGEINT)*s*s
              |        AS VARCHAR) AS DOUBLE) AS acf
              |FROM p, g ORDER BY k""".stripMargin)),

    // ── per-group z-score standardization (feature scaling) ──
    // The preprocessing step every numeric feature pipeline runs:
    // z = (x − μ_g)/σ_g per group, cleared of intermediate divisions:
    // z = (n·x − s1) / sqrt(n·s2 − s1²). Moments are EXACT — x in
    // fixed-point 1e-4 units (vfp ≤ 5.6e6 on this data), s1 int64,
    // s2 = Σvfp² in DECIMAL(38,0) (int64 would overflow at sf0.1's
    // per-group row counts) — then ONE cast each and one IEEE
    // division/sqrt, so every z hash-matches. 100 TB shape: the
    // moment table is one row per group (broadcast back); the scan
    // stays one pass + one map-side-combined aggregate.
    Q("q_standardize",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("vfp", expr("CAST(floor(value * 10000.0) AS BIGINT)"))
        val m = e.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum(col("vfp")).as("s1"),
          sum(expr("CAST(vfp AS DECIMAL(38,0)) * vfp")).as("s2"))
        e.join(broadcast(m), "event_type")
          .withColumn("z", expr(
            """CAST(n * vfp - s1 AS DOUBLE) /
              |sqrt(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE))"""
              .stripMargin))
          .select("event_id", "event_type", "value", "z")
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, event_type, value,
             |    CAST(floor(value * 10000.0) AS BIGINT) AS vfp FROM events),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(vfp) AS BIGINT) AS s1,
             |    SUM(CAST(vfp AS DECIMAL(38,0)) * vfp) AS s2
             |  FROM e GROUP BY event_type)
             |SELECT event_id, e.event_type, value,
             |  CAST(n * vfp - s1 AS DOUBLE) /
             |    sqrt(CAST(CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS VARCHAR) AS DOUBLE)) AS z
             |FROM e JOIN m USING (event_type)
             |ORDER BY event_id""".stripMargin)),

    // ── weekly seasonal decomposition of the daily event series ──
    // The classic-decomposition shape at day grain: daily counts, a
    // day-of-week seasonal mean (exact integer sum, ONE double
    // division), residual = observed − seasonal. Detrending is the
    // caller's composition (q_decay_trend carries the trend op); the
    // residual column is what an anomaly monitor thresholds. Scale:
    // the series is day-grain — aggregation collapses the corpus to
    // O(days) rows before any window/join, so the heavy stage is the
    // one map-side-combined count.
    Q("q_seasonal",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr(
            s"(unix_micros(ts) - ${EpochJan2024Us}L) div 86400000000L").as("d"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("dow", expr("d % 7"))
        val dm = daily.groupBy("dow").agg(
          (sum(col("cnt")).cast("double") / count(lit(1))).as("dow_mean"))
        daily.join(broadcast(dm), "dow")
          .withColumn("residual", col("cnt") - col("dow_mean"))
          .select("d", "dow", "cnt", "dow_mean", "residual")
          .orderBy("d")
      },
      Some(s"""WITH daily AS (
              |  SELECT (epoch_us(ts) - $EpochJan2024Us) // 86400000000 AS d,
              |    CAST(count(*) AS BIGINT) AS cnt
              |  FROM events GROUP BY 1),
              |dd AS (SELECT *, d % 7 AS dow FROM daily),
              |dm AS (SELECT dow, CAST(SUM(cnt) AS DOUBLE) / count(*) AS dow_mean
              |       FROM dd GROUP BY dow)
              |SELECT d, dd.dow, cnt, dow_mean, cnt - dow_mean AS residual
              |FROM dd JOIN dm USING (dow) ORDER BY d""".stripMargin)),

    // ── smoothed target encoding (per-user mean-target feature) ──
    // The categorical-encoding step a tabular model pipeline runs:
    // replace a high-cardinality key (user) with its smoothed mean
    // target, enc = (Σ_target_u + m·μ)/(n_u + m), m = 10 — shrinking
    // rare users toward the global mean so the feature doesn't
    // memorize. Division-cleared to ONE double divide over exact
    // fixed-point moments: enc = (N·s_u + m·S)/(N·(n_u + m)). The
    // cleared products run in DECIMAL(38,0) — one decimal multiply
    // per USER row, nothing on the event scan — because N and s_u
    // both grow with the corpus: the all-long N·s_u (~4e13 at sf0.1)
    // overflows by ~sf30 (ANSI ArithmeticException under the Spark 4
    // default; silent wrap with ANSI off) while the DuckDB twin's
    // HUGEINT stays exact (round-13 review; values identical at
    // tested SFs). 100 TB
    // shape: one keyed aggregate (map-side combined) + a broadcast
    // 1-row global; the encoding table is dictionary-sized, broadcast
    // back to the feature join in a real pipeline.
    Q("q_target_encode",
      (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("vfp", expr("CAST(floor(value * 10000.0) AS BIGINT)"))
        val g = e.agg(count(lit(1)).as("nn"), sum(col("vfp")).as("ss"))
        e.groupBy("user_id")
          .agg(count(lit(1)).as("n_u"), sum(col("vfp")).as("s_u"))
          .crossJoin(broadcast(g))
          .withColumn("enc", expr(
            """CAST(CAST(nn AS DECIMAL(38,0)) * s_u
              |     + CAST(10L AS DECIMAL(38,0)) * ss AS DOUBLE) /
              |CAST(CAST(nn AS DECIMAL(38,0)) * (n_u + 10L) AS DOUBLE)
              |/ 10000.0""".stripMargin))
          .select("user_id", "n_u", "enc")
          .orderBy("user_id")
      },
      Some("""WITH e AS (SELECT user_id,
             |    CAST(floor(value * 10000.0) AS BIGINT) AS vfp FROM events),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS nn,
             |    CAST(SUM(vfp) AS BIGINT) AS ss FROM e),
             |c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_u,
             |    CAST(SUM(vfp) AS BIGINT) AS s_u FROM e GROUP BY user_id)
             |SELECT user_id, n_u,
             |  CAST(CAST(CAST(nn AS HUGEINT) * s_u + CAST(10 AS HUGEINT) * ss
             |      AS VARCHAR) AS DOUBLE)
             |    / CAST(CAST(CAST(nn AS HUGEINT) * (n_u + 10) AS VARCHAR)
             |        AS DOUBLE) / 10000.0 AS enc
             |FROM c CROSS JOIN g ORDER BY user_id""".stripMargin)),

    // ── RFM segmentation (recency / frequency / monetary quintiles) ──
    // The classic customer-value segmentation: per customer, days
    // since last order (vs the corpus anchor 1998-08-01), order
    // count, and decimal-exact total spend, each cut into quintiles
    // with the unique custkey as the tie-break (the cut is
    // deterministic, so the segment string hash-matches).
    // Scale shape (round-17 window sweep): customers GROW with the
    // corpus, so the old unpartitioned ntile windows serialized
    // three dimension-sized sorts into one task each. Each quintile
    // now rides the GridRank decomposition — exact global row_number
    // from a domain-bounded bucket grid (recency: calendar days,
    // ≤ ~2.6e3; frequency: orders per customer, behavior-bounded;
    // monetary: $100 bands over the per-customer spend domain,
    // ≤ ~2.4e4 — all corpus-independent) — and the closed-form
    // ntileFromRowNumber, which GridRankSpec pins to Spark's ntile
    // semantics exactly. Hash-identical to the naive windows; the
    // DuckDB twin keeps naive ntile as the independent oracle.
    Q("q_rfm",
      (s, dir) => {
        val base = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(
            datediff(lit("1998-08-01"), max(col("o_orderdate")))
              .cast("bigint").as("recency_days"),
            count(lit(1)).as("frequency"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double")
              .as("monetary"))
        val gr = graft.engine.GridRank
        // localCheckpoint between levels (round-17 review): each
        // GridRank level consumes its input TWICE (bucket aggregate +
        // join side) and divergent column pruning defeats exchange
        // reuse, so the un-pinned nesting re-ran the orders groupBy
        // 16x (PlanAudit-counted). The checkpoints materialize only
        // the CUSTOMER-grain frame (the graph-loop idiom) — one fact
        // scan total, each level reading in-memory blocks.
        val ranked = gr.rowNumber(
          gr.rowNumber(
            gr.rowNumber(base.localCheckpoint(),
              col("recency_days"), bucketAsc = true,
              Seq(col("recency_days").asc, col("o_custkey").asc),
              "ri", "nr").localCheckpoint(),
            col("frequency"), bucketAsc = false,
            Seq(col("frequency").desc, col("o_custkey").asc), "fi", "nf")
            .localCheckpoint(),
          expr("cast(floor(monetary / 100.0) as bigint)"),
          bucketAsc = false,
          Seq(col("monetary").desc, col("o_custkey").asc), "mi", "nm")
        ranked
          .withColumn("r_bin",
            gr.ntileFromRowNumber(col("ri"), col("nr"), 5))
          .withColumn("f_bin",
            gr.ntileFromRowNumber(col("fi"), col("nf"), 5))
          .withColumn("m_bin",
            gr.ntileFromRowNumber(col("mi"), col("nm"), 5))
          .withColumn("segment",
            concat(col("r_bin"), lit("-"), col("f_bin"), lit("-"), col("m_bin")))
          .select("o_custkey", "recency_days", "frequency", "monetary",
            "r_bin", "f_bin", "m_bin", "segment")
          .orderBy("o_custkey")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey,
             |    CAST(DATE '1998-08-01' - CAST(MAX(o_orderdate) AS DATE)
             |         AS BIGINT) AS recency_days,
             |    CAST(count(*) AS BIGINT) AS frequency,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             |      AS monetary
             |  FROM orders GROUP BY o_custkey),
             |b AS (SELECT *,
             |    CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
             |         AS BIGINT) AS r_bin,
             |    CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
             |         AS BIGINT) AS f_bin,
             |    CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey ASC)
             |         AS BIGINT) AS m_bin
             |  FROM base)
             |SELECT o_custkey, recency_days, frequency, monetary,
             |  r_bin, f_bin, m_bin,
             |  r_bin || '-' || f_bin || '-' || m_bin AS segment
             |FROM b ORDER BY o_custkey""".stripMargin)),

    // ── hashing-trick featurization (per-user sparse vectors) ──
    // The feature-hashing step of a large-scale training pipeline:
    // categorical features (event type; coarse value bucket) hash into
    // a fixed 64-slot index space — no dictionary, no vocabulary
    // shuffle, collisions by design. The hash is the engine's shared
    // md5-prefix idiom (functions.TokenHash), identical in both
    // engines; output is the sparse (user, slot, count) triple list a
    // trainer consumes. 100 TB shape: explode is per-row (map-only),
    // the only shuffle is the (user, slot)-keyed count with map-side
    // combine; cardinality is bounded by users × 64.
    Q("q_feature_hash",
      (s, dir) => {
        t(s, dir, "events")
          .select(col("user_id"), explode(array(
            concat(lit("et="), col("event_type")),
            concat(lit("vb="),
              expr("CAST(CAST(floor(value / 100.0) AS BIGINT) AS STRING)"))))
            .as("f"))
          .withColumn("feat_idx",
            expr("CAST(conv(substr(md5(f), 1, 8), 16, 10) AS BIGINT) % 64"))
          .groupBy("user_id", "feat_idx").agg(count(lit(1)).as("cnt"))
          .orderBy("user_id", "feat_idx")
      },
      Some("""WITH f AS (
             |  SELECT user_id, 'et=' || event_type AS f FROM events
             |  UNION ALL
             |  SELECT user_id,
             |    'vb=' || CAST(CAST(floor(value / 100.0) AS BIGINT) AS VARCHAR)
             |  FROM events),
             |h AS (SELECT user_id,
             |    ('0x' || substr(md5(f), 1, 8))::BIGINT % 64 AS feat_idx FROM f)
             |SELECT user_id, feat_idx, CAST(count(*) AS BIGINT) AS cnt
             |FROM h GROUP BY user_id, feat_idx
             |ORDER BY user_id, feat_idx""".stripMargin))
  )
}
