package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables
import graft.functions.HashSample

/** Behavioral / time-to-event analytics: sequential-pattern support,
  * binary-segmentation changepoint, difference-in-differences uplift,
  * and a survival curve. Exact-arithmetic discipline throughout;
  * every candidate join is user- and time-banded (never a product),
  * every argmin carries a deterministic tie-break.
  */
object Behavior {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val Epoch = 1704067200000000L

  val queries: Seq[Q] = Seq(

    // ── sequential-pattern support: A then B within one hour ──
    // For every ordered type pair, how many occurrences and how many
    // distinct users show B following A within 3600 s. The candidate
    // join is per-user AND per-hour-bucket: any B in (usa, usa+1h]
    // lives in A's hour bucket h or h+1, so the A side explodes to
    // {h, h+1} and the equi key is (user, bucket) with the exact
    // time/tie predicate as residual. Each qualifying pair matches in
    // exactly one bucket (B's own), so no dedup is needed, and the
    // comparison count is Σ per-user-per-hour² — a bot with 1M events
    // spread over a month stays bounded instead of going quadratic on
    // a single user key. support = users-with-pattern / active users.
    Q("q_seqpat",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"), col("event_id"))
        val a = e.select(col("user_id").as("ua"), col("event_type").as("ta"),
            col("us").as("usa"), col("event_id").as("ea"))
          .withColumn("hba", explode(array(expr("usa div 3600000000L"),
            expr("usa div 3600000000L + 1L"))))
        val b = e.select(col("user_id").as("ub"), col("event_type").as("tb"),
            col("us").as("usb"), col("event_id").as("eb"))
          .withColumn("hbb", expr("usb div 3600000000L"))
        val users = e.agg(countDistinct(col("user_id")).as("n_users"))
        a.join(b, col("ua") === col("ub") && col("hba") === col("hbb") &&
            (col("usb") > col("usa") ||
              (col("usb") === col("usa") && col("eb") > col("ea"))) &&
            col("usb") <= col("usa") + 3600000000L)
          .groupBy(col("ta"), col("tb"))
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("ua")).as("users_with"))
          .crossJoin(broadcast(users))
          .select(col("ta"), col("tb"), col("pairs"), col("users_with"),
            (col("users_with").cast("double") / col("n_users").cast("double"))
              .as("support"))
          .orderBy("ta", "tb")
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
             |    event_id FROM events),
             |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM e),
             |p AS (SELECT a.event_type AS ta, b.event_type AS tb,
             |    a.user_id AS ua
             |  FROM e a JOIN e b ON a.user_id = b.user_id
             |    AND (b.us > a.us OR (b.us = a.us AND b.event_id > a.event_id))
             |    AND b.us <= a.us + 3600000000),
             |m AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS pairs,
             |  CAST(count(DISTINCT ua) AS BIGINT) AS users_with
             |  FROM p GROUP BY ta, tb)
             |SELECT ta, tb, pairs, users_with,
             |  CAST(users_with AS DOUBLE) / CAST(n_users AS DOUBLE) AS support
             |FROM m, u ORDER BY ta, tb""".stripMargin)),

    // ── per-session depth / revenue distribution ──
    // Session-grain engagement profile off the q_sessionize session
    // definition (30-min-gap, (ts, event_id)-ordered): sessions
    // bucket by depth (event count, 10+ collapsed into one bucket)
    // and each bucket reports its population, how many sessions
    // convert (revenue > 0), total and max revenue in exact cents
    // (floor(value·100) — identical IEEE multiply + floor in both
    // engines), and truncated mean cents per session (div BEFORE any
    // scaling — the q_gains overflow lesson: totals stay < 2^63 up to
    // ~10^16 dollars). Probed non-vacuous at all three SFs before
    // declaring (depths 1–4 populated, converting sessions and
    // revenue in every bucket; sf0.1: 91k/4k/194/11 sessions by
    // depth). Plan: the sessionizer's one user-keyed window shuffle,
    // a session-grain aggregate, then a ≤10-row histogram — the same
    // scale shape as q_sessionize itself.
    Q("q_session_dist",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = t(s, dir, "events")
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
              (expr("unix_micros(ts)") - expr("unix_micros(prev)") >
                1800L * 1000000L), 1L).otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("depth"),
            sum(when(col("event_type") === "purchase",
              floor(col("value") * 100).cast("long")).otherwise(0L))
              .as("rev"))
        sess
          .groupBy(least(col("depth"), lit(10L)).as("depth_bucket"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("rev") > 0, 1L).otherwise(0L)).as("n_converting"),
            sum(col("rev")).as("rev_cents"),
            max(col("rev")).as("max_rev_cents"))
          .withColumn("mean_rev_cents",
            expr("rev_cents div n_sessions"))
          .orderBy("depth_bucket")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts, event_type, value,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS prev FROM events),
             |y AS (SELECT *, CASE WHEN prev IS NULL
             |    OR epoch_us(ts) - epoch_us(prev) > 1800000000
             |  THEN 1 ELSE 0 END AS new_s FROM x),
             |z AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM y),
             |s AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS depth,
             |    CAST(SUM(CASE WHEN event_type = 'purchase'
             |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS rev
             |  FROM z GROUP BY 1, 2)
             |SELECT LEAST(depth, 10) AS depth_bucket,
             |  CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(SUM(CASE WHEN rev > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_converting,
             |  CAST(SUM(rev) AS BIGINT) AS rev_cents,
             |  CAST(MAX(rev) AS BIGINT) AS max_rev_cents,
             |  CAST(SUM(rev) AS BIGINT) // count(*) AS mean_rev_cents
             |FROM s GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── binary-segmentation changepoint on the daily series ──
    // The best single split minimizes SSE_left + SSE_right; cleared
    // form: maximize g(k) = S_L²/k + S_R²/(n−k) over prefix sums —
    // exact int64 inputs, double g (identical expression both
    // engines), argmin by (cost, k) rank with deterministic
    // tie-break. Emits the split day, the two segment means, and the
    // variance-reduction ratio 1 − SSE(k*)/SST. All on the ≤31-row
    // daily aggregate; candidates are the 29 interior splits.
    // qt = Σx² runs DECIMAL(38,0) on the ≤31-row aggregate (round-14
    // headroom audit — the q_acf series): a 100 TB month has
    // x ≈ 3e9 events/day, so one x·x term is ~9e18, AT the int64
    // edge, and the 30-day sum passes it — an ANSI
    // ArithmeticException under the Spark 4 default (silent wrap
    // with ANSI off) while the DuckDB twin widens PER-TERM via
    // CAST(x AS HUGEINT) * x (r15 ADVICE: a bare SUM(x*x) widened
    // only the accumulator and left the per-term BIGINT multiply at
    // the same 9e18 edge — the Stats2/Stats3 syy idiom). qt is
    // consumed as double only, and decimal→double rounds identically
    // to long→double on the same integer, so tested-SF hashes pin.
    Q("q_changepoint",
      (s, dir) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
        val daily = t(s, dir, "events")
          .groupBy(expr(s"(unix_micros(ts) - ${Epoch}L) div 86400000000L").as("d"))
          .agg(count(lit(1)).as("x"))
        val cum = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.partitionBy()
        val pre = daily
          .withColumn("k", row_number().over(Window.orderBy("d")).cast("long"))
          .withColumn("sl", sum(col("x")).over(cum))
          .withColumn("n", count(lit(1)).over(all))
          .withColumn("st", sum(col("x")).over(all))
          .withColumn("qt", sum(dec(col("x")) * col("x")).over(all))
          .filter(col("k") < col("n"))
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        val sse = d(col("qt")) -
          d(col("sl")) * d(col("sl")) / d(col("k")) -
          d(col("st") - col("sl")) * d(col("st") - col("sl")) /
            d(col("n") - col("k"))
        val ranked = pre.withColumn("sse", sse)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("sse"), col("k"))))
          .filter(col("rn") === 1)
        ranked.select(col("d").as("split_day"), col("k"),
          (d(col("sl")) / d(col("k"))).as("mean_left"),
          (d(col("st") - col("sl")) / d(col("n") - col("k"))).as("mean_right"),
          (lit(1.0) - col("sse") /
            (d(col("qt")) - d(col("st")) * d(col("st")) / d(col("n"))))
            .as("var_reduction"))
      },
      Some(s"""WITH daily AS (
              |  SELECT (epoch_us(ts) - $Epoch) // 86400000000 AS d,
              |    CAST(count(*) AS BIGINT) AS x
              |  FROM events GROUP BY 1),
              |pre AS (SELECT d, x,
              |  CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS k,
              |  CAST(SUM(x) OVER (ORDER BY d
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sl,
              |  CAST(count(*) OVER () AS BIGINT) AS n,
              |  CAST(SUM(x) OVER () AS BIGINT) AS st,
              |  SUM(CAST(x AS HUGEINT) * x) OVER () AS qt
              |  FROM daily),
              |c AS (SELECT d, k, sl, n, st, qt,
              |  CAST(qt AS DOUBLE)
              |    - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(k AS DOUBLE)
              |    - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
              |      / CAST(n - k AS DOUBLE) AS sse
              |  FROM pre WHERE k < n),
              |r AS (SELECT *, row_number() OVER (ORDER BY sse, k) AS rn FROM c)
              |SELECT d AS split_day, k,
              |  CAST(sl AS DOUBLE) / CAST(k AS DOUBLE) AS mean_left,
              |  CAST(st - sl AS DOUBLE) / CAST(n - k AS DOUBLE) AS mean_right,
              |  1.0 - sse / (CAST(qt AS DOUBLE)
              |    - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
              |    AS var_reduction
              |FROM r WHERE rn = 1""".stripMargin)),

    // ── difference-in-differences uplift ──
    // Hash-split arms × month halves: DID = (p_A2 − p_A1) − (p_B2 −
    // p_B1) on per-user-period conversion rates — the causal-inference
    // staple for "did the change move the metric beyond the trend".
    // One user-grain aggregate (arm is a deterministic md5 bucket, the
    // q_ab_test idiom), then a 4-cell conditional rollup; every rate
    // and the DID are division chains over exact counts.
    Q("q_uplift",
      (s, dir) => {
        val u = t(s, dir, "events")
          .withColumn("h2",
            expr(s"(unix_micros(ts) - ${Epoch}L) div 86400000000L") >= 15)
          .groupBy(col("user_id"), col("h2"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
          .withColumn("isa", expr(HashSample.spark("user_id", 2)))
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        val cell = (arm: Boolean, half: Boolean) =>
          sum(when(col("isa") === arm && col("h2") === half, col("conv"))
            .otherwise(0L))
        val cnt = (arm: Boolean, half: Boolean) =>
          sum(when(col("isa") === arm && col("h2") === half, 1L).otherwise(0L))
        u.agg(cnt(true, false).as("na1"), cell(true, false).as("ca1"),
            cnt(true, true).as("na2"), cell(true, true).as("ca2"),
            cnt(false, false).as("nb1"), cell(false, false).as("cb1"),
            cnt(false, true).as("nb2"), cell(false, true).as("cb2"))
          .select(col("na1"), col("na2"), col("nb1"), col("nb2"),
            ((d(col("ca2")) / d(col("na2")) - d(col("ca1")) / d(col("na1"))) -
              (d(col("cb2")) / d(col("nb2")) - d(col("cb1")) / d(col("nb1"))))
              .as("did"))
      },
      Some(s"""WITH u AS (SELECT user_id,
              |    (epoch_us(ts) - $Epoch) // 86400000000 >= 15 AS h2,
              |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              |      AS BIGINT) AS conv
              |  FROM events GROUP BY 1, 2),
              |a AS (SELECT *, ${HashSample.duck("user_id", 2)} AS isa FROM u),
              |m AS (SELECT
              |  CAST(SUM(CASE WHEN isa AND NOT h2 THEN 1 ELSE 0 END) AS BIGINT) AS na1,
              |  CAST(SUM(CASE WHEN isa AND NOT h2 THEN conv ELSE 0 END) AS BIGINT) AS ca1,
              |  CAST(SUM(CASE WHEN isa AND h2 THEN 1 ELSE 0 END) AS BIGINT) AS na2,
              |  CAST(SUM(CASE WHEN isa AND h2 THEN conv ELSE 0 END) AS BIGINT) AS ca2,
              |  CAST(SUM(CASE WHEN NOT isa AND NOT h2 THEN 1 ELSE 0 END) AS BIGINT) AS nb1,
              |  CAST(SUM(CASE WHEN NOT isa AND NOT h2 THEN conv ELSE 0 END) AS BIGINT) AS cb1,
              |  CAST(SUM(CASE WHEN NOT isa AND h2 THEN 1 ELSE 0 END) AS BIGINT) AS nb2,
              |  CAST(SUM(CASE WHEN NOT isa AND h2 THEN conv ELSE 0 END) AS BIGINT) AS cb2
              |  FROM a)
              |SELECT na1, na2, nb1, nb2,
              |  (CAST(ca2 AS DOUBLE) / CAST(na2 AS DOUBLE)
              |    - CAST(ca1 AS DOUBLE) / CAST(na1 AS DOUBLE))
              |  - (CAST(cb2 AS DOUBLE) / CAST(nb2 AS DOUBLE)
              |    - CAST(cb1 AS DOUBLE) / CAST(nb1 AS DOUBLE)) AS did
              |FROM m""".stripMargin)),

    // ── survival curve: signup → first purchase ──
    // Kaplan–Meier in the uncensored-within-horizon regime: for each
    // user with a signup, the day-gap to the first LATER purchase;
    // S(day) = 1 − converted_by_day/n_signup, emitted at each
    // observed conversion day. Two user-grain aggregates (signup
    // time, then the conditional min purchase) and a ≤31-row
    // cumulative — no windows over raw events. Users who never
    // convert inside the month hold the curve's floor (documented:
    // administrative censoring at the horizon).
    Q("q_survival",
      (s, dir) => {
        val su = t(s, dir, "events")
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(expr("unix_micros(ts)")).as("su"))
        val pu = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(col("user_id").as("up"), expr("unix_micros(ts)").as("pu"))
        val gaps = su.join(pu, col("user_id") === col("up") &&
            col("pu") >= col("su"), "left")
          .groupBy(col("user_id"), col("su"))
          .agg(min(col("pu")).as("first_pu"))
          .select(when(col("first_pu").isNotNull,
            expr("(first_pu - su) div 86400000000L")).as("day"))
          // pinned: the daily rollup AND the cohort-size aggregate
          // both consume gaps — one pass over the two event
          // aggregates, user-grain materialization (round-17 review)
          .localCheckpoint()
        // The cohort size n is a 1-row aggregate broadcast back, NOT
        // an empty-partition window over the USER-grain gaps table
        // (round-17 sweep of the Window.partitionBy() sibling class:
        // an unpartitioned window funnels every signup through ONE
        // WindowExec task at corpus scale; the aggregate reduces
        // map-side). Same value, same hash.
        gaps
          .filter(col("day").isNotNull)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("conv"))
          .crossJoin(broadcast(gaps.agg(count(lit(1)).as("n"))))
          .withColumn("cum", sum(col("conv")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("day"), col("conv"),
            ((col("n") - col("cum")).cast("double") / col("n").cast("double"))
              .as("survival"))
          .orderBy("day")
      },
      Some("""WITH su AS (SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS su
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |g AS (SELECT su.user_id,
             |  CAST(MIN(CASE WHEN e.event_type = 'purchase'
             |    AND epoch_us(e.ts) >= su.su THEN epoch_us(e.ts) END) AS BIGINT)
             |    AS first_pu, su.su
             |  FROM su LEFT JOIN events e ON e.user_id = su.user_id
             |  GROUP BY su.user_id, su.su),
             |gaps AS (SELECT CASE WHEN first_pu IS NOT NULL
             |    THEN (first_pu - su) // 86400000000 END AS day FROM g),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM gaps),
             |c AS (SELECT day, CAST(count(*) AS BIGINT) AS conv
             |  FROM gaps WHERE day IS NOT NULL GROUP BY day),
             |cum AS (SELECT day, conv,
             |  CAST(SUM(conv) OVER (ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum FROM c)
             |SELECT day, conv,
             |  CAST(n - cum AS DOUBLE) / CAST(n AS DOUBLE) AS survival
             |FROM cum, n ORDER BY day""".stripMargin)),

    // ── Wald–Wolfowitz runs test on the daily delta signs ──
    // Randomness check for the count series: R runs of +/− deltas
    // (zeros dropped, counted separately), z = (R − μ)/σ with μ =
    // 2n₁n₂/(n₁+n₂) + 1 and σ² = (μ−1)(μ−2)/(n₁+n₂−1) — exact integer
    // counts from the ≤31-row daily lag, one fixed double expression.
    // |z| ≫ 2 means trending/oscillation (too few/many runs) — the
    // cheap "is this series i.i.d." gate before heavier models.
    Q("q_runs_test",
      (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr(s"(unix_micros(ts) - ${Epoch}L) div 86400000000L").as("d"))
          .agg(count(lit(1)).as("x"))
        val ord = Window.orderBy("d")
        val signs = daily
          .withColumn("delta", col("x") - lag(col("x"), 1).over(ord))
          .filter(col("delta").isNotNull && col("delta") =!= 0)
          .withColumn("sgn", when(col("delta") > 0, 1L).otherwise(-1L))
        val d = (c: org.apache.spark.sql.Column) => c.cast("double")
        val withPrev = signs
          .withColumn("chg",
            when(lag(col("sgn"), 1).over(Window.orderBy("d")).isNull ||
              lag(col("sgn"), 1).over(Window.orderBy("d")) =!= col("sgn"), 1L)
              .otherwise(0L))
        val mu = lit(2.0) * d(col("n1")) * d(col("n2")) /
          (d(col("n1")) + d(col("n2"))) + lit(1.0)
        withPrev.agg(
            sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n2"),
            sum(col("chg")).as("r"))
          .select(col("n1"), col("n2"), col("r"),
            ((d(col("r")) - mu) /
              sqrt((mu - lit(1.0)) * (mu - lit(2.0)) /
                (d(col("n1")) + d(col("n2")) - lit(1.0)))).as("z"))
      },
      Some(s"""WITH daily AS (
              |  SELECT (epoch_us(ts) - $Epoch) // 86400000000 AS d,
              |    CAST(count(*) AS BIGINT) AS x
              |  FROM events GROUP BY 1),
              |sg AS (SELECT d,
              |  CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
              |  FROM (SELECT d, x - lag(x, 1) OVER (ORDER BY d) AS delta
              |        FROM daily)
              |  WHERE delta IS NOT NULL AND delta <> 0),
              |ch AS (SELECT sgn,
              |  CASE WHEN lag(sgn, 1) OVER (ORDER BY d) IS NULL
              |    OR lag(sgn, 1) OVER (ORDER BY d) <> sgn THEN 1 ELSE 0 END AS chg
              |  FROM sg),
              |m AS (SELECT
              |  CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |  CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
              |  CAST(SUM(chg) AS BIGINT) AS r FROM ch)
              |SELECT n1, n2, r,
              |  (CAST(r AS DOUBLE)
              |    - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
              |  / sqrt(((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) - 1.0)
              |      * ((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              |        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0) - 2.0)
              |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)) AS z
              |FROM m""".stripMargin)),

    // ── cohort LTV triangle (quarterly) ──
    // Customers cohorted by first-order quarter; for each (cohort,
    // tenure) cell, the cohort's cumulative revenue per member — the
    // growth-analytics LTV curve, exact cents cumulated per cohort
    // (partitioned window over the ≤27×27 triangle), one division
    // per cell. Two keyed aggregates (customer first-quarter, then
    // the cell rollup); the triangle is bounded at any scale.
    Q("q_cohort_ltv",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_custkey"),
            (expr("(year(o_orderdate) - 1995) * 4 + quarter(o_orderdate) - 1"))
              .cast("long").as("qi"),
            floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
        val first = o.groupBy("o_custkey").agg(min(col("qi")).as("cohort"))
        val sizes = first.groupBy("cohort")
          .agg(count(lit(1)).as("cohort_size"))
        val cells = o.join(first, "o_custkey")
          .groupBy(col("cohort"), (col("qi") - col("cohort")).as("tenure"))
          .agg(sum(col("cents")).as("rev"))
        val cum = Window.partitionBy("cohort").orderBy("tenure")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells
          .withColumn("cum_rev", sum(col("rev")).over(cum))
          .join(broadcast(sizes), "cohort")
          .select(col("cohort"), col("tenure"), col("cohort_size"),
            (col("cum_rev").cast("double") /
              col("cohort_size").cast("double") / lit(100.0)).as("ltv"))
          .orderBy("cohort", "tenure")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |    CAST((year(o_orderdate) - 1995) * 4 + quarter(o_orderdate) - 1
             |      AS BIGINT) AS qi,
             |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
             |  FROM orders),
             |f AS (SELECT o_custkey, CAST(MIN(qi) AS BIGINT) AS cohort
             |  FROM o GROUP BY o_custkey),
             |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size
             |  FROM f GROUP BY cohort),
             |cells AS (SELECT cohort, qi - cohort AS tenure,
             |  CAST(SUM(cents) AS BIGINT) AS rev
             |  FROM o JOIN f USING (o_custkey) GROUP BY cohort, qi - cohort),
             |c AS (SELECT cohort, tenure,
             |  CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY tenure
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_rev FROM cells)
             |SELECT cohort, tenure, cohort_size,
             |  CAST(cum_rev AS DOUBLE) / CAST(cohort_size AS DOUBLE) / 100.0
             |    AS ltv
             |FROM c JOIN sz USING (cohort) ORDER BY cohort, tenure""".stripMargin)),

    // ── funnel inter-stage latency (q_funnel's "how fast", not "how many") ──
    // For users converting through view→click→purchase (q_funnel's
    // strictly-ordered first-time chain), the per-transition latency
    // profile: count, EXACT lower-median (rank-picked under the
    // (latency, user_id) total order — no sketch), and truncated mean
    // in micro-units. Two stage joins on user_id (the funnel shape),
    // then per-transition GridRank medians over user-grain rows (the
    // calendar-bounded latency grid — see profile()). The two
    // branches union as one declared plan; every latency is an exact
    // int64 difference of event-time micros.
    Q("q_funnel_time",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"),
            min(col("t_view")).as("t_view"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c.select(col("user_id"), col("t_click")), "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"),
            min(col("t_click")).as("t_click"))
        def profile(df: DataFrame, from: String, to: String,
            name: String): DataFrame = {
          val lat = df.select(col("user_id"),
            (expr(s"unix_micros($to)") - expr(s"unix_micros($from)"))
              .as("lat"))
          // Exact lower-median via the GridRank decomposition
          // (round-17 window sweep — converters GROW with the
          // corpus, so the old unpartitioned rank window serialized
          // a user-grain sort into one task). Bucket = lat div 10⁹
          // (1000 s bands): a latency is bounded by the CALENDAR
          // horizon (~2.6e12 µs for the month — corpus-independent),
          // so the bucket table stays ≤ ~2.6e3 rows per transition
          // at any scale. Hash-identical rank under the strict
          // (lat, user_id) order; the twin keeps the naive
          // rank-picked form as the independent oracle.
          // deliberately NOT checkpointed: lat is converter-grain
          // (event-joined, corpus-scaled) — two scans beat a corpus
          // materialization (the q_gains trade, round-17 review)
          val med = graft.engine.GridRank.rowNumber(lat,
              expr("lat div 1000000000"), bucketAsc = true,
              Seq(col("lat").asc, col("user_id").asc), "rn", "nn")
            // Column./ is DOUBLE division even on longs — integer div
            .filter(col("rn") === expr("(nn + 1) div 2"))
            .select(col("lat").as("median_us"))
          // LEFT join (not cross): a transition with zero converters
          // must still emit its row (NULL median/mean), matching the
          // oracle's always-two-row UNION ALL of scalar subqueries.
          // Σlat accumulates DECIMAL(38,0) (round-14 headroom audit):
          // a latency is bounded by the horizon (~2.6e12 µs for the
          // month), so ~1e9 converting users × an hours-scale mean
          // already brushes 2^63 — ANSI ArithmeticException under the
          // Spark 4 default — while the DuckDB twin sums in HUGEINT.
          // The decimal rides the USER-grain rows (one per converter),
          // never the event scan; `div` (IntegralDivide) returns
          // BIGINT for decimal inputs, so the output schema is
          // unchanged and the truncated mean is exact.
          lat.agg(count(lit(1)).as("n_users"),
              expr("sum(cast(lat as decimal(38,0))) div count(1)")
                .as("mean_us"))
            .join(broadcast(med), lit(true), "left")
            .select(lit(name).as("transition"), col("n_users"),
              col("median_us"), col("mean_us"))
        }
        profile(c, "t_view", "t_click", "1_view_to_click")
          .unionByName(
            profile(p, "t_click", "t_purchase", "2_click_to_purchase"))
          .orderBy("transition")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |       WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click,
             |      min(v.t_view) AS t_view FROM events e
             |      JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase,
             |      min(c.t_click) AS t_click FROM events e
             |      JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |      GROUP BY e.user_id),
             |l1 AS (SELECT user_id,
             |      epoch_us(t_click) - epoch_us(t_view) AS lat FROM c),
             |l2 AS (SELECT user_id,
             |      epoch_us(t_purchase) - epoch_us(t_click) AS lat FROM p),
             |m1 AS (SELECT lat AS median_us FROM (
             |      SELECT lat, CAST(row_number() OVER (ORDER BY lat, user_id)
             |        AS BIGINT) AS rn, CAST(count(*) OVER () AS BIGINT) AS nn
             |      FROM l1) WHERE rn = (nn + 1) // 2),
             |m2 AS (SELECT lat AS median_us FROM (
             |      SELECT lat, CAST(row_number() OVER (ORDER BY lat, user_id)
             |        AS BIGINT) AS rn, CAST(count(*) OVER () AS BIGINT) AS nn
             |      FROM l2) WHERE rn = (nn + 1) // 2)
             |SELECT '1_view_to_click' AS transition,
             |  (SELECT CAST(count(*) AS BIGINT) FROM l1) AS n_users,
             |  (SELECT median_us FROM m1) AS median_us,
             |  (SELECT CASE WHEN count(*) = 0 THEN NULL
             |     ELSE CAST(SUM(lat) AS BIGINT) // count(*) END FROM l1)
             |    AS mean_us
             |UNION ALL
             |SELECT '2_click_to_purchase',
             |  (SELECT CAST(count(*) AS BIGINT) FROM l2),
             |  (SELECT median_us FROM m2),
             |  (SELECT CASE WHEN count(*) = 0 THEN NULL
             |     ELSE CAST(SUM(lat) AS BIGINT) // count(*) END FROM l2)
             |ORDER BY transition""".stripMargin)))
}
