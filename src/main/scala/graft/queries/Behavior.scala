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
    // join is per-user time-banded (equi-join on user + band residual
    // — the q_attribution shape: hash-partitioned, activity-bounded,
    // no product); support = users-with-pattern / active users. The
    // sequence-mining primitive behind "what do users do next".
    Q("q_seqpat",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"), col("event_id"))
        val a = e.select(col("user_id").as("ua"), col("event_type").as("ta"),
          col("us").as("usa"), col("event_id").as("ea"))
        val b = e.select(col("user_id").as("ub"), col("event_type").as("tb"),
          col("us").as("usb"), col("event_id").as("eb"))
        val users = e.agg(countDistinct(col("user_id")).as("n_users"))
        a.join(b, col("ua") === col("ub") &&
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

    // ── binary-segmentation changepoint on the daily series ──
    // The best single split minimizes SSE_left + SSE_right; cleared
    // form: maximize g(k) = S_L²/k + S_R²/(n−k) over prefix sums —
    // exact int64 inputs, double g (identical expression both
    // engines), argmin by (cost, k) rank with deterministic
    // tie-break. Emits the split day, the two segment means, and the
    // variance-reduction ratio 1 − SSE(k*)/SST. All on the ≤31-row
    // daily aggregate; candidates are the 29 interior splits.
    Q("q_changepoint",
      (s, dir) => {
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
          .withColumn("qt", sum(col("x") * col("x")).over(all))
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
              |  CAST(SUM(x * x) OVER () AS BIGINT) AS qt
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
        val all = Window.partitionBy()
        gaps
          .withColumn("n", count(lit(1)).over(all))
          .filter(col("day").isNotNull)
          .groupBy(col("day"), col("n"))
          .agg(count(lit(1)).as("conv"))
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
             |FROM cum, n ORDER BY day""".stripMargin)))
}
