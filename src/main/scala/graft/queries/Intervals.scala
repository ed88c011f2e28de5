package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** Interval / sweep-line analytics plus two relational classics the
  * inventory still lacked: merge-overlapping-intervals (gaps &
  * islands), peak concurrency (the +1/−1 sweep), an exact weighted
  * median, linear multi-touch attribution (the q_attribution
  * last-touch model's even-credit sibling), and an UNPIVOT/melt
  * reshape (the inverse of q_pivot).
  *
  * Scale shapes: every operator here is one shuffle on its natural
  * key (supplier / nation / returnflag / user) followed by
  * within-partition window walks — no products, no driver loops. The
  * sweep-line trick turns interval overlap (quadratic naively) into
  * sort + prefix-sum, the same reformulation a 1000-executor plan
  * needs: per-key event lists sort inside their partition and the
  * cumulative state never crosses keys. Reference analog: the
  * MapleJuice sort-shuffle + per-key juice walk
  * (/root/reference/src/main/java/MapleJuice.java maple/juice
  * barrier), re-expressed as Catalyst window frames.
  *
  * Exactness: all interval arithmetic is integer day-grain
  * (unix_micros div 86400000000); credits are micro-unit fixed point
  * with truncating div and remainder-to-first so per-purchase credit
  * sums are EXACTLY 10^6 (no double drift between engines).
  */
object Intervals {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val DayUs = 86400000000L

  /** Merge overlapping/adjacent integer intervals `(k, st, en)` per
    * key into maximal islands; returns per-key island count, total
    * covered units, and the longest gap between islands. The
    * cumulative-break form: island starts where st exceeds the
    * running max end + 1. Package-visible so IntervalsSpec drives it
    * with hand-built inputs against scalar expectations. */
  private[queries] def mergeIslands(iv: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("k").orderBy("st", "en")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("k").orderBy("st", "en")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isl = iv
      .withColumn("pmax", max(col("en")).over(wPrev))
      .withColumn("brk",
        when(col("pmax").isNull || col("st") > col("pmax") + 1L, 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(wCum))
      .groupBy(col("k"), col("isl"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
    val wIsl = Window.partitionBy("k").orderBy("isl")
    isl
      .withColumn("gap", col("ist") - lag(col("ien"), 1).over(wIsl) - 1L)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist") + 1L).as("covered_days"),
        coalesce(max(col("gap")), lit(0L)).as("longest_gap"))
  }

  /** +1/−1 sweep: from per-key dated deltas `(nk, d, delta)`, the max
    * concurrent count and the FIRST day it is reached (argmax with
    * earliest-day tie-break). Package-visible for IntervalsSpec. */
  private[queries] def sweepPeak(ev: DataFrame): DataFrame = {
    val wCum = Window.partitionBy("nk").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.groupBy("nk", "d")
      .agg(sum(col("delta")).as("nd"))
      .withColumn("open", sum(col("nd")).over(wCum))
      .withColumn("rn", row_number().over(
        Window.partitionBy("nk").orderBy(col("open").desc, col("d"))))
      .filter(col("rn") === 1)
      .select(col("nk"), col("open").as("peak_open"), col("d").as("peak_day"))
  }

  val queries: Seq[Q] = Seq(

    // ── merge overlapping intervals (gaps & islands) ──
    // Each shipment covers [ship_day, ship_day+6] (a 7-day coverage
    // TTL — the uptime-monitor / heartbeat semantics); per supplier,
    // merge overlapping covers into maximal islands and report island
    // count, total covered days, and the longest dark gap. Non-vacuous
    // at every SF (sf0.01: 84–117 islands per supplier, probed). The
    // island id is the classic cumulative-break trick: a row starts a
    // new island iff its start exceeds the running max end of all
    // earlier intervals + 1; island id = prefix sum of break flags.
    // One shuffle on l_suppkey; both windows share that partitioning
    // (one sort, Catalyst reuses the exchange).
    Q("q_interval_merge",
      (s, dir) => {
        val iv = t(s, dir, "lineitem")
          .select(col("l_suppkey").as("k"),
            // NTZ → timestamp is the identity wall-clock under the
            // session's pinned UTC (the Tables.scala events recipe)
            expr(s"unix_micros(cast(l_shipdate as timestamp)) div ${DayUs}L")
              .as("st"))
          .distinct()
          .withColumn("en", col("st") + 6L)
        mergeIslands(iv).orderBy("k")
      },
      Some(s"""WITH iv AS (
              |  SELECT DISTINCT l_suppkey AS k,
              |    epoch_us(l_shipdate) // $DayUs AS st,
              |    epoch_us(l_shipdate) // $DayUs + 6 AS en
              |  FROM lineitem),
              |m AS (SELECT k, st, en,
              |    max(en) OVER (PARTITION BY k ORDER BY st
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
              |  FROM iv),
              |f AS (SELECT k, st, en,
              |    CASE WHEN pmax IS NULL OR st > pmax + 1 THEN 1 ELSE 0 END AS brk
              |  FROM m),
              |g AS (SELECT k, st, en,
              |    SUM(brk) OVER (PARTITION BY k ORDER BY st
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
              |  FROM f),
              |i AS (SELECT k, isl, min(st) AS ist, max(en) AS ien
              |      FROM g GROUP BY k, isl),
              |gp AS (SELECT k, isl, ist, ien,
              |    ist - lag(ien) OVER (PARTITION BY k ORDER BY isl) - 1 AS gap
              |  FROM i)
              |SELECT k, CAST(count(*) AS BIGINT) AS n_islands,
              |  CAST(SUM(ien - ist + 1) AS BIGINT) AS covered_days,
              |  CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS longest_gap
              |FROM gp GROUP BY k ORDER BY k""".stripMargin)),

    // ── peak concurrency (+1/−1 sweep-line) ──
    // Max simultaneously-active 7-day shipment covers per supplier
    // nation, with the first day the peak is reached. Each shipment
    // contributes (+1 at ship_day, −1 at ship_day+7); daily net deltas
    // aggregate FIRST (map-side combinable — the sweep's state is a
    // prefix sum over ≤ a few thousand distinct days per nation, not
    // per-shipment rows), then one cumulative window per nation and an
    // argmax with a deterministic earliest-day tie-break. The peak-
    // concurrent-sessions / max-overlap operator.
    Q("q_peak_concurrency",
      (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_nationkey").as("nk"),
            expr(s"unix_micros(cast(l_shipdate as timestamp)) div ${DayUs}L")
              .as("sd"))
        val ev = d.select(col("nk"), col("sd").as("d"), lit(1L).as("delta"))
          .unionByName(
            d.select(col("nk"), (col("sd") + 7L).as("d"),
              lit(-1L).as("delta")))
        sweepPeak(ev).orderBy("nk")
      },
      Some(s"""WITH d AS (
              |  SELECT s_nationkey AS nk,
              |    epoch_us(l_shipdate) // $DayUs AS sd
              |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
              |ev AS (SELECT nk, sd AS d, 1 AS delta FROM d
              |       UNION ALL SELECT nk, sd + 7, -1 FROM d),
              |cum AS (SELECT nk, d, SUM(SUM(delta)) OVER (
              |    PARTITION BY nk ORDER BY d) AS open
              |  FROM ev GROUP BY nk, d),
              |r AS (SELECT nk, open, d,
              |    row_number() OVER (PARTITION BY nk
              |      ORDER BY open DESC, d) AS rn
              |  FROM cum)
              |SELECT nk, CAST(open AS BIGINT) AS peak_open, d AS peak_day
              |FROM r WHERE rn = 1 ORDER BY nk""".stripMargin)),

    // ── exact weighted median ──
    // Quantity-weighted median of l_extendedprice per returnflag: sort
    // by price under a TOTAL order (price, orderkey, linenumber), walk
    // cumulative weight, take the first row where 2·cumw ≥ total. All
    // weight arithmetic is int64 (quantities are integral — probed);
    // the price itself passes through untouched (no double math to
    // drift). One shuffle on the group key; the within-group sort is
    // the same single sort a percentile needs — at 100 TB a skewed
    // group would go through the q_percentile .25-grid route, but the
    // crossing-point walk itself is one window pass either way.
    Q("q_weighted_median",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("price"),
            col("l_quantity").cast("long").as("w"),
            col("l_orderkey"), col("l_linenumber"))
        val ord = Window.partitionBy("flag")
          .orderBy(col("price"), col("l_orderkey"), col("l_linenumber"))
        val cum = li
          .withColumn("cumw", sum(col("w")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("totw", sum(col("w")).over(Window.partitionBy("flag")))
        cum.filter(col("cumw") * 2L >= col("totw"))
          .withColumn("rn", row_number().over(ord))
          .filter(col("rn") === 1)
          .select(col("flag"), col("price").as("wmedian_price"),
            col("totw").as("total_qty"))
          .orderBy("flag")
      },
      Some("""WITH li AS (
             |  SELECT l_returnflag AS flag, l_extendedprice AS price,
             |    CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
             |  FROM lineitem),
             |cum AS (SELECT flag, price, l_orderkey, l_linenumber,
             |    SUM(w) OVER (PARTITION BY flag
             |      ORDER BY price, l_orderkey, l_linenumber
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             |    SUM(w) OVER (PARTITION BY flag) AS totw
             |  FROM li),
             |r AS (SELECT flag, price, cumw, totw,
             |    row_number() OVER (PARTITION BY flag
             |      ORDER BY price, l_orderkey, l_linenumber) AS rn
             |  FROM cum WHERE cumw * 2 >= totw)
             |SELECT flag, price AS wmedian_price,
             |  CAST(totw AS BIGINT) AS total_qty
             |FROM r WHERE rn = 1 ORDER BY flag""".stripMargin)),

    // ── linear multi-touch attribution ──
    // Every view/click in the 7 days before a same-user purchase
    // shares that purchase's credit EVENLY — the even-credit sibling
    // of q_attribution's last-touch model. Credit is micro-unit fixed
    // point: each touch gets 10^6 div n and the most recent touch
    // absorbs the remainder, so every attributed purchase contributes
    // EXACTLY 10^6 (Σ credit ≡ 10^6 · attributed purchases — the
    // conservation law a finance-grade attribution report must hold,
    // asserted in IntervalsSpec). The candidate join is banded on
    // (user, 7-day bucket): a touch in [usp−7d, usp) lives in the
    // purchase's bucket b or b−1, so the purchase side explodes to
    // {b−1, b} and the exact band is a residual — per-user
    // comparisons bounded per band (the q_seqpat discipline), each
    // touch matching in exactly one bucket.
    Q("q_attribution_linear",
      (s, dir) => {
        val e = t(s, dir, "events")
        val Band = 604800000000L // 7 days in micros
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("up"),
            expr("unix_micros(ts)").as("usp"), col("event_id").as("pid"))
          .withColumn("tb", explode(array(
            expr(s"usp div ${Band}L - 1L"), expr(s"usp div ${Band}L"))))
        val tch = e.filter(col("event_type").isin("view", "click"))
          .select(col("user_id").as("ut"), col("event_type").as("ttype"),
            expr("unix_micros(ts)").as("ust"), col("event_id").as("tid"))
          .withColumn("tb2", expr(s"ust div ${Band}L"))
        val joined = p.join(tch,
          col("up") === col("ut") && col("tb") === col("tb2") &&
            col("ust") < col("usp") &&
            col("ust") >= col("usp") - Band)
        val perP = Window.partitionBy("pid")
        val recency = Window.partitionBy("pid")
          .orderBy(col("ust").desc, col("tid").desc)
        joined
          .withColumn("n", count(lit(1)).over(perP))
          .withColumn("rn", row_number().over(recency))
          .withColumn("credit_fp",
            expr("1000000L div n") +
              when(col("rn") === 1,
                lit(1000000L) - col("n") * expr("1000000L div n"))
                .otherwise(0L))
          .groupBy(col("ttype"))
          .agg(count(lit(1)).as("touches"),
            sum(col("credit_fp")).as("credit_fp_sum"))
          .orderBy("ttype")
      },
      Some("""WITH p AS (SELECT user_id AS up, epoch_us(ts) AS usp,
             |    event_id AS pid FROM events WHERE event_type = 'purchase'),
             |tch AS (SELECT user_id AS ut, event_type AS ttype,
             |    epoch_us(ts) AS ust, event_id AS tid
             |  FROM events WHERE event_type IN ('view', 'click')),
             |j AS (SELECT pid, ttype, ust, tid FROM p JOIN tch
             |  ON up = ut AND ust < usp AND ust >= usp - 604800000000),
             |w AS (SELECT ttype,
             |    count(*) OVER (PARTITION BY pid) AS n,
             |    row_number() OVER (PARTITION BY pid
             |      ORDER BY ust DESC, tid DESC) AS rn
             |  FROM j),
             |c AS (SELECT ttype, 1000000 // n +
             |    CASE WHEN rn = 1 THEN 1000000 - n * (1000000 // n)
             |         ELSE 0 END AS credit_fp
             |  FROM w)
             |SELECT ttype, CAST(count(*) AS BIGINT) AS touches,
             |  CAST(SUM(credit_fp) AS BIGINT) AS credit_fp_sum
             |FROM c GROUP BY ttype ORDER BY ttype""".stripMargin)),

    // ── UNPIVOT / melt (the inverse of q_pivot) ──
    // Long-form reshape of part's numeric attributes via stack()
    // (codegen'd Generate — map-only, no shuffle until the aggregate),
    // then a per-attribute profile. Retail price goes through
    // DECIMAL(18,2) before the cents scaling so the fixed-point value
    // is exact on both engines (the psum recipe). The oracle spells
    // the melt as UNION ALL — engine-agnostic long-form equivalence.
    Q("q_unpivot",
      (s, dir) =>
        t(s, dir, "part")
          .select(expr(
            """stack(2,
              |  'p_size', CAST(p_size AS BIGINT),
              |  'p_retail_cents',
              |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              |) AS (attr, val)""".stripMargin))
          .groupBy("attr")
          .agg(count(lit(1)).as("cnt"), min(col("val")).as("vmin"),
            max(col("val")).as("vmax"), sum(col("val")).as("vsum"))
          .orderBy("attr"),
      Some("""WITH m AS (
             |  SELECT 'p_size' AS attr, CAST(p_size AS BIGINT) AS val FROM part
             |  UNION ALL
             |  SELECT 'p_retail_cents',
             |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             |  FROM part)
             |SELECT attr, CAST(count(*) AS BIGINT) AS cnt,
             |  MIN(val) AS vmin, MAX(val) AS vmax,
             |  CAST(SUM(val) AS BIGINT) AS vsum
             |FROM m GROUP BY attr ORDER BY attr""".stripMargin))
  )
}
