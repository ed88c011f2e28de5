package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.Tables

/** Scalar-function and window-frame breadth (SURVEY §2.7 / §2.10):
  * grouping sets, running/sliding window frames, string library
  * (incl. levenshtein), date arithmetic. All per-row or
  * deterministically-framed — exactness notes inline.
  */
object Functions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── relative-rank window functions + lead ──
    // percent_rank/cume_dist are exact rational doubles ((rank-1)/(n-1),
    // rank/n): both engines compute the same integer quotient, so the
    // doubles are bit-identical.
    Q("q_window_rel_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"),
            lead(col("event_type"), 1).over(w).as("next_type"),
            percent_rank().over(w).as("prnk"),
            cume_dist().over(w).as("cume"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |lead(event_type, 1) OVER w AS next_type,
             |percent_rank() OVER w AS prnk,
             |cume_dist() OVER w AS cume
             |FROM events WHERE user_id < 10
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ── null semantics battery: nullif / coalesce / null-safe equality ──
    // TPC-H data carries no nulls, so nulls are MANUFACTURED via nullif
    // and the three-valued-logic corners exercised explicitly: Spark's
    // <=> must agree with DuckDB's IS NOT DISTINCT FROM, and coalesce
    // defaults must agree on the null branch.
    Q("q_null_semantics",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("nullif(l_returnflag, 'N')").as("rf_n"),
            coalesce(expr("nullif(l_returnflag, 'N')"), lit("defaulted")).as("rf_c"),
            expr("nullif(l_returnflag, 'N')")
              .eqNullSafe(expr("nullif(l_linestatus, 'O')")).as("ns_eq"),
            (expr("nullif(l_returnflag, 'N')") === expr("nullif(l_linestatus, 'O')"))
              .isNull.as("tvl_null"))
          // EXPLICIT null ordering: Spark defaults to nulls-first on
          // ASC, DuckDB to nulls-last — leaving it implicit is a
          // cross-engine row-order divergence waiting to happen. The
          // trailing booleans make the sort TOTAL ((l_orderkey,
          // l_linenumber) is not unique in this corpus).
          .orderBy(col("rf_n").asc_nulls_last, col("l_orderkey"),
            col("l_linenumber"), col("tvl_null"), col("ns_eq")),
      Some("""SELECT l_orderkey, l_linenumber,
             |nullif(l_returnflag, 'N') AS rf_n,
             |coalesce(nullif(l_returnflag, 'N'), 'defaulted') AS rf_c,
             |(nullif(l_returnflag, 'N') IS NOT DISTINCT FROM nullif(l_linestatus, 'O'))
             |  AS ns_eq,
             |((nullif(l_returnflag, 'N') = nullif(l_linestatus, 'O')) IS NULL)
             |  AS tvl_null
             |FROM lineitem
             |ORDER BY rf_n ASC NULLS LAST, l_orderkey, l_linenumber,
             |  tvl_null, ns_eq""".stripMargin)),

    // ── histogram: fixed-width binning via exact integer arithmetic ──
    Q("q_histogram",
      (s, dir) =>
        t(s, dir, "orders")
          .select((floor(col("o_totalprice") / 50000.0)).cast(LongType).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("cnt"))
          .orderBy("bucket"),
      Some("""SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             |count(*) AS cnt
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ── ntile + first/last value window functions ──
    Q("q_ntile_first_last",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(4).over(w).cast(LongType).as("quartile"),
            first(col("o_orderkey")).over(wFull).as("best_order"),
            last(col("o_orderkey")).over(wFull).as("worst_order"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |first_value(o_orderkey) OVER wf AS best_order,
             |last_value(o_orderkey) OVER wf AS worst_order
             |FROM orders WHERE o_custkey < 100
             |WINDOW
             |  w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
             |  wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ── set operations: INTERSECT and EXCEPT (§2.9 completion) ──
    Q("q_intersect_except",
      (s, dir) => {
        val eventUsers = t(s, dir, "events").select(col("user_id").as("k"))
        val smallCust = t(s, dir, "customer").filter(col("c_custkey") < 120)
          .select(col("c_custkey").as("k"))
        val both = eventUsers.intersect(smallCust)
          .withColumn("op", lit("intersect"))
        val onlyCust = smallCust.except(eventUsers)
          .withColumn("op", lit("except"))
        both.unionByName(onlyCust).orderBy("op", "k")
      },
      Some("""SELECT k, 'intersect' AS op FROM (
             |  SELECT user_id AS k FROM events
             |  INTERSECT
             |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 120) a
             |UNION ALL
             |SELECT k, 'except' AS op FROM (
             |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 120
             |  EXCEPT
             |  SELECT user_id AS k FROM events) b
             |ORDER BY op, k""".stripMargin)),

    // ── array function library over tokenized text (§2.10) ──
    Q("q_array_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .withColumn("ws", split(col("p_name"), " "))
          .select(col("p_partkey"),
            expr("size(ws)").cast(LongType).as("n"),
            array_contains(col("ws"), "green").as("has_green"),
            concat_ws(" ", array_sort(col("ws"))).as("sorted_words"),
            concat_ws(" ", slice(col("ws"), 1, 2)).as("first2"),
            // sorted after distinct: DuckDB's list_distinct is unordered
            concat_ws(" ", array_sort(array_distinct(col("ws")))).as("uniq"),
            element_at(col("ws"), -1).as("last_word"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |CAST(len(ws) AS BIGINT) AS n,
             |list_contains(ws, 'green') AS has_green,
             |array_to_string(list_sort(ws), ' ') AS sorted_words,
             |array_to_string(ws[1:2], ' ') AS first2,
             |array_to_string(list_sort(list_distinct(ws)), ' ') AS uniq,
             |ws[-1] AS last_word
             |FROM (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part) t
             |ORDER BY p_partkey""".stripMargin)),

    // ── explicit GROUPING SETS (beyond rollup/cube) ──
    Q("q_grouping_sets",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), grouping_id().as("gid"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("gid").cast(LongType).as("gid"), col("cnt"))
          .orderBy("gid", "rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
             |coalesce(l_linestatus, 'ALL') AS ls,
             |CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             |count(*) AS cnt
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY gid, rf, ls""".stripMargin)),

    // ── window frames: running sum, lag, 3-row moving average ──
    // Frame order is unique (ts, event_id), so the running decimal sum
    // and the ROWS-framed average accumulate the same sequence in both
    // engines.
    Q("q_window_frames",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mov = w.rowsBetween(-2, Window.currentRow)
        t(s, dir, "events")
          .filter(col("user_id") < 10)
          .select(col("user_id"), col("event_id"), col("value"),
            sum(col("value").cast(DecimalType(18, 6))).over(run)
              .cast("double").as("running_sum"),
            lag(col("value"), 1).over(w).as("prev_value"),
            (sum(col("value").cast(DecimalType(18, 6))).over(mov).cast("double") /
              count(lit(1)).over(mov)).as("moving_avg"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, value,
             |CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_run AS DOUBLE) AS running_sum,
             |lag(value, 1) OVER w AS prev_value,
             |CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_mov AS DOUBLE)
             |  / COUNT(*) OVER w_mov AS moving_avg
             |FROM events WHERE user_id < 10
             |WINDOW
             |  w AS (PARTITION BY user_id ORDER BY ts, event_id),
             |  w_run AS (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  w_mov AS (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ── string function library (exact integer/string semantics) ──
    Q("q_string_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_brand")).as("lo"),
            substring(col("p_name"), 1, 5).as("sub5"),
            length(col("p_name")).cast(LongType).as("len"),
            regexp_replace(col("p_name"), "a", "@").as("repl"),
            lpad(col("p_brand"), 12, "*").as("pad"),
            reverse(col("p_type")).as("rev"),
            levenshtein(col("p_brand"), col("p_type")).cast(LongType).as("lev"),
            concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo,
             |substr(p_name, 1, 5) AS sub5,
             |CAST(length(p_name) AS BIGINT) AS len,
             |regexp_replace(p_name, 'a', '@', 'g') AS repl,
             |lpad(p_brand, 12, '*') AS pad,
             |reverse(p_type) AS rev,
             |CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev,
             |concat_ws('|', p_brand, p_type) AS joined
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── date/time arithmetic ──
    Q("q_datetime_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast(LongType).as("y"),
            month(col("o_orderdate")).cast(LongType).as("m"),
            dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
            quarter(col("o_orderdate")).cast(LongType).as("q"),
            date_add(to_date(col("o_orderdate")), 30).as("plus30"),
            datediff(lit("2001-01-01").cast("date"), to_date(col("o_orderdate")))
              .cast(LongType).as("days_to_y2001"),
            last_day(col("o_orderdate")).as("eom"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
             |CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
             |CAST(date_part('day', o_orderdate) AS BIGINT) AS d,
             |CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
             |CAST(o_orderdate AS DATE) + 30 AS plus30,
             |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01') AS BIGINT)
             |  AS days_to_y2001,
             |last_day(CAST(o_orderdate AS DATE)) AS eom
             |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
