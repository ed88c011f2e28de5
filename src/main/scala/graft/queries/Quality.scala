package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** Data-profiling and data-quality-validation operators — the
  * warehouse intake surface: before a table feeds any downstream
  * query, profile its columns and assert its contracts.
  *
  * Both operators follow the repo's determinism rules (exact integer
  * counts, decimal-exact sums, one final double division) so the
  * reports hash-match the DuckDB oracle bit-for-bit.
  */
object Quality {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** One data-quality check: `viol` is the violating-row relation;
    * the report row is its count plus the pass verdict. */
  private def check(name: String, viol: DataFrame): DataFrame =
    viol.agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

  val queries: Seq[Q] = Seq(

    // ── one-pass numeric column profiling (summarize-style) ──
    // Per column: rows, nulls, exact distinct count, min/max, and a
    // decimal-exact mean (order-insensitive sum, ONE division at the
    // end). All 4 columns profile in a SINGLE aggregate pass over the
    // table — the multi-count-distinct plans as one Expand (4× row
    // multiplication before the partial aggregate), which is the
    // standard price of exact multi-column NDV in one scan; a 100 TB
    // profiler that can tolerate ±2% swaps countDistinct for
    // approx_count_distinct and the Expand disappears (the sketch
    // variants are declared separately — q_approx_distinct). The
    // result is ONE row wide, unpivoted to long form driver-side by
    // `stack` — no second shuffle.
    Q("q_profile",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
            countDistinct(col(c)).as(s"${c}_nd"),
            min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"),
            sum(col(c).cast(DecimalType(18, 6))).as(s"${c}_sum"))
        }
        // Fanned-out scan (Tables.wide): the Expand(4×)+partial-agg
        // runs in the scan stage, so a one-row-group file serializes
        // the whole profile into ONE task (measured 0.60× fanned at
        // sf0.1/32 cores; aggregation is order-insensitive by
        // construction — decimal sums, counts, min/max)
        val one = Tables.wide(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
        val rows = cols.map { c =>
          s"'$c', n, ${c}_nn, ${c}_nd, ${c}_min, ${c}_max, " +
            s"CAST(${c}_sum AS DOUBLE) / CAST(n - ${c}_nn AS DOUBLE)"
        }.mkString(", ")
        one.selectExpr(s"stack(${cols.length}, $rows) AS " +
            "(col_name, n_rows, n_null, n_distinct, min_v, max_v, mean_v)")
          .orderBy("col_name")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { c =>
          s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS n_null,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  min($c) AS min_v, max($c) AS max_v,
             |  CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE)
             |    / CAST(count($c) AS DOUBLE) AS mean_v
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // ── string-column profiling (q_profile's text twin) ──
    // Same single-pass stack shape as q_profile, over STRING columns:
    // rows, nulls, empties, exact distinct, min/max length, and a
    // length mean (exact BIGINT length sum, ONE double division).
    // Two tables profiled → two single-pass aggregates unioned (a
    // profiler never pays more than one scan per table); the Expand
    // for exact multi-NDV carries the same documented approx swap as
    // q_profile. Empty-count semantics: CASE WHEN c = '' — NULL falls
    // through to 0 in both engines, so nulls are not empties.
    Q("q_profile_str",
      (s, dir) => {
        def profiled(table: String, cols: Seq[String]): DataFrame = {
          val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
            Seq(
              sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nn"),
              sum(when(col(c) === "", 1L).otherwise(0L)).as(s"${c}_ne"),
              countDistinct(col(c)).as(s"${c}_nd"),
              min(length(col(c)).cast("bigint")).as(s"${c}_minl"),
              max(length(col(c)).cast("bigint")).as(s"${c}_maxl"),
              sum(length(col(c)).cast("bigint")).as(s"${c}_suml"))
          }
          val one = t(s, dir, table).agg(aggs.head, aggs.tail: _*)
          val rows = cols.map { c =>
            s"'$table.$c', n, ${c}_nn, ${c}_ne, ${c}_nd, ${c}_minl, " +
              s"${c}_maxl, CAST(${c}_suml AS DOUBLE) / CAST(n - ${c}_nn AS DOUBLE)"
          }.mkString(", ")
          one.selectExpr(s"stack(${cols.length}, $rows) AS " +
            "(col_name, n_rows, n_null, n_empty, n_distinct, " +
            "min_len, max_len, mean_len)")
        }
        profiled("documents", Seq("lang", "text"))
          .unionByName(profiled("events", Seq("event_type", "props")))
          .orderBy("col_name")
      },
      Some {
        def one(table: String, c: String): String =
          s"""SELECT '$table.$c' AS col_name,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) FILTER ($c IS NULL) AS BIGINT) AS n_null,
             |  CAST(count(*) FILTER ($c = '') AS BIGINT) AS n_empty,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             |  CAST(min(length($c)) AS BIGINT) AS min_len,
             |  CAST(max(length($c)) AS BIGINT) AS max_len,
             |  CAST(SUM(CAST(length($c) AS BIGINT)) AS DOUBLE)
             |    / CAST(count($c) AS DOUBLE) AS mean_len
             |FROM $table""".stripMargin
        Seq(one("documents", "lang"), one("documents", "text"),
          one("events", "event_type"), one("events", "props"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
      }),

    // ── data-quality constraint report (Deequ-style validation) ──
    // Seven declarative contracts over the star schema, each one
    // relational violation query, unioned into a single report:
    // primary-key uniqueness, two referential-integrity anti-joins,
    // not-null, a closed value domain, and two numeric ranges. The
    // discount check is deliberately STRICTER than the data (max
    // 0.10 vs the asserted 0.08) so the failure path — a nonzero
    // count with passed=false — is exercised, not just the green
    // path. 100 TB shape: each check is one keyed aggregate or one
    // anti-join on the key it validates (broadcast when the parent
    // side is a dim); violations never collect to the driver — the
    // report is counts. The anti-joins are exactly the incremental-
    // dedup shape, so AQE skew handling applies unchanged.
    Q("q_dq_checks",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val ords = t(s, dir, "orders")
        val checks = Seq(
          check("fk_lineitem_orders",
            li.join(ords.select("o_orderkey"),
              li("l_orderkey") === ords("o_orderkey"), "left_anti")),
          check("fk_orders_customer",
            ords.join(t(s, dir, "customer").select("c_custkey"),
              ords("o_custkey") === col("c_custkey"), "left_anti")),
          check("pk_orders_unique",
            ords.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
              .filter(col("cnt") > 1L)),
          check("nn_events_value",
            t(s, dir, "events").filter(col("value").isNull)),
          check("domain_documents_lang",
            t(s, dir, "documents")
              .filter(!col("lang").isin("de", "en", "es", "fr", "zh"))),
          check("range_lineitem_quantity",
            li.filter(!(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0))),
          check("range_lineitem_discount_strict",
            li.filter(col("l_discount") > 0.08)))
        checks.reduce(_.unionAll(_)).orderBy("check_name")
      },
      Some("""WITH v AS (
             |SELECT 'fk_lineitem_orders' AS check_name,
             |  CAST((SELECT count(*) FROM lineitem l
             |        WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                          WHERE o.o_orderkey = l.l_orderkey))
             |    AS BIGINT) AS n_violations
             |UNION ALL
             |SELECT 'fk_orders_customer',
             |  CAST((SELECT count(*) FROM orders o
             |        WHERE NOT EXISTS (SELECT 1 FROM customer c
             |                          WHERE c.c_custkey = o.o_custkey))
             |    AS BIGINT)
             |UNION ALL
             |SELECT 'pk_orders_unique',
             |  CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
             |        GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
             |UNION ALL
             |SELECT 'nn_events_value',
             |  CAST((SELECT count(*) FROM events WHERE value IS NULL) AS BIGINT)
             |UNION ALL
             |SELECT 'domain_documents_lang',
             |  CAST((SELECT count(*) FROM documents
             |        WHERE lang NOT IN ('de','en','es','fr','zh')) AS BIGINT)
             |UNION ALL
             |SELECT 'range_lineitem_quantity',
             |  CAST((SELECT count(*) FROM lineitem
             |        WHERE NOT (l_quantity >= 1.0 AND l_quantity <= 50.0))
             |    AS BIGINT)
             |UNION ALL
             |SELECT 'range_lineitem_discount_strict',
             |  CAST((SELECT count(*) FROM lineitem WHERE l_discount > 0.08)
             |    AS BIGINT))
             |SELECT check_name, n_violations, n_violations = 0 AS passed
             |FROM v ORDER BY check_name""".stripMargin)),

    // ── k-anonymity audit over quasi-identifier cells ──
    // The re-identification check a corpus release runs: bucket every
    // document into its quasi-identifier cell (lang, source,
    // 200-char length band — the attributes an adversary could link
    // externally) and report every cell with fewer than k = 5
    // members. A row here means "these documents are identifiable by
    // their metadata alone"; the release fix is generalizing the
    // cell (wider bands) or suppressing its members. One map-side-
    // combined aggregate + a count filter — cell-sized output; at
    // 100 TB the cell table is the only thing after the scan pass.
    // Probed non-vacuous at every driver SF (216/200/5 risky cells
    // at sf0.001/0.01/0.1 — and the count FALLING as the corpus
    // grows is exactly the k-anonymity story: bigger crowds).
    Q("q_kanon",
      (s, dir) => {
        Tables(s, dir, "documents")
          .groupBy(col("lang"), col("source"),
            expr("n_chars div 200").as("len_band"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") < 5)
          .orderBy("lang", "source", "len_band")
      },
      Some("""SELECT lang, source, n_chars // 200 AS len_band,
             |  count(*) AS cnt
             |FROM documents
             |GROUP BY 1, 2, 3 HAVING count(*) < 5
             |ORDER BY lang, source, len_band""".stripMargin)),

    // ── l-diversity audit (q_kanon's homogeneity-attack sibling) ──
    // k-anonymity alone fails when a quasi-identifier cell is large
    // but HOMOGENEOUS in the sensitive attribute — every member leaks
    // it anyway. Here QI = (source, length band), sensitive = lang:
    // flag cells with < 3 distinct langs, with the dominant-lang
    // share (attack confidence) in exact ppm. Like q_kanon, the risky
    // set SHRINKS as the corpus grows (probed: 2 / 6 / 0 cells at the
    // three SFs — an empty sf0.1 result is the privacy-improves-with-
    // scale point, not vacuity; sf0.001 stays non-empty for the smoke
    // floor). Two keyed aggregates, cells bounded by the QI domain.
    Q("q_ldiversity",
      (s, dir) => {
        val cells = Tables(s, dir, "documents")
          .groupBy(col("source"), expr("n_chars div 200").as("len_band"),
            col("lang"))
          .agg(count(lit(1)).as("cl"))
        cells.groupBy("source", "len_band")
          .agg(sum(col("cl")).as("n"),
            count(lit(1)).as("distinct_langs"),
            max(col("cl")).as("top"))
          .filter(col("distinct_langs") < 3)
          .select(col("source"), col("len_band"), col("n"),
            col("distinct_langs"),
            expr("top * 1000000L div n").as("top_share_ppm"))
          .orderBy("source", "len_band")
      },
      Some("""WITH cells AS (
             |  SELECT source, n_chars // 200 AS len_band, lang,
             |    CAST(count(*) AS BIGINT) AS cl
             |  FROM documents GROUP BY 1, 2, 3)
             |SELECT source, len_band, CAST(SUM(cl) AS BIGINT) AS n,
             |  CAST(count(*) AS BIGINT) AS distinct_langs,
             |  MAX(cl) * 1000000 // CAST(SUM(cl) AS BIGINT)
             |    AS top_share_ppm
             |FROM cells GROUP BY source, len_band
             |HAVING count(*) < 3
             |ORDER BY source, len_band""".stripMargin)),

    // ── boxplot five-number summary + IQR outlier fences per group ──
    // The distribution-profile head a dashboard draws: per event type,
    // min / Q1 / median / Q3 / max picked at EXACT ranks under the
    // (value, event_id) total order (lower-quartile convention:
    // Q1 at ⌈n/4⌉, median at ⌈n/2⌉, Q3 at ⌈3n/4⌉ — one fixed integer
    // formula both engines), Tukey fences at 1.5·IQR in truncating
    // fixed point, and the outlier counts outside them. Two passes
    // over the keyed scan (rank picks, then fence counts against the
    // broadcast 5-row quartile table) — the same shape q_winsorize
    // ships; values in exact 1e-4 fixed point.
    Q("q_boxplot",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("event_type"),
            floor(col("value") * 10000).cast("long").as("fp"),
            col("event_id"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("fp"), col("event_id"))
        val qs = e
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
          .groupBy("event_type")
          .agg(max(col("n")).as("n"),
            min(col("fp")).as("vmin"), max(col("fp")).as("vmax"),
            max(when(col("rn") === expr("(n + 3) div 4"), col("fp")))
              .as("q1"),
            max(when(col("rn") === expr("(n + 1) div 2"), col("fp")))
              .as("med"),
            max(when(col("rn") === expr("(3 * n + 3) div 4"), col("fp")))
              .as("q3"))
          .withColumn("lo_fence", expr("q1 - (3 * (q3 - q1)) div 2"))
          .withColumn("hi_fence", expr("q3 + (3 * (q3 - q1)) div 2"))
        e.join(broadcast(qs), "event_type")
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"), max(col("vmin")).as("vmin"),
            max(col("q1")).as("q1"), max(col("med")).as("med"),
            max(col("q3")).as("q3"), max(col("vmax")).as("vmax"),
            sum(when(col("fp") < col("lo_fence"), 1L).otherwise(0L))
              .as("n_out_low"),
            sum(when(col("fp") > col("hi_fence"), 1L).otherwise(0L))
              .as("n_out_high"))
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
             |qs AS (SELECT event_type, MAX(n) AS n,
             |    MIN(fp) AS vmin, MAX(fp) AS vmax,
             |    MAX(CASE WHEN rn = (n + 3) // 4 THEN fp END) AS q1,
             |    MAX(CASE WHEN rn = (n + 1) // 2 THEN fp END) AS med,
             |    MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN fp END) AS q3
             |  FROM r GROUP BY event_type),
             |f AS (SELECT *, q1 - (3 * (q3 - q1)) // 2 AS lo_fence,
             |    q3 + (3 * (q3 - q1)) // 2 AS hi_fence FROM qs)
             |SELECT e.event_type, MAX(n) AS n, MAX(vmin) AS vmin,
             |  CAST(MAX(q1) AS BIGINT) AS q1, CAST(MAX(med) AS BIGINT) AS med,
             |  CAST(MAX(q3) AS BIGINT) AS q3, MAX(vmax) AS vmax,
             |  CAST(SUM(CASE WHEN fp < lo_fence THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_out_low,
             |  CAST(SUM(CASE WHEN fp > hi_fence THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_out_high
             |FROM e JOIN f ON e.event_type = f.event_type
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    // ── 2-D histogram (weekday × value-band heatmap) ──
    // The heatmap rollup behind "when do the big values happen":
    // weekday (2024-01-01 is a Monday, so day-index mod 7 IS the
    // ISO weekday 0..6) × equi-width value decile band (bounds from
    // the global max — one broadcast scalar; value ≥ 0 in this table,
    // probed). Grid cells are bounded (7 × 10) at any corpus size,
    // and the count aggregate map-side combines — the q_decision_stump
    // histogram discipline in two dimensions. Margins re-derive
    // downstream by summing cells, so only cells ship.
    Q("q_histogram2d",
      (s, dir) => {
        val e = t(s, dir, "events")
          .select(expr("(unix_micros(ts) - 1704067200000000L)" +
            " div 86400000000L % 7").as("dow"),
            floor(col("value") * 10000).cast("long").as("fp"))
        val mx = e.agg(max(col("fp")).as("mx"))
        e.crossJoin(broadcast(mx))
          .withColumn("band", expr("(fp * 10) div (mx + 1)"))
          .groupBy("dow", "band")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("dow", "band")
      },
      Some("""WITH e AS (
             |  SELECT (epoch_us(ts) - 1704067200000000) // 86400000000 % 7
             |      AS dow,
             |    CAST(floor(value * 10000) AS BIGINT) AS fp
             |  FROM events),
             |m AS (SELECT MAX(fp) AS mx FROM e)
             |SELECT dow, (fp * 10) // (mx + 1) AS band,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM e, m GROUP BY dow, band ORDER BY dow, band""".stripMargin))
  )
}
