package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.{MapleJuice, ShuffleOption, Tables}

/** A declared query: Spark implementation + (when ANSI-SQL-expressible)
  * a DuckDB oracle over the same parquet tables. Contract notes:
  *   - every query ends with a deterministic `orderBy` on a unique key
  *     so the driver's hash compare is stable;
  *   - every computed column is aliased identically in Spark and SQL;
  *   - double aggregates go through DECIMAL(18,s) so Spark and DuckDB
  *     sum *exactly* the same value regardless of accumulation order,
  *     then cast back to double (deterministic nearest-even) so the
  *     output dtype matches on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Core {

  /** Order-insensitive exact sum of a double column: decimal-accumulate,
    * then one deterministic cast back to double. ONLY for raw parquet
    * doubles (exact decimals — the cast never rounds); computed
    * products go through Composite's fixed-point psum instead. Shared
    * across query files so the exactness recipe has one definition. */
  private[queries] def dsum(c: Column, scale: Int, alias: String): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double").as(alias)
  private[queries] def dsumSql(expr: String, scale: Int, alias: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE) AS $alias"

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── S1+P2: scan & project (pushed projection must reach parquet) ──
    Q("q_scan_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          // (l_orderkey, l_linenumber) is NOT unique in this corpus —
          // every projected column joins the sort so the order is TOTAL
          // (a tied prefix with differing payloads leaves row order
          // engine-dependent and breaks the hash compare)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // ── P1: numeric-range filter (wg_maple.py:13-14 shape) ──
    Q("q_filter_range",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_quantity").between(10, 40))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          // total order: see q_scan_project note
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
             |WHERE l_quantity BETWEEN 10 AND 40
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin)),

    // ── D1/A3: maple flatMap expansion (win_maple1.py pairwise shape) ──
    Q("q_maple_flatmap",
      (s, dir) =>
        MapleJuice.mapleCols(t(s, dir, "part"))(
            col("p_partkey"),
            posexplode(split(col("p_type"), " ")))
          .select(col("p_partkey"), col("pos").cast(LongType).as("pos"), col("col").as("word"))
          .orderBy("p_partkey", "pos"),
      Some("""WITH tk AS (SELECT p_partkey, string_split(p_type, ' ') AS ws FROM part)
             |SELECT p_partkey, unnest(range(len(ws))) AS pos, unnest(ws) AS word FROM tk
             |ORDER BY p_partkey, pos""".stripMargin)),

    // ── D3+A1: group-by count (web-graph in-degree, wg_juice.py) ──
    Q("q_groupby_count",
      (s, dir) =>
        MapleJuice.juiceAgg(t(s, dir, "orders"),
            Seq(col("o_custkey")), Seq(count(lit(1)).as("cnt")))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders
             |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // ── A2: per-key sum with map-side partial agg (combiner shape) ──
    Q("q_groupby_sum",
      (s, dir) =>
        MapleJuice.juiceAgg(t(s, dir, "lineitem"),
            Seq(col("l_returnflag")),
            Seq(dsum(col("l_quantity"), 2, "sum_qty"),
                dsum(col("l_extendedprice"), 2, "sum_price"),
                count(lit(1)).as("cnt")))
          .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, ${dsumSql("l_quantity", 2, "sum_qty")},
              |${dsumSql("l_extendedprice", 2, "sum_price")}, count(*) AS cnt
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── D4: hash shuffle — explicit repartition must not change results ──
    // Project to the two needed columns BEFORE the shuffle: never move
    // full-width rows through a repartition you control.
    Q("q_hash_partition_agg",
      (s, dir) =>
        MapleJuice.juiceAgg(
            MapleJuice.shuffle(
              t(s, dir, "lineitem").select(col("l_suppkey"), col("l_extendedprice")),
              ShuffleOption.Hash, 32, col("l_suppkey")),
            Seq(col("l_suppkey")),
            Seq(dsum(col("l_extendedprice"), 2, "sum_price"), count(lit(1)).as("cnt")))
          .orderBy("l_suppkey"),
      Some(s"""SELECT l_suppkey, ${dsumSql("l_extendedprice", 2, "sum_price")}, count(*) AS cnt
              |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ── D5/O1: range partition + sort (global order via RangePartitioner) ──
    Q("q_range_sort",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            to_date(col("o_orderdate")).as("o_odate"))
          .orderBy("o_odate", "o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_odate
             |FROM orders ORDER BY o_odate, o_orderkey""".stripMargin)),

    // ── A4: majority vote per key (Condorcet stage-1, win_juice1.py) ──
    // Integer comparison (2*wins > total) keeps the vote exact.
    Q("q_majority_vote",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r_cnt"),
               count(lit(1)).as("total"))
          .withColumn("winner",
            when(col("r_cnt") * 2 > col("total"), lit("R")).otherwise(lit("other")))
          .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey,
             |CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r_cnt,
             |count(*) AS total,
             |CASE WHEN 2 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > count(*)
             |     THEN 'R' ELSE 'other' END AS winner
             |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ── A5/O2: argmax with ties (Condorcet stage-2, win_juice2.py:48-56) ──
    // Tiny 1-row max side is broadcast — no global single-partition window.
    Q("q_argmax_ties",
      (s, dir) => {
        val counts = t(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        val mx = counts.agg(max(col("cnt")).as("mx"))
        counts.join(broadcast(mx), col("cnt") === col("mx"))
          .select(col("o_custkey"), col("cnt"))
          .orderBy("o_custkey")
      },
      Some("""WITH c AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
             |SELECT o_custkey, cnt FROM c WHERE cnt = (SELECT max(cnt) FROM c)
             |ORDER BY o_custkey""".stripMargin)),

    // ── O2: top-k (TakeOrderedAndProject — no full sort materialized) ──
    Q("q_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── §2.5: equi join + aggregate (shuffle join on the big side) ──
    Q("q_join_equi",
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice"), 2, "sum_price"))
          .orderBy("c_nationkey"),
      Some(s"""SELECT c_nationkey, count(*) AS n_orders,
              |${dsumSql("o_totalprice", 2, "sum_price")}
              |FROM orders JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // ── §2.5: broadcast dimension joins (region/nation stay tiny at any SF) ──
    Q("q_join_broadcast",
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal"), 2, "sum_bal"))
          .orderBy("r_name"),
      Some(s"""SELECT r_name, count(*) AS n_cust, ${dsumSql("c_acctbal", 2, "sum_bal")}
              |FROM customer
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ── §2.5: semi + anti join (existence / absence) ──
    Q("q_semi_anti",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        val orders = t(s, dir, "orders")
        val has = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("has_orders").as("status"))
        val not = cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("no_orders").as("status"))
        has.unionByName(not).orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, 'has_orders' AS status FROM customer
             |WHERE c_custkey IN (SELECT o_custkey FROM orders)
             |UNION ALL
             |SELECT c_custkey, 'no_orders' AS status FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
             |ORDER BY c_custkey""".stripMargin)),

    // ── §2.9: union + distinct ──
    Q("q_union_distinct",
      (s, dir) =>
        t(s, dir, "orders").select(col("o_custkey").as("k"))
          .union(t(s, dir, "customer").select(col("c_custkey").as("k")))
          .distinct()
          .orderBy("k"),
      Some("""SELECT o_custkey AS k FROM orders
             |UNION
             |SELECT c_custkey AS k FROM customer
             |ORDER BY k""".stripMargin)),

    // ── §2.7: window rank per key ──
    Q("q_window_rank",
      (s, dir) =>
        t(s, dir, "orders")
          .withColumn("rnk",
            rank().over(Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc))
              .cast(LongType))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
          .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk
             |  FROM orders) t
             |WHERE rnk <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ── §2.11: event-time tumbling window as batch agg ──
    Q("q_event_window",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value"), 6, "sum_value"))
          .orderBy("day", "event_type"),
      Some(s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
              |count(*) AS cnt, ${dsumSql("value", 6, "sum_value")}
              |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)),

    // ── §2.11: hopping (sliding) event-time windows — 1-day windows ──
    // every 12 h, each event lands in exactly windowDuration/slide = 2
    // windows. Spark assigns epoch-aligned slide-multiples; the oracle
    // reconstructs the same two starts from the 12-hour grid floor.
    // Same partial+final aggregate shape as the tumbling case — the
    // explode-by-2 happens before the map-side combine, so the shuffle
    // still moves one row per (partition, window, type).
    Q("q_window_hopping",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), dsum(col("value"), 6, "sum_value"))
          .select(col("w.start").as("w_start"), col("event_type"),
            col("cnt"), col("sum_value"))
          .orderBy("w_start", "event_type"),
      Some(s"""WITH h AS (SELECT event_type, value,
              |  CAST(date_trunc('day', ts) AS TIMESTAMP)
              |    + CASE WHEN extract(hour FROM ts) >= 12
              |           THEN INTERVAL 12 HOUR ELSE INTERVAL 0 HOUR END AS grid
              |  FROM events
              |  -- Spark's window() drops null timestamps; match it
              |  WHERE ts IS NOT NULL),
              |e AS (SELECT event_type, value,
              |        grid - CASE WHEN u.k = 1 THEN INTERVAL 12 HOUR
              |                    ELSE INTERVAL 0 HOUR END AS w_start
              |      FROM h, (SELECT unnest([0, 1]) AS k) u(k))
              |SELECT w_start, event_type, count(*) AS cnt,
              |${dsumSql("value", 6, "sum_value")}
              |FROM e GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin)),

    // ── A6: word count (tokenize + count) ──
    Q("q_wordcount",
      (s, dir) =>
        MapleJuice.mapleCols(t(s, dir, "part"))(
            explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .orderBy("word"),
      Some("""WITH w AS (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
             |SELECT word, count(*) AS cnt FROM w GROUP BY word ORDER BY word""".stripMargin)),

    // ── D7: two-stage chaining (Condorcet shape: agg feeds agg) ──
    Q("q_chain",
      (s, dir) =>
        MapleJuice.chain(
          t(s, dir, "orders"),
          df => MapleJuice.juiceAgg(df, Seq(col("o_custkey")), Seq(count(lit(1)).as("cnt"))),
          df => MapleJuice.juiceAgg(df, Seq(col("cnt")), Seq(count(lit(1)).as("n_cust")))
        ).orderBy("cnt"),
      Some("""WITH s1 AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
             |SELECT cnt, count(*) AS n_cust FROM s1 GROUP BY cnt ORDER BY cnt""".stripMargin)),

    // ── ext: exact deduplication on a column subset ──
    Q("q_dedup",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("user_id"), col("event_type"))
          .distinct()
          .orderBy("user_id", "event_type"),
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin)),

    // ── ext: per-language corpus statistics ──
    Q("q_text_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_chars")).as("total_chars"),
               (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
               min(col("n_chars")).as("min_chars"),
               max(col("n_chars")).as("max_chars"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             |CAST(SUM(n_chars) AS DOUBLE) / count(*) AS avg_chars,
             |min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))
  )
}
