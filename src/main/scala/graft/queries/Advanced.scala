package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.{MapleJuice, Tables}

/** Capability-parity operators beyond the reference's own surface:
  * exact count-distinct, rollup/grouping sets, pivot, as-of join,
  * sessionization, exact percentiles. Each keeps the scale-safe shape
  * (single keyed shuffle, broadcast dims, no driver loops).
  */
object Advanced {

  /** q_event_pattern's bounded-state scan (round-17 group-array
    * sweep): per-user regex `v[^e]*c[^e]*p` over the (ts, event_id)-
    * ordered code stream WITHOUT materializing the history — chained
    * window running-maxima replace the whole-history collect_list
    * (see the query's comment for the equivalence argument).
    * `coded` carries (user_id, ts, event_id, code); output is one row
    * per user: (user_id, n_events, seq_head, converted_clean).
    * EventPatternSpec fuzzes this against java.util.regex on random
    * tapes, including whale-user and all-error edges.
    */
  private[graft] def eventPatternScan(coded: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1L)
    val base = coded
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("last_v",
        max(when(col("code") === "v", col("rn"))).over(prior))
      .withColumn("last_e",
        max(when(col("code") === "e", col("rn"))).over(prior))
      .withColumn("armed_c",
        col("code") === "c" &&
          coalesce(col("last_v"), lit(0L)) >
            coalesce(col("last_e"), lit(0L)))
    val scored = base
      .withColumn("last_ac",
        max(when(col("armed_c"), col("rn"))).over(prior))
      .withColumn("hit",
        col("code") === "p" &&
          coalesce(col("last_ac"), lit(0L)) >
            coalesce(col("last_e"), lit(0L)))
    scored
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(col("hit")).as("converted_clean"),
        // order via the rn in the struct, not physical row order
        concat_ws("", transform(
          sort_array(collect_list(
            when(col("rn") <= 40, struct(col("rn"), col("code"))))),
          x => x.getField("code"))).as("seq_head"))
      .select("user_id", "n_events", "seq_head", "converted_clean")
      .orderBy("user_id")
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  val queries: Seq[Q] = Seq(

    // ── exact multi-column count-distinct (Expand-based) ──
    Q("q_count_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
               countDistinct(col("l_partkey")).as("n_part"),
               count(lit(1)).as("cnt"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp,
             |count(DISTINCT l_partkey) AS n_part, count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── rollup with grouping_id (SQL-standard bitmask both engines) ──
    Q("q_rollup",
      (s, dir) =>
        t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), grouping_id().as("gid"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("r"),
            coalesce(col("n_name"), lit("ALL")).as("n"),
            col("gid").cast(LongType).as("gid"), col("n_cust"))
          .orderBy("gid", "r", "n"),
      Some("""SELECT coalesce(r_name, 'ALL') AS r, coalesce(n_name, 'ALL') AS n,
             |CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid, count(*) AS n_cust
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name) ORDER BY gid, r, n""".stripMargin)),

    // ── pivot (wide conditional aggregation) ──
    Q("q_pivot",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
             |CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
             |CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
             |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // ── as-of join: latest order at-or-before each event's timestamp ──
    // Scalable shape: tag + union + ONE keyed shuffle + running
    // last_value — no per-row subquery, no range join. Ties on
    // (customer, date) break by max o_orderkey, mirrored in the oracle.
    Q("q_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events").select(
          col("event_id"), col("user_id").as("k"), col("ts").as("t"),
          lit(null).cast(LongType).as("okey"), lit(1).as("tag"))
        val or = t(s, dir, "orders").select(
          lit(null).cast(LongType).as("event_id"), col("o_custkey").as("k"),
          col("o_orderdate").as("t"), col("o_orderkey").as("okey"), lit(0).as("tag"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("tag"), col("okey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        or.unionByName(ev)
          .withColumn("last_order", last(col("okey"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("k").as("user_id"), col("last_order"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |(SELECT o.o_orderkey FROM orders o
             | WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             | ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS last_order
             |FROM events e ORDER BY event_id""".stripMargin)),

    // ── forward as-of join with tolerance: each view matched to the ──
    // same user's NEXT purchase within 7 days (pandas merge_asof
    // direction='forward' — the attribution join). Same union+window
    // shape as the backward q_asof_join (one shuffle on the key, no
    // row explosion, no per-row subquery): the forward match is
    // first-non-null over the currentRow→following frame, and the
    // tolerance is a post-filter on the matched row's own timestamp
    // carried through a struct — a match outside the window nulls out
    // instead of dropping the row.
    Q("q_asof_join_fwd",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .filter(col("event_type").isin("view", "purchase"))
          .select(col("event_id"), col("user_id").as("k"), col("ts").as("t"),
            // at equal ts the view (tag 0) sorts BEFORE the purchase
            // (tag 1), so a same-instant purchase is inside the frame
            when(col("event_type") === "purchase", 1).otherwise(0).as("tag"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("tag"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ev
          .withColumn("nxt", first(
            when(col("tag") === 1, struct(col("t").as("pt"), col("event_id").as("pid"))),
            ignoreNulls = true).over(w))
          .filter(col("tag") === 0)
          .select(col("event_id"), col("k").as("user_id"),
            when(col("nxt.pt") <= col("t") + expr("INTERVAL 7 DAYS"),
              col("nxt.pid")).as("next_purchase"))
          .orderBy("event_id")
      },
      Some("""SELECT v.event_id, v.user_id,
             |(SELECT p.event_id FROM events p
             | WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
             |   AND p.ts >= v.ts
             |   AND p.ts <= v.ts + INTERVAL 7 DAY
             | ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_purchase
             |FROM events v WHERE v.event_type = 'view'
             |ORDER BY v.event_id""".stripMargin)),

    // ── sessionization: 30-min-gap sessions per user (lag + cum-sum) ──
    Q("q_sessionize",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("prev", lag(col("ts"), 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull ||
              (unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L), 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("new_s")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH x AS (SELECT user_id, event_id, ts,
             |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |y AS (SELECT user_id, event_id, ts,
             |  CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
             |       THEN 1 ELSE 0 END AS new_s FROM x),
             |z AS (SELECT user_id, ts,
             |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM y)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |count(*) AS n_events, min(ts) AS start_ts, max(ts) AS end_ts
             |FROM z GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // ── full outer join with unmatched rows on BOTH sides ──
    Q("q_join_outer",
      (s, dir) => {
        val e = t(s, dir, "events").filter(col("user_id") >= 100)
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val c = t(s, dir, "customer").filter(col("c_custkey") < 120)
          .select(col("c_custkey"))
        e.join(c, col("user_id") === col("c_custkey"), "full_outer")
          .select(
            coalesce(col("user_id"), col("c_custkey")).as("k"),
            col("n_events"),
            when(col("user_id").isNotNull && col("c_custkey").isNotNull, "both")
              .when(col("user_id").isNotNull, "events_only")
              .otherwise("customer_only").as("side"))
          .orderBy("k")
      },
      Some("""SELECT coalesce(e.user_id, c.c_custkey) AS k, e.n_events,
             |CASE WHEN e.user_id IS NOT NULL AND c.c_custkey IS NOT NULL THEN 'both'
             |     WHEN e.user_id IS NOT NULL THEN 'events_only'
             |     ELSE 'customer_only' END AS side
             |FROM (SELECT user_id, count(*) AS n_events FROM events
             |      WHERE user_id >= 100 GROUP BY user_id) e
             |FULL JOIN (SELECT c_custkey FROM customer WHERE c_custkey < 120) c
             |  ON e.user_id = c.c_custkey
             |ORDER BY k""".stripMargin)),

    // ── cube: all grouping-set combinations ──
    Q("q_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
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
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY gid, rf, ls""".stripMargin)),

    // ── salted join: skew-safe partitioning, result == plain join ──
    Q("q_join_salted",
      (s, dir) =>
        MapleJuice.saltedJoin(
            t(s, dir, "lineitem").select(col("l_suppkey"), col("l_extendedprice")),
            t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey"), col("s_suppkey"), salt = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
               sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
          .orderBy("s_nationkey"),
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ── range join via time-bucketization: the scale pattern for ──
    // interval predicates. A naive range join plans as a broadcast
    // nested loop (or per-row subquery); bucketizing both sides to
    // weeks makes it a hash EQUI join on (key, week) — the follow-up
    // side replicates into the ≤2 weeks its 7-day look-back covers,
    // the precise interval predicate stays as a residual filter, and
    // each pair matches in exactly one bucket (the first order's
    // week), so no dedup pass is needed. Semantics: repeat purchases
    // — a customer's order followed by ANOTHER of their orders
    // strictly within the next 6 days. (The original events↔orders
    // pairing was STRUCTURALLY empty — events are 2024, orders
    // 1992–98, the q_asof_join_fwd vacuity SCALE.md records — so the
    // operator proved nothing; both sides now share an era and the
    // result is non-empty at every SF: 39 pairs at sf0.001, 402 at
    // sf0.01.)
    Q("q_join_range",
      (s, dir) => {
        val wb = (c: Column) =>
          floor(datediff(c, lit(java.sql.Date.valueOf("1992-01-01"))) / 7)
        val a = t(s, dir, "orders")
          .select(col("o_orderkey").as("first_key"), col("o_custkey"),
            col("o_orderdate").cast("date").as("first_d"))
          .withColumn("wb", wb(col("first_d")))
        val b = t(s, dir, "orders")
          .select(col("o_orderkey").as("next_key"),
            col("o_custkey").as("cust2"),
            col("o_orderdate").cast("date").as("next_d"))
          .withColumn("wb2", explode(array_distinct(array(
            wb(col("next_d")), wb(date_sub(col("next_d"), 6))))))
        a.join(b,
            col("o_custkey") === col("cust2") && col("wb") === col("wb2") &&
              col("next_d") > col("first_d") &&
              col("next_d") <= date_add(col("first_d"), 6))
          .select(col("first_key"), col("next_key"), col("first_d"),
            col("next_d"),
            datediff(col("next_d"), col("first_d")).cast("bigint").as("gap_days"))
          .orderBy("first_key", "next_key")
      },
      Some("""SELECT a.o_orderkey AS first_key, b.o_orderkey AS next_key,
             |  CAST(a.o_orderdate AS DATE) AS first_d,
             |  CAST(b.o_orderdate AS DATE) AS next_d,
             |  CAST(CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE)
             |       AS BIGINT) AS gap_days
             |FROM orders a JOIN orders b
             |  ON a.o_custkey = b.o_custkey
             | AND CAST(b.o_orderdate AS DATE) > CAST(a.o_orderdate AS DATE)
             | AND CAST(b.o_orderdate AS DATE) <= CAST(a.o_orderdate AS DATE) + 6
             |ORDER BY first_key, next_key""".stripMargin)),

    // ── bloom runtime-prefiltered join ──
    // A selective dim (15 of 100 suppliers) collapses to ONE
    // 128Kbit bloom scalar that drops non-matching lineitem rows
    // BEFORE the join shuffle — at 100 TB the exchange carries the
    // matching ~15% instead of the whole fact table. The exact join
    // that follows removes bloom false positives, so the oracle is
    // the plain join: the bloom buys shuffle reduction, never
    // semantics. BloomJoinSpec pins might_contain below the exchange.
    Q("q_join_bloom",
      (s, dir) => {
        val dim = t(s, dir, "supplier")
          .filter(col("s_nationkey") < 5)
          .select(col("s_suppkey"), col("s_nationkey"))
        val fact = t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"))
        graft.functions.BloomJoin
          .prefilter(fact, col("l_suppkey"), dim, col("s_suppkey"),
            estItems = 1024L, numBits = 131072L)
          .join(dim, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
               sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
          .orderBy("s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE s_nationkey < 5
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ── policy-conform salting: hot keys only (none on this corpus, ──
    // so the plan degenerates to the plain join — the point: zero
    // salting cost on unskewed data, same oracle as q_join_salted)
    Q("q_join_salted_auto",
      (s, dir) =>
        MapleJuice.saltedJoinHot(
            t(s, dir, "lineitem").select(col("l_suppkey"), col("l_extendedprice")),
            t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey"), col("s_suppkey"), salt = 8, hotThreshold = 5000)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
               sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
          .orderBy("s_nationkey"),
      Some("""SELECT s_nationkey, count(*) AS n_items,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // ── typed Aggregator tier (§2.12): majority vote as a UDAF ──
    // Same semantics and oracle shape as q_majority_vote, computed by
    // graft.functions.MajorityVote (Aggregator[Boolean,(Long,Long),String])
    Q("q_majority_vote_typed",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(udaf(graft.functions.MajorityVote, org.apache.spark.sql.Encoders.scalaBoolean)
            .apply(col("l_returnflag") === "R").as("winner"))
          .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey,
             |CASE WHEN 2 * SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > count(*)
             |     THEN 'R' ELSE 'other' END AS winner
             |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // ── custom whole-operator tier: heap-based per-key top-k ──
    // (graft.plans.TopKPerKey: LogicalPlan + SparkStrategy + Exec with
    // ClusteredDistribution — no per-partition sort, k-bounded memory)
    Q("q_topk_per_key",
      (s, dir) =>
        graft.plans.TopK.perKey(t(s, dir, "orders"), 3,
            Seq(col("o_custkey")),
            Seq(col("o_totalprice") -> false, col("o_orderkey") -> true))
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ── exact interpolated percentiles (R-7 / SQL-standard cont) ──
    Q("q_percentile",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
               expr("percentile(l_quantity, 0.9)").as("p90_qty"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |quantile_cont(l_quantity, 0.5) AS med_qty,
             |quantile_cont(l_quantity, 0.9) AS p90_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── approximate count-distinct (HLL++) with an in-query error bound ──
    // At 100 TB approximate is the default: the HLL sketch is mergeable
    // (one pass, partial+final, no Expand rewrite) and rsd trades sketch
    // memory for error. Another engine's sketch value can never
    // hash-match, so the CHECK is declared instead: the query emits the
    // exact count plus a boolean asserting |approx − exact| ≤ 10%·exact
    // (5× the configured rsd 0.02), and the oracle expects TRUE — a hash
    // mismatch means the sketch left its error envelope. HLL is
    // deterministic on fixed data, so the gate is stable, not flaky.
    Q("q_approx_distinct",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_cnt"),
               approx_count_distinct(col("l_partkey"), 0.02).as("approx_cnt"))
          .select(col("l_returnflag"), col("exact_cnt"),
            (abs(col("approx_cnt") - col("exact_cnt")) <=
              col("exact_cnt") * lit(0.1)).as("within_bound"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_cnt,
             |TRUE AS within_bound
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // ── mergeable sketch rollup: per-day HLL sketches → weekly union ──
    // The at-scale pattern for distinct counts over rollups: build the
    // DataSketches HLL once per day, then answer the WEEKLY distinct by
    // unioning day sketches — the re-aggregation consumes days × ~KB of
    // sketch bytes, never the events again. At 100 TB the daily sketch
    // build is the only full scan; every coarser rollup (week, month,
    // all-time) rides the persisted sketches. The exact arm re-scans
    // only to verify the envelope in-query (the q_approx_distinct
    // discipline: DuckDB can't hash-match an estimate, so the oracle
    // pins the exact count and requires within_bound = TRUE).
    Q("q_sketch_rollup",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(to_date(col("ts")).as("d"), col("user_id"))
          .withColumn("wk", floor(datediff(col("d"),
            lit(java.sql.Date.valueOf("2024-01-01"))) / 7).cast("long"))
        val daily = ev.groupBy(col("wk"), col("d"))
          .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
        val est = daily.groupBy(col("wk"))
          .agg(count(lit(1)).as("n_days"),
               expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_users"))
        val exact = ev.groupBy(col("wk"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        est.join(exact, "wk")
          .select(col("wk"), col("n_days"), col("exact_users"),
            (abs(col("est_users") - col("exact_users")) <=
              col("exact_users") * lit(0.05)).as("within_bound"))
          .orderBy("wk")
      },
      Some("""WITH e AS (SELECT CAST(ts AS DATE) AS d, user_id,
             |  CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS wk
             |  FROM events)
             |SELECT wk, CAST(count(DISTINCT d) AS BIGINT) AS n_days,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  TRUE AS within_bound
             |FROM e GROUP BY wk ORDER BY wk""".stripMargin)),

    // ── approximate percentiles (GK sketch) with a rank-error bound ──
    // The principled envelope for a quantile sketch is on RANK, not
    // value: with accuracy a, the returned value must sit within 1/a of
    // the requested rank fraction q. The query recomputes each
    // approximate percentile's true rank fraction (one extra scan,
    // broadcast of the 3-row sketch output) and emits the boolean;
    // frac_lt/frac_le bracket ties so heavy tie mass can't fail a
    // correct sketch.
    Q("q_approx_percentile",
      (s, dir) => {
        val pcts = Seq(0.1, 0.5, 0.9)
        val li = t(s, dir, "lineitem").select(col("l_extendedprice").as("x"))
        // bounded driver fetch (3 doubles — the kmeansFit precedent):
        // with the sketch values as literals, the rank check is ONE
        // conditional aggregate over one scan — no join in the plan at
        // all (the broadcast-cross alternative plans as a nested-loop)
        val sketchRow = li
          .agg(expr("approx_percentile(x, array(0.1D, 0.5D, 0.9D), 1000)").as("ps"))
          .head()
        // a zero-row input yields a NULL sketch — fail with a clear
        // message instead of an opaque NPE from the literal build
        require(!sketchRow.isNullAt(0),
          "approx_percentile returned no sketch — empty lineitem input?")
        val ps = sketchRow.getSeq[Double](0)
        val aggCols = pcts.indices.flatMap { i =>
          Seq(
            (sum(when(col("x") <= ps(i), 1L).otherwise(0L)) /
              count(lit(1))).as(s"fle_$i"),
            (sum(when(col("x") < ps(i), 1L).otherwise(0L)) /
              count(lit(1))).as(s"flt_$i"))
        }
        val stackArgs = pcts.indices
          .map(i => s"${pcts(i)}D, flt_$i, fle_$i").mkString(", ")
        li.agg(aggCols.head, aggCols.tail: _*)
          .select(expr(
            s"stack(${pcts.size}, $stackArgs) AS (q, frac_lt, frac_le)"))
          .select(col("q"),
            (col("frac_lt") - lit(0.011) <= col("q") &&
              col("q") <= col("frac_le") + lit(0.011)).as("within_bound"))
          .orderBy("q")
      },
      Some("""SELECT CAST(q AS DOUBLE) AS q, TRUE AS within_bound
             |FROM (VALUES (0.1), (0.5), (0.9)) t(q) ORDER BY q""".stripMargin)),

    // ── time-series gap fill: dense hourly grid + forward fill ──
    // The resample/ffill primitive: per-user hourly sums, a generated
    // dense hour grid between each user's first and last activity, and
    // last-observation-carried-forward via the ANSI count-over trick
    // (grp = running count of non-nulls → within (user, grp) exactly
    // one row is non-null, so max() broadcasts it to the gap rows —
    // no IGNORE NULLS dependence, identical in both engines). Hours
    // before a user's first observation keep NULL + is_gap. Scale: the
    // grid is |users| × their own active span (never the global span),
    // sequence/explode is per-row, and both windows partition by
    // user_id — no global window, no driver loop.
    Q("q_gapfill",
      (s, dir) => {
        val hourly = t(s, dir, "events")
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(Core.dsum(col("value"), 6, "psum"))
          // materialize once (r17): hourly feeds BOTH the grid bounds
          // and the join probe; without the checkpoint the two
          // subplans differ by their pushed null-filters, defeat
          // exchange reuse, and the plan scans+aggregates events
          // TWICE (plans/r17/q_gapfill_before.txt). hourly is
          // users × own-active-hours — corpus-bounded, far smaller
          // than events, safe to pin for the query's lifetime.
          .localCheckpoint(true)
        val grid = hourly.groupBy(col("user_id"))
          .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(col("user_id"),
            explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val wRun = Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wGrp = Window.partitionBy(col("user_id"), col("grp"))
        grid.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("grp", count(col("psum")).over(wRun))
          .withColumn("filled", max(col("psum")).over(wGrp))
          .withColumn("is_gap", col("psum").isNull)
          .select(col("user_id"), col("h"), col("filled"), col("is_gap"))
          .orderBy("user_id", "h")
      },
      Some(s"""WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS h,
              |  ${Core.dsumSql("value", 6, "psum")}
              |  FROM events GROUP BY 1, 2),
              |b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
              |grid AS (SELECT user_id,
              |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM b),
              |j AS (SELECT g.user_id, g.h, hr.psum
              |  FROM grid g LEFT JOIN hourly hr
              |    ON hr.user_id = g.user_id AND hr.h = g.h),
              |x AS (SELECT *, count(psum) OVER (PARTITION BY user_id ORDER BY h
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM j)
              |SELECT user_id, h,
              |  max(psum) OVER (PARTITION BY user_id, grp) AS filled,
              |  psum IS NULL AS is_gap
              |FROM x ORDER BY user_id, h""".stripMargin)),

    // ── blocked fuzzy join (record linkage): edit-distance ≤ 1 match ──
    // The classic entity-resolution shape: never levenshtein the cross
    // product — join on a cheap blocking key (here the first 6 digits
    // of the 9-digit name suffix), then verify the survivors with the
    // exact distance. Candidates stay linear in the block occupancy
    // (the LSH-band pattern from Dedup, with a code prefix as the
    // band); at 100 TB the blocks are the shuffle key and a skewed
    // block caps exactly like capBuckets. Spark and DuckDB both
    // implement unit-cost Levenshtein, so the verify predicate is
    // engine-identical.
    Q("q_fuzzy_join",
      (s, dir) => {
        // Fanned-out probe side (Tables.wide): supplier broadcasts, so
        // the block join + levenshtein verify all run in customer's
        // scan stage — single-task on a one-row-group file (measured
        // 0.39× fanned at sf0.1/32 cores; join output is re-sorted by
        // the final orderBy, so fan-out order is immaterial)
        val c = Tables.wide(s, dir, "customer").select(col("c_custkey"),
          expr("substring(c_name, 10)").as("c_sfx"),
          expr("substring(c_name, 10, 6)").as("blk"))
        val sup = t(s, dir, "supplier").select(col("s_suppkey"),
          expr("substring(s_name, 10)").as("s_sfx"),
          expr("substring(s_name, 10, 6)").as("blk"))
        c.join(sup, "blk")
          .withColumn("dist", levenshtein(col("c_sfx"), col("s_sfx")).cast("long"))
          .filter(col("dist") <= 1)
          .select(col("c_custkey"), col("s_suppkey"), col("dist"))
          .orderBy("c_custkey", "s_suppkey")
      },
      Some("""WITH c AS (SELECT c_custkey, substring(c_name, 10) AS c_sfx,
             |            substring(c_name, 10, 6) AS blk FROM customer),
             |s AS (SELECT s_suppkey, substring(s_name, 10) AS s_sfx,
             |       substring(s_name, 10, 6) AS blk FROM supplier)
             |SELECT c_custkey, s_suppkey, CAST(levenshtein(c_sfx, s_sfx) AS BIGINT) AS dist
             |FROM c JOIN s USING (blk)
             |WHERE levenshtein(c_sfx, s_sfx) <= 1
             |ORDER BY c_custkey, s_suppkey""".stripMargin)),

    // ── approximate heavy hitters: Count-Min sketch with error envelope ──
    // Same verification pattern as q_approx_distinct/q_approx_percentile:
    // DuckDB has no Count-Min, so the oracle pins the EXACT top-10 keys
    // and requires within_bound = TRUE — the sketch guarantee
    // (exact ≤ est ≤ exact + ε·N at confidence δ) is asserted in-query,
    // so an envelope escape is a hash mismatch, not a silent pass. The
    // sketch is one mergeable aggregate (O(width·depth) state per
    // partition, the streaming/distributed shape); the driver touches
    // only the serialized sketch + the 10 result rows — both bounded.
    Q("q_approx_topk",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val aggRow = ev.agg(
          expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"),
          count(lit(1)).as("n")).head()
        val sk = org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(aggRow.getAs[Array[Byte]]("sk")))
        val slack = math.max(1L, math.ceil(0.001 * aggRow.getAs[Long]("n")).toLong)
        val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("user_id")).limit(10)
          .collect() // bounded: exactly 10 rows
          .map { r =>
            val (u, cnt) = (r.getAs[Long]("user_id"), r.getAs[Long]("cnt"))
            val est = sk.estimateCount(u)
            (u, cnt, est >= cnt && est <= cnt + slack)
          }.toSeq
        import s.implicits._
        top.toDF("user_id", "cnt", "within_bound")
          .orderBy(col("cnt").desc, col("user_id"))
      },
      Some("""SELECT user_id, cnt, TRUE AS within_bound FROM (
             |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
             |  ORDER BY cnt DESC, user_id LIMIT 10) t
             |ORDER BY cnt DESC, user_id""".stripMargin)),

    // ── ordered funnel: view → click → purchase, strictly in sequence ──
    // The product-analytics staple. Each stage is one conditional min
    // per user JOINED against the previous stage's timestamp — the
    // strict ts ordering ("clicked AFTER first view") is what separates
    // a funnel from three independent counts. Three keyed aggregations
    // + two user-keyed joins, all on the same user_id shuffle key; no
    // windows over the raw stream, so the heavy relation collapses to
    // per-user scalars at the first aggregate. (The 100 TB shape:
    // stage relations are user-sized, events are scanned once per
    // stage with the event_type filter pushed to parquet.)
    Q("q_funnel",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
          .unionByName(c.agg(count(lit(1)).as("users"))
            .select(lit("2_click").as("stage"), col("users")))
          .unionByName(p.agg(count(lit(1)).as("users"))
            .select(lit("3_purchase").as("stage"), col("users")))
          .orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
             |       WHERE event_type = 'view' GROUP BY user_id),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
             |      JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |      GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
             |      JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |      GROUP BY e.user_id)
             |SELECT '1_view' AS stage, count(*) AS users FROM v
             |UNION ALL SELECT '2_click', count(*) FROM c
             |UNION ALL SELECT '3_purchase', count(*) FROM p
             |ORDER BY stage""".stripMargin)),

    // ── sequence pattern matching: the MATCH_RECOGNIZE analog ──
    // Order-sensitive behavior detection the funnel above can't
    // express: "a view, then a click, then a purchase, with NO error
    // anywhere between" is the regex `v[^e]*c[^e]*p` over each user's
    // event-type sequence, not a conjunction of per-stage aggregates.
    // Scale shape (round-17 group-array sweep): the old form
    // collect_list'ed the user's ENTIRE history into one aggregation
    // buffer before matching — by this repo's own whale assumption
    // (the q_target_encode headroom row prices a user at n_u ≈ 9e7
    // events) that is a GB-scale array in a single buffer, the one
    // aggregation shape that cannot spill. The regex instead
    // decomposes into chained running maxima over the user-ordered
    // event stream — a match `v…c…p` with no 'e' inside exists iff
    //   a 'c' at j is ARMED when last_v(<j) > last_e(<j)   (that v
    //     has no e between itself and j), and
    //   a 'p' at k CONVERTS when last_armed_c(<k) > last_e(<k)
    // (each "last_x" a spillable per-user window running max; the
    // equivalence is two-sided: the most-recent qualifying position
    // witnesses a match, and any match forces the inequality).
    // seq_head needs only the first 40 codes (rn-capped ≤41-element
    // array) and n_events is a count, so per-user state is O(1): the
    // corpus shuffles ONCE on user_id, both WindowExec passes and the
    // final groupBy reuse that partitioning, and nothing buffers a
    // whale. The DuckDB twin keeps the string_agg + regexp form as
    // the independent oracle of the decomposition; EventPatternSpec
    // fuzzes the automaton against java.util.regex on random tapes.
    Q("q_event_pattern",
      (s, dir) => {
        val code = expr(
          """CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
            |  WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
            |  ELSE 'e' END""".stripMargin)
        eventPatternScan(
          t(s, dir, "events")
            .select(col("user_id"), col("ts"), col("event_id"),
              code.as("code")))
      },
      Some("""WITH c AS (SELECT user_id, ts, event_id,
             |  CASE event_type WHEN 'signup' THEN 's' WHEN 'view' THEN 'v'
             |    WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
             |    ELSE 'e' END AS code FROM events),
             |sq AS (SELECT user_id,
             |  string_agg(code, '' ORDER BY ts, event_id) AS seq,
             |  CAST(count(*) AS BIGINT) AS n_events
             |  FROM c GROUP BY user_id)
             |SELECT user_id, n_events, substring(seq, 1, 40) AS seq_head,
             |  regexp_matches(seq, 'v[^e]*c[^e]*p') AS converted_clean
             |FROM sq ORDER BY user_id""".stripMargin)),

    // ── daily new vs returning users + cumulative uniques ──
    // The growth-accounting staple, computed WITHOUT a count(distinct)
    // over a growing window (which reshuffles the whole history every
    // day): a user's first-ever day comes from one per-user min, daily
    // new = count of first days landing on that day, cumulative uniques
    // = running sum of daily new — so every relation after the first
    // two aggregates is DAY-sized. The final window runs over ~30 rows
    // (one per day) — a single-partition WindowExec over a day-count
    // relation, not over events. Exact integer arithmetic throughout.
    Q("q_new_returning",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
        val active = ev.distinct()
        val firsts = active.groupBy("user_id").agg(min(col("d")).as("fd"))
        val nActive = active.groupBy("d").agg(count(lit(1)).as("n_active"))
        val nNew = firsts.groupBy(col("fd").as("d"))
          .agg(count(lit(1)).as("n_new"))
        val w = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        nActive.join(nNew, Seq("d"), "left")
          .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
          .withColumn("n_returning", col("n_active") - col("n_new"))
          .withColumn("cum_users", sum(col("n_new")).over(w))
          .select("d", "n_active", "n_new", "n_returning", "cum_users")
          .orderBy("d")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |f AS (SELECT user_id, min(d) AS fd FROM a GROUP BY user_id),
             |na AS (SELECT d, CAST(count(*) AS BIGINT) AS n_active FROM a GROUP BY d),
             |nn AS (SELECT fd AS d, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY fd)
             |SELECT na.d, n_active, coalesce(n_new, 0) AS n_new,
             |  n_active - coalesce(n_new, 0) AS n_returning,
             |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY na.d
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_users
             |FROM na LEFT JOIN nn ON nn.d = na.d
             |ORDER BY na.d""".stripMargin)),

    // ── rolling 7-day active users (WAU) + stickiness per day ──
    // The sliding-window count-distinct: a distinct over a MOVING
    // window has no partial-aggregate form, so the scalable shape is
    // the explode-by-window-length trick — each (user, day) activation
    // contributes itself to the 7 window-end days it falls in (a
    // map-only ×7 expansion of the DAY-sized activation relation, not
    // of events), then one distinct + one keyed count per window end.
    // Trailing phantom days (windows ending after the last event day)
    // drop out via the inner join with the observed-day DAU relation.
    // dau/wau is the single-rounding stickiness ratio. At 100 TB the
    // expansion factor is the window length — tunable, never
    // data-dependent — and events collapse to activations at the
    // FIRST aggregate.
    Q("q_rolling_active",
      (s, dir) => {
        val a = t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val wau = a
          .select(col("user_id"),
            explode(expr("sequence(d, date_add(d, 6))")).as("wd"))
          .distinct()
          .groupBy("wd").agg(count(lit(1)).as("wau"))
        val dau = a.groupBy(col("d").as("wd")).agg(count(lit(1)).as("dau"))
        dau.join(wau, "wd")
          .withColumn("stickiness", col("dau").cast("double") / col("wau"))
          .select("wd", "dau", "wau", "stickiness")
          .orderBy("wd")
      },
      Some("""WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
             |w AS (SELECT DISTINCT user_id,
             |    CAST(unnest(generate_series(d::TIMESTAMP,
             |      d::TIMESTAMP + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS wd
             |  FROM a),
             |wau AS (SELECT wd, CAST(count(*) AS BIGINT) AS wau FROM w GROUP BY wd),
             |dau AS (SELECT d AS wd, CAST(count(*) AS BIGINT) AS dau FROM a GROUP BY d)
             |SELECT wd, dau, wau, CAST(dau AS DOUBLE) / wau AS stickiness
             |FROM dau JOIN wau USING (wd) ORDER BY wd""".stripMargin)),

    // ── association rules: support / confidence / lift over baskets ──
    // Market-basket mining, the A-Priori candidate-pair step at its
    // core: baskets are customers, items the suppliers they buy from.
    // The pair expansion is the per-basket self-join — quadratic ONLY
    // in basket size (bounded by a customer's supplier breadth, ~40
    // here; a production run caps or samples oversized baskets), then
    // ONE keyed aggregate with map-side combine collapses it to the
    // distinct-pair relation. Metrics stay RATIONAL (truncating BIGINT
    // fixed-point — support·10⁶, confidence·10⁶, lift·10⁴) so the
    // ranking is bit-exact cross-engine; n is a bounded driver scalar
    // (the q_tfidf idiom). Top-20 by lift plans as
    // TakeOrderedAndProject — never a full sort of the pair relation.
    Q("q_assoc_rules",
      (s, dir) => {
        // the (customer, supplier) incidence is the SHARED bucketed
        // artifact (Graph.custSupp, clustered on c) — the basket
        // self-join below reads co-located buckets on both sides
        val cs = Graph.custSupp(s, dir)
          .select(col("c"), col("sp").as("s"))
        val n = cs.select(col("c")).distinct().count()
        val c1 = cs.groupBy(col("s")).agg(count(lit(1)).as("c1"))
        val pairs = cs.select(col("c"), col("s").as("s1"))
          .join(cs.select(col("c"), col("s").as("s2")), "c")
          .filter(col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("w"))
        pairs
          // supplier-scaled count table: no broadcast hint (AQE decides)
          .join(c1.select(col("s").as("s1"), col("c1").as("n1")), "s1")
          .join(c1.select(col("s").as("s2"), col("c1").as("n2")), "s2")
          .withColumn("support_fp", expr(s"(w * 1000000L) div ${n}L"))
          .withColumn("conf_fp", expr("(w * 1000000L) div n1"))
          // lift from the already-divided confidence (the q_gains
          // overflow discipline): w·n·10⁴ wraps int64 once w·n passes
          // ~9.2e14, while conf_fp·n is bounded by 10⁶·n; the extra
          // div-truncation is identical in both engines
          .withColumn("lift_fp",
            expr(s"((w * 1000000L div n1) * ${n}L) div (n2 * 100L)"))
          .select("s1", "s2", "w", "support_fp", "conf_fp", "lift_fp")
          .orderBy(col("lift_fp").desc, col("s1"), col("s2"))
          .limit(20)
      },
      Some("""WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |nb AS (SELECT count(DISTINCT c) AS n FROM cs),
             |c1 AS (SELECT s, count(*) AS c1 FROM cs GROUP BY s),
             |p AS (SELECT a.s AS s1, b.s AS s2, count(*) AS w
             |      FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
             |      GROUP BY a.s, b.s)
             |SELECT p.s1, p.s2, p.w,
             |  CAST((p.w * 1000000) // nb.n AS BIGINT) AS support_fp,
             |  CAST((p.w * 1000000) // a1.c1 AS BIGINT) AS conf_fp,
             |  CAST(((p.w * 1000000 // a1.c1) * nb.n) // (a2.c1 * 100)
             |    AS BIGINT) AS lift_fp
             |FROM p JOIN c1 a1 ON a1.s = p.s1 JOIN c1 a2 ON a2.s = p.s2
             |CROSS JOIN nb
             |ORDER BY lift_fp DESC, s1, s2 LIMIT 20""".stripMargin)),

    // ── 2-D skyline (Pareto frontier): min price, max size ──
    // A part is kept iff no other part has price ≤ AND size ≥ with at
    // least one strict. Sort-based plan, not the quadratic NOT-EXISTS:
    // collapse to per-price max size (distributed aggregate), cummax
    // over the price-sorted group relation, keep rows beating every
    // strictly-cheaper group (run_prev < size) that also top their own
    // price group (size = gmax — same-price ties both survive only at
    // the group max). The single-partition window runs over DISTINCT
    // prices, already aggregated — O(groups), not O(rows); at 100 TB
    // the aggregate prunes map-side first (the classic local-skyline →
    // global-merge shape). The oracle is the INDEPENDENT quadratic
    // dominance definition, so agreement checks the sort-based
    // rewrite itself.
    Q("q_skyline",
      (s, dir) => {
        val p = t(s, dir, "part")
        val g = p.groupBy(col("p_retailprice")).agg(max(col("p_size")).as("gmax"))
        val wPrev = Window.orderBy(col("p_retailprice"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val g2 = g.withColumn("run_prev", max(col("gmax")).over(wPrev))
        p.join(g2, Seq("p_retailprice"))
          .filter(col("p_size") === col("gmax") &&
            (col("run_prev").isNull || col("run_prev") < col("p_size")))
          .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, p_retailprice, p_size FROM part p
             |WHERE NOT EXISTS (SELECT 1 FROM part q
             |  WHERE q.p_retailprice <= p.p_retailprice
             |    AND q.p_size >= p.p_size
             |    AND (q.p_retailprice < p.p_retailprice
             |         OR q.p_size > p.p_size))
             |ORDER BY p_partkey""".stripMargin)),

    // ── growth accounting (new / retained / resurrected / churned) ──
    // The full DAU decomposition q_new_returning only splits in two:
    // per day, NEW (first-ever day), RETAINED (also active yesterday),
    // RESURRECTED (active before, dark yesterday), and CHURNED
    // (yesterday's actives who went dark today — reported against
    // today). Conservation laws hold by construction and are
    // spec-pinned: new+retained+resurrected = active(d), and
    // retained(d) + churned(d) = active(d−1) for consecutive days.
    // One distinct user-day relation, one self-join shifted by a day
    // (user-keyed — the q_seqpat shape), one first-day broadcast.
    Q("q_growth_acct",
      (s, dir) => {
        val active = t(s, dir, "events")
          .select(col("user_id"),
            expr("(unix_micros(ts) - 1704067200000000L)" +
              " div 86400000000L").as("d"))
          .distinct().localCheckpoint(true)
        val firsts = active.groupBy("user_id").agg(min(col("d")).as("fd"))
        val prev = active.select(col("user_id"), (col("d") + 1L).as("d"))
        val today = active
          .join(firsts, "user_id")
          .join(prev.withColumn("was_prev", lit(1L)),
            Seq("user_id", "d"), "left")
          .groupBy("d")
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("fd") === col("d"), 1L).otherwise(0L)).as("n_new"),
            sum(when(col("fd") < col("d") && col("was_prev").isNotNull, 1L)
              .otherwise(0L)).as("n_retained"),
            sum(when(col("fd") < col("d") && col("was_prev").isNull, 1L)
              .otherwise(0L)).as("n_resurrected"))
        val churn = active.select(col("user_id"), col("d"))
          .join(active.select(col("user_id"),
            (col("d") - 1L).as("d")).withColumn("again", lit(1L)),
            Seq("user_id", "d"), "left")
          .filter(col("again").isNull)
          .groupBy((col("d") + 1L).as("d"))
          .agg(count(lit(1)).as("n_churned"))
        today.join(churn, Seq("d"), "left")
          .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
          .orderBy("d")
      },
      Some("""WITH active AS (
             |  SELECT DISTINCT user_id,
             |    (epoch_us(ts) - 1704067200000000) // 86400000000 AS d
             |  FROM events),
             |firsts AS (SELECT user_id, MIN(d) AS fd
             |           FROM active GROUP BY user_id),
             |today AS (SELECT a.d, CAST(count(*) AS BIGINT) AS n_active,
             |    CAST(SUM(CASE WHEN f.fd = a.d THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_new,
             |    CAST(SUM(CASE WHEN f.fd < a.d AND p.user_id IS NOT NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
             |    CAST(SUM(CASE WHEN f.fd < a.d AND p.user_id IS NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
             |  FROM active a JOIN firsts f ON f.user_id = a.user_id
             |  LEFT JOIN active p ON p.user_id = a.user_id
             |    AND p.d = a.d - 1
             |  GROUP BY a.d),
             |churn AS (SELECT a.d + 1 AS d, CAST(count(*) AS BIGINT)
             |    AS n_churned
             |  FROM active a LEFT JOIN active n ON n.user_id = a.user_id
             |    AND n.d = a.d + 1
             |  WHERE n.user_id IS NULL
             |  GROUP BY a.d + 1)
             |SELECT t.d, n_active, n_new, n_retained, n_resurrected,
             |  CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
             |FROM today t LEFT JOIN churn c ON c.d = t.d
             |ORDER BY t.d""".stripMargin))
  )
}
