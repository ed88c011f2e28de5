package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.engine.Tables

/** TPC-H-shaped composite queries: multi-join + filter + aggregate
  * pipelines proving the operators compose into the analytics a real
  * user runs — Catalyst handles join order, pushdown, and partial
  * aggregation across the whole tree (verify with PlanAudit).
  * Revenue = sum(extendedprice * (1 - discount)) summed via the
  * fixed-point recipe (floor(x·10⁴), exact integer sum, one rescale):
  * double PRODUCTS cast to decimal land on rounding ties that Spark
  * (HALF_UP) and DuckDB resolve differently, so every product sum in
  * this file uses [[psum]] — raw-column sums (exact parquet decimals)
  * keep plain decimal accumulation.
  */
object Composite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Fixed-point sum of a computed double: bit-deterministic in both
    * engines (see q_tpch_q1 note / SCALE.md round-2 deltas). */
  private def psum(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(floor(e * lit(10000.0)).cast(DecimalType(28, 0))).cast("double") /
      lit(10000.0)
  // ($e) parenthesized: an additive expression would otherwise bind
  // the ·10⁴ to its last term only (caught by q_tpch_q9's profit)
  private def psumDuck(e: String): String =
    s"CAST(SUM(CAST(floor(($e) * 10000.0) AS DECIMAL(28,0))) AS DOUBLE) / 10000.0"

  private val revSpark = psum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
  private val revDuck = psumDuck("l_extendedprice * (1.0 - l_discount)")

  val queries: Seq[Q] = Seq(

    // ── TPC-H Q3 shape: segment filter, date windows, top-10 revenue ──
    Q("q_tpch_q3",
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") < lit("1998-01-01"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > lit("1998-01-01"))
          .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_odate"))
          .agg(revSpark.as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10),
      Some(s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_odate,
              |$revDuck AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |  AND l_shipdate > TIMESTAMP '1998-01-01'
              |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
              |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── TPC-H Q5 shape: 6-table join, local-supplier condition ──
    Q("q_tpch_q5",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(revSpark.as("revenue"), count(lit(1)).as("n_items"))
          .orderBy("n_name"),
      Some(s"""SELECT n_name, $revDuck AS revenue, count(*) AS n_items
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ── TPC-H Q1 shape: pricing summary — the canonical wide-agg scan ──
    // One pass over lineitem, partial+final aggregation of 8 measures.
    // Raw-column sums use decimal accumulation (the parquet doubles are
    // exact decimals, so the cast never rounds). PRODUCT sums cannot use
    // a double→decimal cast: the product's low bits land on rounding
    // ties that Spark (HALF_UP) and DuckDB resolve differently — so
    // products are fixed-pointed via floor(x·10⁴) (bit-deterministic in
    // both engines), summed exactly, and rescaled once.
    Q("q_tpch_q1",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Core.dsum(col("l_quantity"), 4, "sum_qty"),
            Core.dsum(col("l_extendedprice"), 4, "sum_base_price"),
            psum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            psum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax"))).as("sum_charge"),
            (sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double") /
              count(lit(1))).as("avg_qty"),
            (sum(col("l_discount").cast(DecimalType(18, 6))).cast("double") /
              count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             |CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0) AS DECIMAL(28,0))) AS DOUBLE) / 10000.0 AS sum_disc_price,
             |CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0) AS DECIMAL(28,0))) AS DOUBLE) / 10000.0 AS sum_charge,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
             |CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── TPC-H Q6 shape: forecast revenue — pure pushdown showcase ──
    // Filter + global sum: every predicate must reach the parquet scan
    // (PushedFilters), the aggregate is a two-row exchange.
    Q("q_tpch_q6",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg(psum(col("l_extendedprice") * col("l_discount")).as("revenue"),
            count(lit(1)).as("n_rows"))
          .select(col("revenue"), col("n_rows")),
      Some(s"""SELECT
             |${psumDuck("l_extendedprice * l_discount")} AS revenue,
             |count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.03 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // ── TPC-H Q4 shape: priority counting via EXISTS (left-semi) ──
    // The testdata has no l_commitdate, so "late" is l_shipdate after
    // the order date — same correlated-EXISTS plan shape: a LeftSemi
    // hash join on the equi key with the non-equi lateness predicate as
    // the join residual, never a per-order subquery execution.
    Q("q_tpch_q4",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1996-04-01"))
        o.join(t(s, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ── TPC-H Q10 shape: returned-item revenue ranking, top 20 ──
    // Customer × orders × returned lineitems × broadcast nation; ties
    // in revenue broken by the unique c_custkey so the LIMIT cut is
    // deterministic in both engines.
    Q("q_tpch_q10",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-04-01"))
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_returnflag") === "R")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("n_name"))
          .agg(revSpark.as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revDuck AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
              |  AND o_orderdate < TIMESTAMP '1997-04-01'
              |  AND l_returnflag = 'R'
              |GROUP BY c_custkey, c_name, c_acctbal, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // ── TPC-H Q12 shape: conditional priority counts per line status ──
    // (No l_shipmode column — l_linestatus plays the grouping role.)
    // The CASE sums ride the partial+final aggregate; sums of ints are
    // BIGINT-cast in the oracle to match Spark's LongType.
    Q("q_tpch_q12",
      (s, dir) =>
        t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
              .otherwise(1L)).as("low_line_count"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // ── TPC-H Q13 shape: customer order-count distribution ──
    // LEFT join with the priority predicate in the ON clause (customers
    // whose only orders are 5-LOW must survive with count 0), then an
    // aggregate OF an aggregate — two shuffles, both on shrinking keys.
    Q("q_tpch_q13",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"),
            col("c_custkey") === col("o_custkey") &&
              col("o_orderpriority") =!= "5-LOW", "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
             |  GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ── TPC-H Q14 shape: promo revenue ratio ──
    // Two fixed-point sums over one scan (the CASE zeroes ride the same
    // aggregate), one final double division — identical op order in
    // both engines keeps the ratio bit-deterministic.
    Q("q_tpch_q14",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-09-01") &&
            col("l_shipdate") < lit("1997-10-01"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) *
              psum(when(col("p_type") === "PROMO",
                col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .otherwise(lit(0.0))) /
              psum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("promo_revenue"),
            count(lit(1)).as("n_rows")),
      Some(s"""SELECT
              |100.0 * (${psumDuck("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")})
              |  / (${psumDuck("l_extendedprice * (1.0 - l_discount)")}) AS promo_revenue,
              |count(*) AS n_rows
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
              |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin)),

    // ── TPC-H Q17 shape: small-quantity orders vs per-part average ──
    // The correlated scalar subquery becomes one per-part aggregate
    // joined back on the key — a shuffle on p_partkey, never a
    // per-row subquery. The brand filter is pushed BELOW the
    // threshold aggregate: only ~1/25 of parts are Brand#12, so both
    // the aggregate and the probe side semi-join to the (tiny,
    // broadcast) filtered key set first — identical answers (a
    // non-brand part's threshold is never consulted; the semi-join
    // keeps EVERY lineitem of a surviving part, so its per-part
    // average is unchanged), but at 100× scale the unfiltered
    // full-lineitem aggregate this replaces would dominate the query.
    // Threshold math (0.2 × decimal-exact average) is written in the
    // same op order in both engines.
    Q("q_tpch_q17",
      (s, dir) => {
        val brandKeys = t(s, dir, "part")
          .filter(col("p_brand") === "Brand#12")
          .select(col("p_partkey"))
        val liBrand = t(s, dir, "lineitem")
          .join(broadcast(brandKeys),
            col("l_partkey") === col("p_partkey"), "left_semi")
        val thresholds = liBrand.groupBy(col("l_partkey").as("t_partkey"))
          .agg((lit(0.2) *
            (sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double") /
              count(lit(1)))).as("qty_threshold"))
        liBrand
          .join(thresholds, col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("qty_threshold"))
          .agg((Core.dsum(col("l_extendedprice"), 4, "s") / lit(7.0))
            .as("avg_yearly"), count(lit(1)).as("n_rows"))
          .select(col("avg_yearly"), col("n_rows"))
      },
      Some("""SELECT
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
             |count(*) AS n_rows
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN (SELECT l_partkey AS t_partkey,
             |        0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) AS qty_threshold
             |      FROM lineitem GROUP BY l_partkey) t
             |  ON l_partkey = t_partkey
             |WHERE p_brand = 'Brand#12'
             |  AND l_quantity < qty_threshold""".stripMargin)),

    // ── TPC-H Q18 shape: large-volume customers (HAVING semi-join) ──
    // The HAVING subquery is one keyed aggregate whose survivors join
    // back to orders — at scale the survivor set is small, so AQE turns
    // the join-back into a broadcast. o_totalprice ties break on the
    // unique o_orderkey.
    Q("q_tpch_q18",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(Core.dsum(col("l_quantity"), 4, "sum_qty"))
          .filter(col("sum_qty") > 300.0)
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            to_date(col("o_orderdate")).as("o_odate"), col("o_totalprice"),
            col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
             |  CAST(o_orderdate AS DATE) AS o_odate, o_totalprice, sum_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN (SELECT l_orderkey,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 300.0) b
             |  ON o_orderkey = b.l_orderkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ── TPC-H Q22 shape: dormant rich customers (anti-join + scalar) ──
    // (No c_phone column — c_nationkey plays the country-code role; and
    // since the generator gives every customer at least one order,
    // "dormant" means no URGENT order — the anti-join side carries a
    // pushed filter instead of being the full table.)
    // The global average is a bounded one-row driver fetch (the scalar
    // subquery Spark itself would plan as a 1-row broadcast cross —
    // fetching it avoids a BroadcastNestedLoopJoin in the audit); the
    // NOT EXISTS is a LeftAnti hash join on the customer key.
    Q("q_tpch_q22",
      (s, dir) => {
        val cand = t(s, dir, "customer")
          .filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
        val avgRow = cand.filter(col("c_acctbal") > 0.0)
          .agg((sum(col("c_acctbal").cast(DecimalType(18, 4))).cast("double") /
            count(lit(1))).as("a"))
          .head() // bounded: exactly one row, one double
        // no positive balances → NULL average; the oracle's scalar
        // subquery then filters every row, so mirror that with an
        // empty result instead of NPE-ing on getDouble
        val balFilter =
          if (avgRow.isNullAt(0)) lit(false)
          else col("c_acctbal") > avgRow.getDouble(0)
        cand.filter(balFilter)
          .join(t(s, dir, "orders")
              .filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            Core.dsum(col("c_acctbal"), 4, "totacctbal"))
          .orderBy("cntrycode")
      },
      Some("""SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
             |FROM customer
             |WHERE c_nationkey IN (1,3,5,7,9)
             |  AND c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
             |                   FROM customer
             |                   WHERE c_nationkey IN (1,3,5,7,9) AND c_acctbal > 0.0)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey
             |ORDER BY cntrycode""".stripMargin)),

    // ── TPC-H Q7 shape: trade volume between two nation pairs ──
    // lineitem ⋈ supplier and orders ⋈ customer resolve the two nation
    // sides, both through the same broadcast nation dim under different
    // aliases; the pair filter is an OR the planner keeps above the
    // joins. Grouped by the (supp, cust, year) triple.
    Q("q_tpch_q7",
      (s, dir) => {
        val n1 = broadcast(t(s, dir, "nation"))
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = broadcast(t(s, dir, "nation"))
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(n1, col("s_nationkey") === col("n1_key"))
          .join(n2, col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
            (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(revSpark.as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |  year(l_shipdate) AS l_year, $revDuck AS revenue
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
              |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
              |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)),

    // ── TPC-H Q15 shape: top supplier(s) by windowed revenue ──
    // The CREATE VIEW + max() correlated pattern becomes: one keyed
    // revenue aggregate, its global max as a ONE-ROW broadcast
    // equi-joined back on the revenue value (a BroadcastHashJoin on the
    // fixed-point-exact double — never a nested-loop), ties kept like
    // the spec's multi-supplier case.
    Q("q_tpch_q15",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1997-01-01") &&
            col("l_shipdate") < lit("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(revSpark.as("total_rev"))
        val mx = rev.agg(max(col("total_rev")).as("max_rev"))
        rev.join(broadcast(mx), col("total_rev") === col("max_rev"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey, $revDuck AS total_rev
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |    AND l_shipdate < TIMESTAMP '1997-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_rev
              |FROM rev JOIN supplier ON l_suppkey = s_suppkey
              |WHERE total_rev = (SELECT max(total_rev) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // ── TPC-H Q8 shape: national market share within a region ──
    // One nation's share of a region's part-type trade per year: the
    // supplier side resolves the numerator nation, the customer side
    // (through broadcast nation + region) scopes the denominator; both
    // fixed-point sums ride ONE aggregate and divide once — the same
    // bit-deterministic ratio recipe as Q14.
    Q("q_tpch_q8",
      (s, dir) => {
        val nCust = broadcast(t(s, dir, "nation"))
          .select(col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
        val nSupp = broadcast(t(s, dir, "nation"))
          .select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(col("p_type") === "LARGE")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(nCust, col("c_nationkey") === col("nc_key"))
          .join(broadcast(t(s, dir, "region")), col("nc_region") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(nSupp, col("s_nationkey") === col("ns_key"))
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(
            (psum(when(col("supp_nation") === "NATION_3",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .otherwise(lit(0.0))) /
              psum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
              .as("mkt_share"),
            count(lit(1)).as("n_rows"))
          .orderBy("o_year")
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |(${psumDuck("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")})
              |  / (${psumDuck("l_extendedprice * (1.0 - l_discount)")}) AS mkt_share,
              |count(*) AS n_rows
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |JOIN region ON n1.n_regionkey = r_regionkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |WHERE p_type = 'LARGE' AND r_name = 'ASIA'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1998-01-01'
              |GROUP BY year(o_orderdate)
              |ORDER BY o_year""".stripMargin)),

    // ── TPC-H Q21 shape: suppliers who kept orders waiting ──
    // The hardest classic correlation: count a supplier's late lines
    // (shipped > 30 days after the order date, standing in for the
    // missing receipt/commit dates) on multi-supplier orders where it
    // was the ONLY late supplier — EXISTS becomes a left-semi join on
    // the order key (another supplier exists), NOT EXISTS a left-anti
    // join whose condition carries the outer row's order date (another
    // LATE supplier must not exist). Both correlations are hash joins
    // on l_orderkey — never per-row subqueries.
    Q("q_tpch_q21",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val late1 = li
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
        val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
          col("l_shipdate").as("d3"))
        late1
          .join(l2, col("l_orderkey") === col("k2") &&
            col("l_suppkey") =!= col("s2"), "left_semi")
          .join(l3, col("l_orderkey") === col("k3") &&
            col("l_suppkey") =!= col("s3") &&
            col("d3") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_anti")
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),

    // ── TPC-H Q9 shape: product-type profit by nation and year ──
    // (No partsupp: the supply cost's role — a per-part cost scaling
    // with volume — is played by 0.5 × p_retailprice × quantity.)
    // The classic 5-way star join filtered by a part-name substring;
    // profit rides ONE fixed-point product sum per (nation, year).
    Q("q_tpch_q9",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(col("p_name").contains("red"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(psum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            lit(0.5) * col("p_retailprice") * col("l_quantity"))
            .as("sum_profit"), count(lit(1)).as("n_rows"))
          .orderBy(col("nation"), col("o_year").desc),
      Some(s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
              |${psumDuck("l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity")} AS sum_profit,
              |count(*) AS n_rows
              |FROM lineitem
              |JOIN part ON l_partkey = p_partkey
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN nation ON s_nationkey = n_nationkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY n_name, year(o_orderdate)
              |ORDER BY nation, o_year DESC""".stripMargin)),

    // ── TPC-H Q11 shape: important stock identification ──
    // (partsupp value → per-part revenue from the two-nation supplier
    // scope.) The signature is the scalar-subquery-in-HAVING: a
    // keyed aggregate filtered against a FRACTION of its own global
    // sum — here the global is a 1-row broadcast cross join (never a
    // per-row subquery), the fraction compare one double multiply.
    Q("q_tpch_q11",
      (s, dir) => {
        val scoped = t(s, dir, "lineitem")
          .join(t(s, dir, "supplier").filter(col("s_nationkey").isin(3, 8)),
            col("l_suppkey") === col("s_suppkey"))
        val perPart = scoped.groupBy(col("l_partkey"))
          .agg(Core.dsum(col("l_extendedprice"), 4, "value"))
        val total = perPart.agg(sum(col("value").cast(DecimalType(28, 4)))
          .cast("double").as("total_value"))
        perPart.crossJoin(broadcast(total))
          .filter(col("value") > lit(0.001) * col("total_value"))
          .select(col("l_partkey"), col("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""WITH v AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  WHERE s_nationkey IN (3, 8)
             |  GROUP BY l_partkey),
             |g AS (SELECT CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
             |        AS total_value FROM v)
             |SELECT l_partkey, value FROM v CROSS JOIN g
             |WHERE value > 0.001 * total_value
             |ORDER BY value DESC, l_partkey""".stripMargin)),

    // ── TPC-H Q16 shape: supplier counts per part attribute ──
    // (The pseudo-partsupp is the distinct (part, supplier) incidence
    // from lineitem; the complaints NOT-IN becomes a left-anti hash
    // join on a supplier-name predicate.) Exact COUNT(DISTINCT) per
    // narrow group — the Expand is per-group-bounded, never global.
    Q("q_tpch_q16",
      (s, dir) => {
        val complainers = t(s, dir, "supplier")
          .filter(col("s_name").endsWith("7")).select(col("s_suppkey"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(col("p_brand") =!= "Brand#45" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .join(broadcast(complainers),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#45'
             |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_name LIKE '%7')
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // ── TPC-H Q20 shape: suppliers shipping excess volume ──
    // (availqty → the supplier's all-time quantity of the part; the
    // nested IN-subqueries become one keyed aggregate with a
    // conditional sum and a left-semi join back to suppliers.) A
    // supplier qualifies when 1997 shipments of some part exceed
    // half its all-time volume of that part.
    Q("q_tpch_q20",
      (s, dir) => {
        val ps = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(Core.dsum(col("l_quantity"), 4, "total_qty"),
            sum(when(col("l_shipdate") >= lit("1997-01-01") &&
              col("l_shipdate") < lit("1998-01-01"),
              col("l_quantity").cast(DecimalType(18, 4)))
              .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 4))))
              .cast("double").as("qty_1997"))
          .filter(col("qty_1997") > lit(0.5) * col("total_qty"))
          .select(col("l_suppkey"))
        t(s, dir, "supplier").filter(col("s_nationkey") === 3)
          .join(ps, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name
             |FROM supplier
             |WHERE s_nationkey = 3
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem
             |    GROUP BY l_suppkey, l_partkey
             |    HAVING CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
             |                   AND l_shipdate < TIMESTAMP '1998-01-01'
             |                  THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4)))
             |           AS DOUBLE)
             |         > 0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
             |ORDER BY s_suppkey""".stripMargin)),

    // ── TPC-H Q2 shape: minimum-cost supplier per part in a region ──
    // (Supply cost → the part's minimum observed unit price per
    // supplier, fixed-pointed as floor(extprice·10⁴/qty) so the min
    // and the equality join-back are exact.) The correlated MIN
    // subquery becomes a per-part aggregate equi-joined back on the
    // (part, cost) pair — the Q15 discipline at per-part grain.
    Q("q_tpch_q2",
      (s, dir) => {
        val asiaSupp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("n_name"))
        val cost = t(s, dir, "lineitem")
          .join(asiaSupp.select(col("s_suppkey").as("ck")),
            col("l_suppkey") === col("ck"), "left_semi")
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(expr(
            "CAST(floor(l_extendedprice * 10000.0 / l_quantity) AS BIGINT)"))
            .as("unit_fp"))
        val minCost = cost.groupBy(col("l_partkey").as("mk"))
          .agg(min(col("unit_fp")).as("min_fp"))
        cost
          .join(minCost, col("l_partkey") === col("mk") &&
            col("unit_fp") === col("min_fp"))
          .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
          .join(t(s, dir, "part").filter(col("p_size") < 10),
            col("l_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("unit_fp"))
          .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
          .limit(100)
      },
      Some("""WITH asupp AS (
             |  SELECT s_suppkey, s_name, s_acctbal, n_name
             |  FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'ASIA'),
             |cost AS (
             |  SELECT l_partkey, l_suppkey,
             |    MIN(CAST(floor(l_extendedprice * 10000.0 / l_quantity)
             |        AS BIGINT)) AS unit_fp
             |  FROM lineitem
             |  WHERE l_suppkey IN (SELECT s_suppkey FROM asupp)
             |  GROUP BY l_partkey, l_suppkey),
             |mc AS (SELECT l_partkey AS mk, MIN(unit_fp) AS min_fp
             |       FROM cost GROUP BY l_partkey)
             |SELECT s_acctbal, s_name, n_name, p_partkey, unit_fp
             |FROM cost
             |JOIN mc ON l_partkey = mk AND unit_fp = min_fp
             |JOIN asupp ON l_suppkey = s_suppkey
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_size < 10
             |ORDER BY s_acctbal DESC, p_partkey, s_name LIMIT 100""".stripMargin)),

    // ── TPC-H Q19 shape: disjunctive bracketed predicates ──
    // Three (brand, size-range, quantity-range) brackets OR'd together
    // over the part join — the planner must push the common p/l
    // bounds into both scans and evaluate the residual OR once per
    // joined row, not expand the join three times.
    Q("q_tpch_q19",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
          .agg(revSpark.as("revenue"), count(lit(1)).as("n_rows")),
      Some(s"""SELECT $revDuck AS revenue, count(*) AS n_rows
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              |       AND l_quantity BETWEEN 1 AND 11)
              |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              |       AND l_quantity BETWEEN 10 AND 20)
              |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
              |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))
  )
}
