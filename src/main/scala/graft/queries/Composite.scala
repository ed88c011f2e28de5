package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
  private def psumDuck(e: String): String =
    s"CAST(SUM(CAST(floor($e * 10000.0) AS DECIMAL(28,0))) AS DOUBLE) / 10000.0"

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
             |  AND l_quantity < 24""".stripMargin))
  )
}
