package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.engine.Tables

/** TPC-H-shaped composite queries: multi-join + filter + aggregate
  * pipelines proving the operators compose into the analytics a real
  * user runs — Catalyst handles join order, pushdown, and partial
  * aggregation across the whole tree (verify with PlanAudit).
  * Revenue = sum(extendedprice * (1 - discount)) accumulated in
  * DECIMAL(18,4): the per-row double product is computed identically
  * in both engines, and the decimal sum is order-free.
  */
object Composite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private val revSpark =
    sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))).cast("double")
  private val revDuck =
    "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

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
              |GROUP BY n_name ORDER BY n_name""".stripMargin))
  )
}
