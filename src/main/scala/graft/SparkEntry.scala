package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Advanced, Behavior, Changelog, Composite, Core, Forecast, Functions, Graph, Graph2, Intervals, MlEval, Q, Quality, Retrieval, Stats, Stats2, Stats3}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared queries (core §2.13 inventory + extensions). */
  private def all: Seq[Q] = {
    val qs = Core.queries ++ Advanced.queries ++ Composite.queries ++
      Functions.queries ++ Graph.queries ++ Graph2.queries ++
      Retrieval.queries ++ Changelog.queries ++ Forecast.queries ++ Stats.queries ++
      Quality.queries ++ Stats2.queries ++ Stats3.queries ++ MlEval.queries ++ Behavior.queries ++ Intervals.queries ++ graft.ext.Ext.queries
    // a duplicate name would be silently collapsed by .toMap below and
    // the shadowed query would vanish from the correctness gate
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Broadcast-join rollup: customer ⋈ nation ⋈ region with aggregates. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
