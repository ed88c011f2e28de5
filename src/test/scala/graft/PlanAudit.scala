package graft

import org.apache.spark.sql.SparkSession

/** Manual plan audit: `sbt "Test/runMain graft.PlanAudit [query ...]"` —
  * prints the formatted physical plan for the named queries (default: a
  * representative set) so pushdown / broadcast / codegen can be read. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.toSeq == Seq("ALL")) SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else Seq("q_scan_project", "q_filter_range", "q_join_broadcast",
        "q_join_equi", "q_groupby_sum", "q_topk", "q_dedup_ngram")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
