package graft

import org.apache.spark.sql.SparkSession

/** Manual surface drive: `sbt "Test/runMain graft.WorkloadsDemo"` —
  * exercises the reference-fidelity workloads through the public API
  * exactly as a library user would. */
object WorkloadsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.workloads.Workloads

    println("== web-graph in-degree (range 1-3) ==")
    Workloads.webGraphInDegree(
      spark.createDataset(Seq("1,2", "2,1", "7,3", "42,1", "", "bad")), 1, 3)
      .show(false)

    println("== condorcet: clear winner ==")
    Workloads.condorcet(spark.createDataset(Seq(
      "A,B,C", "A,C,B", "B,A,C", "A,B,C", "C,A,B"))).show(false)

    println("== condorcet: cycle (probe) ==")
    Workloads.condorcet(spark.createDataset(Seq(
      "A,B,C", "B,C,A", "C,A,B"))).show(false)

    println("== condorcet: garbage ballots only (probe) ==")
    Workloads.condorcet(spark.createDataset(Seq("", "A,B", "x,,y"))).show(false)

    println("== condorcet: '#' in candidate names is rejected (probe) ==")
    Workloads.condorcet(spark.createDataset(Seq(
      "C#1,B,A", "A,B,C", "A,C,B", "A,B,C"))).show(false)

    println("== word count ==")
    Workloads.wordCount(spark.createDataset(Seq("the quick fox", "the  fox"))).show(false)

    spark.stop()
  }
}
