package graft.engine

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** AQE skew-join handling — the runtime complement to the engine's
  * explicit salting operators (`saltedJoin` / hot-key-only auto-salt):
  * when one join key dominates a shuffle join, AQE splits the skewed
  * partition into sub-partitions at runtime and joins each against a
  * replicated build side — no plan-time knowledge of the hot key
  * needed. The spec builds a 1000:1 hot-key skew, lowers the size
  * thresholds to test scale (at 100 TB the defaults fire on their
  * own), and asserts the executed plan marked the join skew=true with
  * more shuffle-read splits than the static partition count. */
class SkewJoinSpec extends SparkSuite {

  test("AQE splits a skewed shuffle-join partition at runtime") {
    import spark.implicits._
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 1000:1 skew: key 0 holds ~50k rows with fat payloads, the other
      // 50 keys ~50 each; the dim side is uniform
      val fact = spark.range(0, 52500).select(
        when(col("id") < 50000, 0L).otherwise(col("id") % 50 + 1).as("k"),
        concat(lit("x" * 200), col("id").cast("string")).as("payload"))
      val dim = spark.range(0, 51).select(col("id").as("k"),
        col("id").cast("string").as("name"))

      // the join is the terminal operator (a downstream distribution
      // requirement makes AQE conservatively skip the skew split), and
      // the SELECT keeps the fat payload so column pruning + shuffle
      // compression can't shrink the skewed partition below threshold
      val j = fact.join(dim, "k").select("name", "payload")
      val rows = j.collect()
      assert(rows.length == 52500)

      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        "AQE did not mark the join skewed:\n" + plan.take(2000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
