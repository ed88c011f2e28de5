package graft.ext

import org.apache.spark.sql.SparkSession

/** Manual single-query timer with Bench's session shape (not a test).
  * Run: sbt "Test/runMain graft.ext.QueryTimer <query> [sfDir] [iters]" */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up like Bench
    graft.engine.Tables(spark, dir, "nation").groupBy("n_regionkey").count()
      .write.format("noop").mode("overwrite").save()
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"TIMER $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
