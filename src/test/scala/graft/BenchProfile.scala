package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Manual per-query execution profile:
  * `sbt "Test/runMain graft.BenchProfile q_a q_b ..."` — runs each named
  * query through the noop sink (same timed shape as Bench) and prints,
  * per query: wall seconds (best of SPARK_GRAFT_PROF_ITERS, default 2),
  * Spark job count, stage count, task count, shuffle bytes
  * read/written, and the per-job wall breakdown of the best run — the
  * evidence §1 of the optimization guide asks for before touching a
  * plan (where does the time go: many tiny jobs = per-job floor, one
  * fat stage = compute, big shuffle bytes = exchange weight).
  *
  * Environment mirrors Bench: SPARK_GRAFT_SF_DIR (default sf0.1),
  * SPARK_GRAFT_CPUS (default 32 here — profiling wants the bench shape).
  */
object BenchProfile {
  private final class Acc extends SparkListener {
    val jobs = mutable.ArrayBuffer[(Int, Long, Long)]() // id, start, end
    var stages = 0
    var tasks = 0
    var shuffleRead = 0L
    var shuffleWrite = 0L
    private val jobStart = mutable.Map[Int, Long]()
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobStart(e.jobId) = e.time
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs += ((e.jobId, jobStart.getOrElse(e.jobId, e.time), e.time))
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += e.stageInfo.numTasks
      shuffleRead += e.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
      shuffleWrite += e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROF_ITERS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(SparkEntry.queries.nonEmpty)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_graph_cc", "q_profile", "q_pipeline_e2e")
    // warm-up: parquet footers + codegen + JIT (same as Bench's canary)
    (1 to 3).foreach { _ =>
      graft.engine.Tables(spark, sfDir, "nation").groupBy("n_regionkey")
        .count().write.format("noop").mode("overwrite").save()
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val runs = (1 to iters).map { _ =>
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.removeSparkListener(acc)
        SessionHygiene.dropDeadCheckpoints(spark)
        (dt, acc)
      }
      val (dt, acc) = runs.minBy(_._1)
      val jobLine = acc.jobs.sortBy(_._1)
        .map { case (id, s, e) => f"j$id%s=${(e - s) / 1e3}%.2f" }
        .mkString(" ")
      println(f"PROF $n%-28s ${dt}%7.3f s  jobs=${acc.jobs.size}%3d " +
        f"stages=${acc.stages}%3d tasks=${acc.tasks}%5d " +
        f"shufR=${acc.shuffleRead / 1024}%8d KB shufW=${acc.shuffleWrite / 1024}%8d KB")
      println(s"PROFJOBS $n $jobLine")
    }
    spark.stop()
  }
}
