package graft

import org.apache.spark.sql.SparkSession

import graft.engine.{Grapefruit, MapleJuice, ShuffleOption}

/** Command-line surface mirroring the reference's node CLI
  * (`MapleJuice.java:996-1049`): storage verbs + maple/juice jobs over
  * external executables.
  *
  * Usage: `graft.Cli <sdfsRoot> <command> [args...]`
  *
  *   put <localPath> <name>          — SdfsServer.java:235 (S4)
  *   get <name> <localPath>          — SdfsServer.java:450 (S5)
  *   delete <name>                   — SdfsServer.java:379 (S6)
  *   ls <name> | store | global      — SdfsServer.java:181-232 (S7)
  *   maple <exe> <numTasks> <sifPrefix> <srcDir> [exeArgs...] [argv]
  *   juice <exe> <numTasks> <sifPrefix> <destName> <delete 0|1>
  *         <hash|range> [stream|files]
  *
  * Executables follow the Hadoop-streaming contract (stdin lines →
  * stdout lines; juice sees `key,value` sorted by key). The optional
  * `files` juice mode instead runs the reference's exact file-per-key
  * argv contract (`exe key valuesFile`, `MapleJuice.java:645-648`),
  * and a trailing `argv` token on maple runs the reference's exact
  * argv-batch maple contract (50 lines as one argv string,
  * `MapleJuice.java:408-412`) — together they let BOTH reference
  * executables run unmodified; `stream` (default) is the scale path
  * for each. Examples in `scripts/exes/`.
  */
object Cli {

  /** numTasks must parse as a positive Int; guarding the main cases on
    * it routes a bad numeral to the named maple/juice usage error
    * instead of letting a raw NumberFormatException escape n.toInt
    * (round-11 ADVICE). */
  private def isNumTasks(s: String): Boolean =
    s.nonEmpty && s.forall(_.isDigit) &&
      scala.util.Try(s.toInt).toOption.exists(_ > 0)

  /** Refuse overlapping (equal or nested) dataset paths for a job's
    * input and output: `rdd.pipe` severs the DataFrame lineage, so
    * Spark's own "cannot overwrite a path being read from" check never
    * fires and `mode("overwrite")` would DELETE THE INPUT before tasks
    * read it (round-12 review); a dest nested under a
    * delete-flagged input would be destroyed right after being
    * written. */
  private def requireDisjoint(what: String, a: String, b: String): Unit =
    require(a != b && !a.startsWith(b + "/") && !b.startsWith(a + "/"),
      s"$what paths must not overlap: '$a' vs '$b' — the overwrite " +
        "write (or delete-input flag) would destroy data mid-job")

  def run(spark: SparkSession, root: String, cmd: Seq[String]): Unit = {
    import spark.implicits._
    val gf = new Grapefruit(spark, root)
    cmd match {
      case Seq("put", local, name)  => gf.sdfs.put(local, name); println(s"put $name")
      case Seq("get", name, local)  => gf.sdfs.get(name, local); println(s"get $name -> $local")
      case Seq("delete", name)      => println(s"deleted=${gf.sdfs.delete(name)}")
      case Seq("ls", name)          => gf.sdfs.ls(name).foreach(println)
      case Seq("store")             => gf.sdfs.store().foreach(println)
      case Seq("global")            => gf.sdfs.global().foreach(println)

      case "maple" +: exe +: n +: prefix +: srcDir +: exeArgs
          if isNumTasks(n) =>
        // argv mode and exeArgs do NOT compose: the reference contract
        // is argv[1] = the batch (`MapleJuice.java:408-412`), so any
        // extra argv would displace the batch and the exe would parse
        // an argument as its input — fail loudly (and BEFORE touching
        // the source, so the arg error wins over a missing-path one)
        val argvMode = exeArgs.lastOption.contains("argv")
        require(!argvMode || exeArgs.size == 1,
          "argv-batch maple follows the reference argv[1]=batch " +
            "contract — exe args cannot be combined with the " +
            s"trailing 'argv' token (got: ${exeArgs.mkString(" ")})")
        requireDisjoint("maple output/input",
          gf.sdfs.path(prefix), gf.sdfs.path(srcDir))
        val lines = spark.read.textFile(gf.sdfs.path(srcDir))
        // trailing `argv` = the reference's argv-batch contract so
        // reference maple exes run unmodified; default = stdin stream
        val out =
          if (argvMode)
            MapleJuice.pipeMapleArgv(lines.repartition(n.toInt),
              Seq("python3", exe))
          else MapleJuice.pipeMaple(
            lines.repartition(n.toInt), Seq("python3", exe) ++ exeArgs)
        out.write.mode("overwrite").text(gf.sdfs.path(prefix))
        println(s"maple done -> $prefix")

      case "juice" +: exe +: n +: prefix +: dest +: del +: shuffleOpt +: rest
          if isNumTasks(n) &&
            (rest.isEmpty || rest == Seq("stream") || rest == Seq("files")) =>
        val opt = shuffleOpt match {
          case "range" => ShuffleOption.Range
          case "hash"  => ShuffleOption.Hash
          case other => throw new IllegalArgumentException(
            s"shuffle option must be hash or range, got '$other'")
        }
        if (del != "0" && del != "1")
          throw new IllegalArgumentException(
            s"delete flag must be 0 or 1, got '$del'")
        requireDisjoint("juice dest/input",
          gf.sdfs.path(dest), gf.sdfs.path(prefix))
        // split on the FIRST comma (reference key,value lines). A
        // comma-less line reads as (line, "") and stream mode
        // re-serializes it as "line," — a documented normalization of
        // malformed input (the reference's maple stage always emits
        // the comma), not a parse error
        val kv = spark.read.textFile(gf.sdfs.path(prefix)).map { l =>
          val i = l.indexOf(',')
          if (i < 0) (l, "") else (l.substring(0, i), l.substring(i + 1))
        }
        // `files` = the reference's exact file-per-key argv contract
        // (`exe key valuesFile`) so reference juice exes run unmodified;
        // default `stream` = the scale path (one process per partition)
        val out =
          if (rest == Seq("files"))
            MapleJuice.pipeJuiceFiles(kv, Seq("python3", exe), n.toInt, opt)
          else MapleJuice.pipeJuice(kv, Seq("python3", exe), n.toInt, opt)
        out.write.mode("overwrite").text(gf.sdfs.path(dest))
        if (del == "1") gf.sdfs.delete(prefix)
        println(s"juice done -> $dest")

      // a KNOWN command with bad arity or a bad mode token must name
      // the actual mistake — falling through to "unknown command"
      // would hide it behind the command list
      case "maple" +: badRest =>
        throw new IllegalArgumentException(
          "maple usage: maple <exe> <numTasks> <sifPrefix> <srcDir> " +
            s"[exeArgs...] [argv]; got: maple ${badRest.mkString(" ")}")
      case "juice" +: badRest =>
        throw new IllegalArgumentException(
          "juice usage: juice <exe> <numTasks> <sifPrefix> <destName> " +
            "<delete 0|1> <hash|range> [stream|files]; got: juice " +
            badRest.mkString(" "))
      // the same named-arity rule for the storage verbs (round-12
      // review: `put localfile` fell through to "unknown command: put"
      // — a message that called put unknown while listing it)
      case "put" +: badRest =>
        throw new IllegalArgumentException(
          s"put usage: put <localPath> <name>; got: put ${badRest.mkString(" ")}")
      case "get" +: badRest =>
        throw new IllegalArgumentException(
          s"get usage: get <name> <localPath>; got: get ${badRest.mkString(" ")}")
      case "delete" +: badRest =>
        throw new IllegalArgumentException(
          s"delete usage: delete <name>; got: delete ${badRest.mkString(" ")}")
      case "ls" +: badRest =>
        throw new IllegalArgumentException(
          s"ls usage: ls <name>; got: ls ${badRest.mkString(" ")}")
      case ("store" | "global") +: badRest =>
        throw new IllegalArgumentException(
          s"store/global take no arguments; got: ${badRest.mkString(" ")}")

      case other =>
        // throw, don't exit: run() is callable programmatically and must
        // not kill the caller's JVM (or skip its finally-blocks)
        throw new IllegalArgumentException(
          s"unknown command: ${other.mkString(" ")} " +
            "(commands: put get delete ls store global maple juice)")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Cli <sdfsRoot> <command> [args...]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args(0), args.drop(1).toSeq)
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        spark.stop()
        sys.exit(2)
    }
    finally spark.stop()
  }
}
