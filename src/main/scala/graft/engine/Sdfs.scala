package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SDFS verb surface as a thin catalog/storage facade.
  *
  * The reference implements put/get/delete/ls/store/global as a
  * replicated quorum file system (`SdfsServer.java:235-555`,
  * listing verbs 181-232). Replication, quorum R/W, re-replication and
  * failure detection (§1.4 of SURVEY.md) are platform concerns Spark's
  * storage layer already provides — this facade deliberately carries
  * only the *user-visible* verbs over `spark.read`/`df.write` and the
  * Hadoop `FileSystem` API, rooted at a single namespace directory.
  */
final class Sdfs(spark: SparkSession, root: String) {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

  private def p(name: String): Path = {
    // confine names to the namespace: delete() is RECURSIVE, and
    // Hadoop Path resolution keeps an absolute child ("/data"
    // resolves to /data outright) and normalizes ".." out of the
    // parent — either would let a mistyped CLI argument operate on
    // data outside the sdfsRoot the command line names. "." (and an
    // empty name) resolve to the ROOT ITSELF, so `delete .` would
    // recursively destroy the whole namespace (round-12 review) —
    // every segment must be a real name
    val rel = new Path(name)
    val segs = name.split("/")
    // dot-prefixed segments are RESERVED for engine temps (the put()
    // staging dir): listings skip them, so a user dataset named that
    // way would be invisible — and '.staging' itself would collide
    require(!rel.isAbsolute && segs.nonEmpty &&
        segs.forall(s => s.nonEmpty && s != "." && s != ".." &&
          !s.startsWith(".")),
      s"sdfs name must be a relative path inside the namespace " +
        s"(no empty, '.', '..', or dot-prefixed segments), got '$name'")
    new Path(root, name)
  }

  // put() staging-dir name and crash-reclaim grace window — a temp in
  // the staging dir younger than the grace period is presumed to be a
  // LIVE concurrent put and is never swept; package-private so the
  // spec exercises the same values
  private[engine] val stagingDirName = ".staging"
  private[engine] val putGraceMs = 15L * 60 * 1000

  /** Per-name staging prefix: temps are `<md5(name)>.puttmp.<pid>.<nano>`.
    * The name is HASHED, not flattened (round-14 ADVICE): the old
    * `replace("/", "__")` was not injective — datasets `a/b` and
    * `a__b` shared one sweep prefix, so a put of one name swept the
    * other's temps — and a dataset name CONTAINING `.puttmp.` could
    * alias another name's prefix under a startsWith match. A
    * fixed-width hex hash can do neither. Package-private so the spec
    * builds temp names through the same scheme. */
  private[engine] def tmpPrefix(name: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString + ".puttmp."
  }

  /** Is the put that created this temp still alive on THIS host?
    * `suffix` is the `<pid>.<nano>` tail of a staged temp name. The
    * check is local-only: on shared (cross-host) scratch a remote
    * owner's pid is meaningless here — a pid dead locally falls back
    * to the age-based reclaim (the pre-r15 behavior), and a pid that
    * happens to be alive locally merely delays reclaim until that
    * process exits (garbage retention, never a live-put kill). An
    * unparseable suffix (foreign junk in the staging dir) counts as
    * dead so the age check alone governs it. */
  private def ownerAlive(suffix: String): Boolean = {
    val digits = suffix.takeWhile(_.isDigit)
    if (digits.isEmpty || digits.length > 18) false
    else {
      val h = ProcessHandle.of(digits.toLong)
      h.isPresent && h.get.isAlive
    }
  }

  /** Resolved namespace path of `name` — the ONE resolution scheme
    * (confinement included) for callers that hand paths to
    * `spark.read`/`df.write` directly (the CLI's maple/juice steps). */
  def path(name: String): String = p(name).toString

  /** `put localfilename sdfsfilename` (`SdfsServer.java:235-376`).
    * Put-over-an-existing-name REPLACES it (the reference's job-output
    * overwrite, `MapleJuice.java:307-314`): Hadoop's copyFromLocalFile
    * would otherwise nest the source INSIDE an existing destination
    * DIRECTORY (checkDest resolves into it by source name — the
    * overwrite flag only governs the file-exists case), silently
    * leaving the stale dataset plus a stray file. */
  def put(localPath: String, name: String): Unit = {
    fs.mkdirs(new Path(root))
    val dest = p(name)
    // STAGED replace (round-12 review): deleting the destination before
    // the copy meant any copy failure (mistyped/unreadable source)
    // destroyed the old dataset and left nothing — copy into a hidden
    // temp name first, swap only after the copy succeeded. A crash
    // between delete and rename leaves the temp beside a missing dest;
    // the next put overwrites the temp.
    require(new java.io.File(localPath).exists(),
      s"put source $localPath does not exist")
    // Temps live in ONE hidden flat staging dir under the namespace
    // root, keyed by the hashed name + PID + nanotime (round-13
    // ADVICE; hashing per tmpPrefix's scaladoc). Staging beside the destination parent put a nested
    // name's temp INSIDE another dataset's directory — put("a/data")
    // staged under dataset a/, where a concurrent get("a") copied the
    // in-flight temp into its local output — and the unconditional
    // pre-copy sweep deleted a concurrent same-name put's LIVE temp,
    // failing one of two racing puts instead of last-wins. Here temps
    // never sit inside dataset directories (listings skip dot-names),
    // PID+nanotime keeps racing puts private, and the sweep reclaims
    // only temps older than a grace period — crashed puts, never
    // in-flight ones.
    val staging = new Path(root, stagingDirName)
    fs.mkdirs(staging)
    val prefix = tmpPrefix(name)
    val tmp = new Path(staging,
      prefix + ProcessHandle.current().pid() + "." + System.nanoTime())
    val now = System.currentTimeMillis()
    // Reclaim only temps that are BOTH past the grace window AND
    // whose owning process is not alive on this host (round-14
    // verdict: mtime alone could kill a live put whose copy outruns
    // the grace period — a directory temp's top-level mtime need not
    // advance during a long recursive copy, so a racing same-name put
    // after minute 15 deleted the live temp and failed that put).
    fs.listStatus(staging).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith(prefix) &&
          now - st.getModificationTime > putGraceMs &&
          !ownerAlive(n.stripPrefix(prefix))
      }
      .foreach(st => fs.delete(st.getPath, true))
    try fs.copyFromLocalFile(false, true, new Path(localPath), tmp)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    fs.mkdirs(dest.getParent)
    if (fs.exists(dest)) fs.delete(dest, true)
    require(fs.rename(tmp, dest), s"put rename $tmp -> $dest failed")
  }

  /** Write a DataFrame as a named text/parquet dataset (sink S4/S8). */
  def putDf(df: DataFrame, name: String, format: String = "parquet"): Unit =
    df.write.mode("overwrite").format(format).save(p(name).toString)

  /** `get sdfsfilename localfilename` (`SdfsServer.java:450-555`). */
  def get(name: String, localPath: String): Unit =
    fs.copyToLocalFile(false, p(name), new Path(localPath), true)

  /** Read a named dataset back (source S1/S5). */
  def read(name: String, format: String = "parquet"): DataFrame =
    spark.read.format(format).load(p(name).toString)

  /** `delete sdfsfilename` (`SdfsServer.java:379-447`). */
  def delete(name: String): Boolean = fs.delete(p(name), true)

  /** `ls sdfsfilename` — where a file lives (`SdfsServer.java:181-192`).
    * Replica locations collapse to the physical file listing here. */
  def ls(name: String): Seq[String] =
    if (!fs.exists(p(name))) Seq.empty
    else fs.listStatus(p(name)).toSeq.map(_.getPath.toString)

  /** `store` — files on this node (`SdfsServer.java:195-212`); single
    * namespace in Spark, so same as `global`. */
  def store(): Seq[String] = global()

  /** `global` — all files in the namespace (`SdfsServer.java:215-232`).
    * Dot-prefixed entries are engine-internal (the put staging dir),
    * not user datasets — p() rejects such names, so hiding them here
    * can never hide real data. */
  def global(): Seq[String] =
    if (!fs.exists(new Path(root))) Seq.empty
    else fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted
}

/** Session facade: entry point mirroring the reference's single
  * node-process bundling membership+SDFS+MapleJuice (`main` in
  * `MapleJuice.java:934-990`) — here just configuration + facades. */
final class Grapefruit(val spark: SparkSession, sdfsRoot: String) {
  val sdfs = new Sdfs(spark, sdfsRoot)
  def table(dir: String, name: String): DataFrame = Tables(spark, dir, name)

  /** Register every driver test table under `dir` as a temp view, so
    * the whole engine surface is reachable from `spark.sql(...)`. */
  def registerTables(dir: String): Unit =
    Tables.all.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))
}
