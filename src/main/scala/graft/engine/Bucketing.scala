package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted bucketed layouts: the biggest shuffle eliminator the
  * engine offers at 100 TB.
  *
  * Two facts written `bucketBy(n, key)` into the catalog join with NO
  * exchange on either side — the bucket layout IS the shuffle, paid
  * once at write time, and every downstream join/aggregate on the
  * bucket key reads co-located buckets (BucketedJoinSpec +
  * BucketedQuerySpec pin the exchange-free plans). The reference's
  * analog is hash partitioning as a persisted file layout
  * (MapleJuice.java:668-679); Spark's catalog-backed `bucketBy` is the
  * declarative equivalent Catalyst can actually exploit.
  *
  * Tables are EXTERNAL (explicit data path) so the artifact lives in
  * scratch/durable storage, not the session warehouse; the catalog
  * entry is session-scoped, the data per-process ([[Scratch]]) — a
  * deployment points the same writes at durable paths and a shared
  * metastore.
  */
object Bucketing {

  /** Write `df` as an external bucketed table: data at `path`, catalog
    * entry `table`, bucketed AND sorted by `key` into `nBuckets` so
    * downstream sort-merge joins skip both the exchange and (per-file)
    * the sort. */
  def writeBucketed(df: DataFrame, key: String, nBuckets: Int,
      table: String, path: String): Unit =
    df.write.bucketBy(nBuckets, key).sortBy(key)
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** Backtick-quote an identifier for string-built DDL (backticks in
    * the name escape by doubling), and SQL-string-quote a path
    * (single quotes double) — a column named with a backtick or a
    * scratch root under e.g. /home/o'brien must not produce a
    * malformed CREATE TABLE (round-12 review). */
  private def qid(name: String): String =
    "`" + name.replace("`", "``") + "`"
  private def qpath(p: String): String =
    "'" + p.replace("'", "''") + "'"

  /** Register an ALREADY-WRITTEN bucketed artifact as an external
    * catalog table, without rebuilding it: the lost-catalog path (a
    * fresh SparkSession in this JVM, or a new process reusing a durable
    * [[Scratch]] artifact) only needs the metadata back — re-running
    * the build would re-pay the artifact's one-time shuffle for data
    * that already sits at `dataPath`. Spark encodes the bucket id in
    * each file name, so a CREATE TABLE with the matching bucket spec
    * over the existing files restores the exchange-free scans.
    *
    * Pass `schema` when the caller knows it: a legitimately EMPTY
    * artifact (a zero-row builder writes only _SUCCESS) has nothing to
    * infer from, and inference would make every lost-catalog
    * resolution of it a permanent crash (round-12 review). */
  def registerExisting(s: SparkSession, table: String, key: String,
      nBuckets: Int, dataPath: String,
      schema: org.apache.spark.sql.types.StructType = null): Unit = {
    val st = if (schema != null) schema else s.read.parquet(dataPath).schema
    val cols = st.map(f => s"${qid(f.name)} ${f.dataType.sql}").mkString(", ")
    s.sql(s"CREATE TABLE ${qid(table)} ($cols) USING parquet " +
      s"CLUSTERED BY (${qid(key)}) SORTED BY (${qid(key)}) " +
      s"INTO $nBuckets BUCKETS LOCATION ${qpath(dataPath)}")
  }

  /** Per-(session, table) registration memo: the warm path of every
    * artifact resolution used to take the global lock AND a catalog
    * tableExists round-trip per call, serializing unrelated concurrent
    * queries (round-12 review) — one successful registration check per
    * session/table is enough. Keyed WEAKLY on the session OBJECT
    * (round-12 ADVICE): the previous identityHashCode key could
    * collide after a stopped session was GC'd and its hash reused,
    * skipping registration in the new session; a weak key dies with
    * the session instead. Cleared with the key memo for tests. */
  private val registeredMemo =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  private def memoTables(s: SparkSession): java.util.Set[String] =
    // Collections.SynchronizedMap overrides computeIfAbsent to hold
    // the mutex, so this is atomic per session
    registeredMemo.computeIfAbsent(
      s, _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())

  /** Catalog location of `table` (DESCRIBE FORMATTED — the public
    * surface for it), as a filesystem path string. */
  private def tableLocation(s: SparkSession, table: String): Option[String] = {
    import org.apache.spark.sql.functions.col
    s.sql(s"DESCRIBE FORMATTED ${qid(table)}")
      .where(col("col_name") === "Location")
      .collect().headOption.map(_.getString(1))
  }

  /** Ensure `table` exists in `s`'s catalog AND points at `dataPath`.
    * Existence by name alone is not enough: table names encode only
    * the artifact KEY hash, not the scratch root, so a same-named
    * catalog entry left by a different root (shared metastore across
    * processes; an in-JVM durable-root swap with a surviving session)
    * would silently serve the other root's — possibly deleted — data
    * (round-12 review). A mismatched location is dropped and
    * re-registered over the resolved path. */
  private def ensureRegistered(s: SparkSession, table: String, key: String,
      nBuckets: Int, dataPath: String,
      schema: => org.apache.spark.sql.types.StructType): Unit = {
    val tables = memoTables(s)
    if (tables.contains(table)) return
    this.synchronized {
      if (!tables.contains(table)) {
        def attempt(): Unit =
          if (!s.catalog.tableExists(table))
            registerExisting(s, table, key, nBuckets, dataPath, schema)
          else {
            val want = new org.apache.hadoop.fs.Path(dataPath).toUri.getPath
            val got = tableLocation(s, table)
              .map(l => new org.apache.hadoop.fs.Path(l).toUri.getPath)
            if (!got.contains(want)) {
              s.sql(s"DROP TABLE ${qid(table)}")
              registerExisting(s, table, key, nBuckets, dataPath, schema)
            }
          }
        // the JVM-local lock above cannot serialize OTHER processes
        // sharing this metastore: their DROP/CREATE can interleave
        // with ours (exists→we skip CREATE→they DROP→our first read
        // fails; or our CREATE lands on their racing CREATE). One
        // retry re-runs the full check from scratch — whichever
        // process won, the second attempt sees the settled catalog
        // state and verifies the location (round-12 ADVICE). The
        // first failure is kept: a DETERMINISTIC error (bad dataPath,
        // permissions) fails both attempts, and surfacing only the
        // retry's exception would hide the original context — it
        // rides along as a suppressed exception (round-13 ADVICE).
        try attempt() catch { case first: Exception =>
          try attempt() catch { case second: Exception =>
            if (second ne first) second.addSuppressed(first)
            throw second
          }
        }
        tables.add(table)
      }
    }
  }

  /** Bucket count for the co-bucketed TPC-H facts. Sized for the test
    * corpus; at deployment scale this is corpus-bytes / target-bucket
    * bytes (and both sides of a co-located join must agree on it —
    * that agreement is the contract the catalog enforces). */
  val tpchBuckets = 8

  /** Generic build-once bucketed artifact: `build` computes the
    * relation, it persists bucketed+sorted by `key` into the catalog
    * (once per (JVM, `dirKey`), re-registered if a fresh session lost
    * the catalog entry), and the returned table name scans with
    * HashPartitioning(key) — every downstream join/aggregate on `key`
    * is exchange-free. The [[tpchTables]] discipline, reusable for any
    * derived relation (e.g. the graph edge list). */
  /** (prefix, dirKey) → full schema-fingerprinted cache key. The
    * builder's schema keys the cache (a layout change re-keys the
    * artifact instead of a durable root serving the stale parquet —
    * the Scratch.schemaKey discipline), but constructing the builder
    * plan just to hash its schema costs analysis mills per call; a
    * builder is constant within one JVM, so the key is too. Cleared
    * by Scratch.resetForTest so specs can swap builders mid-process. */
  private val keyMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[engine] def clearKeyMemoForTest(): Unit = {
    keyMemo.clear()
    prefixOwner.clear()
    registeredMemo.clear()
  }

  /** First stack frame outside this object — the cachedTable CALL SITE
    * (file:line), used as the builder's identity for the prefix-
    * ownership check below. Cost: one stack walk per cachedTable call,
    * microseconds against the catalog lookup that follows. */
  private def callSite(): String = {
    val tr = new Throwable().getStackTrace
    // exact-match this object's classes (a prefix match would also
    // skip caller classes NAMED Bucketing*, e.g. the spec)
    val own = Set("graft.engine.Bucketing", "graft.engine.Bucketing$")
    tr.find(e => !own.contains(e.getClassName))
      .map(e => s"${e.getFileName}:${e.getLineNumber}").getOrElse("?")
  }

  /** prefix → owning builder identity. The keyMemo (and the Scratch
    * artifact key) fingerprint the builder's SCHEMA, not its content —
    * a second claim reusing a prefix with a different builder of the
    * same schema would silently be served the first builder's
    * artifact; worse, a WARM keyMemo hit never re-analyzes the builder
    * at all, so even a different-SCHEMA builder behind the same
    * (prefix, dirKey) would be served the first artifact (round-12
    * review) — this ownership check is what makes the memo sound, not
    * a nicety. The contract is "one builder per prefix"; this map
    * ENFORCES it, failing the second claim loudly instead of serving
    * it wrong data. Cleared with the memo so specs can re-own
    * prefixes.
    *
    * Identity is the caller-supplied `owner` token when given, else
    * the call site (file:line). The call-site default misfires both
    * ways around shared helpers (round-11 verdict item 3): two
    * DIFFERENT builders funneled through one helper line present ONE
    * site (silent pass — the hazard the check exists for), and the
    * SAME builder resolved inline from two sites presents TWO (a
    * spurious throw). Any helper that resolves cachedTable on behalf
    * of callers MUST therefore thread an explicit per-builder owner
    * token; direct call sites (every production site today) may rely
    * on the default. */
  private val prefixOwner =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def claimPrefix(prefix: String, owner: String): Unit = {
    val id = if (owner != null && owner.nonEmpty) s"owner '$owner'"
             else s"call site ${callSite()}"
    val prior = prefixOwner.computeIfAbsent(prefix, _ => id)
    if (prior != id)
      throw new IllegalStateException(
        s"Bucketing prefix '$prefix' is owned by $prior but was " +
          s"reclaimed by $id — cachedTable prefixes must be unique per " +
          "builder (the schema-keyed cache cannot tell two builders " +
          "with the same schema apart); helpers resolving on behalf of " +
          "callers must pass an explicit owner token")
  }

  private def memoKey(memo: String)(full: => String): String = {
    val hit = keyMemo.get(memo)
    if (hit != null) hit
    else {
      // computed OUTSIDE the map (builders may nest other cached
      // artifacts; racing threads compute the same constant)
      val k = full
      keyMemo.putIfAbsent(memo, k)
      k
    }
  }

  def cachedTable(s: SparkSession, prefix: String, dirKey: String,
      key: String, nBuckets: Int, owner: String = "")
      (build: => DataFrame): String = {
    def name(id: String) = s"graft_bkt_${prefix}_$id"
    def doBuild(p: String): Unit =
      // the thunk is a lazy plan (no actions) — evaluated here on an
      // actual build, and once per JVM inside memoKey for the schema
      writeBucketed(build, key, nBuckets, name(p.split('/').last),
        s"$p/$prefix")
    claimPrefix(prefix, owner)
    val fullKey = memoKey(s"t\n$prefix\n$dirKey\n$key\n$nBuckets")(
      s"$dirKey schema=${Scratch.schemaKey(build.schema)} " +
        s"key=$key buckets=$nBuckets")
    val path = Scratch.cached(s"bucketed_$prefix", fullKey)(doBuild)
    val t = name(path.split('/').last)
    // lost-catalog session: the data already sits at the memoized
    // path — re-register it (schema from the builder plan, so even an
    // EMPTY artifact re-registers), don't re-pay the build shuffle
    ensureRegistered(s, t, key, nBuckets, s"$path/$prefix", build.schema)
    t
  }

  /** Co-bucketed (orders, lineitem) tables for `dir`, both bucketed by
    * their orderkey, built once per (JVM, dir); returns the catalog
    * table names. The build is the pay-once shuffle; every caller
    * after the first gets the co-located layout for free.
    *
    * The Scratch memo outlives any single SparkSession, but the
    * catalog registration lives in the session's SharedState — a fresh
    * SparkContext in the same JVM would resolve the memoized names to
    * nothing, so missing tables are re-registered over the existing
    * scratch data ([[registerExisting]]; synchronized so concurrent
    * detectors don't race the DDL). */
  def tpchTables(s: SparkSession, dir: String): (String, String) = {
    def names(id: String) =
      (s"graft_bkt_orders_$id", s"graft_bkt_lineitem_$id")
    def build(p: String): Unit = {
      // table names derive from the scratch path's unique leaf so
      // distinct input dirs never collide in the catalog
      val (to, tl) = names(p.split('/').last)
      writeBucketed(Tables(s, dir, "orders"), "o_orderkey", tpchBuckets,
        to, s"$p/orders")
      writeBucketed(Tables(s, dir, "lineitem"), "l_orderkey", tpchBuckets,
        tl, s"$p/lineitem")
    }
    val fullKey = memoKey(s"p\n$dir")(
      s"$dir schema=${Scratch.schemaKey(Tables(s, dir, "orders").schema)}/" +
        s"${Scratch.schemaKey(Tables(s, dir, "lineitem").schema)} " +
        s"buckets=$tpchBuckets")
    val path = Scratch.cached("bucketed", fullKey)(build)
    val (to, tl) = names(path.split('/').last)
    ensureRegistered(s, to, "o_orderkey", tpchBuckets, s"$path/orders",
      Tables(s, dir, "orders").schema)
    ensureRegistered(s, tl, "l_orderkey", tpchBuckets, s"$path/lineitem",
      Tables(s, dir, "lineitem").schema)
    (to, tl)
  }
}
