package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, when}

/** MERGE INTO (upsert) as a relational operator.
  *
  * The daily-pipeline mutation primitive the reference expresses as
  * "overwrite the SDFS file with the next job's output"
  * (`MapleJuice.java:307-314` — put over the old name): apply a keyed
  * increment to a keyed target in one pass. Matched keys take the
  * update row (last-write-wins, explicit nulls honored), unmatched
  * target rows pass through, unmatched update rows insert (target-only
  * columns null). Per-column overrides (`combine`) express the
  * aggregate-merge cases (counter += delta, max-of-timestamps).
  *
  * 100 TB shape: one full-outer shuffle on the merge keys — the
  * update side is increment-sized, the target side is the big one. A
  * deployment merges into a bucketed target (Bucketing.writeBucketed)
  * so the target side ships zero bytes, and rewrites only the touched
  * buckets (copy-on-write); the relational core here is identical.
  */
object Merge {

  /** Backtick-quote a column name for string-built references: a dot
    * in a real column name (e.g. after JSON flattening) would
    * otherwise parse as nested-field access; backticks in the name
    * itself escape by doubling, per SQL identifier rules. */
  private def quoted(name: String): String =
    "`" + name.replace("`", "``") + "`"

  private def qcol(name: String): Column = col(quoted(name))

  /** Upsert `updates` into `target` by `keys`.
    *
    * Contract: `updates` columns must be a subset of `target` columns
    * and include every key; keys are non-null on both sides (the
    * presence test that picks update-vs-target values rides on it).
    * `combine` overrides the per-column rule for matched rows:
    * `(targetCol, updateCol) => merged` — it also sees unmatched rows
    * (one side null), so write it total, e.g. additive counters as
    * `(t, u) => coalesce(t, lit(0L)) + coalesce(u, lit(0L))`.
    *
    * `updates` must also be key-UNIQUE (one row per key) — duplicate
    * update keys fan out matched target rows through the full-outer
    * join. The relational contract can't be checked for free at scale,
    * so it is opt-in: `checkUniqueKeys = true` spends one aggregate
    * over the (increment-sized) update side and fails fast instead of
    * silently multiplying rows. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
      combine: Map[String, (Column, Column) => Column] = Map.empty,
      checkUniqueKeys: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    val tCols = target.columns.toSeq
    val uCols = updates.columns.toSet
    val missingKeys = keys.filterNot(uCols)
    require(missingKeys.isEmpty, s"updates missing key columns: $missingKeys")
    val extra = uCols -- tCols
    require(extra.isEmpty, s"updates columns not in target: ${extra.mkString(", ")}")
    val badCombine = combine.keySet.filterNot(c => uCols(c) && !keys.contains(c))
    require(badCombine.isEmpty,
      s"combine must name non-key update columns: ${badCombine.mkString(", ")}")
    if (checkUniqueKeys) {
      // one aggregate checks BOTH halves of the key contract: duplicate
      // keys (fan out matched target rows) and null keys (the matched-
      // row test rides on keys.head being non-null, so a null-keyed
      // update row silently INSERTS instead of matching — and groupBy
      // treats null as a key, so it is visible to this same aggregate).
      // The count is ALIASED to a collision-free name: a merge key
      // literally named "count" would otherwise make col("count")
      // ambiguous against RelationalGroupedDataset.count()'s output.
      val cnt = Iterator.from(0).map(i => s"__graft_cnt$i")
        .find(n => !uCols(n)).get
      val bad = updates.groupBy(keys.map(qcol): _*)
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as(cnt))
        .filter(col(cnt) > 1 || keys.map(qcol(_).isNull).reduce(_ || _))
        .head(1)
      require(bad.isEmpty,
        s"updates side violates the merge-key contract on " +
          s"(${keys.mkString(", ")}): offending key ${bad.headOption.orNull} — " +
          "duplicate keys fan out matched target rows; null keys insert " +
          "instead of matching")
    }

    val t = target.alias("t")
    val u = updates.alias("u")
    def tc(c: String) = col(s"t.${quoted(c)}")
    def uc(c: String) = col(s"u.${quoted(c)}")
    val cond = keys.map(k => tc(k) === uc(k)).reduce(_ && _)
    val updatePresent = uc(keys.head).isNotNull
    val out = tCols.map {
      case k if keys.contains(k) => coalesce(uc(k), tc(k)).as(k)
      case c if uCols(c) =>
        combine.get(c) match {
          case Some(f) => f(tc(c), uc(c)).as(c)
          case None => when(updatePresent, uc(c))
            .otherwise(tc(c)).as(c)
        }
      case c => tc(c).as(c)
    }
    t.join(u, cond, "full_outer").select(out: _*)
  }
}
