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
      // treats null as a key, so it is visible to this same aggregate)
      val bad = updates.groupBy(keys.map(col): _*)
        .count()
        .filter(col("count") > 1 || keys.map(col(_).isNull).reduce(_ || _))
        .head(1)
      require(bad.isEmpty,
        s"updates side violates the merge-key contract on " +
          s"(${keys.mkString(", ")}): offending key ${bad.headOption.orNull} — " +
          "duplicate keys fan out matched target rows; null keys insert " +
          "instead of matching")
    }

    val t = target.alias("t")
    val u = updates.alias("u")
    val cond = keys.map(k => col(s"t.$k") === col(s"u.$k")).reduce(_ && _)
    val updatePresent = col(s"u.${keys.head}").isNotNull
    val out = tCols.map {
      case k if keys.contains(k) => coalesce(col(s"u.$k"), col(s"t.$k")).as(k)
      case c if uCols(c) =>
        combine.get(c) match {
          case Some(f) => f(col(s"t.$c"), col(s"u.$c")).as(c)
          case None => when(updatePresent, col(s"u.$c"))
            .otherwise(col(s"t.$c")).as(c)
        }
      case c => col(s"t.$c").as(c)
    }
    t.join(u, cond, "full_outer").select(out: _*)
  }
}
