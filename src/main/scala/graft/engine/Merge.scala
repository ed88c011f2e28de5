package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{assert_true, coalesce, col, concat,
  concat_ws, count, lit, when}

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
    * so it is opt-in: `checkUniqueKeys = true` folds a per-key count
    * window + assertion into the update side of the SAME plan, so the
    * data the check sees is exactly the data the join consumes (a
    * separate eager pre-check would re-execute the updates plan and a
    * nondeterministic or re-read source could pass the check yet still
    * fan out — round-12 review), at the cost of one window stage over
    * the (increment-sized) update side; its exchange is the same
    * hash-by-keys the join needs. A violation therefore surfaces at
    * EXECUTION time (a SparkException naming the offending key), not
    * at call time. */
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
    val checkedUpdates = if (!checkUniqueKeys) updates else {
      // one window checks BOTH halves of the key contract: duplicate
      // keys (fan out matched target rows) and null keys (the matched-
      // row test rides on keys.head being non-null, so a null-keyed
      // update row silently INSERTS instead of matching — and the
      // window treats null as a partition, so it is visible here too).
      // The count column gets a collision-free name (a merge key could
      // literally be named "__graft_cnt"); assert_true returns NULL
      // when the contract holds, so the filter keeps every row while
      // forcing the assertion to evaluate inside the SAME execution
      // the join consumes — column pruning cannot elide a filter.
      val cnt = MapleJuice.freshName(uCols, "__graft_cnt")
      val ok = col(cnt) === 1 && keys.map(qcol(_).isNotNull).reduce(_ && _)
      val msg = concat(
        lit("updates side violates the merge-key contract on " +
          s"(${keys.mkString(", ")}): offending key ("),
        concat_ws(", ",
          keys.map(k => coalesce(qcol(k).cast("string"), lit("null"))): _*),
        lit(") — duplicate keys fan out matched target rows; null keys " +
          "insert instead of matching"))
      updates
        .withColumn(cnt, count(lit(1)).over(
          Window.partitionBy(keys.map(qcol): _*)))
        .filter(assert_true(ok, msg).isNull)
        .drop(cnt)
    }

    val t = target.alias("t")
    val u = checkedUpdates.alias("u")
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
