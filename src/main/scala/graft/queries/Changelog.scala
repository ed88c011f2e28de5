package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Change-data-capture materialization operators (round-7 extension
  * batch). The events stream doubles as a changelog: per user the
  * (ts, event_id)-ordered event sequence is a stream of upserts, with
  * `error` events read as DELETE tombstones. These are the two
  * operators a CDC consumer runs: fold the log into current state
  * (tombstones clear history — the piece `q_merge_upsert`'s
  * last-write-wins upsert does NOT cover), and audit the log as
  * insert/update/delete net-change counts per day.
  *
  * Determinism: classification is pure CASE logic over exact columns,
  * all counts are BIGINT, the per-user order (ts, event_id) is total
  * (event_id is unique), and "after the last delete" is computed as a
  * reverse-cumulative tombstone count — a window aggregate, no
  * struct-max or driver-side state.
  */
object Changelog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Fold a changelog (user_id, ts, event_id, event_type, value) into
    * current state with tombstone semantics — see q_cdc_apply. */
  private[queries] def cdcApply(ev: DataFrame): DataFrame = {
    val rev = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val classified = ev
      .withColumn("is_del",
        when(col("event_type") === "error", 1L).otherwise(0L))
      .withColumn("ddown", sum(col("is_del")).over(rev))
      .withColumn("rn_desc", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)))
    classified.filter(col("ddown") === 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_live"),
        min(col("ts")).as("live_since"),
        max(when(col("rn_desc") === 1, col("event_type"))).as("last_type"),
        max(when(col("rn_desc") === 1, col("value"))).as("last_value"))
  }

  /** Classify each changelog row as I/U/D from its per-user context —
    * see q_cdc_netchange. Returns the input plus an `op` column. */
  private[queries] def cdcClassify(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("op",
        when(col("event_type") === "error", "D")
          .when(col("prev_type").isNull || col("prev_type") === "error", "I")
          .otherwise("U"))
      .drop("prev_type")
  }

  val queries: Seq[Q] = Seq(

    // ── CDC apply: fold the changelog into current state ──
    // A row is LIVE iff no tombstone at-or-after it in its user's
    // log: ddown = count of deletes in the window [current row, end)
    // — live ⇔ ddown = 0 (a delete row counts itself, so it is never
    // live, and everything before it is shadowed). Users whose whole
    // history is shadowed (last op is a delete) vanish from the
    // state — the tombstone semantics. Per surviving user: the last
    // live event's payload, the live-row count, and when the current
    // incarnation began. One window shuffle on the key + one keyed
    // aggregate; at 100 TB the changelog is bucketed by key so the
    // fold is exchange-free (the engine/Merge.scala deployment
    // story), and an incremental consumer folds only the new log
    // suffix against the persisted state table.
    Q("q_cdc_apply",
      (s, dir) => cdcApply(t(s, dir, "events")).orderBy("user_id"),
      Some("""WITH ev AS (
             |  SELECT user_id, ts, event_id, event_type, value,
             |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |      AS ddown,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts DESC, event_id DESC) AS rn_desc
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_live,
             |  MIN(ts) AS live_since,
             |  MAX(CASE WHEN rn_desc = 1 THEN event_type END) AS last_type,
             |  MAX(CASE WHEN rn_desc = 1 THEN value END) AS last_value
             |FROM ev WHERE ddown = 0
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── CDC net-change audit: I/U/D counts per day ──
    // Each event classifies from its user's log context: DELETE if a
    // tombstone, INSERT if it is the user's first event or the
    // previous op was a delete (a re-insert after tombstone), UPDATE
    // otherwise. The daily (n_ins, n_upd, n_del) triple is the
    // net-change audit a replication pipeline reconciles against the
    // target table's row-count delta. One lag window on the key +
    // one day-keyed aggregate of day-sized output.
    Q("q_cdc_netchange",
      (s, dir) => {
        cdcClassify(t(s, dir, "events"))
          .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
          .agg(sum(when(col("op") === "I", 1L).otherwise(0L)).as("n_ins"),
            sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_upd"),
            sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_del"))
          .orderBy("day")
      },
      Some("""WITH cl AS (
             |  SELECT ts, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |ops AS (SELECT ts,
             |  CASE WHEN event_type = 'error' THEN 'D'
             |       WHEN prev_type IS NULL OR prev_type = 'error' THEN 'I'
             |       ELSE 'U' END AS op
             |  FROM cl)
             |SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             |  CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_ins,
             |  CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
             |  CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_del
             |FROM ops GROUP BY 1 ORDER BY day""".stripMargin))
  )
}
