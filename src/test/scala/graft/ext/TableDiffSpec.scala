package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Reconciliation semantics: the diff report must name exactly the
  * columns that moved, never report an unchanged key, and classify
  * one-sided keys without a column list. */
class TableDiffSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q_table_diff: statuses partition the keys, changed_cols only on diff") {
    import spark.implicits._
    val rows = SparkEntry.queries("q_table_diff")(spark, sf)
      .as[(Long, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, status, cols) =>
      assert(Set("only_a", "only_b", "diff")(status), s"key $k status $status")
      if (status == "diff")
        assert(cols.nonEmpty && cols.split(",").forall(
          Set("last_ts", "last_type", "n")), s"key $k cols '$cols'")
      else assert(cols.isEmpty, s"one-sided key $k carries cols '$cols'")
    }
    // a changed key must really differ: mid-month profile vs month-end
    // profile — any user with events after the cutoff has a larger n
    val diffKeys = rows.filter(_._2 == "diff").map(_._1).toSet
    val after = graft.engine.Tables(spark, sf, "events")
      .filter(col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp"))
      .select("user_id").distinct().as[Long].collect().toSet
    assert(diffKeys.subsetOf(after),
      "diff reported for a user with no post-cutoff events")
  }

  test("q_asof_join_fwd: every match is the first purchase in the window") {
    import spark.implicits._
    val got = SparkEntry.queries("q_asof_join_fwd")(spark, sf)
      .filter(col("next_purchase").isNotNull)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "no forward matches at all")
    val ev = graft.engine.Tables(spark, sf, "events")
      .select(col("event_id"), col("ts")).as[(Long, java.sql.Timestamp)]
      .collect().toMap
    val purchases = graft.engine.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val byUser = purchases.groupBy(_._2)
    got.take(200).foreach { case (eid, uid, pid) =>
      val ts = ev(eid)
      val window = byUser.getOrElse(uid, Array.empty).filter { case (_, _, pt) =>
        !pt.before(ts) && pt.getTime <= ts.getTime + 7L * 86400000L
      }
      assert(window.nonEmpty, s"view $eid matched $pid but window empty")
      val best = window.minBy(p => (p._3.getTime, p._1))
      assert(best._1 == pid, s"view $eid: expected ${best._1}, got $pid")
    }
  }
}
