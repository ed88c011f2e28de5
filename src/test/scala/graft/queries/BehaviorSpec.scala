package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Golden recomputes for the behavioral batch: brute-force pair
  * recount for one sequence pattern, the changepoint argmin replayed
  * over all splits, uplift's 4-cell identity, and survival-curve
  * shape laws. */
class BehaviorSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_seqpat: brute-force recount for click→purchase") {
    val ev = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    var pairs = 0L
    val usersWith = scala.collection.mutable.Set.empty[Long]
    byUser.foreach { case (u, es) =>
      val clicks = es.filter(_._2 == "click")
      val purchases = es.filter(_._2 == "purchase")
      clicks.foreach { c =>
        purchases.foreach { p =>
          val after = p._3 > c._3 || (p._3 == c._3 && p._4 > c._4)
          if (after && p._3 <= c._3 + 3600000000L) { pairs += 1; usersWith += u }
        }
      }
    }
    val row = q("q_seqpat").collect()
      .find(r => r.getString(0) == "click" && r.getString(1) == "purchase").get
    assert(row.getLong(2) == pairs)
    assert(row.getLong(3) == usersWith.size.toLong)
    assert(row.getDouble(4) ==
      usersWith.size.toDouble / byUser.size.toDouble)
  }

  test("q_changepoint: argmin replayed over every interior split") {
    val daily = graft.engine.Tables(spark, sf, "events")
      .groupBy(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L").as("d"))
      .agg(count(lit(1)).as("x")).orderBy("d")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val xs = daily.map(_._2)
    val n = xs.length
    val st = xs.sum; val qt = xs.map(x => x * x).sum
    val splits = (1 until n).map { k =>
      val sl = xs.take(k).sum
      val sse = qt.toDouble -
        sl.toDouble * sl.toDouble / k.toDouble -
        (st - sl).toDouble * (st - sl).toDouble / (n - k).toDouble
      (k, sse)
    }
    val (bestK, bestSse) = splits.minBy(s => (s._2, s._1))
    val r = q("q_changepoint").collect().head
    assert(r.getLong(1) == bestK)
    assert(r.getLong(0) == daily(bestK - 1)._1, "split day is the k-th day")
    val sst = qt.toDouble - st.toDouble * st.toDouble / n.toDouble
    assert(r.getDouble(4) == 1.0 - bestSse / sst)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0)
  }

  test("q_uplift: cells partition user-periods; DID from the four rates") {
    val r = q("q_uplift").collect().head
    val cells = Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(cells.forall(_ > 0), "every arm × half cell must be populated")
    val userPeriods = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id"),
        expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L >= 15"))
      .distinct().count()
    assert(cells.sum == userPeriods)
    assert(r.getDouble(4).abs < 1.0)
  }

  test("q_survival: strictly decreasing from below 1, conv counts close") {
    val rows = q("q_survival").collect()
    assert(rows.nonEmpty)
    val s = rows.map(_.getDouble(2))
    assert(s.head < 1.0)
    assert(s.zip(s.tail).forall { case (a, b) => a > b })
    assert(s.forall(v => v >= 0.0 && v < 1.0))
    // total conversions ≤ signup users
    val signups = graft.engine.Tables(spark, sf, "events")
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum <= signups)
  }
}
