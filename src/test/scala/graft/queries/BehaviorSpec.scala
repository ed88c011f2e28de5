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

  test("q_seqpat: self-join equi keys are (user, hour bucket), band as residual") {
    // scale contract: the pair join must hash on user AND the hour
    // bucket so a single hyperactive user cannot make one key
    // quadratic — comparisons are Σ per-user-per-hour², and the exact
    // 1-hour/tie predicate stays as a residual filter on the join
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = q("q_seqpat").queryExecution.optimizedPlan
      .collect { case j: Join => j }
    val pair = joins.filter(_.condition.isDefined)
      .map(j => conjuncts(j.condition.get))
      .filter(cs => cs.exists(_.toString.contains("3600000000")))
      .head
    val eqKeys = pair.collect { case e: EqualTo => e }
    assert(eqKeys.size >= 2,
      s"pair join needs (user, bucket) equi keys, got: ${pair.mkString(" && ")}")
    assert(eqKeys.exists(e => e.references.exists(_.name.startsWith("hb"))),
      s"one equi key must be the hour bucket: ${eqKeys.mkString(" && ")}")
    // residual band predicate survives alongside the bucket key
    assert(pair.exists(c => !c.isInstanceOf[EqualTo]),
      "the exact time band must remain as a residual predicate")
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

  test("q_runs_test: scalar replay of runs counting and the z formula") {
    val daily = graft.engine.Tables(spark, sf, "events")
      .groupBy(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L").as("d"))
      .agg(count(lit(1)).as("x")).orderBy("d")
      .collect().map(_.getLong(1))
    val signs = daily.zip(daily.tail).map { case (a, b) => b - a }
      .filter(_ != 0).map(d => if (d > 0) 1 else -1)
    val n1 = signs.count(_ == 1).toLong
    val n2 = signs.count(_ == -1).toLong
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }.toLong
    val r = q("q_runs_test").collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2 && r.getLong(2) == runs)
    val mu = 2.0 * n1 * n2 / (n1 + n2).toDouble + 1.0
    val z = (runs.toDouble - mu) /
      math.sqrt((mu - 1.0) * (mu - 2.0) / (n1 + n2 - 1).toDouble)
    assert(r.getDouble(3) == z)
  }

  test("q_cohort_ltv: per-cohort LTV is non-decreasing in tenure; sizes partition") {
    val rows = q("q_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, cells) =>
      val byTenure = cells.sortBy(_._2)
      val ltvs = byTenure.map(_._4)
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => a <= b },
        s"cohort $cohort LTV decreased")
      assert(byTenure.head._2 == 0L, s"cohort $cohort lacks a tenure-0 cell")
      assert(ltvs.head > 0.0)
    }
    // cohort sizes sum to the distinct customer count
    val sizes = rows.groupBy(_._1).map(_._2.head._3).sum
    val customers = graft.engine.Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(sizes == customers)
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
