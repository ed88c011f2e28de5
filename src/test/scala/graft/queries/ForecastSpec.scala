package graft.queries

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Scalar re-derivations for the forecasting batch: the distributed
  * higher-order-function fold must equal a plain Scala fold over the
  * same ordered series BIT-EXACTLY (dyadic α = β = ½ arithmetic). */
class ForecastSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def dailySeries(): Map[String, Seq[Double]] =
    graft.engine.Tables(spark, sf, "events")
      .groupBy(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).cast("double").as("y"))
      .as[(String, Date, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toString).map(_._3).toSeq).toMap

  private def holtFold(ys: Seq[Double]): (Double, Double) =
    ys.tail.foldLeft((ys.head, 0.0)) { case ((l, b), y) =>
      val l2 = 0.5 * y + 0.5 * (l + b)
      (l2, 0.5 * (l2 - l) + 0.5 * b)
    }

  test("q_holt equals the scalar dyadic fold bit-exactly") {
    val got = SparkEntry.queries("q_holt")(spark, sf)
      .select("event_type", "n_days", "level", "trend", "forecast")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val series = dailySeries()
    got.foreach { case (et, n, level, trend, fc) =>
      val ys = series(et)
      assert(n == ys.size.toLong)
      val (l, b) = holtFold(ys)
      assert(level == l && trend == b && fc == l + b,
        s"$et: ($level, $trend) != scalar ($l, $b)")
    }
  }

  test("q_holt_backtest error accumulators equal the scalar walk") {
    val got = SparkEntry.queries("q_holt_backtest")(spark, sf)
      .select("event_type", "n_preds", "abs_err_holt_fp", "abs_err_naive_fp")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val series = dailySeries()
    got.foreach { case (et, n, ehGot, enGot) =>
      val ys = series(et)
      assert(n == (ys.size - 1).toLong)
      var (l, b, py) = (ys.head, 0.0, ys.head)
      var (eh, en) = (0L, 0L)
      ys.tail.foreach { y =>
        eh += math.floor(math.abs((l + b) - y) * 1000000d).toLong
        en += math.floor(math.abs(py - y) * 1000000d).toLong
        val l2 = 0.5 * y + 0.5 * (l + b)
        b = 0.5 * (l2 - l) + 0.5 * b
        l = l2
        py = y
      }
      assert(eh == ehGot && en == enGot,
        s"$et: scalar ($eh, $en) != dist ($ehGot, $enGot)")
    }
  }

  test("q_rolling_median equals a scalar day-range median walk") {
    val rows = SparkEntry.queries("q_rolling_median")(spark, sf)
      .as[(Date, Long, Long)].collect()
      .map { case (d, c, m) => (d.toLocalDate.toEpochDay, c, m) }
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (d, _, med) =>
      val win = (d - 6 to d).flatMap(byDay.get).sorted
      assert(win.nonEmpty)
      assert(med == win((win.size + 1) / 2 - 1),
        s"day $d: median $med != scalar ${win((win.size + 1) / 2 - 1)}")
    }
  }

  test("q_assortativity and q_modularity scores stay in analytic bounds") {
    val a = SparkEntry.queries("q_assortativity")(spark, sf)
      .as[(Long, Long)].head()
    assert(a._1 > 0)
    assert(a._2 >= -1000000L && a._2 <= 1000000L,
      s"assortativity ${a._2} outside [-1, 1] micro-units")
    val m = SparkEntry.queries("q_modularity")(spark, sf)
      .select("n_comms", "m", "num_sum", "q_fp")
      .as[(Long, Long, Long, Long)].head()
    assert(m._1 >= 1 && m._2 > 0)
    // Q ∈ [−1/2, 1) analytically
    assert(m._4 >= -500000L && m._4 < 1000000L,
      s"modularity ${m._4} outside [-0.5, 1) micro-units")
    // consistency: q_fp is exactly num_sum·10⁶ div 4m² (both engines
    // truncate toward zero — probed: DuckDB -7//2 = -3, Spark div same)
    assert(m._4 == m._3 * 1000000L / (4 * m._2 * m._2))
  }

  test("q_degree_dist mass checks: Σ n_nodes = |V|, Σ deg·n = 2|E|") {
    val rows = SparkEntry.queries("q_degree_dist")(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val e = Graph.partCoPurchase(spark, sf, 2L)
    val nV = e.select(col("u").as("n"))
      .unionByName(e.select(col("v").as("n"))).distinct().count()
    val nE = e.count()
    assert(rows.map(_._2).sum == nV)
    assert(rows.map { case (d, n) => d * n }.sum == 2 * nE)
  }
}
