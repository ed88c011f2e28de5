package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Golden recomputes for the model-evaluation operators: AUC against
  * brute-force pair counting with explicit ½-tie credit, confusion
  * cells against direct filters, calibration closure, and the
  * weighted-class identity Σ n_c·w_c = n_total · (1/k · k) = n. */
class MlEvalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def scored(): Array[(Boolean, Long)] =
    graft.engine.Tables(spark, sf, "events")
      .select(col("event_type") === "purchase",
        floor(col("value") * 10000).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))

  test("q_auc equals brute-force pair counting with half-credit ties") {
    val rows = scored()
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    var num = 0.0
    pos.foreach { p =>
      neg.foreach { n =>
        if (p > n) num += 1.0 else if (p == n) num += 0.5
      }
    }
    val expect = num / (pos.length.toDouble * neg.length.toDouble)
    val r = q("q_auc").collect().head
    assert(r.getLong(0) == pos.length && r.getLong(1) == neg.length)
    // identical value up to the different but exact summation orders:
    // both are exact multiples of 0.5 over exact integer denominators
    assert(math.abs(r.getDouble(2) - expect) < 1e-12,
      s"${r.getDouble(2)} vs $expect")
    assert(r.getDouble(2) > 0.3 && r.getDouble(2) < 0.7,
      "value is near-chance for the purchase label by construction")
  }

  test("q_confusion cells match direct filters; F1 uses the cleared form") {
    val rows = scored()
    val tp = rows.count(r => r._1 && r._2 >= 500000L).toLong
    val fp = rows.count(r => !r._1 && r._2 >= 500000L).toLong
    val fn = rows.count(r => r._1 && r._2 < 500000L).toLong
    val tn = rows.count(r => !r._1 && r._2 < 500000L).toLong
    val r = q("q_confusion").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((tp, fp, fn, tn)))
    assert(r.getDouble(4) == tp.toDouble / (tp + fp).toDouble)
    assert(r.getDouble(5) == tp.toDouble / (tp + fn).toDouble)
    assert(r.getDouble(6) == (tp * 2).toDouble / (tp * 2 + fp + fn).toDouble)
  }

  test("q_calibration: bins partition all events, predictions rise with bin") {
    val rows = q("q_calibration").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables(spark, sf, "events").count())
    val preds = rows.map(_.getDouble(3))
    assert(preds.zip(preds.tail).forall { case (a, b) => a < b },
      "mean prediction must increase across score deciles")
    rows.foreach(r => assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q_class_weights: weighted class mass is uniform (the balancing identity)") {
    val rows = q("q_class_weights").collect()
    val k = rows.length
    val nTotal = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (nC, w) = (r.getLong(1), r.getDouble(2))
      assert(w == nTotal.toDouble / (k * nC).toDouble)
      // each class's weighted mass n_c·w_c = n_total/k — uniform
      assert(math.abs(nC * w - nTotal.toDouble / k) < 1e-9)
    }
  }

  test("q_gains: deciles partition, capture is monotone and ends at 10^6") {
    val rows = graft.SparkEntry.queries("q_gains")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val e = graft.engine.Tables(spark, sf, "events")
    assert(rows.map(_._2).sum == e.count())
    assert(rows.map(_._3).sum ==
      e.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
        .count())
    val caps = rows.map(_._5)
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b },
      "capture must be monotone in depth")
    assert(caps.last == 1000000L, "full depth must capture everything")
    // lift telescopes to exactly 1 at full depth
    assert(rows.last._6 == 1000000L)
  }
}
