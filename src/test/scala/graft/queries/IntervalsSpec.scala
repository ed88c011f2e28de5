package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Scalar re-derivations + invariants for the interval/sweep batch
  * (q_interval_merge, q_peak_concurrency, q_weighted_median,
  * q_attribution_linear, q_unpivot) and the rank/ML additions
  * (q_ndcg, q_harmonic_cent, q_decision_stump, q_knn_classify).
  * Hand-built inputs run through the SAME distributed helpers the
  * declared queries call; expectations are independent scalar logic. */
class IntervalsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ── mergeIslands on hand-built intervals ──

  test("mergeIslands merges overlap and adjacency, splits on gaps") {
    // key a: [0,6],[4,10],[11,12] -> one island [0,12] (adjacent 11=10+1)
    //        [20,25]              -> second island; gap = 20-12-1 = 7
    // key b: [5,5]                -> single island, no gap
    val iv = Seq(("a", 0L, 6L), ("a", 4L, 10L), ("a", 11L, 12L),
      ("a", 20L, 25L), ("b", 5L, 5L)).toDF("k", "st", "en")
    val got = Intervals.mergeIslands(iv)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") == ("a", 2L, 19L, 7L)) // 13 + 6 covered
    assert(got("b") == ("b", 1L, 1L, 0L))
  }

  test("sweepPeak finds the max with the earliest-day tie-break") {
    // opens at 1,2,3 close at 4,5,6 -> open: d1=1 d2=2 d3=3 d4=2 ...
    // plus a second spike of equal height later: first peak day wins
    val ev = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L),
      (1L, 4L, -1L), (1L, 5L, -1L), (1L, 6L, -1L),
      (1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 1L),
      (1L, 13L, -3L)).toDF("nk", "d", "delta")
    val got = Intervals.sweepPeak(ev).as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 3L, 3L)))
  }

  // ── declared queries at sf0.001 ──

  test("q_interval_merge invariants: islands cover >= 7 days each") {
    val rows = SparkEntry.queries("q_interval_merge")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, ni, cov, gap) =>
      assert(ni >= 1 && cov >= 7 * ni, s"supplier $k: ni=$ni cov=$cov")
      assert(gap >= 0, s"supplier $k: gap=$gap")
    }
    // non-vacuous: merging must actually merge somewhere AND split
    // somewhere (all-1 or per-shipment islands would both be vacuous)
    assert(rows.exists(_._2 > 1), "no supplier with >1 island")
  }

  test("q_weighted_median matches a scalar recount for every flag") {
    val li = graft.engine.Tables(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "l_extendedprice",
        "CAST(l_quantity AS LONG) AS w", "l_orderkey", "l_linenumber")
      .as[(String, Double, Long, Long, Int)].collect()
    val expect = li.groupBy(_._1).map { case (flag, xs) =>
      val sorted = xs.sortBy(r => (r._2, r._4, r._5))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val row = sorted.find { r => cum += r._3; 2 * cum >= tot }.get
      flag -> (row._2, tot)
    }
    val got = SparkEntry.queries("q_weighted_median")(spark, sf)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect)
  }

  test("q_attribution_linear conserves exactly 10^6 per attributed purchase") {
    val e = graft.engine.Tables(spark, sf, "events")
    val p = e.filter($"event_type" === "purchase")
      .selectExpr("user_id AS up", "unix_micros(ts) AS usp",
        "event_id AS pid")
    val tch = e.filter($"event_type".isin("view", "click"))
      .selectExpr("user_id AS ut", "unix_micros(ts) AS ust")
    val attributed = p.join(tch,
        $"up" === $"ut" && $"ust" < $"usp" &&
          $"ust" >= $"usp" - 604800000000L)
      .select("pid").distinct().count()
    val rows = SparkEntry.queries("q_attribution_linear")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._3).sum == 1000000L * attributed,
      s"credit must sum to 1e6 x $attributed purchases")
  }

  test("q_unpivot: per-attribute count equals the part row count") {
    val n = graft.engine.Tables(spark, sf, "part").count()
    val rows = SparkEntry.queries("q_unpivot")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 2)
    rows.foreach { case (attr, cnt, vmin, vmax, vsum) =>
      assert(cnt == n, s"$attr: cnt=$cnt != $n")
      assert(vmin <= vmax && vsum >= vmin * n && vsum <= vmax * n)
    }
  }

  test("q_ndcg: dcg <= idcg, ndcg in [0, 1e6], and a scalar recount") {
    val rows = SparkEntry.queries("q_ndcg")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nk, dcg, idcg, ndcg) =>
      assert(dcg <= idcg, s"nation $nk: dcg=$dcg > idcg=$idcg")
      assert(ndcg >= 0 && ndcg <= 1000000L, s"nation $nk: ndcg=$ndcg")
      if (idcg > 0) assert(ndcg == dcg * 1000000L / idcg)
    }
    // scalar recount of one nation with relevant suppliers
    val disc = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val sup = graft.engine.Tables(spark, sf, "supplier")
      .selectExpr("s_nationkey", "s_suppkey", "s_acctbal")
      .as[(Long, Long, Double)].collect()
    val byNk = sup.groupBy(_._1)
    rows.foreach { case (nk, dcg, idcg, _) =>
      val g = byNk(nk).map { case (_, sk, bal) =>
        (if (bal > 9000) 3L else if (bal > 8000) 1L else 0L, bal, sk)
      }
      val act = g.sortBy(x => (-x._2, x._3)).take(10)
      val idl = g.sortBy(x => (-x._1, -x._2, x._3)).take(10)
      def d10(xs: Array[(Long, Double, Long)]) =
        xs.zipWithIndex.map { case (x, i) => x._1 * disc(i) }.sum
      assert(d10(act) == dcg && d10(idl) == idcg, s"nation $nk recount")
    }
  }

  test("q_harmonic_cent: score formula holds and ordering is deterministic") {
    val rows = SparkEntry.queries("q_harmonic_cent")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (node, deg, r2, hc) =>
      assert(r2 >= deg, s"node $node: reach2=$r2 < deg=$deg")
      assert(hc == deg * 1000000L + (r2 - deg) * 500000L)
    }
    val hcs = rows.map(r => (r._4, r._1))
    assert(hcs.zip(hcs.tail).forall { case ((h1, n1), (h2, n2)) =>
      h1 > h2 || (h1 == h2 && n1 < n2) }, "must be (score desc, node) ordered")
  }

  test("q_decision_stump: counts partition the corpus; split is non-trivial") {
    val docs = graft.engine.Tables(spark, sf, "documents")
    val n = docs.count()
    val en = docs.filter($"lang" === "en").count()
    val r = SparkEntry.queries("q_decision_stump")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(r.length == 1)
    val (_, _, nl, posl, nr, posr, score) = r.head
    assert(nl + nr == n && posl + posr == en)
    assert(nl > 0 && nr > 0, "degenerate split")
    assert(score > 0.0 && score <= n.toDouble, s"score=$score out of range")
  }

  test("q_growth_acct: conservation laws hold day over day") {
    val rows = SparkEntry.queries("q_growth_acct")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (d, act, nw, ret, res, _) =>
      assert(nw + ret + res == act, s"day $d: roles don't partition actives")
    }
    // retained(d) + churned(d) = active(d-1) whenever d-1 exists
    rows.keys.filter(d => rows.contains(d - 1)).foreach { d =>
      val (_, _, _, ret, _, chn) = rows(d)
      assert(ret + chn == rows(d - 1)._2,
        s"day $d: retained+churned != yesterday's actives")
    }
    // non-vacuity: resurrection and churn both actually occur
    assert(rows.values.exists(_._5 > 0) && rows.values.exists(_._6 > 0))
  }

  test("q_knn_classify: predictions come from the label domain, hit is consistent") {
    val labels = graft.engine.Tables(spark, sf, "embeddings")
      .select($"label".cast("long")).as[Long].collect().toSet
    val rows = SparkEntry.queries("q_knn_classify")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 50)
    rows.foreach { case (qid, t, p, hit) =>
      assert(qid % 10 == 0 && labels.contains(p))
      assert(hit == (if (t == p) 1L else 0L))
    }
  }
}
