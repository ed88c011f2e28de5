package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantics of the round-5 analytics/curation operators beyond the
  * oracle's single-SF hash check: IVM fold-equals-recompute as a
  * relational identity, entity-cluster invariants, independent
  * re-derivation of the pattern matches, LM-score bounds, and
  * weighted-sample determinism + weight monotonicity. */
class AnalyticsOpsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q_ivm_counts: folded increments equal the one-shot recompute") {
    val folded = SparkEntry.queries("q_ivm_counts")(spark, sf)
    val direct = graft.engine.Tables(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("v_sum"))
    // exact symmetric equality — the fold may not drop, duplicate, or
    // re-round anything the direct aggregate computes
    assert(folded.exceptAll(direct).isEmpty && direct.exceptAll(folded).isEmpty)
  }

  test("q_entity_resolve: one canonical per cluster, bounded, cross-source") {
    val rows = SparkEntry.queries("q_entity_resolve")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    assert(rows.length == 160) // 150 customers + 10 suppliers
    val byCluster = rows.groupBy(_._3)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._4) == 1, s"cluster $cid canonical count != 1")
      assert(members.forall(_._5 == members.length),
        s"cluster $cid n_members disagrees with actual size")
      // a decade block holds ≤10 customers + ≤10 suppliers (keys start
      // at 0, so sf0.001's 10 suppliers all land in the 0-decade)
      assert(members.length <= 20, s"cluster $cid saturated: ${members.length}")
      // the canonical member IS the label (min eid)
      assert(members.filter(_._4).head._1 == members.map(_._1).min)
    }
    // suppliers must link into customer decades — the cross-source point
    assert(byCluster.values.exists(m =>
      m.exists(_._2 == "c") && m.exists(_._2 == "s")),
      "no cross-source entity cluster resolved")
  }

  test("q_event_pattern: matches re-derived from the raw event stream") {
    val got = SparkEntry.queries("q_event_pattern")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // independent recompute: walk each user's ordered history with a
    // 3-state machine (seen-v, seen-vc, done), reset on error
    val code = Map("signup" -> 's', "view" -> 'v', "click" -> 'c',
      "purchase" -> 'p', "error" -> 'e')
    val byUser = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        code(r.getString(3)))))
      .groupBy(_._1)
    assert(byUser.keySet == got.keySet)
    byUser.foreach { case (uid, evs) =>
      val seq = evs.map(_._2).sortBy(e => (e._1, e._2)).map(_._3).mkString
      var state = 0
      seq.foreach {
        case 'e' => if (state < 3) state = 0
        case 'v' => if (state == 0) state = 1
        case 'c' => if (state == 1) state = 2
        case 'p' => if (state == 2) state = 3
        case _ => ()
      }
      assert(got(uid) == (state == 3),
        s"user $uid: regex says ${got(uid)}, state machine says ${state == 3}")
    }
  }

  test("q_lm_quality: transition counts and score bounds") {
    val rows = SparkEntry.queries("q_lm_quality")(spark, sf).collect()
    val nWords = graft.engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, nTrans, lik) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      assert(nTrans == math.max(0L, nWords(id) - 1),
        s"doc $id n_trans $nTrans vs ${nWords(id)} words")
      // Laplace-smoothed likelihood in fixed-point: 0 < fp <= 10^6
      // (token-less docs score exactly 0 by definition)
      if (nTrans > 0) assert(lik > 0.0 && lik <= 1000000.0, s"doc $id mean_lik $lik")
      else assert(lik == 0.0, s"doc $id mean_lik $lik with no transitions")
    }
  }

  test("q_sample_weighted: deterministic and weight-monotone") {
    val q = SparkEntry.queries("q_sample_weighted")
    val a = q(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = q(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "weighted sample not reproducible across runs")
    assert(a.length == 50)
    // upweighted languages must be OVERrepresented vs their corpus
    // share: en is 4 tickets/doc vs 1 — with 500 docs and k=50 this
    // holds by a wide margin on the fixed corpus (not a tail event)
    val sample = q(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = graft.engine.Tables(spark, sf, "documents")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enSample = sample.getOrElse("en", 0L).toDouble / 50
    val enCorpus = corpus("en").toDouble / corpus.values.sum
    assert(enSample > enCorpus,
      s"en share $enSample not above corpus share $enCorpus")
  }

  test("q_mmr: greedy picks are distinct, seeded by top-1, and diversify") {
    val rows = SparkEntry.queries("q_mmr")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 4 && byQ.values.forall(_.length == 5))
    byQ.foreach { case (qid, picks) =>
      assert(picks.map(_._3).distinct.length == 5, s"q $qid repeated a pick")
      // step 1 must be the pure-relevance argmax of the emitted pool
      val first = picks.minBy(_._2)
      val maxCos = picks.map(_._4).max
      assert(first._4 == maxCos ||
        picks.filter(_._4 == maxCos).map(_._3).min == first._3,
        s"q $qid step-1 is not the relevance top-1")
    }
    // diversification must be REAL on this corpus (probed 3/4 queries
    // reorder at sf0.001): somewhere the pick order deviates from the
    // relevance order of the same 5 items
    val reorders = byQ.values.count { picks =>
      val byStep = picks.sortBy(_._2).map(_._3).toSeq
      val byRel = picks.sortBy(p => (-p._4, p._3)).map(_._3).toSeq
      byStep != byRel
    }
    assert(reorders >= 1, "MMR never reordered — vacuous diversification")
  }

  test("q_dbscan: roles partition the corpus, labels are cluster minima") {
    val rows = SparkEntry.queries("q_dbscan")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val corpus = graft.engine.Tables(spark, sf, "embeddings").count()
    assert(rows.length == corpus)
    val byRole = rows.groupBy(_._2)
    assert(byRole.contains("core") && byRole.contains("noise"),
      "vacuous clustering — need at least cores and noise")
    // noise carries the -1 sentinel; clustered vectors carry a label
    byRole.getOrElse("noise", Array()).foreach(r => assert(r._3 == -1L))
    val clustered = rows.filter(_._2 != "noise")
    clustered.foreach(r => assert(r._3 >= 0L))
    // a cluster's label is the min CORE id in it, and every border's
    // cluster must also contain a core
    val coreByCluster = byRole("core").groupBy(_._3)
    coreByCluster.foreach { case (lbl, cs) =>
      assert(cs.map(_._1).min == lbl, s"cluster $lbl label not its min core")
    }
    byRole.getOrElse("border", Array()).foreach { b =>
      assert(coreByCluster.contains(b._3),
        s"border ${b._1} in coreless cluster ${b._3}")
    }
  }

  test("q_ann_recall: per-query recall algebra and the mean identity") {
    val rows = SparkEntry.queries("q_ann_recall")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 8)
    rows.foreach { case (q, h, ppm, _) =>
      assert(h >= 0 && h <= 5 && ppm == h * 200000L, s"query $q")
    }
    val mean = rows.map(_._4).distinct
    assert(mean.length == 1 &&
      mean.head == rows.map(_._3).sum.toDouble / rows.length,
      "mean column must be the constant per-query average")
  }

  test("q_boxplot: quartile order, fence formula, scalar outlier recount") {
    val rows = SparkEntry.queries("q_boxplot")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    assert(rows.nonEmpty)
    val fps = graft.engine.Tables(spark, sf, "events")
      .selectExpr("event_type", "CAST(floor(value * 10000) AS LONG) AS fp")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2) }
    rows.foreach { case (et, (n, mn, q1, med, q3, mx, nlo, nhi)) =>
      assert(mn <= q1 && q1 <= med && med <= q3 && q3 <= mx, s"$et order")
      val xs = fps(et)
      assert(n == xs.length)
      val lo = q1 - (3 * (q3 - q1)) / 2
      val hi = q3 + (3 * (q3 - q1)) / 2
      assert(nlo == xs.count(_ < lo) && nhi == xs.count(_ > hi),
        s"$et outlier recount")
      val sorted = xs.sorted
      assert(q1 == sorted(((n + 3) / 4 - 1).toInt) &&
        med == sorted(((n + 1) / 2 - 1).toInt) &&
        q3 == sorted(((3 * n + 3) / 4 - 1).toInt), s"$et rank picks")
    }
  }
}
