package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Golden recomputes for the variance-decomposition batch: ANOVA F
  * with the DECIMAL(28,6) quantization replayed in scalar code, PCA
  * eigen-algebra from raw moments, Lorenz-curve shape laws, and
  * Cramér's V against a quantized χ² recompute. */
class Stats3Spec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def quant(x: Double, scale: Int): JBigDecimal =
    new JBigDecimal(x).setScale(scale, RoundingMode.HALF_UP)

  test("q_anova matches a scalar recompute with replayed quantization") {
    val raw = graft.engine.Tables(spark, sf, "events")
      .select(col("event_type"), floor(col("value") * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = raw.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val k = groups.size.toLong
    val nn = raw.length.toLong
    val ss = raw.map(_._2).sum
    val qq = raw.map(r => BigInt(r._2) * r._2).sum
    var bsum = JBigDecimal.ZERO
    groups.foreach { g =>
      val s = g.sum.toDouble
      bsum = bsum.add(quant(s * s / g.length.toDouble, 6))
    }
    val bd = bsum.doubleValue()
    val grand = ss.toDouble * ss.toDouble / nn.toDouble
    val ssw = BigDecimal(qq).toDouble - bd
    val f = ((bd - grand) / (k - 1).toDouble) / (ssw / (nn - k).toDouble)
    val r = q("q_anova").collect().head
    assert(r.getLong(0) == k && r.getLong(1) == nn)
    assert(r.getDouble(2) == f, s"${r.getDouble(2)} vs $f")
    assert(f > 0.0)
  }

  test("q_pca2 eigen algebra from raw moments; evr in [1/2, 1]") {
    val rows = q("q_pca2").collect()
    assert(rows.length == 3)
    val raw = graft.engine.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val g = raw.filter(_._1 == r.getString(0))
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => BigInt(t._3) * t._3).sum
      val a = BigDecimal(BigInt(n) * sxx - BigInt(sx) * sx).toDouble
      val b = BigDecimal(BigInt(n) * syy - BigInt(sy) * sy).toDouble
      val c = BigDecimal(BigInt(n) * sxy - BigInt(sx) * sy).toDouble
      val lam1 = (a + b + math.sqrt((a - b) * (a - b) + 4.0 * c * c)) / 2.0
      assert(r.getDouble(2) == lam1 / (a + b))
      assert(r.getDouble(3) == c / (lam1 - b))
      // top eigenvalue carries at least half, at most all, of the trace
      assert(r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0)
    }
  }

  test("q_lorenz: convex increasing curve ending at 1, deciles partition customers") {
    val rows = q("q_lorenz").collect()
    assert(rows.length == 10)
    val nCust = graft.engine.Tables(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    val shares = rows.map(_.getDouble(2))
    assert(shares.last == 1.0)
    assert(shares.zip(shares.tail).forall { case (x, y) => x < y })
    // below the diagonal (concentration): decile d holds ≤ d/10 of revenue
    rows.foreach(r => assert(r.getDouble(2) <= r.getLong(0).toDouble / 10 + 1e-9))
    // marginal decile revenue is non-decreasing (customers are rank-sorted)
    val marg = shares.head +: shares.zip(shares.tail).map { case (x, y) => y - x }
    assert(marg.zip(marg.tail).forall { case (x, y) => x <= y + 1e-12 })
  }

  test("q_tvd: brute-force recompute; bounded in [0, 1]") {
    val raw = graft.engine.Tables(spark, sf, "events")
      .select(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L < 15"),
        floor(col("value") * 10).cast("long"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val h1 = raw.filter(_._1).map(_._2)
    val h2 = raw.filterNot(_._1).map(_._2)
    val (n1, n2) = (h1.length.toLong, h2.length.toLong)
    val bins = (h1 ++ h2).distinct
    val num = bins.map { v =>
      val c1 = h1.count(_ == v).toLong; val c2 = h2.count(_ == v).toLong
      (c1 * n2 - c2 * n1).abs
    }.sum
    val r = q("q_tvd").collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) ==
      num.toDouble / 2.0 / n1.toDouble / n2.toDouble)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("q_bottomk: the k minima are the true hash minima; merge law holds") {
    val rows = q("q_bottomk").collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (et, rs) =>
      assert(rs.length == 5, s"$et expected exactly k=5 rows")
      val hvs = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(hvs.zip(hvs.tail).forall { case (a, b) => a <= b })
      // the declared minima really are the smallest hashes of the
      // type's distinct users
      val all = graft.engine.Tables(spark, sf, "events")
        .filter(col("event_type") === et).select("user_id").distinct()
        .withColumn("hv", expr(graft.functions.HashSample.sparkRaw("user_id")))
        .collect().map(_.getLong(1)).sorted
      assert(hvs.toSeq == all.take(5).toSeq)
      // estimate only on the rank-5 row
      assert(rs.filter(_.getLong(1) < 5).forall(_.isNullAt(4)))
      val est = rs.find(_.getLong(1) == 5).get.getLong(4)
      assert(est == 4L * 4294967296L / hvs.last)
    }
    // merge law: global bottom-5 = bottom-5 of the per-type unions
    val global = graft.engine.Tables(spark, sf, "events")
      .select("user_id").distinct()
      .withColumn("hv", expr(graft.functions.HashSample.sparkRaw("user_id")))
      .collect().map(_.getLong(1)).sorted.take(5)
    val unionBottom = rows.map(_.getLong(3)).distinct.sorted.take(5)
    assert(unionBottom.toSeq == global.toSeq)
  }

  test("q_jackknife: SE has the right scale vs the classical formula") {
    val r = q("q_jackknife").collect().head
    val (n, mean, se) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n == graft.engine.Tables(spark, sf, "events").count())
    val vals = graft.engine.Tables(spark, sf, "events")
      .select(col("value")).collect().map(_.getDouble(0))
    val m = vals.sum / vals.length
    // the query's mean is over floor(value·1e4) fixed-point — biased
    // low by at most one 1e-4 quantum
    assert(mean <= m && m - mean < 1e-4)
    // classical SE = s/√n; block jackknife must agree within 3×
    val s2 = vals.map(v => (v - m) * (v - m)).sum / (vals.length - 1)
    val classical = math.sqrt(s2 / vals.length)
    assert(se > classical / 3 && se < classical * 3,
      s"jackknife SE $se implausible vs classical $classical")
  }

  test("q_debounce: keep counts match a scalar replay of the gap rule") {
    val rows = q("q_debounce").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.engine.Tables(spark, sf, "events").count())
    // scalar replay on one user
    val ev = graft.engine.Tables(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keptScalar = ev.groupBy(_._1).values.map { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      1 + sorted.zip(sorted.tail).count { case (a, b) => b._2 - a._2 > 5000000L }
    }.sum
    assert(rows.map(_.getLong(2)).sum == keptScalar)
    rows.foreach(r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble))
  }

  test("q_conformal: coverage guarantee holds on the calibration data itself") {
    val rows = q("q_conformal").collect()
    val raw = graft.engine.Tables(spark, sf, "events")
      .select(col("event_type"), floor(col("value") * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val (et, n, qhat) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val g = raw.filter(_._1 == et).map(_._2)
      assert(g.length == n)
      val s = g.sum
      // in-sample coverage: |v − mean| ≤ qhat for ≥ 90% (rank def)
      val covered = g.count(v =>
        math.abs(n * v - s).toDouble / n.toDouble / 1e4 <= qhat)
      assert(covered >= math.ceil(0.9 * n).toLong - 1, s"$et covers $covered/$n")
      // qhat is the exact k-th smallest cleared residual
      val k = math.min((9 * (n + 1) + 9) / 10, n).toInt
      val res = g.map(v => math.abs(n * v - s)).sorted.apply(k - 1)
      assert(qhat == res.toDouble / n.toDouble / 1e4)
    }
  }

  test("q_trimmed_mean sits inside the winsorize bounds and near the mean") {
    val tm = q("q_trimmed_mean").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val wz = q("q_winsorize").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    tm.foreach { case (rf, (kept, mean)) =>
      val (lo, hi) = wz(rf)
      assert(mean * 100 >= lo && mean * 100 <= hi,
        s"$rf trimmed mean outside the p05/p95 band")
      assert(kept > 0)
    }
  }

  test("q_hellinger: BC in (0,1], H agrees with TVD's ordering of drift") {
    val r = q("q_hellinger").collect().head
    val (bc, h) = (r.getDouble(2), r.getDouble(3))
    assert(bc > 0.0 && bc <= 1.0)
    assert(h == math.sqrt(math.max(0.0, 1.0 - bc)))
    // Hellinger bounds TVD: H² ≤ TVD ≤ H·√2
    val tvd = q("q_tvd").collect().head.getDouble(2)
    assert(h * h <= tvd + 1e-12 && tvd <= h * math.sqrt(2.0) + 1e-12,
      s"H=$h TVD=$tvd violate the Hellinger–TV inequalities")
  }

  test("q_cramer_v matches the quantized chi-square recompute; V in [0, 1]") {
    val cells = graft.engine.Tables(spark, sf, "events")
      .withColumn("wk", expr("(unix_micros(ts) div 86400000000L) % 7 IN (2, 3)"))
      .groupBy("event_type", "wk").count()
      .collect().map(r => ((r.getString(0), r.getBoolean(1)), r.getLong(2))).toMap
    val rKeys = cells.keys.map(_._1).toSeq.distinct
    val cKeys = cells.keys.map(_._2).toSeq.distinct
    val tot = cells.values.sum
    var chi2q = JBigDecimal.ZERO
    cells.foreach { case ((et, wk), o) =>
      val rr = cells.filter(_._1._1 == et).values.sum
      val cc = cells.filter(_._1._2 == wk).values.sum
      val diff = (o * tot - rr * cc).toDouble
      chi2q = chi2q.add(new JBigDecimal(diff * diff / (rr * cc * tot).toDouble)
        .setScale(8, RoundingMode.HALF_UP))
    }
    val r = q("q_cramer_v").collect().head
    assert(r.getLong(0) == rKeys.length && r.getLong(1) == cKeys.length)
    assert(r.getLong(2) == tot)
    assert(r.getDouble(3) == chi2q.doubleValue())
    val v = math.sqrt(chi2q.doubleValue() /
      (tot * (math.min(rKeys.length, cKeys.length) - 1)).toDouble)
    assert(r.getDouble(4) == v)
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q_wilcoxon: rank-sum identity, z recompute, n_eff <= n_pairs") {
    val r = q("q_wilcoxon").collect().head
    val (np, ne, wp, wm, z) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))
    assert(ne >= 1 && ne <= np)
    // doubled ranks over the n_eff nonzero diffs sum to 2·n(n+1)/2
    assert(wp + wm == ne * (ne + 1), s"wp=$wp wm=$wm ne=$ne")
    val zExp = (wp.toDouble / 2.0 - (ne * (ne + 1)).toDouble / 4.0) /
      math.sqrt((ne * (ne + 1) * (2 * ne + 1)).toDouble / 24.0)
    assert(z == zExp)
  }

  test("q_abc: classes partition parts, shares telescope to 10^6") {
    val rows = q("q_abc").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet.subsetOf(Set("A", "B", "C")) && rows.contains("A"))
    val totalParts = graft.engine.Tables(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum == totalParts)
    // truncating div loses < 1 ppm per class
    val shareSum = rows.values.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.size,
      s"share_ppm sum $shareSum")
    // A captures the largest-revenue parts: its per-part revenue mean
    // must dominate C's (Pareto shape)
    if (rows.contains("C")) {
      val (na, ra, _) = rows("A"); val (nc, rc, _) = rows("C")
      assert(ra * nc > rc * na, "A's mean part revenue must exceed C's")
    }
  }

  test("q_sketch_intersect: estimator identities and the exact-arm envelope") {
    val r = q("q_sketch_intersect").collect().head
    val (k, theta, nc, est, exact, na, nb) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert(k == 64 && nc <= k && theta > 0 && theta <= 4294967296L)
    assert(est == nc * 4294967296L / theta, "estimator formula recompute")
    assert(exact <= math.min(na, nb))
    // KMV k=64 has ~12.5% relative error; 50% is a loose CI floor that
    // still rules out a broken estimator (est=0 or est≈|A∪B|)
    assert(est > 0 && math.abs(est - exact) <= exact / 2,
      s"est=$est exact=$exact outside the envelope")
  }

  test("q_ohlc: edge picks match a scalar recount, bounds hold") {
    val rows = q("q_ohlc").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows.nonEmpty)
    rows.values.foreach { case (o, h, l, c, n) =>
      assert(l <= o && o <= h && l <= c && c <= h && n > 0)
    }
    val ev = graft.engine.Tables(spark, sf, "events")
      .selectExpr("(unix_micros(ts) - 1704067200000000) div 86400000000 AS d",
        "unix_micros(ts) AS us", "event_id",
        "CAST(floor(value * 10000) AS LONG) AS fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.values.map(_._5).sum == ev.length)
    ev.groupBy(_._1).foreach { case (d, ticks) =>
      val sorted = ticks.sortBy(t => (t._2, t._3))
      val (o, h, l, c, n) = rows(d)
      assert(o == sorted.head._4 && c == sorted.last._4)
      assert(h == ticks.map(_._4).max && l == ticks.map(_._4).min)
      assert(n == ticks.length)
    }
  }

  test("q_twap: span telescopes to day-end minus first tick, OHLC bounds hold") {
    val tw = q("q_twap").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val bars = q("q_ohlc").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val firstTick = graft.engine.Tables(spark, sf, "events")
      .selectExpr("(unix_micros(ts) - 1704067200000000) div 86400000000 AS d",
        "unix_micros(ts) - 1704067200000000 AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).min }
    assert(tw.keySet == bars.keySet)
    tw.foreach { case (d, (n, span, twap)) =>
      assert(n > 0)
      assert(span == (d + 1) * 86400000000L - firstTick(d),
        s"day $d: span $span does not telescope")
      val (hi, lo) = bars(d)
      assert(twap >= lo && twap <= hi, s"day $d: twap $twap outside [$lo,$hi]")
    }
  }

  test("q_silhouette: scores in [-1, 1], cells partition the corpus") {
    val rows = q("q_silhouette").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val corpus = graft.engine.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == corpus, "every vector in exactly one cell")
    rows.foreach { case (cid, n, sil) =>
      assert(n > 0 && sil >= -1.0 && sil <= 1.0, s"cell $cid: n=$n sil=$sil")
    }
    // a clustering where NO cell beats silhouette 0 would mean the
    // codebook is no better than random — flag it
    assert(rows.exists(_._3 > 0.0), "no cell with positive silhouette")
  }

  test("q_median_ci: bracket order and rank-pick recount") {
    val rows = q("q_median_ci").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val fps = graft.engine.Tables(spark, sf, "events")
      .selectExpr("event_type", "CAST(floor(value * 10000) AS LONG) AS fp")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    rows.foreach { case (et, (n, med, lo, hi)) =>
      assert(lo <= med && med <= hi, s"$et bracket order")
      val xs = fps(et)
      assert(n == xs.length)
      val d = 1.96 * math.sqrt(n.toDouble)
      val loR = math.max(1L, math.floor((n - d) / 2.0).toLong)
      val hiR = math.min(n, math.ceil((n + d) / 2.0).toLong + 1)
      assert(med == xs(((n + 1) / 2 - 1).toInt))
      assert(lo == xs((loR - 1).toInt) && hi == xs((hiR - 1).toInt),
        s"$et rank picks")
    }
  }

  test("q_pacf: Durbin-Levinson recount from the emitted ACF values") {
    val r = q("q_pacf").collect().head
    val (r1, r2, r3) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val (p1, p2, p3) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(p1 == r1)
    val e2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    assert(p2 == e2)
    val phi21 = r1 - e2 * r1
    val e3 = (r3 - phi21 * r2 - e2 * r1) / (1.0 - phi21 * r1 - e2 * r2)
    assert(p3 == e3)
    // ACF must agree with the declared q_acf at the shared lags
    val acf = q("q_acf").collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r1 == acf(1L) && r2 == acf(2L) && r3 == acf(3L))
    Seq(p1, p2, p3).foreach(p => assert(p >= -1.0 && p <= 1.0))
  }

  test("q_crosscorr: scalar recount per lag, overlap lengths symmetric") {
    val rows = q("q_crosscorr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == (-3L to 3L).toSet)
    val daily = graft.engine.Tables(spark, sf, "events")
      .selectExpr("(unix_micros(ts) - 1704067200000000) div 86400000000 AS d",
        "CAST(event_type = 'view' AS LONG) AS x",
        "CAST(event_type = 'purchase' AS LONG) AS y")
      .groupBy("d").sum("x", "y")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (-3L to 3L).foreach { lag =>
      val al = daily.keys.toSeq.sorted.flatMap { d =>
        daily.get(d + lag).map(b => (daily(d)._1, b._2))
      }
      val (n, r) = rows(lag)
      assert(n == al.length, s"lag $lag overlap")
      val sx = al.map(_._1).sum; val sy = al.map(_._2).sum
      val sxy = al.map(p => p._1 * p._2).sum
      val sxx = al.map(p => p._1 * p._1).sum
      val syy = al.map(p => p._2 * p._2).sum
      val exp = (n * sxy - sx * sy).toDouble /
        (math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble))
      assert(r == exp, s"lag $lag: $r != $exp")
      assert(r >= -1.0 && r <= 1.0)
      assert(rows(lag)._1 == rows(-lag)._1, s"lag $lag overlap asymmetric")
    }
  }

  test("q_cluster_outlier: cells partition the corpus, threshold algebra holds") {
    val rows = q("q_cluster_outlier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val corpus = graft.engine.Tables(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == corpus)
    rows.foreach { case (cid, n, mean, std, out) =>
      assert(n > 0 && mean >= 0.0 && std >= 0.0, s"cell $cid stats")
      // Chebyshev: at most 1/4 of a cell can sit beyond mean+2σ —
      // one-sided is even tighter, so n/4 is a safe ceiling
      assert(out <= n / 4 + 1, s"cell $cid: $out outliers of $n")
    }
    assert(rows.exists(_._5 > 0), "no cell flagged any outlier — vacuous gate")
  }

  test("q_histogram2d: cells cover all events, grid bounded") {
    val rows = q("q_histogram2d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = graft.engine.Tables(spark, sf, "events").count()
    assert(rows.map(_._3).sum == total)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 6 && r._2 >= 0 && r._2 <= 9))
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q_funnel_time: counts agree with q_funnel stages, medians bounded") {
    val ft = q("q_funnel_time").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val fu = q("q_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ft("1_view_to_click")._1 == fu("2_click"))
    assert(ft("2_click_to_purchase")._1 == fu("3_purchase"))
    ft.foreach { case (tr, (n, med, mean)) =>
      assert(n > 0 && med > 0 && mean > 0, s"$tr: n=$n med=$med mean=$mean")
    }
  }
}
