package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantics of the round-7 statistical operators beyond the oracle
  * hash: scalar recomputes of the correlation / Welch-t / KS /
  * Mann–Whitney algebra from raw collected data, Benford share
  * closure, Gini/HHI bounds-and-recompute, the EWMA recursion replay,
  * CUSUM's zero-sum telescoping, streak recount for one user, and
  * winsorize clamp accounting. */
class Stats2Spec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_corr: matches a scalar recompute from raw fixed-point rows") {
    val rows = q("q_corr").collect()
    assert(rows.length == 3)
    val raw = graft.engine.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (rf, n, got) = (r.getString(0), r.getLong(1), r.getDouble(2))
      val g = raw.filter(_._1 == rf)
      assert(g.length == n)
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(t => t._2 * t._3).sum
      val sxx = g.map(t => t._2 * t._2).sum
      val syy = g.map(t => BigInt(t._3) * t._3).sum
      val num = BigDecimal(BigInt(n) * sxy - BigInt(sx) * sy)
      val dxx = BigDecimal(BigInt(n) * sxx - BigInt(sx) * sx)
      val dyy = BigDecimal(BigInt(n) * syy - BigInt(sy) * sy)
      val expect = num.toDouble / math.sqrt(dxx.toDouble) / math.sqrt(dyy.toDouble)
      assert(got == expect, s"$rf: $got != $expect")
      assert(got.abs <= 1.0)
    }
  }

  test("q_ttest_welch: matches a scalar Welch recompute") {
    val r = q("q_ttest_welch").collect().head
    val raw = graft.engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type") === "click",
        floor(col("value") * 10000).cast("long"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val a = raw.filter(_._1).map(_._2)
    val b = raw.filterNot(_._1).map(_._2)
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    def mv(g: Array[Long]): (Double, Double) = {
      val n = g.length.toLong
      val s = g.sum
      val qq = g.map(v => BigInt(v) * v).sum
      val m = s.toDouble / n.toDouble / 1e4
      val v = BigDecimal(BigInt(n) * qq - BigInt(s) * s).toDouble /
        n.toDouble / (n - 1).toDouble / 1e8
      (m, v)
    }
    val (m1, v1) = mv(a); val (m2, v2) = mv(b)
    val t = (m1 - m2) / math.sqrt(v1 / a.length + v2 / b.length)
    assert(r.getDouble(2) == m1 && r.getDouble(3) == m2)
    assert(r.getDouble(4) == t)
  }

  test("q_ks_2samp and q_mannwhitney: match brute-force recomputes on bins") {
    val raw = graft.engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type") === "click",
        floor(col("value") * 10).cast("long"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val a = raw.filter(_._1).map(_._2).sorted
    val b = raw.filterNot(_._1).map(_._2).sorted
    val (n1, n2) = (a.length.toLong, b.length.toLong)
    // KS: max over pooled support of |c1*n2 - c2*n1|
    val support = (a ++ b).distinct.sorted
    val dNum = support.map { v =>
      val c1 = a.count(_ <= v).toLong; val c2 = b.count(_ <= v).toLong
      (c1 * n2 - c2 * n1).abs
    }.max
    val ks = q("q_ks_2samp").collect().head
    assert(ks.getLong(0) == n1 && ks.getLong(1) == n2)
    assert(ks.getLong(2) == dNum)
    assert(ks.getDouble(3) == dNum.toDouble / n1.toDouble / n2.toDouble)
    // Mann–Whitney: doubled tie-average rank sum over sample 1
    val pooled = (a ++ b).sorted
    def rank2(v: Long): Long = {
      val lo = pooled.count(_ < v).toLong
      val cnt = pooled.count(_ == v).toLong
      2 * lo + cnt + 1 // first + last 1-based rank of the tie block
    }
    val r12 = a.map(rank2).sum
    val u = (r12 - n1 * (n1 + 1)).toDouble / 2.0
    val mw = q("q_mannwhitney").collect().head
    assert(mw.getLong(0) == n1 && mw.getLong(1) == n2)
    assert(mw.getDouble(2) == u)
    val z = ((r12 - n1 * (n1 + 1)).toDouble - (n1 * n2).toDouble) / 2.0 /
      math.sqrt(n1.toDouble * n2.toDouble * (n1 + n2 + 1).toDouble / 12.0)
    assert(mw.getDouble(3) == z)
  }

  test("q_benford: digits in 1..9, shares sum to 1, counts close") {
    val rows = q("q_benford").collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach(r => assert(r.getLong(0) >= 1 && r.getLong(0) <= 9))
    val total = rows.map(_.getLong(1)).sum
    val orders = graft.engine.Tables(spark, sf, "orders").count()
    assert(total == orders)
    // exact rational share closure: Σ cnt/total over doubles may not be
    // exactly 1, but each share must equal cnt/total bit-for-bit
    rows.foreach(r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble / total.toDouble))
  }

  test("q_gini and q_hhi: bounds and scalar recompute for one segment") {
    val gini = q("q_gini").collect()
    val hhi = q("q_hhi").collect()
    assert(gini.length == 5 && hhi.length == 5)
    gini.foreach(r => assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0))
    hhi.foreach { r =>
      val (n, h, eff) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(h >= 1.0 / n && h <= 1.0, s"HHI $h outside [1/n, 1]")
      assert(eff == 1.0 / h && eff <= n.toDouble)
    }
    // recompute Gini for the first segment from raw revenue
    val seg = gini.head.getString(0)
    val revs = graft.engine.Tables(spark, sf, "orders")
      .select(col("o_custkey"), floor(col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("rev"))
      .join(graft.engine.Tables(spark, sf, "customer")
        .filter(col("c_mktsegment") === seg)
        .select(col("c_custkey")), col("o_custkey") === col("c_custkey"))
      .select("rev").collect().map(_.getLong(0)).sorted
    val n = revs.length.toLong
    val s = revs.map(BigInt(_)).sum
    val t = revs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val expect = BigDecimal(t * 2 - (n + 1) * s).toDouble /
      BigDecimal(BigInt(n) * s).toDouble
    assert(gini.head.getLong(1) == n)
    assert(gini.head.getDouble(2) == expect)
  }

  test("q_ewma: replays the s_t = (x_t + s_{t-1})/2 recursion exactly") {
    val rows = q("q_ewma").collect()
    assert(rows.length >= 28)
    var sPrev = 0.0
    rows.zipWithIndex.foreach { case (r, i) =>
      val x = r.getLong(1).toDouble
      val sNow = if (i == 0) x else (x + sPrev) / 2.0
      assert(r.getDouble(2) == sNow, s"day $i: ${r.getDouble(2)} != $sNow")
      sPrev = sNow
    }
  }

  test("ewmaLinear: the O(n) crossover form is bit-equal to the " +
      "declared window fold, and to a 10^4-day JVM reference fold") {
    import spark.implicits._
    // (a) against the declared query on real data: feed the declared
    // result's own (d, x) back through the linear pass — every ewma
    // must be bit-identical (same IEEE ops in the same order)
    val declared = q("q_ewma").collect()
    val daily = declared.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("d", "x")
    val linear = Stats2.ewmaLinear(daily).orderBy("d").collect()
    assert(linear.length == declared.length)
    declared.zip(linear).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1))
      assert(a.getDouble(2) == b.getDouble(2),
        s"day ${a.getLong(0)}: window ${a.getDouble(2)} != " +
          s"linear ${b.getDouble(2)}")
    }
    // (b) past the documented crossover (n = 10^4 days, where the
    // window form's prefix arrays reach ~400 MB): the linear pass
    // runs it directly and matches the JVM scanLeft bit-for-bit at
    // the 100 TB daily-count magnitude
    val n = 10000
    val xs = (0 until n).map(i => 3070000000L + i * 997L)
    val big = xs.zipWithIndex.map { case (x, d) => (d.toLong, x) }
      .toDF("d", "x")
    val got = Stats2.ewmaLinear(big).orderBy("d").collect()
      .map(_.getDouble(2))
    val ref = xs.tail.scanLeft(xs.head.toDouble)((s, x) => (s + x) / 2.0)
    assert(got.length == n)
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      assert(g == r, s"day $i: linear $g != JVM fold $r")
    }
  }

  test("q_cusum: telescoping zero at the last day, exactly one peak set") {
    val rows = q("q_cusum").collect()
    // n*C_n = n*S - n*S = 0 by construction
    assert(rows.last.getDouble(2) == 0.0)
    assert(rows.exists(_.getBoolean(3)))
    val maxAbs = rows.map(r => math.abs(r.getDouble(2))).max
    rows.filter(_.getBoolean(3)).foreach(r =>
      assert(math.abs(r.getDouble(2)) == maxAbs))
  }

  test("q_streak: recount for the densest user") {
    val rows = q("q_streak").collect()
    assert(rows.nonEmpty)
    val top = rows.maxBy(_.getLong(2))
    val days = graft.engine.Tables(spark, sf, "events")
      .filter(col("user_id") === top.getLong(0))
      .select(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L"))
      .distinct().collect().map(_.getLong(0)).sorted
    assert(top.getLong(2) == days.length)
    val best = days.foldLeft((0L, 0L, Long.MinValue)) {
      case ((bestLen, curLen, prev), d) =>
        val c = if (d == prev + 1) curLen + 1 else 1L
        (math.max(bestLen, c), c, d)
    }._1
    assert(top.getLong(1) == best)
  }

  test("q_kendall and q_spearman: match brute-force recomputes on the daily series") {
    val daily = graft.engine.Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .groupBy(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L").as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("b"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val pairs = for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield (daily(i)._1 - daily(j)._1, daily(i)._2 - daily(j)._2)
    val c = pairs.count(p => p._1 * p._2 > 0).toLong
    val disc = pairs.count(p => p._1 * p._2 < 0).toLong
    val ta = pairs.count(p => p._1 == 0 && p._2 != 0).toLong
    val tb = pairs.count(p => p._2 == 0 && p._1 != 0).toLong
    val n0 = pairs.length.toLong
    val kd = q("q_kendall").collect().head
    assert(kd.getLong(0) == c && kd.getLong(1) == disc && kd.getLong(2) == n0)
    assert(kd.getDouble(3) == (c - disc).toDouble /
      math.sqrt((n0 - ta).toDouble) / math.sqrt((n0 - tb).toDouble))
    assert(kd.getDouble(3).abs <= 1.0)
    // spearman: doubled tie-averaged ranks, then Pearson
    def r2(xs: Seq[Long], v: Long): Long =
      2 * xs.count(_ < v).toLong + xs.count(_ == v).toLong + 1
    val as = daily.map(_._1); val bs = daily.map(_._2)
    val ranked = daily.map { case (a, b) => (r2(as, a), r2(bs, b)) }
    val n = ranked.length.toLong
    val sx = ranked.map(_._1).sum; val sy = ranked.map(_._2).sum
    val sxy = ranked.map(t => t._1 * t._2).sum
    val sxx = ranked.map(t => t._1 * t._1).sum
    val syy = ranked.map(t => t._2 * t._2).sum
    val rho = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble) /
      math.sqrt((n * syy - sy * sy).toDouble)
    val sp = q("q_spearman").collect().head
    assert(sp.getLong(0) == n)
    assert(sp.getDouble(1) == rho)
    assert(rho.abs <= 1.0)
  }

  test("q_join_cardest: estimate is within its declared envelope and exact is exact") {
    val r = q("q_join_cardest").collect().head
    val (est, exact, sampled) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getBoolean(3), s"estimator left its ±25% envelope: $est vs $exact")
    assert(sampled > 0 && est > 0)
    val li = graft.engine.Tables(spark, sf, "lineitem").count()
    assert(exact == li, "every lineitem row has a parent order in the fixtures")
  }

  test("q_rake: scores are degree/freq, stopwords never appear") {
    val rows = q("q_rake").collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val (w, deg, freq, score) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(w != "a" && w != "the")
      assert(deg >= freq, "a word's phrase-degree includes itself")
      assert(score == deg.toDouble / freq.toDouble)
    }
    // scores arrive ranked
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("q_winsorize: bounds bracket the clamp counts") {
    val rows = q("q_winsorize").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (nLo, nHi, sumW) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(lo < hi)
      // at most 5% strictly below p05 / above p95 by rank definition
      assert(nLo <= n * 5 / 100 && nHi <= n * 5 / 100)
      assert(sumW >= lo * n && sumW <= hi * n)
    }
  }
}
