package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Semantics of the round-6 profiling/validation/stats/IR/graph
  * operators beyond the oracle hash: independent scalar recomputes of
  * the chi-square and ACF algebra, profile-report invariants, the DQ
  * report's deliberate red check, BM25 term containment, and exact
  * Jaccard re-derivation for the reported pairs. */
class QualityStatsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q_profile: report invariants and an independent recount") {
    val rows = SparkEntry.queries("q_profile")(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (name, n, nNull, nDist) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val (mn, mx, mean) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(nDist <= n - nNull, s"$name distinct exceeds non-null rows")
      assert(mn <= mean && mean <= mx, s"$name mean outside [min, max]")
    }
    // independent recount for one column
    val li = graft.engine.Tables(spark, sf, "lineitem")
    val qty = rows.find(_.getString(0) == "l_quantity").get
    assert(qty.getLong(1) == li.count())
    assert(qty.getLong(3) ==
      li.select("l_quantity").distinct().count())
  }

  test("q_dq_checks: green contracts stay green, the strict check is red") {
    val rows = SparkEntry.queries("q_dq_checks")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 7)
    rows.foreach { case (name, (n, passed)) =>
      assert(passed == (n == 0L), s"$name verdict disagrees with its count")
    }
    // the fixtures satisfy the real contracts…
    Seq("fk_lineitem_orders", "fk_orders_customer", "pk_orders_unique",
      "nn_events_value", "domain_documents_lang", "range_lineitem_quantity")
      .foreach(c => assert(rows(c)._2, s"$c unexpectedly failing"))
    // …and the deliberately-too-strict discount bound reports real rows
    val strict = rows("range_lineitem_discount_strict")
    val direct = graft.engine.Tables(spark, sf, "lineitem")
      .filter(col("l_discount") > 0.08).count()
    assert(!strict._2 && strict._1 == direct && direct > 0)
  }

  test("q_chisq: totals partition and contributions match a scalar recompute") {
    val rows = SparkEntry.queries("q_chisq")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getBoolean(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
    val tot = rows.map(_._2._1).sum
    rows.foreach { case ((et, we), (o, rTot, cTot, part)) =>
      // row/col totals really partition the grand total
      assert(rTot == rows.filter(_._1._1 == et).map(_._2._1).sum)
      assert(cTot == rows.filter(_._1._2 == we).map(_._2._1).sum)
      val diff = (o * tot - rTot * cTot).toDouble
      assert(part == diff * diff / (rTot * cTot * tot).toDouble,
        s"cell ($et, $we) contribution drifts from the scalar tree")
      assert(part >= 0.0)
    }
  }

  test("q_acf: lags match a scalar recompute of the cleared algebra") {
    val got = SparkEntry.queries("q_acf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1L to 7L))
    val daily = graft.engine.Tables(spark, sf, "events")
      .groupBy(expr("(unix_micros(ts) - 1704067200000000L) div 86400000000L").as("d"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val xs = daily.map(_._2)
    val n = xs.length.toLong
    val s0 = xs.sum
    val sxx = xs.map(x => x * x).sum
    val byD = daily.toMap
    got.foreach { case (k, m, acf) =>
      val pairs = daily.flatMap { case (d, x) => byD.get(d + k).map(x -> _) }
      assert(m == pairs.length.toLong, s"lag $k pair count")
      val sxy = pairs.map { case (a, b) => a * b }.sum
      val head = pairs.map(_._1).sum
      val tail = pairs.map(_._2).sum
      val expected = (n * n * sxy - n * s0 * (head + tail) + m * s0 * s0).toDouble /
        (n * n * sxx - n * s0 * s0).toDouble
      assert(acf == expected, s"lag $k acf $acf vs scalar $expected")
      assert(acf >= -1.0 && acf <= 1.0)
    }
  }

  test("q_bm25: every hit contains a query term, scores are ranked") {
    val got = SparkEntry.queries("q_bm25")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= 10)
    val scores = got.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "result not ranked by bm25_fp desc")
    val texts = graft.engine.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, nTerms, fp) =>
      // recount with the QUERY's tokenizer ([a-z]+ runs), not word-
      // boundary regexes: they disagree when a term abuts a digit or
      // an uppercase letter ("3filter" tokenizes to "filter" but has
      // no \b match), which would spuriously fail on fixture drift
      val toks = "[a-z]+".r.findAllIn(texts(id)).toSet
      val hits = Seq("vector", "filter", "merge").count(toks.contains)
      assert(hits == nTerms, s"doc $id n_terms $nTerms but text has $hits")
      assert(fp > 0L)
    }
  }

  test("q_standardize: per-group z-scores have zero mean and unit variance") {
    val rows = SparkEntry.queries("q_standardize")(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (et, zs) =>
      val n = zs.length
      val mean = zs.map(_._2).sum / n
      val varr = zs.map(z => z._2 * z._2).sum / n
      assert(math.abs(mean) < 1e-9, s"$et z mean $mean")
      assert(math.abs(varr - 1.0) < 1e-6, s"$et z variance $varr")
    }
  }

  test("q_seasonal: weekday residuals cancel and observed = seasonal + residual") {
    val rows = SparkEntry.queries("q_seasonal")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length == 30)
    rows.foreach { case (_, _, cnt, dm, res) =>
      assert(math.abs(cnt - dm - res) < 1e-9)
    }
    rows.groupBy(_._2).foreach { case (dow, rs) =>
      assert(math.abs(rs.map(_._5).sum) < 1e-6,
        s"dow $dow residuals do not cancel")
    }
  }

  test("q_feature_hash: per-user counts total 2 features per event, slots in range") {
    val rows = SparkEntry.queries("q_feature_hash")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, idx, _) => idx >= 0 && idx < 64 })
    val perUser = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val events = graft.engine.Tables(spark, sf, "events")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUser.keySet == events.keySet)
    perUser.foreach { case (u, c) =>
      assert(c == 2 * events(u), s"user $u feature count $c vs events ${events(u)}")
    }
  }

  test("q_target_encode: encodings shrink user means toward the global mean") {
    val enc = SparkEntry.queries("q_target_encode")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val raw = graft.engine.Tables(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        (sum(col("value")) / count(lit(1))).as("mean"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val globalMean = graft.engine.Tables(spark, sf, "events")
      .agg(sum(col("value")) / count(lit(1))).head().getDouble(0)
    assert(enc.keySet == raw.keySet)
    enc.foreach { case (u, (n, e)) =>
      val (rn, rm) = raw(u)
      assert(n == rn)
      // smoothing places the encoding strictly between the user's own
      // mean and the global mean (fixed-point floor gives ≤1e-4 slack)
      val (lo, hi) = (math.min(rm, globalMean) - 1e-4,
        math.max(rm, globalMean) + 1e-4)
      assert(e >= lo && e <= hi, s"user $u enc $e outside [$lo, $hi]")
    }
  }

  test("q_shard_shuffle: positions are contiguous ranks in hash order per shard") {
    val rows = SparkEntry.queries("q_shard_shuffle")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 500)
    rows.foreach { case (_, h, shard, _) => assert(shard == h % 16) }
    rows.groupBy(_._3).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._1))
      assert(sorted.map(_._4).toSeq == (1L to rs.length).toSeq,
        s"shard $shard positions not a contiguous hash-ordered rank")
    }
  }

  test("q_novelty: the first doc is fully novel, novel counts partition the vocabulary") {
    val rows = SparkEntry.queries("q_novelty")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 500)
    // the smallest doc_id owns every one of its shingles
    val first = rows.minBy(_._1)
    assert(first._2 > 0 && first._2 == first._3 && first._4 == 1000000L)
    rows.foreach { case (id, n, novel, fp) =>
      assert(novel <= n, s"doc $id novel $novel > shingles $n")
      assert(fp == (if (n > 0) novel * 1000000L / n else 0L))
    }
    // every distinct corpus shingle is novel in EXACTLY one doc
    val distinctShingles = graft.engine.Tables(spark, sf, "documents")
      .selectExpr("explode(transform(sequence(1, size(split(text, ' ')) - 2), " +
        "i -> concat_ws(' ', element_at(split(text, ' '), i), " +
        "element_at(split(text, ' '), i + 1), " +
        "element_at(split(text, ' '), i + 2)))) AS sh")
      .distinct().count()
    assert(rows.map(_._3).sum == distinctShingles)
  }

  test("q_node_jaccard: reported pairs carry their exact set Jaccard") {
    val got = SparkEntry.queries("q_node_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val cs = graft.engine.Tables(spark, sf, "orders")
      .join(graft.engine.Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = cs.groupBy(_._2).map { case (sp, xs) => sp -> xs.map(_._1).toSet }
    got.foreach { case (u, v, inter, uni, jac) =>
      val (a, b) = (nbrs(u), nbrs(v))
      assert(u < v, s"pair ($u, $v) not oriented")
      assert(inter == (a & b).size.toLong, s"pair ($u,$v) intersection")
      assert(uni == (a | b).size.toLong, s"pair ($u,$v) union")
      assert(jac == inter * 1000000L / uni)
    }
  }

  test("q_ldiversity: risky cells recounted from the raw table") {
    val got = graft.SparkEntry.queries("q_ldiversity")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = graft.engine.Tables(spark, sf, "documents")
      .selectExpr("source", "n_chars div 200 AS b", "lang")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getString(2)))
    val expect = docs.groupBy(_._1).collect {
      case (cell, xs) if xs.map(_._2).distinct.length < 3 =>
        val langs = xs.map(_._2)
        cell -> (langs.length.toLong, langs.distinct.length.toLong,
          langs.groupBy(identity).values.map(_.length).max.toLong *
            1000000L / langs.length)
    }.toMap
    assert(got == expect)
    assert(got.nonEmpty, "no risky cell at sf0.001 — vacuous audit")
    got.values.foreach { case (n, dl, share) =>
      assert(dl < 3 && share >= 1000000L / dl && share <= 1000000L)
      assert(n >= dl)
    }
  }
}
