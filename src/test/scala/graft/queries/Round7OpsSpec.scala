package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** Invariants + scalar re-derivations for the round-7 session batch:
  * HITS, item-item CF, weighted SSSP, prefix-filtered set-similarity
  * join, MRR, and the CDC changelog operators. Hand-built inputs run
  * through the SAME distributed code the declared queries call; the
  * expected values are computed by independent scalar logic. */
class Round7OpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ── HITS ──

  test("hitsScores matches the scalar two-iteration computation exactly") {
    // bipartite: c1→{s1,s2}, c2→{s2}, c3→{s2,s3}
    val cs = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s2"), ("c3", "s2"), ("c3", "s3"))
    val got = Graph2.hitsScores(cs.toDF("c", "sp"))
      .as[(String, Long, Long)].collect()
      .map { case (k, a, b) => k -> (a, b) }.toMap
    // a1 = indeg: s1=1 s2=3 s3=1
    // h1: c1 = a1(s1)+a1(s2) = 4; c2 = 3; c3 = a1(s2)+a1(s3) = 4
    // a2: s1 = h1(c1) = 4; s2 = 4+3+4 = 11; s3 = h1(c3) = 4
    assert(got == Map("s1" -> (1L, 4L), "s2" -> (3L, 11L), "s3" -> (1L, 4L)))
  }

  test("q_hits: authority-1 equals in-degree and the cut is a2-descending") {
    val rows = SparkEntry.queries("q_hits")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val a2s = rows.map(_._3)
    assert(a2s.zip(a2s.tail).forall { case (x, y) => x >= y },
      "q_hits rows must be a2-descending")
    // iteration-1 authority IS in-degree of the incidence
    val indeg = Graph.custSupp(spark, sf)
      .groupBy("sp").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (sp, a1, _) => assert(indeg(sp) == a1) }
  }

  // ── item-item CF ──

  test("q_itemcf: cosine² ≤ 1, w ≥ threshold, and w ≤ min(nu, nv)") {
    val rows = SparkEntry.queries("q_itemcf")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, w, nu, nv, cos2) =>
      assert(u < v)
      assert(w >= 2 && w <= math.min(nu, nv), s"($u,$v): w=$w nu=$nu nv=$nv")
      assert(cos2 >= 0 && cos2 <= 1000000L, s"($u,$v): cos2_fp=$cos2")
      // the reduced-factor form (overflow-safe: each factor <= 1000)
      assert(cos2 == (w * 1000L / nu) * (w * 1000L / nv))
    }
  }

  // ── weighted SSSP ──

  test("ssspLoop matches scalar Bellman-Ford on a weighted path") {
    // a -5- b -1- c -1- d, plus direct a -10- c; 3 rounds from {a}
    val es = Seq(("a", "b", 5L), ("b", "c", 1L), ("c", "d", 1L), ("a", "c", 10L))
    val sym = es ++ es.map { case (s0, d0, c0) => (d0, s0, c0) }
    val got = Graph2.ssspLoop(sym.toDF("s", "d", "cost"),
        Seq("a").toDF("node"), 3)
      .as[(String, Long)].collect().toMap
    // ≤3 edges: a=0, b=5, c=min(6, 10)=6, d=min(7, 11)=7
    assert(got == Map("a" -> 0L, "b" -> 5L, "c" -> 6L, "d" -> 7L))
  }

  test("ssspLoop: unreached nodes are absent, not infinite") {
    val es = Seq(("a", "b", 1L), ("x", "y", 1L))
    val sym = es ++ es.map { case (s0, d0, c0) => (d0, s0, c0) }
    val got = Graph2.ssspLoop(sym.toDF("s", "d", "cost"),
        Seq("a").toDF("node"), 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 0L, "b" -> 1L))
  }

  test("q_sssp: seeds at distance 0, all distances nonnegative") {
    val got = SparkEntry.queries("q_sssp")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty)
    got.filter(_._1 <= 20).values.foreach(d => assert(d == 0L))
    got.values.foreach(d => assert(d >= 0L))
  }

  // ── prefix-filtered set-similarity join ──

  test("setSimJoin finds exactly the pairs ≥ τ (vs scalar all-pairs)") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),     // J(1,2) = 3/5 = 0.6
      3L -> Seq("a", "b", "c", "d"),     // J(1,3) = 1.0, J(2,3) = 0.6
      4L -> Seq("x", "y", "z"),          // J(4, ·) = 0 vs 1..3
      5L -> Seq("x", "y", "z", "a"))     // J(4,5) = 3/5 = 0.6
    val tok = docs.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("doc_id", "tk")
    // τ = 1/2: every pair with J ≥ 0.5
    val got = Retrieval.setSimJoin(Retrieval.toSets(tok), 1, 2)
      .select("da", "db", "jac_fp").as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      inter = ta.toSet.intersect(tb.toSet).size
      uni = ta.toSet.union(tb.toSet).size
      if inter * 2 >= uni
    } yield (ia, ib) -> inter * 1000000L / uni).toMap
    assert(got == expected)
    assert(got((1L, 3L)) == 1000000L)
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)))
  }

  test("setSimProbe equals the all-pairs answer restricted to probe docs") {
    val docs = Seq(
      1L -> Seq("a", "b", "c", "d"),
      2L -> Seq("a", "b", "c", "e"),
      3L -> Seq("a", "b", "c", "d"),
      4L -> Seq("x", "y", "z"),
      5L -> Seq("x", "y", "z", "a"),
      6L -> Seq("a", "b", "c", "d", "e"))
    val tok = docs.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("doc_id", "tk")
    val got = Retrieval.setSimProbe(Retrieval.toSets(tok), col("doc_id") % 2 === 0, 1, 2)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val expected = (for {
      (ia, ta) <- docs if ia % 2 == 0
      (ib, tb) <- docs if ib != ia
      inter = ta.toSet.intersect(tb.toSet).size
      uni = ta.toSet.union(tb.toSet).size
      if inter * 2 >= uni
    } yield (ia, ib)).toSet
    assert(got == expected)
    // direction check: probe side is always da, corpus side db — a
    // probe→probe match appears in both orientations
    assert(got.contains((2L, 1L)) && !got.contains((1L, 2L)))
    assert(got.contains((2L, 6L)) && got.contains((6L, 2L)))
  }

  test("setSimJoin τ=0.9 prunes but still catches exact duplicates") {
    val docs = Seq(
      1L -> (1 to 20).map(i => s"t$i"),
      2L -> (1 to 20).map(i => s"t$i"),           // J = 1.0
      3L -> ((1 to 18).map(i => s"t$i") :+ "q1" :+ "q2")) // J(1,3) = 18/22 < 0.9
    val tok = docs.flatMap { case (id, ts) => ts.map(id -> _) }.toDF("doc_id", "tk")
    val got = Retrieval.setSimJoin(Retrieval.toSets(tok), 9, 10)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  // ── CDC changelog fold ──

  private def ts(day: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("cdcApply: tombstone clears history; user fully deleted vanishes") {
    val ev = Seq(
      // u1: insert, update, delete, re-insert, update → live = last 2
      (1L, ts(1, 1), 1L, "view", 1.0),
      (1L, ts(1, 2), 2L, "click", 2.0),
      (1L, ts(1, 3), 3L, "error", 0.0),
      (1L, ts(2, 1), 4L, "signup", 3.0),
      (1L, ts(2, 2), 5L, "purchase", 4.0),
      // u2: history ends in a delete → absent from state
      (2L, ts(1, 1), 6L, "view", 1.0),
      (2L, ts(1, 2), 7L, "error", 0.0),
      // u3: never deleted → all live
      (3L, ts(1, 1), 8L, "view", 9.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Changelog.cdcApply(ev)
      .select("user_id", "n_live", "last_type", "last_value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(got == Set(
      (1L, 2L, "purchase", 4.0),
      (3L, 1L, "view", 9.0)))
  }

  test("cdcApply: same-timestamp delete orders by event_id") {
    val ev = Seq(
      (1L, ts(1, 1), 10L, "view", 1.0),
      (1L, ts(1, 1), 11L, "error", 0.0),  // same ts, later id → shadows 10
      (1L, ts(1, 1), 12L, "click", 2.0))  // same ts, after the delete → live
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Changelog.cdcApply(ev)
      .select("user_id", "n_live", "last_type")
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 1L, "click")))
  }

  test("q_ivm_join: folded deltas equal recompute, and ΔA⋈ΔB is load-bearing") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q_ivm_join")(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    // from-scratch recompute (the oracle's shape, run through Spark)
    val orders = graft.engine.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("od"))
    val cust = graft.engine.Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    def agg(o: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) = o
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("p_sum"))
    val full = agg(orders, cust).orderBy("c_nationkey")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == full, "folded view must equal the from-scratch recompute")
    // the classic IVM bug — dropping the cross term — must be VISIBLE:
    // both delta slices are nonempty and jointly contribute rows
    val cutoff = lit("1997-01-01").cast("date")
    val crossRows = agg(orders.filter(col("od") >= cutoff),
      cust.filter(col("c_custkey") % 10 === 3))
      .agg(sum("n_orders")).as[Long].head()
    assert(crossRows > 0,
      "ΔA⋈ΔB is empty — the bilinear-rule evidence would be vacuous")
  }

  test("q_cdc_netchange: day counts reconcile with the raw log") {
    val df = SparkEntry.queries("q_cdc_netchange")(spark, sf)
    val (ins, upd, del) = df.agg(sum("n_ins"), sum("n_upd"), sum("n_del"))
      .as[(Long, Long, Long)].head()
    val ev = graft.engine.Tables(spark, sf, "events")
    val total = ev.count()
    val errors = ev.filter(col("event_type") === "error").count()
    val users = ev.select("user_id").distinct().count()
    assert(ins + upd + del == total, "every log row classifies exactly once")
    assert(del == errors, "D ⇔ tombstone rows")
    // every user contributes ≥1 insert unless their FIRST event is a
    // tombstone; re-inserts after deletes can only add more
    assert(ins >= users - del)
  }

  test("q_cdc_apply agrees with a scalar fold of the sf0.001 log") {
    val got = SparkEntry.queries("q_cdc_apply")(spark, sf)
      .select("user_id", "n_live", "last_type")
      .as[(Long, Long, String)].collect().toSet
    val log = graft.engine.Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, Timestamp, Long, String)].collect()
    val expected = log.groupBy(_._1).flatMap { case (uid, evs) =>
      // (getTime millis, getNanos fractional) orders full micro precision
      val ordered = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      val lastDel = ordered.lastIndexWhere(_._4 == "error")
      val live = ordered.drop(lastDel + 1)
      if (live.isEmpty) None
      else Some((uid, live.size.toLong, live.last._4))
    }.toSet
    assert(got == expected)
  }

  // ── asymmetric containment join ──

  test("q_containment_join: formula recount, and it catches Jaccard's blind spot") {
    val rows = SparkEntry.queries("q_containment_join")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val toks = graft.engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) => id -> "[a-z]+".r.findAllIn(t).toSet }.toMap
    var blindSpot = 0
    rows.foreach { case (da, db, inter, na, fp) =>
      assert(da % 50 == 0 && da != db)
      val (a, b) = (toks(da), toks(db))
      assert(inter == (a & b).size.toLong && na == a.size.toLong)
      assert(inter * 10 >= na * 9 && fp == inter * 1000000L / na)
      val uni = a.size + b.size - inter
      if (inter * 10 < uni * 9) blindSpot += 1
    }
    assert(blindSpot > 0,
      "no emitted pair fails the Jaccard gate — containment adds nothing here")
  }

  test("q_containment_join: posting index is length-partitioned and the partition is lossless") {
    // plan contract: the candidate join hashes on (token, size octave)
    // — postings of corpus docs too short to ever reach the bound are
    // never compared — with the exact size bound as a residual
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = SparkEntry.queries("q_containment_join")(spark, sf)
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    val cand = joins.filter(_.condition.isDefined)
      .map(j => conjuncts(j.condition.get))
      .filter(_.exists(c => !c.isInstanceOf[EqualTo]))
      .maxBy(_.collect { case e: EqualTo => e }.size)
    val eqs = cand.collect { case e: EqualTo => e }
    assert(eqs.size >= 2, s"need (tk, octave) equi keys: ${cand.mkString(" && ")}")
    assert(eqs.exists(_.references.exists(_.name.startsWith("lb"))),
      s"one equi key must be the size octave: ${eqs.mkString(" && ")}")

    // arithmetic contract: the octave window is conservative — every
    // nb that can satisfy 10·nb ≥ 9·na has bit-length ≥ the probed
    // minimum, and every nb below that bit-length is correctly
    // ineligible (the boundary octave's false admits die to the
    // residual, never the reverse)
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (1L to 1000L).foreach { na =>
      val req = (9 * na + 9) / 10
      val minOct = bitlen(req)
      (1L to 1200L).foreach { nb =>
        if (nb * 10 >= na * 9)
          assert(bitlen(nb) >= minOct, s"eligible nb=$nb pruned for na=$na")
        if (bitlen(nb) < minOct)
          assert(nb * 10 < na * 9, s"octave admitted ineligible nb=$nb na=$na")
      }
    }
  }
}
