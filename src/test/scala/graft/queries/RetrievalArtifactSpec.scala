package graft.queries

import graft.{SparkEntry, SparkSuite}

/** The round-8 structural claim for the set-similarity family: the
  * tokenized corpus (tok_sets) and the τ-prefix (tau_prefix) are
  * build-once scratch artifacts SHARED by q_setsim_join and
  * q_containment_join — the regexp tokenize pass and the
  * df-rank-window prefix pass each run at most once per (JVM, dir),
  * never once per query reference (pre-refactor each query re-ran
  * them ~6×). Proof: after both queries have executed once, running
  * both again causes ZERO new scratch builds. */
class RetrievalArtifactSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("tokenize and prefix artifacts build once and are shared by both queries") {
    def runBoth(): Unit =
      Seq("q_setsim_join", "q_containment_join")
        .foreach(q => SparkEntry.queries(q)(spark, sf).collect())
    runBoth() // first pass may build tok_sets + tau_prefix
    val after = graft.engine.Scratch.buildCount
    runBoth() // warm pass: every artifact must come from the memo
    assert(graft.engine.Scratch.buildCount == after,
      "a warm re-run rebuilt a scratch artifact — memoization broken")
  }

  test("both queries read ONLY artifact parquet — never documents (round-9)") {
    // the verify stage used to re-derive token sets from documents;
    // with tokSets riding Scratch.cachedFrame, candidate generation
    // AND verification read the materialized artifacts end-to-end —
    // the corpus parquet appears in no file scan of either query plan
    // (the tokenize pass over documents runs only inside the one-time
    // artifact BUILD job, which is not part of these plans)
    Seq("q_setsim_join", "q_containment_join").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect() // ensure artifacts exist; plan below is the warm shape
      val scans = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("FileScan")).mkString("\n")
      assert(scans.nonEmpty, s"$q: expected file scans")
      assert(!scans.contains("documents.parquet"),
        s"$q verify stage re-scans the corpus instead of the artifact:\n$scans")
    }
  }

  test("q_setsim_join candidates are banded on (token, size octave), two-sided") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val joins = SparkEntry.queries("q_setsim_join")(spark, sf)
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    val cand = joins.filter(_.condition.isDefined)
      .map(j => conjuncts(j.condition.get))
      .maxBy(_.collect { case e: EqualTo => e }.size)
    val eqs = cand.collect { case e: EqualTo => e }
    assert(eqs.size >= 2, s"need (tk, octave) keys: ${cand.mkString(" && ")}")
    assert(eqs.exists(_.references.exists(_.name.startsWith("lb"))),
      s"one equi key must be the size octave: ${eqs.mkString(" && ")}")
    // both exact size residuals survive alongside the octave key
    assert(cand.count(c => !c.isInstanceOf[EqualTo]) >= 2,
      s"two-sided size bound must remain residual: ${cand.mkString(" && ")}")
  }

  test("two-sided octave window is conservative for Jaccard tau = 9/10") {
    // every nb satisfying tau*na <= nb <= na/tau has bit length inside
    // [bitlen(ceil(9na/10)), bitlen(floor(10na/9))], and every nb with
    // bit length outside the window violates one of the exact bounds
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    (1L to 1500L).foreach { na =>
      val lo = bitlen((9 * na + 9) / 10)
      val hi = bitlen(na * 10 / 9)
      (1L to 2000L).foreach { nb =>
        val eligible = nb * 10 >= na * 9 && nb * 9 <= na * 10
        if (eligible)
          assert(bitlen(nb) >= lo && bitlen(nb) <= hi,
            s"eligible nb=$nb outside octave window for na=$na")
        if (bitlen(nb) < lo || bitlen(nb) > hi)
          assert(!eligible, s"window admitted ineligible nb=$nb na=$na")
      }
    }
  }
}
