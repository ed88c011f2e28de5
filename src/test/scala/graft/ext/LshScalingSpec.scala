package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Empirical scaling law for the embedding near-dup candidate
  * generator (the q_dedup_embed substrate): under the documented
  * operating rule — planes-per-table r grows with log2(corpus) so
  * per-bucket occupancy stays constant — candidate volume must grow
  * ~linearly with corpus size while planted near-dup pairs keep
  * colliding. The round-2 same-label blocking grew quadratically
  * (bounded block cardinality ⇒ block size ∝ corpus); this spec pins
  * the round-3 sign-bucket design against that regression: doubling
  * the corpus may at most ~triple candidates (quadratic growth would
  * 4× them).
  */
class LshScalingSpec extends SparkSuite {

  /** n 64-dim gaussian vectors, 10% of them small-noise mutants of
    * their predecessor (the near-dups, cosine ≈ 0.99); unrelated
    * vectors are near-orthogonal so they collide only at the uniform
    * 1/2^r background rate. */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(n) // deterministic per size
    var prev: Array[Double] = null
    val rows = (0 until n).map { i =>
      val v =
        if (i % 10 == 9 && prev != null)
          prev.map(x => x + rnd.nextGaussian() * 0.02)
        else Array.fill(64)(rnd.nextGaussian())
      prev = v
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "e")
  }

  test("LSH candidate volume grows linearly when r tracks log2(corpus)") {
    import spark.implicits._
    // r = log2(n) - 4: constant expected occupancy ~16 per bucket
    val runs = Seq(1000 -> 6, 2000 -> 7, 4000 -> 8).map { case (n, r) =>
      val cand = Similarity.lshCandidatePairsParam(corpus(n), 4, r).cache()
      val planted = (0 until n).collect {
        case i if i % 10 == 9 => (i - 1L, i.toLong)
      }
      val found = cand
        .join(planted.toSeq.toDF("id1", "id2"), Seq("id1", "id2"), "left_semi")
        .count()
      val total = cand.count()
      cand.unpersist()
      (n, total, found, planted.length)
    }
    runs.foreach { case (n, _, found, planted) =>
      assert(found >= planted * 8L / 10,
        s"n=$n: only $found/$planted planted near-dup pairs collide")
    }
    val Seq((_, c1, _, _), (_, c2, _, _), (_, c4, _, _)) = runs
    assert(c2.toDouble / c1 < 3.0,
      s"2x corpus grew candidates ${c2.toDouble / c1}x: $runs")
    assert(c4.toDouble / c2 < 3.0,
      s"2x corpus grew candidates ${c4.toDouble / c2}x: $runs")
  }
}
