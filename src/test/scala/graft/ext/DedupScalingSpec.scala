package graft.ext

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Empirical scaling law for the dedup candidate generator: with a
  * FIXED near-dup rate, candidate volume must grow ~linearly with
  * corpus size. The round-1 (lang, length-band) blocking grew
  * quadratically (bounded block cardinality ⇒ block size ∝ corpus);
  * this spec pins the round-2 band-bucket design against that
  * regression: doubling the corpus may at most ~triple candidates
  * (quadratic growth would 4× them).
  */
class DedupScalingSpec extends SparkSuite {

  /** n docs, 10% of them 2-token mutants of their predecessor (the
    * near-dups), the rest random 100-token docs over a 2000-word
    * vocab (band collisions between unrelated docs ≈ 0). */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(n) // deterministic per size
    val vocab = Array.tabulate(2000)(i => s"w$i")
    var prev: Array[String] = Array()
    val rows = (0 until n).map { i =>
      val doc =
        if (i % 10 == 9 && prev.nonEmpty) {
          val m = prev.clone()
          m(rnd.nextInt(m.length)) = vocab(rnd.nextInt(vocab.length))
          m(rnd.nextInt(m.length)) = vocab(rnd.nextInt(vocab.length))
          m
        } else Array.fill(100)(vocab(rnd.nextInt(vocab.length)))
      prev = doc
      (i.toLong, doc.mkString(" "))
    }
    rows.toDF("doc_id", "text")
  }

  test("band-candidate volume grows linearly with corpus size") {
    val counts = Seq(1000, 2000, 4000).map { n =>
      n -> Dedup.bandCandidates(Dedup.shingled(corpus(n))).count()
    }
    val Seq((_, c1), (_, c2), (_, c4)) = counts
    assert(c1 > 50, s"degenerate corpus: $counts") // near-dups found at all
    assert(c2.toDouble / c1 < 3.0, s"2x corpus grew candidates ${c2.toDouble / c1}x: $counts")
    assert(c4.toDouble / c2 < 3.0, s"2x corpus grew candidates ${c4.toDouble / c2}x: $counts")
  }
}
