package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** The chunker's contract is coverage + overlap arithmetic; the
  * bigram counter's scale claim is the PLAN (partial combine below
  * the one keyed shuffle, top-k as TakeOrderedAndProject — never a
  * full sort of the bigram vocabulary). */
class ChunkingSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("q_chunk_stride: stride arithmetic covers every token, chunks overlap by 8") {
    val rows = SparkEntry.queries("q_chunk_stride")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // indexes are contiguous from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx == i && start == i * 24L, s"chunk $i: idx=$idx start=$start")
        assert(len >= 1 && len <= 32, s"chunk length $len out of [1, 32]")
      }
      // every non-terminal chunk reaches PAST the next chunk's start
      // (len > stride), so consecutive chunks overlap and no token
      // between them is covered by neither — a full-width non-terminal
      // chunk overlaps by exactly 32 - 24 = 8; a doc ending inside the
      // next window still leaves at least 1 overlapping token
      sorted.dropRight(1).foreach { case (_, _, _, len) =>
        assert(len > 24L, s"non-terminal chunk has length $len <= stride")
      }
      // the last chunk reaches the end of the doc: start + len == n
      val (_, _, lastStart, lastLen) = sorted.last
      val first = sorted.head
      assert(lastStart + lastLen >= first._3 + first._4,
        "tail chunk must reach past the first chunk")
    }
  }

  test("q_chunk_stride: tail coverage equals the doc token count") {
    import spark.implicits._
    val docs = graft.engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val tails = SparkEntry.queries("q_chunk_stride")(spark, sf)
      .groupBy("doc_id").agg(max(col("start_tok") + col("chunk_tokens")).as("covered"))
    val bad = docs.join(tails, "doc_id")
      .filter(col("covered") =!= col("n")).count()
    assert(bad == 0, s"$bad docs whose chunks do not cover exactly n tokens")
  }

  test("q_vocab_bigrams: ranked counts agree with a direct recount") {
    import spark.implicits._
    val got = SparkEntry.queries("q_vocab_bigrams")(spark, sf).as[(String, Long)].collect()
    assert(got.length == 20)
    // monotone non-increasing counts with the pair-asc tiebreak
    got.sliding(2).foreach { case Array((p1, c1), (p2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && p1 < p2), s"order violated: $p1/$c1 vs $p2/$c2")
    }
    // recount one pair directly from the text
    val (pair, cnt) = got.head
    val Array(a, b) = pair.split(" ", 2)
    val direct = graft.engine.Tables(spark, sf, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(expr(
        s"""size(filter(sequence(1, size(toks) - 1),
           |  i -> element_at(toks, i) = '$a' AND element_at(toks, i + 1) = '$b'))"""
          .stripMargin).cast("long").as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    assert(direct == cnt, s"top pair '$pair': direct recount $direct != $cnt")
  }

  test("q_vocab_bigrams plans partial combine and TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q_vocab_bigrams")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must not be a global sort:\n" + plan.take(1200))
    val partials = "partial_count".r.findAllIn(plan).size
    assert(partials >= 1, "keyed count must map-side combine:\n" + plan.take(1200))
  }
}
