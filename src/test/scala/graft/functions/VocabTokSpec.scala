package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the fixed-vocab tokenizer's semantics: greedy longest-match
  * with CJK-per-character fallback, hand-derived golden counts (so a
  * vocab edit that shifts semantics fails HERE, not as an opaque
  * oracle hash mismatch), and Spark-expression ↔ Scala-reference
  * parity. Cross-engine (DuckDB) parity is covered by the oracle gate
  * on q_tok_vocab / q_mix_weights_tok. */
class VocabTokSpec extends SparkSuite {

  test("golden counts: greedy longest-match, hand-derived") {
    // "the"=1; "cat"= ca+t =2; "sat"= s+at =2
    assert(VocabTok.countReference("the cat sat") == 5L)
    // in+for+ma+tion — 'tion' only wins at its position because the
    // alternation is longest-first
    assert(VocabTok.countReference("information") == 4L)
    // he+l+l+o then digits split individually
    assert(VocabTok.countReference("hello123") == 7L)
    assert(VocabTok.countReference("") == 0L)
    assert(VocabTok.countReference("   ") == 0L)
  }

  test("CJK counts one token per character; whitespace split does not") {
    val zh = "人工智能就是未来"
    assert(VocabTok.countReference(zh) == 8L, "8 ideographs = 8 tokens")
    assert(zh.split(" ").length == 1L, "whitespace counting sees ONE word")
    // kana + hangul ranges are covered too
    assert(VocabTok.countReference("カタカナ") == 4L)
    assert(VocabTok.countReference("한국어") == 3L)
    // mixed-script: 2 CJK + w+or+l+d + 2 CJK
    assert(VocabTok.countReference("你好 world 世界") == 8L)
  }

  test("whitespace is the enumerated Unicode set, identical in both dialects") {
    // round-12 review: Java's \s and RE2's \s disagree on U+000B, and
    // neither excludes Unicode spaces — an ideographic space (U+3000)
    // counted as a "token" inflated the CJK budgets. Probe: 7 letters
    // separated by vertical tab, ideographic space, ASCII space, and
    // NEL — 7 tokens, none for the separators. The DuckDB twin was
    // verified live at the same count (7; the old \s class gave 12).
    val probe = "a\u000Bb\u3000c d e f\u0085g"
    assert(VocabTok.countReference(probe) == 7L,
      s"got ${VocabTok.countReference(probe)}")
    assert(VocabTok.countReference("x\u00A0y\u2003z") == 3L,
      "nbsp and em-space are whitespace, not tokens")
  }

  test("vocab ordering invariants") {
    // duplicates would silently shift counts if an entry is edited
    assert(VocabTok.vocab.distinct.size == VocabTok.vocab.size)
    // entries are lowercase-letter literals — no regex metacharacters
    assert(VocabTok.vocab.forall(_.matches("[a-z]+")))
  }

  test("Spark regexp_count matches the Scala reference on corpus text") {
    import spark.implicits._
    val docs = graft.engine.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.nonEmpty)
    val viaSpark = graft.engine.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        regexp_count(col("text"), lit(VocabTok.sparkPattern)).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    docs.foreach { case (id, text) =>
      assert(viaSpark(id) == VocabTok.countReference(text),
        s"doc $id: spark ${viaSpark(id)} vs reference ${VocabTok.countReference(text)}")
    }
  }
}
