package graft.functions

/** Deterministic fixed-vocab subword tokenizer — the engine's honest
  * token accounting (mix weights, packing budgets, per-doc counts).
  *
  * Whitespace-split counting systematically under-counts exactly the
  * languages quota-balancing exists to protect: a Chinese sentence is
  * one "word" but dozens of model tokens. This tokenizer is greedy
  * longest-match over an inlined subword vocabulary with two
  * fallbacks — CJK ideographs/kana/hangul count ONE token per
  * character (the dominant behavior of real BPE vocabularies on CJK),
  * and any other non-space character counts one token (digits split
  * individually, as modern tokenizers do).
  *
  * Greedy longest-match compiles to a REGEX ALTERNATION sorted
  * longest-first: both Java regex (Spark `regexp_count`) and RE2
  * (DuckDB `regexp_extract_all`) scan left to right taking the first
  * alternative that matches, so with longest entries first each
  * position consumes exactly the longest matching vocab entry — the
  * same sequential scan a vocab-table tokenizer runs, but expressed as
  * ONE codegen'd expression per engine and therefore fully
  * ORACLE-CHECKABLE (no spec-pinned golden fallback needed).
  * Verified-identical semantics: alternation order is honored by both
  * engines (leftmost-first), and entries are plain lowercase literals
  * so no metacharacter divergence exists. Caveat (documented, not hit
  * by the fixtures): astral-plane chars count 2 under Java's UTF-16
  * `[^\s]` but 1 under RE2's code-point scan.
  */
object VocabTok {

  /** The inlined vocabulary: frequent English function words + BPE-ish
    * subword units (suffixes, prefixes, common digraphs). Uppercase
    * falls through to the single-char fallback (a cased vocab doubles
    * the table for no accounting value on this corpus). */
  val vocab: Seq[String] = Seq(
    // frequent whole words
    "the", "and", "that", "with", "for", "was", "are", "this", "have",
    "from", "not", "but", "you", "all", "were", "which", "when", "there",
    "been", "their", "has", "will", "would", "what", "about", "out",
    "one", "can", "had", "his", "her", "they", "its", "into", "over",
    "time", "than", "then", "them", "some", "more", "very", "just",
    "like", "only", "also", "after", "first", "year", "people", "could",
    "other", "these", "two", "may", "day", "most",
    // subword units
    "ing", "ion", "tion", "ed", "er", "est", "ly", "ment", "ness",
    "able", "ful", "ant", "ent", "ive", "ous", "al", "ic", "ate", "ity",
    "re", "un", "dis", "pre", "per", "pro", "con", "com", "sub",
    "inter", "trans", "under", "th", "he", "in", "an", "on", "at", "en",
    "es", "or", "te", "of", "it", "is", "to", "ar", "st", "nd", "se",
    "le", "ve", "me", "de", "co", "ra", "ro", "ri", "ne", "ta", "la",
    "li", "ha", "ma", "ca", "ce", "ho", "no", "so", "wa", "we", "sh",
    "ch", "ck", "qu", "wh", "ph", "gh", "ght", "ould", "ough",
  ).distinct

  /** Longest-first (ties lexicographic) — the ordering that makes
    * leftmost-first alternation equal greedy longest-match. */
  private val ordered: Seq[String] = vocab.sortBy(w => (-w.length, w))

  private val alternation = ordered.mkString("|")

  /** Whitespace for the fallback class, ENUMERATED identically in both
    * dialects instead of each engine's `\s` (round-12 review): Java's
    * `\s` and RE2's `\s` disagree on U+000B (vertical tab — Java yes,
    * RE2 no), and NEITHER counts Unicode spaces as whitespace, so an
    * ideographic space (U+3000 — the standard space of CJK typography)
    * or an nbsp would each add one "token", inflating exactly the CJK
    * budgets this tokenizer exists to make honest. The list is the
    * Unicode White_Space set. */
  private val wsJava =
    " \\t\\n\\x0B\\f\\r\\x85\\u00A0\\u1680\\u2000-\\u200A" +
      "\\u2028\\u2029\\u202F\\u205F\\u3000"
  private val wsRe2 =
    " \\t\\n\\x{0B}\\f\\r\\x{85}\\x{A0}\\x{1680}\\x{2000}-\\x{200A}" +
      "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"

  /** Java-regex pattern (Spark `regexp_count`). Pass it via
    * `lit(...)`, NOT inside a SQL string literal — Spark's SQL parser
    * would eat the backslashes. (The \\uXXXX escapes reach Java regex
    * as escape sequences, interpreted by the regex compiler.) */
  val sparkPattern: String =
    s"(?:$alternation|[一-鿿぀-ヿ가-힯]|[^$wsJava])"

  /** RE2 twin (DuckDB `regexp_extract_all`): identical alternation,
    * RE2's \x{...} syntax for the CJK and whitespace classes. */
  val duckPattern: String =
    s"(?:$alternation|[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}" +
      s"\\x{ac00}-\\x{d7af}]|[^$wsRe2])"

  /** DuckDB SQL: BIGINT token count of a string expression. */
  def duck(strExpr: String): String =
    s"CAST(len(regexp_extract_all($strExpr, '$duckPattern')) AS BIGINT)"

  // compiled once: the ~140-alternative Pattern is expensive to build
  // and constant (the spec twin calls this per document)
  private lazy val compiledSparkPattern =
    java.util.regex.Pattern.compile(sparkPattern)

  /** Scala-side reference count (spec golden-check twin). */
  def countReference(text: String): Long = {
    val m = compiledSparkPattern.matcher(text)
    var n = 0L
    while (m.find()) n += 1
    n
  }
}
