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

  /** Java-regex pattern (Spark `regexp_count`). Pass it via
    * `lit(...)`, NOT inside a SQL string literal — Spark's SQL parser
    * would eat the backslashes. (Scala resolves the \\uXXXX escapes to
    * literal chars at compile time; Java regex takes them as char-class
    * members.) */
  val sparkPattern: String =
    s"(?:$alternation|[一-鿿぀-ヿ가-힯]|[^\\s])"

  /** RE2 twin (DuckDB `regexp_extract_all`): identical alternation,
    * RE2's \x{...} syntax for the CJK classes. */
  val duckPattern: String =
    s"(?:$alternation|[\\x{4e00}-\\x{9fff}\\x{3040}-\\x{30ff}" +
      "\\x{ac00}-\\x{d7af}]|[^\\s])"

  /** DuckDB SQL: BIGINT token count of a string expression. */
  def duck(strExpr: String): String =
    s"CAST(len(regexp_extract_all($strExpr, '$duckPattern')) AS BIGINT)"

  /** Scala-side reference count (spec golden-check twin). */
  def countReference(text: String): Long = {
    val p = java.util.regex.Pattern.compile(sparkPattern)
    val m = p.matcher(text)
    var n = 0L
    while (m.find()) n += 1
    n
  }
}
