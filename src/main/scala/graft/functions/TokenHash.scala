package graft.functions

/** THE per-token integer hash of the engine: first 8 hex chars of md5
  * as a bigint, computed identically in Spark and DuckDB. Single
  * definition point — dedup (shingles, simhash), fingerprinting, and
  * any future hashed operator must widen from here, or the engines
  * silently diverge per query. */
object TokenHash {
  /** Spark SQL: hash every element of an array-typed expression. */
  def spark(arrayExpr: String): String =
    s"transform($arrayExpr, w -> CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT))"

  /** DuckDB twin. */
  def duck(arrayExpr: String): String =
    s"list_transform($arrayExpr, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT)"
}

/** THE 5-gram polynomial hash over a [[TokenHash]]-hashed word array
  * `hw`: each window of 5 token hashes collapses to one exact i64
  * (hw < 2^32, coefficient sum 31⁴+…+1 < 2^20 → products < 2^52 —
  * integer-exact in both engines). Shared by within-document
  * repetition scoring and cross-document duplicate-span detection so
  * the "what counts as the same 5-gram" contract can't drift. */
object NgramHash {
  /** Spark SQL: array of 5-gram hashes of the array expr `hw`. */
  def spark(hw: String): String =
    s"transform(sequence(1, size($hw) - 4), i -> " +
      s"element_at($hw, i) * 923521 + element_at($hw, i + 1) * 29791 + " +
      s"element_at($hw, i + 2) * 961 + element_at($hw, i + 3) * 31 + " +
      s"element_at($hw, i + 4))"

  /** DuckDB twin (1-based list indexing). */
  def duck(hw: String): String =
    s"list_transform(range(1, len($hw) - 3), i -> " +
      s"$hw[i] * 923521 + $hw[i+1] * 29791 + $hw[i+2] * 961 + " +
      s"$hw[i+3] * 31 + $hw[i+4])"
}
