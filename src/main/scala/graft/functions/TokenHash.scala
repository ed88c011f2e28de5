package graft.functions

/** THE per-token integer hash of the engine: first 8 hex chars of md5
  * as a bigint, computed identically in Spark and DuckDB. Single
  * definition point — dedup (shingles, simhash), fingerprinting, and
  * any future hashed operator must widen from here, or the engines
  * silently diverge per query. */
object TokenHash {
  // the per-element hash IS HashSample's raw construction (md5 → first
  // 8 hex → bigint) — one definition point for real, not one per file
  // claiming to be it (round-12 review). The CAST-to-string inside is
  // the identity on the string tokens every caller maps over.
  /** Spark SQL: hash every element of an array-typed expression. */
  def spark(arrayExpr: String): String =
    s"transform($arrayExpr, w -> ${HashSample.sparkRaw("w")})"

  /** DuckDB twin. */
  def duck(arrayExpr: String): String =
    s"list_transform($arrayExpr, w -> ${HashSample.duckRaw("w")})"
}

/** THE 5-gram polynomial hash over a [[TokenHash]]-hashed word array
  * `hw`: each window of 5 token hashes collapses to one exact i64
  * (hw < 2^32, coefficient sum 31⁴+…+1 < 2^20 → products < 2^52 —
  * integer-exact in both engines). Shared by within-document
  * repetition scoring and cross-document duplicate-span detection so
  * the "what counts as the same 5-gram" contract can't drift. */
object NgramHash {
  /** Spark SQL: array of 5-gram hashes of the array expr `hw`; an
    * array shorter than 5 yields an EMPTY array (matching the DuckDB
    * twin, whose `range` is already empty there), and NULL stays NULL.
    * Without the guard, Spark's `sequence(1, size-4)` on a short
    * array DESCENDS (sequence(1, 0) = [1, 0]) and `element_at(hw, 0)`
    * throws INVALID_INDEX_OF_ZERO — a latent crash every caller had to
    * individually guard against (round-12 review). */
  def spark(hw: String): String =
    s"CASE WHEN $hw IS NULL THEN CAST(NULL AS ARRAY<BIGINT>) " +
      s"WHEN size($hw) >= 5 THEN transform(sequence(1, size($hw) - 4), i -> " +
      s"element_at($hw, i) * 923521 + element_at($hw, i + 1) * 29791 + " +
      s"element_at($hw, i + 2) * 961 + element_at($hw, i + 3) * 31 + " +
      s"element_at($hw, i + 4)) " +
      s"ELSE array() END"

  /** DuckDB twin (1-based list indexing; `range(1, n)` with n <= 1 is
    * already empty, so short arrays agree with the Spark guard). */
  def duck(hw: String): String =
    s"list_transform(range(1, len($hw) - 3), i -> " +
      s"$hw[i] * 923521 + $hw[i+1] * 29791 + $hw[i+2] * 961 + " +
      s"$hw[i+3] * 31 + $hw[i+4])"
}
