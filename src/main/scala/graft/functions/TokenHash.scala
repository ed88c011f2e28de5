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
