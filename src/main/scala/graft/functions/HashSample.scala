package graft.functions

/** THE deterministic hash-sample predicate, Spark + DuckDB twins: keep
  * a row iff the first 8 md5 hex digits of its key, read as an
  * integer, are ≡ 0 mod `mod` — a reproducible 1/mod sample (same rows
  * every run, every engine, every cluster size; stable under corpus
  * growth). One definition so the sampling contract can never drift
  * between q_sample_hash, the sampled IVF fit, and their specs. */
object HashSample {
  def spark(key: String, mod: Int): String =
    s"${sparkBucket(key, mod)} = 0"
  def duck(key: String, mod: Int): String =
    s"${duckBucket(key, mod)} = 0"

  /** The underlying uniform hash bucket in [0, mod) — the same
    * construction exposed as a VALUE, for consumers that partition the
    * keyspace instead of filtering it (train/val/test splits, salting
    * diagnostics). mod must be positive: under non-ANSI Spark, `% 0`
    * is NULL and the sample predicate would silently keep ZERO rows
    * while the DuckDB twin errors — fail at construction instead
    * (round-12 review). */
  def sparkBucket(key: String, mod: Int): String = {
    require(mod > 0, s"hash-sample mod must be positive, got $mod")
    s"${sparkRaw(key)} % $mod"
  }
  def duckBucket(key: String, mod: Int): String = {
    require(mod > 0, s"hash-sample mod must be positive, got $mod")
    s"${duckRaw(key)} % $mod"
  }

  /** The raw 32-bit hash VALUE (< 2³², always non-negative) — for
    * consumers that need a total hash ORDER rather than a bucket
    * (deterministic training-data shuffling). */
  def sparkRaw(key: String): String =
    s"CAST(conv(substr(md5(CAST($key AS STRING)), 1, 8), 16, 10) AS BIGINT)"
  def duckRaw(key: String): String =
    s"('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 8))::BIGINT"
}
