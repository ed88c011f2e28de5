package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-task sort — the q_gains
  * decomposition (round-17) as a shared engine primitive.
  *
  * `Window.orderBy` with no partition collapses the whole input into
  * ONE window task; fine on a bounded pre-aggregated table, corpus
  * fatal on a dimension- or event-grain one (the round-16/17 window
  * sweep). But when the LEADING sort key has a corpus-independent
  * DOMAIN (fixed-point score grids, per-entity revenue bounded by
  * entity behavior, calendar-bounded latencies), the global rank
  * decomposes exactly:
  *
  *   rank(row) = Σ count(buckets strictly before row's bucket)
  *             + row_number within the bucket
  *
  * where bucket = a monotone coarsening of the leading key (e.g.
  * `key div g`). The bucket table is domain-sized — the ONLY
  * unpartitioned window runs there (the q_ks_2samp bounded-table
  * discipline) — and the within-bucket window distributes across
  * buckets. The offsets come back via a broadcast join. Because the
  * full `order` is a strict total order and the bucket is monotone
  * in its leading column, the result is IDENTICAL to the naive
  * global window — GridRankSpec pins bit-equality on adversarial
  * grids (ties inside buckets, cross-bucket ties on the coarse key,
  * singleton and empty buckets), and every query that adopted the
  * decomposition kept its DuckDB twin in the naive form as the
  * independent oracle.
  *
  * Contract: `bucketExpr` must be a deterministic, monotone
  * (non-decreasing when `bucketAsc`, non-increasing otherwise ⇒ pass
  * the same-direction coarsening) long function of the leading
  * `order` column, and `order` must be a strict total order (include
  * a unique tie-break). Skew bound: one window partition per bucket,
  * so the grid granularity chooses the max per-task row count
  * (~N/buckets for uniform keys); callers state the domain bound at
  * the call site.
  */
object GridRank {

  /** Adds `rnOut` = exact global 1-based row_number of each row under
    * (`order`) and `nOut` = the total row count. No unpartitioned
    * window ever touches `df` — only the bucket-count table.
    */
  def rowNumber(df: DataFrame, bucketExpr: Column, bucketAsc: Boolean,
      order: Seq[Column], rnOut: String, nOut: String): DataFrame = {
    val withB = df.withColumn("_gr_b", bucketExpr)
    val bOrd = if (bucketAsc) col("_gr_b").asc else col("_gr_b").desc
    val wOff = Window.orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1L)
    val off = withB.groupBy("_gr_b").agg(count(lit(1)).as("_gr_cnt"))
      .withColumn("_gr_off",
        coalesce(sum(col("_gr_cnt")).over(wOff), lit(0L)))
      .withColumn(nOut, sum(col("_gr_cnt")).over(Window.partitionBy()))
      .select(col("_gr_b"), col("_gr_off"), col(nOut))
    val wIn = Window.partitionBy("_gr_b").orderBy(order: _*)
    withB.join(broadcast(off), Seq("_gr_b"))
      .withColumn(rnOut,
        col("_gr_off") + row_number().over(wIn).cast("long"))
      .drop("_gr_b", "_gr_off")
  }

  /** Adds `cumOut` = exact running sum of `value` (long) under
    * (`order`), inclusive of the current row, plus `totOut` = the
    * grand total — the cumulative-walk twin of [[rowNumber]], same
    * decomposition: per-bucket value sums prefix-walked on the
    * domain-sized bucket table, a distributed running sum within
    * each bucket.
    */
  def runningSum(df: DataFrame, bucketExpr: Column, bucketAsc: Boolean,
      order: Seq[Column], value: Column,
      cumOut: String, totOut: String): DataFrame = {
    val withB = df.withColumn("_gr_b", bucketExpr)
      .withColumn("_gr_v", value)
    val bOrd = if (bucketAsc) col("_gr_b").asc else col("_gr_b").desc
    val wOff = Window.orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1L)
    val off = withB.groupBy("_gr_b").agg(sum(col("_gr_v")).as("_gr_s"))
      .withColumn("_gr_off",
        coalesce(sum(col("_gr_s")).over(wOff), lit(0L)))
      .withColumn(totOut, sum(col("_gr_s")).over(Window.partitionBy()))
      .select(col("_gr_b"), col("_gr_off"), col(totOut))
    val wIn = Window.partitionBy("_gr_b").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(off), Seq("_gr_b"))
      .withColumn(cumOut, col("_gr_off") + sum(col("_gr_v")).over(wIn))
      .drop("_gr_b", "_gr_off", "_gr_v")
  }

  /** Exact long integer division for NON-NEGATIVE columns. Not
    * `Column./` (IEEE double division — at ~1e11 a quotient within
    * half-ulp of the next integer rounds UP and the truncating cast
    * is then off by one): (a − a mod b) is an exact multiple of b,
    * so its double quotient is the exact integer, representable
    * because every operand stays far under 2⁵³.
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - a.mod(b)) / b).cast("long")

  /** Spark's `ntile(k)` bucket for global row `i` of `n` (both
    * 1-based/exact longs), as a closed form on columns — lets a
    * quantile cut ride [[rowNumber]] instead of an unpartitioned
    * ntile window. Spark/ANSI ntile semantics: the first `n mod k`
    * buckets hold `n div k + 1` rows, the rest `n div k`;
    * GridRankSpec pins equality against the built-in ntile across
    * sizes, including n < k (every row its own bucket — the
    * `greatest` guard keeps the then-unreachable else branch from
    * dividing by zero).
    */
  def ntileFromRowNumber(i: Column, n: Column, k: Int): Column = {
    val base = idiv(n, lit(k.toLong))
    val rem = n.mod(lit(k.toLong))
    val cut = (base + lit(1L)) * rem
    when(i <= cut, idiv(i - lit(1L), base + lit(1L)) + lit(1L))
      .otherwise(rem + lit(1L) +
        idiv(i - cut - lit(1L), greatest(base, lit(1L))))
  }
}
