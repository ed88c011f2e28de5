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

  /** The shared prefix walk (round-17 review: this pattern appeared
    * four times before extraction): aggregate `measure` per `bucket`
    * (distributed), then on the bucket table — the ONLY place an
    * unpartitioned window runs — compute the EXCLUSIVE running total
    * in `offOut` and the grand total in `totOut`. Returns one row per
    * bucket: [bucket, mOut, offOut, totOut]. NULL buckets, if
    * present, sort first/last per `asc` like any orderBy; callers
    * that must exclude them filter before calling.
    */
  private def prefixWalk(rows: DataFrame, bucket: String,
      measure: Column, asc: Boolean,
      mOut: String, offOut: String, totOut: String): DataFrame = {
    val bOrd = if (asc) col(bucket).asc else col(bucket).desc
    val wOff = Window.orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1L)
    rows.groupBy(bucket).agg(measure.as(mOut))
      .withColumn(offOut,
        coalesce(sum(col(mOut)).over(wOff), lit(0L)))
      .withColumn(totOut, sum(col(mOut)).over(Window.partitionBy()))
  }

  /** Adds `rnOut` = exact global 1-based row_number of each row under
    * (`order`) and `nOut` = the total row count. No unpartitioned
    * window ever touches `df` — only the bucket-count table.
    */
  def rowNumber(df: DataFrame, bucketExpr: Column, bucketAsc: Boolean,
      order: Seq[Column], rnOut: String, nOut: String): DataFrame = {
    val withB = df.withColumn("_gr_b", bucketExpr)
    val off = prefixWalk(withB, "_gr_b", count(lit(1)), bucketAsc,
        "_gr_cnt", "_gr_off", nOut)
      .select(col("_gr_b").as("_gr_b2"), col("_gr_off"), col(nOut))
    val wIn = Window.partitionBy("_gr_b").orderBy(order: _*)
    // null-SAFE join (round-17 review): a NULL bucket key — a null
    // leading order column — forms its own group in the walk, and an
    // inner equi-join would silently drop those rows while nOut still
    // counted them. <=> keeps them, and the placement matches the
    // naive window bit-for-bit: Spark windows order nulls FIRST on
    // asc / LAST on desc, exactly where the walk's orderBy puts the
    // null bucket. GridRankSpec pins the null-key case.
    withB.join(broadcast(off), col("_gr_b") <=> col("_gr_b2"))
      .withColumn(rnOut,
        col("_gr_off") + row_number().over(wIn).cast("long"))
      .drop("_gr_b", "_gr_b2", "_gr_off")
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
    val off = prefixWalk(withB, "_gr_b", sum(col("_gr_v")), bucketAsc,
        "_gr_s", "_gr_off", totOut)
      .select(col("_gr_b").as("_gr_b2"), col("_gr_off"), col(totOut))
    val wIn = Window.partitionBy("_gr_b").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe join for the same reason as [[rowNumber]]
    withB.join(broadcast(off), col("_gr_b") <=> col("_gr_b2"))
      .withColumn(cumOut, col("_gr_off") + sum(col("_gr_v")).over(wIn))
      .drop("_gr_b", "_gr_b2", "_gr_off", "_gr_v")
  }

  /** Distributed EXACT interpolated percentile(s) — the bounded-state
    * replacement for Spark's `percentile` aggregate when the group is
    * the whole (corpus-growing) relation: the built-in buffers every
    * distinct value of the group in ONE unspillable OpenHashMap
    * (round-17 group-array sweep), which is corpus-fatal for a
    * continuous score column and √(2N)-sized even for integer counts.
    * Decomposition: a distributed bucket histogram, a prefix walk on
    * the domain-bounded bucket table (the only single-task stage)
    * that pinpoints WHICH bucket holds each straddling order
    * statistic, a broadcast semi-filter so the corpus-side sort
    * touches only those ≤ 2·|ps| buckets' rows (never a full-corpus
    * sort), and an interpolation that replays Spark's
    * `Percentile.getPercentile` EXACTLY, early returns and operand
    * order included (PercentileContSpec pins bit-equality against
    * the built-in on adversarial data):
    *
    *   pos    = p · (n − 1)                 (double, n < 2⁵³ exact)
    *   lower  = floor(pos), higher = ceil(pos)
    *   result = lowerVal                     if higher == lower
    *          = lowerVal                     if lowerVal == higherVal
    *          = (higher−pos)·lowerVal + (pos−lower)·higherVal
    *
    * `bucketOf` needs only VALUE-monotonicity (ties share a value,
    * so tie order inside the within-bucket window cannot change
    * which DOUBLE each rank selects — the strict-total-order
    * contract relaxes to value-determinism for order-statistic
    * selection). Null/NaN contract (round-17 review): NULL values
    * are filtered out up front, exactly like the built-in aggregate
    * skips them; NaN routes to a reserved greatest bucket
    * (Long.MaxValue — `bucketOf` must not map a real value there
    * and must return non-null for every non-null input; a saturating
    * `cast("long")` maps ±Infinity to Long.MaxValue/MinValue, which
    * stays monotone and orders correctly within the shared bucket),
    * matching the built-in's sort order where NaN ranks greatest;
    * ±0.0 are normalized equal (Spark groupBy semantics — the
    * built-in's boxed buffer keeps them distinct, an untestable
    * sub-ulp corner since interpolating between them yields ±0.0
    * either way). Returns ONE row with one column per `(p, name)`.
    * Empty/all-null input returns one all-null row (the built-in
    * returns null too).
    */
  def percentileCont(df: DataFrame, value: Column,
      bucketOf: Column => Column,
      ps: Seq[(Double, String)]): DataFrame = {
    val v = value.cast("double")
    val vals = df.select(v.as("_pc_v"))
      .filter(col("_pc_v").isNotNull)
      .withColumn("_pc_b",
        when(isnan(col("_pc_v")), lit(Long.MaxValue))
          .otherwise(bucketOf(col("_pc_v"))))
    // distributed bucket histogram; the ONLY single-task walk runs
    // here, on the domain-bounded bucket table
    val off = prefixWalk(vals, "_pc_b", count(lit(1)), asc = true,
      "_pc_c", "_pc_off", "_pc_n")
    // Needed global ranks (1-based): lower+1 and higher+1 per p. Each
    // becomes at most one (bucket, local-rank, tag) target row — so
    // the corpus-side work below touches ONLY the ≤ 2·|ps| buckets
    // holding a requested order statistic, never a full-corpus sort.
    val targetStructs = ps.flatMap { case (p, name) =>
      val pos = lit(p) * (col("_pc_n") - lit(1L)).cast("double")
      Seq(
        struct((floor(pos) + lit(1L)).as("k"), lit(s"lo_$name").as("tag")),
        struct((ceil(pos) + lit(1L)).as("k"), lit(s"hi_$name").as("tag")))
    }
    val targets = off
      .select(col("_pc_b"), col("_pc_off"), col("_pc_c"), col("_pc_n"),
        explode(array(targetStructs: _*)).as("t"))
      .filter(col("t.k") > col("_pc_off") &&
        col("t.k") <= col("_pc_off") + col("_pc_c"))
      .select(col("_pc_b"), (col("t.k") - col("_pc_off")).as("_pc_lk"),
        col("t.tag").as("_pc_tag"), col("_pc_n"))
    // broadcast join = map-side elimination of every non-target
    // bucket; the per-target window sorts one bucket's rows only
    val wIn = Window.partitionBy("_pc_b", "_pc_tag")
      .orderBy(col("_pc_v").asc)
    val picked = vals.join(broadcast(targets), Seq("_pc_b"))
      .withColumn("_pc_lrn", row_number().over(wIn).cast("long"))
      .filter(col("_pc_lrn") === col("_pc_lk"))
    val aggs =
      ps.flatMap { case (_, name) =>
        Seq(
          max(when(col("_pc_tag") === s"lo_$name", col("_pc_v")))
            .as(s"_lo_$name"),
          max(when(col("_pc_tag") === s"hi_$name", col("_pc_v")))
            .as(s"_hi_$name"))
      } :+ max(col("_pc_n")).as("_pc_n")
    picked.agg(aggs.head, aggs.tail: _*).select(interpOuts(ps): _*)
  }

  /** The interpolation columns over a 1-row frame carrying
    * `_lo_<name>` / `_hi_<name>` / `_pc_n` — Spark's
    * `Percentile.getPercentile` replayed exactly (see
    * [[percentileCont]]'s scaladoc). */
  private def interpOuts(ps: Seq[(Double, String)]): Seq[Column] =
    ps.map { case (p, name) =>
      val pos = lit(p) * (col("_pc_n") - lit(1L)).cast("double")
      val lower = floor(pos)
      val higher = ceil(pos)
      val lo = col(s"_lo_$name")
      val hi = col(s"_hi_$name")
      when(higher === lower || lo === hi, lo)
        .otherwise((higher.cast("double") - pos) * lo +
          (pos - lower.cast("double")) * hi)
        .as(name)
    }

  /** [[percentileCont]] specialized to the bucket == value case
    * (exactly representable numerics — counts, cents, fixed-point
    * scores): every tie collapses into one row of the value
    * histogram, so the straddling order statistics read straight off
    * the prefix-walked value table and the corpus is touched by
    * nothing but the ONE distributed groupBy. For per-key counts the
    * value table is ≤ √(2N) rows (distinct positive integers summing
    * to N). Same bit-exact interpolation and null contract as
    * [[percentileCont]] (NaN needs no guard here: the walk orders by
    * the value itself and Spark sorts NaN greatest, matching the
    * built-in); PercentileContSpec pins this form too.
    *
    * `nOut`/`maxOut` optionally emit the group's row count (long)
    * and max value (cast long — counts/cents are exact) as extra
    * columns, read off the SAME histogram so callers wanting
    * count+max+percentiles don't aggregate the input twice (the
    * q_skew_profile single-pass shape, round-17 review).
    */
  def percentileContByValue(df: DataFrame, value: Column,
      ps: Seq[(Double, String)], nOut: Option[String] = None,
      maxOut: Option[String] = None): DataFrame = {
    val vals = df.select(value.cast("double").as("_pc_v"))
      .filter(col("_pc_v").isNotNull)
    val off = prefixWalk(vals, "_pc_v", count(lit(1)), asc = true,
      "_pc_c", "_pc_off", "_pc_n")
    val aggs = (ps.flatMap { case (p, name) =>
      val pos = lit(p) * (col("_pc_n") - lit(1L)).cast("double")
      val kLo = floor(pos) + lit(1L)
      val kHi = ceil(pos) + lit(1L)
      val holds = (k: Column) =>
        k > col("_pc_off") && k <= col("_pc_off") + col("_pc_c")
      Seq(
        max(when(holds(kLo), col("_pc_v"))).as(s"_lo_$name"),
        max(when(holds(kHi), col("_pc_v"))).as(s"_hi_$name"))
    } :+ max(col("_pc_n")).as("_pc_n")) ++
      maxOut.map(o => max(col("_pc_v")).cast("long").as(o))
    val outs = interpOuts(ps) ++
      // count semantics on empty input: 0, not null
      nOut.map(o => coalesce(col("_pc_n"), lit(0L)).as(o)) ++
      maxOut.map(col)
    off.agg(aggs.head, aggs.tail: _*).select(outs: _*)
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
