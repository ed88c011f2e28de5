package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared null-element policy for the binary array expressions below.
  *
  * The guard is a PRE-SCAN, not a per-iteration branch (round-12
  * review): checking inside the walk left a hole — SortedIntersect
  * Count's merge walk never visits elements past the point where one
  * array is exhausted, and `array_sort` places nulls LAST, so the
  * realistic null position was exactly the one the in-loop guard
  * could never reach (a trailing null returned a count instead of the
  * documented NULL). Scanning for nulls up front makes the contract
  * position-independent AND keeps the hot walk branch-free even for
  * containsNull=true inputs — which is every real input: implicit
  * casts and collect/transform builders all widen to
  * containsNull=true, so the old "containsNull=false keeps the fast
  * loop" claim was dead code for the pipelines these expressions
  * exist for. containsNull=false inputs skip the pre-scan entirely. */
private[functions] trait ArrayPairNullGuard { self: BinaryExpression =>
  /** True when either child's ARRAY TYPE admits null elements —
    * constant after resolution, so a lazy val, not a per-row def. */
  protected lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  /** Interpreted pre-scan: true iff any element of `x` is null. */
  protected final def anyNullElem(x: ArrayData): Boolean = {
    val n = x.numElements()
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

/** Dot product of two double arrays as a native codegen'd Catalyst
  * expression.
  *
  * Why custom: the composable form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  * is interpreted per element (lambda dispatch per value) and breaks
  * whole-stage codegen; at 100 TB the similarity/dedup pipelines do
  * billions of dot products, so this is the hot path worth owning.
  * Summation is a strict left-to-right fold, bit-identical to the
  * sequential `list_reduce` the DuckDB oracles use — determinism is
  * part of the contract, so no reassociation/SIMD tricks here.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with ArrayPairNullGuard {

  // declared input types: SQL callers get implicit casts (e.g.
  // array<int> → array<double>) or a clean analysis error, never a
  // silent getDouble() misread of 4-byte slots
  override def inputTypes: Seq[GraftBridge.ADT] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  // a dot product of mismatched-length vectors is undefined: null, not
  // a silent min-length truncation (the DuckDB oracle twin agrees) —
  // and so is one touching a NULL ELEMENT (getDouble would silently
  // read the zeroed slot as 0.0; the composable aggregate/zip_with
  // form and the DuckDB list_reduce twin both return NULL there)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (mayHaveNullElems && (anyNullElem(x) || anyNullElem(y))) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getDouble(i) * y.getDouble(i); i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      // pre-scan (see ArrayPairNullGuard): the value walk stays
      // branch-free; containsNull=false inputs emit no scan at all
      val nullScan =
        if (mayHaveNullElems)
          s"""for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
             |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullScan
         |  if (!${ev.isNull}) {
         |    double $sum = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $sum += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |    ${ev.value} = $sum;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Count of common elements between two SORTED arrays of distinct
  * longs, as a codegen'd merge walk.
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set per
  * row pair (interpreted, allocation-heavy) — at 100 TB the Jaccard
  * verification step runs this per candidate pair, making it the
  * dedup pipeline's hot path. A merge walk over pre-sorted int arrays
  * is allocation-free and whole-stage-codegen'd. Callers sort once
  * per document (`array_sort`), amortized over all its pairs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with ArrayPairNullGuard {

  override def inputTypes: Seq[GraftBridge.ADT] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  // a NULL ELEMENT poisons the walk two ways: getLong reads the zeroed
  // slot as 0 (spurious match against a real 0), and array_sort places
  // nulls LAST, so the decoded 0 lands after larger values and the
  // sortedness invariant breaks (silent early termination). Result is
  // NULL instead, wherever the null sits — including positions the
  // merge walk itself would never visit (the pre-scan guarantees it).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (mayHaveNullElems && (anyNullElem(x) || anyNullElem(y))) return null
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      // pre-scan (see ArrayPairNullGuard): a trailing null — the spot
      // array_sort actually puts nulls — nulls the result even though
      // the merge walk below would exhaust the other side first
      val nullScan =
        if (mayHaveNullElems)
          s"""for (int $k = 0; $k < $nx && !${ev.isNull}; $k++) {
             |  if ($a.isNullAt($k)) { ${ev.isNull} = true; }
             |}
             |for (int $k = 0; $k < $ny && !${ev.isNull}; $k++) {
             |  if ($b.isNullAt($k)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else ""
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |$nullScan
         |if (!${ev.isNull}) {
         |  int $i = 0; int $j = 0; long $n = 0L;
         |  while ($i < $nx && $j < $ny) {
         |    long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |    if ($xv == $yv) { $n++; $i++; $j++; }
         |    else if ($xv < $yv) { $i++; } else { $j++; }
         |  }
         |  ${ev.value} = $n;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object VecOps {
  /** Column API: dot product over array<double> columns. */
  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Squared L2 norm (dot with self). */
  def vec_norm2(a: Column): Column = vec_dot(a, a)

  /** Intersection cardinality of two sorted distinct array<long>. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(
      SortedIntersectCount(GraftBridge.expression(a), GraftBridge.expression(b)))
}
