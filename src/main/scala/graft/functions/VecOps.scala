package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Shared null-element policy for the binary array expressions below.
  *
  * Contract (round-12 review): a null ELEMENT anywhere in either
  * input — including positions a merge walk would never visit —
  * makes the result NULL. `array_sort` places nulls LAST, so the
  * realistic null position is exactly the one an in-loop-only guard
  * can never reach once the other side is exhausted.
  *
  * Implementation (round 13): the position-independent contract is
  * enforced in ONE pass, not a separate up-front scan. Round 12 used
  * a full pre-scan of both arrays before the value walk; that is an
  * extra O(n) memory pass per pair whenever either input's type
  * admits null elements — which is every parquet-fed embedding
  * column (containsNull=true), i.e. the ANN family's per-candidate
  * hot path. Instead:
  *   - VecDot walks the two arrays in LOCKSTEP over equal lengths, so
  *     checking each element as it is read already covers every
  *     position — no hole exists, no second pass needed.
  *   - SortedIntersectCount checks the two CURRENT elements before
  *     reading them (every index that becomes current is checked),
  *     then scans only the UNVISITED tail after the walk exhausts one
  *     side. Visited ∪ tail = all positions; total null tests stay
  *     ≤ nx + ny and the arrays are traversed once.
  * containsNull=false inputs emit no checks at all (the adjacency
  * builders type their arrays that way on purpose — see the typed
  * empty-array note at queries/Graph.scala's triangleCount).
  * The check-before-read order also matters for safety: GenericArrayData
  * .getLong/getDouble NPEs on a null slot (only UnsafeArrayData
  * zero-fills), so values are never read at an unchecked index. */
private[functions] trait ArrayPairNullGuard { self: BinaryExpression =>
  /** True when either child's ARRAY TYPE admits null elements —
    * constant after resolution, so a lazy val, not a per-row def. */
  protected lazy val mayHaveNullElems: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  /** Interpreted tail scan: true iff any element of `x` in
    * [from, numElements) is null. */
  protected final def anyNullElemFrom(x: ArrayData, from: Int): Boolean = {
    val n = x.numElements()
    var i = from
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
    // lockstep over equal lengths: the loop visits EVERY index unless
    // it has already returned null, so the in-loop check alone is
    // position-independent (ArrayPairNullGuard scaladoc)
    val checkNulls = mayHaveNullElems
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      sum += x.getDouble(i) * y.getDouble(i); i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      // emitted only when the type admits null elements; the lockstep
      // loop covers every position, so no tail scan is needed here
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
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
  // merge walk itself would never visit: the walk checks each element
  // it reads, and the unvisited remainder is tail-scanned after.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val checkNulls = mayHaveNullElems
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      // check-before-read: every index that becomes current is
      // checked exactly here, before getLong can touch it
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(j))) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    // tail scan: the walk exhausts one side first; positions it never
    // visited ([i, nx) and [j, ny)) still null the result — this is
    // the trailing-null case array_sort actually produces
    if (checkNulls && (anyNullElemFrom(x, i) || anyNullElemFrom(y, j)))
      return null
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      // in-loop check + tail scan = position-independent coverage in
      // ONE traversal (ArrayPairNullGuard scaladoc); after a break the
      // tail loops are skipped via !isNull
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      val tailScan =
        if (mayHaveNullElems)
          s"""for (; $i < $nx && !${ev.isNull}; $i++) {
             |  if ($a.isNullAt($i)) { ${ev.isNull} = true; }
             |}
             |for (; $j < $ny && !${ev.isNull}; $j++) {
             |  if ($b.isNullAt($j)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else ""
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $n = 0L;
         |while ($i < $nx && $j < $ny) {
         |  $nullCheck
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |$tailScan
         |if (!${ev.isNull}) { ${ev.value} = $n; }
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
