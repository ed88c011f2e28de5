package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension (SURVEY §2.8 / the LogicalPlan+Strategy+
  * Exec tier): per-key top-k with bounded heaps.
  *
  * The composable form — `row_number() OVER (PARTITION BY k ORDER BY
  * o)` + filter — must SORT every partition in full before discarding
  * all but k rows per key. This operator keeps a k-bounded heap per
  * key instead: O(n log k) with no full sort, and memory bounded by
  * keys-per-partition × k. `requiredChildDistribution` declares the
  * keyed clustering, so Catalyst's EnsureRequirements inserts exactly
  * the one hash exchange the operator needs — partitioning stays the
  * planner's job, not ours.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  // the node is public and the strategy session-injected, so a plan
  // built around the TopK.perKey facade must fail HERE, not as a
  // per-row NoSuchElementException on an empty heap inside executors
  require(k > 0, s"TopKPerKey k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // propagate the child's partitioning (the default UnknownPartitioning
  // would make a downstream same-key aggregate re-exchange the
  // surviving rows — the scaladoc's "exactly one hash exchange" claim
  // depends on this, TopKPerKeySpec pins it)
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val rowOrd: Ordering[InternalRow] =
        RowOrdering.create(orderExprs, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // max-heap on the SortOrder: the root is the WORST retained row,
      // evicted when a better one arrives
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        // copy the projected key only on first sight — getOrElseUpdate
        // would allocate a copy per input row
        val k = keyProj(row)
        val heap = heaps.get(k) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(k.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }
}

/** Planner strategy: logical TopKPerKey → TopKPerKeyExec. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      TopKPerKeyExec(k, keys, order, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Column-level API: best-k per key under `orderCols` — each entry is
  * (column, ascending): `(col, true)` keeps the k SMALLEST,
  * `(col, false)` the k largest. */
object TopK {
  def perKey(df: DataFrame, k: Int, keyCols: Seq[Column], orderCols: Seq[(Column, Boolean)]): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty,
      "keyCols must be non-empty (ClusteredDistribution would reject an " +
        "empty clustering deep inside planning otherwise; for a GLOBAL " +
        "top-k use orderBy(...).limit(k))")
    require(orderCols.nonEmpty,
      "orderCols must be non-empty — with no order every comparison ties " +
        "and the k survivors per key would be arbitrary")
    GraftBridge.registerStrategy(df.sparkSession, TopKStrategy)
    // Resolve the user Columns by running them through a throwaway
    // projection: its analyzed projectList shares attribute ids with
    // its child, which becomes our operator's child.
    val proj = df.select(keyCols ++ orderCols.map(_._1): _*)
      .queryExecution.analyzed match {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
        case other => throw new IllegalArgumentException(
          "TopK.perKey columns must be row-level expressions — an " +
            s"aggregate/generator is not (analyzed to ${other.nodeName}); " +
            "aggregate first, then rank the aggregated frame")
      }
    // generators and window functions ALSO analyze to a Project — over
    // a Generate/Window node — so the match above alone would let
    // explode(...)/rank().over(...) through with a multiplied child
    // and extra synthetic columns. The operator's child must be df's
    // own analyzed plan, which shows as id-identical output.
    require(proj.child.output == GraftBridge.logicalPlan(df).output,
      "TopK.perKey columns must be row-level expressions over the " +
        s"input frame — analysis introduced a ${proj.child.nodeName} " +
        "node (a generator or window function does this); compute such " +
        "columns with select/withColumn first, then rank")
    val resolved = proj.projectList.map {
      case a: Alias => a.child
      case e        => e
    }
    // a Column can EXPAND to several expressions (col("*"), struct.*) —
    // splitAt/zip below would then silently misalign keys and order
    require(resolved.size == keyCols.size + orderCols.size,
      s"TopK.perKey columns must be single expressions: " +
        s"${keyCols.size} key + ${orderCols.size} order columns " +
        s"resolved to ${resolved.size} expressions (a star or " +
        "struct expansion is ambiguous here — name the columns)")
    // nondeterministic expressions (rand(), ...) need per-partition
    // initialization the exec's projections never perform — refuse at
    // the API instead of an executor-side initialization failure; the
    // operator's contract is a deterministic ranking anyway
    require(resolved.forall(_.deterministic),
      "TopK.perKey key/order expressions must be deterministic " +
        "(materialize a random column with withColumn first if a " +
        "random ranking is really intended)")
    val (keyExprs0, orderExprs) = resolved.splitAt(keyCols.size)
    // UnsafeRow grouping keys compare by BYTES and map entry order is
    // not canonical — Spark's own groupBy rejects map-typed grouping
    // for exactly this reason, and bypassing the check here would let
    // one logical key split across heaps and partitions
    keyExprs0.foreach { e =>
      require(!GraftBridge.containsMapType(e.dataType),
        s"TopK.perKey key ${e.sql} is (or contains) a map — maps have " +
          "no canonical binary form and cannot be grouping keys")
    }
    orderExprs.foreach { e =>
      require(RowOrdering.isOrderable(e.dataType),
        s"TopK.perKey order column ${e.sql} has unorderable type " +
          s"${e.dataType.catalogString}")
    }
    // normalize float/double keys (-0.0 vs 0.0, NaN bit patterns):
    // Spark inserts NormalizeFloatingNumbers above ITS OWN grouping
    // operators only, and UnsafeRow grouping keys compare by bytes —
    // without this a DoubleType key holding 0.0 and -0.0 rows would
    // split one logical key across two heaps (and hash partitions)
    val keyExprs = keyExprs0.map(GraftBridge.normalizeFloats)
    val sortOrder = orderExprs.zip(orderCols.map(_._2)).map { case (e, asc) =>
      SortOrder(e,
        if (asc) Ascending else Descending,
        if (asc) NullsFirst else NullsLast, Seq.empty)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerKey(k, keyExprs, sortOrder, proj.child))
  }
}
