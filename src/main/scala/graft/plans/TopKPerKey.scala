package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key, planned as a custom physical operator —
  * the (c) rung of the custom-operator ladder (custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`), used where composition is wasteful:
  * the window-function formulation (`row_number() ≤ k`) shuffles and
  * sorts EVERY row of every key before discarding all but k of them.
  *
  * This operator keeps a bounded heap per key on each input partition
  * (partial phase, before the exchange), so the shuffle carries at most
  * k rows per key per partition; the final phase re-prunes after the
  * exchange. At 100 TB the shuffle shrinks from the full fact table to
  * ~k × keys × partitions rows, and nothing is ever globally sorted —
  * heap maintenance is O(log k) per row.
  *
  * The physical pattern mirrors partial/final aggregation:
  * `EnsureRequirements` inserts the hash exchange between the two phases
  * because only the final exec declares a clustered distribution
  * requirement.
  */
object TopKPerKey {

  /** Top `k` rows per key group in `orderBy` order (ascending list
    * semantics — pass `col(...).desc` Columns for descending). Output
    * rows are NOT globally ordered; order downstream if needed. */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    // runtime strategy injection: works on any session (the driver's
    // vanilla smoke session included) — idempotent
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        TopKStrategy +: spark.experimental.extraStrategies
    val child = GraftSqlBridge.planOf(df)
    val keyExprs = keys.map(n => GraftSqlBridge.toEagerExpression(df(n)))
    val order = orderBy.map(GraftSqlBridge.toEagerExpression(_) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    GraftSqlBridge.ofRows(spark, TopKPerKeyNode(keyExprs, order, k, child))
  }
}

/** Logical node: semantics only (output = child output, k rows per key). */
case class TopKPerKeyNode(grouping: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(g, o, k, child) =>
      val partial = TopKPerKeyExec(g, o, k, planLater(child), partial = true)
      TopKPerKeyExec(g, o, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key within each partition. `partial = true`
  * runs before the exchange (no distribution requirement, prunes the
  * shuffle); `partial = false` requires rows clustered by the key and
  * emits the exact per-key result. */
case class TopKPerKeyExec(grouping: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: SparkPlan, partial: Boolean)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  // observability: the partial phase's output vs its input is the
  // shuffle-pruning ratio
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(grouping) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupingExprs = grouping
    val sortOrder = order
    val limit = k
    val numOutput = longMetric("numOutputRows")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      // doExecute's contract does not guarantee UnsafeRow (LocalTableScan /
      // RDD-backed children emit generic rows) — normalize through an
      // identity UnsafeProjection before copying into the heap; already-
      // unsafe rows (the common case) skip the extra projection copy
      val toUnsafeProj = UnsafeProjection.create(childOutput, childOutput)
      def toUnsafe(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u
        case r => toUnsafeProj(r)
      }
      // generated row comparator for the SortOrder list; heap keeps its
      // MAX (= worst kept row) at the head for O(log k) replacement
      val cmp = new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              cmp.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) {
          heap += toUnsafe(row).copy()
        } else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += toUnsafe(row).copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator).map { r => numOutput += 1; r }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}
