package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftShim

/** Whole-operator extension: exact top-k rows per key.
  *
  * The DataFrame idiom — `row_number().over(partitionBy(keys).orderBy(o)) <= k`
  * — fully sorts every key group before discarding all but k rows. At
  * 100 TB that sort is the dominant cost (spill + CPU on data that is
  * thrown away). This operator keeps a bounded heap per key instead:
  *
  *   partial TopKPerKeyExec (per input partition, no distribution
  *   requirement) → shuffle on keys (inserted by EnsureRequirements)
  *   → final TopKPerKeyExec (per key group)
  *
  * Memory is O(distinct-keys-per-partition × k); the shuffle carries
  * at most k rows per key per map partition, not the full group.
  * Registered via [[TopKStrategy]] (SparkSessionExtensions
  * injectPlannerStrategy) — level (c) of the extension ladder, used
  * because no composition of built-ins avoids the full sort.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  protected override def doExecute(): RDD[InternalRow] = {
    val k_ = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // heap head = worst kept row (max under the requested order)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // capacity is only a HINT (the queue grows) — k + 1 overflows
          // for a take-everything k = Int.MaxValue caller, so clamp
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(k_.toLong + 1L, 1024L).toInt, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k_) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  sealed trait Dir
  case object Asc extends Dir
  case object Desc extends Dir

  /** Top-k rows per key, ordered by (column-name, direction) pairs.
    * Registers [[TopKStrategy]] on the session idempotently.
    *
    * Keys/order are column NAMES resolved here against the analyzed
    * child — Spark 4's Column nodes convert to lazy wrapper
    * expressions that only standard operators resolve, so a custom
    * plan node must bind real AttributeReferences itself. */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Dir)], k: Int): DataFrame = {
    // fail here with a clear message, not as an executor NPE from
    // peek() on an empty heap mid-stage
    require(k > 0, s"TopKPerKey needs k > 0, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = GraftShim.analyzedPlan(df)
    def attr(name: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(",")}"))
    val sortOrders = order.map {
      case (c, Desc) => SortOrder(attr(c), Descending)
      case (c, _) => SortOrder(attr(c), Ascending)
    }
    GraftShim.ofRows(spark, TopKPerKeyPlan(keys.map(attr), sortOrders, k, child))
  }
}
