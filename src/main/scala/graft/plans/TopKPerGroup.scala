package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.BindReferences.bindReferences
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: top-k rows per group without a full window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k` sorts every group's
  * entire row set; at 100 TB that is a full shuffle + per-partition sort of
  * the fact table to keep k rows. This operator keeps a bounded k-heap per
  * group: the shuffle still routes by group key (required distribution),
  * but per-partition memory/CPU is O(groups × k), not O(rows log rows) —
  * the plan a large cluster wants for "top-k per key".
  *
  * Full Catalyst integration: logical node → planner [[Strategy]] →
  * [[TopKPerGroupExec]] physical node, registered at runtime through
  * `spark.experimental.extraStrategies` (the public extension point;
  * SparkSessionExtensions offers the same hook at session build time).
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, o, child) =>
      TopKPerGroupExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  // rows of one group must meet in one partition; EnsureRequirements
  // inserts the hash exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprsLocal = groupExprs
    val orderExprsLocal = orderExprs
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = GenerateOrdering.generate(bindReferences(orderExprsLocal, childOutput))
      // heapOrd follows the requested sort order; the PQ dequeues its max,
      // i.e. the worst kept row — eviction is O(log k)
      val heapOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
      }
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = groupProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h => out ++= h.toSeq.sorted(heapOrd) }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopK {
  /** Register the strategy (idempotent) and wrap `df` in a TopKPerGroup. */
  def topKPerGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = TopKStrategy +: spark.experimental.extraStrategies
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute = plan.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"no column $name in ${plan.output}"))
    val orders = orderCols.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    GraftShims.ofRows(spark, TopKPerGroup(k, groupCols.map(attr), orders, plan))
  }
}
