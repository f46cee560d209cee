package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator custom plan: top-k rows per group by a numeric ordering
  * expression — the dashboards' top-N-talkers shape
  * (`/root/reference/compose/grafana/dashboards/viz-ch.json:233`) as a
  * first-class physical operator.
  *
  * Built-in Spark expresses this as window `row_number` + filter, which
  * sorts EVERY row of every group and shuffles the full input. This
  * operator keeps a bounded heap of k rows per group:
  *
  *   partial GroupTopKExec (map-side, each partition → ≤k rows per group)
  *     → hash exchange on the grouping key (≤ k·partitions rows per group)
  *       → final GroupTopKExec (exact top-k per group)
  *
  * — the same partial/final contract as Catalyst aggregation, so shuffle
  * volume is k·partitions per group instead of the group's row count. At
  * 100 TB with k=10 that is the difference between shuffling ~everything
  * and shuffling ~nothing. Correct for any orderable type; ties at the
  * boundary keep an arbitrary row but a deterministic VALUE multiset
  * (`min-heap` replacement only on strict improvement).
  *
  * Wiring: [[GroupTopKStrategy]] plans the logical node (inject via
  * `spark.experimental.extraStrategies` or [[GraftExtensions]]);
  * [[GroupTopK.topK]] is the DataFrame-level API.
  */
final case class GroupTopKNode(grouping: Seq[Expression], order: Expression,
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

final case class GroupTopKExec(grouping: Seq[Expression], order: Expression,
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(grouping))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val orderExpr = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupingExprs, childOutput)
      val bound = BindReferences.bindReference(orderExpr, childOutput)
      val ord = TypeUtils.getInterpretedOrdering(bound.dataType)
      // min-heap per group: head is the weakest of the kept top-k
      val cmp = new java.util.Comparator[(Any, InternalRow)] {
        override def compare(a: (Any, InternalRow), b: (Any, InternalRow)): Int =
          ord.compare(a._1, b._1)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Any, InternalRow)]]()
      while (iter.hasNext) {
        val row = iter.next()
        val v = bound.eval(row)
        if (v != null) {
          val key = groupProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[(Any, InternalRow)](kk + 1, cmp)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kk) heap.add((v, row.copy()))
          else if (ord.compare(v, heap.peek()._1) > 0) {
            heap.poll()
            heap.add((v, row.copy()))
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala.map(_._2))
    }, preservesPartitioning = true)
  }
}

/** Plans [[GroupTopKNode]] as partial → (exchange) → final exec. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupTopKNode =>
      GroupTopKExec(g.grouping, g.order, g.k, partial = false,
        GroupTopKExec(g.grouping, g.order, g.k, partial = true, planLater(g.child))) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** Top-k rows of `df` per `groupCols` group, largest `orderCol` first.
    * Requires [[GroupTopKStrategy]] in the session (GraftExtensions or
    * `spark.experimental.extraStrategies`). */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCol: Column, k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    ColumnBridge.ofRows(spark, GroupTopKNode(
      groupCols.map(ColumnBridge.expression),
      ColumnBridge.expression(orderCol), k,
      ColumnBridge.logicalPlan(df)))
  }
}
