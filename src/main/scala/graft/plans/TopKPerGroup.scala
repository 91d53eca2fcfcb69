package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

import scala.collection.mutable

/** A whole custom operator (preference order (c): LogicalPlan +
  * Strategy + physical exec): top-k rows per group WITHOUT a window
  * sort.
  *
  * The window formulation (`row_number over (partition by g order by
  * o)`) sorts every group completely — a hot key with 10⁹ rows sorts
  * 10⁹ rows to keep 3. This operator keeps a bounded k-heap per group
  * per partition instead: memory O(groups·k), time O(n log k), and the
  * only exchange is the clustering the operator itself declares via
  * `requiredChildDistribution` (Spark inserts exactly one hash
  * shuffle — or none if the child is already clustered, e.g. bucketed
  * tables).
  *
  * Rows whose order value is null are excluded — the contract is
  * top-k over non-null order values (the window equivalent with
  * `WHERE o IS NOT NULL`).
  *
  * When `rankAttr` is set the operator also emits the per-group rank
  * (1 = best) as an extra long column — the heap drain already yields
  * rows best-first per group, so the rank is free and the
  * `row_number()` window (a full per-group sort) is never needed even
  * to NUMBER the winners.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    orderExpr: Expression,
    k: Int,
    child: SparkPlan,
    rankAttr: Option[Attribute] = None) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val ordering = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
    child.execute().mapPartitions { rows =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      val orderEval = UnsafeProjection.create(Seq(orderExpr), childOutput)
      // min-heap of size k per group: root = weakest survivor
      implicit val heapOrd: Ordering[(Any, UnsafeRow)] =
        Ordering.fromLessThan((a, b) => ordering.gt(a._1, b._1))
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[(Any, UnsafeRow)]]
      rows.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.getOrElseUpdate(
          key.copy(), mutable.PriorityQueue.empty[(Any, UnsafeRow)])
        // copy non-primitive order values: the projection reuses its
        // buffer, so structs/strings/arrays/maps would alias the latest
        // row (Decimal needs no copy — row accessors return fresh
        // instances)
        val v = orderEval(row).get(0, orderExpr.dataType) match {
          case u: UnsafeRow => u.copy()
          case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
          case other => other
        }
        // a null order value never enters the heap: the operator's
        // contract is top-k over NON-NULL order values (the window
        // equivalent with `WHERE o IS NOT NULL`); the interpreted
        // ordering has no null comparator
        if (v == null) ()
        else if (heap.size < k) {
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        } else if (ordering.gt(v, heap.head._1)) {
          heap.dequeue()
          heap.enqueue((v, row.asInstanceOf[UnsafeRow].copy()))
        }
      }
      val rankProj = rankAttr.map(_ => UnsafeProjection.create(output, output))
      heaps.iterator.flatMap { case (_, heap) =>
        val drained = mutable.ArrayBuffer.empty[UnsafeRow]
        while (heap.nonEmpty) drained += heap.dequeue()._2
        rankProj match {
          case None =>
            drained.reverseIterator.map(r => r.asInstanceOf[InternalRow])
          case Some(proj) =>
            // drain order reversed = best-first, so the index IS the rank
            val joined = new JoinedRow
            drained.reverseIterator.zipWithIndex.map { case (r, i) =>
              proj(joined(r, InternalRow(i + 1L))).asInstanceOf[InternalRow]
            }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, rank) =>
      TopKPerGroupExec(g, o, k, planLater(child), rank) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Register the strategy (idempotent) and build the operator. */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderCol: Column, k: Int): DataFrame =
    build(df, groupCols, orderCol, k, rankName = None)

  /** [[perGroup]] plus a native long rank column (`rankName`, 1 = best
    * by `orderCol` descending-struct order) — the full replacement for
    * the `row_number().over(Window.partitionBy(g).orderBy(o))` pattern
    * with none of its per-group full sort.
    */
  def perGroupRanked(
      df: DataFrame, groupCols: Seq[Column], orderCol: Column, k: Int,
      rankName: String = "rnk"): DataFrame =
    build(df, groupCols, orderCol, k, rankName = Some(rankName))

  private def build(
      df: DataFrame, groupCols: Seq[Column], orderCol: Column, k: Int,
      rankName: Option[String]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val child = Bridge.logicalPlan(df)
    // resolve the Column expressions against the child plan
    val resolved = Bridge.ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.Project(
        child.output, child)) // no-op, just to reuse analysis
    val analyzed = Bridge.logicalPlan(resolved.select(groupCols :+ orderCol: _*))
    val exprs = analyzed.expressions.flatMap {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => Seq(a.child)
      case e: Expression => Seq(e)
    }
    val rankAttr = rankName.map(n => AttributeReference(n, LongType, nullable = false)())
    Bridge.ofRows(spark, TopKPerGroup(
      exprs.init.toSeq, exprs.last, k, Bridge.logicalPlan(resolved), rankAttr))
  }
}
