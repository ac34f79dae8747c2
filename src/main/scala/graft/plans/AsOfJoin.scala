package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** A true as-of join as a first-class operator — the tier-(c) custom
  * operator path (logical node → strategy → physical exec), for the
  * semantics Spark's built-ins can't express as a single operator: for
  * each left row, attach the LATEST right row with the same key whose
  * time is ≤ the left row's time (left-outer: null when none).
  *
  * The window-composition formulation (q27) works when both streams live
  * in one table; this operator joins two *different* relations the way a
  * feature-store / trade-quote join needs, in one pass.
  *
  * Physical strategy: both sides hash-clustered on the key and sorted by
  * (key, time) — declared via requiredChildDistribution/Ordering so
  * EnsureRequirements plans the exchanges/sorts (and elides them when the
  * data is already bucketed/sorted) — then a single forward merge per
  * partition: O(n+m), no buffering beyond one row.
  *
  * Constraints (checked by the API layer in [[graft.operators.AsOf]]):
  * key is LongType, time is TimestampType or LongType (both long-backed),
  * keys/times non-null, left/right column names disjoint.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Output rows are the left child's rows (extended) in place, so the
    * left partitioning still holds — declaring it lets EnsureRequirements
    * elide the exchange for a downstream groupBy/join on the same key
    * (data already hash-clustered on it would otherwise re-shuffle).
    */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rightWidth = right.output.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      var matchRow: InternalRow = null
      var matchKey: Long = 0L

      lIter.map { l =>
        val lk = l.getLong(lKeyIdx)
        val lt = l.getLong(lTimeIdx)
        // advance the right side up to (key, time) — single forward pass
        var continue = rBuf.hasNext
        while (continue) {
          val r = rBuf.head
          val rk = r.getLong(rKeyIdx)
          if (rk < lk || (rk == lk && r.getLong(rTimeIdx) <= lt)) {
            val consumed = rBuf.next()
            if (rk == lk) { matchRow = consumed.copy(); matchKey = rk }
            continue = rBuf.hasNext
          } else continue = false
        }
        val rightSide =
          if (matchRow != null && matchKey == lk) matchRow else nullRight
        project(joined(l, rightSide))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy turning the logical node into the exec. Registered
  * via `spark.experimental.extraStrategies` (see [[graft.operators.AsOf]])
  * or through `GraftExtensions`.
  */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
