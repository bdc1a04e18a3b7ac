package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native backward as-of join — the whole-operator extension tier
  * (custom LogicalPlan → Strategy → SparkPlan), for the semantics the
  * built-in operators can only express as a union + window scan:
  * "for each left row, the single latest right row with the same key
  * and rightTime ≤ leftTime".
  *
  * Why an operator and not a composition: the window form must union
  * both inputs into one stream and carry every left row through a
  * running ignore-nulls window, which (a) forces both inputs through
  * one sort on the combined stream and (b) cannot prune right columns
  * until after the window. The native exec is the textbook streamed
  * merge: each side shuffles once on its OWN key, sorts (key, time)
  * within partitions, and a single forward pass pairs every left row
  * with its floor-match — no union, no window state, no re-scan.
  * Inner semantics drop left rows with no match; `isOuter = true`
  * keeps them with a null right side (the pandas merge_asof default).
  * `forward = true` flips the direction: the EARLIEST right row with
  * rightTime ≥ leftTime (ties take the smallest tiebreak), and
  * `toleranceUs` bounds the time gap in either direction.
  *
  * Determinism: ties on (key, rightTime) are broken by the required
  * `rightTiebreak` ordering (last wins ⇒ max tiebreak), so the result
  * is unique however the data is partitioned.
  *
  * Distribution/ordering contracts mirror a shuffled join's, so
  * EnsureRequirements co-partitions and sorts the children; at 100 TB
  * this is exactly one hash shuffle per side (AQE-coalesced), state is
  * one buffered right row per partition, and the merge is O(|L|+|R|).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTiebreak: Expression, isOuter: Boolean,
                        toleranceUs: Option[Long], forward: Boolean)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Column-API surface: build the logical node against two analyzed
    * frames (pass resolved columns, i.e. `df.col(...)`). Registers the
    * planner strategy on the session idempotently, so it works on
    * sessions whose builder graft doesn't own. */
  def dataset(left: DataFrame, right: DataFrame,
              leftKey: Column, rightKey: Column,
              leftTime: Column, rightTime: Column,
              rightTiebreak: Column, isOuter: Boolean = false,
              toleranceUs: Option[Long] = None,
              forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      AsOfJoinPlan(
        left.queryExecution.analyzed, right.queryExecution.analyzed,
        ColumnShim.expression(leftKey), ColumnShim.expression(rightKey),
        ColumnShim.expression(leftTime), ColumnShim.expression(rightTime),
        ColumnShim.expression(rightTiebreak), isOuter, toleranceUs,
        forward))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, outer, tol, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, outer, tol, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTiebreak: Expression, isOuter: Boolean,
                        toleranceUs: Option[Long], forward: Boolean,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  // tolerance subtracts raw time values: only meaningful for the
  // long-backed time types (timestamps eval to epoch micros)
  toleranceUs.foreach { _ =>
    require(leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType]
        || leftTime.dataType.isInstanceOf[org.apache.spark.sql.types.LongType],
      s"as-of tolerance requires a timestamp/long time column, got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    if (isOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // same contract as a shuffled equi-join: cluster each child by its
  // key; EnsureRequirements makes the two hash partitionings compatible
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lKeyE = leftKey
    val rKeyE = rightKey
    val lTimeE = leftTime
    val rTimeE = rightTime
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lKeyE, lOut)
      val rKey = BindReferences.bindReference(rKeyE, rOut)
      val lTime = BindReferences.bindReference(lTimeE, lOut)
      val rTime = BindReferences.bindReference(rTimeE, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lKeyE.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lTimeE.dataType)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, lOut ++ rOut)

      // single forward pass; rows are copied on read because the
      // upstream iterators reuse their row objects
      var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var matchRow: InternalRow = null
      var matchKey: Any = null
      var matchTime: Any = null
      def advanceRight(): Unit =
        rHead = if (rIter.hasNext) rIter.next().copy() else null

      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.size)
      def emit(l: InternalRow, r: InternalRow): Iterator[InternalRow] = {
        numOutputRows += 1
        Iterator.single(project(joined(l, r)))
      }
      def miss(l: InternalRow): Iterator[InternalRow] =
        if (isOuter) emit(l, nullRight) else Iterator.empty

      lIter.flatMap { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        if (lk == null || lt == null) miss(l)
        else if (!forward) {
          // BACKWARD (floor): consume right rows up to (lk, lt]; the
          // last consumed row with the same key is the latest rt ≤ lt
          var done = false
          while (!done && rHead != null) {
            val rk = rKey.eval(rHead)
            if (rk == null) advanceRight()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) advanceRight()
              else if (c == 0) {
                val rt = rTime.eval(rHead)
                if (rt == null) advanceRight() // null time: never a floor
                else if (timeOrd.compare(rt, lt) <= 0) {
                  matchRow = rHead
                  matchKey = rk
                  matchTime = rt
                  advanceRight()
                } else done = true
              } else done = true
            }
          }
          val inTol = matchRow != null && toleranceUs.forall(tol =>
            lt.asInstanceOf[Long] - matchTime.asInstanceOf[Long] <= tol)
          if (matchRow != null && inTol && keyOrd.compare(matchKey, lk) == 0)
            emit(l, matchRow)
          else miss(l)
        } else {
          // FORWARD (ceiling): advance past rt < lt and pause — the
          // paused head is the earliest rt ≥ lt. It is NOT consumed:
          // later (time-ascending) probes of the same key may match
          // it too. Skipping rt < lt is safe for those probes for the
          // same reason.
          var done = false
          while (!done && rHead != null) {
            val rk = rKey.eval(rHead)
            if (rk == null) advanceRight()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) advanceRight()
              else if (c == 0) {
                val rt = rTime.eval(rHead)
                if (rt == null) advanceRight()
                else if (timeOrd.compare(rt, lt) < 0) advanceRight()
                else done = true
              } else done = true
            }
          }
          val ok = rHead != null && {
            val rk = rKey.eval(rHead)
            rk != null && keyOrd.compare(rk, lk) == 0 && {
              val rt = rTime.eval(rHead)
              rt != null && toleranceUs.forall(tol =>
                rt.asInstanceOf[Long] - lt.asInstanceOf[Long] <= tol)
            }
          }
          if (ok) emit(l, rHead) else miss(l)
        }
      }
    }
  }
}
