package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** Blessed materialization point for frames that later ride a FORCED
  * broadcast: `apply(df, maxRows)` localCheckpoints the frame, asserts
  * its row count against the declared bound at creation time, and tags
  * the produced RDD in a session registry.
  *
  * Why this exists: PlanSpec's broadcast-boundedness audit classifies
  * every broadcast-hinted build side structurally, but a
  * `localCheckpoint` erases plan structure into an opaque LogicalRDD.
  * Round 11 accepted LogicalRDD as "bounded by house rule" — which
  * meant any future unbounded frame laundered through a checkpoint
  * plus a hint would pass the audit silently, the exact class the
  * audit exists to catch. Now only RDDs produced HERE (count-asserted
  * ≤ maxRows) classify as bounded; a raw `localCheckpoint` + hint
  * fails the audit (negative-controlled in PlanSpec).
  *
  * The registry keys RDD ids, not plan shapes: ids are unique per
  * SparkContext, survive re-planning (the checkpointed RDD is embedded
  * in every downstream plan), and cost O(1) per lookup. Unbounded
  * growth is a non-issue — one Int per checkpoint call, driver-side.
  *
  * At 100 TB the assertion is the cheap part: every legitimate call
  * site materializes a model-sized frame (top-V vocab, k centroids, a
  * quota table), so the guard count scans ≤ maxRows rows; an
  * accidentally corpus-sized frame fails HERE, at creation, instead of
  * OOMing an executor during the broadcast build.
  */
object BoundedCheckpoint {
  private val taggedRddIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** localCheckpoint `df`, assert ≤ `maxRows` rows, tag the result as
    * audit-bounded. Eager (the checkpoint materializes immediately, as
    * every call site already relied on). */
  def apply(df: DataFrame, maxRows: Long): DataFrame = {
    require(maxRows > 0, "maxRows must be positive")
    val out = df.localCheckpoint()
    val n = out.count()
    require(n <= maxRows,
      s"boundedCheckpoint: frame has $n rows, declared bound is $maxRows " +
        "— the frame is not the model-sized table its broadcast claims")
    out.queryExecution.analyzed.foreach {
      case l: LogicalRDD => taggedRddIds.add(l.rdd.id); ()
      case _ => ()
    }
    out
  }

  /** True iff `plan` is a LogicalRDD produced (and count-asserted) by
    * [[apply]] — the only LogicalRDDs the broadcast audit accepts as
    * bounded. */
  def isTagged(plan: LogicalPlan): Boolean = plan match {
    case l: LogicalRDD => taggedRddIds.contains(l.rdd.id)
    case _ => false
  }
}
