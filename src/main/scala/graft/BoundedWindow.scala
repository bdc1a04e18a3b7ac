package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Window spec for global windows over PROVABLY BOUNDED frames.
  *
  * A handful of operators legitimately rank or prefix-sum a frame
  * whose size is bounded by something other than the data volume — a
  * top-k head that a `limit` already shrank, a bucket summary bounded
  * by the value domain, a distinct-count frame bounded by √Σtf. A
  * bare `Window.orderBy(...)` executes those correctly (one task over
  * a tiny frame) but logs WindowExec's "No Partition Defined …
  * serious performance degradation" warning, drowning real log
  * signal and flagging intentional plans as bugs.
  *
  * Partitioning by a constant pins the exact same single-task
  * execution while DECLARING it deliberate: call sites that go
  * through here assert "this frame is bounded by construction", and
  * any remaining no-partition warning in a log is a genuine smell.
  * Never use this on a frame that scales with the input — partition
  * the window or use the bucketed-group-rank helper instead.
  */
object BoundedWindow {
  def orderBy(cols: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(cols: _*)

  /** Unordered whole-frame spec (global totals over a bounded report
    * frame) — the declared form of `Window.partitionBy()`. */
  def all: WindowSpec = Window.partitionBy(lit(0))
}
