package graft

import org.apache.spark.sql.SparkSession

/** Single-slot (session, fixture-dir) memo for derived state that
  * several queries share — k-means centroid matrices, the interval
  * family's shared streaming pass. ONE entry is ever retained (a
  * different key evicts, never accumulates), a stopped session's
  * entry is dropped on sight (releasing the session graph rather
  * than pinning it), and `reset()` gives harnesses that must time
  * COLD runs (ScaleProbe) an explicit invalidation hook.
  *
  * Staleness contract: fixture dirs are immutable within a session
  * (the driver's own contract); regenerating data under the same
  * path requires a new session or a reset(). */
private[graft] final class SessionDirMemo[T] {
  @volatile private var slot: Option[((SparkSession, String), T)] = None

  def get(spark: SparkSession, dir: String)(compute: => T): T = synchronized {
    slot match {
      case Some((k, v)) if k == ((spark, dir)) &&
          !spark.sparkContext.isStopped => v
      case other =>
        // drop a dead session's entry even when the incoming key
        // differs — the whole point is not to pin stopped sessions
        if (other.exists(_._1._1.sparkContext.isStopped)) slot = None
        val v = compute
        slot = Some(((spark, dir), v))
        v
    }
  }

  def reset(): Unit = synchronized { slot = None }
}
