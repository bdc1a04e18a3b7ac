package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Session factory for the graft engine.
  *
  * Local test mode runs `local[N]` in one JVM, but every config here is
  * chosen for the 1000-executor / 100 TB target:
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  *     and dynamic broadcast conversion replace the reference's fixed
  *     `-reducers N` (cmd/controller/manager/manager.go:771-775).
  *   - shuffle.partitions is a *starting* parallelism; AQE coalesces.
  *     On a real cluster this would be set ~2-3x total cores.
  *   - UTC session timezone so timestamp semantics match the oracle.
  */
object GraftSession {
  def apply(appName: String = "graft",
            cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // fixtures carry TIMESTAMP(NANOS) parquet columns (events.ts);
      // read them as raw nanos (converted in Tables.events) instead of
      // failing the vectorized reader
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Release `cached` frames after the next completed action on this
    * session. For operators that return a LAZY result whose plan
    * references a persisted intermediate from several branches (the
    * persist is what stops N branch replays during the one action that
    * materializes the result), there is no in-function point where
    * unpersist is safe — so the release is hooked to action completion
    * instead. The first action after registration is, in the
    * build-then-run pattern every harness here uses (Bench, Verify,
    * tests), exactly the action that consumed the cache.
    *
    * If a caller interleaves an unrelated action between building and
    * running the frame, the cache is released early and the branches
    * recompute — a performance fallback, never a correctness one. The
    * failure mode this helper removes is worse: without it the persist
    * pins executor storage until session end, and a long-lived session
    * running many such queries accumulates dead cache (observed as the
    * round-6 driver-bench memory-pressure suspect).
    *
    * The listener fires only for an action whose ANALYZED plan
    * contains one of the cached frames' plans as a subtree (compared
    * canonicalized). Without that guard, an unrelated action — or an
    * eager step of the SAME operator's build, e.g. a localCheckpoint,
    * whose completion event the async listener bus may deliver after
    * registration — would release the caches before the run that
    * needs them (measured: mad_price 2.8 → 4.4 s under the unguarded
    * form — the any-next-action race replayed groupMedian's branches
    * against an already-dropped cache).
    *
    * Frames passed in ONE call share one lifecycle: the first action
    * matching ANY of them releases ALL of them — right when they are
    * consumed by the same final action (the usual case here). An
    * operator whose build runs an eager step over a subset of them
    * must not batch frames with different lifetimes; release the
    * early-consumed frame synchronously instead (madPrice does). */
  private[graft] def releaseAfterAction(spark: SparkSession,
                                        cached: DataFrame*): Unit =
    releaseWhenConsumed(spark, cached.map(_.queryExecution.analyzed.canonicalized), cached)

  /** [[releaseAfterAction]], but keyed to the RETURNED query's plan
    * instead of the cached frames' own plans. For cached frames that
    * are subtrees of OTHER registered queries too (the shared-space
    * frames of the multimodal family), the subtree match can fire on a
    * sibling query's action and drop the caches before the owning
    * query runs — this variant matches only an action whose plan
    * contains `root` (the exact composed query the caches were built
    * for), so a sibling's action passes through. */
  private[graft] def releaseAfterActionOn(spark: SparkSession,
                                          root: DataFrame,
                                          cached: DataFrame*): Unit =
    releaseWhenConsumed(spark, Seq(root.queryExecution.analyzed.canonicalized), cached)

  private def releaseWhenConsumed(spark: SparkSession,
                                  targetPlans: Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan],
                                  cached: Seq[DataFrame]): Unit = {
    val targets = targetPlans
    val listener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      // on any comparison failure err toward releasing: a leaked cache
      // outlives the session, a recompute costs one pass
      private def consumes(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(n => targets.exists(_ == n.canonicalized))
        catch { case _: Throwable => true }
      private def fire(qe: QueryExecution): Unit =
        if (consumes(qe) && done.compareAndSet(false, true)) {
          cached.foreach(df => try df.unpersist()
                               catch { case _: Throwable => () })
          try spark.listenerManager.unregister(this)
          catch { case _: Throwable => () }
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = fire(qe)
    }
    spark.listenerManager.register(listener)
  }

  /** Tune an externally-created session (Verify/Bench own the builder). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
