package graft

import org.apache.spark.sql.SparkSession

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

  /** Tune an externally-created session (Verify/Bench own the builder). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
