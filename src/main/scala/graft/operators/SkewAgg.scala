package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage ("salted") aggregation for skewed group keys.
  *
  * Map-side partial aggregation already bounds shuffle volume for
  * algebraic aggregates, but a single reducer still owns each key's
  * final merge — a problem when one key dominates a 100 TB input AND
  * the per-key state is expensive (large collect sets, sketches).
  * Salting splits each key into `buckets` sub-groups aggregated in
  * parallel, then merges the partials in a second (tiny) aggregation.
  *
  * Only valid for mergeable aggregates; count/sum shown here.
  */
object SkewAgg {

  /** count + decimal-exact sum per key, computed as salted partials
    * then merged. Result is identical to a direct groupBy.
    *
    * The salt is derived from ROW CONTENT (hash of every column), never
    * from rand()/monotonically_increasing_id(): a nondeterministic
    * expression feeding a shuffle re-salts rows on task retry while
    * surviving reducer output is reused — the classic double-count /
    * drop hazard (same rationale as SkewJoin's deterministic salt).
    * Fully identical rows share a bucket, so a key whose skew comes
    * from one exact row repeated N times won't split further — callers
    * with such data should pass a disambiguator column in `df`. */
  def saltedCountSum(df: DataFrame, key: String, value: Column,
                     buckets: Int = 16): DataFrame = {
    df
      .withColumn("__salt", pmod(hash(df.columns.map(col).toSeq: _*), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }
}
