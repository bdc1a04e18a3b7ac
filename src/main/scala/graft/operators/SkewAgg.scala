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
    * then merged. Result is identical to a direct groupBy. */
  def saltedCountSum(df: DataFrame, key: String, value: Column,
                     buckets: Int = 16): DataFrame = {
    df
      .withColumn("__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(value).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }
}
