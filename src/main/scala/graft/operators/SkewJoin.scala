package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles most
  * skew at runtime; salting is the explicit tool when one build-side
  * key dominates so heavily that even split shuffle partitions overload
  * (the classic "null key / whale customer" case at 100 TB).
  *
  * Mechanics: the skewed (large, probe) side gets a random-but-
  * deterministic salt in [0, buckets); the small side is replicated
  * `buckets` times with an exploded salt column; the join key becomes
  * (key, salt), spreading each hot key over `buckets` reducers. Result
  * rows are identical to the unsalted join.
  */
object SkewJoin {

  /** Deterministic per-row salt: stable hash of the whole row's key
    * column plus a disambiguator — avoids rand() so results are
    * reproducible and retries are consistent. */
  private def salt(key: Column, disambig: Column, buckets: Int): Column =
    pmod(hash(key, disambig), lit(buckets))

  /** Inner equi-join `large ⋈ small` on `key`, salted `buckets` ways.
    * `disambig` should be any column (or combination) that varies
    * within a key group on the large side (e.g. a row id). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 disambig: String, buckets: Int = 8): DataFrame = {
    val l = large.withColumn("__salt", salt(col(key), col(disambig), buckets))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(s, l(key) === s(key) && l("__salt") === s("__salt"))
      .drop(s(key)).drop(l("__salt")).drop(s("__salt"))
  }
}
