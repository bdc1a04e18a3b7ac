package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's flagship (and only) query: word count.
  *
  * Semantics re-expressed Spark-first from the reference's plugin
  * (mapreduce/functions/wordcount.go:20-45) and controller aggregation
  * (cmd/controller/manager/manager.go:1092-1137):
  *   - tokenize on runs of non-letter/non-digit runes, drop empties,
  *     lowercase (wordcount.go:22-32);
  *   - count per token with a global merge (manager.go:1112-1118);
  *   - output sorted lexicographically on the string key
  *     (cmd/storage-node/main.go:1328-1332).
  *
  * One `groupBy("word").count()` replaces the reference's two-level
  * shuffle + controller re-sum (SURVEY §1.4.2): Spark's HashAggregateExec
  * does map-side partial aggregation (the combiner the reference lacks),
  * so at 100 TB the shuffle carries one row per (partition, word) —
  * bounded by vocabulary, not corpus size — instead of one row per token.
  */
object WordCount {
  /** Tokenizer: runs of non-letter/non-digit as separators, lowercased. */
  val TokenSep = "[^\\p{L}\\p{N}]+"

  def tokens(text: Column): Column =
    explode(split(lower(text), TokenSep))

  /** word -> count over a single string column. */
  def wordCount(text: DataFrame, textCol: String): DataFrame = {
    text.select(tokens(col(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word")
  }
}
