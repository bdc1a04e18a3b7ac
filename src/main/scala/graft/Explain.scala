package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan for one query
  * (or all). Usage: runMain graft.Explain [queryName] [sfDir]
  *
  * What to look for (the 100 TB checklist):
  *   - `PushedFilters: [...]` on parquet scans — predicates reached
  *     the reader;
  *   - `ReadSchema` — only referenced columns scanned;
  *   - `BroadcastHashJoin` for dimension joins, `SortMergeJoin`/
  *     shuffled hash only on large-large;
  *   - partial aggregation (`HashAggregate(keys=..., functions=[partial_...`)
  *     before the exchange;
  *   - wide `WholeStageCodegen` spans, few `Exchange`s.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (which == "all") SparkEntry.queries.keys.toSeq.sorted
      else Seq(which)
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
