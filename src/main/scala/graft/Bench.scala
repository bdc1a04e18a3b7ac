package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries are materialized through the `noop` sink so the full plan
  * (all columns, all operators) executes — `count()` would let Catalyst
  * prune work that a real consumer pays for. A small warmup query runs
  * first so JVM/codegen startup cost isn't billed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    // warmup: exercise parquet scan + shuffle + codegen paths once
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    // min of N iterations per query: one GC pause / noisy-neighbor
    // spike shouldn't masquerade as a plan regression
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iterations).flatMap { _ =>
        // drop cached intermediates between runs: CacheManager matches
        // re-built plans by canonical form, so a warm iteration would
        // measure the cache, not the plan
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      (name, times)
    }
    // a failed query must not masquerade as a fast one: report -1
    val qs = results.map { case (k, ts) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) ts.min else -1.0)
    }.mkString("{", ",", "}")
    val failed = results.filter(_._2.isEmpty).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.minOption).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"iterations":$iterations,"sf":"$sfDir"}""")
    spark.stop()
  }
}
