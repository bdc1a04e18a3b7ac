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
    // ERROR, not WARN: the run recorder keeps only the last ~2000 chars
    // of output, and planner WARNs (e.g. WindowExec's single-partition
    // notice on intentionally-tiny bounded frames) would crowd out the
    // one parseable JSON line.
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)

    // warmup: exercise parquet scan + shuffle + codegen paths once
    SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    // min of N iterations per query: one GC pause / noisy-neighbor
    // spike shouldn't masquerade as a plan regression
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // dev loop: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
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
    def fmt(s: Double) = BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val best = results.map { case (k, ts) => (k, if (ts.nonEmpty) ts.min else -1.0) }
    val failed = results.filter(_._2.isEmpty).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2.minOption).sum

    // Full per-query detail goes to stderr (and a file) for local
    // analysis; the stdout JSON line must stay SHORT. The harness that
    // records this run keeps only the last ~2000 characters of stdout,
    // so a map with every query would get its head truncated and fail
    // to parse (observed in round 2). The stdout line therefore carries
    // the slowest queries up to a character budget — the omitted ones
    // are the sub-second tail — plus the all-queries total.
    val fullQs = best.map { case (k, s) => "\"" + k + "\":" + fmt(s) }
      .mkString("{", ",", "}")
    // file only — sbt's logger echoes BOTH stdout and stderr into the
    // captured stream, so a console copy of the full line would land in
    // the tail window and crowd out the parseable compact line
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$fullQs,"failed":$failed,"iterations":$iterations,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("target/bench_full.json"),
      fullLine.getBytes("UTF-8"))
    catch { case _: Throwable => () }

    val budget = 1500 // chars for the queries map on the stdout line
    val entries = best.sortBy(-_._2).map { case (k, s) => "\"" + k + "\":" + fmt(s) }
    val shown = scala.collection.mutable.ArrayBuffer[String]()
    var used = 0
    entries.foreach { e =>
      if (used + e.length + 1 <= budget) { shown += e; used += e.length + 1 }
    }
    val qs = shown.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failed,"iterations":$iterations,"sf":"$sfDir","queries_run":${best.size},"queries_shown":${shown.size}}""")
    spark.stop()
  }
}
