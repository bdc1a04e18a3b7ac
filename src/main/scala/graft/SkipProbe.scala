package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Data-skipping probe for the z-order layout: measures WHY
  * [[graft.operators.Layout.zorderWriteLineitem]] exists — how many
  * files a min/max-stats-based scan planner (a lakehouse file index,
  * or parquet's own row-group footer check) must read for a selective
  * TWO-dimensional predicate, on the z-ordered layout vs an
  * unclustered write of the same rows into the same file count.
  *
  * The per-file (min, max) of each key is computed from the data
  * itself (grouped by `input_file_name()`) — these extremes are
  * exactly what the parquet footer records, so "predicate box
  * intersects the file's min/max box" is the file-skipping decision
  * without depending on any reader's internal pruning telemetry. The
  * probe also times the filtered scan on both layouts (row-group
  * pruning shows up as wall clock) and asserts both layouts return
  * the identical matching row count.
  *
  * Usage: runMain graft.SkipProbe [sfDir] [workDir]
  * (SPARK_GRAFT_SCALE_FACTOR, default 10, like ScaleProbe; reuses its
  * scaled fixture build.) Prints one JSON line.
  */
object SkipProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val work = if (args.length > 1) args(1) else s"/tmp/graft_scale$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    ScaleProbe.buildScaled(spark, sfDir, work, factor)

    val nFiles = 64
    val outZ = s"/tmp/graft_skip/f$factor/z"
    val outF = s"/tmp/graft_skip/f$factor/flat"
    graft.operators.Layout.zorderWriteLineitem(spark, work, outZ, nFiles)
    val li = Tables.lineitem(spark, work)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    // the unclustered twin: identical rows, identical file count, the
    // arrival order a plain ingest would leave — the layout is the ONLY
    // variable (a round-robin exchange, so every file spans ~the full
    // key range of both dimensions, the typical un-curated table state)
    li.repartition(nFiles).write.mode("overwrite").parquet(outF)

    // selective 2-D predicate: the lowest 1/16 of each key's range —
    // ~1/256 of the key plane, the "one part family at one supplier
    // region" shape 100 TB scans actually run
    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    val (pmin, pmax, smin, smax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val pHi = pmin + (pmax - pmin) / 16
    val sHi = smin + (smax - smin) / 16
    def pred(c: org.apache.spark.sql.DataFrame) =
      c.filter(col("l_partkey").between(pmin, pHi) &&
        col("l_suppkey").between(smin, sHi))

    // files a footer-stats planner must read: predicate box intersects
    // the file's (min,max)×(min,max) box
    def filesHit(path: String): (Int, Int) = {
      val boxes = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .collect()
      val hit = boxes.count { r =>
        !(r.getAs[Long]("p1") < pmin || r.getAs[Long]("p0") > pHi ||
          r.getAs[Long]("s1") < smin || r.getAs[Long]("s0") > sHi)
      }
      (hit, boxes.length)
    }
    val (zHit, zTot) = filesHit(outZ)
    val (fHit, fTot) = filesHit(outF)

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def scan(path: String): (Long, Double) = {
      var n = 0L
      val t = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        time { n = pred(spark.read.parquet(path)).count() }
      }.min
      (n, t)
    }
    val (zn, zt) = scan(outZ)
    val (fn2, ft) = scan(outF)
    require(zn == fn2, s"layouts disagree on matching rows: $zn vs $fn2")

    println(f"""{"probe":"zorder_skip","factor":$factor,"files":$nFiles,""" +
      f""""match_rows":$zn,"z_files_hit":$zHit,"z_files":$zTot,""" +
      f""""flat_files_hit":$fHit,"flat_files":$fTot,""" +
      f""""z_frac":${zHit.toDouble / zTot}%.3f,""" +
      f""""flat_frac":${fHit.toDouble / fTot}%.3f,""" +
      f""""z_scan_s":$zt%.2f,"flat_scan_s":$ft%.2f}""")
    spark.stop()
  }
}
