package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-dimensional data layout: Z-order (Morton) interleaving.
  *
  * A 100 TB table is usually filtered on more than one column
  * (part AND supplier, time AND user). Sorting by one key clusters
  * only that key; sorting by the Morton code of two keys clusters
  * BOTH, so min/max footer statistics prune files for predicates on
  * either dimension — the standard multi-dim data-skipping layout
  * (used by several lakehouse table formats).
  *
  * The interleave is pure integer bit arithmetic (shift/mask spread,
  * no loops, no UDF) — a codegen'd projection. The production write
  * path is `repartitionByRange(zkey).sortWithinPartitions(zkey)` then
  * a parquet write: one range shuffle, after which every file covers
  * a tight (partkey, suppkey) rectangle. The query form emits the
  * code and the layout rank so the oracle can verify the exact
  * interleave and total order.
  */
object Layout {

  /** Spread the low 31 bits of `c` to even bit positions 0,2,…,60
    * (classic shift-mask ladder, 64-bit). 31 bits per dimension keeps
    * the interleaved code inside a positive signed long, so distinct
    * keys up to 2^31−1 never alias — at 100 TB key ranges far exceed
    * 16 bits, where a narrower mask would silently degrade clustering
    * to key-mod-65536. Works identically in any engine with 64-bit
    * integer shifts — the oracle mirrors each step. */
  private def spread(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(2147483647L))         // 0x7FFFFFFF
    val x1 = (x0.bitwiseOR(shiftleft(x0, 16))).bitwiseAND(lit(281470681808895L))    // 0x0000FFFF0000FFFF
    val x2 = (x1.bitwiseOR(shiftleft(x1, 8))).bitwiseAND(lit(71777214294589695L))   // 0x00FF00FF00FF00FF
    val x3 = (x2.bitwiseOR(shiftleft(x2, 4))).bitwiseAND(lit(1085102592571150095L)) // 0x0F0F0F0F0F0F0F0F
    val x4 = (x3.bitwiseOR(shiftleft(x3, 2))).bitwiseAND(lit(3689348814741910323L)) // 0x3333333333333333
    (x4.bitwiseOR(shiftleft(x4, 1))).bitwiseAND(lit(6148914691236517205L))          // 0x5555555555555555
  }

  /** Morton code of two 31-bit keys: a's bits on even positions, b's
    * on odd. */
  def mortonCode(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Z-order layout of lineitem by (l_partkey, l_suppkey): the Morton
    * key plus the global layout rank a range-partitioned writer would
    * realize. The rank is computed the scale-safe way (range sort, no
    * single-partition window — same shape as docLengthDeciles). */
  def zorderLineitem(spark: SparkSession, dir: String): DataFrame = {
    val coded = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        mortonCode(col("l_partkey"), col("l_suppkey")).as("zkey"))
    // deterministic total order: zkey then the (orderkey, linenumber)
    // pk; rank via zipWithIndex over the range-sorted rows — a global
    // row_number window would funnel everything into one partition
    val sorted = coded.repartitionByRange(col("zkey"), col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("zkey"), col("l_orderkey"), col("l_linenumber"))
    val schema = sorted.schema.add("layout_rank", "long")
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
      .filter(col("layout_rank") <= 2000)
      .orderBy("layout_rank")
  }

  /** Realize the z-order layout as a parquet write with NO global
    * total sort — the production path the [[zorderLineitem]] scaladoc
    * names, shipped and spec-verified (FormatsSpec) rather than
    * claimed: `repartitionByRange(zkey)` is a sampling-based range
    * exchange (each task owns a contiguous zkey slice — one shuffle,
    * no driver-side ordering), `sortWithinPartitions` orders each
    * slice locally, and the write emits one file per slice. Every
    * file then covers a tight, non-overlapping zkey interval — i.e. a
    * small union of (partkey, suppkey) rectangles — so parquet
    * footer min/max statistics prune files/row-groups for predicates
    * on EITHER dimension; a single-key sort clusters only its own
    * key. At 100 TB the same plan holds: the range exchange is the
    * only data movement, parallel in both width and depth, where the
    * rank-emitting query form pays a zipWithIndex pass (20.7× at the
    * 100× probe — linear but sort-bound; the write path needs no
    * rank at all).
    *
    * Unlike the raw-key query form, the write NORMALIZES each column
    * to a 16-bit range space before interleaving (equi-width over the
    * column's min/max; lakehouse z-order implementations use
    * range-partition ids the same way): raw interleave puts each
    * key's information at its own magnitude's bit positions, so two
    * columns with skewed ranges (partkey ≫ suppkey here) degenerate
    * into a partkey-only sort — the narrow column's high bits are
    * constant zero and never influence file boundaries. After
    * normalization both dimensions contribute to every split level
    * and per-file footer min/max stay tight on BOTH (spec-verified:
    * FormatsSpec counts how many files a point predicate's footer
    * check can skip). Returns the written file count. */
  def zorderWriteLineitem(spark: SparkSession, dir: String,
                          out: String, numFiles: Int = 16): Int = {
    val bits = 16
    def bucket(c: Column, cmin: Column, cmax: Column): Column =
      least(lit((1L << bits) - 1),
        floor((c - cmin).cast("double") / (cmax - cmin + 1) * (1L << bits))
          .cast("long"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val bounds = li.agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
      min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
    li.crossJoin(broadcast(bounds))
      .withColumn("zkey", mortonCode(
        bucket(col("l_partkey"), col("pmin"), col("pmax")),
        bucket(col("l_suppkey"), col("smin"), col("smax"))))
      .drop("pmin", "pmax", "smin", "smax")
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(out)
    // count through Spark's own filesystem abstraction — the write
    // accepts any URI (s3://, hdfs://), so the count must too
    spark.read.parquet(out).inputFiles.length
  }

  // ── size-tiered small-file compaction planner ──

  val SmallFileBytes = 300L
  val TargetBytes = 1024L

  /** Small-file compaction plan over a file manifest — the maintenance
    * pass a lake table (Iceberg/Delta `OPTIMIZE` binpack) runs to keep
    * scan task counts proportional to bytes, not file count. Files at
    * or above [[SmallFileBytes]] pass through untouched (`keep`: one
    * output per input, rewrite cost zero); files below it are
    * quota-packed per directory in file-id order into
    * [[TargetBytes]]-sized outputs (`compact`: bin =
    * ⌊start_offset/target⌋ over the running byte sum — the same
    * deterministic offset packing [[graft.ext.TextAnalysis.docPack]]
    * uses for token budgets, here applied to the bytes domain). Each
    * output row is one planned output file with its input count, byte
    * total, and fill ratio.
    *
    * The local stand-in manifest is the documents table (file_id =
    * doc_id, directory = source, bytes = n_chars). At 100 TB the real
    * input is the table's file-level metadata — rows = FILES, millions
    * not billions, a metadata-scale frame — and the per-directory
    * window parallelizes across directories exactly like docPack's
    * per-source packing. The plan itself never touches data bytes;
    * executing it is a rewrite job whose output sizes this plan
    * already bounds. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id").as("file_id"),
        col("n_chars").as("bytes"))
    val keep = files.filter(col("bytes") >= SmallFileBytes)
      .select(col("source"), lit("keep").as("action"),
        col("file_id").as("out_id"), lit(1L).as("n_inputs"),
        col("bytes").as("in_bytes"))
    val w = Window.partitionBy("source").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val compact = files.filter(col("bytes") < SmallFileBytes)
      .withColumn("start_offset", sum(col("bytes")).over(w) - col("bytes"))
      .withColumn("out_id",
        floor(col("start_offset") / lit(TargetBytes.toDouble)).cast("long"))
      .groupBy("source", "out_id")
      .agg(count(lit(1)).as("n_inputs"), sum("bytes").as("in_bytes"))
      .select(col("source"), lit("compact").as("action"), col("out_id"),
        col("n_inputs"), col("in_bytes"))
    keep.unionByName(compact)
      .withColumn("fill_pct",
        round(col("in_bytes").cast("double") / TargetBytes, 6))
      .orderBy("source", "action", "out_id")
  }

  def compactionPlanOracle: String =
    s"""WITH f AS (SELECT source, doc_id AS file_id, n_chars AS bytes
       |           FROM documents),
       |keep AS (SELECT source, 'keep' AS action, file_id AS out_id,
       |    CAST(1 AS BIGINT) AS n_inputs, bytes AS in_bytes
       |  FROM f WHERE bytes >= $SmallFileBytes),
       |small AS (SELECT source, file_id, bytes,
       |    SUM(bytes) OVER (PARTITION BY source ORDER BY file_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bytes
       |      AS start_offset
       |  FROM f WHERE bytes < $SmallFileBytes),
       |comp AS (SELECT source, 'compact' AS action,
       |    CAST(FLOOR(start_offset / $TargetBytes.0) AS BIGINT) AS out_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_inputs,
       |    CAST(SUM(bytes) AS BIGINT) AS in_bytes
       |  FROM small GROUP BY 1, 2, 3)
       |SELECT source, action, out_id, n_inputs, in_bytes,
       |  round(CAST(in_bytes AS DOUBLE) / $TargetBytes, 6) AS fill_pct
       |FROM (SELECT * FROM keep UNION ALL SELECT * FROM comp) u
       |ORDER BY source, action, out_id""".stripMargin

  // ── clustering-depth metric (how sorted is the table on a key?) ──

  val DepthFiles = 64

  /** Clustering depth of a file layout on a key — the metadata metric
    * lake warehouses expose (Snowflake `SYSTEM$CLUSTERING_DEPTH`,
    * Iceberg/Delta file-stats overlap) to decide WHEN a re-cluster /
    * z-order rewrite pays for itself: for each file's [min,max] key
    * range, how many files' ranges cover its start point. Depth 1 =
    * perfectly sorted (every key lives in exactly one file ⇒ min/max
    * pruning reads one file); depth ≈ n_files = hash-scattered (every
    * range overlaps every other ⇒ pruning reads everything). Computed
    * for BOTH layouts of the same rows — `hash` (file =
    * o_orderkey mod [[DepthFiles]]) and `sorted` (file = ntile over
    * o_orderdate order) — so the metric itself demonstrates it
    * discriminates: ~[[DepthFiles]] vs ~1 on identical data.
    *
    * The depth sweep is the endpoint-delta trick, not interval
    * pairing: +1 at each file's min date, −1 the day after its max,
    * one running sum per layout ordered by date = depth after each
    * event point ('the day after' because footer ranges are
    * inclusive). No file×file join exists at any scale; after the
    * manifest aggregate (one pass over the table, n_files rows out)
    * everything operates on ≤ 2·n_files event rows — at 100 TB the
    * manifest comes straight from parquet footers / table metadata
    * and the data is never scanned at all. (The global ntile window
    * below exists only to FABRICATE the sorted stand-in manifest from
    * row data at gate scale — a real table's file ranges are read,
    * not computed; the production sorted layout is
    * `repartitionByRange.sortWithinPartitions` as in [[zorderWrite]],
    * which never funnels rows through one partition.) */
  def clusteringDepth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
    val hashed = o.select(lit("hash").as("layout"),
      pmod(col("o_orderkey"), lit(DepthFiles)).cast("long").as("file_id"),
      col("o_orderdate").cast("date").as("d"))
    val sorted = o.select(lit("sorted").as("layout"),
      // gate-scale manifest FABRICATION (see scaladoc above): declared
      // bounded — a real table's ranges come from parquet footers
      (ntile(DepthFiles).over(graft.BoundedWindow.orderBy(col("o_orderdate"),
        col("o_orderkey"))) - 1).cast("long").as("file_id"),
      col("o_orderdate").cast("date").as("d"))
    val manifest = hashed.unionByName(sorted)
      .groupBy("layout", "file_id")
      .agg(min("d").as("min_d"), max("d").as("max_d"))
    val events = manifest.select(col("layout"), col("min_d").as("p"),
        lit(1L).as("delta"), lit(1L).as("n_starts"))
      .unionByName(manifest.select(col("layout"),
        date_add(col("max_d"), 1).as("p"),
        lit(-1L).as("delta"), lit(0L).as("n_starts")))
      .groupBy("layout", "p")
      .agg(sum("delta").as("delta"), sum("n_starts").as("n_starts"))
    val wl = Window.partitionBy("layout").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.withColumn("depth", sum("delta").over(wl))
      .groupBy("layout")
      .agg(max("depth").as("max_depth"),
        round(sum(col("depth") * col("n_starts")).cast("double") /
          sum("n_starts"), 6).as("avg_start_depth"),
        sum("n_starts").as("n_files"))
      .select(col("layout"), col("n_files"), col("max_depth"),
        col("avg_start_depth"))
      .orderBy("layout")
  }

  def clusteringDepthOracle: String =
    s"""WITH rows_both AS (
       |  SELECT 'hash' AS layout,
       |    CAST(o_orderkey % $DepthFiles AS BIGINT) AS file_id,
       |    CAST(o_orderdate AS DATE) AS d FROM orders
       |  UNION ALL
       |  SELECT 'sorted' AS layout,
       |    CAST(ntile($DepthFiles) OVER (ORDER BY o_orderdate, o_orderkey)
       |      - 1 AS BIGINT) AS file_id,
       |    CAST(o_orderdate AS DATE) AS d FROM orders),
       |manifest AS (SELECT layout, file_id, MIN(d) AS min_d, MAX(d) AS max_d
       |  FROM rows_both GROUP BY layout, file_id),
       |ev AS (SELECT layout, p, CAST(SUM(delta) AS BIGINT) AS delta,
       |    CAST(SUM(n_starts) AS BIGINT) AS n_starts
       |  FROM (
       |    SELECT layout, min_d AS p, 1 AS delta, 1 AS n_starts FROM manifest
       |    UNION ALL
       |    SELECT layout, max_d + 1 AS p, -1 AS delta, 0 AS n_starts
       |    FROM manifest) e
       |  GROUP BY layout, p),
       |dep AS (SELECT layout, p, n_starts,
       |    SUM(delta) OVER (PARTITION BY layout ORDER BY p
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
       |  FROM ev)
       |SELECT layout, CAST(SUM(n_starts) AS BIGINT) AS n_files,
       |  CAST(MAX(depth) AS BIGINT) AS max_depth,
       |  round(CAST(SUM(depth * n_starts) AS DOUBLE) / SUM(n_starts), 6)
       |    AS avg_start_depth
       |FROM dep GROUP BY layout ORDER BY layout""".stripMargin

  private def spreadSql(e: String): String = {
    val x0 = s"(($e) & 2147483647)"
    val x1 = s"(($x0 | ($x0 << 16)) & 281470681808895)"
    val x2 = s"(($x1 | ($x1 << 8)) & 71777214294589695)"
    val x3 = s"(($x2 | ($x2 << 4)) & 1085102592571150095)"
    val x4 = s"(($x3 | ($x3 << 2)) & 3689348814741910323)"
    s"(($x4 | ($x4 << 1)) & 6148914691236517205)"
  }

  def zorderLineitemOracle: String = {
    val z = s"(${spreadSql("l_partkey")} | (${spreadSql("l_suppkey")} << 1))"
    s"""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       |  l_partkey, l_suppkey, zkey,
       |  CAST(row_number() OVER (ORDER BY zkey, l_orderkey, l_linenumber)
       |       AS BIGINT) AS layout_rank
       |FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |        $z AS zkey FROM lineitem) t
       |QUALIFY layout_rank <= 2000
       |ORDER BY layout_rank""".stripMargin
  }
}
