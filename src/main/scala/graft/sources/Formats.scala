package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format sources/sinks covering the reference's storage formats
  * (SURVEY §2.1): raw bytes, line text, JSON-lines (its intermediate
  * format), TSV (its final output format) — plus parquet as the
  * engine-native columnar format.
  *
  * All readers are Spark DataSource scans: splittable by
  * `spark.sql.files.maxPartitionBytes`, schema-pruned and (parquet)
  * filter-pushed by Catalyst. Writers emit one file per partition —
  * the layout that parallel readers expect at scale.
  */
object Formats {

  /** Line-oriented text (the reference's map input, line-aligned). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Whole files as (path, modificationTime, length, content) binary
    * rows — the multimodal ingestion path. */
  def readBinary(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)

  /** JSON-lines with explicit schema; malformed lines land in
    * `_corrupt_record` instead of failing the job (PERMISSIVE — the
    * reference skipped undecodable lines, SURVEY P4). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** TSV with header-less `key\tvalue` layout (reference final output). */
  def readTsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("sep", "\t").csv(path)

  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("sep", "\t").csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** ORC — the second columnar format (predicate pushdown, column
    * pruning, and splittable stripes like parquet) for interop with
    * Hive-era lakes. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Bucketed managed table: pre-shuffles data by `key` into `buckets`
    * files per partition so subsequent equi-joins/aggregations on the
    * key are exchange-free — the co-located-join layout for repeated
    * large-large joins at scale. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
