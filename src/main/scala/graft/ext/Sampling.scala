package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling for training-data curation.
  *
  * Random sampling (`df.sample`) is the wrong tool in a 100 TB
  * pipeline: it's nondeterministic across retries (a recomputed
  * partition resamples differently), unstable across runs (no way to
  * reproduce yesterday's training mix), and uncoordinated across
  * tables (can't take the SAME 1% of docs and their embeddings).
  * Hash-based sampling fixes all three: the keep/drop decision is a
  * pure function of the row key and a named salt, so it is
  * reproducible, retry-safe, and consistent across any table keyed by
  * the same id. Changing the salt draws an independent sample.
  *
  * Both operators are single codegen'd projections (plus a bounded
  * per-stratum group limit for the stratified form) — no shuffle for
  * bernoulli, one for the stratified rank.
  */
object Sampling {

  /** Versioned salt: name the sample so pipelines can pin or rotate
    * draws explicitly. */
  val SampleSalt = "graft-sample-v1"

  /** 32-bit sample hash of an id: first 8 md5 hex chars of
    * "salt:id" as an integer — uniform on [0, 2^32), identical in any
    * engine that can md5 a string (same recipe as the dedup token
    * hash, so oracle parity is exact). */
  def sampleHash(id: Column): Column =
    conv(substring(md5(concat(lit(SampleSalt + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  private def sampleHashSql(idExpr: String): String =
    s"CAST(concat('0x', substr(md5('$SampleSalt:' || $idExpr), 1, 8)) AS BIGINT)"

  /** Bernoulli sample at `rate`: keep iff hash < rate·2^32. Exact
    * integer threshold — no float comparison ambiguity. */
  def bernoulliSample(spark: SparkSession, dir: String,
                      rate: Double = 0.1): DataFrame = {
    val threshold = (rate * 4294967296L).toLong
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        sampleHash(col("doc_id")).as("sample_hash"))
      .filter(col("sample_hash") < threshold)
      .orderBy("doc_id")
  }

  def bernoulliSampleOracle: String = bernoulliSampleOracle(0.1)

  def bernoulliSampleOracle(rate: Double): String = {
    val threshold = (rate * 4294967296L).toLong
    s"""SELECT doc_id, lang, source, n_chars, sample_hash
       |FROM (SELECT doc_id, lang, source, n_chars,
       |        ${sampleHashSql("doc_id")} AS sample_hash
       |      FROM documents) t
       |WHERE sample_hash < $threshold
       |ORDER BY doc_id""".stripMargin
  }

  /** Stratified fixed-size sample: the `n` smallest sample hashes per
    * stratum — a deterministic, reproducible reservoir. Spark 4 plans
    * the rank filter as a partial WindowGroupLimit: every input
    * partition pre-limits to n rows per stratum BEFORE the exchange,
    * so a billion-doc stratum ships at most n rows per upstream
    * partition, not the stratum. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       n: Int = 20): DataFrame = {
    val w = Window.partitionBy("source").orderBy("sample_hash", "doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        sampleHash(col("doc_id")).as("sample_hash"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .orderBy("source", "rk")
  }

  def stratifiedSampleOracle: String = stratifiedSampleOracle(20)

  def stratifiedSampleOracle(n: Int): String =
    s"""SELECT doc_id, source, sample_hash, rk
       |FROM (SELECT doc_id, source, sample_hash,
       |        CAST(row_number() OVER (PARTITION BY source
       |               ORDER BY sample_hash, doc_id) AS BIGINT) AS rk
       |      FROM (SELECT doc_id, source,
       |              ${sampleHashSql("doc_id")} AS sample_hash
       |            FROM documents) h) r
       |WHERE rk <= $n
       |ORDER BY source, rk""".stripMargin
}
