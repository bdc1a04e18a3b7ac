package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection and redaction — the compliance pass every
  * training-data pipeline runs before a corpus ships (emails, phone
  * numbers, SSNs, IP addresses scrubbed or counted for the datasheet).
  *
  * Both operators are pure per-row regex projections over codegen'd
  * built-ins (`regexp_count` / chained `regexp_replace`) — no shuffle
  * except the deterministic output sort, so they scale exactly like
  * the scan: at 100 TB each parquet split is one independent map task
  * and the cost is bytes-scanned. The patterns stay inside the
  * RE2 ∩ Java-regex common subset (`\d`, `\b`, bounded repeats,
  * character classes — no backreferences, no lookaround) so the
  * DuckDB oracle matches byte-for-byte; the redaction chain applies
  * in one fixed order (SSN → phone → IP → email) so overlapping
  * matches resolve identically in both engines.
  *
  * The synthetic corpus contains no PII (the scan reports honest
  * zeros — itself the common production outcome for a pre-scrubbed
  * source), so PiiSpec drives the same column expressions over
  * constructed rows carrying every pattern, plus decoys that must NOT
  * match; the oracle gate verifies the full plumbing end-to-end.
  */
object Pii {

  /** (name, pattern, replacement) in the fixed application order.
    * SSN before phone: both are digit runs with dashes and SSN's
    * 3-2-4 shape must not be half-eaten by the 3-3-4 phone rule. */
  private[graft] val Patterns: Seq[(String, String, String)] = Seq(
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"))

  /** Per-document PII counts by type + total + flag. */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val counts = Patterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name")
    }
    val total = Patterns.map { case (name, _, _) => col(s"n_$name") }
      .reduce(_ + _)
    Tables.documents(spark, dir)
      .select(col("doc_id") +: counts: _*)
      .withColumn("n_pii", total)
      .withColumn("has_pii", col("n_pii") > 0)
      .orderBy("doc_id")
  }

  def piiScanOracle: String = {
    val counts = Patterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n       |  ")
    val total = Patterns.map { case (name, _, _) => s"n_$name" }.mkString(" + ")
    s"""WITH c AS (SELECT doc_id,
       |  $counts
       |FROM documents)
       |SELECT doc_id, n_ssn, n_phone, n_ip, n_email,
       |  ($total) AS n_pii, ($total) > 0 AS has_pii
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Redacted text per document: every PII span replaced by its typed
    * placeholder in the fixed pattern order; emits the redacted
    * length and fingerprint (md5) so the oracle hash-verifies the
    * exact redacted bytes without shipping full text twice. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val redacted = Patterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
        redacted.as("redacted"), md5(col("text")).as("orig_fp"))
      .select(col("doc_id"), col("n_chars"),
        length(col("redacted")).cast("long").as("n_chars_redacted"),
        md5(col("redacted")).as("redacted_fp"),
        // content-based, not length-based: a length-preserving
        // redaction ('a@bb.co' -> '<EMAIL>', both 7 chars) must still
        // report was_redacted = true
        (md5(col("redacted")) =!= col("orig_fp")).as("was_redacted"))
      .orderBy("doc_id")
  }

  def piiRedactOracle: String = {
    val redacted = Patterns.foldLeft("text") {
      case (e, (_, pat, repl)) => s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
    s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length($redacted) AS BIGINT) AS n_chars_redacted,
       |  md5($redacted) AS redacted_fp,
       |  md5($redacted) <> md5(text) AS was_redacted
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
