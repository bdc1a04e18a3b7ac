package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * All pure per-row projections over codegen'd built-ins — no shuffle,
  * no UDFs — so they scale linearly with input splits: at 100 TB each
  * parquet partition is processed independently and the plan is a
  * single WholeStageCodegen map stage (plus sort only for the
  * deterministic verification output).
  */
object TextAnalysis {

  /** Tokens of a text column: split on runs of non-letter/non-digit,
    * lowercased, empties dropped — same semantics as the word-count
    * tokenizer (reference mapreduce/functions/wordcount.go:22-32). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)

  private val tokensSql =
    raw"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'), w -> w <> '')"

  // ── token counting (whitespace tokens + BPE-ish subword estimate) ──

  /** n_tokens, n_chars, and a BPE-style subword estimate: ceil(len/4)
    * per token approximates byte-pair-encoded token counts for
    * budget/packing decisions. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(ws).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_chars"),
      aggregate(ws, lit(0L),
        (acc, w) => acc + ceil(length(w) / lit(4.0)).cast("long")).as("n_subwords"))
      .orderBy("doc_id")
  }

  def tokenCountOracle: String =
    s"""SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(COALESCE(list_sum(list_transform(ws,
       |    w -> CAST(ceil(length(w)/4.0) AS BIGINT))), 0) AS BIGINT) AS n_subwords
       |FROM (SELECT doc_id, text, $tokensSql AS ws FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ── quality scoring ──

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopwordsSqlList = stopwords.map(w => s"'$w'").mkString(", ")

  /** Heuristic doc-quality features: length, lexical diversity,
    * stopword density. Ratios are single int/int IEEE divisions —
    * bit-identical across engines. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    val nTok = size(ws).cast("long")
    val nStop = size(filter(ws, w => w.isin(stopwords: _*))).cast("long")
    val nDistinct = size(array_distinct(ws)).cast("long")
    val sumLen = aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
    // ratios are NULL (not NaN) for zero-token docs — matches SQL
    // division semantics so the oracle hash-compares
    def safe(x: Column): Column = when(nTok =!= 0, x)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      safe(sumLen.cast("double") / nTok).as("avg_token_len"),
      safe(nStop.cast("double") / nTok).as("stopword_ratio"),
      safe(nDistinct.cast("double") / nTok).as("distinct_ratio"))
      .orderBy("doc_id")
  }

  def textQualityOracle: String =
    s"""SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(list_sum(list_transform(ws, w -> CAST(length(w) AS BIGINT))), 0) AS DOUBLE)
       |    / NULLIF(len(ws), 0) AS avg_token_len,
       |  CAST(len(list_filter(ws, w -> w IN ($stopwordsSqlList))) AS DOUBLE)
       |    / NULLIF(len(ws), 0) AS stopword_ratio,
       |  CAST(len(list_distinct(ws)) AS DOUBLE) / NULLIF(len(ws), 0) AS distinct_ratio
       |FROM (SELECT doc_id, text, $tokensSql AS ws FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ── language identification (marker-word heuristic) ──

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "nicht", "ist"),
    "fr" -> Seq("le", "les", "et", "une", "est"),
    "es" -> Seq("el", "los", "y", "una", "es"))

  /** Marker-word language ID: count hits per language, argmax with a
    * fixed preference order for ties, 'und' (undetermined) when no
    * marker hits. A real pipeline would use char-n-gram profiles; the
    * plan shape (pure projection) is identical. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    val scores = langMarkers.map { case (lang, ms) =>
      lang -> size(filter(ws, w => w.isin(ms: _*))).cast("long")
    }
    val Seq(en, de, fr, es) = scores.map(_._2)
    val pred = when(en + de + fr + es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
    Tables.documents(spark, dir).select(
      col("doc_id") +: scores.map { case (l, c) => c.as(s"s_$l") } :+ pred.as("pred_lang"): _*)
      .orderBy("doc_id")
  }

  def langIdOracle: String = {
    val scoreSql = langMarkers.map { case (lang, ms) =>
      val list = ms.map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS s_$lang"
    }.mkString(",\n       |  ")
    s"""SELECT doc_id,
       |  $scoreSql,
       |  CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
       |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
       |       WHEN s_fr >= s_es THEN 'fr'
       |       ELSE 'es' END AS pred_lang
       |FROM (SELECT doc_id, $tokensSql AS ws FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  // ── array / null-handling function battery ──

  /** Array and null-handling functions over the token arrays (the
    * reference has no array/map functions at all — SURVEY §2.8). All
    * engine-portable: size/slice/sort/contains/distinct + coalesce/
    * nullif. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(ws).cast("long").as("n"),
      array_join(slice(ws, 1, 3), "_").as("first3"),
      array_join(slice(array_sort(array_distinct(ws)), 1, 2), "_").as("top2_sorted"),
      array_contains(ws, "the").as("has_the"),
      element_at(ws, -1).as("last_tok"),
      coalesce(nullif(col("lang"), lit("en")), lit("english")).as("lang_or_english"))
      .orderBy("doc_id")
  }

  def arrayFuncsOracle: String =
    s"""SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n,
       |  array_to_string(ws[1:3], '_') AS first3,
       |  array_to_string(list_sort(list_distinct(ws))[1:2], '_') AS top2_sorted,
       |  list_contains(ws, 'the') AS has_the,
       |  ws[-1] AS last_tok,
       |  coalesce(nullif(lang, 'en'), 'english') AS lang_or_english
       |FROM (SELECT doc_id, lang, $tokensSql AS ws FROM documents) t
       |ORDER BY doc_id""".stripMargin

  // ── document fingerprinting ──

  /** Two content fingerprints per doc:
    *   - norm_md5: md5 of whitespace-normalized lowercased text
    *     (catches formatting-only duplicates);
    *   - bag_md5: md5 of the sorted distinct token set (catches
    *     reordered / repeated-content duplicates).
    * Both are exact-dedup keys usable in a hash groupBy at any scale. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val ws = tokens(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("norm_md5"),
      md5(array_join(array_sort(array_distinct(ws)), " ")).as("bag_md5"))
      .orderBy("doc_id")
  }

  def fingerprintOracle: String =
    s"""SELECT doc_id,
       |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_md5,
       |  md5(array_to_string(list_sort(list_distinct(ws)), ' ')) AS bag_md5
       |FROM (SELECT doc_id, text, $tokensSql AS ws FROM documents) t
       |ORDER BY doc_id""".stripMargin
}
