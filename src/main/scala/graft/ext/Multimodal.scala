package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus per-partition batch
  * processing for decode / feature extraction.
  *
  * The real Spark-side machinery — schema, partition-local batch
  * iteration, feature-column shape — is implemented and tested; the
  * actual media decode is STUBBED (no image/audio codecs in this
  * container) with a deterministic fake so the pipeline shape is
  * exercised end-to-end. Swap `decodeStub` for a real codec (e.g. via
  * a JNI binding or a Python worker behind mapInPandas/mapInArrow on a
  * PySpark edge) without touching the plan.
  *
  * Scale notes: payloads stay opaque bytes until the last possible
  * stage (no decode before filters/joins); `mapPartitions` processes
  * each input split independently with an iterator — constant memory
  * per task regardless of corpus size; metadata lives in plain columns
  * so Catalyst prunes/pushes around the blobs.
  */
object Multimodal {

  /** Typed asset row: opaque payload + queryable metadata. */
  case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features per asset (fixed-width vector + dims). */
  case class AssetFeatures(asset_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, channels: Int,
                           features: Array[Float])

  /** Build an asset table from the documents fixture: the text bytes
    * stand in for an encoded media payload (UTF-8 — identical bytes in
    * any engine). */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        lit("image/fake").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  // ──────────────────────────────────────────────────────────────────
  // STUB: deterministic fake decode. A real implementation would parse
  // the container format (JPEG/PNG/WAV...) here. The fake derives
  // "dimensions" and a feature vector from the bytes so tests are
  // stable and the full pipeline (schema → batch → features) runs.
  // ──────────────────────────────────────────────────────────────────
  private[ext] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (n % 64)
    val height = 1 + ((n / 64) % 64)
    val channels = 3
    val feats = new Array[Float](8)
    var i = 0
    while (i < n) {
      feats(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    (width, height, channels, feats)
  }

  /** Per-partition batch decode + feature extraction. Iterator-to-
    * iterator transform: Spark streams rows through, nothing is
    * buffered beyond the codec's own working set. */
  def extractFeatures(in: Dataset[Asset]): Dataset[AssetFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { it =>
      // per-partition one-time setup would init the codec here
      it.map { a =>
        val (w, h, c, f) = decodeStub(a.payload)
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong, w, h, c, f)
      }
    }
  }

  /** Resize/frame-sample stage — same batch shape; the stub subsamples
    * the feature vector deterministically. */
  def resizeStub(in: Dataset[AssetFeatures], factor: Int = 2): Dataset[AssetFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions(_.map { f =>
      f.copy(width = math.max(1, f.width / factor),
        height = math.max(1, f.height / factor),
        features = f.features.grouped(factor).map(_.head).toArray)
    })
  }

  /** Metadata projection — SQL-expressible (bytes are UTF-8 of text, so
    * the oracle reproduces lengths/hashes exactly). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    assets(spark, dir).toDF()
      .select(col("asset_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("asset_id")

  def metaOracle: String =
    """SELECT doc_id AS asset_id, 'image/fake' AS kind,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY asset_id""".stripMargin

  /** Feature pipeline output as a DataFrame (rows-only verification —
    * the decode is a stub, not SQL semantics). */
  def features(spark: SparkSession, dir: String): DataFrame = {
    resizeStub(extractFeatures(assets(spark, dir))).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("channels"),
        round(element_at(col("features"), 1), 4).as("f0"),
        size(col("features")).as("n_features"))
      .orderBy("asset_id")
  }
}
