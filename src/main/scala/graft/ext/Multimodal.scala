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
  // Features are exact integer byte-bin sums with ONE double division
  // and float cast at the end — order-independent and reproducible
  // bit-for-bit by any engine (the DuckDB oracle recomputes them), so
  // the features query is fully hash-verifiable despite the stub.
  // ──────────────────────────────────────────────────────────────────
  private[ext] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val n = payload.length
    val width = 1 + (n % 64)
    val height = 1 + ((n / 64) % 64)
    val channels = 3
    val bins = new Array[Long](8)
    var i = 0
    while (i < n) {
      bins(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    val feats = Array.tabulate(8)(j => (bins(j) / 255.0).toFloat)
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

  /** Feature pipeline output as a DataFrame. The stub decode is
    * deterministic byte arithmetic, so the whole pipeline — decode,
    * resize, feature vector — hash-verifies against the DuckDB oracle
    * below. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    resizeStub(extractFeatures(assets(spark, dir))).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("channels"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
        size(col("features")).as("n_features"))
      .orderBy("asset_id")
  }

  /** Oracle: recomputes the stub decode in SQL. Byte i of the payload
    * is read from the hex dump (2 chars per byte); bin 0 sums bytes at
    * positions i ≡ 0 (mod 8); f0 = round(float(bin0 / 255.0), 4) —
    * the same double division + float cast the stub performs. The
    * resize halves width/height (integer division, floor 1) and keeps
    * feature index 0, leaving 4 of 8 components. */
  def featuresOracle: String =
    """WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
      |    hex(CAST(text AS BLOB)) AS hx FROM documents),
      |idx AS (SELECT doc_id, hx, unnest(range(0, n, 8)) AS i FROM d),
      |s AS (SELECT doc_id,
      |    SUM(CAST('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2) AS BIGINT)) AS b0
      |  FROM idx GROUP BY doc_id)
      |SELECT d.doc_id AS asset_id, 'image/fake' AS kind,
      |  CAST(d.n AS BIGINT) AS n_bytes,
      |  CAST(greatest(1, (1 + d.n % 64) // 2) AS INTEGER) AS width,
      |  CAST(greatest(1, (1 + (d.n // 64) % 64) // 2) AS INTEGER) AS height,
      |  CAST(3 AS INTEGER) AS channels,
      |  round(CAST(CAST(CAST(COALESCE(s.b0, 0) AS DOUBLE) / 255.0 AS REAL) AS DOUBLE), 4) AS f0,
      |  CAST(4 AS INTEGER) AS n_features
      |FROM d LEFT JOIN s ON d.doc_id = s.doc_id
      |ORDER BY asset_id""".stripMargin

  /** Fixed-size frame splitting of the opaque payload — the
    * frame-sample stage of an audio/video pipeline (chunk the byte
    * stream, checksum each frame for transport integrity). Fully
    * declarative: frame indices come from sequence + explode over the
    * byte length, frames from binary substring — all codegen'd, no
    * UDF, blobs never leave the executors. Every frame's md5 makes the
    * whole split hash-verifiable. The oracle mirrors byte-for-byte
    * because the fixture payloads are pure-ASCII UTF-8 (verified:
    * octet_length = char length corpus-wide), so VARCHAR substring in
    * DuckDB selects exactly the bytes Spark's binary substring does. */
  def frames(spark: SparkSession, dir: String): DataFrame = {
    val frameSize = 256
    // zero-length payloads emit no frames; without the filter Spark's
    // (len-1)/256 double division truncates -1/256 to 0 (one empty
    // frame) while an integer floor-division oracle yields -1 (none)
    assets(spark, dir).toDF()
      .filter(length(col("payload")) > 0)
      .select(col("asset_id"), col("payload"),
        explode(sequence(lit(0L),
          ((length(col("payload")) - 1) / frameSize).cast("long")))
          .as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        expr(s"substring(payload, cast(frame_idx * $frameSize + 1 as int), $frameSize)")
          .as("frame"))
      .select(col("asset_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("asset_id", "frame_idx")
  }

  /** Strided downsample ("resize") of the opaque payload — the resize
    * verb of the media pipeline, as a deterministic 4:1 decimation:
    * each 4-byte group keeps its first byte (a real pipeline swaps
    * this single projection for a codec-aware kernel; the Spark-side
    * plumbing — schema, pure projection, no payload shuffle, verifiable
    * output bytes — is exactly what ships). The decimation is one
    * regexp_replace keeping group-leading characters, legal because
    * fixture payloads are pure-ASCII (the frames family's verified
    * premise); '.' excludes newlines identically in Java regex and
    * RE2, and a trailing sub-4-byte remainder passes through unchanged
    * in both engines, so the downsampled bytes are md5-verifiable
    * bit-for-bit. Emits byte counts, the achieved ratio, and the
    * thumbnail digest per asset. Nothing shuffles: one codegen'd scan,
    * ORDER BY is the only exchange. */
  def mediaDownsample(spark: SparkSession, dir: String): DataFrame = {
    val ds = regexp_replace(col("payload").cast("string"), "(.).{3}", "$1")
    assets(spark, dir).toDF()
      .select(col("asset_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"), ds.as("ds"))
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        length(col("ds")).cast("long").as("ds_bytes"),
        when(col("n_bytes") > 0,
          round(length(col("ds")).cast("double") / col("n_bytes"), 6))
          .as("ds_ratio"),
        md5(col("ds")).as("ds_md5"))
      .orderBy("asset_id")
  }

  def mediaDownsampleOracle: String =
    """WITH d AS (SELECT doc_id AS asset_id,
      |    'image/fake' AS kind,
      |    text, CAST(length(text) AS BIGINT) AS n_bytes,
      |    regexp_replace(text, '(.).{3}', '\1', 'g') AS ds
      |  FROM documents)
      |SELECT asset_id, kind, n_bytes,
      |  CAST(length(ds) AS BIGINT) AS ds_bytes,
      |  CASE WHEN n_bytes > 0
      |    THEN round(CAST(length(ds) AS DOUBLE) / n_bytes, 6) END AS ds_ratio,
      |  md5(ds) AS ds_md5
      |FROM d ORDER BY asset_id""".stripMargin

  /** Cross-asset shared-frame detection: exact frames appearing in
    * MORE THAN ONE asset — the content-reuse check of the frame
    * pipeline (shared intros/ads/watermarks at video scale). One hash
    * aggregation keyed on the frame digest; payload bytes never
    * shuffle — only their md5 does, so the shuffle row width is
    * constant no matter the frame size. */
  def frameDedup(spark: SparkSession, dir: String): DataFrame =
    frames(spark, dir)
      .groupBy("frame_md5")
      .agg(countDistinct("asset_id").as("n_assets"),
        count(lit(1)).as("n_occurrences"),
        min("asset_id").as("first_asset"))
      .filter(col("n_assets") >= 2)
      .orderBy("frame_md5")

  def frameDedupOracle: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
      |       WHERE length(text) > 0),
      |idx AS (SELECT doc_id, text,
      |          unnest(generate_series(0, (n - 1) // 256)) AS frame_idx
      |        FROM d),
      |fr AS (SELECT doc_id AS asset_id,
      |         md5(substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256))
      |           AS frame_md5
      |       FROM idx)
      |SELECT frame_md5,
      |  CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets,
      |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
      |  MIN(asset_id) AS first_asset
      |FROM fr GROUP BY frame_md5 HAVING COUNT(DISTINCT asset_id) >= 2
      |ORDER BY frame_md5""".stripMargin

  def framesOracle: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
      |       WHERE length(text) > 0),
      |idx AS (SELECT doc_id, text,
      |          unnest(generate_series(0, (n - 1) // 256)) AS frame_idx
      |        FROM d)
      |SELECT doc_id AS asset_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256)) AS BIGINT)
      |    AS frame_len,
      |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256)) AS frame_md5
      |FROM idx ORDER BY asset_id, frame_idx""".stripMargin

  val FrameStride = 4

  /** Strided frame sampling ("every Nth frame" keyframe selection) +
    * per-asset sample manifest: frame count, sampled count, and one
    * digest over the ordered sampled-frame md5s — the manifest a
    * downstream feature-extraction stage would pin so retries and
    * replicas provably sampled the SAME frames. The stride filter is
    * pushed below the per-asset fold, so only 1/stride of the frame
    * digests aggregate; payload bytes never shuffle (the digests do).
    * The manifest digest folds through sort_array(collect_list) on
    * ≤ frames/stride structs per asset — bounded per-asset state,
    * order-free across partitions. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val all = frames(spark, dir)
      .groupBy("asset_id").agg(count(lit(1)).as("n_frames"))
    val sampled = frames(spark, dir)
      .filter(col("frame_idx") % FrameStride === 0)
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_sampled"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("frame_idx"), col("frame_md5")))),
            x => x.getField("frame_md5")),
          "").cast("binary")).as("sample_digest"))
    all.join(sampled, Seq("asset_id"))
      .select(col("asset_id"), col("n_frames"), col("n_sampled"),
        col("sample_digest"))
      .orderBy("asset_id")
  }

  def frameSampleOracle: String =
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
       |       WHERE length(text) > 0),
       |idx AS (SELECT doc_id, text,
       |          unnest(generate_series(0, (n - 1) // 256)) AS frame_idx
       |        FROM d),
       |fr AS (SELECT doc_id AS asset_id, frame_idx,
       |         md5(substring(text, CAST(frame_idx * 256 + 1 AS INTEGER), 256))
       |           AS frame_md5
       |       FROM idx)
       |SELECT a.asset_id, a.n_frames, s.n_sampled, s.sample_digest
       |FROM (SELECT asset_id, CAST(COUNT(*) AS BIGINT) AS n_frames
       |      FROM fr GROUP BY asset_id) a
       |JOIN (SELECT asset_id, CAST(COUNT(*) AS BIGINT) AS n_sampled,
       |        md5(string_agg(frame_md5, '' ORDER BY frame_idx))
       |          AS sample_digest
       |      FROM fr WHERE frame_idx % $FrameStride = 0
       |      GROUP BY asset_id) s USING (asset_id)
       |ORDER BY asset_id""".stripMargin

  // ── cross-modal alignment: is this caption attached to the right
  // asset? ──

  /** Mismatch gate: pairs whose within-pair cosine sits more than
    * this many σ BELOW the cross-pair mean are flagged. */
  val AlignZGate = 2.0

  /** Caption↔asset alignment audit — the CLIP-style contrastive-pair
    * hygiene check: for every (document caption, frame asset) pair,
    * score the within-pair cosine between the asset's decoded feature
    * vector ([[extractFeatures]]' 8 byte-bins — the honest stand-in
    * for a real image encoder, same stub honesty as
    * [[mediaDownsample]]) and the caption's embedding compressed to
    * the same 8 dims (contiguous coordinate bins — the projection-head
    * analog), then standardize against the EXACT cross-pair null: the
    * mean/σ of cos(aᵢ, eⱼ) over all i≠j. A pair whose z sits below
    * −[[AlignZGate]] is captioned wrong (or the encoder is).
    *
    * The null is computed WITHOUT forming any pair: with unit vectors,
    * Σᵢⱼ aᵢ·eⱼ = Sa·Se and Σᵢⱼ (aᵢ·eⱼ)² = ⟨Ga, Ge⟩ where Sa/Se are the
    * 8-dim coordinate sums and Ga/Ge the 8×8 second-moment (Gram)
    * matrices — four single-pass aggregates into ≤64 cells, minus the
    * diagonal's own single-pass sums. So the audit is two corpus scans
    * (decode + embed), one co-keyed join for the diagonal, and
    * broadcast scalars — no corpus×corpus term at any scale. Sums over
    * rows go through decimal casts (order-independent); per-row folds
    * (norms, dots) run in array order via the compiled DotProduct
    * kernel, which DuckDB's list_dot_product reproduces exactly.
    * Fixture honesty: payloads are UTF-8 of the caption text and the
    * embeddings are synthetic, so within-pair scores genuinely draw
    * from the null — honest zeros, like the PII scan: the report's
    * value is the verified plumbing and the exact null algebra. */
  /** Unit-normalize an array<double> column; NULL (not a crash, not a
    * junk direction) for the zero vector — callers filter. */
  private[ext] def unitCol(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = sqrt(graft.functions.DotProduct(v, v))
    when(n > 0, transform(v, x => x / n))
  }

  /** Asset side of the shared 8-dim space: the decode stub's 8
    * byte-bin features, unit-normed (NULL for empty payloads). */
  private[graft] def sharedSpaceAssets(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(assets(spark, dir)).toDF()
      .select(col("asset_id"),
        unitCol(col("features").cast("array<double>")).as("a"))

  /** Caption side of the shared space: the 64-dim embedding binned to
    * 8 contiguous coordinate sums (sequential in-array folds),
    * unit-normed — the projection-head analog. Spread first: the
    * embeddings table is a single parquet split even at sf0.1, and
    * this frame feeds binning folds, Gram passes and scoring joins —
    * without the exchange they all run one-task. */
  private[graft] def sharedSpaceCaptions(spark: SparkSession, dir: String): DataFrame = {
    val e8raw = transform(sequence(lit(0), lit(7)), j => {
      val d = size(col("v"))
      // integer floor-division bounds (j*d and (j+1)*d are non-negative
      // ints, so floor of the exact double quotient is the int quotient);
      // slice length must be floor(e)−floor(s) — trunc(e−s) diverges for
      // dims not divisible by 8 (d=12, j=1: 1 vs the correct 2)
      val s = floor((j * d) / lit(8)).cast("int")
      val e = floor(((j + lit(1)) * d) / lit(8)).cast("int")
      aggregate(slice(col("v"), s + 1, e - s),
        lit(0.0), (acc, x) => acc + x)
    })
    Similarity.spread(Similarity.embeddingsD(spark, dir))
      .select(col("vec_id").as("asset_id"), unitCol(e8raw).as("e"))
  }

  def captionFrameAlignment(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 18)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      graft.functions.DotProduct(a, b)
    // both sides feed FOUR branches each (coordinate sums, Gram cells,
    // the count, the diagonal join): persist or every branch re-pays
    // the decode/binning projection — 4 corpus scans per side at 100 TB
    val a8 = sharedSpaceAssets(spark, dir).persist()
    val e8 = sharedSpaceCaptions(spark, dir).persist()
    // moment frames: coordinate sums and 8×8 Gram cells, decimal sums
    def coordSums(df: DataFrame, c: String) = df.filter(col(c).isNotNull)
      .select(posexplode(col(c)).as(Seq("k", "x")))
      .groupBy("k").agg(sum(col("x").cast(dec)).cast("double").as(s"s_$c"))
    def gramSums(df: DataFrame, c: String) = df.filter(col(c).isNotNull)
      .select(posexplode(transform(sequence(lit(0), lit(63)), i =>
        element_at(col(c), (i / 8).cast("int") + 1) *
          element_at(col(c), (i % 8).cast("int") + 1))).as(Seq("k", "x")))
      .groupBy("k").agg(sum(col("x").cast(dec)).cast("double").as(s"g_$c"))
    val dotSS = coordSums(a8, "a").join(coordSums(e8, "e"), Seq("k"))
      .agg(sum((col("s_a") * col("s_e")).cast(dec)).cast("double").as("ss"))
    val dotGG = gramSums(a8, "a").join(gramSums(e8, "e"), Seq("k"))
      .agg(sum((col("g_a") * col("g_e")).cast(dec)).cast("double").as("gg"))
    val counts = a8.filter(col("a").isNotNull).agg(count(lit(1)).as("na"))
      .crossJoin(broadcast(
        e8.filter(col("e").isNotNull).agg(count(lit(1)).as("ne"))))
    // the co-keyed diagonal: each asset against ITS OWN caption
    val paired = a8.join(e8, Seq("asset_id"))
      .select(col("asset_id"), dot(col("a"), col("e")).as("x"))
    val diag = paired.filter(col("x").isNotNull).agg(
      count(lit(1)).as("nd"),
      sum(col("x").cast(dec)).cast("double").as("sx"),
      sum((col("x") * col("x")).cast(dec)).cast("double").as("sx2"))
    // all four sides are 1-row aggregates — every cross is a hinted
    // broadcast BNLJ (the scalar-subquery pattern), never cartesian
    val stats = dotSS.crossJoin(broadcast(dotGG))
      .crossJoin(broadcast(counts)).crossJoin(broadcast(diag))
      .select(
        ((col("ss") - col("sx")) / (col("na") * col("ne") - col("nd")))
          .as("mu"),
        sqrt(greatest(
          (col("gg") - col("sx2")) / (col("na") * col("ne") - col("nd")) -
            pow((col("ss") - col("sx")) /
              (col("na") * col("ne") - col("nd")), 2), lit(0.0)))
          .as("sigma"))
    val out = paired
      .crossJoin(broadcast(stats)) // 1-row stats: BNLJ, never cartesian
      .select(col("asset_id"), round(col("x"), 6).as("cos_sim"),
        round(when(col("sigma") > 0, (col("x") - col("mu")) / col("sigma")),
          6).as("z"),
        (round(when(col("sigma") > 0, (col("x") - col("mu")) / col("sigma")),
          6) < -AlignZGate).as("mismatch"))
      .orderBy("asset_id")
    // release keyed to THIS query's plan (not the frames' own plans):
    // a8/e8 are subtrees of other registered multimodal queries, so the
    // subtree-matching variant could fire on a sibling's action and
    // drop the caches before this query's own run (ADVICE r12)
    graft.GraftSession.releaseAfterActionOn(spark, out, a8, e8)
    out
  }

  /** Mirrors [[captionFrameAlignment]]: byte bins from the hex dump
    * (the [[featuresOracle]] mechanism, all 8 bins), coordinate bins
    * by the same integer-division slicing, per-row folds via
    * list_dot_product (sequential, like the compiled kernel), row
    * sums via decimal casts. */
  def captionFrameAlignmentOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
       |    hex(CAST(text AS BLOB)) AS hx FROM documents),
       |byt AS (SELECT doc_id, i % 8 AS k,
       |    CAST('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2) AS BIGINT) AS b
       |  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM d) t),
       |bins AS (SELECT doc_id, k, SUM(b) AS bin FROM byt GROUP BY doc_id, k),
       |dense AS (SELECT d.doc_id, kk.k,
       |    CAST(CAST(COALESCE(bin, 0) / 255.0 AS REAL) AS DOUBLE) AS av
       |  FROM d CROSS JOIN range(8) kk(k)
       |  LEFT JOIN bins ON bins.doc_id = d.doc_id AND bins.k = kk.k),
       |araw AS (SELECT doc_id AS asset_id, list(av ORDER BY k) AS al
       |  FROM dense GROUP BY doc_id),
       |aunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(al, al)) > 0 THEN
       |      list_transform(al, x -> x / sqrt(list_dot_product(al, al)))
       |    END AS a FROM araw),
       |eraw AS (SELECT vec_id AS asset_id,
       |    list_transform(range(8), j -> COALESCE(list_sum(
       |      v[(j*dd)//8 + 1 : ((j+1)*dd)//8]), 0.0)) AS el
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        len(embedding) AS dd FROM embeddings) e0),
       |eunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(el, el)) > 0 THEN
       |      list_transform(el, x -> x / sqrt(list_dot_product(el, el)))
       |    END AS e FROM eraw),
       |sa AS (SELECT k, CAST(SUM(CAST(a[k+1] AS DECIMAL(38,18))) AS DOUBLE) AS s_a
       |  FROM aunit CROSS JOIN range(8) kk(k) WHERE a IS NOT NULL GROUP BY k),
       |se AS (SELECT k, CAST(SUM(CAST(e[k+1] AS DECIMAL(38,18))) AS DOUBLE) AS s_e
       |  FROM eunit CROSS JOIN range(8) kk(k) WHERE e IS NOT NULL GROUP BY k),
       |ga AS (SELECT k, CAST(SUM(CAST(a[k//8+1] * a[k%8+1]
       |      AS DECIMAL(38,18))) AS DOUBLE) AS g_a
       |  FROM aunit CROSS JOIN range(64) kk(k) WHERE a IS NOT NULL GROUP BY k),
       |ge AS (SELECT k, CAST(SUM(CAST(e[k//8+1] * e[k%8+1]
       |      AS DECIMAL(38,18))) AS DOUBLE) AS g_e
       |  FROM eunit CROSS JOIN range(64) kk(k) WHERE e IS NOT NULL GROUP BY k),
       |ss AS (SELECT CAST(SUM(CAST(s_a * s_e AS DECIMAL(38,18))) AS DOUBLE) AS ss
       |  FROM sa JOIN se USING (k)),
       |gg AS (SELECT CAST(SUM(CAST(g_a * g_e AS DECIMAL(38,18))) AS DOUBLE) AS gg
       |  FROM ga JOIN ge USING (k)),
       |cnt AS (SELECT (SELECT COUNT(*) FROM aunit WHERE a IS NOT NULL) AS na,
       |  (SELECT COUNT(*) FROM eunit WHERE e IS NOT NULL) AS ne),
       |paired AS (SELECT asset_id, list_dot_product(a, e) AS x
       |  FROM aunit JOIN eunit USING (asset_id)),
       |diag AS (SELECT COUNT(*) AS nd,
       |    CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sx2
       |  FROM paired WHERE x IS NOT NULL),
       |stats AS (SELECT (ss - sx) / (na * ne - nd) AS mu,
       |    sqrt(greatest((gg - sx2) / (na * ne - nd) -
       |      ((ss - sx) / (na * ne - nd))^2, 0.0)) AS sigma
       |  FROM ss, gg, cnt, diag)
       |SELECT asset_id, round(x, 6) AS cos_sim,
       |  round(CASE WHEN sigma > 0 THEN (x - mu) / sigma END, 6) AS z,
       |  round(CASE WHEN sigma > 0 THEN (x - mu) / sigma END, 6)
       |    < -$AlignZGate AS mismatch
       |FROM paired, stats ORDER BY asset_id""".stripMargin

  // ── cross-modal retrieval: which asset does this caption describe? ──

  /** The retrieval panel: every [[CaptionPanelMod]]-th caption, capped
    * at [[CaptionPanelCap]] queries — a FIXED-size panel (ids 0, 10, …,
    * 490), because the query set of a retrieval audit must not grow
    * with the corpus (a mod-only panel would make the exact scoring
    * pass O(n²/mod) — the 10× probe read 11 before the cap). The
    * full-corpus form is the ANN ladder, not a wider exact panel. */
  val CaptionPanelMod = 10
  val CaptionPanelCap = 50
  val CaptionTopK = 5

  /** Cross-modal retrieval — the operator that BUILDS contrastive
    * pairs where [[captionFrameAlignment]] only audits existing ones:
    * for each caption in a deterministic panel (vec_id ≡ 0 mod
    * [[CaptionPanelMod]]), the top-[[CaptionTopK]] assets by cosine in
    * the shared 8-dim space, plus the diagonal recall audit — `is_own`
    * marks the caption's own asset among the hits and `hit_at_k` is
    * the per-caption recall@k against the exact diagonal ground truth
    * (caption i belongs to asset i by fixture construction).
    *
    * Scale shape: the panel is bounded (≤ [[CaptionPanelCap]] queries
    * here; a fixed query file in production), broadcast keylessly onto
    * the spread asset scan — O(n·|panel|) dot products of 8-dim vectors, never
    * corpus×corpus — and ranking is the map-side bounded heap
    * ([[Similarity.topKPerQuery]]): the shuffle carries
    * tasks × panel × k rows, not the scored scan. The full-corpus
    * retrieval form swaps the panel join for the LSH/IVF bucket join
    * (`sim_ann_*`), shape unchanged — exactly the brute-vs-indexed
    * ladder the similarity family already verifies. Zero-norm vectors
    * (empty payloads decode to the zero feature vector) are NULL after
    * unit-norm and excluded on BOTH sides — a zero vector has no
    * direction, so it can neither query nor be retrieved. */
  def captionAssetTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = sharedSpaceAssets(spark, dir).filter(col("a").isNotNull)
    val panel = sharedSpaceCaptions(spark, dir)
      .filter(col("e").isNotNull && col("asset_id") % CaptionPanelMod === 0 &&
        col("asset_id") < CaptionPanelMod.toLong * CaptionPanelCap)
      .select(col("asset_id").as("query_id"), col("e"))
    val scored = corpus.crossJoin(broadcast(panel))
      .select(col("query_id"), col("asset_id").as("neighbor_id"),
        round(graft.functions.DotProduct(col("a"), col("e")), 6).as("cos_sim"))
    // the recall window runs over ≤ k rows per caption AFTER the heap
    // top-k — panel×k rows total, a bounded frame by construction
    val w = Window.partitionBy("caption_id")
    Similarity.topKPerQuery(scored, CaptionTopK)
      .select(col("query_id").as("caption_id"),
        col("neighbor_id").as("asset_id"), col("cos_sim"), col("rk"),
        (col("neighbor_id") === col("query_id")).as("is_own"))
      .withColumn("hit_at_k", max(col("is_own")).over(w))
      .orderBy("caption_id", "rk")
  }

  /** Mirrors [[captionAssetTopK]]: same shared-space CTEs as the
    * alignment oracle, panel filter, window ranking with the
    * (cos desc, asset_id asc) tiebreak; hit_at_k windows over the
    * top-k rows only (WHERE runs before window evaluation). */
  def captionAssetTopKOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
       |    hex(CAST(text AS BLOB)) AS hx FROM documents),
       |byt AS (SELECT doc_id, i % 8 AS k,
       |    CAST('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2) AS BIGINT) AS b
       |  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM d) t),
       |bins AS (SELECT doc_id, k, SUM(b) AS bin FROM byt GROUP BY doc_id, k),
       |dense AS (SELECT d.doc_id, kk.k,
       |    CAST(CAST(COALESCE(bin, 0) / 255.0 AS REAL) AS DOUBLE) AS av
       |  FROM d CROSS JOIN range(8) kk(k)
       |  LEFT JOIN bins ON bins.doc_id = d.doc_id AND bins.k = kk.k),
       |araw AS (SELECT doc_id AS asset_id, list(av ORDER BY k) AS al
       |  FROM dense GROUP BY doc_id),
       |aunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(al, al)) > 0 THEN
       |      list_transform(al, x -> x / sqrt(list_dot_product(al, al)))
       |    END AS a FROM araw),
       |eraw AS (SELECT vec_id AS asset_id,
       |    list_transform(range(8), j -> COALESCE(list_sum(
       |      v[(j*dd)//8 + 1 : ((j+1)*dd)//8]), 0.0)) AS el
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        len(embedding) AS dd FROM embeddings) e0),
       |eunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(el, el)) > 0 THEN
       |      list_transform(el, x -> x / sqrt(list_dot_product(el, el)))
       |    END AS e FROM eraw),
       |corpus AS (SELECT asset_id, a FROM aunit WHERE a IS NOT NULL),
       |panel AS (SELECT asset_id AS query_id, e FROM eunit
       |  WHERE e IS NOT NULL AND asset_id % $CaptionPanelMod = 0
       |    AND asset_id < ${CaptionPanelMod.toLong * CaptionPanelCap}),
       |scored AS (SELECT p.query_id, c.asset_id AS neighbor_id,
       |    round(list_dot_product(c.a, p.e), 6) AS cos_sim
       |  FROM corpus c CROSS JOIN panel p),
       |ranked AS (SELECT query_id, neighbor_id, cos_sim,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id AS caption_id, neighbor_id AS asset_id, cos_sim,
       |  CAST(rk AS BIGINT) AS rk,
       |  neighbor_id = query_id AS is_own,
       |  max(neighbor_id = query_id) OVER (PARTITION BY query_id) AS hit_at_k
       |FROM ranked WHERE rk <= $CaptionTopK
       |ORDER BY caption_id, rk""".stripMargin

  /** The SCALE path for cross-modal retrieval, with its acceptance
    * audit in the same row — the brute-vs-indexed ladder
    * [[captionAssetTopK]]'s scaladoc promises: assets bucket once by
    * random-hyperplane LSH in the shared 8-dim space
    * ([[Similarity.lshBucket]] — sign-stable under the unit-norm, so
    * caption and asset sides bucket consistently), each panel caption
    * probes its own bucket plus all Hamming-1 flips (Lv et al.
    * multiprobe — several tables' recall at one table's memory), and
    * candidates score through the same bounded heap. Per caption the
    * report carries recall@k against the EXACT panel retrieval
    * (n_exact/n_hit/recall) and whether the diagonal asset survived
    * the index (`own_in_ann`) — the number that decides if the index
    * is good enough to BUILD contrastive pairs with, not just audit
    * them. Cost shape: the corpus is scanned once to bucket and never
    * fanned out (probes multiply the bounded panel side ×9); the
    * bucket join replaces the exact form's panel broadcast, so
    * per-caption work drops from O(n) to O(candidates in 9 of 256
    * buckets). A caption whose probed buckets come back empty still
    * reports (exact spine, LEFT join): recall 0, own_in_ann false —
    * graded zeros, never a dropped row. */
  def captionAssetTopKAnn(spark: SparkSession, dir: String): DataFrame = {
    val corpus = sharedSpaceAssets(spark, dir).filter(col("a").isNotNull)
      .select(col("asset_id"), col("a"),
        Similarity.lshBucket(col("a")).as("bucket"))
    val panel = sharedSpaceCaptions(spark, dir)
      .filter(col("e").isNotNull && col("asset_id") % CaptionPanelMod === 0 &&
        col("asset_id") < CaptionPanelMod.toLong * CaptionPanelCap)
      .select(col("asset_id").as("query_id"), col("e"),
        Similarity.lshBucket(col("e")).as("qb"))
    val probes = array(col("qb") +: (0 until Similarity.NumPlanes).map(p =>
      col("qb").bitwiseXOR(lit(1L << p))): _*)
    val q = panel.select(col("query_id"), col("e"),
      explode(probes).as("bucket"))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .select(col("query_id"), col("asset_id").as("neighbor_id"),
        round(graft.functions.DotProduct(col("a"), col("e")), 6).as("cos_sim"))
    val ann = Similarity.topKPerQuery(scored, CaptionTopK).localCheckpoint()
    val exact = captionAssetTopK(spark, dir)
      .select(col("caption_id").as("query_id"),
        col("asset_id").as("x_n"))
    val ownHit = ann.groupBy("query_id")
      .agg(max(col("neighbor_id") === col("query_id")).as("own_in_ann"))
    exact
      .join(broadcast(ann.select(col("query_id").as("a_q"),
        col("neighbor_id").as("a_n"))),
        col("query_id") === col("a_q") && col("x_n") === col("a_n"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"), count(col("a_n")).as("n_hit"))
      .join(broadcast(ownHit), Seq("query_id"), "left")
      .select(col("query_id").as("caption_id"), col("n_exact"),
        col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact"), 6).as("recall"),
        coalesce(col("own_in_ann"), lit(false)).as("own_in_ann"))
      .orderBy("caption_id")
  }

  /** Mirrors [[captionAssetTopKAnn]]: the shared-space CTEs, the
    * 8-plane sign-mix bucket (the [[Similarity]] oracle formulation
    * over the 8-dim unit lists), Hamming-1 probe fan-out on the panel
    * side only, and the exact-vs-ann recall join. */
  def captionAssetTopKAnnOracle: String =
    s"""WITH d AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n,
       |    hex(CAST(text AS BLOB)) AS hx FROM documents),
       |byt AS (SELECT doc_id, i % 8 AS k,
       |    CAST('0x' || substr(hx, CAST(2*i+1 AS BIGINT), 2) AS BIGINT) AS b
       |  FROM (SELECT doc_id, hx, unnest(range(0, n)) AS i FROM d) t),
       |bins AS (SELECT doc_id, k, SUM(b) AS bin FROM byt GROUP BY doc_id, k),
       |dense AS (SELECT d.doc_id, kk.k,
       |    CAST(CAST(COALESCE(bin, 0) / 255.0 AS REAL) AS DOUBLE) AS av
       |  FROM d CROSS JOIN range(8) kk(k)
       |  LEFT JOIN bins ON bins.doc_id = d.doc_id AND bins.k = kk.k),
       |araw AS (SELECT doc_id AS asset_id, list(av ORDER BY k) AS al
       |  FROM dense GROUP BY doc_id),
       |aunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(al, al)) > 0 THEN
       |      list_transform(al, x -> x / sqrt(list_dot_product(al, al)))
       |    END AS a FROM araw),
       |eraw AS (SELECT vec_id AS asset_id,
       |    list_transform(range(8), j -> COALESCE(list_sum(
       |      v[(j*dd)//8 + 1 : ((j+1)*dd)//8]), 0.0)) AS el
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |        len(embedding) AS dd FROM embeddings) e0),
       |eunit AS (SELECT asset_id,
       |    CASE WHEN sqrt(list_dot_product(el, el)) > 0 THEN
       |      list_transform(el, x -> x / sqrt(list_dot_product(el, el)))
       |    END AS e FROM eraw),
       |aproj AS (SELECT asset_id, p,
       |    list_sum(list_transform(range(8), j ->
       |      a[j+1] * (CASE WHEN (j * 2654435761 + p * 40503) % 97 % 2 = 0
       |                     THEN 1.0 ELSE -1.0 END))) AS s
       |  FROM aunit CROSS JOIN range(${Similarity.NumPlanes}) r(p)
       |  WHERE a IS NOT NULL),
       |abuck AS (SELECT asset_id, CAST(SUM(CASE WHEN s > 0
       |    THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM aproj GROUP BY asset_id),
       |corpus AS (SELECT au.asset_id, au.a, b.bucket
       |  FROM aunit au JOIN abuck b USING (asset_id)
       |  WHERE au.a IS NOT NULL),
       |eproj AS (SELECT asset_id, p,
       |    list_sum(list_transform(range(8), j ->
       |      e[j+1] * (CASE WHEN (j * 2654435761 + p * 40503) % 97 % 2 = 0
       |                     THEN 1.0 ELSE -1.0 END))) AS s
       |  FROM eunit CROSS JOIN range(${Similarity.NumPlanes}) r(p)
       |  WHERE e IS NOT NULL AND asset_id % $CaptionPanelMod = 0
       |    AND asset_id < ${CaptionPanelMod.toLong * CaptionPanelCap}),
       |ebuck AS (SELECT asset_id, CAST(SUM(CASE WHEN s > 0
       |    THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS qb
       |  FROM eproj GROUP BY asset_id),
       |panel AS (SELECT eu.asset_id AS query_id, eu.e, b.qb
       |  FROM eunit eu JOIN ebuck b USING (asset_id)),
       |q AS (SELECT query_id, e, unnest(list_prepend(qb,
       |    list_transform(range(${Similarity.NumPlanes}),
       |      p -> xor(qb, 1::BIGINT << p)))) AS bucket
       |  FROM panel),
       |ann AS (SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.asset_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY round(list_dot_product(c.a, q.e), 6) DESC,
       |                 c.asset_id) AS rk
       |    FROM corpus c JOIN q ON c.bucket = q.bucket) t
       |  WHERE rk <= $CaptionTopK),
       |exact AS (SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, c.asset_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY round(list_dot_product(c.a, p.e), 6) DESC,
       |                 c.asset_id) AS rk
       |    FROM corpus c CROSS JOIN panel p) t
       |  WHERE rk <= $CaptionTopK),
       |own AS (SELECT query_id, bool_or(neighbor_id = query_id) AS own_in_ann
       |  FROM ann GROUP BY query_id)
       |SELECT ex.query_id AS caption_id,
       |  CAST(COUNT(*) AS BIGINT) AS n_exact,
       |  CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
       |  round(CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*), 6) AS recall,
       |  COALESCE(ANY_VALUE(own.own_in_ann), false) AS own_in_ann
       |FROM exact ex
       |LEFT JOIN ann a ON ex.query_id = a.query_id
       |  AND ex.neighbor_id = a.neighbor_id
       |LEFT JOIN own ON ex.query_id = own.query_id
       |GROUP BY ex.query_id ORDER BY caption_id""".stripMargin
}
