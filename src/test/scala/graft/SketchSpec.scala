package graft

import org.apache.spark.sql.functions._

/** Probabilistic-structure tools for the 100 TB pre-filter paths:
  *   - Bloom filter over content fingerprints: broadcast "have I seen
  *     this key" membership for incremental dedup — a miss is
  *     authoritative (no false negatives), so only hits pay the exact
  *     lookup.
  *   - Count-min sketch over tokens: bounded-memory heavy-hitter
  *     frequencies (vocabulary heads, hot keys for skew handling)
  *     without a full groupBy.
  * Both are built distributed (one pass, mergeable partials) and small
  * enough to broadcast. No oracle — the structures are intentionally
  * approximate; the tests assert their mathematical guarantees. */
class SketchSpec extends SparkSpec {

  test("bloom filter over doc fingerprints: no false negatives, bounded FPR") {
    val docs = Tables.documents(spark, sf0001)
      .select(md5(col("text")).as("h"))
    val n = docs.count()
    val bloom = docs.stat.bloomFilter("h", n, 0.03)
    val misses = docs.collect().count(r => !bloom.mightContain(r.getString(0)))
    assert(misses == 0, s"$misses false negatives — bloom contract broken")
    // absent keys: false-positive rate should be near the configured 3%
    val probes = 2000
    val fp = (1 to probes).count(i => bloom.mightContain(s"absent-key-$i"))
    assert(fp.toDouble / probes < 0.1, s"FPR ${fp.toDouble / probes} too high")
  }

  test("count-min sketch bounds token frequencies from above within eps·N") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(ext.TextAnalysis.tokens(col("text"))).as("w"))
    val total = toks.count()
    val eps = 0.01
    val cms = toks.stat.countMinSketch(col("w"), eps, 0.99, seed = 42)
    val exact = toks.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS underestimated '$w': $est < $c")
      assert(est <= c + (eps * total).toLong + 1,
        s"CMS overshot eps bound for '$w': $est vs $c + ${(eps * total).toLong}")
    }
  }

  // ── the oracled, engine-neutral sketch queries (ext.Sketches) ──

  test("oracled KMV and HLL distinct estimates land within sketch error") {
    val kmv = ext.Sketches.kmvDistinct(spark, sf0001).collect().head
    assert(kmv.getAs[Double]("rel_err") < 0.25,
      s"KMV rel_err ${kmv.getAs[Double]("rel_err")} out of band")
    val hll = ext.Sketches.hllDistinct(spark, sf0001).collect().head
    assert(hll.getAs[Double]("rel_err") < 0.25,
      s"HLL rel_err ${hll.getAs[Double]("rel_err")} out of band")
  }

  test("oracled CMS heavy hitters never undercount") {
    val rows = ext.Sketches.cmsHeavyHitters(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"CMS undercounted '${r.getAs[String]("token")}'")
    }
  }

  test("hll register merge: union estimate from merged registers stays in sketch error") {
    val rows = ext.Sketches.hllMergeSources(spark, sf0001).collect()
    val all = rows.find(_.getAs[String]("scope") == "ALL").get
    val srcs = rows.filterNot(_.getAs[String]("scope") == "ALL")
    assert(srcs.nonEmpty)
    // the merged sketch counts the union, not the sum of the parts
    assert(all.getAs[Long]("exact_distinct") <=
      srcs.map(_.getAs[Long]("exact_distinct")).sum)
    // 256 registers → ~1.04/√256 ≈ 6.5% standard error; allow 4σ
    rows.foreach { r =>
      assert(r.getAs[Double]("rel_err") < 0.26,
        s"scope ${r.getAs[String]("scope")} err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("bottom-k quantile sketch: oracled estimates land within sample error") {
    val rows = ext.Sketches.quantileSketchPrice(spark, sf0001).collect()
    assert(rows.length == ext.Sketches.QsProbes.length)
    rows.foreach { r =>
      // k=1024 → rank se ~ √(q(1−q)/k) ≤ 1.6%; the value-space error
      // depends on local density — 20% is a generous 100×-slack band
      // that still catches a broken estimator (wrong rank ⇒ ~O(1) err)
      assert(r.getAs[Double]("rel_err") < 0.20,
        s"q=${r.getAs[Double]("q")} rel_err ${r.getAs[Double]("rel_err")}")
      assert(r.getAs[Long]("k_retained") ==
        math.min(ext.Sketches.QsK.toLong, r.getAs[Long]("n")))
    }
  }

  test("quantile sketch merge: folded per-source sample equals the from-scratch corpus sample") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val allRow = ext.Sketches
      .qsMergeReport(spark, sf0001, ext.Sketches.qsSourceSketch(docs))
      .filter(col("scope") === "ALL").collect().head
    // from-scratch: the bottom-k over the whole corpus in one pass
    val scratch = ext.Sketches
      .qsSourceSketch(docs.withColumn("source", lit("ALL")))
      .select(sort_array(transform(col("s"), x => x.getField("v"))).as("vs"))
      .collect().head.getSeq[Double](0)
    def fetch(q: Double): Double =
      scratch((q * (scratch.length - 1)).floor.toInt)
    assert(allRow.getAs[Long]("k_retained") == scratch.length.toLong)
    assert(allRow.getAs[Double]("est_p50") == fetch(0.5),
      "union + re-clip lost the global bottom-k at p50")
    assert(allRow.getAs[Double]("est_p90") == fetch(0.9),
      "union + re-clip lost the global bottom-k at p90")
  }

  test("quantile sketch state is duplicate-idempotent: a replayed corpus changes nothing") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    def arrays(d: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
      ext.Sketches.qsSourceSketch(d)
        .select(col("scope"), transform(col("s"), x => x.getField("h")).as("hs"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(arrays(docs.unionByName(docs)) == arrays(docs),
      "replayed rows occupied sample slots — the streaming twin would drift")
  }

  test("quantile rank fetch stays in bounds on 1- and 2-row samples") {
    import spark.implicits._
    // a 1-doc and a 2-doc source: 1+floor(q(k−1)) must hit [1, k] at
    // the extreme probes (q=0 → the min, q=1 → the max), never 0 or
    // k+1 — and the lower-statistic convention means q=0.5 of a 2-row
    // sample is the SMALLER value (rank 1+floor(0.5) = 1)
    val d = Seq((1L, "one", 10L), (2L, "two", 5L), (3L, "two", 50L))
      .toDF("doc_id", "source", "n_chars")
    def fetch(q: Double) = element_at(col("vs"),
      (floor(lit(q) * (size(col("vs")) - lit(1))) + lit(1)).cast("int"))
    val est = ext.Sketches.qsSourceSketch(d)
      .select(col("scope"),
        sort_array(transform(col("s"), x => x.getField("v"))).as("vs"))
      .select(col("scope"), fetch(1.0).as("hi"), fetch(0.5).as("mid"),
        fetch(0.0).as("lo"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(est("one") == ((10.0, 10.0, 10.0)))
    assert(est("two") == ((50.0, 5.0, 5.0)))
  }

  test("oracled bloom audit: zero false negatives, every build key hits") {
    val rows = ext.Sketches.bloomFilterAudit(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_false_negative") == 0L,
        s"bloom false negative in segment ${r.getAs[String]("c_mktsegment")}")
      assert(r.getAs[Long]("n_bloom_positive") >= r.getAs[Long]("n_actual"))
    }
  }
}
