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
