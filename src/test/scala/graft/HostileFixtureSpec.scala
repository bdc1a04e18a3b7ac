package graft

import org.apache.spark.sql.functions._

/** Adversarial-SHAPE hardening: the 10×/100× probes stress SIZE; this
  * suite stresses shape — the degenerate layouts a 100 TB lake will
  * eventually contain, which small well-behaved fixtures never show:
  *
  *   - a mega duplicate cluster (3,000 near-identical docs → one LSH
  *     bucket orders of magnitude over the star-cap; the scaled-down
  *     stand-in for the 10⁶-member bucket a crawl of a template site
  *     produces),
  *   - sub-[[graft.ext.TextAnalysis.BoilerN]]-token and EMPTY texts
  *     (every 0/0 gram-fraction gate fires),
  *   - the eval source ([[graft.ext.TextAnalysis.EvalSource]]) absent
  *     entirely — target language models with zero mass,
  *   - a 0-row events table (every streaming bounded replay and every
  *     event scalar runs over nothing),
  *   - an all-ties lineitem group (zero variance, vmin == vmax: every
  *     width_bucket / z-score / quantile path hits its degenerate arm),
  *   - identical embedding vectors en masse plus an all-zero vector
  *     (k-means ties, zero norms, zero-variance dimensions).
  *
  * The assertion is NO-THROW + a sane row count per query, not oracle
  * parity (DuckDB comparison stays at the driver gate on the real
  * fixture); a hostile shape must degrade to empty/NULL rows, never to
  * an exception or a hang.
  */
class HostileFixtureSpec extends SparkSpec {

  private lazy val hostileDir: String = {
    val base = sf0001
    val out = "/tmp/graft_hostile_fixture_v2"
    val marker = new java.io.File(s"$out/_built")
    if (!marker.exists()) {
      // dims + orders: unchanged copies
      Seq("region", "nation", "customer", "supplier", "part", "orders")
        .foreach { t =>
          spark.read.parquet(s"$base/$t.parquet")
            .write.mode("overwrite").parquet(s"$out/$t.parquet")
        }
      // lineitem: one all-ties group — every 'R' row carries the same
      // price and quantity (vmin == vmax inside the group)
      spark.read.parquet(s"$base/lineitem.parquet")
        .withColumn("l_extendedprice",
          when(col("l_returnflag") === "R", lit(1000.0))
            .otherwise(col("l_extendedprice")))
        .withColumn("l_quantity",
          when(col("l_returnflag") === "R", lit(10.0))
            .otherwise(col("l_quantity")))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // events: the 0-row table (schema preserved, zero rows)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$base/events.parquet")
        .filter(lit(false))
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      // documents: drop the eval source entirely; add a 3,000-member
      // near-identical cluster (one shared 9-token body, a 1-token
      // tail in 7 variants — every signature scheme buckets them
      // together) and gramless/empty/whitespace texts
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val mega = spark.range(3000)
        .select((col("id") + 50000000L).as("doc_id"),
          concat(lit("shared template header quick brown fox lazy dog tail"),
            lit(" v"), (col("id") % 7).cast("string")).as("text"),
          lit("en").as("lang"), lit("srcmega").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val tiny = spark.range(5)
        .select((col("id") + 60000000L).as("doc_id"),
          element_at(array(lit(""), lit("   "), lit("ab"), lit("one two three"),
            lit("contact leak a@b.io 10.0.0.1 555-123-4567 123-45-6789")),
            (col("id") + 1).cast("int")).as("text"),
          lit("en").as("lang"), lit("srctiny").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      docs.filter(col("source") =!= graft.ext.TextAnalysis.EvalSource)
        .unionByName(mega).unionByName(tiny)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      // embeddings: first 100 vectors identical (k-means seed/assignment
      // ties), one all-zero vector (zero norm), rest unchanged
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val zeroed = emb
        .withColumn("embedding",
          when(col("vec_id") < 100,
            expr("transform(embedding, x -> CAST(0.25 AS FLOAT))"))
            .otherwise(col("embedding")))
      val zeroVec = emb.limit(1)
        .select(lit(70000000L).as("vec_id"),
          expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").as("embedding"),
          col("label"))
      zeroed.unionByName(zeroVec)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      marker.getParentFile.mkdirs(); marker.createNewFile()
    }
    out
  }

  test("every query survives the hostile-shaped corpus (no throw, no hang)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, hostileDir).count()
          if (n < 0) Some(s"$name: negative count") else None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).linesIterator.take(1).mkString.take(180))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed on the hostile fixture:\n" +
        failures.mkString("\n"))
  }
}
