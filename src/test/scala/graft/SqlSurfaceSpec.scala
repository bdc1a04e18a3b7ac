package graft

import org.apache.spark.sql.functions._

/** The SQL text surface: the same engine through `spark.sql` over temp
  * views — what a reference user migrating ad-hoc queries would type.
  * Results must match the DataFrame formulations exactly (same plans
  * underneath), and graft's native SQL functions must resolve. */
class SqlSurfaceSpec extends SparkSpec {

  test("TPC-H q1 via SQL text equals the DataFrame form") {
    Tables.lineitem(spark, sf0001).createOrReplaceTempView("lineitem_v")
    val sqlForm = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    val dfForm = operators.Relational.q1PricingSummary(spark, sf0001)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("every native kernel resolves in SQL text and matches its Column form") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"),
        graft.ext.TextAnalysis.tokens(col("text")).as("toks"))
      .createOrReplaceTempView("docs_v")
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_sql_v")
    val ngramsSql = spark.sql(
      "SELECT doc_id, graft_word_ngrams(toks, 3, false) AS g FROM docs_v ORDER BY doc_id")
    val ngramsCol = spark.table("docs_v")
      .select(col("doc_id"),
        graft.functions.WordNGrams(col("toks"), 3, distinct = false).as("g"))
      .orderBy("doc_id")
    assert(ngramsSql.collect().toSeq == ngramsCol.collect().toSeq)
    val sigSql = spark.sql(
      "SELECT doc_id, graft_shingle_sig(text, 5) AS s FROM docs_v ORDER BY doc_id")
    val sigCol = spark.table("docs_v")
      .select(col("doc_id"), graft.functions.ShingleSig(col("text"), 5).as("s"))
      .orderBy("doc_id")
    assert(sigSql.collect().toSeq == sigCol.collect().toSeq)
    val lshSql = spark.sql(
      "SELECT vec_id, graft_lsh_bucket(v, 8) AS b FROM emb_sql_v ORDER BY vec_id")
    val lshCol = spark.table("emb_sql_v")
      .select(col("vec_id"), graft.functions.LshBucket(col("v"), 8).as("b"))
      .orderBy("vec_id")
    assert(lshSql.collect().toSeq == lshCol.collect().toSeq)
    val dhashSql = spark.sql(
      "SELECT doc_id, graft_dhash_bands(CAST(text AS BINARY)) AS d FROM docs_v ORDER BY doc_id")
    val dhashCol = spark.table("docs_v")
      .select(col("doc_id"),
        graft.functions.DHashBands(col("text").cast("binary")).as("d"))
      .orderBy("doc_id")
    assert(dhashSql.collect().toSeq == dhashCol.collect().toSeq)
    // the bounded-heap aggregates: a per-source bottom-k quantile-
    // sketch sample written as plain SQL GROUP BY
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .createOrReplaceTempView("docs_agg_v")
    val topkSql = spark.sql(
      """SELECT source, graft_distinct_topk(
        |    named_struct('h', md5(CAST(doc_id AS STRING)),
        |                 'v', CAST(n_chars AS DOUBLE)), 8) AS s
        |FROM docs_agg_v GROUP BY source ORDER BY source""".stripMargin)
    val topkCol = spark.table("docs_agg_v")
      .groupBy("source")
      .agg(graft.functions.BoundedDistinctTopK(8,
        struct(md5(col("doc_id").cast("string")).as("h"),
          col("n_chars").cast("double").as("v"))).as("s"))
      .orderBy("source")
    assert(topkSql.collect().toSeq == topkCol.collect().toSeq)
    val plainTopkSql = spark.sql(
      """SELECT source, graft_topk(
        |    named_struct('v', CAST(n_chars AS DOUBLE),
        |                 'id', CAST(doc_id AS BIGINT)), 3) AS s
        |FROM docs_agg_v GROUP BY source ORDER BY source""".stripMargin)
    val plainTopkCol = spark.table("docs_agg_v")
      .groupBy("source")
      .agg(graft.functions.BoundedTopK(3,
        struct(col("n_chars").cast("double").as("v"),
          col("doc_id").cast("bigint").as("id"))).as("s"))
      .orderBy("source")
    assert(plainTopkSql.collect().toSeq == plainTopkCol.collect().toSeq)
    // structural args must be literals — a column there is a user error
    val err = intercept[Exception](spark.sql(
      "SELECT graft_word_ngrams(toks, CAST(doc_id AS INT), false) FROM docs_v").collect())
    assert(err.getMessage.contains("integer literal")
      || String.valueOf(err.getCause).contains("integer literal"))
  }

  test("native functions resolve in SQL text") {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .createOrReplaceTempView("emb_v")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_dot(v, v) AS dp FROM emb_v ORDER BY vec_id")
    val viaCol = spark.table("emb_v")
      .select(col("vec_id"), graft.functions.DotProduct(col("v"), col("v")).as("dp"))
      .orderBy("vec_id")
    assert(viaSql.collect().toSeq == viaCol.collect().toSeq)
  }
}
