package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-contract audit — the constraint gate a lake pipeline runs
  * before any analytics or curation touches a drop: primary-key
  * uniqueness, referential integrity, not-null, and domain checks
  * across every fixture table, one verdict row per named check (the
  * dbt-test / expectation-suite verb).
  *
  * Scale shape: every row-local check (pk / not-null / domain) is one
  * scan-aggregate with map-side partials — violation counting costs
  * what the scan costs; every referential check is ONE left-anti hash
  * join from the child's key projection against the parent's distinct
  * key (keyed shuffle, broadcast when the parent is dimension-sized —
  * AQE's call), so nothing is ever pairwise and the audit
  * parallelizes like the underlying tables. All outputs are exact
  * integer counts — no float surface anywhere, so the report is
  * hash-stable by construction.
  *
  * Null semantics are pinned: a NULL never satisfies a domain
  * predicate, so it counts as a violation of the domain check (the
  * CASE WHEN <pred> THEN 0 ELSE 1 form, identical in both engines);
  * referential checks audit non-null child keys only (the not-null
  * checks own the nulls); composite-key uniqueness counts distinct
  * key TUPLES (struct/ROW in both engines). */
object Contract {

  /** A row-local check's aggregate pair: (n_checked, n_violations). */
  private type CheckAgg = (Column, Column)

  def dataContractAudit(spark: SparkSession, dir: String): DataFrame = {
    // pk: duplicate mass = rows − distinct key tuples
    def pk(keys: String*): CheckAgg =
      (count(lit(1)),
        count(lit(1)) - countDistinct(struct(keys.map(col): _*)))
    // domain / not-null: NULL fails the predicate ⇒ counts as violation
    def dom(ok: Column): CheckAgg =
      (count(lit(1)), coalesce(sum(when(ok, 0L).otherwise(1L)), lit(0L)))

    // Every row-local check (pk / not-null / domain) of one table
    // rides ONE scan-aggregate, reshaped to its check rows by a
    // fixed-size explode — the 28-check audit previously paid a
    // column-pruned scan PER check (20 row-local scans); now one per
    // table (10). Deliberately LAZY: the whole report is one union
    // materialized by one action, so the per-table aggregates run as
    // parallel stages of that action (an eager per-table checkpoint
    // was tried and measured SLOWER — it serializes the table scans
    // into driver-sequenced jobs).
    def tableChecks(table: String, df: DataFrame,
                    rowChecks: Seq[(String, CheckAgg)]): DataFrame = {
      val aggs = rowChecks.zipWithIndex.flatMap { case ((_, (nc, nv)), i) =>
        Seq(nc.as(s"_c$i"), nv.as(s"_v$i")) }
      df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(
          rowChecks.zipWithIndex.map { case ((id, _), i) =>
            struct(lit(id).as("check_id"), lit(table).as("table_name"),
              col(s"_c$i").cast("long").as("n_checked"),
              col(s"_v$i").cast("long").as("n_violations"))
          }: _*)).as("e"))
        .select(col("e.*"))
        .withColumn("pass", col("n_violations") === 0)
    }

    // fk: orphaned non-null child keys (one anti join vs distinct
    // parent); n_checked is its own column-pruned count scan — lazy,
    // so it runs as a parallel stage like everything else
    def fk(id: String, table: String, child: DataFrame, key: String,
           parent: DataFrame, pkey: String): DataFrame = {
      val c = child.select(col(key)).filter(col(key).isNotNull)
      val orphans = c
        .join(parent.select(col(pkey).as(key)).distinct(), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      c.agg(count(lit(1)).as("n_checked"))
        .crossJoin(broadcast(orphans)) // 1-row agg: BNLJ, never cartesian
        .select(lit(id).as("check_id"), lit(table).as("table_name"),
          col("n_checked").cast("long").as("n_checked"),
          col("n_violations").cast("long").as("n_violations"),
          (col("n_violations") === 0).as("pass"))
    }

    val cu = Tables.customer(spark, dir); val or = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir); val pa = Tables.part(spark, dir)
    val su = Tables.supplier(spark, dir); val na = Tables.nation(spark, dir)
    val re = Tables.region(spark, dir); val dc = Tables.documents(spark, dir)
    val em = Tables.embeddings(spark, dir); val ev = Tables.events(spark, dir)

    Seq(
      tableChecks("customer", cu, Seq("pk_customer" -> pk("c_custkey"))),
      tableChecks("orders", or, Seq(
        "pk_orders" -> pk("o_orderkey"),
        "nn_orders_custkey" -> dom(col("o_custkey").isNotNull),
        "dom_orders_status" -> dom(col("o_orderstatus").isin("F", "O", "P")),
        "dom_orders_totalprice" -> dom(col("o_totalprice") > 0))),
      tableChecks("lineitem", li, Seq(
        "pk_lineitem" -> pk("l_orderkey", "l_linenumber"),
        "dom_lineitem_quantity" -> dom(col("l_quantity") > 0),
        "dom_lineitem_discount" ->
          dom(col("l_discount") >= 0 && col("l_discount") <= 1),
        "dom_lineitem_returnflag" ->
          dom(col("l_returnflag").isin("A", "N", "R")))),
      tableChecks("part", pa, Seq("pk_part" -> pk("p_partkey"))),
      tableChecks("supplier", su, Seq("pk_supplier" -> pk("s_suppkey"))),
      tableChecks("nation", na, Seq("pk_nation" -> pk("n_nationkey"))),
      tableChecks("region", re, Seq("pk_region" -> pk("r_regionkey"))),
      tableChecks("documents", dc, Seq(
        "pk_documents" -> pk("doc_id"),
        "nn_documents_text" -> dom(col("text").isNotNull),
        "dom_documents_nchars" ->
          dom(col("n_chars") === length(col("text"))))),
      tableChecks("embeddings", em, Seq("pk_embeddings" -> pk("vec_id"))),
      tableChecks("events", ev, Seq(
        "pk_events" -> pk("event_id"),
        "nn_events_ts" -> dom(col("ts").isNotNull),
        "dom_events_type" ->
          dom(col("event_type").isNotNull && length(col("event_type")) > 0))),
      fk("fk_lineitem_orders", "lineitem", li, "l_orderkey", or, "o_orderkey"),
      fk("fk_lineitem_part", "lineitem", li, "l_partkey", pa, "p_partkey"),
      fk("fk_lineitem_supplier", "lineitem", li, "l_suppkey", su, "s_suppkey"),
      fk("fk_orders_customer", "orders", or, "o_custkey", cu, "c_custkey"),
      fk("fk_customer_nation", "customer", cu, "c_nationkey",
        na, "n_nationkey"),
      fk("fk_supplier_nation", "supplier", su, "s_nationkey",
        na, "n_nationkey"),
      fk("fk_nation_region", "nation", na, "n_regionkey", re, "r_regionkey"),
      fk("fk_embeddings_documents", "embeddings", em, "vec_id",
        dc, "doc_id"))
      .reduce(_ unionByName _)
      .orderBy("check_id")
  }

  /** Benford first-digit audit over order totals — the numeric-
    * integrity screen for fabricated or truncated monetary data:
    * observed first-digit shares vs Benford's log₁₀(1 + 1/d), with
    * per-digit chi-square contributions. Digit extraction is pinned
    * engine-identical: round the double to an INTEGER (both engines
    * round positive halves up), then take the first character of the
    * integer's decimal string — no log10-of-double boundary risk, no
    * double→string formatting ambiguity. The expected shares are ONE
    * set of constants computed here and interpolated into both the
    * Column expressions and the oracle SQL, so they cannot drift.
    * Cost: one scan into a 9-cell hash aggregate; the 9-row digit
    * grid is broadcast for densification (an absent digit is a
    * 0-count row, not a missing row). */
  def benfordTotalprice(spark: SparkSession, dir: String): DataFrame = {
    val digits = spark.range(1, 10).select(col("id").as("digit"))
    val counts = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice"), 0).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_orders"))
    val total = counts.agg(sum(col("n_orders")).as("n_total"))
    digits.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .crossJoin(broadcast(total)) // 1-row total: BNLJ, never cartesian
      .withColumn("expected_p", benfordExpected)
      .select(col("digit"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n_total"), 6)
          .as("observed_p"),
        col("expected_p"),
        round(pow(col("n_orders") - col("expected_p") * col("n_total"), 2) /
          (col("expected_p") * col("n_total")), 6).as("chi2_term"))
      .orderBy("digit")
  }

  /** log₁₀(1 + 1/d) rounded to 6, as a CASE over the digit — the ONE
    * constant table both engines read (see [[benfordExpectedSql]]). */
  private def benfordExpected: Column =
    (1 to 9).foldLeft(lit(null).cast("double")) { (acc, d) =>
      when(col("digit") === d, lit(benfordP(d))).otherwise(acc)
    }
  private def benfordP(d: Int): Double =
    BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def benfordExpectedSql: String =
    (1 to 9).map(d => s"WHEN $d THEN ${benfordP(d)}")
      .mkString("CASE digit ", " ", " END")

  def benfordTotalpriceOracle: String =
    s"""WITH c AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice, 0)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(COUNT(*) AS BIGINT) AS n_orders
       |  FROM orders GROUP BY 1),
       |g AS (SELECT unnest(range(1, 10)) AS digit),
       |t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total FROM c),
       |d AS (SELECT g.digit, COALESCE(c.n_orders, 0) AS n_orders,
       |    $benfordExpectedSql AS expected_p
       |  FROM g LEFT JOIN c USING (digit))
       |SELECT digit, n_orders,
       |  round(CAST(n_orders AS DOUBLE) / n_total, 6) AS observed_p,
       |  expected_p,
       |  round(pow(n_orders - expected_p * n_total, 2) /
       |    (expected_p * n_total), 6) AS chi2_term
       |FROM d, t ORDER BY digit""".stripMargin

  def dataContractAuditOracle: String = {
    def pk(id: String, table: String, keys: String*): String = {
      val tup =
        if (keys.length == 1) keys.head else keys.mkString("ROW(", ", ", ")")
      s"""SELECT '$id' AS check_id, '$table' AS table_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_checked,
         |  CAST(COUNT(*) - COUNT(DISTINCT $tup) AS BIGINT) AS n_violations
         |FROM $table""".stripMargin
    }
    def fk(id: String, table: String, key: String,
           parent: String, pkey: String): String =
      s"""SELECT '$id', '$table',
         |  CAST((SELECT COUNT(*) FROM $table WHERE $key IS NOT NULL) AS BIGINT),
         |  CAST((SELECT COUNT(*) FROM $table c
         |        WHERE c.$key IS NOT NULL
         |          AND NOT EXISTS (SELECT 1 FROM $parent p
         |                          WHERE p.$pkey = c.$key)) AS BIGINT)""".stripMargin
    def dom(id: String, table: String, ok: String): String =
      s"""SELECT '$id', '$table', CAST(COUNT(*) AS BIGINT),
         |  CAST(COALESCE(SUM(CASE WHEN $ok THEN 0 ELSE 1 END), 0) AS BIGINT)
         |FROM $table""".stripMargin
    val rows = Seq(
      pk("pk_customer", "customer", "c_custkey"),
      pk("pk_orders", "orders", "o_orderkey"),
      pk("pk_lineitem", "lineitem", "l_orderkey", "l_linenumber"),
      pk("pk_part", "part", "p_partkey"),
      pk("pk_supplier", "supplier", "s_suppkey"),
      pk("pk_nation", "nation", "n_nationkey"),
      pk("pk_region", "region", "r_regionkey"),
      pk("pk_documents", "documents", "doc_id"),
      pk("pk_embeddings", "embeddings", "vec_id"),
      pk("pk_events", "events", "event_id"),
      fk("fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fk("fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      fk("fk_lineitem_supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      fk("fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fk("fk_customer_nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      fk("fk_supplier_nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"),
      fk("fk_nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
      fk("fk_embeddings_documents", "embeddings", "vec_id",
        "documents", "doc_id"),
      dom("nn_orders_custkey", "orders", "o_custkey IS NOT NULL"),
      dom("nn_events_ts", "events", "ts IS NOT NULL"),
      dom("nn_documents_text", "documents", "text IS NOT NULL"),
      dom("dom_lineitem_quantity", "lineitem", "l_quantity > 0"),
      dom("dom_lineitem_discount", "lineitem",
        "l_discount >= 0 AND l_discount <= 1"),
      dom("dom_lineitem_returnflag", "lineitem",
        "l_returnflag IN ('A', 'N', 'R')"),
      dom("dom_orders_status", "orders", "o_orderstatus IN ('F', 'O', 'P')"),
      dom("dom_orders_totalprice", "orders", "o_totalprice > 0"),
      dom("dom_documents_nchars", "documents", "n_chars = length(text)"),
      dom("dom_events_type", "events",
        "event_type IS NOT NULL AND length(event_type) > 0"))
    s"""SELECT check_id, table_name, n_checked, n_violations,
       |  n_violations = 0 AS pass
       |FROM (${rows.mkString("\n", "\nUNION ALL\n", "\n")}) c(check_id,
       |  table_name, n_checked, n_violations)
       |ORDER BY check_id""".stripMargin
  }
}
