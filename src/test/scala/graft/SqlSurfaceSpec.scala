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
