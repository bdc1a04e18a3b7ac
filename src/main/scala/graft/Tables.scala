package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Parquet scans give Catalyst
  * column pruning + predicate pushdown for free — at 100 TB these tables
  * would be partitioned directories (e.g. orders by month) and the same
  * reads would partition-prune; nothing here assumes single-file input.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS) in others. Normalize either to a
    * session-TZ TimestampType at µs precision — exactly what DuckDB holds
    * after coercing to its µs TIMESTAMP, so the oracle sees identical
    * instants regardless of the fixture vintage. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos read as raw long (legacy.parquet.nanosAsLong)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>        // native µs timestamp (NTZ or LTZ); unify on TimestampType
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // ── typed surface (case-class Encoders) for compile-time field
  //    checks where per-row logic warrants it ──

  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double, l_tax: Double,
                      l_returnflag: String, l_linestatus: String,
                      l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  def lineitemDS(s: SparkSession, d: String): Dataset[Lineitem] = {
    import s.implicits._; lineitem(s, d).as[Lineitem]
  }
  def ordersDS(s: SparkSession, d: String): Dataset[Order] = {
    import s.implicits._; orders(s, d).as[Order]
  }
  def documentsDS(s: SparkSession, d: String): Dataset[Document] = {
    import s.implicits._; documents(s, d).as[Document]
  }
}
