package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-side answer to "this join
  * shuffles both facts every run". Writing both tables bucketed (and
  * sorted) by the join key lets every subsequent join between them run
  * with ZERO exchanges: each task reads bucket i of both sides and
  * merges. At 100 TB this converts the recurring fact-fact join from
  * two full shuffles per query into a one-time layout cost at write
  * time — the standard pattern for a curated lakehouse fact pair. */
class BucketSpec extends SparkSpec {

  test("bucketed fact-fact join plans no exchange and matches the shuffled join") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
    try {
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").option("path", s"$dir/li")
        .saveAsTable("li_bucketed")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").option("path", s"$dir/ord")
        .saveAsTable("ord_bucketed")
      // disable broadcast so the join would otherwise shuffle both sides
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("li_bucketed")
          .join(spark.table("ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n$plan")
        // same number of matched rows as the plain (shuffled) join
        val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
        assert(joined.count() == expected.count())
        val mismatch = joined.join(expected, Seq("l_orderkey", "n"), "anti").count()
        assert(mismatch == 0, s"$mismatch groups differ from the shuffled join")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Path.of(dir)
      if (Files.exists(p)) {
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f))
      }
    }
  }
}
