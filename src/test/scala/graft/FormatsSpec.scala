package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  test("JSON-lines round-trip; malformed lines surface as corrupt records") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    Formats.writeJsonLines(df, s"$dir/out")
    // drop a malformed line in as its own file (appending to a part
    // file would break its Hadoop .crc sidecar)
    Files.writeString(
      java.nio.file.Path.of(dir, "out", "extra.json"), "{not json\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("_corrupt_record", StringType)))
    val back = Formats.readJsonLines(spark, s"$dir/out", schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(col("_corrupt_record").isNull).count() == 2)
    back.unpersist()
  }

  test("TSV round-trip preserves key/value rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tsv2").toString
    val df = Seq(("k1", 10L), ("k2", 20L)).toDF("key", "value")
    Formats.writeTsv(df, s"$dir/out")
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", LongType)))
    val back = Formats.readTsv(spark, s"$dir/out", schema)
    assert(back.as[(String, Long)].collect().toMap == Map("k1" -> 10L, "k2" -> 20L))
  }

  test("binaryFile source exposes payload bytes and metadata") {
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("x.bin"), Array[Byte](1, 2, 3))
    val df = Formats.readBinary(spark, dir.toString, "*.bin")
    val row = df.select("length", "content").collect()(0)
    assert(row.getLong(0) == 3)
    assert(row.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, 2, 3))
  }

  test("bucketed tables join without an exchange") {
    import spark.implicits._
    // clean any leftover table/location from an earlier aborted run
    Seq("bucket_a", "bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "av")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "bv")
    Formats.writeBucketed(a, "bucket_a", "k", 4)
    Formats.writeBucketed(b, "bucket_b", "k", 4)
    // force the shuffle-join path (broadcast would bypass bucketing on
    // a table this small; at scale both sides are too big to broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be exchange-free, got:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE bucket_a"); spark.sql("DROP TABLE bucket_b")
    }
  }
}
