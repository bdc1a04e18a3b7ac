package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.mr.MapReduce
import graft.operators.WordCount
import org.apache.spark.sql.functions._

/** The reference's only executable spec: word count over smallt.txt must
  * reproduce smallt_out.txt byte-for-byte (SURVEY §5.1). Exercises
  * tokenizer, lowercase, global count, lexicographic string sort, and
  * the `key\tvalue\n` sink format. */
class GoldenWordCountSpec extends SparkSpec {

  private def resource(name: String): String = {
    val url = getClass.getResource(s"/$name")
    assert(url != null, s"missing test resource $name")
    Paths.get(url.toURI).toString
  }

  test("MR-surface word count matches golden smallt_out.txt byte-for-byte") {
    val input = MapReduce.readTextInput(spark, resource("smallt.txt"))
    val result = MapReduce.runJob(input, "wordcount", "wordcount")
    val got = MapReduce.renderTsv(result)
    val want = new String(
      Files.readAllBytes(Paths.get(resource("smallt_out.txt"))),
      StandardCharsets.UTF_8)
    assert(got.length == want.length, s"length ${got.length} vs ${want.length}")
    assert(got == want)
  }

  test("declarative WordCount agrees with the MR surface") {
    import spark.implicits._
    val text = spark.read.textFile(resource("smallt.txt")).toDF("value")
    val declarative = WordCount.wordCount(text, "value")
      .select(col("word"), col("cnt").cast("string").as("value"))
      .as[(String, String)].collect().toMap
    val mr = MapReduce.runJob(
      MapReduce.readTextInput(spark, resource("smallt.txt")),
      "wordcount", "wordcount").collect().toMap
    assert(declarative == mr)
  }

  test("count invariants: total tokens preserved, counts positive") {
    import spark.implicits._
    val input = MapReduce.readTextInput(spark, resource("smallt.txt"))
    val result = MapReduce.runJob(input, "wordcount", "wordcount").collect()
    val totalFromCounts = result.map(_._2.toLong).sum
    val totalTokens = input.flatMap { case (n, c) =>
      MapReduce.builtins.map("wordcount")(n, c)
    }.count()
    assert(totalFromCounts == totalTokens)
    assert(result.forall(_._2.toLong > 0))
    // golden: 4,610 distinct tokens (BASELINE.md)
    assert(result.length == 4610)
  }

  test("counts invariant under input partitioning") {
    import spark.implicits._
    val input = MapReduce.readTextInput(spark, resource("smallt.txt"))
    val one = MapReduce.runJob(input.repartition(1), "wordcount", "wordcount")
      .collect().toMap
    val many = MapReduce.runJob(input.repartition(13), "wordcount", "wordcount",
      numPartitions = Some(7)).collect().toMap
    assert(one == many)
  }
}
