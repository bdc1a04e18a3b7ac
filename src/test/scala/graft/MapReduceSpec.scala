package graft

import graft.mr.MapReduce
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class MapReduceSpec extends SparkSpec {

  test("registry: unknown function name fails fast") {
    intercept[NoSuchElementException](MapReduce.builtins.map("nope"))
    intercept[NoSuchElementException](MapReduce.builtins.reduce("nope"))
  }

  test("generic map/reduce pairs compose: lines + sum") {
    import spark.implicits._
    val input = Seq(
      ("f1", "a\nb\na"),
      ("f2", "a\nc")).toDS()
    val counts = MapReduce.runJob(input, "lines", "sum").collect().toMap
    assert(counts == Map("a" -> "3", "b" -> "1", "c" -> "1"))
    val maxes = MapReduce.runJob(input, "lines", "max").collect().toMap
    assert(maxes == Map("a" -> "1", "b" -> "1", "c" -> "1"))
  }

  test("inverted index plugin pair: distinct sorted postings through runJob") {
    import spark.implicits._
    val input = Seq(
      ("docB", "Red green RED"), // repeated + mixed-case token: ONE posting
      ("docA", "green blue"),
      ("docC", "blue, blue; red!")).toDS()
    val out = MapReduce.runJob(input, "inverted_index", "posting_list")
      .collect().toMap
    assert(out == Map(
      "red" -> "docB,docC",
      "green" -> "docA,docB",
      "blue" -> "docA,docC"))
  }

  test("identity map + concat reduce keep values grouped per file") {
    import spark.implicits._
    val input = Seq(("k1", "v1"), ("k1", "v2"), ("k2", "v3")).toDS()
    val out = MapReduce.runJob(input, "identity", "concat").collect().toMap
    assert(out == Map("k1" -> "v1,v2", "k2" -> "v3"))
  }

  test("incremental Aggregator reducers agree with holistic reducers") {
    import spark.implicits._
    val input = Seq(
      ("f1", "a b a c b a"),
      ("f2", "a c d")).toDS()
    val holistic = MapReduce.runJob(input, "wordcount", "wordcount")
      .collect().toMap
    val incremental = graft.mr.ReduceAgg
      .runJobIncremental(input, "wordcount", graft.mr.ReduceAgg.countAgg)
      .collect().toMap
    assert(incremental == holistic)
    // partial aggregation appears in the plan (the reference shuffled
    // every (word,"1") pair — SURVEY §2.4 notes the combiner is absent)
    val plan = graft.mr.ReduceAgg
      .runJobIncremental(input, "wordcount", graft.mr.ReduceAgg.countAgg)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"expected partial agg in:\n$plan")
  }

  test("salted join equals plain join") {
    import spark.implicits._
    // skewed large side: key 1 dominates
    val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i.toLong))
      .toDF("k", "row_id")
    val small = Seq((1L, "one"), (950L, "x"), (2000L, "unused"))
      .toDF("k", "label")
    val salted = SkewJoin.saltedJoin(large, small, "k", "row_id", buckets = 4)
      .select("k", "row_id", "label")
    val plain = large.join(small, "k").select("k", "row_id", "label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }
}
