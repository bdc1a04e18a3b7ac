package graft

import graft.mr.MapReduce

/** Plan-shape assertions — the 100 TB checklist items that can be
  * machine-checked (SCALE.md records the full list). */
class PlanSpec extends SparkSpec {

  test("runJob with explicit reducer count shuffles exactly once") {
    import spark.implicits._
    val input = Seq(("f", "a b c a")).toDS()
    val plan = MapReduce.runJob(input, "wordcount", "wordcount",
      numPartitions = Some(3)).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges in:\n$plan")
    assert(plan.contains(", 3)"), s"expected 3-partition exchange in:\n$plan")
  }

  test("q1 scan prunes columns and pushes the date filter") {
    val plan = operators.Relational.q1PricingSummary(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!plan.contains("l_orderkey"), "unused columns must be pruned from the scan")
    assert(plan.contains("partial_sum"), "map-side partial aggregation expected")
  }

  test("q5 joins broadcast the dimension tables") {
    val plan = operators.Relational.q5RegionRevenue(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
