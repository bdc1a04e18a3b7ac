package graft

/** Prints condensed physical-plan diagnostics (joins, exchanges,
  * window limits, scans) for each SparkEntry query — the manual
  * `.explain` audit loop, scriptable: `runMain graft.PlanAudit [names…]`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession("graft-plan-audit", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val wanted = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    val interesting = Seq("Join", "Exchange", "WindowGroupLimit", "FileScan",
      "CartesianProduct", "Window ", "HashAggregate", "Sort ")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => wanted(q._1)).foreach { case (name, fn) =>
        println(s"== $name ==")
        try {
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          plan.linesIterator
            .filter(l => interesting.exists(l.contains))
            .map(_.replaceAll("#\\d+L?", "").trim.take(160))
            .foreach(l => println(s"  $l"))
        } catch { case e: Throwable => println(s"  audit failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
