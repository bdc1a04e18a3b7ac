package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native as-of join operator (AsOfJoinPlan/Strategy/Exec). */
class AsOfSpec extends SparkSpec {

  test("native as-of join matches the join+rank composition and plans one shuffle per side") {
    val out = operators.EventOps.asofNative(spark, sf0001)

    // reference computation: full inequality join, rank, keep rk=1 —
    // exact but quadratic; fine at sf0.001
    val ev = Tables.events(spark, sf0001)
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("cu"), col("ts").as("click_ts"))
    val w = Window.partitionBy("event_id")
      .orderBy(col("click_ts").desc, col("click_id").desc)
    val expected = e.join(c, col("user_id") === col("cu") &&
        col("click_ts") <= col("ts"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))

    assert(out.count() === expected.count())
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty,
      "native as-of result differs from the join+rank composition")

    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"native operator missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected one shuffle per side, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"no window pass expected:\n$plan")
  }

  test("as-of join: left rows with no floor match are dropped, ties break by tiebreak") {
    import spark.implicits._
    val probes = Seq((1L, 100L), (1L, 5L), (2L, 50L), (3L, 10L))
      .toDF("k", "t")
    // the None row sorts NULLS FIRST within its key and must be
    // skipped, not park the merge
    val refs = Seq((1L, Option(10L), "a"), (1L, Option(100L), "b"),
      (1L, Option(100L), "c"), (1L, Option.empty[Long], "z"),
      (2L, Option(60L), "d")).toDF("rk_", "rt", "tag")
    val joined = org.apache.spark.sql.graft.AsOfJoinPlan.dataset(
      probes, refs, probes.col("k"), refs.col("rk_"),
      probes.col("t"), refs.col("rt"), refs.col("tag"))
    val got = joined.select("k", "t", "tag").as[(Long, Long, String)]
      .collect().toSet
    // (1,100) floor is rt=100, tie b/c -> max tag "c"; (1,5) has no
    // ref <= 5 -> dropped; (2,50) has none <= 50 -> dropped; key 3
    // absent -> dropped
    assert(got == Set((1L, 100L, "c")))

    // outer: the three no-match probes survive with a null right side
    val outer = org.apache.spark.sql.graft.AsOfJoinPlan.dataset(
      probes, refs, probes.col("k"), refs.col("rk_"),
      probes.col("t"), refs.col("rt"), refs.col("tag"), isOuter = true)
    val gotOuter = outer.select("k", "t", "tag")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(gotOuter == Set((1L, 100L, Some("c")), (1L, 5L, None),
      (2L, 50L, None), (3L, 10L, None)))

    // tolerance: probe (1,100) floor is rt=100 (gap 0, within any
    // tolerance); shrink the window so a stale floor is rejected —
    // probe t=100 vs a floor at rt=10 with tolerance 50 must not match
    val probes2 = Seq((1L, 100L)).toDF("k", "t")
    val refs2 = Seq((1L, Option(10L), "a")).toDF("rk_", "rt", "tag")
    val tol = org.apache.spark.sql.graft.AsOfJoinPlan.dataset(
      probes2, refs2, probes2.col("k"), refs2.col("rk_"),
      probes2.col("t"), refs2.col("rt"), refs2.col("tag"),
      isOuter = true, toleranceUs = Some(50L))
    assert(tol.select("tag").as[Option[String]].collect().toSeq ==
      Seq(None), "out-of-tolerance floor must not match")
  }

  test("forward as-of picks the earliest ceiling, min tiebreak, tolerance-bounded") {
    import spark.implicits._
    val probes = Seq((1L, 50L), (1L, 70L), (2L, 10L)).toDF("k", "t")
    val refs = Seq((1L, 10L, "a"), (1L, 60L, "b1"), (1L, 60L, "b2"),
      (1L, 90L, "c")).toDF("rk_", "rt", "tag")
    def run(tol: Option[Long]) =
      org.apache.spark.sql.graft.AsOfJoinPlan.dataset(
        probes, refs, probes.col("k"), refs.col("rk_"),
        probes.col("t"), refs.col("rt"), refs.col("tag"),
        isOuter = true, toleranceUs = tol, forward = true)
        .select("k", "t", "tag").as[(Long, Long, Option[String])]
        .collect().toSet
    // t=50 -> ceiling 60, tie b1/b2 -> MIN tiebreak "b1"; t=70 -> 90;
    // key 2 has no refs -> null
    assert(run(None) == Set((1L, 50L, Some("b1")), (1L, 70L, Some("c")),
      (2L, 10L, None)))
    // tolerance 15: 60-50=10 ok; 90-70=20 too far
    assert(run(Some(15L)) == Set((1L, 50L, Some("b1")), (1L, 70L, None),
      (2L, 10L, None)))
  }
}
