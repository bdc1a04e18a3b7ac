package graft

import org.apache.spark.sql.functions._

import graft.ext.Learn

/** Invariants for the in-engine learning primitives (naive Bayes,
  * logistic GD probe, kNN label audit). */
class LearnSpec extends SparkSpec {

  test("split-conformal interval honors the finite-sample coverage bound") {
    val r = ext.Learn.conformalPriceInterval(spark, sf0001).collect().head
    val nCal = r.getAs[Long]("n_cal")
    // the split partitions the table
    assert(r.getAs[Long]("n_train") + nCal ==
      Tables.lineitem(spark, sf0001).count())
    // cal_coverage is k/n_cal by construction of the rank fetch, and
    // k = ⌈(n+1)(1−α)⌉ makes it ≥ 1−α (the conformal guarantee's
    // empirical face); it must also be < 1 here (k < n_cal at this n)
    val cov = r.getAs[Double]("cal_coverage")
    val target = r.getAs[Double]("target_coverage")
    assert(cov >= target, s"calibration coverage $cov under target $target")
    assert(cov < 1.0)
    assert(r.getAs[Double]("qhat") > 0.0)
  }

  test("nb confusion matrix partitions the corpus and accuracy matches it") {
    val rows = Learn.nbLangConfusion(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(total == nDocs, s"matrix covers $total of $nDocs docs")
    val correct = rows.filter(r =>
      r.getAs[String]("actual_lang") == r.getAs[String]("predicted_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val acc = rows.head.getAs[Double]("accuracy")
    assert(math.abs(acc - correct.toDouble / total) < 1e-5)
  }

  test("logistic probe finds no signal on label-independent features") {
    val r = Learn.logisticReturns(spark, sf0001).collect().head
    val loss = r.getAs[Double]("log_loss")
    // random labels → loss stays near the base-rate entropy, far from 0
    assert(loss > 0.3 && loss < 1.5, s"log_loss $loss")
    val acc = r.getAs[Double]("accuracy")
    assert(acc > 0.4 && acc <= 1.0)
    // weights stay small: three steps at lr=1 on no-signal data
    assert(math.abs(r.getAs[Double]("w_quantity")) < 1.0)
  }

  test("logistic probe plans one exchange per unrolled step, no cartesian blowup") {
    val plan = Learn.logisticReturns(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
  }

  test("knn audit votes are bounded by k and the matrix covers all vectors") {
    val rows = Learn.knnLabelAudit(spark, sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(total == nVecs, s"matrix covers $total of $nVecs vectors")
    rows.foreach { r =>
      val av = r.getAs[Double]("avg_votes")
      assert(av >= 1.0 && av <= Learn.KnnK.toDouble)
    }
    val agree = rows.head.getAs[Double]("agreement")
    assert(agree >= 0.0 && agree <= 1.0)
  }

  test("knn pairwise scoring bounds neighbor state map-side") {
    val plan = Learn.knnLabelAudit(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the scored corpus must fold into a bounded heap aggregate with a
    // map-side partial (O(k) state per query per task) — never a window
    // sort over the full scored scan
    assert(plan.contains("partial_graft_bounded_topk"),
      s"no map-side bounded top-k partial in:\n$plan")
  }
}
