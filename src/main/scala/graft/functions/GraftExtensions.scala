package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ArrayEqCountExpr, DotProductExpr}

/** SparkSessionExtensions entry point: registers graft's native
  * functions into the SQL function registry, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the
  * Column API.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  * or `spark.sql.extensions=graft.functions.GraftExtensions`, or
  * imperatively on an existing session via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotFunction)
    e.injectFunction(GraftFunctions.eqCountFunction)
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  private[functions] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProductExpr].getName, "graft_dot"),
    (exprs: Seq[Expression]) => DotProductExpr(exprs.head, exprs(1)))

  private[functions] val eqCountFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_array_eq_count"),
    new ExpressionInfo(classOf[ArrayEqCountExpr].getName, "graft_array_eq_count"),
    (exprs: Seq[Expression]) => ArrayEqCountExpr(exprs.head, exprs(1)))

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_array_eq_count",
      exprs => ArrayEqCountExpr(exprs.head, exprs(1)), "scala_udf")
    // optimizer injection point for sessions whose builder we don't own
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(graft.plans.RewriteHofDotProduct)) {
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(graft.plans.RewriteHofDotProduct)
    }
  }
}
