package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.DotProductExpr
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (s, v) => s + v) }}}
  *
  * into the native codegen'd [[DotProductExpr]]. Spark evaluates HOF
  * lambdas interpreted, outside whole-stage codegen — measured 10×+
  * slower on pairwise-similarity hot loops (see DotProductExpr's
  * header). With this rule a user can write the idiomatic declarative
  * form and still get the tight primitive-double loop.
  *
  * Semantics preserved for the shape the pattern implies — equal-length
  * arrays of non-null doubles (embedding columns): both forms are the
  * identical sequential left-to-right IEEE fold. The two forms diverge
  * only on ragged pairs (zip_with null-pads, the kernel stops at the
  * shorter length) or null elements, so the rule is opt-in via
  * [[graft.functions.GraftExtensions]] / GraftFunctions.install rather
  * than always-on.
  *
  * Runs on resolved plans (optimizer phase), so lambda variables are
  * bound [[NamedLambdaVariable]]s compared by exprId.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(sAcc: NamedLambdaVariable, sEl: NamedLambdaVariable, _),
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fAcc: NamedLambdaVariable), _))
          if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
            mx.exprId == x.exprId && my.exprId == y.exprId &&
            sAcc.exprId == acc.exprId && sEl.exprId == el.exprId &&
            fin.exprId == fAcc.exprId =>
        DotProductExpr(a, b)
    }
}
