package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{ArrayEqCountExpr, DHashBandsExpr, DotProductExpr, LshBucketExpr, ShingleSigExpr, WordNGramsExpr}

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
    GraftFunctions.all.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  /** Structural arguments (n-gram width, plane count, …) shape the
    * generated code itself, so the SQL surface requires them as
    * foldable INTEGRAL/BOOLEAN literals — the same contract
    * `ntile(n)` has. Type-checked on the literal's data type (a
    * string '3' or a decimal 3.5 is a user error with a clear
    * message, not a NumberFormatException). */
  private def litInt(fn: String, arg: String)(e: Expression): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case Literal(v: Long, org.apache.spark.sql.types.LongType) => v.toInt
    case Literal(v: Short, org.apache.spark.sql.types.ShortType) => v.toInt
    case Literal(v: Byte, org.apache.spark.sql.types.ByteType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litBool(fn: String, arg: String)(e: Expression): Boolean =
    e match {
      case Literal(v: Boolean, org.apache.spark.sql.types.BooleanType) => v
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a boolean literal, got $other")
    }

  /** Wrap a builder with an argument-count check so a wrong-arity SQL
    * call raises the contracted message, not IndexOutOfBounds. */
  private def arity(fn: String, n: Int)(b: Builder): Builder = es => {
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${es.length}")
    b(es)
  }

  /** Every native kernel on the SQL surface: name → constructor.
    * (NearestCentroidsExpr is deliberately absent — its centroid
    * matrix is plan-embedded by the Column API, not a SQL literal.) */
  private[functions] val builders: Seq[(String, String, Builder)] = Seq(
    ("graft_dot", classOf[DotProductExpr].getName,
      arity("graft_dot", 2)(es => DotProductExpr(es.head, es(1)))),
    ("graft_array_eq_count", classOf[ArrayEqCountExpr].getName,
      arity("graft_array_eq_count", 2)(es => ArrayEqCountExpr(es.head, es(1)))),
    ("graft_word_ngrams", classOf[WordNGramsExpr].getName,
      arity("graft_word_ngrams", 3)(es => WordNGramsExpr(es.head,
        litInt("graft_word_ngrams", "n")(es(1)),
        litBool("graft_word_ngrams", "distinct")(es(2))))),
    ("graft_word_ngram_hashes",
      classOf[org.apache.spark.sql.graft.WordNGramHashesExpr].getName,
      arity("graft_word_ngram_hashes", 2)(es =>
        org.apache.spark.sql.graft.WordNGramHashesExpr(es.head,
          litInt("graft_word_ngram_hashes", "n")(es(1))))),
    ("graft_shingle_sig", classOf[ShingleSigExpr].getName,
      arity("graft_shingle_sig", 2)(es => ShingleSigExpr(es.head,
        litInt("graft_shingle_sig", "width")(es(1))))),
    ("graft_lsh_bucket", classOf[LshBucketExpr].getName,
      arity("graft_lsh_bucket", 2)(es => LshBucketExpr(es.head,
        litInt("graft_lsh_bucket", "numPlanes")(es(1))))),
    ("graft_dhash_bands", classOf[DHashBandsExpr].getName,
      arity("graft_dhash_bands", 1)(es => DHashBandsExpr(es.head))),
    // the two bounded-heap aggregates behind grouped top-k, the KMV
    // sketch, and the quantile sketch — a raw AggregateFunction from
    // the registry is wrapped by the analyzer, so plain SQL GROUP BY
    // gets the same O(k)-per-group state algebra as the Column API
    ("graft_topk", classOf[org.apache.spark.sql.graft.BoundedTopKAgg].getName,
      arity("graft_topk", 2)(es => org.apache.spark.sql.graft.BoundedTopKAgg(
        es.head, litInt("graft_topk", "k")(es(1))))),
    ("graft_distinct_topk",
      classOf[org.apache.spark.sql.graft.BoundedDistinctTopKAgg].getName,
      arity("graft_distinct_topk", 2)(es =>
        org.apache.spark.sql.graft.BoundedDistinctTopKAgg(
          es.head, litInt("graft_distinct_topk", "k")(es(1))))))

  private[functions] val all
      : Seq[(FunctionIdentifier, ExpressionInfo, Builder)] =
    builders.map { case (name, cls, b) =>
      (FunctionIdentifier(name), new ExpressionInfo(cls, name), b)
    }

  /** Imperative registration on a live session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "scala_udf")
    }
    // optimizer injection point for sessions whose builder we don't own
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(graft.plans.RewriteHofDotProduct)) {
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(graft.plans.RewriteHofDotProduct)
    }
  }
}
