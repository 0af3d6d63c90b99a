package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Session extensions (SURVEY.md §2.9 / spark_guide §custom operator):
  * registers the native vector expressions in the FunctionRegistry — SQL
  * users get `float_vec_dot` / `float_vec_norm_sq` — and injects a
  * strength-reduction optimizer rule for them.
  *
  * Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      new ExpressionInfo(classOf[VectorExpressions.FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => VectorExpressions.FloatVecDot(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("float_vec_norm_sq"),
      new ExpressionInfo(classOf[VectorExpressions.FloatVecNormSq].getName, "float_vec_norm_sq"),
      (args: Seq[Expression]) => VectorExpressions.FloatVecNormSq(args(0))))
    e.injectFunction((
      FunctionIdentifier("keyword_dot"),
      new ExpressionInfo(classOf[KeywordExpressions.KeywordDot].getName, "keyword_dot"),
      (args: Seq[Expression]) => KeywordExpressions.KeywordDot(args(0), args(1))))
    e.injectOptimizerRule(_ => VectorStrengthReduction)
    e.injectOptimizerRule(_ => graft.plans.CrossScoreToInvertedJoin)
  }
}

object GraftExtensions {
  /** Register the SQL functions on an already-built session (extensions can
    * only be injected at build time; tests and notebooks use this).
    */
  def installFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_dot",
      (args: Seq[Expression]) => VectorExpressions.FloatVecDot(args(0), args(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_vec_norm_sq",
      (args: Seq[Expression]) => VectorExpressions.FloatVecNormSq(args(0)),
      "built-in")
  }
}

/** dot(x, x) ≡ Σx² — rewrite the self-dot to the cheaper single-array
  * norm-sq scan; and √s·√s → s when both factors are the same norm-sq
  * subexpression (norm-sq is non-negative). The self-dot rewrite is
  * bit-exact (same products, same order); the sqrt elimination trades the
  * 1-ulp √ round-trip for one fewer sqrt — standard strength reduction,
  * opt-in via the extension, never installed under the correctness oracle.
  */
object VectorStrengthReduction extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case VectorExpressions.FloatVecDot(a, b) if a.semanticEquals(b) =>
      VectorExpressions.FloatVecNormSq(a)
    case Multiply(Sqrt(a), Sqrt(b), _)
        if a.semanticEquals(b) && a.isInstanceOf[VectorExpressions.FloatVecNormSq] =>
      a
  }
}
