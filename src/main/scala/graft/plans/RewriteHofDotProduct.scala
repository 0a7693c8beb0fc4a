package graft.plans

import graft.functions.DotProductExpr
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native codegen kernel `DotProductExpr(a, b)`.
  *
  * Spark's HOFs evaluate interpreted (CodegenFallback) — fine as a
  * spec, ~two orders slower in a pairwise join. Users who write the
  * idiomatic declarative form get the native kernel automatically; the
  * rewrite is value-preserving because DotProductExpr folds in the same
  * sequential order over the same doubles AND mirrors the HOF null
  * semantics bit-for-bit (null array / ragged lengths via zip_with's
  * null padding / null element all yield NULL — RewriteRuleSpec), so
  * the match is safe for nullable-element and ragged arrays, not just
  * clean ones. Registered via `GraftExtensions`
  * (`injectOptimizerRule`) or `spark.experimental.extraOptimizations`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isZeroDouble(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  /** merge = (acc, v) -> acc + v over the lambda's own variables. */
  private def isPlainSum(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      acc.exprId == a.exprId && v.exprId == b.exprId
    case _ => false
  }

  /** finish = acc -> acc (identity). */
  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** zip = (x, y) -> x * y over the lambda's own variables. */
  private def isPlainProduct(zip: Expression): Boolean = zip match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, zip), zero, merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) &&
            isPlainProduct(zip) && isZeroDouble(zero) &&
            isPlainSum(merge) && isIdentity(finish) =>
        DotProductExpr(a, b)
    }
}
