package graft.plans

import graft.functions.CosineHof
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the BUILTIN higher-order-function cosine
  * formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, v) -> acc + v)
  *   / (sqrt(aggregate(a, 0.0, (acc, x) -> acc + double(x) * double(x)))
  *      * sqrt(aggregate(b, 0.0, ...)))
  *
  * into the fused native [[CosineHof]] expression — one loop per pair
  * instead of three array-allocating HOF folds, inside WholeStageCodegen.
  *
  * This is the library-as-optimizer integration point: users (and our
  * own baseline operators) write the declarative builtin formulation;
  * the plan gets the native kernel. The rewrite is SEMANTICS-PRESERVING
  * on every input — CosineHof reproduces the HOF tree's null-padding,
  * null-poisoning and IEEE zero-denominator behavior exactly (see its
  * scaladoc) — so it is a legal optimization, not a semantics change.
  * Registered both via [[graft.functions.GraftExtensions]]
  * (injectOptimizerRule) and idempotently through
  * `spark.experimental.extraOptimizations` in GraftFunctions.register.
  */
object NativeCosineRule extends Rule[LogicalPlan] {

  /** Σ over zip_with(a, b, (x,y) -> double(x)*double(y)) from 0.0 —
    * the sequential dot product. */
  private object DotPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(
              Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                       Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
              Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
            Seq(la: NamedLambdaVariable, lv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(lf: NamedLambdaVariable), _))
        if x.exprId == lx.exprId && y.exprId == ly.exprId &&
          acc.exprId == la.exprId && v.exprId == lv.exprId &&
          fin.exprId == lf.exprId =>
        Some((a, b))
      case _ => None
    }
  }

  /** Σ of double(x)*double(x) over one array from 0.0 — the squared
    * norm. */
  private object NormSqPattern {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(a,
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(acc: NamedLambdaVariable,
                Multiply(Cast(x1: NamedLambdaVariable, DoubleType, _, _),
                         Cast(x2: NamedLambdaVariable, DoubleType, _, _), _), _),
            Seq(la: NamedLambdaVariable, lx: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(lf: NamedLambdaVariable), _))
        if acc.exprId == la.exprId && x1.exprId == lx.exprId &&
          x2.exprId == lx.exprId && fin.exprId == lf.exprId =>
        Some(a)
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // The Divide's evalMode is part of the semantics being preserved:
      // ANSI (Spark 4 default) throws DIVIDE_BY_ZERO on a zero double
      // denominator, LEGACY yields NULL (DivModLike returns null for a
      // zero divisor, even for doubles) — CosineHof replicates
      // whichever applies. TRY (try_divide → null) is left unrewritten.
      // the third Divide field is a NumericEvalContext (Spark 4.1), whose
      // evalMode member carries ANSI/LEGACY/TRY
      case Divide(DotPattern(a, b),
          Multiply(Sqrt(NormSqPattern(a2)), Sqrt(NormSqPattern(b2)), _), ec)
        if ec.evalMode != EvalMode.TRY &&
          isFloatArray(a) && isFloatArray(b) &&
          a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineHof(a, b, ansi = ec.evalMode == EvalMode.ANSI)
    }
}
