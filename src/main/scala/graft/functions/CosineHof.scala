package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused-loop twin of the BUILTIN higher-order-function cosine
  * formulation `aggregate(zip_with(a,b,(x,y)->double(x)*double(y)),0.0,+)
  * / (sqrt(Σx²)·sqrt(Σy²))` — the target of
  * [[graft.plans.NativeCosineRule]], which rewrites that exact pattern
  * into this expression.
  *
  * An optimizer rewrite must preserve semantics on EVERY input, so this
  * expression reproduces the HOF tree's edge behavior exactly, which
  * [[CosineSim]] deliberately does not:
  *  - length mismatch → NULL (zip_with pads the shorter side with null,
  *    the null product poisons the running sum);
  *  - null element → NULL (same poisoning);
  *  - zero denominator: under ANSI mode (the Spark 4 default) `Divide`
  *    THROWS DIVIDE_BY_ZERO even for doubles, so `ansi = true` raises
  *    the same error; under LEGACY mode Spark's DivModLike returns NULL
  *    for a zero divisor (also even for doubles — empirically verified),
  *    so `ansi = false` yields NULL, NOT IEEE NaN. CosineSim's 0.0 guard
  *    is deliberately NOT applied here.
  * On equal-length, non-null, nonzero inputs the arithmetic sequence is
  * identical to both the HOF tree and CosineSim (sequential
  * left-to-right double accumulation), so results are bit-identical
  * there.
  */
case class CosineHof(left: Expression, right: Expression, ansi: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_hof needs two array<float> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // zip_with null padding
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // null poisons Σ
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (ansi) throw CosineHofErrors.divideByZero()
      return null // legacy Divide: zero divisor → NULL, even for doubles
    }
    dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val bail = ctx.freshName("bail")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val zeroDenom = if (ansi)
        s"throw graft.functions.CosineHofErrors.divideByZero();"
      else s"${ev.isNull} = true; // legacy Divide: zero divisor → NULL"
      s"""
        int $n = $a.numElements();
        boolean $bail = ($n != $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; !$bail && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bail = true; break; }
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        if ($bail) {
          ${ev.isNull} = true;
        } else {
          double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
          if ($denom == 0.0) {
            $zeroDenom
          } else {
            ${ev.value} = $dot / $denom;
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineHof =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_hof"

}

/** Error construction for CosineHof's ANSI path (top-level object so the
  * generated Java can call the static forwarder). Delegates to the
  * package-qualified shim that can reach the `private[sql]`
  * QueryExecutionErrors — the thrown object is the SAME error class with
  * the same parameters as Divide's DIVIDE_BY_ZERO. */
object CosineHofErrors {
  /** Typed `ArithmeticException` (unchecked) — the generated Java is a
    * bare `throw divideByZero();`, which Janino only accepts for
    * unchecked exception types. */
  def divideByZero(): ArithmeticException =
    org.apache.spark.sql.graft.GraftSqlAccess.divideByZeroError()
}
