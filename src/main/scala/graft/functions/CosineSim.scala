package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-array columns.
  *
  * Semantics are EXACTLY the higher-order-function formulation used in
  * `graft.ops.Similarity` (sequential left-to-right double-precision
  * accumulation: dot/(sqrt(na)*sqrt(nb))) so results are bit-identical to
  * the DuckDB oracle — but evaluated in one fused loop with no per-element
  * lambda dispatch, keeping the ANN scoring stage inside
  * WholeStageCodegen. Preference order per the build rules: compose
  * builtins first (done), custom `Expression` with doGenCode where the
  * builtin formulation leaves throughput on the table (this).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim needs two array<float> args, got " +
            s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"

}

object GraftFunctions {
  /** Session-scoped once-marker: graft operators call register() on
    * every invocation; only the FIRST call per session actually writes
    * the registry (kills the replacement-WARN spam) — and that first
    * call REGISTERS UNCONDITIONALLY, so a same-name temp function a user
    * happened to define earlier cannot silently hijack the semantics of
    * library operators that resolve by name (reviewed). Weak keys: a
    * discarded session must not be pinned. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register SQL-callable graft functions on a session
    * (`SELECT cosine_sim(a, b)` / `expr("cosine_sim(a, b)")`).
    * Once per session; the first call overwrites any same-name temp
    * functions so graft operators always get graft semantics. */
  def register(spark: SparkSession): Unit = registered.synchronized {
    // synchronized, not just putIfAbsent: a bare once-guard would let a
    // SECOND thread return early while the first is still mid-
    // registration, and its expr("cosine_sim(...)") would then fail to
    // resolve. The monitor also serializes the read-modify-write append
    // to experimental.extraOptimizations below.
    if (registered.putIfAbsent(spark, java.lang.Boolean.TRUE) != null) return
    val reg = spark.sessionState.functionRegistry
    def reg1(name: String,
             builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    reg1("cosine_sim", exprs => CosineSim(exprs(0), exprs(1)))
    reg1("simhash64", exprs => Simhash64(exprs(0)))
    reg1("minhash_sigs", exprs => MinhashSigs(exprs(0)))
    reg1("kmv_minima", exprs =>
      KmvMinima(exprs(0), GraftFunctions.litInt(exprs(1)))
        .toAggregateExpression())
    reg1("kll_quantiles", exprs =>
      KllQuantiles(exprs(0), GraftFunctions.litInt(exprs(1)),
        exprs.drop(2).map(GraftFunctions.litDouble))
        .toAggregateExpression())
    reg1("rolling_hash", exprs =>
      RollingHash(exprs(0), GraftFunctions.litInt(exprs(1)),
        GraftFunctions.litInt(exprs(2)).toLong))
    reg1("rolling_hash2", exprs =>
      RollingHash2(exprs(0), GraftFunctions.litInt(exprs(1)),
        GraftFunctions.litInt(exprs(2)).toLong,
        GraftFunctions.litInt(exprs(3)).toLong))
    reg1("md5_grams", exprs =>
      Md5Grams(exprs(0), GraftFunctions.litInt(exprs(1))))
    // optimizer integration on a plain (extension-less) session: rewrite
    // builtin HOF cosine trees into the fused native kernel; idempotent
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.NativeCosineRule))
      spark.experimental.extraOptimizations =
        extra :+ graft.plans.NativeCosineRule
  }

  /** Extract a literal int argument (e.g. the k of kmv_minima(col, k)). */
  def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"expected a literal int argument, got $other")
    }

  /** Extract a literal numeric argument as Double (SQL fractional literals
    * like `0.5` arrive as DecimalType, DataFrame lit(0.5) as DoubleType). */
  def litDouble(e: org.apache.spark.sql.catalyst.expressions.Expression): Double =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
        v.toDouble
      case org.apache.spark.sql.catalyst.expressions.Literal(
          v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
      case other => throw new IllegalArgumentException(
        s"expected a literal numeric argument, got $other")
    }
}
