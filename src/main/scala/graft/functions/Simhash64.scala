package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over space-separated tokens.
  *
  * Semantics are EXACTLY `graft.ops.Dedup.simhashBitsExpr` (the
  * pure-builtin, DuckDB-mirrorable specification): tokens are maximal
  * runs of non-space bytes, each token's hash is the first 8 bytes of
  * md5(token) read big-endian (= the first 16 hex chars of the md5 hex
  * string; bit b of the long = hex char 16 - b/4, nibble bit b%4 — the
  * exact bit the oracle extracts), every hash bit votes ±1, and the
  * signature bit is the vote sign. Returns the signature as ONE long, so
  * downstream banding shuffles 8-byte keys instead of a 64-int array and
  * hamming distance is a single bit_count(xor) — the perf shape of a
  * scalar hash with the cross-engine exactness of the builtin spec
  * (equality is pinned by a test).
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs a string arg, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Simhash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"

}

object Simhash64 {

  private val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  /** Static entry point shared by eval and generated code. Tokenizes the
    * UTF-8 bytes directly: 0x20 never occurs inside a multi-byte UTF-8
    * sequence, so byte-level splitting equals the string-level
    * `split(text, ' ')` of the builtin spec. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val counts = new Array[Int](64)
    val md = digest.get()
    var start = 0
    val n = bytes.length
    while (start < n) {
      while (start < n && bytes(start) == 0x20) start += 1
      var end = start
      while (end < n && bytes(end) != 0x20) end += 1
      if (end > start) {
        md.reset()
        md.update(bytes, start, end - start)
        val d = md.digest()
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      start = end
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sh |= (1L << b); b += 1 }
    sh
  }
}
