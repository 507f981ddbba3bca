package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: k seeded-md5 minima over character shingles
  * (8-grams every 4 chars, 1-based positions).
  *
  * Semantics are EXACTLY `graft.ops.Dedup.shinglesExpr` + `minhashExpr`
  * (the pure-builtin, DuckDB-mirrorable spec): shingle i = codepoints
  * [i, i+8) for i in 1, 5, 9, … greatest(len-7, 1); per seed s the
  * signature element is min over shingles of md5("s:" ++ shingle) — hex
  * lexicographic, which equals unsigned-byte order of the raw digest, so
  * the minima are tracked as 16-byte arrays and hex-encoded once at the
  * end. One fused pass over the UTF-8 bytes (codepoint offsets computed
  * inline): no shingle-array materialization, no per-seed string concat,
  * no 32-char hex comparisons. md5 count is identical to the builtin
  * formulation; everything else is allocation it skips. Equality with the
  * builtin spec is test-pinned.
  */
case class MinhashSigs(child: Expression, k: Int = 8, gram: Int = 8,
    step: Int = 4) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs needs a string arg, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[UTF8String], k, gram, step)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinhashSigs.compute($c, $k, $gram, $step)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"

}

object MinhashSigs {

  private val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  private val hexChars = "0123456789abcdef".toCharArray

  def compute(s: UTF8String, k: Int, gram: Int, step: Int): ArrayData = {
    val bytes = s.getBytes
    // codepoint start offsets (UTF-8: starts are bytes != 10xxxxxx);
    // offs(c) = byte offset of codepoint c, offs(nChars) = total bytes —
    // shingling is CODEPOINT-based to match substring()/substr() in both
    // Spark and DuckDB
    var nChars = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) nChars += 1
      bi += 1
    }
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { offs(ci) = bi; ci += 1 }
      bi += 1
    }
    offs(nChars) = bytes.length

    val seedPrefix: Array[Array[Byte]] = Array.tabulate(k)(seed =>
      (seed.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[Array[Byte]](k)
    val tmp = new Array[Byte](16)
    val md = digest.get()
    val last = math.max(nChars - (gram - 1), 1) // 1-based last start
    var i = 1
    while (i <= last) {
      val startB = offs(i - 1)
      val endB = offs(math.min(i - 1 + gram, nChars))
      var seed = 0
      while (seed < k) {
        md.reset()
        md.update(seedPrefix(seed))
        md.update(bytes, startB, endB - startB)
        md.digest(tmp, 0, 16)
        if (mins(seed) == null || unsignedLess(tmp, mins(seed)))
          mins(seed) = java.util.Arrays.copyOf(tmp, 16)
        seed += 1
      }
      i += step
    }
    ArrayData.toArrayData(mins.map(d => UTF8String.fromString(hex(d))))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
