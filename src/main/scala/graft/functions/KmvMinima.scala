package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values / bottom-k) distinct sketch as a native Catalyst
  * AGGREGATE — the mergeable-sketch class of operator [public technique:
  * Bar-Yossef et al. 2002 "Counting distinct elements in a data stream";
  * the bottom-k form is the basis of the theta sketch].
  *
  * `kmv_minima(expr, k)` keeps the k lexicographically smallest DISTINCT
  * md5-hex hashes of the input values. The distinct-count estimate is
  * plain post-processing over the result ((k-1)/fraction(kth minimum));
  * the sketch itself is exact, deterministic, and order-independent, so a
  * SQL oracle reproduces it verbatim (DuckDB:
  * list_sort(list_distinct(list(md5(v))))[1:k]).
  *
  * 100 TB shape: this is a TypedImperativeAggregate — Spark runs it in
  * PARTIAL mode map-side, so each task reduces its rows to one ≤k-entry
  * buffer before the shuffle, and the final merge unions buffers. The
  * shuffle carries one small sorted set per (group × task), NOT one row
  * per value — the whole point of a mergeable sketch vs exact
  * count-distinct (which must shuffle every distinct value). State is
  * bounded at k entries regardless of input size.
  */
case class KmvMinima(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]] {

  require(k >= 1, "kmv_minima needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_minima needs a string arg, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def md5hex(bytes: Array[Byte]): String = {
    // thread-local digest, reset per use (MinhashSigs' idiom) — a fresh
    // getInstance per row is a provider lookup + allocation on the
    // map-side PARTIAL hot path
    val md = KmvMinima.digest.get()
    md.reset()
    val d = md.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)) }
    sb.toString
  }

  private def add(buf: java.util.TreeSet[String], h: String): Unit = {
    // keep only the k smallest: skip values above the current kth minimum
    if (buf.size < k) { buf.add(h); () }
    else if (h.compareTo(buf.last) < 0) {
      if (buf.add(h)) buf.remove(buf.last)
    }
  }

  override def update(buf: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) {
      add(buf, md5hex(v.asInstanceOf[UTF8String].getBytes))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[String],
      other: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[String]): Any = {
    val arr = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder(buf.size * 33)
    val it = buf.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val out = new java.util.TreeSet[String]()
    new String(bytes, java.nio.charset.StandardCharsets.US_ASCII)
      .split('\n').foreach(h => if (h.nonEmpty) out.add(h))
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinima =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinima =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kmv_minima"
}

object KmvMinima {
  private[functions] val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })
}
