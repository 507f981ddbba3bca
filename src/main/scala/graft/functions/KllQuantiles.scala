package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch as a native Catalyst aggregate — the
  * at-scale replacement for the exact rank-selection in `agg_quantiles`
  * [public technique: Karnin, Lang, Liberty 2016 "Optimal quantile
  * approximation in streams" (KLL); fixed-capacity-per-level compaction à
  * la Manku, Rajagopalan, Lindsay 1998].
  *
  * `kll_quantiles(v, k, q1, q2, ...)` maintains a multi-level buffer:
  * level i holds values of weight 2^i, each level is capped at k entries;
  * an over-full level is sorted and every other element is promoted one
  * level up (the compaction step). Quantile extraction is weighted lower
  * rank selection at rank 1 + floor((W-1)·q) — chosen to coincide EXACTLY
  * with the rank selection in `agg_quantiles`/its DuckDB oracle, so while
  * the total weight of a group is ≤ k the sketch never compacts and the
  * answer is bit-identical to the exact form (the oracle regime); past k
  * it degrades gracefully with the standard O(log(n/k)) level growth and
  * rank error ≪ n for k ≫ log n (pinned empirically in the unit spec).
  *
  * Determinism: the reference KLL flips a coin per compaction to pick the
  * kept parity; here the parity alternates with a per-level compaction
  * counter carried in the buffer (derandomized, same bias-cancelling
  * effect across successive compactions). The sketch is therefore a pure
  * function of the merge tree, which Spark fixes given input + partition
  * count — rerunning the same job yields the same bytes. Across DIFFERENT
  * parallelism the compacted (>k) regime may select different survivors
  * within the error bound; the exact (≤k) regime is partitioning-proof.
  *
  * 100 TB shape: TypedImperativeAggregate, so map-side PARTIAL reduces
  * each task's rows to one ≤ k·levels buffer before the shuffle and the
  * final merge unions buffers — the shuffle carries sketches, not rows.
  * This is exactly why the exact window-based rank selection (one shuffle
  * of EVERY row to its group) cannot be the at-scale plan and this can.
  */
case class KllQuantiles(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, "kll_quantiles needs k >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    "quantile probabilities must be in [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_quantiles needs a double arg, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllBuffer): Any = {
    // one flatten+sort serves every requested quantile (per-prob
    // quantile() calls would redo it probs.length times)
    val qs = buf.quantiles(probs)
    val arr: Array[Any] = qs.map {
      case Some(v) => v: java.lang.Double
      case None => null // empty group
    }.toArray
    new GenericArrayData(arr)
  }

  override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "kll_quantiles"
}

/** Multi-level compaction buffer. Level i entries carry weight 2^i.
  * Level 0 accepts raw inserts unsorted; levels ≥ 1 are kept sorted
  * (compaction output is produced in sorted order). `flips(i)` is the
  * derandomized compaction-parity counter for level i.
  */
final class KllBuffer(val k: Int) {
  var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  var flips: ArrayBuffer[Int] = ArrayBuffer(0)

  def add(v: Double): Unit = {
    levels(0) += v
    if (levels(0).length > k) compact(0)
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.length <= i) { levels += ArrayBuffer.empty[Double]; flips += 0 }

  /** Sort level i, promote every other element of the even-length prefix
    * to level i+1 (parity alternating per compaction), keep the odd
    * remainder in place. Cascades upward while a level overflows. */
  private def compact(i: Int): Unit = {
    val lv = levels(i)
    val sorted = lv.sortInPlace() // ArrayBuffer sort; level then IS sorted
    val m = (sorted.length / 2) * 2 // even-length prefix to compact
    val offset = flips(i) & 1
    flips(i) += 1
    ensureLevel(i + 1)
    val promoted = new ArrayBuffer[Double](m / 2)
    var j = offset
    while (j < m) { promoted += sorted(j); j += 2 }
    val remainder =
      if (m < sorted.length) ArrayBuffer(sorted(sorted.length - 1))
      else ArrayBuffer.empty[Double]
    levels(i) = remainder
    // merge promoted (sorted) into the sorted upper level
    levels(i + 1) = mergeSorted(levels(i + 1), promoted)
    if (levels(i + 1).length > k) compact(i + 1)
  }

  private def mergeSorted(a: ArrayBuffer[Double],
      b: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new ArrayBuffer[Double](a.length + b.length)
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) <= b(j)) { out += a(i); i += 1 } else { out += b(j); j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out
  }

  def mergeIn(other: KllBuffer): Unit = {
    var i = 0
    while (i < other.levels.length) {
      ensureLevel(i)
      if (i == 0) levels(0) ++= other.levels(0)
      else levels(i) = mergeSorted(levels(i), other.levels(i).sortInPlace())
      flips(i) += other.flips(i)
      i += 1
    }
    // restore capacity bottom-up so promotions cascade correctly
    i = 0
    while (i < levels.length) {
      if (levels(i).length > k) compact(i)
      i += 1
    }
  }

  def totalWeight: Long = {
    var w = 0L; var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }

  /** Weighted LOWER rank selection at rank 1 + floor((W-1)·q) — matches
    * the exact `agg_quantiles` rank arithmetic, so an uncompacted sketch
    * reproduces the exact answer bit-for-bit. */
  def quantile(q: Double): Option[Double] = quantiles(Seq(q)).head

  /** All requested quantiles from ONE flatten+sort of the sketch
    * (≤ k entries per level, ≤ ~log(n/k) levels). */
  def quantiles(qs: Seq[Double]): Seq[Option[Double]] = {
    val w = totalWeight
    if (w == 0L) return qs.map(_ => None)
    val pairs = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val wt = 1L << i
      levels(i).foreach(v => pairs += ((v, wt)))
      i += 1
    }
    val sorted = pairs.sortInPlace()(Ordering.by(_._1))
    qs.map { q =>
      val rank = 1L + math.floor((w - 1L) * q).toLong
      var cum = 0L; var j = 0
      var found: Option[Double] = None
      while (j < sorted.length && found.isEmpty) {
        cum += sorted(j)._2
        if (cum >= rank) found = Some(sorted(j)._1)
        j += 1
      }
      found.orElse(Some(sorted.last._1))
    }
  }

  def serialize(): Array[Byte] = {
    var n = 8 // k + nLevels
    levels.foreach(lv => n += 8 + lv.length * 8) // count+flip, doubles
    val bb = java.nio.ByteBuffer.allocate(n)
    bb.putInt(k)
    bb.putInt(levels.length)
    var i = 0
    while (i < levels.length) {
      bb.putInt(levels(i).length); bb.putInt(flips(i))
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object KllBuffer {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt // carried in the bytes: a deserialized buffer must
    // keep the aggregate's capacity even if used as a merge TARGET
    val nLevels = bb.getInt
    val buf = new KllBuffer(k)
    buf.levels = ArrayBuffer.empty
    buf.flips = ArrayBuffer.empty
    var i = 0
    while (i < nLevels) {
      val c = bb.getInt; val f = bb.getInt
      val lv = new ArrayBuffer[Double](c)
      var j = 0
      while (j < c) { lv += bb.getDouble; j += 1 }
      buf.levels += lv
      buf.flips += f
      i += 1
    }
    buf
  }
}
