package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata extracted by a per-partition kernel.
  *
  * The decode step is a clearly-marked deterministic STUB (the container
  * ships no image/audio codecs): metadata is derived from the payload
  * bytes by fixed arithmetic, so the Spark-side plumbing — binary column
  * in, typed struct out, mapPartitions batch shape, partition-preserving
  * narrow execution — is real and oracle-checkable while the codec is
  * swappable.
  */
object Media {

  final case class MediaMeta(doc_id: Long, width: Long, height: Long,
      n_frames: Long, media_kind: String)

  /** First Unicode codepoint of a UTF-8 payload (0 when empty). The first
    * codepoint spans ≤ 4 bytes, so decoding a 4-byte prefix is complete.
    * Codepoint-based (not first-byte) so the oracle's
    * ascii(substr(text,1,1)) agrees on non-ASCII-leading documents. */
  def firstCodePoint(payload: Array[Byte]): Long = {
    if (payload == null || payload.isEmpty) 0L
    else {
      val s = new String(payload, 0, math.min(payload.length, 4),
        java.nio.charset.StandardCharsets.UTF_8)
      if (s.isEmpty) 0L else s.codePointAt(0).toLong
    }
  }

  /** STUB decode: replace with a real codec (e.g. TwelveMonkeys/JAI) on a
    * cluster. Fixed arithmetic over (byte length, first codepoint). */
  def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = if (payload == null) 0L else payload.length.toLong
    val c0 = firstCodePoint(payload)
    MediaMeta(id, 64L + len % 512L, 64L + c0 % 512L, 1L + len % 7L,
      if (c0 % 2 == 0) "img" else "vid")
  }

  /** (id: Long, payload: Binary) → typed metadata. Narrow map, one kernel
    * instance per partition — the same fused-stage shape as the extract
    * kernel. */
  def metaFromBinary(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col(df.columns(0)).cast("long"), col(df.columns(1)))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, payload) => decodeStub(id, payload) }
    }.toDF()
  }
}
