package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Multimodal-column plumbing: treat media as opaque `binary` payloads
  * with typed metadata extracted by a per-partition kernel.
  *
  * Metadata comes from REAL container-header parsing where the payload is
  * a recognized format — PNG IHDR, GIF logical screen descriptor, BMP
  * info header, JPEG SOFn frame header, WAV RIFF/fmt chunk — all pure
  * byte-level parsing of the public container specs, no codec library.
  * Pixel/sample DECODE (what a real cluster would do with a codec jar) is
  * the part that stays out of scope; unrecognized payloads fall back to
  * the deterministic arithmetic STUB so the pipeline shape stays total
  * and oracle-checkable on text payloads.
  */
object Media {

  final case class MediaMeta(doc_id: Long, width: Long, height: Long,
      n_frames: Long, media_kind: String)

  private def u16be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 8) | (b(i + 1) & 0xffL)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u16le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(k => (b(i + k) & 0xff) == s.charAt(k).toInt)

  /** Parse a recognized container header into (width, height, n_frames,
    * kind); None when the payload matches no known magic or the header is
    * structurally truncated. Header-only: bounded scan, never decodes
    * payload data, total on arbitrary bytes. */
  def parseHeader(id: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b == null || b.length < 12) return None
    // PNG: 8-byte signature, IHDR length+type at 8..15, w/h at 16/20
    // (PNG spec, W3C REC-png §5.2/§11.2.2)
    if ((b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") && b.length >= 24 &&
      ascii(b, 12, "IHDR"))
      return Some(MediaMeta(id, u32be(b, 16), u32be(b, 20), 1L, "img"))
    // GIF87a/89a: logical screen w/h as LE u16 at 6/8 (GIF89a spec §18)
    if ((ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) && b.length >= 10)
      return Some(MediaMeta(id, u16le(b, 6), u16le(b, 8), 1L, "img"))
    // BMP: "BM" + BITMAPINFOHEADER w/h as LE i32 at 18/22 (height may be
    // negative = top-down; report magnitude)
    if (ascii(b, 0, "BM") && b.length >= 26) {
      val w = u32le(b, 18).toInt; val h = u32le(b, 22).toInt
      return Some(MediaMeta(id, math.abs(w.toLong), math.abs(h.toLong), 1L, "img"))
    }
    // WAV: RIFF....WAVE; walk chunks for fmt (channels @+2 LE u16,
    // sample rate @+4 LE u32) and data (frame estimate = size/blockAlign)
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var i = 12
      var rate = 0L; var channels = 0L; var blockAlign = 0L; var dataLen = 0L
      while (i + 8 <= b.length) {
        val sz = u32le(b, i + 4)
        if (ascii(b, i, "fmt ") && i + 24 <= b.length) {
          channels = u16le(b, i + 10)
          rate = u32le(b, i + 12)
          blockAlign = u16le(b, i + 20)
        } else if (ascii(b, i, "data")) dataLen = sz
        i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
        if (sz < 0 || sz > b.length) i = b.length // corrupt size: stop
      }
      if (rate > 0)
        return Some(MediaMeta(id, rate, channels,
          if (blockAlign > 0) dataLen / blockAlign else 0L, "aud"))
      return None
    }
    // JPEG: FF D8, then marker segments; SOFn (C0-C3) carries height@+5
    // BE u16, width@+7 (ITU T.81 §B.2.2). Skip other segments by length —
    // i advances ≥2 per step, so the walk terminates without a segment
    // cap (a cap would mis-stub metadata-heavy JPEGs: ICC alone can span
    // 255 APP2 segments)
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 4 <= b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced: not a JPEG
        val marker = b(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xc3) {
          if (i + 9 <= b.length)
            return Some(MediaMeta(id, u16be(b, i + 7), u16be(b, i + 5), 1L, "img"))
          return None
        }
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else {
          val len = u16be(b, i + 2)
          if (len < 2) return None
          i += 2 + len.toInt
        }
      }
      return None
    }
    None
  }

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

  /** STUB decode for payloads no header parser recognizes: deterministic
    * fixed arithmetic over (byte length, first codepoint). Replace with a
    * real codec (e.g. TwelveMonkeys/JAI) on a cluster for pixel-level
    * features; the header metadata above needs no codec. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaMeta = {
    val len = if (payload == null) 0L else payload.length.toLong
    val c0 = firstCodePoint(payload)
    MediaMeta(id, 64L + len % 512L, 64L + c0 % 512L, 1L + len % 7L,
      if (c0 % 2 == 0) "img" else "vid")
  }

  /** Decode kernel: real header parse first, stub fallback — total on
    * arbitrary bytes. */
  def decodeMeta(id: Long, payload: Array[Byte]): MediaMeta =
    parseHeader(id, payload).getOrElse(decodeStub(id, payload))

  /** (id: Long, payload: Binary) → typed metadata. Narrow map, one kernel
    * instance per partition — the same fused-stage shape as the extract
    * kernel. `headerParse = false` forces the stub for every payload —
    * used where an independent oracle must reproduce the arithmetic in
    * SQL (the header parsers are pinned by unit tests instead; SQL can't
    * express a JPEG segment walk). */
  def metaFromBinary(df: DataFrame, headerParse: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      df.select(col(df.columns(0)).cast("long"), col(df.columns(1)))
        .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, payload) =>
        if (headerParse) decodeMeta(id, payload) else decodeStub(id, payload)
      }
    }.toDF()
  }
}
