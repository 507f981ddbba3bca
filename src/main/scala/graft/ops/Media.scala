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
    // BMP: "BM" + DIB header, dispatched on the header-size field at 14
    // (Windows BMP spec): 12 = legacy BITMAPCOREHEADER with u16 w/h at
    // 18/20; 40+ = BITMAPINFOHEADER family with i32 w/h at 18/22 (height
    // may be negative = top-down; report magnitude). Unknown header
    // sizes fall through to None — guessing the layout would return
    // confidently wrong dimensions instead of the documented degrade.
    if (ascii(b, 0, "BM") && b.length >= 26) {
      val dibSize = u32le(b, 14)
      if (dibSize == 12L)
        return Some(MediaMeta(id, u16le(b, 18), u16le(b, 20), 1L, "img"))
      if (dibSize >= 40L) {
        val w = u32le(b, 18).toInt; val h = u32le(b, 22).toInt
        return Some(MediaMeta(id, math.abs(w.toLong), math.abs(h.toLong), 1L, "img"))
      }
      return None
    }
    // WAV: RIFF....WAVE; walk chunks for fmt (channels @+2 LE u16,
    // sample rate @+4 LE u32) and data (frame estimate = size/blockAlign)
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE")) {
      var i = 12L // LONG walk: an int cursor wraps negative past 2^31 on
      // multi-GB payloads with large declared chunk sizes
      var rate = 0L; var channels = 0L; var blockAlign = 0L; var dataLen = 0L
      while (i + 8 <= b.length) {
        val ii = i.toInt
        val sz = u32le(b, ii + 4)
        if (ascii(b, ii, "fmt ") && i + 24 <= b.length) {
          channels = u16le(b, ii + 10)
          rate = u32le(b, ii + 12)
          blockAlign = u16le(b, ii + 20)
        } else if (ascii(b, ii, "data")) dataLen = sz
        i += 8L + sz + (sz & 1L) // chunks are word-aligned
      }
      if (rate > 0)
        return Some(MediaMeta(id, rate, channels,
          if (blockAlign > 0) dataLen / blockAlign else 0L, "aud"))
      return None
    }
    // TIFF: "II*\0" (LE) or "MM\0*" (BE); IFD0 at u32@4; entries are
    // 12 bytes: tag(2) type(2) count(4) value(4); tags 256/257 = w/h,
    // value inline as SHORT(3) or LONG(4) (TIFF 6.0 spec §2)
    if ((ascii(b, 0, "II") && b.length >= 8 && (b(2) & 0xff) == 42 && b(3) == 0) ||
        (ascii(b, 0, "MM") && b.length >= 8 && b(2) == 0 && (b(3) & 0xff) == 42)) {
      val le = b(0) == 'I'
      def u16(i: Int) = if (le) u16le(b, i) else u16be(b, i)
      def u32(i: Int) = if (le) u32le(b, i) else u32be(b, i)
      val ifd = u32(4)
      if (ifd >= 8 && ifd + 2 <= b.length) {
        val n = math.min(u16(ifd.toInt), 512L).toInt // entry cap: bounded walk
        var w = 0L; var h = 0L
        var e = 0
        while (e < n && ifd.toInt + 2 + (e + 1) * 12 <= b.length) {
          val off = ifd.toInt + 2 + e * 12
          val tag = u16(off); val typ = u16(off + 2)
          val v = if (typ == 3) u16(off + 8) else u32(off + 8)
          if (tag == 256) w = v else if (tag == 257) h = v
          e += 1
        }
        if (w > 0 && h > 0) return Some(MediaMeta(id, w, h, 1L, "img"))
      }
      return None
    }
    // MP4 / ISO-BMFF (ISO 14496-12): boxes are [u32be size][4cc]; a file
    // starts with ftyp; moov/mvhd carries timescale+duration, trak/tkhd
    // the 16.16-fixed display size. Bounded recursive walk (depth ≤ 3,
    // sizes validated, size==1 largesize and size==0 to-end handled).
    if (b.length >= 12 && ascii(b, 4, "ftyp")) {
      var timescale = 0L; var duration = 0L; var w = 0L; var h = 0L
      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 3) return
        var i = start
        while (i + 8 <= end) {
          var sz = u32be(b, i)
          var hdr = 8
          if (sz == 1 && i + 16 <= end) { // 64-bit largesize: hi must be 0
            if (u32be(b, i + 8) != 0L) return
            sz = u32be(b, i + 12); hdr = 16
          } else if (sz == 0) sz = (end - i).toLong // box extends to end
          if (sz < hdr || i + sz > end) return // corrupt: stop the walk
          if (ascii(b, i + 4, "moov") || ascii(b, i + 4, "trak"))
            walk(i + hdr, i + sz.toInt, depth + 1)
          else if (ascii(b, i + 4, "mvhd") && i + hdr + 20 <= end) {
            val ver = b(i + hdr) & 0xff
            if (ver == 0 && i + hdr + 20 <= end) {
              timescale = u32be(b, i + hdr + 12)
              duration = u32be(b, i + hdr + 16)
            } else if (ver == 1 && i + hdr + 32 <= end) {
              timescale = u32be(b, i + hdr + 20)
              duration = u32be(b, i + hdr + 28) // low 32 bits of u64
            }
          } else if (ascii(b, i + 4, "tkhd") && i + hdr < end) {
            // the version-byte read needs its own guard: sz == hdr passes
            // the size check with i+hdr == end (reviewed crash)
            val ver = b(i + hdr) & 0xff
            val wOff = i + hdr + (if (ver == 1) 88 else 76)
            if (wOff + 8 <= end) {
              val wv = u32be(b, wOff) >> 16 // 16.16 fixed → integer part
              val hv = u32be(b, wOff + 4) >> 16
              if (wv > 0 && hv > 0) { w = wv; h = hv }
            }
          }
          i += sz.toInt
        }
      }
      walk(0, b.length, 0)
      if (timescale > 0)
        return Some(MediaMeta(id, w, h, duration / timescale, "vid"))
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
        if (marker == 0xff) i += 1 // legal fill byte before a marker
        else if (marker >= 0xc0 && marker <= 0xc3) {
          if (i + 9 <= b.length)
            return Some(MediaMeta(id, u16be(b, i + 7), u16be(b, i + 5), 1L, "img"))
          return None
        }
        else if (marker == 0xd9) return None // EOI before any SOFn
        // standalone (length-less) markers: SOI, RSTn, TEM
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) ||
          marker == 0x01) i += 2
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

  /** Aspect-preserving resize-fit planning (the pre-encoder step of a
    * vision pipeline): scale (width, height) into (maxW, maxH) without
    * upscaling. Pure INTEGER milli-scale arithmetic (`div` semantics) so
    * the plan is deterministic and SQL-mirrorable; the pixel resample
    * itself is the codec-side work that stays out of scope. */
  def resizeFit(meta: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    meta
      .withColumn("scale_milli",
        least(lit(1000L),
          expr(s"(${maxW}L * 1000) div greatest(width, 1)"),
          expr(s"(${maxH}L * 1000) div greatest(height, 1)")))
      .withColumn("out_w", expr("(width * scale_milli) div 1000"))
      .withColumn("out_h", expr("(height * scale_milli) div 1000"))
  }

  /** Frame-sampling plumbing: one row per sampled frame index, stride
    * chosen so at most `maxFrames` frames survive per video — the batch
    * shape a frame encoder consumes. Frame CONTENT is the out-of-scope
    * decode (represented by a deterministic md5 tag); the index
    * arithmetic, bounded explode, and row shape are the real pipeline. */
  def frameSample(meta: DataFrame, maxFrames: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    meta.filter(col("media_kind") === "vid" && col("n_frames") >= 1)
      // stride = ceil(n_frames / maxFrames); sampled indices are the
      // < maxFrames multiples of stride below n_frames. Generated from a
      // FIXED-length k-sequence in pure long arithmetic — casting a huge
      // n_frames (mvhd duration/timescale is u32-ish) to int would wrap
      // negative and make sequence() throw, killing the task
      .withColumn("stride",
        expr(s"greatest((n_frames + $maxFrames - 1) div $maxFrames, 1L)"))
      .select(col("doc_id"),
        explode(expr(
          s"filter(transform(sequence(0, ${maxFrames - 1})," +
            " k -> cast(k as bigint) * stride), i -> i < n_frames)"))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))).as("frame_tag"))
  }

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
