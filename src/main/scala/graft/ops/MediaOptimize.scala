package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-optimization analog of the reference's image transcode
  * pipeline [reference: src/ocrmypdf/optimize.py — candidate filter
  * `extract_image_filter` :73-138 (size/type guards), the lossless
  * re-compress path :505-602 with its size threshold, and the
  * accept-only-if-smaller gate :741-753], re-expressed over binary
  * media columns.
  *
  * What is REAL here: the candidate ladder, the per-row guards, and the
  * never-regress accept gate run against an actual lossless codec —
  * `java.util.zip.Deflater` at two effort levels (the JVM-available
  * stand-in for the reference's JPEG-deflate path). What stays out of
  * scope: pixel transcodes (JPEG quality re-encode, pngquant, JBIG2)
  * need image codecs absent from this container — same honest-stub
  * policy as `Media.decodeStub`.
  *
  * 100 TB shape: a narrow per-row map — no shuffle, no text/binary
  * movement beyond the scan; codec instances are allocated once per
  * PARTITION and reused across rows (the reference pools its
  * subprocess executors the same way, optimize.py:697-720); oversized
  * payloads are guarded out before any codec work (the 10 000 px
  * threshold analog, :45).
  */
object MediaOptimize {

  /** One row per input media row. `codec` is the winning candidate or a
    * `keep:<reason>` marker; `accepted` follows the reference's
    * accept-only-if-smaller gate — an optimization that does not shrink
    * the payload is DISCARDED and the original kept (never regress). */
  final case class OptResult(media_id: Long, orig_bytes: Long,
      best_bytes: Long, codec: String, accepted: Boolean,
      saved_bytes: Long)

  /** Candidate ladder + gate over (idCol: long, payloadCol: binary).
    * `minBytes`/`maxBytes` are the candidate-filter guards: rows outside
    * them skip codec work entirely. */
  def optimize(df: DataFrame, idCol: String, payloadCol: String,
      minBytes: Int = 64, maxBytes: Int = 8 * 1024 * 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(payloadCol).cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one Deflater per level per PARTITION, reset per row — not one
        // per payload (native zlib allocation is the expensive part)
        val d6 = new java.util.zip.Deflater(6, true)
        val d9 = new java.util.zip.Deflater(9, true)
        val buf = new Array[Byte](64 * 1024)
        def deflatedSize(d: java.util.zip.Deflater,
            in: Array[Byte]): Long = {
          d.reset(); d.setInput(in); d.finish()
          var total = 0L
          while (!d.finished()) total += d.deflate(buf).toLong
          total
        }
        val mapped = it.map { case (id, p) =>
          val n = if (p == null) 0L else p.length.toLong
          if (n < minBytes) OptResult(id, n, n, "keep:too_small",
            accepted = false, 0L)
          else if (n > maxBytes) OptResult(id, n, n, "keep:too_large",
            accepted = false, 0L)
          else {
            val s6 = deflatedSize(d6, p)
            val s9 = deflatedSize(d9, p)
            // ties go to the higher effort level (its stream is the one
            // a decoder-agnostic store would keep)
            val (best, codec) =
              if (s9 <= s6) (s9, "deflate9") else (s6, "deflate6")
            if (best < n)
              OptResult(id, n, best, codec, accepted = true, n - best)
            else // accept-only-if-smaller: discard the candidate
              OptResult(id, n, n, "keep:not_smaller",
                accepted = false, 0L)
          }
        }
        // release the native zlib buffers at task completion — covers
        // BOTH the drained partition and early-terminated consumption
        // (limit/show stop pulling mid-partition, so an on-exhaustion
        // hook alone would still leak until GC finalization)
        var ended = false
        def endAll(): Unit = if (!ended) { ended = true; d6.end(); d9.end() }
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => endAll())
        new Iterator[OptResult] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) endAll()
            h
          }
          def next(): OptResult = mapped.next()
        }
      }.toDF()
  }
}
