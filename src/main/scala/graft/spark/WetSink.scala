package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WET emission sink — the text-extract distribution format Common
  * Crawl actually ships (WARC/1.0 `conversion` records, ISO 28500 §6.8:
  * one record per source page carrying the EXTRACTED text as a
  * `text/plain` payload). The pipeline's outward twin of
  * [[WarcSource]]: archives come in as WARC `response` records, text
  * leaves as WET `conversion` records (the reference's analogous stage
  * is emitting the recognized text as a new layer in the output
  * artifact — render_hocr_page/graft,
  * /root/reference/src/ocrmypdf/hocrtransform/, rather than keeping it
  * in internal tables).
  *
  * Layout + determinism contract (the north rule's byte-parity
  * discipline applied to a SINK): rows hash to files by Spark's
  * murmur3 of the url (`repartition(files, url)`) and each file is
  * sorted by (url, ts, text) — the FULL row totalizes the order, so
  * even a table carrying one url twice (recrawl snapshots) serializes
  * to the same bytes on every run. Record ids are deterministic v3
  * UUIDs of (url, date); the warcinfo record carries only fixed
  * fields and the epoch date (a wall clock here would break byte
  * parity). Records declare WARC/1.1 — the version that ALLOWS the
  * fractional-second WARC-Date the micros-exact ts round-trip needs
  * (WARC/1.0 dates are whole seconds only).
  *
  * 100 TB shape: one hash exchange of (url, ts, text) rows, then each
  * task streams its records straight to its own file through the
  * Hadoop FileSystem API (warehouse-scheme-agnostic, same discipline
  * as CheckpointedWriter) — no driver collection, no small-file
  * explosion (`files` pins the output fan-out).
  */
object WetSink {

  private val CRLF = "\r\n"
  private val UTF8 = java.nio.charset.StandardCharsets.UTF_8
  private val Version = "WARC/1.1"

  /** Deterministic ISO 28500 mandatory record id: a NAME-derived (v3)
    * uuid, so reruns emit identical bytes where a random v4 would not. */
  private def recordId(name: String): String =
    "<urn:uuid:" + java.util.UUID.nameUUIDFromBytes(name.getBytes(UTF8)) + ">"

  /** One page as a WET conversion record. Content-Length framing keeps
    * the text payload OPAQUE — embedded "WARC/1.0", CRLFs, anything.
    * Framing, header flattening, and the micros-exact ts conversion are
    * [[WarcSource]]'s — ONE owner for both writers. */
  def conversionRecord(url: String, ts: java.sql.Timestamp, text: String,
      out: java.io.OutputStream): Unit = {
    val date = WarcSource.instantOf(ts).toString
    WarcSource.writeRecord(Version, Seq(
      "WARC-Type" -> "conversion",
      "WARC-Record-ID" -> recordId(s"graft-wet:$url\n$date"),
      "WARC-Target-URI" -> url,
      "WARC-Date" -> date,
      "Content-Type" -> "text/plain"),
      (if (text == null) "" else text).getBytes(UTF8), out)
  }

  /** RFC 1952 member header: magic, CM=8 (deflate), FLG=0, MTIME=0
    * (determinism — never the wall clock), XFL=0, OS=0 — byte-for-byte
    * what JDK GZIPOutputStream writes. */
  private val GzipMemberHeader: Array[Byte] =
    Array(0x1f.toByte, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0)

  private def warcinfo(out: java.io.OutputStream): Unit =
    WarcSource.writeRecord(Version, Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> recordId("graft-wet:warcinfo"),
      "WARC-Date" -> java.time.Instant.EPOCH.toString,
      "Content-Type" -> "application/warc-fields"),
      s"software: graft${CRLF}format: WARC File Format 1.1$CRLF".getBytes(UTF8),
      out)

  /** Write `df`'s (urlCol, tsCol, textCol) as `files` WET files under
    * `outDir` (part-NNNNN.warc.wet). Rerun-identical bytes (class doc). */
  def writeWet(df: DataFrame, outDir: String, urlCol: String = "url",
      tsCol: String = "warc_ts", textCol: String = "text",
      files: Int = 32, gzip: Boolean = false): Unit = {
    val spark = df.sparkSession
    val conf = org.apache.spark.graft.GraftUtilAccess.serializableConf(
      spark.sparkContext.hadoopConfiguration)
    val prepared = df
      .select(col(urlCol).as("url"), col(tsCol).as("ts"),
        col(textCol).as("text"))
      .repartition(files, col("url"))
      .sortWithinPartitions("url", "ts", "text")
    val counts = prepared.queryExecution.toRdd.mapPartitionsWithIndex {
      (pid, rows) =>
        val ext = if (gzip) "warc.wet.gz" else "warc.wet"
        val path = new org.apache.hadoop.fs.Path(
          outDir, f"part-$pid%05d.$ext")
        val fs = path.getFileSystem(
          org.apache.spark.graft.GraftUtilAccess.confOf(conf))
        val out = fs.create(path, true)
        // gzip = the real CC layout: EACH record its own gzip member
        // (readers can then split/seek per record; gunzipAll restores
        // the concatenation). Members are written with ONE reusable
        // Deflater/CRC32/buffer per PARTITION (a GZIPOutputStream per
        // record would allocate a native zlib state per record — the
        // hot write path at 100 TB); the fixed header carries MTIME=0
        // so rerun byte-identity survives compression. Same bytes as
        // JDK GZIPOutputStream (same header, deflate params, trailer).
        val deflater = if (gzip) new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true) else null
        val crc = if (gzip) new java.util.zip.CRC32 else null
        val raw = if (gzip) new java.io.ByteArrayOutputStream() else null
        val dbuf = if (gzip) new Array[Byte](8192) else null
        def emit(write: java.io.OutputStream => Unit): Unit =
          if (!gzip) write(out)
          else {
            raw.reset(); write(raw)
            val body = raw.toByteArray
            deflater.reset(); crc.reset(); crc.update(body, 0, body.length)
            out.write(GzipMemberHeader)
            deflater.setInput(body); deflater.finish()
            while (!deflater.finished()) {
              val k = deflater.deflate(dbuf)
              if (k > 0) out.write(dbuf, 0, k)
            }
            val tr = new Array[Byte](8)
            val c = crc.getValue; val sz = body.length.toLong
            var i = 0
            while (i < 4) {
              tr(i) = ((c >>> (8 * i)) & 0xff).toByte
              tr(4 + i) = ((sz >>> (8 * i)) & 0xff).toByte
              i += 1
            }
            out.write(tr)
          }
        var n = 0L
        try {
          emit(warcinfo)
          rows.foreach { r =>
            val url = r.getUTF8String(0).toString
            val ts = if (r.isNullAt(1)) null
              else org.apache.spark.sql.catalyst.util.DateTimeUtils
                .toJavaTimestamp(r.getLong(1))
            val text = if (r.isNullAt(2)) null else r.getUTF8String(2).toString
            emit(conversionRecord(url, ts, text, _))
            n += 1
          }
        } finally {
          out.close()
          if (deflater != null) deflater.end()
        }
        Iterator.single(n)
    }.collect()
    require(counts.length == files,
      s"wet sink wrote ${counts.length} files, expected $files")
  }

  /** Read WET files back as (url, warc_ts, text) — the verification
    * twin of [[writeWet]] (and a real consumer for third-party WET):
    * one task per file, conversion records only, text decoded UTF-8. */
  def readWet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wet*")
      .load(dir)
      .select("content")
      .as[Array[Byte]]
      .flatMap { b =>
        val raw = if (b.length >= 2 && (b(0) & 0xff) == 0x1f &&
          (b(1) & 0xff) == 0x8b) WarcSource.gunzipAll(b) else b
        WarcSource.parseRecords(raw, "conversion").map(p =>
          (p.url, p.warc_ts, new String(p.html, UTF8)))
      }
      .toDF("url", "warc_ts", "text")
  }
}
