package graft.tools

import graft.engine.Extractor
import graft.gen.SyntheticCorpus
import graft.ops.TextStats
import org.apache.spark.sql.SparkSession

/** Regenerates the golden fixtures (FIXTURES.md "Golden outputs"):
  * runs the SCALAR kernel (plain sequential loop — no distributed
  * pipeline) over the verify corpus and freezes the results as parquet.
  * The Spark pipeline must then match these byte-identically — the analog
  * of the reference's recorded engine cache
  * (reference: tests/plugins/tesseract_cache.py:1-80 replays golden
  * hOCR/txt outputs keyed by invocation; tests/cache/manifest.jsonl logs
  * provenance).
  *
  * Any kernel change that alters any golden byte requires re-running this
  * in the same commit: `sbt "runMain graft.tools.GoldenGen"`.
  */
object GoldenGen {

  val verifyCorpusSize = 600
  val goldenDir = "/root/repo/src/test/resources/golden"

  final case class GoldenRow(url: String, warc_ts: java.sql.Timestamp,
      text: String, outcome: String,
      engine: String, format: String, charset: String, n_nodes: Int,
      n_blocks: Int, n_spans: Int, truncated: Int, lang: String,
      dir: String, pred_lang: String,
      quality: Double, tokens_ws: Long, tokens_bpe: Long, fingerprint: Long,
      redirect: String, canonical: String, ldjson: Seq[String],
      metas: Seq[graft.model.MetaTag], feeds: Seq[String], title: String)
  final case class GoldenSpan(url: String, idx: Int, start: Int, end: Int,
      kind: String, path: String)
  final case class GoldenMode(url: String, mode: String, outcome: String,
      engine: String, n_spans: Long, text_md5: String)
  final case class GoldenLink(url: String, idx: Int, raw: String,
      resolved: String, chrome: Boolean, text: String)
  final case class GoldenHeading(url: String, idx: Int, level: Int,
      htext: String)
  final case class GoldenCell(url: String, tbl: Int, row: Int, col: Int,
      header: Boolean, ctext: String)

  def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[1]") // writer only; the data comes from the scalar loop
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val results = (0L until verifyCorpusSize.toLong).map { i =>
      Extractor.extract(SyntheticCorpus.row(i))
    }
    val rows = results.map { r =>
      GoldenRow(r.url, r.warc_ts, r.text, r.outcome, r.engine, r.format, r.charset,
        r.n_nodes, r.n_blocks, r.spans.length, if (r.truncated) 1 else 0,
        r.lang, r.dir,
        TextStats.langId(r.text), TextStats.dictHitRatio(r.text),
        TextStats.tokensWs(r.text), TextStats.tokensBpe(r.text),
        TextStats.fingerprint(r.text), r.redirect, r.canonical, r.ldjson,
        r.metas, r.feeds, r.title)
    }
    val spans = results.flatMap { r =>
      r.spans.zipWithIndex.map { case (s, i) =>
        GoldenSpan(r.url, i, s.start, s.end, s.kind, s.path)
      }
    }
    // prior-text × mode matrix golden (reference: _options.py:37-55 ×
    // _pipeline.py:352-372): the full corpus under every mode; spans are
    // detailed only under redo (the lazy-analysis gate)
    val modes = graft.model.ProcessingMode.all.flatMap { m =>
      val cfg = graft.model.ExtractConfig(mode = m,
        detailedSpans = m == graft.model.ProcessingMode.Redo)
      (0L until verifyCorpusSize.toLong).map { i =>
        val r = Extractor.extract(SyntheticCorpus.row(i), cfg)
        GoldenMode(r.url, m, r.outcome, r.engine, r.spans.length.toLong,
          md5hex(r.text))
      }
    }
    rows.toDF().sort("url").coalesce(1).write.mode("overwrite")
      .parquet(s"$goldenDir/extracted")
    spans.toDF().sort("url", "idx").coalesce(1).write.mode("overwrite")
      .parquet(s"$goldenDir/spans")
    modes.toDF().sort("mode", "url").coalesce(1).write.mode("overwrite")
      .parquet(s"$goldenDir/modes")
    val links = results.flatMap { r =>
      r.links.map(l => GoldenLink(r.url, l.idx, l.raw, l.resolved, l.chrome, l.text))
    }
    links.toDF().sort("url", "idx").coalesce(1).write.mode("overwrite")
      .parquet(s"$goldenDir/links")
    val headings = results.flatMap { r =>
      r.headings.zipWithIndex.map { case (h, i) =>
        GoldenHeading(r.url, i, h.level, h.text)
      }
    }
    headings.toDF().sort("url", "idx").coalesce(1).write.mode("overwrite")
      .parquet(s"$goldenDir/headings")
    val cells = results.flatMap { r =>
      r.cells.map(c => GoldenCell(r.url, c.tbl, c.row, c.col, c.header, c.text))
    }
    cells.toDF().sort("url", "tbl", "row", "col").coalesce(1)
      .write.mode("overwrite").parquet(s"$goldenDir/cells")
    println(s"[golden] wrote ${rows.length} rows, ${spans.length} spans, " +
      s"${modes.length} mode rows, ${links.length} links, " +
      s"${headings.length} headings, ${cells.length} cells")
    val byOutcome = rows.groupBy(_.outcome).view.mapValues(_.size).toMap
    println(s"[golden] outcomes: $byOutcome")
    val modeOutcomes = modes.groupBy(m => (m.mode, m.outcome))
      .view.mapValues(_.size).toMap.toSeq.sorted
    println(s"[golden] mode outcomes: $modeOutcomes")
    spark.stop()
  }
}
