package graft.extract

import graft.model.Span
import scala.collection.mutable.ArrayBuffer

/** Assembles the final extracted text + character spans from kept blocks.
  *
  * Determinism rules (SURVEY.md §7.5): words joined by single space except
  * CJK–CJK (reference: src/ocrmypdf/fpdf_renderer/renderer.py:740-748,
  * 813-849), blocks joined by "\n\n", title first. Span offsets are
  * character offsets into the final text — the analog of the reference's
  * text-layer emission computing positions for each line
  * (reference: src/ocrmypdf/fpdf_renderer/renderer.py:380-427, collapsed
  * from matrix math to offset arithmetic in the text domain).
  */
object TextAssembler {

  /** `title` is the normalized title TEXT itself ('' when none) — the
    * doc-index field. Consumers must NOT re-derive it by substringing
    * `text` under the title span: span offsets are UTF-16 code units
    * while SQL substr counts code points, so a non-BMP title character
    * would shift the cut in every SQL engine identically (invisible to
    * cross-engine verification). */
  final case class Assembled(text: String, spans: Vector[Span],
      title: String)

  /** `emitSpans = false` is the lazy detailed-analysis gate (reference
    * runs char-level layout only under redo_ocr,
    * src/ocrmypdf/_pipelines/_common.py:361): text bytes are identical,
    * span bookkeeping is skipped entirely. */
  def assemble(title: String, blocks: Vector[Block],
      emitSpans: Boolean = true): Assembled = {
    val sb = new java.lang.StringBuilder(256)
    val spans = new ArrayBuffer[Span](if (emitSpans) blocks.length + 1 else 0)

    def emit(text: String, kind: String, path: String): Unit = {
      if (text.isEmpty) return
      if (sb.length > 0) sb.append("\n\n")
      val start = sb.length
      sb.append(text)
      if (emitSpans) spans += Span(start, sb.length, kind, path)
    }

    val titleText = Blocks.joinWords(splitWords(Blocks.nfkc(title)))
    if (titleText.nonEmpty) emit(titleText, "title", "/html/head/title")
    blocks.foreach { b => emit(b.text, b.kind, b.path) } // joined in segment()
    Assembled(sb.toString, spans.toVector, titleText)
  }

  /** First-strong bidi direction (reference:
    * src/ocrmypdf/fpdf_renderer/renderer.py:30-42 `_is_rtl_text` — the
    * first character with a strong directional class decides). Neutral-
    * only or empty text defaults to "ltr" (the HTML default direction). */
  def firstStrongDir(s: String): String = {
    if (s == null) return "ltr"
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      Character.getDirectionality(cp) match {
        case Character.DIRECTIONALITY_LEFT_TO_RIGHT => return "ltr"
        case Character.DIRECTIONALITY_RIGHT_TO_LEFT |
             Character.DIRECTIONALITY_RIGHT_TO_LEFT_ARABIC => return "rtl"
        case _ => ()
      }
      i += Character.charCount(cp)
    }
    "ltr"
  }

  def splitWords(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
      } else cur.append(c)
      i += 1
    }
    if (cur.length > 0) out += cur.toString
    out.result()
  }
}
