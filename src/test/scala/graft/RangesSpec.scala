package graft

import graft.engine.PdfEngine
import graft.extract.Ranges
import graft.model.PageRow
import graft.pdf.PdfDoc
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

class RangesSpec extends AnyFunSuite {

  test("ranges: run-length compression (enumerate_compress_ranges parity)") {
    assert(Ranges.compress(Nil) == Nil)
    assert(Ranges.compress(Seq(3)) == Seq("3"))
    assert(Ranges.compress(Seq(1, 2, 3, 5, 7, 8)) == Seq("1-3", "5", "7-8"))
    assert(Ranges.compress(Seq(8, 7, 5, 3, 2, 1, 1)) == Seq("1-3", "5", "7-8"))
  }

  test("pdf merge: textless pages get one placeholder per run") {
    // 3 pages: page 2 has no content stream
    def page(num: Int, contents: String): String =
      s"$num 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 40 0 R >> >> " +
        contents + " >> endobj\n"
    val c = "BT /F1 9 Tf (hello) Tj ET".getBytes(ISO_8859_1)
    val pdf = new StringBuilder()
    pdf.append("%PDF-1.4\n")
    pdf.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    pdf.append("2 0 obj << /Type /Pages /Kids [3 0 R 4 0 R 5 0 R] /Count 3 >> endobj\n")
    pdf.append(page(3, "/Contents 50 0 R"))
    pdf.append(page(4, ""))
    pdf.append(page(5, "/Contents 50 0 R"))
    pdf.append("40 0 obj << /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >> endobj\n")
    pdf.append(s"50 0 obj << /Length ${c.length} >> stream\n")
    pdf.append(new String(c, ISO_8859_1))
    pdf.append("\nendstream endobj\ntrailer << /Root 1 0 R >>\n")
    val r = PdfEngine.extract(
      PageRow("u", new java.sql.Timestamp(0), pdf.toString.getBytes(ISO_8859_1), null, null))
    assert(r.outcome == "ok")
    assert(r.text == "hello\f[no text on page(s) 2]\fhello")
    assert(r.spans.map(_.kind) == Vector("pdf_text", "pdf_skip", "pdf_text"))
  }

  test("ranges: --pages grammar parse with end alias and tolerance") {
    assert(Ranges.parse("1-3,5,end", 10) == Set(1, 2, 3, 5, 10))
    assert(Ranges.parse("7-end", 9) == Set(7, 8, 9))
    // the interval form agrees with the set form and merges overlaps
    assert(Ranges.intervals("1-3,5,end", 10) == Seq((1, 3), (5, 5), (10, 10)))
    assert(Ranges.intervals("1-4,3-6,7,9", 10) == Seq((1, 7), (9, 9)))
    assert(Ranges.intervals("junk,,-", 10) == Nil)
    assert(Ranges.intervals("2-end", 5).flatMap { case (l, h) => l to h }.toSet ==
      Ranges.parse("2-end", 5))
    assert(Ranges.parse("", 5) == Set.empty)
    assert(Ranges.parse("0,3,99", 5) == Set(3)) // out-of-range clamped away
    assert(Ranges.parse("x,2,bad-4,5-2", 5) == Set(2)) // malformed skipped
    // merge at Int.MaxValue: phi+1 wraps in Int — two end-anchored
    // intervals must still merge (the non-overlapping contract)
    assert(Ranges.intervals("5-end,7-end", Int.MaxValue) ==
      Seq((5, Int.MaxValue)))
  }
}
