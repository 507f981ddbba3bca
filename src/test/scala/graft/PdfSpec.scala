package graft

import graft.engine.{Extractor, PdfEngine}
import graft.gen.SyntheticCorpus
import graft.model.PageRow
import graft.pdf._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

class PdfSpec extends AnyFunSuite {

  private def row(bytes: Array[Byte]): PageRow =
    PageRow("https://t.test/pdf", new java.sql.Timestamp(0L), bytes, null, null)

  test("lexer: names, numbers, strings, hex, dicts, arrays, refs") {
    val src = "<< /Type /Page /N 3 /X 4.5 /S (a\\(b) /H <414243> /K [1 2 0 R /Nm] >>"
    val lx = new PdfLexer(src.getBytes(ISO_8859_1))
    val d = lx.parseValue().asInstanceOf[CosDict]
    assert(d.get("Type").contains(CosName("Page")))
    assert(d.get("N").contains(CosNum(3)))
    assert(d.get("S").exists { case CosStr(b) => new String(b, ISO_8859_1) == "a(b"; case _ => false })
    assert(d.get("H").exists { case CosStr(b) => new String(b, ISO_8859_1) == "ABC"; case _ => false })
    val arr = d.get("K").get.asInstanceOf[CosArr].items
    assert(arr(1) == CosRef(2, 0) || arr.contains(CosRef(2, 0)))
    assert(arr.contains(CosName("Nm")))
  }

  test("lexer: name with #hex escape; octal string escapes") {
    val lx = new PdfLexer("/A#42C (\\101\\102)".getBytes(ISO_8859_1))
    assert(lx.parseValue() == CosName("ABC"))
    assert(lx.parseValue().asInstanceOf[CosStr].bytes.toSeq ==
      "AB".getBytes(ISO_8859_1).toSeq)
  }

  test("content stream: stack discipline tolerates abuse (reference test_stack_abuse)") {
    val abuse = ("q " * 200) + "BT (x) Tj ET " + ("Q " * 300)
    val pt = ContentStream.interpret(abuse.getBytes(ISO_8859_1),
      Map("F1" -> Glyphs.default))
    assert(pt.truncated) // blew the 128 hard limit, flagged not thrown
    assert(pt.lines == Vector("x"))
  }

  test("content stream: Tj/TJ/quote ops, newline on Td y-move, Tr 3 invisible") {
    val ops = "BT /F1 9 Tf (AB) Tj [(C) -500 (D)] TJ 0 -10 Td (E) Tj " +
      "3 Tr (GONE) Tj 0 Tr (F) Tj ET"
    val pt = ContentStream.interpret(ops.getBytes(ISO_8859_1), Map.empty)
    assert(pt.lines == Vector("ABC D", "EF"))
  }

  test("cmap: bfchar + bfrange with both forms") {
    val cmap = """/CIDInit /ProcSet findresource begin
begincodespacerange <00> <FF> endcodespacerange
2 beginbfchar <41> <0058> <42> <0059> endbfchar
1 beginbfrange <50> <52> <0061> endbfrange
1 beginbfrange <60> <61> [<007A> <0079>] endbfrange
endcmap"""
    val (cb, m) = Glyphs.parseCMap(cmap.getBytes(ISO_8859_1))
    assert(cb == 1)
    assert(m(0x41) == "X" && m(0x42) == "Y")
    assert(m(0x50) == "a" && m(0x51) == "b" && m(0x52) == "c")
    assert(m(0x60) == "z" && m(0x61) == "y")
  }

  test("fontinfo: WinAnsi high range; unmapped high byte → U+FFFD without encoding") {
    val win = FontInfo(None, 1, Some(Glyphs.winAnsi))
    assert(win.decode(Array(0x80.toByte)) == "€")
    assert(win.decode("caf".getBytes(ISO_8859_1) :+ 0xe9.toByte) == "café")
    val none = Glyphs.default
    assert(none.decode(Array('A'.toByte, 0xe9.toByte)) == "A�")
  }

  test("engine: two-page synthetic pdf → page texts merged with \\f in order") {
    val pdf = SyntheticCorpus.pdf(new SyntheticCorpus.Rng(3), 0)
    val r = PdfEngine.extract(row(pdf))
    assert(r.outcome == "ok")
    val pages = r.text.split('\f')
    assert(pages.length == 2)
    assert(pages(0).nonEmpty && pages(1).nonEmpty)
    assert(r.spans.map(_.path) == Vector("/page[1]", "/page[2]"))
    // spans address the page slices exactly
    r.spans.zip(pages).foreach { case (s, p) =>
      assert(r.text.substring(s.start, s.end) == p)
    }
  }

  test("engine: no-ToUnicode font high bytes become U+FFFD (layout.py conservatism)") {
    val pdf = SyntheticCorpus.pdf(new SyntheticCorpus.Rng(3), 1)
    val r = PdfEngine.extract(row(pdf))
    assert(r.outcome == "ok")
    assert(r.text.startsWith("caf�"))
  }

  test("engine: encrypted pdf → skipped:encrypted (EncryptedPdfError analog)") {
    val pdf = SyntheticCorpus.pdf(new SyntheticCorpus.Rng(3), 2)
    val r = Extractor.extract(row(pdf))
    assert(r.outcome == "skipped:encrypted")
    assert(r.text.isEmpty)
  }

  test("parser: garbage after %PDF- yields outcome, never throws") {
    val junk = ("%PDF-1.7\n" + "1 0 obj << /broken" ).getBytes(ISO_8859_1)
    val r = Extractor.extract(row(junk))
    assert(r.outcome.startsWith("error") || r.outcome.startsWith("skipped"))
  }

  test("engine: form xobject text recursed via Do operator") {
    val pdf = SyntheticCorpus.pdfXObject(new SyntheticCorpus.Rng(5))
    val r = PdfEngine.extract(row(pdf))
    assert(r.outcome == "ok")
    assert(r.text.startsWith("before form\n"))
    assert(r.text.length > "before form\n".length) // inner form text present
  }

  test("engine: XFA AcroForm rejected with typed outcome") {
    val base = new String(SyntheticCorpus.pdf(new SyntheticCorpus.Rng(3), 0),
      ISO_8859_1)
    val xfa = base.replace(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "1 0 obj << /Type /Catalog /Pages 2 0 R /AcroForm 8 0 R >> endobj\n" +
        "8 0 obj << /Fields [] /XFA 9 0 R >> endobj")
    val r = PdfEngine.extract(row(xfa.getBytes(ISO_8859_1)))
    assert(r.outcome == "rejected:xfa_form")
  }
}
