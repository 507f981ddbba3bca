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

  test("content stream: a Q pairing a cap-suppressed q must not pop real state") {
    // fill to the hard limit, then: q (suppressed) / Tr 3 (invisible) /
    // Q (must pair the SUPPRESSED q, leaving Tr 3 live) — popping a real
    // entry instead would restore Tr 0 and leak the invisible string
    val ops = ("q " * ContentStream.hardStackLimit) +
      "q 3 Tr BT (secret) Tj ET Q BT (visible) Tj ET"
    val pt = ContentStream.interpret(ops.getBytes(ISO_8859_1),
      Map("F1" -> Glyphs.default))
    assert(pt.truncated) // the suppressed q flagged
    // Tr 3 text never emitted; Q after it paired the suppressed q so
    // render mode STAYS 3 for the following text too
    assert(!pt.lines.exists(_.contains("secret")), pt.lines.toString)
    assert(!pt.lines.exists(_.contains("visible")), pt.lines.toString)
  }

  test("glyphs: CMap parse memo hits on equal content, misses on new") {
    // the MultiFontManager analog: identical ToUnicode bytes across rows
    // parse once per thread; distinct content parses fresh
    val cmap = ("begincodespacerange <00> <FF> endcodespacerange " +
      "beginbfchar <41> <005A> endbfchar").getBytes(ISO_8859_1)
    val copy = cmap.clone() // distinct array, equal content
    val before = Glyphs.cmapParses.get()
    val a = Glyphs.parseCMapCached(cmap)
    val b = Glyphs.parseCMapCached(copy)
    assert(a == b && a._2(0x41) == "Z")
    assert(Glyphs.cmapParses.get() == before + 1) // one real parse
    val other = ("beginbfchar <42> <0059> endbfchar").getBytes(ISO_8859_1)
    Glyphs.parseCMapCached(other)
    assert(Glyphs.cmapParses.get() == before + 2)
  }

  test("content stream: Q restores the font set by Tf (graphics state)") {
    // the current font is graphics state (PDF 32000-1 §8.4.1): after Q,
    // show-text ops must decode with the outer font's map again
    val inner = FontInfo(Some(Map(0x41 -> "Z")), 1, None) // A → Z
    val ops = "BT /F1 9 Tf (A) Tj q /F2 9 Tf (A) Tj Q (A) Tj ET"
    val pt = ContentStream.interpret(ops.getBytes(ISO_8859_1),
      Map("F1" -> Glyphs.default, "F2" -> inner))
    assert(pt.lines == Vector("AZA"))
  }

  test("filters: PNG and TIFF predictors reversed; unsupported → typed reject") {
    val rows = Array[Byte](10, 20, 30, 40, 9, 19, 29, 39, 50, 60, 70, 80)
    val rowBytes = 4
    // encode with per-row PNG filters: None, Up, Sub (bpp=1)
    val enc = new java.io.ByteArrayOutputStream()
    def rowAt(r: Int) = rows.slice(r * rowBytes, (r + 1) * rowBytes)
    enc.write(0); enc.write(rowAt(0))
    enc.write(2) // Up
    rowAt(1).zip(rowAt(0)).foreach { case (c, u) => enc.write((c - u) & 0xff) }
    enc.write(1) // Sub
    val r2 = rowAt(2)
    enc.write(r2(0).toInt); (1 until rowBytes).foreach(i =>
      enc.write((r2(i) - r2(i - 1)) & 0xff))
    val dec = PdfDoc.unpredict(enc.toByteArray, 15, 1, 8, rowBytes)
    assert(dec.exists(_.sameElements(rows)))
    // Paeth round-trip on a 2-bpp layout
    val orig = Array[Byte](1, 2, 3, 4, 5, 6)
    val p = new java.io.ByteArrayOutputStream()
    p.write(4)
    val bpp = 2
    (0 until 6).foreach { i =>
      val left = if (i >= bpp) orig(i - bpp) & 0xff else 0
      p.write((orig(i) - PdfDoc.paeth(left, 0, 0)) & 0xff)
    }
    val dp = PdfDoc.unpredict(p.toByteArray, 12, 2, 8, 3)
    assert(dp.exists(_.sameElements(orig)))
    // TIFF horizontal differencing
    val t = Array[Byte](5, 3, 2, 1) // orig 5,8,10,11 with bpp=1
    assert(PdfDoc.unpredict(t, 2, 1, 8, 4).exists(
      _.sameElements(Array[Byte](5, 8, 10, 11))))
    // unsupported shapes are typed rejects, not garbage
    assert(PdfDoc.unpredict(t, 7, 1, 8, 4).isEmpty) // unknown predictor
    assert(PdfDoc.unpredict(t, 2, 1, 16, 2).isEmpty) // 16-bit TIFF
    assert(PdfDoc.unpredict(t, 10, 0, 8, 4).isEmpty) // malformed parms
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

  test("engine: xobject budget exhaustion sets truncated, never silent") {
    // >4096 Form XObjects on one page: the per-document materialization
    // budget trips while building the resource map — the overflow forms'
    // Do lookups will no-op, which is data loss and MUST surface as
    // truncated=true (not a silent drop with truncated=false)
    val n = 4200
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    val xrefs = (0 until n).map(i => s"/Fm$i ${6 + i} 0 R").mkString(" ")
    sb.append("3 0 obj << /Type /Page /Parent 2 0 R /Resources " +
      s"<< /Font << /F1 4 0 R >> /XObject << $xrefs >> >> " +
      "/MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
    sb.append("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >> endobj\n")
    val outer = "BT /F1 12 Tf 72 720 Td (page text) Tj ET"
    sb.append(s"5 0 obj << /Length ${outer.length} >> stream\n")
    sb.append(outer).append("\nendstream endobj\n")
    val inner = "BT /F1 11 Tf 10 10 Td (inner) Tj ET"
    for (i <- 0 until n) {
      sb.append(s"${6 + i} 0 obj << /Type /XObject /Subtype /Form " +
        s"/BBox [0 0 10 10] /Length ${inner.length} >> stream\n")
      sb.append(inner).append("\nendstream endobj\n")
    }
    sb.append("trailer << /Root 1 0 R >>\n%%EOF\n")
    val r = PdfEngine.extract(row(sb.toString.getBytes(ISO_8859_1)))
    assert(r.outcome == "ok")
    assert(r.truncated, "budget-dropped Form XObjects must flag truncated")
    assert(r.text.contains("page text")) // page's own text still extracted
  }

  test("engine: undecodable Form XObject stream sets truncated") {
    // a Form whose stream decode fails (unsupported filter) is dropped —
    // its Do no-ops and its text is lost; same silent-loss class as
    // budget exhaustion, must raise the same flag
    val inner = "BT /F1 11 Tf 10 10 Td (inner) Tj ET"
    val pdf = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Resources " +
      "<< /Font << /F1 4 0 R >> /XObject << /Fm0 6 0 R >> >> " +
      "/MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n" +
      "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica" +
      " /Encoding /WinAnsiEncoding >> endobj\n" +
      "5 0 obj << /Length 43 >> stream\n" +
      "BT /F1 12 Tf 72 720 Td (page text) Tj ET\n" +
      "endstream endobj\n" +
      s"6 0 obj << /Type /XObject /Subtype /Form /BBox [0 0 10 10] " +
      s"/Filter /DCTDecode /Length ${inner.length} >> stream\n" +
      inner + "\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n"
    val r = PdfEngine.extract(row(pdf.getBytes(ISO_8859_1)))
    assert(r.outcome == "ok")
    assert(r.truncated, "decode-failed Form XObject must flag truncated")
    assert(r.text.contains("page text"))
    assert(!r.text.contains("inner")) // the form's text really is lost
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

  test("filters: ASCIIHex, ASCII85, RunLength, LZW decode round-trips") {
    val data = ("Hello filter world! " * 7 + "\u0000\u00ff binary")
      .getBytes(ISO_8859_1)
    // ASCIIHex
    val hex = (data.map(b => f"${b & 0xff}%02x").mkString + ">").getBytes(ISO_8859_1)
    assert(PdfDoc.asciiHexDecode(hex).toSeq == data.toSeq)
    // ASCII85 (encode in-test)
    val a85 = {
      val sb = new StringBuilder
      var i = 0
      while (i < data.length) {
        val n = math.min(4, data.length - i)
        var t = 0L
        (0 until 4).foreach { k =>
          t = (t << 8) | (if (i + k < data.length) data(i + k) & 0xff else 0)
        }
        if (n == 4 && t == 0) sb.append('z')
        else {
          val cs = new Array[Char](5)
          var v = t
          (4 to 0 by -1).foreach { k => cs(k) = ('!' + (v % 85)).toChar; v /= 85 }
          sb.append(new String(cs, 0, n + 1))
        }
        i += 4
      }
      (sb.toString + "~>").getBytes(ISO_8859_1)
    }
    assert(PdfDoc.ascii85Decode(a85).toSeq == data.toSeq)
    // RunLength (literal-only encoding is valid RLE)
    val rle = {
      val out = new java.io.ByteArrayOutputStream()
      data.grouped(127).foreach { g =>
        out.write(g.length - 1); out.write(g, 0, g.length)
      }
      out.write(128)
      out.toByteArray
    }
    assert(PdfDoc.runLengthDecode(rle).toSeq == data.toSeq)
    // LZW (encode in-test with the PDF variant: clear, 9->12 bits, earlyChange=1)
    val lzw = {
      val out = new java.io.ByteArrayOutputStream()
      var buf = 0L; var nbits = 0; var codeBits = 9
      val dict = scala.collection.mutable.HashMap[List[Byte], Int]()
      var next = 258
      (0 until 256).foreach(b => dict(List(b.toByte)) = b)
      def emit(code: Int): Unit = {
        buf = (buf << codeBits) | code; nbits += codeBits
        while (nbits >= 8) { out.write(((buf >> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
      }
      emit(256)
      var w = List.empty[Byte]
      data.foreach { b =>
        val wb = w :+ b
        if (dict.contains(wb)) w = wb
        else {
          emit(dict(w))
          dict(wb) = next; next += 1
          if (next + 1 - 1 >= (1 << codeBits) && codeBits < 12) codeBits += 1
          w = List(b)
        }
      }
      if (w.nonEmpty) emit(dict(w))
      emit(257)
      if (nbits > 0) out.write(((buf << (8 - nbits)) & 0xff).toInt)
      out.toByteArray
    }
    assert(PdfDoc.lzwDecode(lzw, 1).toSeq == data.toSeq)
  }

  test("lzw: code-width bump crosses the 9-to-10-bit boundary correctly") {
    // spec-correct EarlyChange=1 encoder: emit 256, then literal codes
    // for 600 DISTINCT two-byte-ish sequences so the dictionary passes
    // 511 entries and the decoder must widen to 10 bits at the right
    // code — the former off-by-one garbled everything past the boundary
    val data = Array.tabulate[Byte](1200)(i => ((i * 37) % 251).toByte)
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L; var nbits = 0
    var codeBits = 9
    var dictSize = 258
    def put(code: Int): Unit = {
      buf = (buf << codeBits) | code; nbits += codeBits
      while (nbits >= 8) { out.write(((buf >> (nbits - 8)) & 0xff).toInt); nbits -= 8 }
    }
    put(256)
    // naive encoder: every input byte as a literal code, growing the dict
    // exactly as the spec decoder does (first code adds nothing; each
    // subsequent adds one entry)
    var first = true
    data.foreach { b =>
      put(b & 0xff)
      if (!first) {
        dictSize += 1
        if (dictSize + 1 >= (1 << codeBits) && codeBits < 12) codeBits += 1
      }
      first = false
    }
    put(257)
    if (nbits > 0) out.write(((buf << (8 - nbits)) & 0xff).toInt)
    val decoded = PdfDoc.lzwDecode(out.toByteArray, 1)
    assert(decoded.toSeq == data.toSeq,
      s"LZW boundary drift at ${decoded.toSeq.zip(data.toSeq).indexWhere(p => p._1 != p._2)}")
  }

  test("glyphs: full MacRoman table and algorithmic uniXXXX names") {
    import graft.pdf.Glyphs
    // 0xF1..0xFF were shifted one glyph before the table fix
    assert(Glyphs.macRoman(0xf1) == "Ò")
    assert(Glyphs.macRoman(0xf2) == "Ú")
    assert(Glyphs.macRoman(0xff) == "ˇ")
    assert(Glyphs.macRoman(0xca) == "\u00a0") // NBSP, not plain space
    // algorithmic AGL names map directly to code points
    assert(Glyphs.algorithmicGlyph("uni00E9") == "é")
    assert(Glyphs.algorithmicGlyph("u00E9") == "é")
    assert(Glyphs.algorithmicGlyph("u1F600") == new String(Character.toChars(0x1f600)))
    assert(Glyphs.algorithmicGlyph("uniD800") == null) // surrogate
    assert(Glyphs.algorithmicGlyph("unicode") == null) // not hex
    assert(Glyphs.algorithmicGlyph("eacute") == null) // named, not algorithmic
  }

  test("parser: duplicate kids in the page tree emit the page once") {
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 3 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val doc = PdfDoc.parse(pdf)
    assert(doc.pages.length == 1, s"duplicate kid visited twice: ${doc.pages.length}")
  }

  test("engine: doc-level policy matrix (tagged / acroform / signature)") {
    import graft.model.{ExtractConfig, ProcessingMode => M}
    val rng = () => new SyntheticCorpus.Rng(3)
    val tagged = row(SyntheticCorpus.pdf(rng(), 3))
    val form = row(SyntheticCorpus.pdf(rng(), 4))
    val signed = row(SyntheticCorpus.pdf(rng(), 5))
    def out(r: PageRow, m: String): String =
      PdfEngine.extractSniffed(r, graft.engine.Sniffer.sniff(r.html),
        ExtractConfig(mode = m)).outcome
    // tagged PDF: reject under default ONLY (reference TaggedPDFError when
    // tagged_pdf_mode=default AND mode=default, _pipeline.py:264-279)
    assert(out(tagged, M.Default) == "rejected:tagged_pdf")
    Seq(M.Force, M.Skip, M.Redo).foreach(m => assert(out(tagged, m) == "ok"))
    // fillable AcroForm: reject under redo ONLY (InputFileError,
    // _pipeline.py:246-254); other modes warn and proceed
    assert(out(form, M.Redo) == "rejected:acroform_redo")
    Seq(M.Default, M.Force, M.Skip).foreach(m => assert(out(form, m) == "ok"))
    // digital signature (SigFlags bit 1 = SignaturesExist): reject in
    // EVERY mode (DigitalSignatureError, _pipeline.py:241-245)
    Seq(M.Default, M.Force, M.Skip, M.Redo).foreach(m =>
      assert(out(signed, m) == "rejected:digital_signature"))
    // SigFlags = 2 is AppendOnly WITHOUT SignaturesExist — an unsigned
    // fillable form, NOT a signed doc (PDF 32000-1 §12.7.2): flows
    // through the acroform branch instead
    val appendOnly = row(new String(SyntheticCorpus.pdf(rng(), 5),
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/SigFlags 3", "/SigFlags 2")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(out(appendOnly, M.Default) == "ok")
    assert(out(appendOnly, M.Redo) == "rejected:acroform_redo")
  }

  test("engine: ASCIIHex-filtered content stream extracts (nomap fixture)") {
    val pdf = SyntheticCorpus.pdf(new SyntheticCorpus.Rng(3), 1)
    val r = PdfEngine.extract(row(pdf))
    assert(r.outcome == "ok")
    assert(r.text.startsWith("caf\ufffd"))
  }

  test("content stream: inline image binary skipped, text resumes after EI") {
    val payload = Array[Byte](40, 41, 92, 60, 0x45, 0x49, 1, 2) // "()\\<EI" junk
    val pre = "BT /F1 9 Tf (before) Tj ET BI /W 2 /H 2 /BPC 8 ID "
      .getBytes(ISO_8859_1)
    val post = " EI BT (after) Tj ET".getBytes(ISO_8859_1)
    val pt = ContentStream.interpret(pre ++ payload ++ post, Map.empty)
    assert(pt.lines == Vector("before", "after"))
  }

  test("parser: speculative xref fast path equals full scan; stale xref falls back") {
    val content = "BT /F1 9 Tf (xref fast path) Tj ET"
    val objs = Vector(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >> endobj\n",
      s"5 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    objs.foreach { o => offs += sb.length; sb.append(o) }
    val xrefOff = sb.length
    sb.append("xref\n0 6\n").append("0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    val bytes = sb.toString.getBytes(ISO_8859_1)
    val fast = PdfDoc.parseViaXref(bytes)
    assert(fast.isDefined)
    assert(fast.get.parseNotes.contains("xref:fast_path"))
    val full = PdfDoc.parseFullScan(bytes)
    assert(fast.get.pages.length == full.pages.length)
    val r = PdfEngine.extract(row(bytes))
    assert(r.outcome == "ok" && r.text == "xref fast path")
    // stale startxref: fast path rejects, tolerant scan still extracts
    val stale = sb.toString.replace(s"startxref\n$xrefOff\n", "startxref\n3\n")
      .getBytes(ISO_8859_1)
    assert(PdfDoc.parseViaXref(stale).isEmpty)
    assert(PdfEngine.extract(row(stale)).text == "xref fast path")
  }

  test("parser: xref STREAM with Up predictor drives the fast path") {
    val content = "BT /F1 9 Tf (xref stream path) Tj ET"
    val objs = Vector(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
      "3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n",
      "4 0 obj << /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >> endobj\n",
      s"5 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    val sb = new StringBuilder("%PDF-1.5\n")
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    objs.foreach { o => offs += sb.length; sb.append(o) }
    val xrefOff = sb.length
    // xref rows, W = [1 2 1]: (type, offset, 0) for objects 0..6
    val rows: Vector[Array[Int]] =
      Vector(Array(0, 0, 0)) ++
        offs.map(o => Array(1, o, 0)) :+ Array(1, xrefOff, 0)
    val rowBytes = 4
    val plain = rows.map(r =>
      Array[Byte](r(0).toByte, ((r(1) >> 8) & 0xff).toByte,
        (r(1) & 0xff).toByte, r(2).toByte))
    // PNG Up predictor encode (filter type 2 per row)
    val enc = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](rowBytes)
    plain.foreach { cur =>
      enc.write(2)
      (0 until rowBytes).foreach(i => enc.write((cur(i) - prev(i)) & 0xff))
      prev = cur
    }
    val stm = SyntheticCorpus.deflate(enc.toByteArray)
    sb.append(s"6 0 obj << /Type /XRef /Size 7 /Root 1 0 R /W [1 2 1] /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> /Length ${stm.length} >> stream\n")
    val head = sb.toString.getBytes(ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head, 0, head.length)
    out.write(stm, 0, stm.length)
    val tail = s"\nendstream endobj\nstartxref\n$xrefOff\n%%EOF\n".getBytes(ISO_8859_1)
    out.write(tail, 0, tail.length)
    val bytes = out.toByteArray
    val fast = PdfDoc.parseViaXref(bytes)
    assert(fast.isDefined, "xref-stream fast path did not engage")
    assert(fast.get.parseNotes.contains("xref:fast_path"))
    val r = PdfEngine.extract(row(bytes))
    assert(r.outcome == "ok" && r.text == "xref stream path")
  }

  test("parser: objects inside compressed ObjStm + xref-stream Root resolve") {
    def obj(ss: String*): String = ss.mkString(" ")
    val inner = Vector(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
      "<< /Type /Font /Subtype /Type1 /Encoding /WinAnsiEncoding >>")
    val nums = Vector(1, 2, 3, 4)
    val offsets = inner.scanLeft(0)((acc, o) => acc + o.length + 1).init
    val header = nums.zip(offsets).map { case (n, o) => s"$n $o" }.mkString(" ")
    val payload = (header + " " + inner.mkString(" ")).getBytes(ISO_8859_1)
    val first = header.length + 1
    val stm = SyntheticCorpus.deflate(payload)
    val content = "BT /F1 9 Tf (objstm works) Tj ET".getBytes(ISO_8859_1)
    val sb = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = sb.write(x.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"6 0 obj << /Type /ObjStm /N 4 /First $first /Length ${stm.length} /Filter /FlateDecode >> stream\n")
    sb.write(stm, 0, stm.length)
    w("\nendstream endobj\n")
    w(s"5 0 obj << /Length ${content.length} >> stream\n")
    sb.write(content, 0, content.length)
    w("\nendstream endobj\n")
    w("7 0 obj << /Type /XRef /Root 1 0 R /Size 8 /Length 0 >> stream\nendstream endobj\n")
    w("%%EOF\n")
    val r = PdfEngine.extract(row(sb.toByteArray))
    assert(r.outcome == "ok", r.outcome)
    assert(r.text == "objstm works")
  }
}
