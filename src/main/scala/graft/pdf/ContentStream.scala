package graft.pdf

import scala.collection.mutable.ArrayBuffer

/** Streaming interpreter over the PDF content-stream token sequence.
  *
  * Directly modeled on the reference's interpreter (reference:
  * src/ocrmypdf/pdfinfo/_contentstream.py:137-266 `_interpret_contents`):
  * single pass, explicit graphics-state stack with the same bounded-depth
  * discipline (soft warn past 32, hard stop past 128, underflow tolerated
  * :186-199), a whitelist of handled operators, and carry-on behavior for
  * malformed operands. Text render mode 3 (invisible) is excluded from
  * output — the `strip_invisible_text` rule
  * (reference: src/ocrmypdf/_graft.py:179-221 tracks Tr through q/Q).
  */
object ContentStream {

  final case class PageText(lines: Vector[String], truncated: Boolean,
      deepNesting: Boolean = false) // soft-limit flag: >32 q-depth seen,
      // suspicious nesting but no data lost (hard stop = truncated)

  val softStackLimit = 32
  val hardStackLimit = 128

  /** TJ adjustments at or below this (thousandths of text space) insert a
    * word space — fixed, specified threshold. */
  val tjSpaceThreshold = -180.0

  /** Form XObject recursion cap (reference: recursive descent through
    * page → Form XObjects, src/ocrmypdf/pdfinfo/_image.py:379-431, with
    * our own bounded-depth guard in the spirit of the stack rule). */
  val maxXObjectDepth = 8

  /** A drawable Form XObject: its content bytes + its own font map. */
  final case class FormXObject(content: Array[Byte],
      fonts: Map[String, FontInfo],
      xobjects: Map[String, FormXObject] = Map.empty)

  def interpret(content: Array[Byte], fonts: Map[String, FontInfo],
      xobjects: Map[String, FormXObject] = Map.empty,
      depth: Int = 0): PageText = {
    val lx = new PdfLexer(content)
    var truncated = false
    var deepNesting = false // soft-limit flag (no data loss yet)

    var gsDepth = 0
    var skippedQ = 0 // q ops suppressed past hardStackLimit (pairs their Q)
    // graphics state saved/restored by q/Q: the text render mode (Tr) AND
    // the current font (Tf) are both part of the PDF graphics state
    // (PDF 32000-1 §8.4.1 lists text state among the device-independent
    // graphics state parameters), so Q must restore the outer font or
    // subsequent show-text ops decode with the wrong glyph/ToUnicode map
    var renderMode = 0
    var font: FontInfo = Glyphs.default
    val gsStack = new ArrayBuffer[(Int, FontInfo)]

    var curY = Double.NaN // text-space y of current line (from Tm/Td)
    val lines = Vector.newBuilder[String]
    val line = new java.lang.StringBuilder

    val operands = new ArrayBuffer[Cos](8)

    def newline(): Unit = {
      if (line.length > 0) { lines += line.toString; line.setLength(0) }
    }

    def emit(s: CosStr): Unit = {
      if (renderMode != 3) line.append(font.decode(s.bytes))
    }

    def num(i: Int): Double = operands.lift(i) match {
      case Some(CosNum(d)) => d
      case _ => 0.0
    }

    var tok = lx.next()
    while (tok != null) {
      tok match {
        case CosOp("[") =>
          // array operand (TJ): collect inline
          val items = Vector.newBuilder[Cos]
          var t = lx.next()
          while (t != null && t != CosOp("]")) { items += t; t = lx.next() }
          operands += CosArr(items.result())
        case CosOp("<<") =>
          operands += lx.parseFrom(CosOp("<<")) // e.g. BDC property lists
        case CosOp(op) =>
          op match {
            case "q" =>
              if (gsDepth < hardStackLimit) {
                gsDepth += 1; gsStack += ((renderMode, font))
                // the reference's soft-limit discipline: depth past 32 is
                // suspicious nesting — flagged (truncated=false would hide
                // it), processing continues to the hard stop
                if (gsDepth > softStackLimit) deepNesting = true
              } else {
                // past hard limit: ignore, flag — and COUNT the skip so
                // the matching Q is also ignored (popping a real entry
                // for a skipped push would misrestore Tr/font and could
                // surface invisible text as visible; same pairing
                // discipline as TreeBuilder's cap-suppressed tags)
                skippedQ += 1
                truncated = true
              }
            case "Q" =>
              if (skippedQ > 0) skippedQ -= 1 // pairs a suppressed q
              else if (gsDepth > 0) {
                gsDepth -= 1
                if (gsStack.nonEmpty) {
                  val (rm, f) = gsStack.last
                  renderMode = rm; font = f
                  gsStack.dropRightInPlace(1)
                }
              } // underflow tolerated (reference :193-199)
            case "BT" =>
              curY = Double.NaN
            case "ET" =>
              newline()
            case "Tf" =>
              operands.collectFirst { case CosName(f) => f }.foreach { f =>
                font = fonts.getOrElse(f, Glyphs.default)
              }
            case "Tr" =>
              renderMode = num(0).toInt
            case "Td" | "TD" =>
              if (operands.length >= 2 && num(1) != 0.0) newline()
            case "Tm" =>
              if (operands.length >= 6) {
                val y = num(5)
                if (!curY.isNaN && y != curY) newline()
                curY = y
              }
            case "T*" => newline()
            case "Tj" =>
              operands.collectFirst { case s: CosStr => s }.foreach(emit)
            case "'" =>
              newline()
              operands.collectFirst { case s: CosStr => s }.foreach(emit)
            case "\"" =>
              newline()
              operands.collectFirst { case s: CosStr => s }.foreach(emit)
            case "TJ" =>
              operands.collectFirst { case a: CosArr => a }.foreach { arr =>
                arr.items.foreach {
                  case s: CosStr => emit(s)
                  case CosNum(adj) =>
                    if (adj <= tjSpaceThreshold && renderMode != 3 &&
                      line.length > 0 && line.charAt(line.length - 1) != ' ')
                      line.append(' ')
                  case _ => ()
                }
              }
            case "ID" =>
              // inline image (BI..ID <raw binary> EI): the binary payload
              // is not COS syntax — skip the lexer directly past "EI"
              // (reference: _find_inline_images treats BI/ID/EI as an
              // opaque unit, src/ocrmypdf/pdfinfo/_image.py:264-303)
              var ei = PdfDoc.indexOf(lx.data, "EI", lx.pos)
              def wsAt(p: Int): Boolean = p < 0 || p >= lx.data.length || {
                val c = lx.data(p) & 0xff
                c == 0x20 || c == 0x0a || c == 0x0d || c == 0x09 || c == 0x00
              }
              // "EI" must be whitespace-delimited (it can occur inside the
              // binary payload otherwise)
              while (ei >= 0 && !(wsAt(ei - 1) && wsAt(ei + 2)))
                ei = PdfDoc.indexOf(lx.data, "EI", ei + 2)
              lx.pos = if (ei < 0) lx.data.length else ei + 2
            case "Do" =>
              // Form XObject draw: recurse with the form's own resources
              // (depth-capped; image XObjects have no text and are skipped)
              operands.collectFirst { case CosName(nm) => nm }.foreach { nm =>
                xobjects.get(nm).foreach { fx =>
                  if (depth < maxXObjectDepth) {
                    newline()
                    val inner = interpret(fx.content,
                      if (fx.fonts.nonEmpty) fx.fonts else fonts,
                      fx.xobjects, depth + 1)
                    inner.lines.foreach { l => line.append(l); newline() }
                    if (inner.truncated) truncated = true
                    // the soft-limit flag must survive the recursion too:
                    // a form whose own q-nesting is suspicious flags the
                    // page, or the metric under-counts exactly the docs
                    // it exists to surface
                    if (inner.deepNesting) deepNesting = true
                  } else truncated = true
                }
              }
            case _ => () // whitelist: everything else ignored (reference :175-179)
          }
          operands.clear()
        case operand =>
          if (operands.length < 64) operands += operand
          else truncated = true // operand-flood guard
      }
      tok = lx.next()
    }
    newline()
    PageText(lines.result(), truncated, deepNesting)
  }
}
