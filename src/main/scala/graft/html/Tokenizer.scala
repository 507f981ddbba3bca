package graft.html

import scala.collection.mutable.ArrayBuffer

/** Tokens emitted by the streaming tokenizer. Attribute order is source
  * order; duplicate attributes keep the FIRST occurrence (WHATWG rule —
  * a specified tolerance, cf. SURVEY.md §7.5 "repair rules must be
  * specified, not incidental").
  */
sealed trait HtmlToken
final case class StartTag(name: String, attrs: List[(String, String)],
    selfClosing: Boolean) extends HtmlToken {
  def attr(k: String): Option[String] =
    attrs.collectFirst { case (n, v) if n == k => v }
}
final case class EndTag(name: String) extends HtmlToken
final case class TextRun(text: String) extends HtmlToken // refs decoded
final case class CommentTok(text: String) extends HtmlToken
final case class DoctypeTok(text: String) extends HtmlToken

/** Single-pass, error-tolerant streaming HTML tokenizer.
  *
  * Modeled on the reference's streaming content-stream interpreter
  * (reference: src/ocrmypdf/pdfinfo/_contentstream.py:137-266
  * `_interpret_contents`): one pass over the token sequence, an explicit
  * small state machine, whitelisted token classes, and deterministic
  * carry-on behavior for every malformed input class. All recovery paths
  * are specified rules (see the `case` comments), mirroring how the
  * reference codifies box repair (src/ocrmypdf/_pageboxes.py:117-177).
  *
  * Raw-text elements (script/style/textarea/title/xmp) switch the tokenizer
  * into a mode where only the matching end tag terminates the run — the
  * analog of the reference's BT..ET text-object bracketing.
  *
  * Bounded memory per document: the tokenizer walks a single decoded string
  * and allocates per-token only; attribute values longer than `maxAttrLen`
  * are truncated deterministically (reference analog: input-size guards in
  * src/ocrmypdf/builtin_plugins/tesseract_ocr.py:364-382 downsampling).
  */
object Tokenizer {

  val rawTextTags: Set[String] = Set("script", "style", "textarea", "title", "xmp")
  val maxAttrLen = 65536
  val maxTagNameLen = 64

  def tokenize(input: String): ArrayBuffer[HtmlToken] = {
    val out = new ArrayBuffer[HtmlToken](64)
    val n = input.length
    var i = 0
    val text = new java.lang.StringBuilder(256)

    def flushText(): Unit = {
      if (text.length > 0) {
        out += TextRun(text.toString)
        text.setLength(0)
      }
    }

    def isAsciiAlpha(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isSpace(c: Char) =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    // Parse a tag starting at position of '<'. Returns new position.
    def parseTag(start: Int): Int = {
      var i = start + 1
      val end = i < n && input.charAt(i) == '/'
      if (end) i += 1
      // tag name
      val nameStart = i
      while (i < n && (isAsciiAlpha(input.charAt(i)) ||
          (i > nameStart && (input.charAt(i).isDigit || input.charAt(i) == '-' ||
            input.charAt(i) == ':')))) i += 1
      val rawName = input.substring(nameStart, math.min(i, nameStart + maxTagNameLen))
      val name = rawName.toLowerCase(java.util.Locale.ROOT)
      var attrs: List[(String, String)] = Nil
      var seen: Set[String] = Set.empty
      var selfClosing = false
      var done = false
      while (!done && i < n) {
        while (i < n && isSpace(input.charAt(i))) i += 1
        if (i >= n) { done = true }
        else input.charAt(i) match {
          case '>' => i += 1; done = true
          case '/' =>
            // "/>" marks self-closing; a stray '/' is skipped (tolerance rule)
            if (i + 1 < n && input.charAt(i + 1) == '>') {
              selfClosing = true; i += 2; done = true
            } else i += 1
          case _ =>
            // attribute name: up to =, space, >, /
            val as = i
            while (i < n && !isSpace(input.charAt(i)) && input.charAt(i) != '=' &&
              input.charAt(i) != '>' && input.charAt(i) != '/') i += 1
            val aname = input.substring(as, i).toLowerCase(java.util.Locale.ROOT)
            while (i < n && isSpace(input.charAt(i))) i += 1
            var avalue = ""
            if (i < n && input.charAt(i) == '=') {
              i += 1
              while (i < n && isSpace(input.charAt(i))) i += 1
              if (i < n) {
                val q = input.charAt(i)
                if (q == '"' || q == '\'') {
                  i += 1
                  val vs = i
                  while (i < n && input.charAt(i) != q) i += 1
                  avalue = input.substring(vs, math.min(i, vs + maxAttrLen))
                  if (i < n) i += 1 // closing quote
                } else {
                  val vs = i
                  while (i < n && !isSpace(input.charAt(i)) && input.charAt(i) != '>') i += 1
                  avalue = input.substring(vs, math.min(i, vs + maxAttrLen))
                }
              }
            }
            if (aname.nonEmpty && !seen.contains(aname)) {
              attrs = (aname -> Entities.decodeAll(avalue)) :: attrs
              seen += aname
            }
        }
      }
      flushText()
      if (name.nonEmpty) {
        if (end) out += EndTag(name)
        else out += StartTag(name, attrs.reverse, selfClosing)
        // Raw-text mode: consume until the matching "</name" (case-insensitive)
        if (!end && !selfClosing && rawTextTags.contains(name)) {
          val close = "</" + name
          // WHATWG: the close-tag name must be followed by whitespace,
          // '/', or '>' — "</styles>" inside <style> does NOT terminate
          // it (matching the bare prefix leaked raw CSS/JS as text)
          var j = indexOfIgnoreCase(input, close, i)
          while (j >= 0 && j + close.length < n && {
            val after = input.charAt(j + close.length)
            !(after == '>' || after == '/' || Character.isWhitespace(after))
          }) j = indexOfIgnoreCase(input, close, j + 1)
          if (j < 0) j = n
          val raw = input.substring(i, j)
          if (raw.nonEmpty) {
            // title/textarea contents get char refs decoded; script/style
            // stay raw (they are dropped later anyway, but we record them
            // so the invisible-content accounting is faithful).
            val t = if (name == "title" || name == "textarea")
              Entities.decodeAll(raw) else raw
            out += TextRun(t)
          }
          if (j < n) {
            // consume "</name ... >"
            var k = j + close.length
            while (k < n && input.charAt(k) != '>') k += 1
            out += EndTag(name)
            i = math.min(k + 1, n)
          } else i = n
        }
      }
      // Nameless tag "<>" or "</>": dropped (tolerance rule: empty tag is a
      // no-op, matching WHATWG's missing-end-tag-name parse error handling).
      i
    }

    // Bogus comment: consume to next '>' (covers <? ... > and <! ... >).
    def bogusComment(start: Int): Int = {
      var i = start
      while (i < n && input.charAt(i) != '>') i += 1
      flushText()
      math.min(i + 1, n)
    }

    while (i < n) {
      val c = input.charAt(i)
      if (c == '<') {
        if (i + 1 >= n) { text.append('<'); i += 1 }
        else {
          val c1 = input.charAt(i + 1)
          if (isAsciiAlpha(c1)) i = parseTag(i)
          else if (c1 == '/') {
            if (i + 2 < n && isAsciiAlpha(input.charAt(i + 2))) i = parseTag(i)
            else i = bogusComment(i + 2) // "</!" "</ " etc: bogus comment
          } else if (c1 == '!') {
            if (input.startsWith("<!--", i)) {
              // abrupt close (WHATWG abrupt-closing-of-empty-comment):
              // "<!-->" and "<!--->" end the comment at that '>' — the
              // generic search below starts past it and would swallow
              // the whole rest of the document as comment text
              if (input.startsWith("<!-->", i)) {
                flushText(); out += CommentTok(""); i = i + 5
              } else if (input.startsWith("<!--->", i)) {
                flushText(); out += CommentTok(""); i = i + 6
              } else {
                // comment; tolerate unterminated (runs to EOF) and "--!>"
                var j = input.indexOf("-->", i + 4)
                var endLen = 3
                val jAlt = input.indexOf("--!>", i + 4)
                if (jAlt >= 0 && (j < 0 || jAlt < j)) { j = jAlt; endLen = 4 }
                flushText()
                if (j < 0) { out += CommentTok(input.substring(i + 4)); i = n }
                else { out += CommentTok(input.substring(i + 4, j)); i = j + endLen }
              }
            } else if (regionMatchesIgnoreCase(input, i + 2, "doctype")) {
              val j = input.indexOf('>', i)
              flushText()
              if (j < 0) { out += DoctypeTok(input.substring(i + 2)); i = n }
              else { out += DoctypeTok(input.substring(i + 2, j)); i = j + 1 }
            } else i = bogusComment(i + 2)
          } else if (c1 == '?') {
            i = bogusComment(i + 2)
          } else {
            // '<' followed by anything else is literal text (tolerance rule)
            text.append('<'); i += 1
          }
        }
      } else if (c == '&') {
        val r = Entities.decodeAt(input, i + 1)
        if (r != null) { text.append(r._1); i += 1 + r._2 }
        else { text.append('&'); i += 1 }
      } else {
        // bulk run: copy everything up to the next markup/entity start in
        // one append instead of one call per char (the tokenizer's hottest
        // loop — most of a page is plain text)
        var j = i + 1
        while (j < n && {
          val ch = input.charAt(j); ch != '<' && ch != '&'
        }) j += 1
        text.append(input, i, j)
        i = j
      }
    }
    flushText()
    out
  }

  private def regionMatchesIgnoreCase(s: String, at: Int, pat: String): Boolean =
    s.regionMatches(true, at, pat, 0, pat.length)

  private def indexOfIgnoreCase(s: String, pat: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - pat.length
    while (i <= last) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) return i
      i += 1
    }
    -1
  }
}
