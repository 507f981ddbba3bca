package graft.pdf

import scala.collection.mutable.HashMap

/** Glyph-code → Unicode mapping for the PDF text branch.
  *
  * Policy copied from the reference's conservatism: a code with no
  * ToUnicode/Encoding-derived mapping becomes U+FFFD — never guessed
  * (reference: src/ocrmypdf/pdfinfo/layout.py:44-65 refuses to map
  * PScript5 CID fonts without a real mapping; corrupt-text detection keys
  * on a leading U+FFFD, src/ocrmypdf/pdfinfo/info.py:86-87).
  */
final case class FontInfo(
    toUnicode: Option[Map[Int, String]],
    codeBytes: Int, // 1 or 2 (from codespacerange / Type0)
    simpleMap: Option[Array[String]] // 256-entry byte→string, null entries = unmapped
) {
  def decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    toUnicode match {
      case Some(m) =>
        var i = 0
        while (i + codeBytes <= bytes.length) {
          var code = 0
          var k = 0
          while (k < codeBytes) { code = (code << 8) | (bytes(i + k) & 0xff); k += 1 }
          sb.append(m.getOrElse(code, "�"))
          i += codeBytes
        }
        if (bytes.length % codeBytes != 0 && bytes.nonEmpty) sb.append('�')
      case None =>
        simpleMap match {
          case Some(arr) =>
            bytes.foreach { bb =>
              val s = arr(bb & 0xff)
              sb.append(if (s == null) "�" else s)
            }
          case None =>
            if (codeBytes == 2) {
              var i = 0
              while (i + 1 < bytes.length) { sb.append('�'); i += 2 }
            } else bytes.foreach { bb =>
              val c = bb & 0xff
              // StandardEncoding: printable ASCII maps through; the rest is
              // unmapped without an explicit encoding.
              if (c >= 0x20 && c <= 0x7e) sb.append(c.toChar)
              else sb.append('�')
            }
        }
    }
    sb.toString
  }
}

object Glyphs {

  val default: FontInfo = FontInfo(None, 1, None)

  /** WinAnsiEncoding (CP1252) high range; index 0 = code 0x80. */
  private val winAnsiHigh: Array[Int] = Array(
    0x20ac, -1, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021,
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017d, -1,
    -1, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014,
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, -1, 0x017e, 0x0178)

  lazy val winAnsi: Array[String] = {
    val a = new Array[String](256)
    var i = 0x20
    while (i <= 0x7e) { a(i) = i.toChar.toString; i += 1 }
    i = 0
    while (i < 32) {
      if (winAnsiHigh(i) >= 0) a(0x80 + i) = winAnsiHigh(i).toChar.toString
      i += 1
    }
    i = 0xa0
    while (i <= 0xff) { a(i) = i.toChar.toString; i += 1 } // Latin-1 identity
    a
  }

  lazy val macRoman: Array[String] = {
    // ASCII identity; high range is the FULL 128-entry MacRoman table
    // (verified against the mac_roman codec — a 127-char approximation
    // shifted every glyph from 0xF0 on and dropped 0xFF; 0xCA is NBSP,
    // 0xF0 the Apple-logo private-use char).
    val a = new Array[String](256)
    var i = 0x20
    while (i <= 0x7e) { a(i) = i.toChar.toString; i += 1 }
    val hi = "ÄÅÇÉÑÖÜáàâäãåçéèêëíìîïñóòôöõúùûü†°¢£§•¶ß®©™´¨≠ÆØ∞±≤≥¥µ∂∑∏π∫ªºΩæø¿¡¬√ƒ≈∆«»… ÀÃÕŒœ–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ"
    i = 0
    while (i < hi.length && i < 128) { a(0x80 + i) = hi.charAt(i).toString; i += 1 }
    a
  }

  /** Algorithmic AGL names (Adobe Glyph List spec §agl-specification):
    * `uniXXXX` (4 hex digits, BMP) and `uXXXX[XX]` (4-6 hex digits) map
    * DIRECTLY to the code point — a specified mapping, not a guess; TeX
    * and subsetters emit these for every non-ASCII glyph. Unknown names
    * still fall through to null → U+FFFD. */
  def algorithmicGlyph(nm: String): String = {
    def decode(hex: String): String =
      try {
        val cp = Integer.parseInt(hex, 16)
        if (Character.isValidCodePoint(cp) &&
          !(cp >= 0xd800 && cp <= 0xdfff)) // surrogates are not glyphs
          new String(Character.toChars(cp))
        else null
      } catch { case _: Exception => null }
    if (nm.length == 7 && nm.startsWith("uni") &&
      nm.drop(3).forall(c => Character.digit(c, 16) >= 0))
      decode(nm.drop(3))
    else if (nm.length >= 5 && nm.length <= 7 && nm.startsWith("u") &&
      nm.drop(1).forall(c => Character.digit(c, 16) >= 0))
      decode(nm.drop(1))
    else null
  }

  /** Adobe Glyph List subset covering the names produced by common western
    * fonts in /Differences arrays. Unknown names → None → U+FFFD. */
  lazy val agl: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    // letters + digits self-name
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    val digits = Seq("zero", "one", "two", "three", "four", "five", "six",
      "seven", "eight", "nine")
    digits.zipWithIndex.foreach { case (nm, d) => b += nm -> d.toString }
    b ++= Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+", "comma" -> ",",
      "hyphen" -> "-", "period" -> ".", "slash" -> "/", "colon" -> ":",
      "semicolon" -> ";", "less" -> "<", "equal" -> "=", "greater" -> ">",
      "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’", "quotedblleft" -> "“",
      "quotedblright" -> "”", "endash" -> "–", "emdash" -> "—",
      "bullet" -> "•", "ellipsis" -> "…", "fi" -> "ﬁ", "fl" -> "ﬂ",
      "dagger" -> "†", "daggerdbl" -> "‡", "Euro" -> "€",
      "sterling" -> "£", "yen" -> "¥", "cent" -> "¢", "section" -> "§",
      "paragraph" -> "¶", "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "degree" -> "°", "plusminus" -> "±",
      "multiply" -> "×", "divide" -> "÷", "onehalf" -> "½",
      "onequarter" -> "¼", "threequarters" -> "¾",
      "exclamdown" -> "¡", "questiondown" -> "¿",
      "eacute" -> "é", "egrave" -> "è", "ecircumflex" -> "ê",
      "edieresis" -> "ë", "aacute" -> "á", "agrave" -> "à",
      "acircumflex" -> "â", "adieresis" -> "ä", "aring" -> "å",
      "atilde" -> "ã", "ae" -> "æ", "ccedilla" -> "ç", "iacute" -> "í",
      "igrave" -> "ì", "icircumflex" -> "î", "idieresis" -> "ï",
      "ntilde" -> "ñ", "oacute" -> "ó", "ograve" -> "ò",
      "ocircumflex" -> "ô", "odieresis" -> "ö", "otilde" -> "õ",
      "oslash" -> "ø", "uacute" -> "ú", "ugrave" -> "ù",
      "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
      "ydieresis" -> "ÿ", "germandbls" -> "ß", "thorn" -> "þ", "eth" -> "ð",
      "Eacute" -> "É", "Egrave" -> "È", "Aacute" -> "Á", "Agrave" -> "À",
      "Adieresis" -> "Ä", "Aring" -> "Å", "AE" -> "Æ", "Ccedilla" -> "Ç",
      "Ntilde" -> "Ñ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
      "Udieresis" -> "Ü"
    )
    b.result()
  }

  /** Parse a ToUnicode CMap stream into (codeBytes, code→string). */
  def parseCMap(data: Array[Byte]): (Int, Map[Int, String]) = {
    val lx = new PdfLexer(data)
    val m = HashMap.empty[Int, String]
    var codeBytes = 1
    def hexToInt(b: Array[Byte]): Int = {
      var v = 0
      b.foreach(x => v = (v << 8) | (x & 0xff))
      v
    }
    def utf16(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_16BE)
    var tok = lx.next()
    while (tok != null) {
      tok match {
        case CosOp("begincodespacerange") =>
          var t = lx.next()
          while (t != null && t != CosOp("endcodespacerange")) {
            t match {
              case CosStr(bs) => codeBytes = math.max(codeBytes, math.min(bs.length, 2))
              case _ => ()
            }
            t = lx.next()
          }
        case CosOp("beginbfchar") =>
          var t = lx.next()
          var src: Option[Array[Byte]] = None
          while (t != null && t != CosOp("endbfchar")) {
            t match {
              case CosStr(bs) =>
                src match {
                  case None => src = Some(bs)
                  case Some(s) => m(hexToInt(s)) = utf16(bs); src = None
                }
              case _ => ()
            }
            t = lx.next()
          }
        case CosOp("beginbfrange") =>
          // triples: <lo> <hi> (<dst> | [<d0> <d1> ...])
          var t = lx.next()
          var buf = Vector.empty[Cos]
          while (t != null && t != CosOp("endbfrange")) {
            t match {
              case s: CosStr => buf :+= s
              case CosOp("[") =>
                var arr = Vector.empty[CosStr]
                var u = lx.next()
                while (u != null && u != CosOp("]")) {
                  u match { case s: CosStr => arr :+= s; case _ => () }
                  u = lx.next()
                }
                buf :+= CosArr(arr)
              case _ => ()
            }
            if (buf.length == 3) {
              (buf(0), buf(1), buf(2)) match {
                case (CosStr(lo), CosStr(hi), CosStr(dst)) =>
                  val l = hexToInt(lo); val h = hexToInt(hi)
                  var c = l
                  val base = utf16(dst)
                  while (c <= h && c - l < 65536) {
                    // increment the LAST UTF-16 code unit, per CMap spec
                    val off = c - l
                    val s =
                      if (base.isEmpty) "�"
                      else base.substring(0, base.length - 1) +
                        (base.charAt(base.length - 1) + off).toChar
                    m(c) = s
                    c += 1
                  }
                case (CosStr(lo), CosStr(_), CosArr(items)) =>
                  val l = hexToInt(lo)
                  items.zipWithIndex.foreach {
                    case (CosStr(d), k) => m(l + k) = utf16(d)
                    case _ => ()
                  }
                case _ => ()
              }
              buf = Vector.empty
            }
            t = lx.next()
          }
        case _ => ()
      }
      tok = lx.next()
    }
    (codeBytes, m.toMap)
  }

  /** Content key for byte arrays: equality/hash over the bytes. */
  private final class BytesKey(val b: Array[Byte]) {
    override val hashCode: Int = java.util.Arrays.hashCode(b)
    override def equals(o: Any): Boolean = o match {
      case k: BytesKey => java.util.Arrays.equals(b, k.b)
      case _ => false
    }
  }

  val cmapCacheSize = 256

  /** Count of actual CMap parses — a probe for the cache test and for
    * kernel metrics (monotone; reads are racy-but-sufficient). */
  val cmapParses = new java.util.concurrent.atomic.AtomicLong

  // Cross-row memoized CMap parsing — the MultiFontManager analog
  // (reference: src/ocrmypdf/font/multi_font_manager.py:182-188 memoizes
  // per-font selection results). Identical embedded ToUnicode CMaps recur
  // across documents from one producer, so an LRU keyed on CMap CONTENT
  // skips the re-parse. Per-thread: the engine is a shared singleton
  // running on every task thread — a shared map would serialize the
  // kernel hot path (and per-thread caches die with their executor,
  // bounding memory at threads × cmapCacheSize entries).
  private val cmapCache = ThreadLocal.withInitial[
      java.util.LinkedHashMap[BytesKey, (Int, Map[Int, String])]](() =>
    new java.util.LinkedHashMap[BytesKey, (Int, Map[Int, String])](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[BytesKey, (Int, Map[Int, String])]): Boolean =
        size() > cmapCacheSize
    })

  /** Memoized [[parseCMap]]: same bytes → cached (codeBytes, map). */
  def parseCMapCached(data: Array[Byte]): (Int, Map[Int, String]) = {
    val cache = cmapCache.get()
    val k = new BytesKey(data)
    val got = cache.get(k)
    if (got != null) got
    else {
      cmapParses.incrementAndGet()
      val v = parseCMap(data)
      cache.put(k, v)
      v
    }
  }

  /** Build a FontInfo from a font dict (resolved). */
  def fontInfo(dict: CosDict, resolve: Cos => Cos): FontInfo = {
    val subtype = dict.get("Subtype").map(resolve) match {
      case Some(CosName(s)) => s
      case _ => ""
    }
    val toUni = dict.get("ToUnicode").map(resolve) match {
      case Some(s: CosStream) =>
        PdfDoc.decodeStream(s, resolve).map(parseCMapCached)
      case _ => None
    }
    toUni match {
      case Some((cb, m)) =>
        val bytes = if (subtype == "Type0") 2 else cb
        FontInfo(Some(m), math.max(bytes, cb), None)
      case None =>
        if (subtype == "Type0") FontInfo(None, 2, None) // no map → U+FFFD
        else {
          dict.get("Encoding").map(resolve) match {
            case Some(CosName("WinAnsiEncoding")) => FontInfo(None, 1, Some(winAnsi))
            case Some(CosName("MacRomanEncoding")) => FontInfo(None, 1, Some(macRoman))
            case Some(encDict: CosDict) =>
              val base = encDict.get("BaseEncoding") match {
                case Some(CosName("MacRomanEncoding")) => macRoman
                case _ => winAnsi
              }
              val arr = base.clone()
              encDict.get("Differences").map(resolve) match {
                case Some(CosArr(items)) =>
                  var code = 0
                  items.foreach {
                    case CosNum(d) => code = d.toInt
                    case CosName(nm) =>
                      if (code >= 0 && code < 256) {
                        arr(code) = agl.getOrElse(nm, algorithmicGlyph(nm))
                        code += 1
                      }
                    case _ => ()
                  }
                case _ => ()
              }
              FontInfo(None, 1, Some(arr))
            case _ => FontInfo(None, 1, None) // StandardEncoding ASCII fallback
          }
        }
    }
  }
}
