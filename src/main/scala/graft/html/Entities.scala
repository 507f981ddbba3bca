package graft.html

/** Character-reference decoding for the streaming tokenizer.
  *
  * Deterministic by construction: a fixed named-entity table (HTML 4.01 set,
  * which covers the overwhelming majority of real-web usage) plus numeric
  * references with the WHATWG windows-1252 remapping for the C1 range.
  * Unknown references are emitted verbatim — the "keep calm and carry on"
  * tolerance rule (reference: src/ocrmypdf/pdfinfo/_contentstream.py:193-199
  * tolerates stack underflow in malformed content streams the same way).
  */
object Entities {

  /** HTML 4.01 named entities (Latin-1 + symbols + Greek subset). */
  val named: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b ++= Seq(
      "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
      "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
      "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
      "brvbar" -> "¦", "sect" -> "§", "uml" -> "¨",
      "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
      "not" -> "¬", "shy" -> "­", "reg" -> "®",
      "macr" -> "¯", "deg" -> "°", "plusmn" -> "±",
      "sup2" -> "²", "sup3" -> "³", "acute" -> "´",
      "micro" -> "µ", "para" -> "¶", "middot" -> "·",
      "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º",
      "raquo" -> "»", "frac14" -> "¼", "frac12" -> "½",
      "frac34" -> "¾", "iquest" -> "¿",
      "times" -> "×", "divide" -> "÷",
      "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š",
      "scaron" -> "š", "Yuml" -> "Ÿ", "fnof" -> "ƒ",
      "circ" -> "ˆ", "tilde" -> "˜",
      "ensp" -> " ", "emsp" -> " ", "thinsp" -> " ",
      "zwnj" -> "‌", "zwj" -> "‍", "lrm" -> "‎",
      "rlm" -> "‏", "ndash" -> "–", "mdash" -> "—",
      "lsquo" -> "‘", "rsquo" -> "’", "sbquo" -> "‚",
      "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
      "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•",
      "hellip" -> "…", "permil" -> "‰", "prime" -> "′",
      "Prime" -> "″", "lsaquo" -> "‹", "rsaquo" -> "›",
      "oline" -> "‾", "frasl" -> "⁄", "euro" -> "€",
      "trade" -> "™", "alefsym" -> "ℵ",
      "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
      "darr" -> "↓", "harr" -> "↔",
      "minus" -> "−", "lowast" -> "∗", "radic" -> "√",
      "prop" -> "∝", "infin" -> "∞", "ang" -> "∠",
      "and" -> "∧", "or" -> "∨", "cap" -> "∩",
      "cup" -> "∪", "int" -> "∫", "there4" -> "∴",
      "sim" -> "∼", "cong" -> "≅", "asymp" -> "≈",
      "ne" -> "≠", "equiv" -> "≡", "le" -> "≤",
      "ge" -> "≥", "sub" -> "⊂", "sup" -> "⊃",
      "nsub" -> "⊄", "sube" -> "⊆", "supe" -> "⊇",
      "oplus" -> "⊕", "otimes" -> "⊗", "perp" -> "⊥",
      "sdot" -> "⋅", "lceil" -> "⌈", "rceil" -> "⌉",
      "lfloor" -> "⌊", "rfloor" -> "⌋",
      "loz" -> "◊", "spades" -> "♠", "clubs" -> "♣",
      "hearts" -> "♥", "diams" -> "♦",
      // the HTML 4.01 math/arrow names the first cut omitted — the
      // table's contract is the FULL 4.01 set
      "forall" -> "∀", "part" -> "∂", "exist" -> "∃", "empty" -> "∅",
      "nabla" -> "∇", "isin" -> "∈", "notin" -> "∉", "ni" -> "∋",
      "prod" -> "∏", "sum" -> "∑", "weierp" -> "℘", "real" -> "ℜ",
      "image" -> "ℑ", "crarr" -> "↵", "lArr" -> "⇐", "uArr" -> "⇑",
      "rArr" -> "⇒", "dArr" -> "⇓", "hArr" -> "⇔"
    )
    // Latin-1 accented letters A-y with grave/acute/circ/tilde/uml/ring/
    // cedilla — generate from the codepoint table to keep this exhaustive.
    val latin1 = Seq(
      "Agrave" -> 0xc0, "Aacute" -> 0xc1, "Acirc" -> 0xc2, "Atilde" -> 0xc3,
      "Auml" -> 0xc4, "Aring" -> 0xc5, "AElig" -> 0xc6, "Ccedil" -> 0xc7,
      "Egrave" -> 0xc8, "Eacute" -> 0xc9, "Ecirc" -> 0xca, "Euml" -> 0xcb,
      "Igrave" -> 0xcc, "Iacute" -> 0xcd, "Icirc" -> 0xce, "Iuml" -> 0xcf,
      "ETH" -> 0xd0, "Ntilde" -> 0xd1, "Ograve" -> 0xd2, "Oacute" -> 0xd3,
      "Ocirc" -> 0xd4, "Otilde" -> 0xd5, "Ouml" -> 0xd6, "Oslash" -> 0xd8,
      "Ugrave" -> 0xd9, "Uacute" -> 0xda, "Ucirc" -> 0xdb, "Uuml" -> 0xdc,
      "Yacute" -> 0xdd, "THORN" -> 0xde, "szlig" -> 0xdf,
      "agrave" -> 0xe0, "aacute" -> 0xe1, "acirc" -> 0xe2, "atilde" -> 0xe3,
      "auml" -> 0xe4, "aring" -> 0xe5, "aelig" -> 0xe6, "ccedil" -> 0xe7,
      "egrave" -> 0xe8, "eacute" -> 0xe9, "ecirc" -> 0xea, "euml" -> 0xeb,
      "igrave" -> 0xec, "iacute" -> 0xed, "icirc" -> 0xee, "iuml" -> 0xef,
      "eth" -> 0xf0, "ntilde" -> 0xf1, "ograve" -> 0xf2, "oacute" -> 0xf3,
      "ocirc" -> 0xf4, "otilde" -> 0xf5, "ouml" -> 0xf6, "oslash" -> 0xf8,
      "ugrave" -> 0xf9, "uacute" -> 0xfa, "ucirc" -> 0xfb, "uuml" -> 0xfc,
      "yacute" -> 0xfd, "thorn" -> 0xfe, "yuml" -> 0xff
    )
    b ++= latin1.map { case (n, cp) => n -> cp.toChar.toString }
    // Greek letters.
    val greekUpper = Seq("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta",
      "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron",
      "Pi", "Rho", "", "Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
    greekUpper.zipWithIndex.foreach { case (n, i) =>
      if (n.nonEmpty) b += n -> (0x391 + i).toChar.toString
    }
    val greekLower = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigmaf", "sigma", "tau", "upsilon", "phi", "chi", "psi",
      "omega")
    greekLower.zipWithIndex.foreach { case (n, i) =>
      b += n -> (0x3b1 + i).toChar.toString
    }
    b += "thetasym" -> "ϑ"; b += "upsih" -> "ϒ"; b += "piv" -> "ϖ"
    b.result()
  }

  /** Legacy names that may appear without a trailing semicolon
    * (fixed subset; a specified tolerance rule, not an accident). */
  val legacyNoSemi: Set[String] =
    Set("amp", "lt", "gt", "quot", "nbsp", "copy", "reg")

  /** WHATWG numeric-reference remap: C1 control range interpreted as
    * windows-1252 glyphs. */
  private val c1Remap: Map[Int, Int] = Map(
    0x80 -> 0x20ac, 0x82 -> 0x201a, 0x83 -> 0x0192, 0x84 -> 0x201e,
    0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021, 0x88 -> 0x02c6,
    0x89 -> 0x2030, 0x8a -> 0x0160, 0x8b -> 0x2039, 0x8c -> 0x0152,
    0x8e -> 0x017d, 0x91 -> 0x2018, 0x92 -> 0x2019, 0x93 -> 0x201c,
    0x94 -> 0x201d, 0x95 -> 0x2022, 0x96 -> 0x2013, 0x97 -> 0x2014,
    0x98 -> 0x02dc, 0x99 -> 0x2122, 0x9a -> 0x0161, 0x9b -> 0x203a,
    0x9c -> 0x0153, 0x9e -> 0x017e, 0x9f -> 0x0178
  )

  /** Decode a numeric reference codepoint to a string, applying the C1
    * remap and replacing invalid codepoints with U+FFFD. */
  def numeric(cp: Int): String = {
    val mapped = c1Remap.getOrElse(cp, cp)
    if (mapped == 0 || mapped > 0x10ffff ||
      (mapped >= 0xd800 && mapped <= 0xdfff)) "�"
    else new String(Character.toChars(mapped))
  }

  /** Decode the character reference starting at `pos` (the char after '&')
    * in `s`. Returns (decoded, charsConsumedAfterAmp) or null if this is
    * not a reference (emit '&' literally).
    */
  def decodeAt(s: CharSequence, pos: Int): (String, Int) = {
    val n = s.length
    if (pos >= n) return null
    val c0 = s.charAt(pos)
    if (c0 == '#') {
      var i = pos + 1
      var hex = false
      if (i < n && (s.charAt(i) == 'x' || s.charAt(i) == 'X')) { hex = true; i += 1 }
      val digStart = i
      var cp = 0L
      // consume ALL digits (WHATWG) — stopping at a fixed digit budget
      // would leak the leftover digits into the visible text; the value
      // just saturates above the Unicode range (→ U+FFFD)
      while (i < n && isDigitOf(s.charAt(i), hex)) {
        if (cp <= 0x110000L)
          cp = cp * (if (hex) 16 else 10) +
            Character.digit(s.charAt(i), if (hex) 16 else 10)
        i += 1
      }
      if (i == digStart) return null // "&#" with no digits: literal
      val consumed = if (i < n && s.charAt(i) == ';') i + 1 - pos else i - pos
      (numeric(math.min(cp, 0x110000L).toInt), consumed)
    } else if (isNameChar(c0)) {
      // Longest-match over [a-zA-Z0-9]+ then look for ';'
      var i = pos
      val sb = new java.lang.StringBuilder(12)
      while (i < n && isNameChar(s.charAt(i)) && sb.length < 32) {
        sb.append(s.charAt(i)); i += 1
      }
      val name = sb.toString
      if (i < n && s.charAt(i) == ';') {
        named.get(name) match {
          case Some(v) => (v, i + 1 - pos)
          case None => null
        }
      } else if (legacyNoSemi.contains(name)) {
        (named(name), i - pos)
      } else null
    } else null
  }

  private def isDigitOf(c: Char, hex: Boolean): Boolean =
    if (hex) Character.digit(c, 16) >= 0 else c >= '0' && c <= '9'

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Decode all character references in a string (used for attribute values
    * and text runs). */
  def decodeAll(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val r = decodeAt(s, i + 1)
        if (r != null) { sb.append(r._1); i += 1 + r._2 }
        else { sb.append('&'); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
