package graft.ops

/** Text-analysis kernels for the training-data pipeline: language ID,
  * quality scoring, token counting, fingerprinting. All deterministic
  * scalar functions (quality metric modeled on the reference's
  * dictionary hit-ratio, src/ocrmypdf/quality.py:12-44
  * `measure_words_matched`: words of ≥3 chars, capitalization-aware).
  */
object TextStats {

  /** Fixed stopword marker sets for Latin-script language votes. */
  val stopwords: Map[String, Set[String]] = Map(
    "eng" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "deu" -> Set("der", "und", "die", "das", "ist", "nicht", "ein", "mit", "auf", "für"),
    "fra" -> Set("le", "la", "les", "et", "est", "des", "un", "une", "dans", "pour"),
    "spa" -> Set("el", "los", "las", "y", "es", "de", "que", "un", "una", "por")
  )

  /** English-ish dictionary for the quality metric: the synthetic vocab +
    * stopwords (the analog of the reference's wordlist;
    * OcrQualityDictionary loads a fixed dictionary file). */
  lazy val dictionary: Set[String] =
    graft.gen.SyntheticCorpus.vocab.toSet ++ stopwords("eng") ++
      Set("fish", "chips", "quoted", "ligature", "fire", "flow", "nfkc",
        "folds", "these", "math", "compat", "forms", "terms", "cookies",
        "accept", "reject")

  /** Deterministic language ID: script detection first, then Latin
    * stopword votes with alphabetical tie-break, then an ASCII-ratio
    * fallback. Never throws; empty → "und". */
  def langId(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var han = 0; var kana = 0; var hangul = 0; var arabic = 0
    var hebrew = 0; var cyrillic = 0; var devanagari = 0
    var latin = 0; var ascii = 0; var letters = 0
    var i = 0
    val n = math.min(text.length, 4000) // bounded scan (per-row budget)
    while (i < n) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        if (cp < 128) { ascii += 1; latin += 1 }
        else if (cp >= 0x4e00 && cp <= 0x9fff) han += 1
        else if (cp >= 0x3040 && cp <= 0x30ff) kana += 1
        else if (cp >= 0xac00 && cp <= 0xd7af) hangul += 1
        else if (cp >= 0x600 && cp <= 0x6ff) arabic += 1
        else if (cp >= 0x590 && cp <= 0x5ff) hebrew += 1
        else if (cp >= 0x400 && cp <= 0x4ff) cyrillic += 1
        else if (cp >= 0x900 && cp <= 0x97f) devanagari += 1
        else if (cp < 0x250) latin += 1
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return "und"
    val scripts = List("jpn" -> kana, "zho" -> han, "kor" -> hangul,
      "ara" -> arabic, "heb" -> hebrew, "rus" -> cyrillic, "hin" -> devanagari)
    // script wins when it dominates ≥30% of letters; kana before han so
    // Japanese text (which mixes both) resolves to jpn
    scripts.find { case (_, c) => c * 10 >= letters * 3 } match {
      case Some((code, _)) => code
      case None =>
        // bound the split to the prefix holding the first 500 letter runs
        // (cut at a non-letter boundary, so tokens are identical to
        // splitting the whole text and taking 500) — lowercasing and
        // regex-splitting a multi-MB document for 500 words would blow
        // the per-row budget the codepoint scan above deliberately caps
        var runs = 0; var idx = 0; var inWord = false
        while (idx < text.length && runs < 500) {
          val cp = text.codePointAt(idx)
          val isL = Character.isLetter(cp)
          if (isL && !inWord) inWord = true
          else if (!isL && inWord) { inWord = false; runs += 1 }
          idx += Character.charCount(cp)
        }
        val words = text.substring(0, idx)
          .toLowerCase(java.util.Locale.ROOT)
          .split("[^\\p{L}]+").iterator.filter(_.nonEmpty).take(500).toSeq
        val votes = stopwords.view.mapValues(sw => words.count(sw.contains))
          .toSeq.filter(_._2 >= 2)
        if (votes.nonEmpty) votes.minBy { case (l, c) => (-c, l) }._1
        else if (ascii * 10 >= letters * 8) "eng"
        else "und"
    }
  }

  /** Dictionary hit ratio over ≥3-char words (reference:
    * src/ocrmypdf/quality.py:12-44). Returns in [0,1]; empty → 0. */
  def dictHitRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    var hits = 0; var total = 0
    text.split("\\s+").foreach { w0 =>
      val w = w0.filter(Character.isLetter).toLowerCase(java.util.Locale.ROOT)
      if (w.length >= 3) {
        total += 1
        if (dictionary.contains(w)) hits += 1
      }
    }
    if (total == 0) 0.0 else hits.toDouble / total
  }

  /** Whitespace token count. */
  def tokensWs(text: String): Long =
    if (text == null || text.isEmpty) 0L
    else text.split("\\s+").count(_.nonEmpty).toLong

  /** Fixed BPE merge vocabulary [public technique: Sennrich et al. 2016
    * "Neural Machine Translation of Rare Words with Subword Units"],
    * priority-ordered: frequent English subwords first (space-prefixed
    * word-boundary forms before interior trigrams before digrams, the
    * order a corpus-trained BPE learns them). Applying the rules as a
    * SEQUENTIAL REPLACE CASCADE — rule i rewrites all its occurrences to
    * the atomic symbol U+E000+i before rule i+1 runs — is exactly BPE
    * inference when each merge result is an atom: every engine (Scala
    * kernel, Spark `replace` chain, DuckDB `replace` chain) applies the
    * same rewrites in the same order, so the count is tri-identical. */
  val bpeMerges: Vector[String] = Vector(
    // word-boundary 4-grams (space-prefixed = new-word marker, à la GPT-2
    // byte-level pretokenization)
    " the", " and", " ing", " for", " that", " with", " this", " from",
    " have", " are", " was", " not", " but", " you", " all",
    // frequent interior trigrams
    "the", "ing", "and", "ion", "ent", "her", "tio", "ere", "ter", "est",
    "ati", "ate", "all", "ver", "his", "ith", "res", "ons", "ess", "ine",
    // frequent digrams
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti",
    "es", "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ha", "ou", "le", "ve", "co", "me", "de", "hi", "ri", "ro",
    "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur")

  /** The atomic symbol rule i rewrites to (Unicode private-use block —
    * absent from extracted web text by construction of the charset
    * pipeline; a collision would only inflate the count by merging). */
  def bpeAtom(i: Int): String = String.valueOf((0xE000 + i).toChar)

  /** BPE token count: sequential merge cascade, then one codepoint =
    * one token (merged subwords are single atoms). Replaces the former
    * ceil(chars/4) heuristic with a real vocabulary tokenizer. */
  def tokensBpe(text: String): Long = {
    if (text == null || text.isEmpty) return 0L
    var s = text
    var i = 0
    while (i < bpeMerges.length) {
      s = s.replace(bpeMerges(i), bpeAtom(i))
      i += 1
    }
    s.codePointCount(0, s.length).toLong
  }

  /** 64-bit rolling document fingerprint: polynomial rolling hash over
    * UTF-16 CODE UNITS (surrogate halves hash separately for non-BMP
    * text — any reimplementation must iterate charAt, not codepoints, or
    * fingerprints diverge on emoji), base 1000003 — deterministic,
    * locale-free. */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    var h = 1469598103934665603L // FNV offset
    var i = 0
    while (i < text.length) {
      h = h * 1000003L + text.charAt(i)
      i += 1
    }
    h
  }
}
