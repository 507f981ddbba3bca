package graft.extract

/** Deterministic text/link-density boilerplate classifier
  * (jusText/Boilerpipe-style, but fully specified — every rule below is a
  * frozen part of the engine version tag, like the reference's
  * creator_tag-stamped behavior).
  *
  * Two passes, mirroring jusText's context-sensitive classification:
  *   1. context-free: each block → GOOD / BAD / SHORT (undecided)
  *   2. context fusion: SHORT blocks adopt the class of their nearest
  *      GOOD/BAD neighbors; headings are kept iff a GOOD block follows
  *      within the next 2 blocks.
  *
  * The structural-chrome rule (nav/header/footer/aside ancestry ⇒ BAD)
  * generalizes the reference's margin-band predicate (reference:
  * src/ocrmypdf/pdfinfo/info.py:44-70 `_page_has_text` ignores text wholly
  * inside a 12.5% page-margin band — chrome lives at the edges).
  */
object Boilerplate {

  sealed trait Cls
  case object Good extends Cls
  case object Bad extends Cls
  case object Short extends Cls // undecided pre-fusion

  val maxLinkDensity = 0.33
  val minGoodChars = 40
  val maxWordLen = 200 // garbage gate: minified JS / base64 blobs
  val minAlphaRatio = 0.30 // garbage gate: symbol soup

  /** Implausibility gate — the analog of the reference's aspect-ratio
    * suppression (reference: src/ocrmypdf/fpdf_renderer/renderer.py:
    * 550-621 `_check_aspect_ratio_plausible` drops lines whose bbox can't
    * plausibly hold their text): a "word" longer than any natural-language
    * word, or a long block that is mostly non-letters, is machine junk. */
  def implausible(b: Block): Boolean = {
    // unsegmented scripts (CJK/Thai) have no whitespace: a normal Chinese
    // paragraph is ONE "word" of hundreds of chars — the long-word gate
    // targets minified-JS/base64 junk, so it is waived when the block is
    // CJK-dominant (≥ a third of its chars)
    if (b.maxWordLen > maxWordLen && b.cjk * 3 < b.chars) return true
    if (b.chars > 80 && b.letters.toDouble / b.chars < minAlphaRatio)
      return true
    false
  }

  /** Length measured in information, not code units: a CJK char carries a
    * word's worth of content, so it counts 3× toward the good-length
    * threshold (the latin-centric 40-char rule would drop normal Chinese/
    * Japanese paragraphs otherwise). Counts are folded into the block at
    * segmentation time (one pass). */
  def effectiveChars(b: Block): Int = b.chars + 2 * b.cjk

  def contextFree(b: Block): Cls = {
    val ld = if (b.chars == 0) 0.0 else b.linkChars.toDouble / b.chars
    if (b.inChrome) Bad
    else if (implausible(b)) Bad
    else if (ld > maxLinkDensity) Bad
    else if (b.kind == "pre" || b.kind == "quote") Good // verbatim content
    else if (b.kind == "heading") Short // decided by what follows
    else if (effectiveChars(b) >= minGoodChars) Good
    else Short
  }

  /** Returns the kept blocks (classification + fusion applied), in order. */
  def classify(blocks: Vector[Block]): Vector[Block] = {
    val n = blocks.length
    if (n == 0) return Vector.empty
    val cls = blocks.map(contextFree).toArray

    // Heading promotion: an UNDECIDED heading is GOOD iff one of the next
    // 2 non-heading blocks is GOOD (pre-fusion), else BAD. Headings the
    // context-free pass already rejected (chrome ancestry, link density,
    // implausibility) stay Bad — promotion must not resurrect a site-name
    // logo link in a <header>.
    var i = 0
    while (i < n) {
      if (blocks(i).kind == "heading" && cls(i) == Short) {
        var j = i + 1
        var seen = 0
        var good = false
        while (j < n && seen < 2 && !good) {
          if (blocks(j).kind != "heading") {
            seen += 1
            if (cls(j) == Good) good = true
          }
          j += 1
        }
        cls(i) = if (good) Good else Bad
      }
      i += 1
    }

    // Fusion: remaining SHORT blocks become GOOD iff the nearest decided
    // neighbor on BOTH sides (where present) is GOOD; edge blocks follow
    // their single decided neighbor; no decided neighbor at all ⇒ BAD.
    def nearestDecided(from: Int, step: Int): Cls = {
      var j = from + step
      while (j >= 0 && j < n) {
        if (cls(j) != Short) return cls(j)
        j += step
      }
      null
    }
    i = 0
    while (i < n) {
      if (cls(i) == Short) {
        val before = nearestDecided(i, -1)
        val after = nearestDecided(i, +1)
        val decided =
          if (before == null && after == null) Bad
          else if (before == null) after
          else if (after == null) before
          else if (before == Good && after == Good) Good
          else Bad
        cls(i) = decided
      }
      i += 1
    }

    blocks.zip(cls).collect { case (b, Good) => b }
  }
}
