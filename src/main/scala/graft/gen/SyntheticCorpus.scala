package graft.gen

import graft.model.PageRow
import java.nio.charset.StandardCharsets

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).
  *
  * Every row is a pure function of (seed, index) — no shared RNG stream —
  * so generation is embarrassingly parallel and a row generated on any
  * executor, in any order, at any parallelism is byte-identical. This is
  * the determinism discipline the reference enforces on its pipeline
  * (output a pure function of input, never of scheduling — reference:
  * src/ocrmypdf/builtin_plugins/concurrency.py:169-173 as-completed
  * consumption + order restoration by key).
  *
  * Class mix covers the reference's pathological-resource classes
  * (reference: tests/resources/ — blank, malformed, enormous, encrypted,
  * CJK/RTL fixtures; see FIXTURES.md table).
  *
  * Host skew: ~70% of rows land on one host (`big.example.com`) to
  * exercise the salted repartition required by the north rule.
  */
object SyntheticCorpus {

  val defaultSeed = 42L
  val epochMs = 1577836800000L // 2020-01-01T00:00:00Z

  // xorshift64* — splittable: state derived from (seed, i) only
  final class Rng(seed0: Long) {
    private var s: Long = if (seed0 == 0) 0x9E3779B97F4A7C15L else seed0
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 1) % bound
      v.toInt
    }
  }

  val vocab: Vector[String] = Vector(
    "data", "pipeline", "spark", "engine", "extract", "document", "crawl",
    "index", "token", "stream", "batch", "schema", "column", "partition",
    "shuffle", "cluster", "query", "filter", "merge", "commit", "verify",
    "golden", "fixture", "deterministic", "boilerplate", "content", "block",
    "density", "anchor", "heading", "paragraph", "corpus", "charset",
    "encode", "decode", "parse", "tree", "node", "span", "offset", "byte")

  val cjkVocab: Vector[String] = Vector("数据", "处理", "管道", "提取",
    "文档", "内容", "分析", "系统", "网络", "页面", "文本", "引擎")

  val arabicVocab: Vector[String] = Vector("بيانات", "معالجة", "استخراج",
    "وثيقة", "محتوى", "نظام", "شبكة", "صفحة", "نص")

  val hebrewVocab: Vector[String] = Vector("נתונים", "עיבוד", "חילוץ",
    "מסמך", "תוכן", "מערכת", "רשת", "עמוד", "טקסט")

  def words(rng: Rng, k: Int, v: Vector[String] = vocab): String = {
    // byte-identical to the former map().mkString(" ") — same rng call
    // sequence, no intermediate collection (this is the generator's
    // innermost allocator at bench scale)
    val sb = new java.lang.StringBuilder(k * 8)
    var i = 0
    while (i < k) {
      if (i > 0) sb.append(' ')
      sb.append(v(rng.nextInt(v.length)))
      i += 1
    }
    sb.toString
  }

  def sentence(rng: Rng): String = {
    val w = words(rng, 8 + rng.nextInt(10))
    w.capitalize + "."
  }

  def paragraph(rng: Rng): String =
    (0 until 3 + rng.nextInt(4)).map(_ => sentence(rng)).mkString(" ")

  def classOf(i: Long): String = (i % 26) match {
    case 0 | 1 | 2 | 3 | 4 | 5 => "article"
    case 6 | 7 => "multiblock"
    case 8 => "trivial"
    case 9 => "blank"
    case 10 => "malformed"
    case 11 => "deep"
    case 12 => "encodings"
    case 13 => "scripts"
    case 14 => "entities"
    case 15 => "hidden"
    case 16 => "linkfarm"
    case 17 => "pdf"
    case 18 => "gzip"
    case 19 => "fault"
    case 20 => "redirect"
    case 21 => "toolarge"
    case 22 => "xobject"
    case 23 => "garbage"
    case 24 => "priortext"
    case _ => "bidi"
  }

  def hostOf(i: Long, seed: Long): String = {
    val h = mix(seed, i * 31 + 7)
    // manual zero-pad, NOT f"%02d": String.format substitutes digits per
    // the JVM default FORMAT locale, so corpus bytes (and the frozen
    // goldens keyed on them) would differ on native-digit locales —
    // breaking the byte-identical-on-any-executor determinism contract
    if ((h & 0x7fffffffL) % 10 < 7) "big.example.com"
    else {
      val n = (h >>> 8) % 97
      val pad = if (n < 10) "0" else ""
      s"host$pad$n.example.com"
    }
  }

  private def mix(seed: Long, x: Long): Long = {
    var z = seed ^ (x * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def row(i: Long, seed: Long = defaultSeed): PageRow = {
    val rng = new Rng(mix(seed, i))
    val cls = classOf(i)
    val host = hostOf(i, seed)
    val url = s"https://$host/$cls/p$i"
    val ts = new java.sql.Timestamp(epochMs + i * 1000L)
    val lang = cls match {
      case "scripts" => Vector("zho", "ara", "mix")((i / 20 % 3).toInt)
      // priortext hint variants: trusted hint / trusted non-eng hint /
      // invalid hint (→ kernel predicts from text)
      case "priortext" => Vector("eng", "zho", "")((i / 20 % 3).toInt)
      case "bidi" => Vector("ara", "heb", "eng", "")((i / 20 % 4).toInt)
      case _ => "eng"
    }
    val html: Array[Byte] = cls match {
      case "article" => article(rng).getBytes(StandardCharsets.UTF_8)
      case "multiblock" => multiblock(rng).getBytes(StandardCharsets.UTF_8)
      case "trivial" =>
        s"<html><body><p>${paragraph(rng)}</p></body></html>"
          .getBytes(StandardCharsets.UTF_8)
      case "blank" =>
        (if (i % 40 == 9) "" else "<html><body>   \n\t </body></html>")
          .getBytes(StandardCharsets.UTF_8)
      case "malformed" => malformed(rng).getBytes(StandardCharsets.UTF_8)
      case "deep" => deepNesting(rng).getBytes(StandardCharsets.UTF_8)
      case "encodings" => encodings(rng, (i / 20 % 6).toInt)
      case "scripts" => scripts(rng, (i / 20 % 3).toInt)
        .getBytes(StandardCharsets.UTF_8)
      case "entities" => entities(rng).getBytes(StandardCharsets.UTF_8)
      case "hidden" => hidden(rng).getBytes(StandardCharsets.UTF_8)
      case "linkfarm" => linkfarm(rng).getBytes(StandardCharsets.UTF_8)
      case "pdf" => pdf(rng, (i / 20 % 6).toInt)
      case "gzip" => gzipCase(rng, (i / 20 % 2).toInt)
      case "fault" => fault(rng, (i / 20 % 3).toInt)
      case "redirect" => redirect(rng).getBytes(StandardCharsets.UTF_8)
      case "toolarge" => tooLargeHtml
      case "xobject" => pdfXObject(rng)
      case "priortext" => priortextHtml(rng).getBytes(StandardCharsets.UTF_8)
      case "bidi" => bidi(rng, (i / 20 % 4).toInt).getBytes(StandardCharsets.UTF_8)
      case _ => garbage(rng).getBytes(StandardCharsets.UTF_8)
    }
    // priortext rows carry upstream-provided text (the prior-text matrix
    // input, reference: _pipeline.py:352-372); all other rows carry none
    val prior = if (cls == "priortext") priorText(rng, (i / 20 % 3).toInt)
      else null
    PageRow(url, ts, html, prior, lang)
  }

  /** Upstream text for priortext rows — deliberately different from what
    * the kernel would extract, so mode semantics are observable. */
  def priorText(rng: Rng, variant: Int): String = variant match {
    case 1 => words(rng, 6, cjkVocab).replace(" ", "") // matches zho hint
    case _ => "PRIOR " + words(rng, 10)
  }

  def priortextHtml(rng: Rng): String =
    s"""<html><head><title>${words(rng, 3).capitalize}</title></head>
<body><p>${paragraph(rng)}</p><p>${paragraph(rng)}</p></body></html>"""

  /** Mixed-direction fixtures for first-strong bidi detection (reference:
    * src/ocrmypdf/fpdf_renderer/renderer.py:30-42 `_is_rtl_text`).
    * Expected per-variant dir of the assembled text (title first):
    *  0 → rtl (Arabic title), 1 → rtl (neutral digits precede Hebrew —
    *  first STRONG char decides), 2 → ltr (Latin title, Arabic body),
    *  3 → rtl (Hebrew with embedded Latin brand + digits). */
  def bidi(rng: Rng, variant: Int): String = variant match {
    case 0 =>
      s"""<html><head><title>${words(rng, 3, arabicVocab)}</title></head>
<body><p>${words(rng, 12, arabicVocab)}</p><p>latin trailer ${words(rng, 8)}</p></body></html>"""
    case 1 =>
      s"""<html><body><p>«123» ${words(rng, 10, hebrewVocab)}</p>
<p>${words(rng, 6, hebrewVocab)} 42 ${words(rng, 5, hebrewVocab)}</p></body></html>"""
    case 2 =>
      s"""<html><head><title>${words(rng, 3).capitalize}</title></head>
<body><p>${words(rng, 10)}</p><p>${words(rng, 9, arabicVocab)}</p></body></html>"""
    case _ =>
      s"""<html><body><p>${words(rng, 5, hebrewVocab)} ACME-3000 ${words(rng, 7, hebrewVocab)}</p>
<p>${words(rng, 4, hebrewVocab)} 2020 ${words(rng, 6, hebrewVocab)}</p></body></html>"""
  }

  def corpus(n: Int, seed: Long = defaultSeed): IndexedSeq[PageRow] =
    (0L until n.toLong).map(row(_, seed))

  // ---- HTML templates -------------------------------------------------

  def article(rng: Rng): String = {
    val title = words(rng, 4 + rng.nextInt(4)).capitalize
    val nav = (0 until 6).map(_ =>
      s"""<li><a href="/${words(rng, 1)}">${words(rng, 2)}</a></li>""")
      .mkString
    val paras = (0 until 3 + rng.nextInt(5)).map(p =>
      s"<p>${paragraph(rng)}</p>").mkString("\n")
    val aside = (0 until 4).map(_ =>
      s"""<a href="#">${words(rng, 3)}</a>""").mkString(" · ")
    // outlink-resolver fixtures (extract/Links.scala): an absolute
    // external target (fragment stripped), a dot-segment relative path, a
    // scheme-relative authority, and a non-navigable scheme (dropped)
    val extHost = words(rng, 1)
    // sibling-article reference (doc-relative `pK`, K always an article
    // index): when the sibling shares this page's host the target is an
    // already-crawled url — the fixture that makes crawl_frontier's
    // seen-set anti-join provably remove rows
    val sib = 26 * rng.nextInt(20) + rng.nextInt(6)
    // 1-in-6 articles declare a sibling article as rel=canonical (the
    // syndicated-copy shape) — doc-relative, resolving on-host, so
    // canonical-keyed dedup gets real multi-page clusters; the draw is
    // UNCONDITIONAL so the rng stream stays aligned across variants
    val canonSib = 26 * rng.nextInt(20) + rng.nextInt(6)
    val canonLink = if (canonSib % 6 == 0)
      s"""\n<link rel="canonical" href="p$canonSib">""" else ""
    // structured-data fixtures (html/TreeBuilder ld+json capture): a
    // 1-in-3 schema.org Article block, a 1-in-3 block whose MIME is
    // uppercase + padded (type matching is trimmed/case-insensitive);
    // the remaining third has only the plain <script> below (negative).
    // Draws are UNCONDITIONAL so the rng stream stays aligned.
    val ldKw = words(rng, 2)
    val ldDraw = rng.nextInt(3)
    // head-meta fixtures (extract/Links.metasOf): 1-in-3 gets a plain
    // description + an OpenGraph `property` pair; 1-in-3 gets an
    // uppercase/padded NAME attr (key fold) plus two negatives — a
    // content-less meta and a BODY meta (body metas are rejected like
    // body canonicals); the rest have only <meta charset> (negative:
    // no name/property). Draws UNCONDITIONAL so the stream stays
    // aligned across variants. NOTE: the footer's words(rng, 2) is
    // drawn at template-interpolation time BELOW, so inserting these
    // draws here shifted the footer text of every article — footer is
    // chrome (boilerplate-pruned), so extracted bytes are unchanged
    // (2M-doc stress checksum pinned it), but raw html bytes did move
    // and goldens were regenerated in the same commit.
    val metaDesc = words(rng, 6)
    val metaDraw = rng.nextInt(3)
    val bodyMeta = if (metaDraw == 1)
      s"""<meta name="injected" content="spoof">""" else ""
    // feed-autodiscovery fixtures (extract/Links.feedsOf): 1-in-4 a
    // doc-relative rss link; 1-in-4 an atom link with padded/odd-case
    // MIME plus two negatives (a text/html mobile alternate and a
    // type-less alternate — neither is a feed); 1-in-4 a BODY-injected
    // feed link (rejected); rest none. Draw UNCONDITIONAL (stream
    // alignment), appended after metaDraw — the footer-shift caveat
    // above applies here identically.
    val feedDraw = rng.nextInt(4)
    val headFeeds = if (feedDraw == 0)
      s"""\n<link rel="alternate" type="application/rss+xml" href="feed.xml">"""
    else if (feedDraw == 1)
      s"""\n<link rel="alternate" type=" Application/ATOM+xml " href="/atom.xml">""" +
        s"""<link rel="alternate" type="text/html" href="/mobile">""" +
        s"""<link rel="alternate" href="/untyped">"""
    else ""
    val bodyFeed = if (feedDraw == 2)
      s"""<link rel="alternate" type="application/rss+xml" href="/spoof.xml">"""
    else ""
    // publication-date fixtures (extract_pubdate cascade): the Article
    // ld+json variant (ldDraw 0) carries schema.org datePublished, and
    // the plain-meta variant (metaDraw 0) carries an OpenGraph
    // article:published_time TIMESTAMP (date ≠ the ld one, so cascade
    // order is observable on pages that have both); everything else
    // falls back to the capture date. Draws UNCONDITIONAL and appended
    // AFTER the existing draw sequence, so previously-drawn values are
    // byte-identical — only the footer words (drawn at template
    // interpolation below, chrome, boilerplate-pruned) shift; extracted
    // text bytes are unchanged (stress checksum pinned), html + goldens
    // regenerated in the same commit. Manual zero-pad, NOT f"%02d"
    // (FORMAT-locale trap — see hostOf).
    def pad2(n: Int): String = (if (n < 10) "0" else "") + n
    val ldDate =
      s"${2018 + rng.nextInt(6)}-${pad2(1 + rng.nextInt(12))}-${pad2(1 + rng.nextInt(28))}"
    val metaDate =
      s"${2018 + rng.nextInt(6)}-${pad2(1 + rng.nextInt(12))}-${pad2(1 + rng.nextInt(28))}" +
        s"T${pad2(rng.nextInt(24))}:00:00Z"
    // string construction deferred below the date draws so the dates can
    // ride inside the ld+json / meta variants without reordering any
    // pre-existing draw
    val ldJson = if (ldDraw == 0)
      s"""\n<script type="application/ld+json">{"@type":"Article","headline":"$title","keywords":"$ldKw","datePublished":"$ldDate"}</script>"""
    else if (ldDraw == 1)
      s"""\n<script type=" Application/LD+JSON ">{"@type":"NewsArticle","headline":"$title"}</script>"""
    else ""
    val headMetas = if (metaDraw == 0)
      s"""\n<meta name="description" content="$metaDesc"><meta property="og:title" content="$title"><meta property="article:published_time" content="$metaDate">"""
    else if (metaDraw == 1)
      s"""\n<meta name=" Description " content="$metaDesc"><meta name="robots">"""
    else ""
    s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>$title</title>$canonLink$ldJson$headMetas$headFeeds
<style>body { margin: 0 }</style>
<script>var x = 1 < 2;</script></head>
<body>
<header><ul>$nav</ul></header>
<nav><ul>$nav</ul></nav>
<main>
<h1>$title</h1>$bodyMeta$bodyFeed
$paras
</main>
<aside>$aside</aside>
<footer><p>© 2020 ${words(rng, 2)} · <a href="/tos">terms</a> · <a href="https://$extHost.example.org/ref?x=1#frag">source</a> · <a href="../up/./page.html">up</a> · <a href="//cdn.$extHost.example.net/lib">cdn</a> · <a href="mailto:team@$extHost.example">mail</a> · <a href="p$sib">related</a></p></footer>
</body></html>"""
  }

  def multiblock(rng: Rng): String = {
    val title = words(rng, 3).capitalize
    val sections = (0 until 4).map { s =>
      val items = (0 until 3 + rng.nextInt(3)).map(_ =>
        s"<li>${sentence(rng)}</li>").mkString
      s"""<section><h2>${words(rng, 3).capitalize}</h2>
<p>${paragraph(rng)}</p>
<ul>$items</ul>
<blockquote>${sentence(rng)}</blockquote>
<pre>${words(rng, 6)}</pre></section>"""
    }.mkString("\n")
    s"""<html><head><title>$title</title></head><body><article>
<h1>$title</h1>
$sections
<table><tr><td>${sentence(rng)}</td><td>${sentence(rng)}</td></tr></table>
<table><thead><tr><th>${words(rng, 2)}</th><th>${words(rng, 2)}</th><th></th></tr></thead>
<tbody><tr><td>${sentence(rng)}</td><td>before <table><tr><td>${words(rng, 2)}</td></tr></table> after</td><td>${words(rng, 3)}</td></tr>
<tr><td>${words(rng, 2)}</td><td></td><td>${words(rng, 4)}</td></tr></tbody></table>
<table><tr><td rowspan=2>${words(rng, 2)}</td><td colspan="2">${words(rng, 3)}</td></tr>
<tr><td>${words(rng, 2)}</td><td>${words(rng, 2)}</td></tr></table>
</article></body></html>"""
  }

  def malformed(rng: Rng): String = {
    val p1 = paragraph(rng)
    val p2 = paragraph(rng)
    val p3 = sentence(rng)
    s"""<html><body>
<p>$p1
<div><b>$p2</div></b>
<p class=unquoted id = spaced >$p3
<ul><li>${sentence(rng)}<li>${sentence(rng)}</ul>
<p>&bogus; &#xZZ; &amp unterminated <notatag
</body>"""
  }

  def deepNesting(rng: Rng): String = {
    val depth = 140 + rng.nextInt(20)
    val open = (0 until depth).map(_ => "<div>").mkString
    val close = (0 until depth).map(_ => "</div>").mkString
    s"<html><body>$open<p>${paragraph(rng)}</p>$close</body></html>"
  }

  def encodings(rng: Rng, variant: Int): Array[Byte] = variant match {
    case 0 => // UTF-16LE with BOM
      val s = s"<html><body><p>${paragraph(rng)} naïve café résumé</p></body></html>"
      Array[Byte](0xff.toByte, 0xfe.toByte) ++
        s.getBytes(StandardCharsets.UTF_16LE)
    case 1 => // windows-1252 declared and actual
      val s = s"""<html><head><meta charset="windows-1252"></head><body><p>${paragraph(rng)} café — résumé €99</p></body></html>"""
      s.getBytes(Charset1252)
    case 2 => // mojibake: declared utf-8, actual latin-1 high bytes
      val s = s"""<html><head><meta charset="utf-8"></head><body><p>${paragraph(rng)} café</p></body></html>"""
      s.getBytes(Charset1252)
    case 3 => // Shift_JIS Japanese
      val s = s"""<html><head><meta charset="shift_jis"></head><body><p>データ処理パイプライン ${words(rng, 3)} 抽出エンジン</p></body></html>"""
      s.getBytes(java.nio.charset.Charset.forName("windows-31j"))
    case 4 => // GBK Chinese
      val s = s"""<html><head><meta charset="gbk"></head><body><p>${words(rng, 4, cjkVocab)} 数据提取 ${words(rng, 2)}</p></body></html>"""
      s.getBytes(java.nio.charset.Charset.forName("gbk"))
    case _ => // KOI8-R Russian
      val s = s"""<html><head><meta charset="koi8-r"></head><body><p>Обработка данных и извлечение текста ${words(rng, 3)}</p></body></html>"""
      s.getBytes(java.nio.charset.Charset.forName("koi8-r"))
  }

  private val Charset1252 = java.nio.charset.Charset.forName("windows-1252")

  def scripts(rng: Rng, variant: Int): String = variant match {
    case 0 =>
      val t = (0 until 8).map(_ => words(rng, 2, cjkVocab).replace(" ", ""))
        .mkString("")
      s"""<html><head><title>${words(rng, 2, cjkVocab)}</title></head>
<body><p>$t</p><p>${words(rng, 3, cjkVocab)} latin ${words(rng, 2, cjkVocab)}</p></body></html>"""
    case 1 =>
      s"""<html><body dir="rtl"><p>${words(rng, 12, arabicVocab)}</p>
<p>${words(rng, 6, arabicVocab)} ASCII ${words(rng, 4, arabicVocab)}</p></body></html>"""
    case _ =>
      s"""<html><body><p>${words(rng, 6)} ${words(rng, 3, cjkVocab)} ${words(rng, 4)} ${words(rng, 2, arabicVocab)}</p></body></html>"""
  }

  def entities(rng: Rng): String = {
    s"""<html><body>
<p>Fish &amp; chips &lt;tag&gt; &quot;quoted&quot; &copy; &eacute;t&eacute; &#233; &#x00E9; caf&eacute;</p>
<p>Ligature: ﬁre ﬂow — NFKC folds these. Math: ℕ ½ x² (compat forms).</p>
<p>${paragraph(rng)} &mdash; &hellip; &euro;42 &nbsp;spaced&nbsp;out</p>
</body></html>"""
  }

  def hidden(rng: Rng): String = {
    s"""<html><body>
<p>${paragraph(rng)}</p>
<div style="display:none"><p>INVISIBLE ${words(rng, 5)}</p></div>
<template><p>TEMPLATE ${words(rng, 5)}</p></template>
<p hidden>HIDDEN-ATTR ${words(rng, 5)}</p>
<div style="visibility: hidden">GONE ${words(rng, 3)}</div>
<noscript>NOSCRIPT ${words(rng, 3)}</noscript>
<p aria-hidden="true">ARIA ${words(rng, 3)}</p>
<p>${paragraph(rng)}</p>
</body></html>"""
  }

  def linkfarm(rng: Rng): String = {
    // <base href> fixture: every absolute-path link on this page rebases
    // onto the mirror authority (extract/Links.scala honors the first
    // base element, WHATWG rule); the trailing doc-relative link
    // exercises path merge + dot-segment removal under the base's dir
    val baseHost = words(rng, 1)
    val links = (0 until 40).map(_ =>
      s"""<a href="/${words(rng, 1)}">${words(rng, 2)}</a>""").mkString(" | ")
    s"""<html><head><base href="https://mirror.$baseHost.example.com/deep/dir/"></head><body><div>$links</div>
<div class="cookie-banner"><a href="#accept">Accept</a> <a href="#reject">Reject</a> cookies</div>
<p><a href="a/../b.html">${words(rng, 1)}</a> ${words(rng, 3)}</p></body></html>"""
  }

  def fault(rng: Rng, variant: Int): Array[Byte] = variant match {
    case 0 => // giant attribute
      val big = "x" * 100000
      s"""<html><body><p data-blob="$big">${sentence(rng)}</p></body></html>"""
        .getBytes(StandardCharsets.UTF_8)
    case 1 => // unterminated comment + nulls
      (s"<html><body><p>${sentence(rng)}</p><!-- never closed " +
        "   tail").getBytes(StandardCharsets.UTF_8)
    case _ => // binary garbage
      val b = new Array[Byte](2048)
      var i = 0
      while (i < b.length) { b(i) = (rng.nextLong() & 0xff).toByte; i += 1 }
      b
  }

  def redirect(rng: Rng): String =
    s"""<html><head><meta http-equiv="refresh" content="0; url=https://${words(rng, 1)}.example.com/"><title>Redirecting</title></head>
<body><p>Redirecting to the new ${words(rng, 1)} page</p></body></html>"""

  /** Shared constant (identical bytes for every toolarge row — the size
    * reject never reads content, and a per-row 2.5 MB build would dominate
    * corpus generation at bench scale). */
  lazy val tooLargeHtml: Array[Byte] = {
    val b = new Array[Byte](2500000)
    java.util.Arrays.fill(b, 'x'.toByte)
    val head = "<html><body><p>".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(head, 0, b, 0, head.length)
    b
  }

  def garbage(rng: Rng): String = {
    val blob = (0 until 40).map(_ => f"${rng.nextLong()}%016x").mkString // 640-char "word"
    val soup = (0 until 30).map(_ => "=#/&%$;@[]{}|\\^~<>()*+" ).mkString(" ")
    s"""<html><body>
<div>$blob</div>
<div>$soup</div>
<p>${paragraph(rng)}</p>
</body></html>"""
  }

  /** PDF whose page content draws a Form XObject containing the text —
    * exercises the Do-operator recursion (reference: formxobject.pdf
    * fixture; src/ocrmypdf/pdfinfo/_image.py:379-431). */
  def pdfXObject(rng: Rng): Array[Byte] = {
    val inner = {
      val s = sentence(rng)
      val esc = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
      deflate(s"BT /F1 11 Tf 10 10 Td ($esc) Tj ET"
        .getBytes(StandardCharsets.ISO_8859_1))
    }
    val outer = deflate(
      "BT /F1 12 Tf 72 720 Td (before form) Tj ET q 1 0 0 1 0 -40 cm /Fm1 Do Q"
        .getBytes(StandardCharsets.ISO_8859_1))
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def wb(b: Array[Byte]): Unit = sb.write(b, 0, b.length)
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> /XObject << /Fm1 6 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
    w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
    w(s"5 0 obj << /Length ${outer.length} /Filter /FlateDecode >> stream\n")
    wb(outer)
    w("\nendstream endobj\n")
    w(s"6 0 obj << /Type /XObject /Subtype /Form /BBox [0 0 200 40] /Resources << /Font << /F1 4 0 R >> >> /Length ${inner.length} /Filter /FlateDecode >> stream\n")
    wb(inner)
    w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    sb.toByteArray
  }

  def gzipCase(rng: Rng, variant: Int): Array[Byte] = {
    val inner = article(rng).getBytes(StandardCharsets.UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(inner); gz.close()
    val full = bos.toByteArray
    if (variant == 0) full
    else java.util.Arrays.copyOf(full, math.max(4, full.length / 2)) // truncated
  }

  // ---- PDF builder ----------------------------------------------------

  /** Minimal deterministic PDF. Variants: 0 = two-page WinAnsi + Flate
    * (exercises the \f ordered merge), 1 = font with no
    * ToUnicode/Encoding and high bytes → U+FFFD policy, 2 = encrypted
    * marker → skipped:encrypted. */
  def pdf(rng: Rng, variant: Int): Array[Byte] = {
    def content(lines: Seq[String]): Array[Byte] = {
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) ops.append("0 -14 Td ")
        val esc = l.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        ops.append(s"($esc) Tj ")
      }
      ops.append("ET")
      deflate(ops.toString.getBytes(StandardCharsets.ISO_8859_1))
    }
    val page1Lines = (0 until 3).map(_ => sentence(rng))
    val page2Lines = (0 until 2).map(_ => sentence(rng))
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = sb.write(s.getBytes(StandardCharsets.ISO_8859_1))
    def wb(b: Array[Byte]): Unit = sb.write(b, 0, b.length)
    w("%PDF-1.4\n")
    variant match {
      case 2 =>
        w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj\n")
        w("9 0 obj << /Filter /Standard /V 1 /R 2 >> endobj\n")
        w("trailer << /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n")
      case 1 =>
        val c = {
          // high bytes with no encoding → U+FFFD policy; stream uses
          // ASCIIHexDecode to exercise the non-Flate filter path
          val raw = "BT /F1 12 Tf 72 720 Td (café èà) Tj ET"
            .getBytes(StandardCharsets.ISO_8859_1)
          (raw.map(b => f"${b & 0xff}%02x").mkString + ">")
            .getBytes(StandardCharsets.ISO_8859_1)
        }
        w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
        w("4 0 obj << /Type /Font /Subtype /TrueType /BaseFont /NoMap >> endobj\n")
        w(s"5 0 obj << /Length ${c.length} /Filter /ASCIIHexDecode >> stream\n")
        wb(c)
        w("\nendstream endobj\n")
        w("trailer << /Root 1 0 R >>\n%%EOF\n")
      // doc-level policy fixtures (reference: validate_pdfinfo_options,
      // _pipeline.py:241-279): tagged / fillable form / digital signature
      case 3 =>
        val c1 = content(page1Lines)
        w("1 0 obj << /Type /Catalog /Pages 2 0 R /MarkInfo << /Marked true >> /StructTreeRoot 8 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
        w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
        w(s"5 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
        wb(c1)
        w("\nendstream endobj\n")
        w("8 0 obj << /Type /StructTreeRoot >> endobj\n")
        w("trailer << /Root 1 0 R >>\n%%EOF\n")
      case 4 =>
        val c1 = content(page1Lines)
        w("1 0 obj << /Type /Catalog /Pages 2 0 R /AcroForm 8 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
        w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
        w(s"5 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
        wb(c1)
        w("\nendstream endobj\n")
        w("8 0 obj << /Fields [9 0 R] >> endobj\n")
        w("9 0 obj << /FT /Tx /T (name) >> endobj\n")
        w("trailer << /Root 1 0 R >>\n%%EOF\n")
      case 5 =>
        val c1 = content(page1Lines)
        w("1 0 obj << /Type /Catalog /Pages 2 0 R /AcroForm 8 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
        w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
        w(s"5 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
        wb(c1)
        w("\nendstream endobj\n")
        w("8 0 obj << /Fields [9 0 R] /SigFlags 3 >> endobj\n")
        w("9 0 obj << /FT /Sig /T (sig) >> endobj\n")
        w("trailer << /Root 1 0 R >>\n%%EOF\n")
      case _ =>
        val c1 = content(page1Lines)
        val c2 = content(page2Lines)
        w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
        w("2 0 obj << /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >> endobj\n")
        w("3 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 5 0 R >> endobj\n")
        w("4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
        w(s"5 0 obj << /Length ${c1.length} /Filter /FlateDecode >> stream\n")
        wb(c1)
        w("\nendstream endobj\n")
        w("6 0 obj << /Type /Page /Parent 2 0 R /Resources << /Font << /F1 4 0 R >> >> /MediaBox [0 0 612 792] /Contents 7 0 R >> endobj\n")
        w(s"7 0 obj << /Length ${c2.length} /Filter /FlateDecode >> stream\n")
        wb(c2)
        w("\nendstream endobj\n")
        w("trailer << /Root 1 0 R >>\n%%EOF\n")
    }
    sb.toByteArray
  }

  def deflate(in: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(in); d.finish()
    val out = new java.io.ByteArrayOutputStream(in.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val k = d.deflate(buf)
      out.write(buf, 0, k)
    }
    d.end()
    out.toByteArray
  }
}
