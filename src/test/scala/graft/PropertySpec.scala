package graft

import graft.engine.Extractor
import graft.extract.{Blocks, Ranges}
import graft.html.{Tokenizer, TreeBuilder}
import graft.model.PageRow
import graft.ops.CorpusStats
import graft.pdf.PdfLexer
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §7.6): the kernel's total-function guarantees
  * hold for arbitrary generated inputs, not just fixtures. Uses scalacheck
  * generators with fixed seeds (deterministic — same discipline as the
  * corpus). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val htmlish: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)),
    2 -> Gen.oneOf("<", ">", "&", "\"", "'", "=", "/", "!", "-", ";", "#"),
    2 -> Gen.oneOf("<p>", "</p>", "<div ", "<!--", "-->", "&amp;", "&#",
      "<script>", "</script>", "<a href=", "<![CDATA[", "<?xml"),
    1 -> Gen.oneOf("数据", "مرحبا", "ﬁ", " ", "�", "²")
  )).map(_.mkString)

  private val bytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("property: tokenizer + tree builder never throw, depth always bounded") {
    samples(htmlish).foreach { s =>
      val dom = TreeBuilder.build(Tokenizer.tokenize(s))
      assert(dom.nodes.forall(_.depth <= TreeBuilder.maxDepth + 1), s.take(80))
    }
  }

  test("property: extractor is total and deterministic on arbitrary bytes") {
    samples(bytes, 200).foreach { bs =>
      val row = PageRow("u", new java.sql.Timestamp(0), bs, null, null)
      val a = Extractor.extract(row)
      val b = Extractor.extract(row)
      assert(a.outcome.nonEmpty && a.text == b.text && a.outcome == b.outcome)
    }
  }

  test("property: pdf lexer never throws and always makes progress") {
    samples(bytes, 200).foreach { bs =>
      val lx = new PdfLexer(bs)
      var steps = 0
      var stuck = false
      while (!lx.atEnd && steps < 100000 && !stuck) {
        val before = lx.pos
        val t = lx.next()
        if (t == null) stuck = true // clean EOF
        else assert(lx.pos > before || t != null)
        steps += 1
      }
      assert(steps < 100000, "lexer failed to terminate")
    }
  }

  test("property: random startxref tails never break the speculative parse") {
    val g = for {
      body <- bytes
      off <- Gen.choose(-5, 5000)
    } yield "%PDF-1.5\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
      body ++ s"\nstartxref\n$off\n%%EOF\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    samples(g, 150).foreach { bs =>
      val row = PageRow("u", new java.sql.Timestamp(0), bs, null, null)
      val a = Extractor.extract(row)
      val b = Extractor.extract(row)
      assert(a.outcome.nonEmpty && a.text == b.text && a.outcome == b.outcome)
      graft.pdf.PdfDoc.parseViaXref(bs) // must return, never throw
    }
  }

  test("property: Ranges.intervals expands to exactly Ranges.parse") {
    val frag = Gen.oneOf(
      Gen.choose(1, 30).map(_.toString),
      Gen.choose(1, 30).flatMap(a => Gen.choose(a, 35).map(b => s"$a-$b")),
      Gen.const("end"), Gen.const("junk"), Gen.const(""))
    val spec = Gen.listOf(frag).map(_.mkString(","))
    samples(spec).foreach { sp =>
      val total = 25
      val viaIntervals = Ranges.intervals(sp, total)
        .flatMap { case (l, h) => l to h }.toSet
      assert(viaIntervals == Ranges.parse(sp, total), sp)
    }
  }

  test("property: repetition signals match a naive in-JVM model") {
    val spark = TestSpark.spark
    import spark.implicits._
    val text: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf("aa", "bb", "cc", "dd"), // small vocab → repeats
      1 -> Gen.const(""), 1 -> Gen.alphaStr.map(_.take(5))))
      .map(_.mkString(" "))
    val docs = samples(text, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = CorpusStats.repetition(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    docs.foreach { case (id, t) =>
      val ws = t.split(' ').filter(_.nonEmpty).toSeq
      val bg = if (ws.length >= 2)
        ws.sliding(2).map(p => p(0) + " " + p(1)).toSeq else Seq.empty[String]
      val expect = (ws.length.toLong, ws.distinct.length.toLong,
        bg.length.toLong, bg.distinct.length.toLong,
        1000L * (ws.length - ws.distinct.length) / math.max(ws.length, 1))
      assert(got(id) == expect, s"doc $id: '$t'")
    }
  }

  test("property: passage clean keeps each distinct passage exactly once") {
    val spark = TestSpark.spark
    import spark.implicits._
    val text: Gen[String] = Gen.listOf(Gen.oneOf("aa", "bb", "cc"))
      .map(_.mkString(" "))
    val docs = samples(text, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val w = 3
    // full w-word groups of the clean text align with kept passages; the
    // final partial group (if any) is the always-kept tail — excluded here
    val kept = CorpusStats.passageDedupClean(df, "doc_id", "text",
        windowWords = w)
      .collect().flatMap(_.getString(2).split(' ').grouped(w)
        .filter(_.length == w).map(_.mkString(" ")))
    // every passage string survives exactly once corpus-wide…
    assert(kept.length == kept.distinct.length)
    // …and the surviving SET is the set of all passages that existed
    val all = docs.flatMap { case (_, t) =>
      val ws = t.split(' ').filter(_.nonEmpty)
      ws.grouped(w).filter(_.length == w).map(_.mkString(" "))
    }
    assert(kept.toSet == all.toSet)
  }

  test("property: ascii word join is reversible (CJK rule aside)") {
    val asciiWords = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString))
    samples(asciiWords).foreach { ws =>
      val joined = Blocks.joinWords(ws.toVector)
      assert(joined.split(' ').toSeq == ws)
    }
  }

  test("property: KLL sketch conserves weight, bounds state, bounds rank error") {
    import graft.functions.KllBuffer
    val cfg: Gen[(Int, Int, Int)] = for {
      n <- Gen.choose(1, 5000)
      k <- Gen.oneOf(16, 64, 256)
      parts <- Gen.choose(1, 9)
    } yield (n, k, parts)
    samples(cfg, n = 60).foreach { case (n, k, parts) =>
      val vals = (0 until n).map(i => ((i.toLong * 48271L) % n).toDouble)
      // split into `parts` streams, build + serialize-roundtrip + merge —
      // the shuffle shape
      val merged = new KllBuffer(k)
      vals.grouped(math.max(1, n / parts)).foreach { chunk =>
        val b = new KllBuffer(k)
        chunk.foreach(b.add)
        merged.mergeIn(KllBuffer.deserialize(b.serialize()))
      }
      assert(merged.totalWeight == n.toLong, s"weight lost n=$n k=$k")
      assert(merged.levels.forall(_.length <= k), s"level overflow k=$k")
      // O(log(n/k)) levels with slack
      assert(merged.levels.length <= 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(n / k, 1).toLong) + 3, s"level blowup n=$n k=$k")
      val sorted = vals.sorted
      Seq(0.25, 0.5, 0.75).foreach { q =>
        val est = merged.quantile(q).get
        val estRank = sorted.count(_ <= est)
        val trueRank = 1 + math.floor((n - 1) * q)
        // generous deterministic-compaction bound: 25% of n or exact when
        // nothing compacts
        val tol = if (n <= k) 0.0 else n * 0.25
        assert(math.abs(estRank - trueRank) <= tol,
          s"rank error n=$n k=$k parts=$parts q=$q: $estRank vs $trueRank")
      }
    }
  }

  test("property: range compression covers exactly the input set, in order") {
    samples(Gen.listOf(Gen.choose(1, 60))).foreach { pages =>
      val ranges = Ranges.compress(pages)
      val expanded = ranges.flatMap { r =>
        r.split('-') match {
          case Array(a) => Seq(a.toInt)
          case Array(a, b) => a.toInt to b.toInt
        }
      }
      assert(expanded.toSet == pages.toSet)
      assert(expanded == expanded.sorted)
    }
  }
}
