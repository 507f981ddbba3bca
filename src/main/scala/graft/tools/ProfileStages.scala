package graft.tools

import graft.gen.SyntheticCorpus
import graft.html.{Tokenizer, TreeBuilder}
import graft.extract.{Blocks, Boilerplate, TextAssembler}

/** Dev tool: per-stage cost breakdown of the HTML kernel hot path. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val htmls = (0L until n.toLong)
      .filter(i => SyntheticCorpus.classOf(i) == "article" ||
        SyntheticCorpus.classOf(i) == "multiblock")
      .map { i =>
        new String(SyntheticCorpus.row(i).html,
          java.nio.charset.StandardCharsets.UTF_8)
      }.toArray
    // warmup
    htmls.take(3000).foreach { h =>
      val dom = TreeBuilder.build(Tokenizer.tokenize(h))
      val bs = Blocks.segment(dom)
      TextAssembler.assemble("", Boilerplate.classify(bs), emitSpans = true)
    }
    var tTok = 0L; var tTree = 0L; var tSeg = 0L; var tCls = 0L; var tAsm = 0L
    htmls.foreach { h =>
      val a = System.nanoTime()
      val toks = Tokenizer.tokenize(h)
      val b = System.nanoTime()
      val dom = TreeBuilder.build(toks)
      val c = System.nanoTime()
      val bs = Blocks.segment(dom)
      val d = System.nanoTime()
      val kept = Boilerplate.classify(bs)
      val e = System.nanoTime()
      TextAssembler.assemble("", kept, emitSpans = true)
      val f = System.nanoTime()
      tTok += b - a; tTree += c - b; tSeg += d - c; tCls += e - d; tAsm += f - e
    }
    // full-kernel and decode-only comparison on the same class mix
    val rows = (0L until n.toLong)
      .filter(i => SyntheticCorpus.classOf(i) == "article" ||
        SyntheticCorpus.classOf(i) == "multiblock")
      .map(i => SyntheticCorpus.row(i)).toArray
    rows.take(3000).foreach(graft.engine.Extractor.extract(_))
    val k0 = System.nanoTime()
    rows.foreach(graft.engine.Extractor.extract(_))
    val kNs = System.nanoTime() - k0
    val s0 = System.nanoTime()
    rows.foreach { r =>
      val sn = graft.engine.Sniffer.sniff(r.html)
      graft.engine.Sniffer.decodeHtml(sn.bytes)
    }
    val sNs = System.nanoTime() - s0
    println(f"full kernel: ${kNs / 1e9}%.2f s (${rows.length / (kNs / 1e9)}%.0f docs/s)  sniff+decode: ${sNs / 1e9}%.2f s")
    val tot = (tTok + tTree + tSeg + tCls + tAsm) / 1e9
    println(f"stages over ${htmls.length} docs, total ${tot}%.2f s (${htmls.length / tot}%.0f docs/s/core)")
    Seq("tokenize" -> tTok, "treebuild" -> tTree, "segment" -> tSeg,
      "classify" -> tCls, "assemble" -> tAsm).foreach { case (k, v) =>
      println(f"  $k%-9s ${v / 1e9}%.2f s  (${100.0 * v / (tot * 1e9)}%.1f%%)")
    }
  }
}
