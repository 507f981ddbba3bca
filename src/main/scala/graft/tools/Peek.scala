package graft.tools

import graft.gen.SyntheticCorpus
import graft.engine.Extractor

/** Dev tool: run the scalar kernel over the first rows of each corpus
  * class and print outcomes + text prefixes (no Spark). */
object Peek {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60
    (0L until n.toLong).foreach { i =>
      val row = SyntheticCorpus.row(i)
      val cls = SyntheticCorpus.classOf(i)
      val t0 = System.nanoTime()
      val r = Extractor.extract(row)
      val ms = (System.nanoTime() - t0) / 1e6
      val preview = r.text.replace("\n", "\\n").take(110)
      println(f"[$i%3d] $cls%-10s ${r.outcome}%-18s ${r.format}%-10s ${r.charset}%-12s nodes=${r.n_nodes}%-6d blocks=${r.n_blocks}%-4d spans=${r.spans.length}%-3d trunc=${r.truncated} ${ms}%6.1fms |$preview|")
    }
  }
}
