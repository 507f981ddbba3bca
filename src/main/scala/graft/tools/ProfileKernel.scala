package graft.tools

import graft.engine.Extractor
import graft.gen.SyntheticCorpus

/** Dev tool: single-threaded kernel throughput + per-class cost. */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // warmup
    (0L until 2000L).foreach(i => Extractor.extract(SyntheticCorpus.row(i)))
    val perClass = new scala.collection.mutable.LinkedHashMap[String, (Long, Long)]
    var genNs = 0L
    val t0 = System.nanoTime()
    (0L until n.toLong).foreach { i =>
      val g0 = System.nanoTime()
      val row = SyntheticCorpus.row(i)
      genNs += System.nanoTime() - g0
      val cls = SyntheticCorpus.classOf(i)
      val e0 = System.nanoTime()
      Extractor.extract(row)
      val dt = System.nanoTime() - e0
      val (c, t) = perClass.getOrElse(cls, (0L, 0L))
      perClass(cls) = (c + 1, t + dt)
    }
    val total = (System.nanoTime() - t0) / 1e9
    println(f"total ${total}%.2f s for $n docs = ${n / total}%.0f docs/s/core (gen ${genNs / 1e9}%.2f s)")
    perClass.toSeq.sortBy(-_._2._2).foreach { case (cls, (c, t)) =>
      println(f"  $cls%-12s n=$c%-6d total=${t / 1e9}%.2f s  avg=${t / 1e6 / c}%.2f ms")
    }
  }
}
