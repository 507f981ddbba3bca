package graft.tools
import graft.gen.SyntheticCorpus
object GenProfile {
  def main(args: Array[String]): Unit = {
    val n = 30000L
    (0L until 3000L).foreach(SyntheticCorpus.row(_))
    val per = new scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long)]
    (0L until n).foreach { i =>
      val cls = SyntheticCorpus.classOf(i)
      val t0 = System.nanoTime()
      val r = SyntheticCorpus.row(i)
      val dt = System.nanoTime() - t0
      val (c, t, bytes) = per.getOrElse(cls, (0L, 0L, 0L))
      per(cls) = (c + 1, t + dt, bytes + r.html.length)
    }
    per.toSeq.sortBy(-_._2._2).foreach { case (cls, (c, t, b)) =>
      println(f"$cls%-12s n=$c%-6d total=${t / 1e9}%.2f s avg=${t / 1e3 / c}%.1f us avgBytes=${b / c}")
    }
  }
}
