package graft.tools

import graft.engine.Extractor
import graft.gen.SyntheticCorpus
import java.util.concurrent.atomic.AtomicLong

/** Dev tool: raw kernel scaling across plain JVM threads (no Spark). */
object ProfileThreads {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000L
    Seq(1, 8, 32).foreach { threads =>
      (0L until 2000L).foreach(i => Extractor.extract(SyntheticCorpus.row(i)))
      val next = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = next.getAndAdd(100)
          while (i < n) {
            val end = math.min(i + 100, n)
            var j = i
            while (j < end) { Extractor.extract(SyntheticCorpus.row(j)); j += 1 }
            i = next.getAndAdd(100)
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%-3d ${n / secs}%.0f docs/s (${secs}%.2f s)")
    }
  }
}
