package graft.tools

import graft.engine.Extractor
import graft.gen.SyntheticCorpus
import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileSpark {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = 400000L
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof $cores] $label%-22s $dt%6.2f s (${n / dt}%.0f docs/s, rows=$r)")
    }
    (1 to 4).foreach { k =>
      time(s"rdd-kernel count $k") {
        // pure RDD path: no Dataset encoders at all
        spark.sparkContext.range(0, n, 1, cores * 2)
          .map(i => Extractor.extract(SyntheticCorpus.row(i)).text.length.toLong)
          .sum().toLong
      }
    }
    (1 to 4).foreach { k =>
      time(s"ds-narrow count $k") {
        Jobs.extractNarrow(Jobs.syntheticPages(spark, n)).count()
      }
    }
    spark.stop()
  }
}
