package graft.tools

import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sustained-throughput stress demonstration: N million docs through the
  * full pipeline in one job (bounded memory per row, no OOM, checksummed).
  */
object StressRun {
  def main(args: Array[String]): Unit = {
    // stable %.1f decimal separator for the parsed [stress] result line
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Jobs.extract(Jobs.syntheticPages(spark, 200000), 64).count() // warm
    val t0 = System.nanoTime()
    val row = Jobs.extract(Jobs.syntheticPages(spark, n), 128).toDF()
      .select(xxhash64(col("url"), col("text"), col("outcome")).as("h"),
        when(col("outcome") === "ok", 1L).otherwise(0L).as("ok"))
      .agg(expr("bit_xor(h)").as("checksum"), sum(col("ok")).as("ok_docs"),
        count(lit(1)).as("docs")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress] docs=${row.getLong(2)} ok=${row.getLong(1)} checksum=${row.getLong(0)} wall=${secs}%.1f s throughput=${n / secs}%.0f docs/s")
    spark.stop()
  }
}
