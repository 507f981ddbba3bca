package graft.tools

import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off forensic dump for stress-baseline changes: per-row
  * (url, xxhash64(url, text, outcome)) over the same synthetic corpus
  * StressRun checksums, so two trees' dumps can be anti-joined to find
  * exactly which rows a generator change touched. */
object HashDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: HashDump <outDir> [nDocs=2000000] — outDir is required")
    val out = args(0)
    val n = if (args.length > 1) args(1).toLong else 2000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Jobs.extract(Jobs.syntheticPages(spark, n), 128).toDF()
      .select(col("url"),
        xxhash64(col("url"), col("text"), col("outcome")).as("h"))
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
