package graft.streaming

import graft.engine.Extractor
import graft.model.{ExtractResult, PageRow}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface for the extraction pipeline.
  *
  * The reference's watched-folder mode (reference:
  * src/ocrmypdf/_watcher_security.py + docs) is an external file-event
  * loop around the same per-document pipeline; here it is the idiomatic
  * Spark equivalent: `readStream` over arriving page files → the SAME
  * fused kernel (one code path for batch and streaming — the kernel is a
  * pure per-row function, so it composes with either execution mode) →
  * checkpointed append sink, plus a watermarked windowed metrics stream.
  */
object StreamJobs {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  /** Streaming transform: same kernel, streaming Dataset in/out. */
  def extractStream(pages: Dataset[PageRow]): Dataset[ExtractResult] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions(it => it.map(Extractor.extract))
  }

  /** File-watch pipeline: parquet files arriving in `inDir` are extracted
    * and appended to `outDir`, exactly-once via the sink checkpoint. */
  def fileExtractQuery(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", "16")
      .parquet(inDir)
      .as[PageRow]
    extractStream(pages).toDF()
      .withColumn("spans", to_json(col("spans")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** Watermarked per-window outcome metrics over the extracted stream —
    * the streaming analog of the batch metrics table. */
  def windowedMetrics(extracted: Dataset[ExtractResult]): DataFrame =
    extracted.toDF()
      .withWatermark("warc_ts", "1 hour")
      .groupBy(window(col("warc_ts"), "1 hour"), col("outcome"))
      .agg(count(lit(1)).as("docs"), sum(length(col("text"))).as("chars"))
}
