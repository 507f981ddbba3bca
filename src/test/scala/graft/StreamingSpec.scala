package graft

import graft.engine.Extractor
import graft.gen.SyntheticCorpus
import graft.streaming.StreamJobs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surface: the same kernel behind readStream/writeStream must
  * produce the same bytes as the batch path. */
class StreamingSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  test("streaming: memory-stream extract matches the scalar kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 60L).map(SyntheticCorpus.row(_))
    val stream = MemoryStream[graft.model.PageRow]
    val q = StreamJobs.extractStream(stream.toDS()).toDF()
      .writeStream.format("memory").queryName("extract_stream")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(30))
      q.processAllAvailable()
      stream.addData(rows.drop(30))
      q.processAllAvailable()
      val got = spark.table("extract_stream")
        .select("url", "text", "outcome").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got.size == 60)
      rows.foreach { p =>
        val e = Extractor.extract(p)
        assert(got(p.url) == ((e.text, e.outcome)), s"stream mismatch ${p.url}")
      }
    } finally q.stop()
  }

  test("streaming: watermarked windowed metrics aggregate per outcome") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[graft.model.PageRow]
    val metrics = StreamJobs.windowedMetrics(
      StreamJobs.extractStream(stream.toDS()))
    val q = metrics.writeStream.format("memory").queryName("metrics_stream")
      .outputMode("complete").start()
    try {
      stream.addData((0L until 40L).map(SyntheticCorpus.row(_)))
      q.processAllAvailable()
      val rows = spark.table("metrics_stream").collect()
      assert(rows.nonEmpty)
      val total = rows.map(_.getLong(2)).sum
      assert(total == 40)
    } finally q.stop()
  }
}
