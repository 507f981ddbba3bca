package graft.spark

import graft.model.ExtractResult
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution
import scala.collection.concurrent.TrieMap

/** In-flight pipeline observability via `observe()` — counters computed by
  * the running job itself with no extra pass over the data (the analog of
  * the reference's in-run size/quality reporting,
  * src/ocrmypdf/_validation.py:282-337 `report_output_file_size` and
  * quality.py metrics).
  *
  * Usage: `MetricsSink.install(spark)`, wrap the extraction Dataset with
  * `MetricsSink.observed(ds)`, run any action, then read
  * `MetricsSink.last("graft_extract")`.
  */
object MetricsSink {

  final case class Observed(docs: Long, failures: Long, skips: Long,
      rejects: Long, truncations: Long, chars: Long)

  private val lastMetrics = TrieMap.empty[String, Observed]
  // weak keys: a strong session-keyed map would pin every stopped
  // session (and its registered listener) for the JVM's lifetime in
  // install/stop cycles
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def observed(ds: Dataset[ExtractResult],
      name: String = "graft_extract"): Dataset[ExtractResult] =
    // EVERY sum is null-guarded, not just chars: over a zero-row
    // observed dataset sum() is null, and the listener's getAs[Long]
    // would NPE inside the listener bus — silently dropping the metrics
    // instead of reporting the honest all-zero row
    ds.observe(name,
      count(lit(1)).as("docs"),
      coalesce(sum(when(col("outcome").startsWith("error"), 1L)
        .otherwise(0L)), lit(0L)).as("failures"),
      coalesce(sum(when(col("outcome").startsWith("skipped"), 1L)
        .otherwise(0L)), lit(0L)).as("skips"),
      coalesce(sum(when(col("outcome").startsWith("rejected"), 1L)
        .otherwise(0L)), lit(0L)).as("rejects"),
      coalesce(sum(when(col("truncated"), 1L).otherwise(0L)), lit(0L))
        .as("truncations"),
      coalesce(sum(length(col("text"))), lit(0L)).as("chars"))

  def install(spark: SparkSession): Unit =
    if (installed.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_")) {
              lastMetrics(name) = Observed(
                row.getAs[Long]("docs"), row.getAs[Long]("failures"),
                row.getAs[Long]("skips"), row.getAs[Long]("rejects"),
                row.getAs[Long]("truncations"), row.getAs[Long]("chars"))
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }

  def last(name: String = "graft_extract"): Option[Observed] =
    lastMetrics.get(name)
}
