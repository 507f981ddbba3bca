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
  * `MetricsSink.observed(ds)`, capture `v = MetricsSink.version(name)`
  * BEFORE the action, run the action, then read
  * `MetricsSink.awaitLast(name, v)`. The await is load-bearing:
  * QueryExecutionListener callbacks are delivered on the ASYNC listener
  * bus, so a bare `last()` right after the action races the delivery
  * (None, or a PREVIOUS query's row). Rows are keyed by observation
  * name — concurrent queries observing the same name clobber each
  * other's slot; give concurrent pipelines distinct names.
  */
object MetricsSink {

  final case class Observed(docs: Long, failures: Long, skips: Long,
      rejects: Long, truncations: Long, chars: Long)

  private val lastMetrics = TrieMap.empty[String, Observed]
  private val versions = TrieMap.empty[String, Long]
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
              // bump AFTER the row is in place: an awaitLast woken by
              // the new version must never read the previous row
              versions(name) = versions.getOrElse(name, 0L) + 1L
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }

  def last(name: String = "graft_extract"): Option[Observed] =
    lastMetrics.get(name)

  /** Delivery count for `name` — capture before the action, pass to
    * [[awaitLast]] after it. */
  def version(name: String = "graft_extract"): Long =
    versions.getOrElse(name, 0L)

  /** Blocks until the metrics row for `name` advances past
    * `sinceVersion` or the timeout lapses, then returns the latest row
    * (None only if nothing was ever delivered). */
  def awaitLast(name: String = "graft_extract", sinceVersion: Long = 0L,
      timeoutMs: Long = 10000L): Option[Observed] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (version(name) <= sinceVersion && System.nanoTime() < deadline)
      Thread.sleep(10)
    last(name)
  }
}
