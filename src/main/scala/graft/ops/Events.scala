package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators (windowed aggregation, ordered
  * window functions, gap-based sessionization) over the events table —
  * the batch counterparts of the streaming metrics, and the classic
  * training-data-pipeline session features.
  *
  * Numeric discipline for cross-engine oracles: aggregates over doubles
  * use order-independent forms (count/min/max or pre-quantized integer
  * sums), because a float SUM's low bits depend on reduction order.
  */
object Events {

  /** Per-hour per-type counts + quantized value sum (exact integers). */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(floor(value * 1000) as bigint)")).as("value_milli"))
      .orderBy("hour", "event_type")

  /** Ordered per-user window functions: row number + previous event type.
    * Deterministic ordering via (ts, event_id) tie-break. */
  def ordered(events: DataFrame, maxUsers: Int = 50): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events.filter(col("user_id") < maxUsers)
      .select(col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("event_type"), 1).over(w).as("prev_type"))
      .orderBy("user_id", "rn")
  }

  /** Gap-based sessionization: a new session starts after `gapSec` of
    * inactivity; session index = running count of session starts. */
  def sessionize(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1L)
          .when(unix_micros(col("ts").cast("timestamp"))
            - unix_micros(col("prev_ts").cast("timestamp"))
            > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("event_id"), col("session_idx"))
      .orderBy("user_id", "event_id")
  }
}
