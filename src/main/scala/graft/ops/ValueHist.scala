package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The value-bounded histogram scaffold every VALUE-THRESHOLD quantile
  * operator stands on: reduce a per-row integer signal to a
  * (value, count) histogram, run the cumulative sum over THAT (the
  * single-partition window is bounded by the value range, never the
  * corpus — the trick that makes exact corpus-wide quantiles legal at
  * 100 TB), and return the 1-row total alongside. ONE owner:
  * [[Lm.qualityTiers]] (tercile thresholds) and
  * [[CorpusStats.signalOutliers]] (Tukey fences) both stand here — a
  * private copy drifting in either (frame, cum type, total definition)
  * would silently de-sync the two quantile operators. */
object ValueHist {

  /** (cum, total): `cum(valueCol, c, cum)` ordered by value with an
    * explicit ROWS frame, and the 1-row `total(n)`. The caller is
    * expected to aggregate `cum` down to its thresholds and broadcast
    * them — both existing callers do. */
  def cumAndTotal(scored: DataFrame, valueCol: String): (DataFrame, DataFrame) = {
    val hist = scored.groupBy(valueCol).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    (cum, hist.agg(sum("c").as("n")))
  }

  /** The GROUPED twin of [[cumAndTotal]]: one independent histogram /
    * cumulative sum / total per `keyCol` value (the per-population
    * form [[Lm.qualityTiersBy]] computes per-language terciles with).
    * The window is partitioned by the key, so even the bounded-range
    * guarantee tightens: each partition is at most one value range. */
  def cumAndTotalBy(scored: DataFrame, keyCol: String,
      valueCol: String): (DataFrame, DataFrame) = {
    val hist = scored.groupBy(keyCol, valueCol).agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum",
      sum("c").over(Window.partitionBy(keyCol).orderBy(valueCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    (cum, hist.groupBy(keyCol).agg(sum("c").as("n")))
  }
}
