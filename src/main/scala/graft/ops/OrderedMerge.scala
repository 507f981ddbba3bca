package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Skew-safe ordered concatenation per group — merge_sidecars semantics
  * (reference: src/ocrmypdf/_pipeline.py:1307-1327 concatenates per-page
  * text in page order with \f separators) as a distributed operator.
  *
  * Shape: repartition by the group key, sortWithinPartitions(key, order),
  * then a single streaming pass that concatenates consecutive rows of the
  * same key. Unlike `collect_list`, no per-group array is ever buffered:
  * peak memory per task is ONE output string (inherent to the query — the
  * result row contains the concatenation), not one boxed struct per input
  * row. With the corpus's designed 70%-one-host skew, collect_list holds
  * 70% of all rows on one executor; this streams them.
  *
  * Determinism: the sort key (key, order) is total per row (order column
  * must be unique within a group, e.g. url), so output is independent of
  * task scheduling.
  */
object OrderedMerge {

  /** Returns (key, n_docs BIGINT, merged STRING): values of `valueCol`
    * concatenated in `orderCol` order within each `keyCol` group,
    * separated by `sep`. The sort runs on the order column's NATIVE type
    * (casting first would merge numeric orders lexicographically —
    * 1,10,11,2,… — with no error); only the key/value are stringified,
    * after the sort. */
  def concatOrdered(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, sep: String,
      nName: String = "n_docs", mergedName: String = "merged"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted: Dataset[(String, String)] = df
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
    sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(String, Long, String)] {
        def hasNext: Boolean = buf.hasNext
        def next(): (String, Long, String) = {
          val k = buf.head._1
          var n = 0L
          val sb = new StringBuilder
          while (buf.hasNext && buf.head._1 == k) {
            val v = buf.next()._2
            if (n > 0L) sb.append(sep)
            sb.append(v)
            n += 1L
          }
          (k, n, sb.toString)
        }
      }
    }.toDF(keyCol, nName, mergedName)
  }
}
