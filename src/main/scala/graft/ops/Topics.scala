package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword-taxonomy document classification — the rule-based domain
  * tagger every corpus curation pipeline runs before sampling (the
  * C4/Dolma-style "label by curated term lists" stage; same
  * layered-fallback shape as the reference's language-preferred font
  * map, /root/reference/src/ocrmypdf/font/multi_font_manager.py:51-120:
  * exact table first, deterministic fallback otherwise).
  *
  * Scoring: topic score = Σ tf(keyword) over the topic's keyword list;
  * the document's label is the argmax with ties broken by topic name
  * asc, `none` when no keyword hits at all. Exact integers end to end.
  *
  * 100 TB shape: the taxonomy is a small curated table — a BROADCAST
  * hash join against the (doc, token, tf) grain prunes every
  * non-keyword token map-side before the per-doc aggregation; the
  * argmax is `min(struct(-score, topic))`, one two-phase hash agg. No
  * per-topic column blowup, no cross join (the LangId ×32 label-grid
  * lesson).
  */
object Topics {

  /** Topic → keywords, over the corpus vocabulary. Insertion order is
    * irrelevant (argmax ties break on topic NAME) — determinism does
    * not depend on map order. */
  val taxonomy: Map[String, Seq[String]] = Map(
    "storage" -> Seq("table", "row", "column", "part", "key", "value"),
    "exec" -> Seq("scan", "filter", "join", "merge", "sort", "agg", "hash"),
    "stream" -> Seq("stream", "window", "batch", "line"),
    "shape" -> Seq("fast", "slow", "small", "big", "query", "vector", "data"))

  private def keywordDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    taxonomy.toSeq.sortBy(_._1)
      .flatMap { case (t, ws) => ws.map(w => (w, t)) }
      .toDF("token", "topic")
  }

  /** VALUES-list spelling of the taxonomy for the DuckDB oracle. */
  def taxonomyValuesSql: String =
    taxonomy.toSeq.sortBy(_._1)
      .flatMap { case (t, ws) => ws.map(w => s"('$w', '$t')") }
      .mkString(",\n  ")

  /** One row per document: (doc_id, topic, score) — argmax topic by
    * keyword-tf score, tie-broken by topic asc, ('none', 0) for docs
    * with no keyword hits. */
  def classify(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // broadcast-literal isin prunes non-keyword tokens BETWEEN the
    // explode and the groupBy — only keyword tokens ever shuffle
    val kwSet = taxonomy.values.flatten.toSeq.sorted
    val grain = TextGrams.tokenGrain(docs, idCol, textCol,
      tokenFilter = Some(col("token").isin(kwSet: _*)))
    val scored = grain
      .join(broadcast(keywordDf(docs.sparkSession)), Seq("token"))
      .groupBy("doc_id", "topic").agg(sum("tf").as("score"))
      .groupBy("doc_id")
      .agg(min(struct((-col("score")).as("neg"), col("topic").as("topic")))
        .as("best"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("best.topic"), lit("none")).as("topic"),
        coalesce(-col("best.neg"), lit(0L)).cast("long").as("score"))
  }
}
