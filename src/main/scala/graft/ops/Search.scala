package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword search: integer-exact tf-idf top-k over the corpus [public
  * technique: tf-idf ranked retrieval, Manning et al. 2008 "Introduction
  * to Information Retrieval" ch. 6; reference anchor: the dictionary
  * hit-ratio scoring OCRmyPDF runs per page
  * (`quality.py:12-44`) is the same bag-of-words relevance shape,
  * scored corpus-wide here].
  *
  * Scoring is EXACT integer arithmetic so the ranking is reproducible
  * bit-for-bit on any engine (the golden/oracle discipline): per
  * matched term, `idf_milli = (N * 1000) div df` (truncating div, both
  * engines), and `score_milli = sum(tf * idf_milli)`. ln-free idf is a
  * monotone transform of the classic idf at fixed df, so per-term
  * ordering is preserved; the sum weighting differs from the ln form
  * and is documented as this engine's deterministic variant.
  *
  * 100 TB shape: the query-term list is a tiny broadcast literal; the
  * (token, doc_id) grain is filtered to query terms BEFORE any shuffle
  * (a narrow isin over the tokenized scan — no full-vocabulary index is
  * built or consulted); df arrives by a second agg of the already-tiny
  * matched grain; the corpus size N rides in as a broadcast one-row
  * cross join (computed once, never a driver-side constant baked into
  * the plan); the final top-k is TakeOrderedAndProject — per-partition
  * partial top-k, only k rows ever reach the driver. */
object Search {

  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val grain = TextGrams.tokenGrain(docs, idCol, textCol,
      tokenFilter = Some(col("token").isin(queryTerms.map(lit): _*)))
      // barrier: grain feeds both the df agg and the score join — without
      // it the corpus tokenizes twice; post-filter it is tiny (matched
      // terms only)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfPerToken = grain.groupBy("token")
      .agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    grain.join(dfPerToken, Seq("token"))
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(sum(expr("tf * ((n * 1000L) div df)")).as("score_milli"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("score_milli").desc, col("doc_id").asc)
      .limit(k)
  }
}
