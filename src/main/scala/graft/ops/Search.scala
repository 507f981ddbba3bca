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

  /** BM25 ranked retrieval (Robertson/Spärck Jones probabilistic
    * weighting; Robertson & Zaragoza 2009 "The Probabilistic Relevance
    * Framework: BM25 and Beyond") at the classic k1=1.2, b=0.75 — in
    * EXACT integer arithmetic so both engines rank identically:
    *
    *  - idf ratio (N−df+0.5)/(df+0.5) = (2N−2df+1)/(2df+1) exactly;
    *    `idf_milli = (1000·(2N−2df+1)) div (2df+1)` — ln-free, the
    *    same monotone-transform variant tf-idf above documents. Always
    *    ≥ 0 (df ≤ N), so truncation direction never differs;
    *  - length norm: k1·(1−b+b·dl/avgdl) in millis =
    *    `300 + (900·dlr_milli) div 1000` with
    *    `dlr_milli = (dl·1000000) div avgdl_milli` and
    *    `avgdl_milli = (toks·1000) div n` (the 300/900/2200 constants
    *    ARE k1=1.2, b=0.75, k1+1=2.2 in millis — fixed, since the
    *    truncation points are part of the cross-engine contract);
    *  - per-term `score_milli = (tf·2200·idf_milli) div denom_milli`,
    *    multiplied in DECIMAL(38,0) (HUGEINT oracle-side) so the
    *    product can't wrap at crawl-scale N; the summed doc score fits
    *    BIGINT.
    *
    * 100 TB shape, beyond [[tfidfTopK]]'s (broadcast query literals,
    * pre-shuffle isin prune, TakeOrdered partial top-k): BM25 needs
    * doc lengths — `dl` is a NARROW projection (no tokenize-shuffle),
    * avgdl one tiny agg broadcast back, and the dl join ships compact
    * (id, long) rows for matched docs only, never text. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    val dl = docs.select(col(idCol).as("doc_id"),
        size(TextGrams.wordsExpr(textCol)).cast("long").as("dl"))
      // barrier: dl feeds both the corpus-stats agg and the score join
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = dl.agg(sum(col("dl")).as("toks"), count(lit(1)).as("n"))
    val grain = TextGrams.tokenGrain(docs, idCol, textCol,
      tokenFilter = Some(col("token").isin(queryTerms.map(lit): _*)))
      // barrier: grain feeds both the df agg and the score join — without
      // it the corpus tokenizes twice (tfidfTopK's comment applies)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfPerToken = grain.groupBy("token").agg(count(lit(1)).as("df"))
    grain.join(dfPerToken, Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(tot))
      .withColumn("idf_milli",
        expr("(1000L * (2L * n - 2L * df + 1L)) div (2L * df + 1L)"))
      // greatest(avgdl_milli, 1): a degenerate corpus whose average doc
      // length truncates below 0.001 words must rank, not throw ANSI
      // DIVIDE_BY_ZERO (mirrored in the oracle)
      .withColumn("denom_milli", expr(
        "tf * 1000L + 300L + (900L * ((dl * 1000000L) div greatest((toks * 1000L) div n, 1L))) div 1000L"))
      .withColumn("term_milli", expr(
        "CAST(CAST(tf AS DECIMAL(38,0)) * 2200 * idf_milli AS DECIMAL(38,0))" +
          " div CAST(denom_milli AS DECIMAL(38,0))"))
      .groupBy("doc_id")
      .agg(sum(col("term_milli")).as("score_milli"),
        count(lit(1)).as("n_matched"))
      .orderBy(col("score_milli").desc, col("doc_id").asc)
      .limit(k)
  }
}
