package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index (posting-list) construction [public technique: the
  * classic IR index build, e.g. Manning et al. 2008 "Introduction to
  * Information Retrieval" ch. 4 distributed indexing; reference anchor:
  * the word-frequency summaries OCRmyPDF's quality dictionary keeps per
  * document generalize corpus-wide to an index].
  *
  * Output, one row per token with df ≥ minDf:
  * (token, df, tf_total, truncated, postings) where postings is the
  * "doc_id:tf" list comma-joined in doc_id order, capped at
  * `maxPostings` entries; `df`/`tf_total` stay EXACT (computed before
  * the cap) and `truncated = df > maxPostings` says the list was cut —
  * the same never-silent convention as the extraction kernel's flag.
  *
  * 100 TB shape: (token, doc_id) grain built by two-phase hash agg
  * (map-side partials collapse repeats before the shuffle); exact df /
  * tf_total by a second two-phase agg of compact keys; the posting cap
  * runs as a rank-only window (WindowGroupLimit pushes rank ≤ k into
  * per-partition partial limits BEFORE the exchange, so a stopword's
  * million-doc posting list never assembles anywhere — the skew cap);
  * the final join is token-keyed on both sides' existing partitioning.
  * Text never moves: tokens are the only strings shuffled, and a
  * production run dictionary-encodes them first. */
object InvertedIndex {

  def build(docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 1000, minDf: Long = 1L): DataFrame = {
    require(maxPostings >= 1, s"maxPostings must be >= 1, got $maxPostings")
    // persist barrier: grain feeds BOTH the stats agg and the postings
    // window — without it Catalyst re-inlines the subtree and the corpus
    // tokenizes twice (the expensive half of the job)
    val grain = TextGrams.tokenGrain(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact stats BEFORE the cap — truncation must never bend df
    val stats = grain
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("tf_total"))
      .filter(col("df") >= minDf)
    // under a Zipf vocabulary most tokens are singletons a minDf ≥ 2
    // discards — semi-join them away BEFORE paying the window/collect
    // (the final inner join would drop them anyway, after the work)
    val kept = if (minDf > 1L)
      grain.join(stats.select("token"), Seq("token"), "left_semi")
    else grain
    // rank-only window so WindowGroupLimit can pre-limit each partition
    // to maxPostings rows per token before the shuffle (the skew cap for
    // stopword-grade tokens); collect_list then assembles ≤ maxPostings
    // structs, sorted for determinism (collect order is scheduling-
    // dependent; array_sort on (doc_id, tf) structs is total — doc_id is
    // unique within a token group)
    val w = Window.partitionBy("token").orderBy("doc_id")
    val postings = kept
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPostings)
      .groupBy("token")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("tf")))),
        x => concat(x.getField("doc_id").cast("string"), lit(":"),
          x.getField("tf").cast("string"))), ",").as("postings"))
    stats.join(postings, Seq("token"))
      .select(col("token"), col("df"), col("tf_total"),
        (col("df") > maxPostings).as("truncated"), col("postings"))
  }
}
