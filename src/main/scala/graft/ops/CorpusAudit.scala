package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-composition audits — the "what is actually in this mixture"
  * analytics a training-data curation run reports before sampling
  * weights are chosen (the data-mixing audit shape of C4/Pile/Dolma
  * dataset cards; the reference's analog is its output-size /
  * quality-ratio reporting, `_validation.py:282-337` and
  * `quality.py:12-44` — corpus-level summary metrics, not per-doc
  * transforms).
  *
  * Everything is exact integer arithmetic on compact keys (16-byte md5
  * grams, token strings) — text never joins, and both operators are a
  * handful of two-phase hash aggs.
  */
object CorpusAudit {

  /** Pairwise source-overlap matrix: for every source pair, the number
    * of distinct word-8-grams they share and the exact gram-set Jaccard
    * in milli-units. The gram grain is `(source, gram) DISTINCT` —
    * bounded by |sources| × distinct-grams, so the gh-keyed self-join
    * fans out at most |sources|² rows per gram (sources are a curated
    * small set; the per-gram fan-out is structurally bounded, unlike a
    * doc-keyed join). Grain persisted: it feeds the per-source counts
    * AND both sides of the pair join. */
  def sourceOverlap(docs: DataFrame, textCol: String, srcCol: String,
      n: Int = 8): DataFrame = {
    // spread on the text key (no unique id in this operator's contract;
    // text is near-unique — a deterministic, near-uniform key) so the
    // md5-per-gram explode never serializes on one scan split
    val grain = Par.spread(docs
      .select(col(srcCol).as("source"), col(textCol).as("so_text")), "so_text")
      .select(col("source"), TextGrams.wordsExpr("so_text").as("ws"))
      .select(col("source"), explode(TextGrams.wordGramsExpr(n)).as("gh"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perSrc = grain.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val shared = grain.select(col("source").as("src_a"), col("gh"))
      .join(grain.select(col("source").as("src_b"), col("gh")), Seq("gh"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
    shared
      .join(perSrc.select(col("source").as("src_a"), col("n_grams").as("n_a")),
        Seq("src_a"))
      .join(perSrc.select(col("source").as("src_b"), col("n_grams").as("n_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("shared"),
        expr("1000 * shared div (n_a + n_b - shared)").as("jaccard_milli"))
  }

  /** Heaps-law vocabulary-growth curve: scan the corpus in doc_id order
    * split into `buckets` equal id ranges, and report per bucket the
    * token occurrences, the NEW distinct tokens first seen there, and
    * the cumulative vocabulary size. First-occurrence is an exact
    * `min(doc_id)` per token (one hash agg — no sequential scan; the
    * "order" is arithmetic on the id, not a sort of the corpus). The
    * doc-count for bucket width is a one-row broadcast cross join (the
    * tf-idf corpus-N convention). */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextGrams.wordsExpr(textCol)).as("token"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.agg((max(col(idCol).cast("long")) + 1).as("n_docs"))
    def bucketOf(c: String) =
      expr(s"least($buckets - 1, $c * $buckets div n_docs)")
    val occ = toks.crossJoin(broadcast(nDocs))
      .groupBy(bucketOf("doc_id").as("bucket"))
      .agg(count(lit(1)).as("occurrences"))
    val firsts = toks.groupBy("token").agg(min("doc_id").as("first_doc"))
      .crossJoin(broadcast(nDocs))
      .groupBy(bucketOf("first_doc").as("bucket"))
      .agg(count(lit(1)).as("new_tokens"))
    occ.join(firsts, Seq("bucket"), "left")
      .select(col("bucket"), col("occurrences"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab",
        sum("new_tokens").over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
