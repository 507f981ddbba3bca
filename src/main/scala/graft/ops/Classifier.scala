package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-trick linear text classifier INFERENCE [public technique:
  * Weinberger et al. 2009 "Feature Hashing for Large Scale Multitask
  * Learning"; the deployment shape of fastText-style quality
  * classifiers (Joulin et al. 2017) that CCNet/FineWeb-Edu run over
  * every crawl document; reference anchor: the reference's
  * `OcrQualityDictionary` gate (/root/reference/src/ocrmypdf/quality.py)
  * is the degenerate one-weight-per-known-word form of this].
  *
  * The model here is deterministic by construction (md5-derived
  * weights) so the DuckDB oracle replays inference bit-for-bit — the
  * engine-side point is the PLAN, which is exactly what a trained
  * model's inference needs:
  *
  *   - features: token → bucket h(token) = md5Pos("feat:", ·, D) — the
  *     hashing trick bounds the model at D weights no matter how large
  *     the vocabulary grows;
  *   - weights:  w(j) = md5Pos("w:", j, 1001) − 500 ∈ [−500, 500]
  *     milli-units, materialized as a D-row table (the stand-in for a
  *     trained coefficient vector);
  *   - score_milli(doc) = Σ_tokens tf · w(h(token)), exact BIGINT;
  *     label = score_milli > 0.
  *
  * 100 TB shape: tokens reduce to the (doc_id, feat, tf) grain by
  * two-phase hash agg — per-doc rows bounded by min(|doc|, D), never
  * vocabulary-sized; the weight table is D rows and BROADCAST onto the
  * grain (model inference must never shuffle the corpus against the
  * model); one exchange on doc_id produces the per-doc score. Docs
  * with no tokens survive the left join with score 0. */
object Classifier {

  /** (doc_id, n_tokens, score_milli, label) — one row per input doc. */
  def scoreLinear(docs: DataFrame, idCol: String, textCol: String,
      dims: Int = 1024): DataFrame = {
    val weights = docs.sparkSession.range(dims.toLong)
      .select(col("id").as("feat"),
        (TextGrams.md5Pos("w:", col("id").cast("string"), 1001L) - 500L)
          .as("w"))
    // project tokens straight to feature buckets BEFORE the grain
    // aggregation: grouping by (doc, token) first and re-grouping by
    // (doc, feat) would shuffle twice for the same result — the
    // hashing trick's collisions just sum either way
    val grain = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextGrams.wordsExpr(textCol)).as("token"))
      .select(col("doc_id"),
        TextGrams.md5Pos("feat:", col("token"), dims.toLong).as("feat"))
      .groupBy("doc_id", "feat").agg(count(lit(1)).as("tf"))
    val per = grain.join(broadcast(weights), Seq("feat"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"),
        sum(col("tf") * col("w")).as("score_milli"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_milli"), lit(0L)).as("score_milli"),
        (coalesce(col("score_milli"), lit(0L)) > 0L).as("label"))
  }
}
