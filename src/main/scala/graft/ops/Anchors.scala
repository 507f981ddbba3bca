package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Anchor-text document expansion (public technique: anchor-augmented
  * document representations — Craswell et al. 2001, the TREC anchor-text
  * tracks): a page's representation is extended with the anchor texts of
  * its INBOUND links, which describe the page in other authors' words.
  * Chrome (navigational) anchors are kept — they still describe their
  * target, the classic anchor-text indexing choice; SELF-links are
  * dropped (a page's own anchor adds nothing to its representation).
  *
  * 100 TB shape: anchors reduce to compact (canon, anchor, n) rows in a
  * two-phase count agg (hot targets collapse map-side) before the
  * per-target cap window, and the joined string is bounded by
  * `maxAnchors`; page TEXT rides only the final url-keyed left join,
  * never the anchor aggregation. */
object Anchors {

  /** `pages(urlCol, textCol)` × `links(srcCol, resolvedCol, anchorCol)`
    * → (url, n_anchors, expanded_text): text extended with the top
    * `maxAnchors` inbound anchors on the shared canonical key, count
    * DESC / anchor ASC (deterministic), rank-ordered in the joined
    * string via array_sort over (rank, anchor) structs. Pages with no
    * inbound anchors pass through with n_anchors = 0. */
  def expandByCanon(pages: DataFrame, urlCol: String, textCol: String,
      links: DataFrame, srcCol: String, resolvedCol: String,
      anchorCol: String, maxAnchors: Int = 5): DataFrame = {
    val anchors = links
      .filter(col(anchorCol) =!= "")
      .select(Urls.canon(srcCol).as("src_canon"),
        Urls.canon(resolvedCol).as("canon"),
        col(anchorCol).as("anchor"))
      .filter(col("src_canon") =!= col("canon"))
      .groupBy("canon", "anchor").agg(count(lit(1)).as("n"))
    val top = anchors.withColumn("rk",
        row_number().over(Window.partitionBy(col("canon"))
          .orderBy(col("n").desc, col("anchor"))))
      .filter(col("rk") <= maxAnchors)
    val agg = top.groupBy("canon").agg(
      count(lit(1)).cast("long").as("n_anchors"),
      expr("array_join(transform(array_sort(collect_list(struct(rk, anchor))), x -> x.anchor), ' ')")
        .as("anchors_txt"))
    pages.select(col(urlCol).as("url"), Urls.canon(urlCol).as("canon"),
        coalesce(col(textCol), lit("")).as("text"))
      .join(agg, Seq("canon"), "left")
      .select(col("url"),
        coalesce(col("n_anchors"), lit(0L)).as("n_anchors"),
        when(col("anchors_txt").isNull, col("text"))
          .otherwise(concat(col("text"), lit(" "), col("anchors_txt")))
          .as("expanded_text"))
  }
}
