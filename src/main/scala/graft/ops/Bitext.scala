package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL-parallel bitext candidate mining [public technique: Resnik 1999
  * "Mining the Web for Bilingual Text" and the ParaCrawl/CCMatrix
  * pipeline's URL-matching pre-step — pages of one site whose URLs
  * differ only in a language path marker are translation candidates
  * long before any content comparison runs]. The reference twin is the
  * language-resolution stamp the postprocess stage writes
  * (/root/reference/src/ocrmypdf/_metadata.py lang fixup) — here the
  * language marker is lifted OUT of the identity so cross-language
  * siblings collide.
  *
  * Rule (pinned by the unit + oracle): the FIRST path segment is a
  * language marker when it matches `xx` or `xx-yy` (two lowercase
  * letters, optional two-letter region); the stripped path (marker
  * removed, '/' kept) plus the host is the pairing key. Output: one
  * row per (host, stripped path) group with ≥ 2 DISTINCT markers —
  * n_langs, the sorted comma-joined marker list, and the group's
  * lowest url as the anchor.
  *
  * 100 TB shape: one narrow marker/strip projection, one two-phase agg
  * on compact (host, path) keys; urls ride only into min()/
  * collect-free sorted-join of markers (array_sort over a collect_set
  * whose size is bounded by the language inventory, ~100 — never
  * corpus-bounded). */
object Bitext {

  private val marker = "^/([a-z]{2}(?:-[a-z]{2})?)(/.*)?$"

  /** Candidate groups over (urlCol) — see class doc. */
  def urlParallelCandidates(pages: DataFrame, urlCol: String): DataFrame = {
    val path = Urls.pathOf(urlCol)
    val lang = regexp_extract(path, marker, 1)
    val rest = regexp_extract(path, marker, 2)
    pages.select(col(urlCol).as("url"), Urls.hostOf(urlCol).as("host"),
        lang.as("lang_marker"),
        when(lang =!= "", when(rest === "", lit("/")).otherwise(rest))
          .otherwise(path).as("stripped_path"))
      .filter(col("lang_marker") =!= "")
      .groupBy("host", "stripped_path")
      .agg(countDistinct(col("lang_marker")).as("n_langs"),
        array_join(array_sort(collect_set(col("lang_marker"))), ",")
          .as("langs"),
        min(col("url")).as("anchor_url"))
      .filter(col("n_langs") >= 2)
  }
}
