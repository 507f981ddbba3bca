package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-snapshot crawl lifecycle: what changed between two captures of
  * the same site space, and which re-captures are byte-identical
  * revisits.
  *
  * Reference twin: the output-side freshness policy — the reference
  * skips work whose prior output already matches
  * (src/ocrmypdf/_pipeline.py:352-372 `is_ocr_required` consults the
  * prior-text state per page, and copy_final only replaces output when
  * processing produced something new). At crawl scale those same two
  * questions are per-URL across snapshots: "did this page change since
  * the last crawl?" ([[diff]]) and "is this capture identical to one we
  * already hold?" ([[revisits]], WARC's revisit record type, ISO
  * 28500-2017 §6.7.2).
  *
  * 100 TB shape: both operators move only (url, 32-hex digest) keys —
  * never text. [[diff]] is one full-outer shuffle join on url (both
  * sides are snapshot-sized: no broadcast pretense). [[revisits]] is
  * one window over (url, digest) — partition count = capture count,
  * no skew beyond per-url capture multiplicity (bounded by crawl
  * cadence).
  */
object Snapshots {

  /** Per-url diff of two snapshots, each (urlCol, digestCol):
    * `status` ∈ added | removed | changed | unchanged, with both
    * digests riding along ('' when the side is absent). One row per
    * url present in either side. Digest comparison is null-safe
    * (two present-but-null digests read `unchanged`, null vs value
    * reads `changed`); a null digest never reads as side-absent. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, urlCol: String,
      digestCol: String): DataFrame = {
    // presence is keyed off an explicit per-side marker, NOT digest
    // nullity — a snapshot carrying a null digest (fetch-failed
    // capture) must not read as side-absent
    val o = oldSnap.select(col(urlCol).as("url"),
      col(digestCol).as("old_digest"), lit(true).as("in_old"))
    val n = newSnap.select(col(urlCol).as("url"),
      col(digestCol).as("new_digest"), lit(true).as("in_new"))
    o.join(n, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_new").isNull, lit("removed"))
          .when(col("old_digest") <=> col("new_digest"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        coalesce(col("old_digest"), lit("")).as("old_digest"),
        coalesce(col("new_digest"), lit("")).as("new_digest"))
  }

  /** WARC revisit typing over a capture log (urlCol, tsCol, digestCol):
    * within one url, the FIRST capture of each distinct payload digest
    * is a `response`; every later capture with that same digest is a
    * `revisit` carrying `refers_to_ts` = the first capture's timestamp
    * (a changed payload starts a new response lineage — CC's
    * identical-payload-digest revisit profile). Precondition: (url, ts)
    * is a key of the capture log (a crawler writes one record per
    * fetch), so the within-partition order is total and reruns are
    * stable. */
  def revisits(captures: DataFrame, urlCol: String, tsCol: String,
      digestCol: String): DataFrame = {
    // the window reads the RENAMED projection below, not the caller's
    // column names
    val w = Window.partitionBy(col("url"), col("digest"))
      .orderBy(col("ts"))
    captures.select(col(urlCol).as("url"), col(tsCol).as("ts"),
      col(digestCol).as("digest"))
      .withColumn("first_ts", first(col("ts")).over(w))
      .select(col("url"), col("ts"), col("digest"),
        when(col("ts") === col("first_ts"), lit("response"))
          .otherwise(lit("revisit")).as("record_type"),
        when(col("ts") === col("first_ts"), lit(null).cast("timestamp"))
          .otherwise(col("first_ts")).as("refers_to_ts"))
  }
}
