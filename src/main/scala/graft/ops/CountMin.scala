package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch heavy hitters [public technique: Cormode &
  * Muthukrishnan 2005 "An Improved Data Stream Summary: The Count-Min
  * Sketch and its Applications"; reference anchor: the reference's
  * metrics/quality summaries (`report_output_file_size`,
  * `OcrQualityDictionary`) are exact because its corpora are one
  * document — at 10^12 documents the frequency summary must be a
  * sketch].
  *
  * Sketch: a depth × width counter table; token t increments counter
  * (d, h_d(t)) for each of the `depth` independent hash rows; the
  * estimate is the MIN over rows — always ≥ the true count, within
  * εN with probability 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * Determinism & oracle: h_d(t) = first 8 md5 hex digits of
  * "cms:<d>:<t>" mod width — the same md5-coin idiom as the samplers,
  * so DuckDB replays the identical table bit-for-bit.
  *
  * 100 TB shape: the counter table is the ONLY aggregation state —
  * depth·width rows regardless of corpus size, built with one shuffle
  * of (d, pos) compact keys (map-side partial counts do the heavy
  * lifting); probes join against the BROADCAST counter table. The
  * exact count column in [[heavyHitters]] exists to exhibit the
  * admissibility bound (est ≥ exact) at test scale — a production
  * 100 TB run drops it (that groupBy over raw tokens is precisely what
  * the sketch avoids). */
object CountMin {

  private def posCol(tok: Column, d: Int, width: Int): Column =
    TextGrams.md5Pos(s"cms:$d:", tok, width.toLong)

  /** Counter table (d, pos, c) — depth·width rows max. `tokens` is one
    * token per row in `tokCol`. */
  def sketch(tokens: DataFrame, tokCol: String, depth: Int = 4,
      width: Int = 2048): DataFrame = {
    val dps = (0 until depth).map { d =>
      struct(lit(d).as("d"), posCol(col(tokCol), d, width).as("pos"))
    }
    tokens
      .select(explode(array(dps: _*)).as("dp"))
      .groupBy(col("dp.d").as("d"), col("dp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `probes` (one token per row in `probeCol`):
    * → (token, est). The sketch side is broadcast. */
  def estimate(cms: DataFrame, probes: DataFrame, probeCol: String,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    val dps = (0 until depth).map { d =>
      struct(lit(d).as("d"), posCol(col(probeCol), d, width).as("pos"))
    }
    probes
      .select(col(probeCol).as("token"))
      .distinct()
      .select(col("token"), explode(array(dps: _*)).as("dp"))
      .select(col("token"), col("dp.d").as("d"), col("dp.pos").as("pos"))
      .join(broadcast(cms), Seq("d", "pos"), "left")
      .groupBy("token")
      // an absent counter means zero occurrences hashed there
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Top-k whitespace tokens of `textCol` by CM estimate, with the
    * exact count alongside (test-scale admissibility exhibit — the
    * sketch property est ≥ exact must hold on every row). */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int = 20,
      depth: Int = 4, width: Int = 2048): DataFrame = {
    // tokens is the FORK (sketch build + exact counts + probes): the
    // persist barrier keeps the scan+split+explode subtree single-shot
    // (the Dedup/CorpusStats signature-table convention)
    val tokens = docs.select(explode(expr(
      s"filter(split($textCol, ' '), x -> x != '')")).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cms = sketch(tokens, "token", depth, width)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("exact"))
    estimate(cms, tokens, "token", depth, width)
      .join(exact, Seq("token"))
      .orderBy(col("est").desc, col("token").asc)
      .limit(k)
  }
}
