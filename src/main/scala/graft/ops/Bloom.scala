package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter benchmark decontamination [public technique: Bloom 1970
  * "Space/time trade-offs in hash coding with allowable errors"; applied
  * to training-data decontamination as in Brown et al. 2020 §C — the
  * n-gram overlap flagging that [[CorpusStats.decontaminate]] computes
  * exactly].
  *
  * Why a second decontaminate: the exact form broadcasts the DISTINCT
  * benchmark gram set, which grows linearly with the benchmark suite. A
  * production decontamination run probes against EVERY eval suite at
  * once (hundreds of benchmarks × all their n-grams); the Bloom form
  * caps the broadcast state at exactly `m` bits no matter how many
  * grams feed it, at the price of a tunable false-POSITIVE rate. False
  * negatives are impossible (every inserted gram sets all its bits), so
  * the filter is admissible for contamination screening: everything the
  * exact form flags, this flags — `bloom_hits >= n_hits` row-by-row —
  * and flagged docs can be re-checked exactly downstream on the tiny
  * flagged slice (the classic two-tier screen).
  *
  * Determinism & oracle: bit position i of gram g is the first 8 md5
  * hex digits of "bloom:<i>:<g>" mod m — the same md5-coin idiom as
  * [[CountMin]] and the samplers, so DuckDB replays the identical
  * filter. The oracle checks membership against the position SET
  * (`pos IN bench_positions`) while the engine tests bits in the packed
  * words — two strategies, one semantics; packing is lossless.
  *
  * 100 TB shape: the packed filter is ≤ m/64 (word, bits) rows built by
  * one two-phase aggregation over the benchmark (map-side bit_or does
  * the heavy lifting) and joined BROADCAST — corpus-side probing is a
  * narrow map-side join of compact (16-byte gram, k positions) rows;
  * the only corpus exchanges carry (doc_id, gram) compact keys, text
  * never moves. Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; the
  * defaults (m = 2^20, k = 4) hold ~1e-3 at n ≈ 50k benchmark grams —
  * grow m with the benchmark suite, the broadcast stays m/8 bytes. */
object Bloom {

  /** Bit position i of a gram: first 8 md5 hex digits of
    * "bloom:<i>:<gram>" mod m — DuckDB-replayable. Gram and coin algebra
    * live in [[TextGrams]], the shared owner with CorpusStats/CountMin:
    * the admissibility guarantee vs the exact decontaminate requires
    * both forms to hash the IDENTICAL grams. */
  private def posCol(gram: Column, i: Int, m: Int): Column =
    TextGrams.md5Pos(s"bloom:$i:", gram, m.toLong)

  private def wordsExpr(textCol: String) = TextGrams.wordsExpr(textCol)

  private def wordGramsExpr(n: Int) = TextGrams.wordGramsExpr(n)

  /** The packed filter: ≤ m/64 rows of (word = pos div 64,
    * bits = OR of 1L << (pos mod 64)) over all k positions of every
    * gram in `grams(gramCol)`. Constant-bounded state — the whole point. */
  def packedFilter(grams: DataFrame, gramCol: String, m: Int,
      k: Int): DataFrame = {
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = (0 until k).map(i => posCol(col(gramCol), i, m))
    grams
      .select(explode(array(pos: _*)).as("pos"))
      .groupBy(expr("pos div 64").as("word"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").as("bits"))
  }

  /** Per-doc Bloom contamination flags against the benchmark table:
    * (doc_id, bloom_hits, contaminated_bloom). `bloom_hits` counts the
    * doc's DISTINCT n-grams whose k filter bits are all set — a
    * guaranteed superset of the exact [[CorpusStats.decontaminate]]
    * hits. Rows are never dropped. */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8,
      m: Int = 1 << 20, k: Int = 4): DataFrame = {
    val benchGrams = bench
      .select(wordsExpr(benchTextCol).as("ws"))
      .select(explode(wordGramsExpr(n)).as("gh"))
      .distinct()
    val packed = packedFilter(benchGrams, "gh", m, k)
    val pos = (0 until k).map(i => posCol(col("gh"), i, m))
    val probes = docs
      .select(col(idCol).as("doc_id"), wordsExpr(textCol).as("ws"))
      .select(col("doc_id"), explode(wordGramsExpr(n)).as("gh"))
      // dedup (doc_id, gram) BEFORE the ×k position explode and the
      // probe join: a doc repeating a boilerplate gram r times would
      // otherwise carry r·k join rows instead of k (the downstream
      // groupBy would still fix the answer, but not the shuffle bill)
      .distinct()
      .select(col("doc_id"), col("gh"), explode(array(pos: _*)).as("pos"))
      .withColumn("word", expr("pos div 64"))
      // an absent word row means no benchmark gram touched that word —
      // the bit is 0 and the gram cannot be a member
      .join(broadcast(packed), Seq("word"), "left")
      .withColumn("bit_set", coalesce(
        col("bits").bitwiseAND(
          expr("shiftleft(1L, cast(pos % 64 as int))")) =!= lit(0L),
        lit(false)))
    val gramHits = probes
      .groupBy("doc_id", "gh") // regroups the k per-position rows
      .agg(expr("bool_and(bit_set)").as("hit")) // member iff ALL k bits set
    val perDoc = gramHits.filter(col("hit"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("bloom_hits"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bloom_hits"), lit(0L)).as("bloom_hits"),
        (coalesce(col("bloom_hits"), lit(0L)) > 0).as("contaminated_bloom"))
  }
}
