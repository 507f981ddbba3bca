package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline. All of these
  * are built from codegen'd Catalyst builtins (md5 / higher-order array
  * functions / hash-joins) — no Scala UDF in the candidate-generation hot
  * path, so every stage stays inside WholeStageCodegen and scales by
  * shuffle on compact keys (hashes), never on full documents.
  *
  * Scale design (100 TB): every pairwise candidate generator here works by
  * emitting a SMALL key per document (md5 text hash, minhash band hashes,
  * simhash bands) and shuffling only (key, doc_id) pairs — document text
  * never moves through a join. Skewed keys (e.g. empty-text clusters) are
  * bounded by the `maxBucket` guard.
  */
object Dedup {

  /** Character shingles: 8-grams every 4 chars, 1-based positions —
    * exactly mirrorable in DuckDB as
    * list_transform(range(1, greatest(length(t)-7,1)+1, 4), i -> substr(t,i,8)). */
  def shinglesExpr(textCol: String): Column =
    expr(s"transform(sequence(1, greatest(length($textCol)-7, 1), 4), i -> substring($textCol, i, 8))")

  /** MinHash signature: k permutations simulated by seeded md5; the min is
    * taken lexicographically over hex strings (identical semantics in any
    * SQL engine with md5 — the cross-engine determinism requirement). */
  def minhashExpr(shinglesCol: String, k: Int): Column =
    expr(s"transform(sequence(0, ${k - 1}), s -> array_min(transform($shinglesCol, x -> md5(concat(cast(s as string), ':', x)))))")

  /** Exact dedup: group by content hash. Returns one row per distinct
    * content: (h, n, keep_id) — keep the smallest id (deterministic). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** MinHash + LSH near-dup candidates. k minhashes, `bands` bands of
    * k/bands rows each. Returns (doc_a, doc_b, est_jaccard) for pairs
    * sharing ≥1 band, est_jaccard = fraction of equal minhashes.
    *
    * Shuffle profile: explode to (band_idx, band_hash, id) — k/bands
    * strings per doc — then a self-join on the band key. At 10^12 docs
    * the band table is ~4×10^12 short rows, hash-partitioned by band
    * key; the join never touches document text. `maxBucket` caps
    * pathological buckets (e.g. boilerplate-identical docs) to bound the
    * quadratic blowup — the skew guard. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 4, maxBucket: Int = 50): DataFrame = {
    val rows = k / bands
    val sig = docs
      .select(col(idCol).as("id"), shinglesExpr(textCol).as("sh"))
      .select(col("id"), minhashExpr("sh", k).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> md5(array_join(slice(sig, b*$rows+1, $rows), '|')))")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    // skew guard: drop buckets larger than maxBucket (counted exactly).
    // persist() materializes the signatures once: without the barrier,
    // Catalyst inlines the k×shingles md5 tree into BOTH join sides and
    // into est_jaccard, recomputing it ~6× per row. At warehouse scale
    // this persist is a real signature table (write once, join many).
    val sized = banded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("bucket_n") <= maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sized.select(col("band_idx"), col("band_hash"),
      col("id").as("doc_a"), col("sig").as("sig_a"))
    val b = sized.select(col("band_idx"), col("band_hash"),
      col("id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / cast($k as double)")
          .as("est_jaccard"))
      .distinct()
  }

  /** Exact n-gram Jaccard for near-dup verification: candidate pairs from
    * a shared distinct shingle, exact |∩|/|∪| over distinct shingles.
    * Quadratic in bucket size — apply AFTER an LSH prefilter at scale;
    * exposed standalone for small candidate sets and for the oracle. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double = 0.5, maxBucket: Int = 100): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(shinglesExpr(textCol))).as("sh"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val bucketed = sh.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("sh"))))
      .filter(col("bucket_n") <= maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inter = bucketed.select(col("sh"), col("id").as("doc_a"))
      .join(bucketed.select(col("sh"), col("id").as("doc_b")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes; each
    * bit votes ±1, sign → bit). Computed as a single deterministic scalar
    * pass per document. Near-dup pairs = equal 16-bit band (4 bands) +
    * Hamming distance ≤ `maxHamming`. */
  val simhashScalar: String => Long = { text =>
    val counts = new Array[Int](64)
    if (text != null) {
      var start = 0
      val n = text.length
      while (start < n) {
        while (start < n && text.charAt(start) == ' ') start += 1
        var end = start
        while (end < n && text.charAt(end) != ' ') end += 1
        if (end > start) {
          // xxhash64-compatible seed mix not required: any fixed 64-bit
          // hash works; use a splitmix64 of the token's FNV hash.
          var h = 1469598103934665603L
          var i = start
          while (i < end) { h = (h ^ text.charAt(i)) * 1099511628211L; i += 1 }
          var z = h + 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          var b = 0
          while (b < 64) {
            if (((z >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = end
      }
    }
    var sh = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sh |= (1L << b); b += 1 }
    sh
  }

  def simhash(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val f = udf(simhashScalar)
    val sh = docs.select(col(idCol).as("id"), f(col(textCol)).as("simhash"))
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> (simhash >> (b*16)) & 65535)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val a = banded.select(col("band_idx"), col("band_val"),
      col("id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("cast(bit_count(sh_a ^ sh_b) as bigint)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
