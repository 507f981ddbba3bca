package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch [public technique: Flajolet,
  * Fusy, Gandouet & Meunier 2007 "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm"; reference anchor:
  * like [[CountMin]], the reference's summaries
  * (`report_output_file_size`, /root/reference/src/ocrmypdf/_pipeline.py
  * metrics) are exact because its corpora are one document — at 10^12
  * rows "how many distinct pages/hosts" must be a mergeable sketch,
  * not a count(distinct) that shuffles every value].
  *
  * Integer-exact formulation (the determinism invariant bans float
  * accumulation, and the DuckDB oracle must replay every bit):
  *
  *   - 60-bit value hash: the first 15 md5 hex digits of the value
  *     (both engines share `conv/from-hex` on md5 — the coin idiom);
  *   - bucket  = top 8 bits (m = 256 registers), remainder r = low
  *     52 bits;
  *   - rank    = position of r's leftmost 1-bit from the MSB of the
  *     52-bit field = 53 − length(bin(r)), and 53 when r = 0 — both
  *     engines spell `length(bin(r))`, no float log2;
  *   - register M_j = max rank per bucket (0 for never-hit buckets);
  *   - sum_inv = Σ_j 2^(53−M_j) — the harmonic denominator scaled by
  *     2^53 so it is an exact BIGINT (≤ 256·2^53 < 2^62);
  *   - raw_est = ⌊α_ppm · m² · 2^53 / sum_inv / 10^6⌋ with the product
  *     carried in DECIMAL(38) (HUGEINT in DuckDB) — α_256 =
  *     0.7213/(1 + 1.079/256) = 0.718273 (ppm, truncated).
  *
  * The raw HLL estimator only (no small-range linear-counting switch:
  * m·ln(m/V) needs a float log; `n_zero` rides along so a consumer can
  * SEE when the raw estimate is in the biased small-range regime).
  * `exact_distinct` is the test-scale admissibility exhibit, same role
  * as CountMin's exact column — a 100 TB run drops it.
  *
  * 100 TB shape: the ONLY aggregation state is (group, bucket) →
  * max(rank): 256 rows per group regardless of corpus size, built with
  * one shuffle of compact keys after map-side partial max; the
  * register table is then densified against a generated 256-row bucket
  * spine (broadcast — it is a literal range) so never-hit buckets
  * contribute their 2^53 terms, and the estimator is a per-group
  * aggregate over ≤ 256·groups rows. Registers are also mergeable
  * across shards/streams by the same max — the sketch property that
  * motivates HLL over count(distinct). */
object Hll {

  private val P = 8            // bucket bits → m = 256 registers
  private val M = 1 << P
  private val RBITS = 60 - P   // 52-bit remainder field
  private val ALPHA_PPM = 718273L // α_256 = 0.7213/(1+1.079/256), ppm

  /** Dense per-group register table (grp, bucket, mj) — 256 rows per
    * group, never-hit buckets at mj = 0. This is the MERGEABLE
    * artifact: the registers of a corpus union are the element-wise
    * MAX of the shards' registers (max is idempotent, commutative and
    * associative — the property that lets shards, days, or streaming
    * micro-batches sketch independently and combine later), pinned by
    * the OpsSpec merge test. */
  def registers(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    // 60-bit md5 hash → (bucket, rank); all-narrow until the 256·G-row
    // register aggregation (map-side partial max does the reduction)
    val hashed = df.select(col(grpCol).as("grp"),
      conv(substring(md5(col(valCol).cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
    // Column./ is FLOAT division (doubles lose bits past 2^53 — a
    // 60-bit hash would mis-bucket); shiftright is the exact top-8-bits
    val ranked = hashed.select(col("grp"),
      shiftright(col("h"), RBITS).as("bucket"),
      pmod(col("h"), lit(1L << RBITS)).as("r"))
      .select(col("grp"), col("bucket"),
        when(col("r") === 0L, lit(RBITS + 1))
          .otherwise(lit(RBITS + 1) - length(bin(col("r")))).as("rank"))
    val regs = ranked.groupBy("grp", "bucket").agg(max("rank").as("mj"))
    // densify against the 256-bucket spine so empty buckets carry M=0
    // (their 2^53 harmonic terms are what keeps the estimator honest
    // on sparse groups); the spine is a literal range — broadcast join
    val spine = df.select(col(grpCol).as("grp")).distinct()
      .select(col("grp"), explode(sequence(lit(0), lit(M - 1))).as("bucket"))
    spine.join(regs, Seq("grp", "bucket"), "left")
      .select(col("grp"), col("bucket"),
        coalesce(col("mj"), lit(0)).as("mj"))
  }

  /** Per-`grpCol` HLL over distinct values of `valCol`:
    * (grp, n_zero, sum_inv, raw_est, regs_md5, exact_distinct). */
  def distinctSketch(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val dense = registers(df, grpCol, valCol)
    val est = dense.groupBy("grp")
      .agg(sum(when(col("mj") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(expr(s"shiftleft(1L, ${RBITS + 1} - mj)")).as("sum_inv"),
        // the registers in bucket order, digested — the mergeable
        // artifact a shard would actually ship
        md5(array_join(transform(array_sort(collect_list(
          struct(col("bucket"), col("mj")))), s => s("mj").cast("string")),
          ",").cast("binary")).as("regs_md5"))
      .select(col("grp"), col("n_zero"), col("sum_inv"),
        expr(s"cast((cast($ALPHA_PPM as decimal(38,0)) * ${M.toLong * M} " +
          s"* ${1L << (RBITS + 1)}) div sum_inv div 1000000 as bigint)")
          .as("raw_est"),
        col("regs_md5"))
    // test-scale admissibility exhibit (the exact groupBy over raw
    // values is precisely what the sketch avoids at 100 TB)
    val exact = df.groupBy(col(grpCol).as("grp"))
      .agg(countDistinct(col(valCol)).as("exact_distinct"))
    est.join(exact, Seq("grp"))
  }
}
