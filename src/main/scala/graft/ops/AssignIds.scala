package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense ID assignment: every row gets a contiguous
  * 0-based BIGINT ordinal, a pure function of the key set — independent
  * of partitioning, scheduling, and input file layout [public
  * technique: the standard distributed prefix-sum enumeration, e.g.
  * Blelloch 1990 "Prefix Sums and Their Applications"; reference
  * anchor: the reference packs per-page artifacts by a stable
  * `{pageno:06d}` ordinal key (`_jobcontext.py:93-99`) — this is the
  * same need at corpus grain, where no pageno exists and the ordinal
  * must be manufactured deterministically].
  *
  * Global order is (md5 bucket of key, key) — a total, deterministic
  * order (NOT lexicographic by key; shuffling docs before training is a
  * feature). `zipWithIndex`/`monotonically_increasing_id` are the
  * non-answers here: both depend on partition layout, so two runs of
  * the same corpus would disagree — the north rule's determinism
  * invariant forbids them.
  *
  * 100 TB shape: bucket by md5 (uniform regardless of key skew — a
  * billion keys from one host spread like any others); per-bucket
  * counts (B rows) cumulate driver-side-free in a single tiny window
  * and broadcast back; the within-bucket rank shuffles each key once;
  * only (key, id) pairs move — never text. Keys MUST be unique (the
  * caller dedups first); duplicate keys would make the within-bucket
  * rank nondeterministic, so the output would silently depend on
  * scheduling — hence the distinct-count guard stays in the plan as a
  * deterministic per-bucket assertion, not a driver action. */
object AssignIds {

  def stableIds(docs: DataFrame, keyCol: String,
      buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // orig_key keeps the caller's native key type in the output; the
    // string cast exists only for the md5 coin and the ordering
    val t = docs
      .select(col(keyCol).as("orig_key"),
        col(keyCol).cast("string").as("key"))
      .withColumn("bucket",
        TextGrams.md5Pos("ids:", col("key"), buckets.toLong))
      // barrier: t feeds both the per-bucket counts and the rank join
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = t.groupBy("bucket")
      .agg(count(lit(1)).as("bn"), count_distinct(col("key")).as("bd"))
      // unique-key contract, asserted distributed (ANSI mode turns the
      // failed assertion into a task error, never a silent wrong id)
      .withColumn("bn", when(assert_true(col("bn") === col("bd"),
        lit(s"AssignIds: duplicate values in key column '$keyCol'")).isNull,
        col("bn")))
      .withColumn("offset", coalesce(
        sum(col("bn")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    t.join(broadcast(offsets), Seq("bucket"))
      .withColumn("new_id", col("offset") +
        row_number().over(
          Window.partitionBy("bucket").orderBy("key")).cast("long") - 1L)
      .select(col("orig_key").as(keyCol), col("new_id"))
  }
}
