package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-pair learning (Sennrich/Haddow/Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenizer-training stage of a corpus pipeline. The encode-side
  * cascade already exists (`TextStats.tokensBpe` / the `text_tokens`
  * query applies a FIXED merge table); this operator LEARNS the table
  * from the corpus.
  *
  * Representation: every symbol is exactly ONE character — initial
  * symbols are the word's characters, and each merge step mints a fresh
  * Unicode private-use atom chr(0xE000+step) for the merged symbol
  * (same PUA convention as `TextStats.bpeAtom`). That makes the symbol
  * sequence a plain string, adjacent-pair extraction a substring
  * window, and merge application a single `replace` whose
  * left-to-right non-overlapping semantics IS BPE's greedy merge order
  * — identical in Spark and DuckDB, so the oracle replays training
  * exactly (unrolled per-step CTEs). Assumes corpus text carries no
  * PUA characters (true of the synthetic corpus; a production run
  * would strip/remap them first).
  *
  * Per step: pair counts weighted by word frequency; winner = highest
  * count, ties broken by pair string ascending (deterministic in both
  * engines); stops early if no pair remains.
  *
  * 100 TB shape: the word-frequency vocab is Heaps-sublinear in corpus
  * size and is the ONLY distributed state; per-step pair counting is a
  * two-phase hash agg over ≤ |vocab|·(len-1) short pairs, the argmax is
  * a TakeOrdered partial top-1 (never a full sort), and the driver
  * pulls ONE row per step — a bounded model fit, the k-means
  * convention. Merge application is a narrow per-row `replace`. The
  * vocab's plan depth grows by one projection per step (K is small and
  * fixed); text itself is touched once, at vocab construction.
  */
object Bpe {

  /** Learn `merges` BPE merge pairs from the corpus word distribution.
    * Output: one row per learned merge, (step, lhs, rhs, n) — lhs/rhs
    * are the merged pair's two symbols expanded back to their surface
    * strings, n the frequency-weighted pair count that won the step. */
  def train(docs: DataFrame, textCol: String, merges: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(docs, textCol, merges)._1.toDF("step", "lhs", "rhs", "n")
  }

  /** The training loop shared by [[train]] and [[encode]]'s query
    * composition: returns the surface-expanded merge rows AND the raw
    * (pair, atom) replace table in step order — the cascade a tokenizer
    * applies verbatim. */
  def learn(docs: DataFrame, textCol: String, merges: Int)
      : (Seq[(Long, String, String, Long)], Seq[(String, String)]) = {
    // the ONLY corpus pass: persist the word-frequency vocab so each
    // step's collect recomputes just k narrow replaces over the cache
    // (the kmeansMicro convention), then release it after the loop
    val v0 = docs
      .select(explode(TextGrams.wordsExpr(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("word").as("symstr"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocab = v0
    // code-point keys, not Chars: both engines substring by code point,
    // so a winning pair may hold astral symbols (2 Java chars each)
    val expansion = scala.collection.mutable.Map[Int, String]()
    def expand(s: String): String = {
      val sb = new StringBuilder
      s.codePoints().forEach { cp =>
        sb.append(expansion.getOrElse(cp, new String(Character.toChars(cp))))
        ()
      }
      sb.toString
    }
    val out = scala.collection.mutable.Buffer[(Long, String, String, Long)]()
    val table = scala.collection.mutable.Buffer[(String, String)]()
    var k = 0
    var exhausted = false
    try {
      while (k < merges && !exhausted) {
        val best = vocab
          .select(col("freq"), explode(expr(
            "case when length(symstr) >= 2 then transform(" +
              "sequence(1, length(symstr) - 1), i -> substring(symstr, i, 2))" +
              " else array() end")).as("pair"))
          .groupBy("pair").agg(sum("freq").as("n"))
          .orderBy(desc("n"), asc("pair")).limit(1)
          .collect() // ONE row per step — the bounded model-fit pull
        if (best.isEmpty) exhausted = true
        else {
          val pair = best(0).getString(0)
          val n = best(0).getLong(1)
          val atom = (0xE000 + k).toChar
          val cps = pair.codePoints().toArray
          out += ((k.toLong,
            expand(new String(Character.toChars(cps(0)))),
            expand(new String(Character.toChars(cps(1)))), n))
          expansion(atom.toInt) = expand(pair)
          table += ((pair, atom.toString))
          vocab = vocab.select(
            replace(col("symstr"), lit(pair), lit(atom.toString)).as("symstr"),
            col("freq"))
          k += 1
        }
      }
    } finally { v0.unpersist(); () }
    (out.toSeq, table.toSeq)
  }

  /** Apply a learned merge table to the corpus: per-doc subword token
    * statistics (n_words, n_chars, n_tokens) — the tokenizer-cost /
    * compression-audit pass a training-data pipeline runs before
    * shard packing. The cascade is the same left-to-right `replace`
    * fold training used, inlined per WORD inside `transform` so the
    * whole encode is ONE narrow codegen'd projection — no explode, no
    * shuffle, no UDF; docs with no words keep a zero row. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      pairs: Seq[(String, String)]): DataFrame = {
    val cascade = (w: org.apache.spark.sql.Column) =>
      pairs.foldLeft(w) { case (acc, (p, a)) => replace(acc, lit(p), lit(a)) }
    docs.select(col(idCol), TextGrams.wordsExpr(textCol).as("ws"))
      .select(col(idCol),
        size(col("ws")).cast("long").as("n_words"),
        aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (a, x) => a + x).as("n_chars"),
        aggregate(transform(col("ws"), w => length(cascade(w)).cast("long")),
          lit(0L), (a, x) => a + x).as("n_tokens"))
  }

  /** The per-step training CTE chain over `v0(symstr, freq)` —
    * p$k (pair counts) / b$k (winning pair) / v${k+1} (merged vocab) —
    * shared by the train and encode oracles. */
  private def stepCtes(merges: Int): String =
    (0 until merges).map { k =>
      val prev = s"v$k"
      s"""p$k AS (
  SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM (
    SELECT freq, unnest(CASE WHEN length(symstr) >= 2
      THEN list_transform(range(1, length(symstr)), i -> substr(symstr, i, 2))
      ELSE [] END) AS pair FROM $prev) GROUP BY pair),
b$k AS (SELECT pair, n FROM p$k ORDER BY n DESC, pair LIMIT 1),
v${k + 1} AS (SELECT replace(symstr, (SELECT pair FROM b$k), chr(${0xE000 + k})) AS symstr, freq FROM $prev)"""
    }.mkString(",\n")

  /** The oracle twin of [[train]]: unrolled per-step DuckDB SQL
    * replaying the exact training algebra (`docsSql` = a
    * read_parquet(...) relation). Atom expansion is the descending-j
    * reverse-replace fold — atom_j's pair contains only atoms minted
    * before j, so one pass per atom fully expands. */
  def trainOracleSql(docsSql: String, textCol: String,
      merges: Int = 6): String = {
    def expandSql(inner: String, k: Int): String =
      (k - 1 to 0 by -1).foldLeft(inner) { (acc, j) =>
        s"replace($acc, chr(${0xE000 + j}), (SELECT pair FROM b$j))"
      }
    val steps = stepCtes(merges)
    val rows = (0 until merges).map { k =>
      val lhs = expandSql(s"substr((SELECT pair FROM b$k), 1, 1)", k)
      val rhs = expandSql(s"substr((SELECT pair FROM b$k), 2, 1)", k)
      // EXISTS guard replays the engine's EARLY STOP: a step with no
      // remaining pair emits no row (and its NULL-propagating replace
      // empties every later p$k, so all later steps drop out too)
      s"SELECT CAST($k AS BIGINT) AS step, $lhs AS lhs, $rhs AS rhs, (SELECT n FROM b$k) AS n" +
        s" WHERE EXISTS (SELECT 1 FROM b$k)"
    }.mkString("\nUNION ALL ")
    s"""
WITH w AS (
  SELECT unnest(list_filter(string_split($textCol, ' '), x -> x != '')) AS word FROM $docsSql
), v0 AS (
  SELECT word AS symstr, count(*) AS freq FROM w GROUP BY word
),
$steps
SELECT * FROM (
$rows
) ORDER BY step"""
  }

  /** Oracle twin of train-then-[[encode]]: the shared step chain learns
    * the merges, an m-chain replays the cascade over the DISTINCT word
    * map (word → merged string), and the per-doc stats join that map.
    * An early-stopped step's empty b$k would null the m-chain through
    * `replace(s, NULL, ..)` — the coalesce placeholder (a PUA char no
    * corpus word contains, distinct from every minted atom) makes such
    * a step a no-op instead, matching the engine's shorter cascade. */
  def encodeOracleSql(docsSql: String, idCol: String, textCol: String,
      merges: Int = 6): String = {
    val mChain = (0 until merges).map { k =>
      s"""m${k + 1} AS (SELECT word, replace(symstr,
    coalesce((SELECT pair FROM b$k), chr(${0xF8FF})), chr(${0xE000 + k})) AS symstr
  FROM m$k)"""
    }.mkString(",\n")
    s"""
WITH w AS (
  SELECT unnest(list_filter(string_split($textCol, ' '), x -> x != '')) AS word FROM $docsSql
), v0 AS (
  SELECT word AS symstr, count(*) AS freq FROM w GROUP BY word
),
${stepCtes(merges)},
m0 AS (SELECT DISTINCT word, word AS symstr FROM w),
$mChain,
tok AS (SELECT word, CAST(length(word) AS BIGINT) AS c,
               CAST(length(symstr) AS BIGINT) AS t FROM m$merges),
d AS (
  SELECT $idCol, unnest(list_filter(string_split($textCol, ' '), x -> x != '')) AS word FROM $docsSql
),
agg AS (
  SELECT $idCol, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(c) AS BIGINT) AS n_chars,
         CAST(sum(t) AS BIGINT) AS n_tokens
  FROM d JOIN tok USING (word) GROUP BY $idCol
)
SELECT doc.$idCol,
  coalesce(agg.n_words, CAST(0 AS BIGINT)) AS n_words,
  coalesce(agg.n_chars, CAST(0 AS BIGINT)) AS n_chars,
  coalesce(agg.n_tokens, CAST(0 AS BIGINT)) AS n_tokens
FROM $docsSql doc LEFT JOIN agg USING ($idCol)
ORDER BY $idCol"""
  }
}
