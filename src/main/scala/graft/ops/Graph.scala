package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TextRank keyword extraction — PageRank (Page et al. 1999, damping
  * 0.85) over the word-adjacency graph of the corpus (Mihalcea &
  * Tarau 2004). The training-data use is corpus-level keyword/topic
  * surfacing; the engineering use is pinning the ITERATIVE-JOIN shape —
  * the one relational pattern (iterate: join rank→edges, re-aggregate)
  * that the rest of the suite's single-pass operators don't exercise.
  * The reference has no graph surface; its closest analog is the
  * dictionary quality model (quality.py) — corpus-derived token
  * importance.
  *
  * Exact-integer arithmetic in micro-units (determinism invariant —
  * no float ranks): r₀ = 1_000_000 for every node;
  *   rₜ₊₁(v) = 150000 + (850 · Σᵤ→ᵥ ((rₜ(u)·w(u,v)) div outw(u))) div 1000
  * with `div` the BIGINT truncating division both engines share. The
  * per-edge division loses ≤1 micro-unit per term — deterministic and
  * replayed identically by the DuckDB oracle (mass conservation is NOT
  * an invariant here, rank ORDER is).
  *
  * Graph construction: tokens ≥ 3 chars; an edge per adjacent pair
  * within a document (both directions — the graph is undirected);
  * self-loops dropped; edge weight = corpus-wide co-occurrence count.
  *
  * 100 TB shape: nodes are the FILTERED VOCABULARY (Heaps-law sublinear
  * in corpus size), edges its adjacency — the iteration shuffles
  * (token, rank) pairs, never documents. Edges feed every iteration
  * plus the out-weight table, so they carry a persist barrier; K is
  * fixed (5), so the lineage is a bounded 5-deep join tree (no
  * localCheckpoint needed at this depth).
  */
object Graph {

  private val DampMicroNum = 850L // 0.85 in milli  → ×rank div 1000
  private val BaseMicro = 150000L // 0.15 × 1_000_000

  /** Top-`k` tokens by `iters`-step integer PageRank over the
    * word-adjacency graph (see class doc). Output: (token, rank_micro),
    * ordered rank desc then token asc — fully deterministic. */
  def textRank(docs: DataFrame, textCol: String, iters: Int = 5,
      k: Int = 20): DataFrame = {
    val pairs = docs
      .select(TextGrams.wordsExpr(textCol).as("ws"))
      .select(explode(expr(
        "case when size(ws) >= 2 then transform(sequence(1, size(ws) - 1)," +
          " i -> struct(ws[i - 1] as s, ws[i] as t)) else array() end"))
        .as("p"))
      .select(col("p.s").as("s"), col("p.t").as("t"))
      .filter(length(col("s")) >= 3 && length(col("t")) >= 3 &&
        col("s") =!= col("t"))
    val und = pairs.unionAll(pairs.select(col("t").as("s"), col("s").as("t")))
    val edges = und.groupBy("s", "t").agg(count(lit(1)).as("w"))
      // barrier: edges feed the out-weight agg and all `iters` joins
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outw = edges.groupBy("s").agg(sum("w").as("outw"))
    val ej = edges.join(outw, Seq("s"))
      .select(col("s"), col("t"), col("w"), col("outw"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var rank = ej.select(col("s").as("token")).distinct()
      .withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      rank = ej.join(rank, ej("s") === rank("token"))
        .select(col("t"), expr("(rank * w) div outw").as("c"))
        .groupBy("t")
        .agg(sum("c").as("sc"))
        // Column./ is FLOAT division — the integer `div` keeps the
        // micro-unit arithmetic exact and oracle-replayable
        .select(col("t").as("token"),
          expr(s"${BaseMicro}L + ($DampMicroNum * sc) div 1000").as("rank"))
    }
    rank.select(col("token"), col("rank").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("token").asc)
      .limit(k)
  }
}
