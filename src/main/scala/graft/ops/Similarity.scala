package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (Array[Float]).
  *
  * The dot product / norm are sequential left-to-right folds over the
  * array in DOUBLE precision (`aggregate(zip_with(...))`) — bit-for-bit
  * reproducible and exactly mirrorable in the DuckDB oracle
  * (list_dot_product over ::DOUBLE[] lists). Everything is Catalyst
  * builtins — codegen'd, no UDF.
  *
  * Scale paths:
  *  - bruteForceTopK: O(N·Q) — correct baseline; broadcast the query side
  *    (queries ≪ corpus always holds for ANN serving).
  *  - ivfTopK: coarse quantizer (C centroids) + probe `nprobe` cells —
  *    the shuffle moves only (cell, id, vec) once at assignment; queries
  *    probe a fraction nprobe/C of the corpus.
  */
object Similarity {

  /** Sequential double-precision dot product of two float-array columns. */
  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")

  def norm(a: String): Column =
    sqrt(expr(s"aggregate($a, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))"))

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide). Deterministic ordering:
    * (cos DESC, neighbor id ASC). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
      .withColumn("cn", norm("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", norm("qv"))
    // broadcast the QUERY side: the corpus is the 10^9-row side at scale,
    // so it stays partitioned and each task scores its slice against the
    // broadcast queries; WindowGroupLimit then takes partial top-k per
    // partition before the (tiny) shuffle on query_id
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", dot("qv", "cv") / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** As bruteForceTopK, but scoring through the native codegen'd
    * `cosine_sim` expression (graft.functions.CosineSim) — one fused loop
    * per pair instead of three HOF folds; results are bit-identical. */
  def bruteForceTopKNative(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("cos", expr("cosine_sim(qv, cv)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** IVF-flat ANN: centroids = the `centroids` lowest-id corpus vectors
    * (deterministic "training" — a k-means step can replace this without
    * changing the dataflow). Each corpus vector is assigned to its
    * nearest centroid; a query probes the `nprobe` nearest cells and
    * reranks exactly within them. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol).asc).limit(centroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
      .withColumn("cent_n", norm("cent_v"))
    def assign(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(id)).orderBy(col("ccos").desc, col("cent_id").asc)
      df.join(broadcast(cents), expr("true"))
        .withColumn("ccos", dot(v, "cent_v") / (norm(v) * col("cent_n")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cent_v", "cent_n", "ccos", "crank")
    }
    val assigned = assign(
      corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv")),
      "nbr_id", "cv", 1)
      .withColumn("cn", norm("cv"))
    val probed = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", nprobe)
      .withColumn("qn", norm("qv"))
    // corpus side (assigned) stays partitioned; probed queries broadcast
    val scored = assigned.join(broadcast(probed), Seq("cent_id"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", dot("qv", "cv") / (col("qn") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"),
        round(col("cos"), 6).as("cos"))
  }
}
