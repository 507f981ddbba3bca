package graft.tools

import graft.ops.{CorpusStats, Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r06): interleaved A/B timing of alternative operator shapes
  * inside ONE session, so box noise between JVM runs cannot masquerade as
  * a win (the probe showed 20%+ drift on unchanged code between runs).
  * Each variant is built fresh per trial (same discipline as Bench), all
  * variants of a group run round-robin, medians printed.
  */
object VariantProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()
    graft.functions.GraftFunctions.register(spark)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def spreadN(df: DataFrame, idc: String, n: Int): DataFrame =
      df.repartition(n, col(idc))

    // ---- minhash variants ------------------------------------------------
    def sigs(n: Int): DataFrame = {
      val base = if (n <= 1) docs.select(col("doc_id").as("id"), col("text").as("t"))
        else spreadN(docs.select(col("doc_id").as("id"), col("text").as("t")), "id", n)
      base.select(col("id"), expr("minhash_sigs(t)").as("sig"))
    }
    val bandExpr = "transform(sequence(0, 3), b -> md5(array_join(slice(sig, b*2+1, 2), '|')))"

    // A: r5 shape — window cap, sig payload through join, distinct last
    def mhA(): Long = {
      val sized = sigs(1).select(col("*"), posexplode(expr(bandExpr)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
        .withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= 50).persist(lvl)
      val a = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_a"), col("sig").as("sig_a"))
      val b = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band_idx", "band_hash")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 8.0D").as("est_jaccard"))
        .distinct().count()
    }
    // B: current working-tree shape (two-phase + reattach) via the library
    def mhB(): Long = Dedup.minhashLsh(docs, "doc_id", "text").count()
    // C: spread sigs + window cap (r5 join shape) + distinct-early + reattach
    def mhC(): Long = {
      val sigT = sigs(cpus.toInt).persist(lvl)
      val sized = sigT.select(col("*"), posexplode(expr(bandExpr)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
        .drop("sig")
        .withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= 50).persist(lvl)
      val a = sized.select(col("band_idx"), col("band_hash"), col("id").as("doc_a"))
      val b = sized.select(col("band_idx"), col("band_hash"), col("id").as("doc_b"))
      val pairs = a.join(b, Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      pairs
        .join(sigT.select(col("id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sigT.select(col("id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 8.0D").as("est_jaccard"))
        .count()
    }
    // D: spread sigs + repartition(band keys)+persist banded (no window,
    // co-partitioned agg/join — zero further exchanges) + distinct-early
    def mhD(): Long = {
      val sigT = sigs(cpus.toInt).persist(lvl)
      val banded = sigT.select(col("*"), posexplode(expr(bandExpr)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
        .drop("sig")
        .repartition(col("band_idx"), col("band_hash")).persist(lvl)
      val counts = banded.groupBy("band_idx", "band_hash")
        .agg(count(lit(1)).as("bucket_n")).filter(col("bucket_n") <= 50)
      val capped = banded.join(counts, Seq("band_idx", "band_hash"))
      val a = capped.select(col("band_idx"), col("band_hash"), col("id").as("doc_a"))
      val b = capped.select(col("band_idx"), col("band_hash"), col("id").as("doc_b"))
      val pairs = a.join(b, Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      pairs
        .join(sigT.select(col("id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
        .join(sigT.select(col("id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 8.0D").as("est_jaccard"))
        .count()
    }
    // E: spread sigs(8) — fewer tasks on the hot stage — + r5 window/join
    // shape with payload, distinct last (isolates the spread-only delta)
    def mhE(): Long = {
      val sized = sigs(8).select(col("*"), posexplode(expr(bandExpr)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
        .withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= 50).persist(lvl)
      val a = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_a"), col("sig").as("sig_a"))
      val b = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band_idx", "band_hash")).filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 8.0D").as("est_jaccard"))
        .distinct().count()
    }
    // F: spread sigs + window cap + payload join + DISTINCT-EARLY on the
    // pair ids only, est recomputed... (distinct-early without reattach:
    // keep sig through join but distinct on ids+est as r5) — skip; covered.

    // ---- passages variants ----------------------------------------------
    def paA(): Long = { // r5: no spread
      val pass = docs.select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n"), posexplode(expr(CorpusStats.ceilUnitsSql(4))))
        .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("h"),
          (col("n") % 4 =!= 0 && col("pos") === expr("n div 4")).as("is_tail"))
        .filter(!col("is_tail")).select("doc_id", "pos", "h").persist(lvl)
      val groups = pass.groupBy("h").agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      pass.join(groups, Seq("h")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("cnt") > 1 && !(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")), 1L).otherwise(0L)).as("n_removed"))
        .count()
    }
    def paB(): Long = CorpusStats.passageDedup(docs, "doc_id", "text").count()
    def paC(): Long = { // spread 8
      val pass = spreadN(docs.select(col("doc_id"), col("text")), "doc_id", 8)
        .select(col("doc_id"), expr("filter(split(text, ' '), x -> x != '')").as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n"), posexplode(expr(CorpusStats.ceilUnitsSql(4))))
        .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("h"),
          (col("n") % 4 =!= 0 && col("pos") === expr("n div 4")).as("is_tail"))
        .filter(!col("is_tail")).select("doc_id", "pos", "h").persist(lvl)
      val groups = pass.groupBy("h").agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      pass.join(groups, Seq("h")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("cnt") > 1 && !(col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos")), 1L).otherwise(0L)).as("n_removed"))
        .count()
    }

    // ---- brute topk variants --------------------------------------------
    def brA(): Long = { // no spread (r5)
      val c = emb.select(col("vec_id").as("nbr_id"), col("embedding").as("cv"))
        .filter(exists(col("cv"), x => x =!= lit(0.0f)))
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .filter(exists(col("qv"), x => x =!= lit(0.0f)))
      val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
        .withColumn("cos", expr("cosine_sim(qv, cv)"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("nbr_id"), round(col("cos"), 6).as("cos"))
        .count()
    }
    def brB(): Long = Similarity.bruteForceTopK(emb,
      emb.filter(col("vec_id") < 100), "vec_id", "embedding", 10).count()
    def brC(): Long = { // spread 4
      val c = spreadN(emb.select(col("vec_id").as("nbr_id"), col("embedding").as("cv"))
        .filter(exists(col("cv"), x => x =!= lit(0.0f))), "nbr_id", 4)
      val q = emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .filter(exists(col("qv"), x => x =!= lit(0.0f)))
      val scored = c.join(broadcast(q), col("query_id") =!= col("nbr_id"))
        .withColumn("cos", expr("cosine_sim(qv, cv)"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("nbr_id").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("nbr_id"), round(col("cos"), 6).as("cos"))
        .count()
    }

    val groups: Seq[(String, Seq[(String, () => Long)])] = Seq(
      "minhash" -> Seq("A_r5" -> mhA _, "B_tree" -> mhB _, "C_spreadWin" -> mhC _,
        "D_copart" -> mhD _, "E_spread8r5" -> mhE _),
      "passages" -> Seq("A_r5" -> paA _, "B_tree" -> paB _, "C_spread8" -> paC _),
      "brute" -> Seq("A_r5" -> brA _, "B_tree" -> brB _, "C_spread4" -> brC _))

    val trials = 3
    groups.foreach { case (gname, vs) =>
      // warm each variant once
      vs.foreach { case (_, f) => f(); spark.catalog.clearCache() }
      val times = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      val rowsOf = scala.collection.mutable.Map[String, Long]()
      (0 until trials).foreach { _ =>
        vs.foreach { case (vname, f) =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val n = f()
          val s = (System.nanoTime() - t0) / 1e9
          times(vname) = times(vname) :+ s
          rowsOf(vname) = n
        }
      }
      println(s"== $gname (rows per variant: ${vs.map(v => s"${v._1}=${rowsOf(v._1)}").mkString(", ")})")
      vs.foreach { case (vname, _) =>
        val ts = times(vname).sorted
        println(f"  $vname%-14s median=${ts(ts.size / 2)}%6.2f s  trials=${times(vname).map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
