package graft.tools

import graft.ops.{CorpusStats, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r06): interleaved A/B timing of alternative operator shapes
  * inside ONE session, so box noise between JVM runs cannot masquerade as
  * a win (the probe showed 20%+ drift on unchanged code between runs).
  * Each variant is built fresh per trial (same discipline as Bench), all
  * variants of a group run round-robin, medians printed. The variant set
  * is whatever the current round is deciding — it changes between
  * measurements and the decisions land in OPTIMIZATION_r*.md.
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()
    graft.functions.GraftFunctions.register(spark)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def spreadN(df: DataFrame, idc: String, n: Int): DataFrame =
      df.repartition(n, col(idc))

    // ---- minhash: current tree vs duplicate-pair collapse BEFORE est ----
    def mhB(): Long = Dedup.minhashLsh(docs, "doc_id", "text").count()
    def mhG(): Long = {
      val sigT = spreadN(docs.select(col("doc_id").as("id"),
        col("text").as("t")), "id", 9)
        .select(col("id"), expr("minhash_sigs(t)").as("sig"))
      val bandExpr =
        "transform(sequence(0, 3), b -> md5(array_join(slice(sig, b*2+1, 2), '|')))"
      val sized = sigT.select(col("*"), posexplode(expr(bandExpr)))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_hash")
        .withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy(col("band_idx"), col("band_hash"))))
        .filter(col("bucket_n") <= 50).persist(lvl)
      val a = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_a"), col("sig").as("sig_a"))
      val b = sized.select(col("band_idx"), col("band_hash"),
        col("id").as("doc_b"), col("sig").as("sig_b"))
      a.join(b, Seq("band_idx", "band_hash")).filter(col("doc_a") < col("doc_b"))
        // sig is a pure function of the unique id, so first() per pair is
        // deterministic and est evaluates once per DISTINCT pair
        .groupBy("doc_a", "doc_b")
        .agg(first(col("sig_a")).as("sig_a"), first(col("sig_b")).as("sig_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) / 8.0D")
            .as("est_jaccard"))
        .count()
    }

    // ---- embed: current tree vs collapse-then-cosine-then-filter --------
    def embSig(n: Int): DataFrame = {
      val planeFlat = new Array[Double](64 * 64)
      for (p <- 0 until 64; d <- 0 until 64) {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        planeFlat(p * 64 + d) = if (((h(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
      }
      val bc = spark.sparkContext.broadcast(planeFlat)
      val bitsUdf = udf { (v: Seq[java.lang.Double]) =>
        if (v == null || v.exists(_ == null)) Seq.fill(64)(0)
        else {
          val m = bc.value; val out = new Array[Int](64)
          var p = 0
          while (p < 64) {
            var acc = 0.0; val off = p * 64; var d = 0
            while (d < 64) { acc += m(off + d) * v(d); d += 1 }
            out(p) = if (acc >= 0 || acc.isNaN) 1 else 0; p += 1
          }
          out.toSeq
        }
      }
      spreadN(emb.select(col("vec_id").as("id"), col("embedding").as("v")), "id", n)
        .withColumn("bits", bitsUdf(col("v").cast("array<double>")))
    }
    def emB(): Long = Dedup.embeddingCosineLsh(emb, "vec_id", "embedding").count()
    def emG(): Long = {
      val sig = embSig(10)
      val banded = sig.select(col("id"), col("v"), col("bits"),
        posexplode(expr(
          "transform(sequence(0, 7), k -> aggregate(sequence(0, 7), 0, (acc, j) -> acc + element_at(bits, k*8 + j + 1) * shiftleft(1, j)))")))
        .withColumnRenamed("pos", "band_idx").withColumnRenamed("col", "band_val")
      val sized = banded
        .withColumn("bucket_n", count(lit(1)).over(
          Window.partitionBy(col("band_idx"), col("band_val"))))
        .filter(col("bucket_n") <= 10000).persist(lvl)
      val a = sized.select(col("band_idx"), col("band_val"),
        col("id").as("doc_a"), col("v").as("va"))
      val b = sized.select(col("band_idx"), col("band_val"),
        col("id").as("doc_b"), col("v").as("vb"))
      a.join(b, Seq("band_idx", "band_val"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(first(col("va")).as("va"), first(col("vb")).as("vb"))
        .withColumn("rawcos", expr("cosine_sim(va, vb)"))
        .filter(col("rawcos") >= 0.35)
        .select(col("doc_a"), col("doc_b"), round(col("rawcos"), 6).as("cos"))
        .count()
    }

    // ---- passages: r5 no-spread vs current spread tree ------------------
    def paA(): Long = {
      val pass = docs.select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n"),
          posexplode(expr(CorpusStats.ceilUnitsSql(4))))
        .select(col("doc_id"), col("pos"), md5(col("col").cast("binary")).as("h"),
          (col("n") % 4 =!= 0 && col("pos") === expr("n div 4")).as("is_tail"))
        .filter(!col("is_tail")).select("doc_id", "pos", "h").persist(lvl)
      val groups = pass.groupBy("h").agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      pass.join(groups, Seq("h")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_passages"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"),
          sum(when(col("cnt") > 1 && !(col("doc_id") === col("first.doc_id")
            && col("pos") === col("first.pos")), 1L).otherwise(0L)).as("n_removed"))
        .count()
    }
    def paB(): Long = CorpusStats.passageDedup(docs, "doc_id", "text").count()

    val groups: Seq[(String, Seq[(String, () => Long)])] = Seq(
      "minhash" -> Seq("B_tree" -> mhB _, "G_grpfirst" -> mhG _),
      "embed" -> Seq("B_tree" -> emB _, "G_grpfirst" -> emG _),
      "passages" -> Seq("A_r5" -> paA _, "B_tree" -> paB _))

    val trials = 3
    groups.foreach { case (gname, vs) =>
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
