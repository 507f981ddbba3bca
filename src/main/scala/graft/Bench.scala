package graft

import graft.ops.{CorpusStats, Dedup, Similarity}
import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Headline benchmark: one JSON line on stdout.
  *
  * The flagship metric is end-to-end extraction throughput (docs/sec) on
  * the synthetic CC-style pages corpus (BASELINE.json north rule); the
  * other queries cover the data-pipeline operators at the driver's sf.
  */
object Bench {

  def corpusSizeFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 100000L
    else if (sfDir.contains("sf0.01")) 10000L
    else 1000L

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
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = corpusSizeFor(sfDir)

    // Steady-state timing: run each job once to warm JIT + codegen (the
    // kernel is ~50× faster once C2-compiled), then time the second run.
    // A long-lived cluster is always in the warm regime.
    def timeSteady(warmRuns: Int)(f: => Long): (Double, Long) = {
      (0 until warmRuns).foreach { _ => f; spark.catalog.clearCache() }
      // caches dropped so the timed run pays full cost (persist() inside
      // an op must not let the timed run ride on a warm-up run's
      // materialization); C2 compilation needs ~2 full passes to converge
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    val (tExtract, nExtract) = timeSteady(2) {
      Jobs.extract(Jobs.syntheticPages(spark, nDocs), cpus.toInt * 2)
        .filter(col("outcome").isNotNull).count()
    }
    results("extract") = tExtract
    val extractedDocs = nExtract

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count() // file listing + scan warm

    results("dedup_exact") = timeSteady(1) {
      Dedup.exact(docs, "doc_id", "text").count()
    }._1
    results("dedup_minhash_lsh") = timeSteady(2) {
      Dedup.minhashLsh(docs, "doc_id", "text").count()
    }._1
    results("dedup_simhash") = timeSteady(1) {
      Dedup.simhash(docs, "doc_id", "text", maxHamming = 16).count()
    }._1
    results("sim_topk_brute") = timeSteady(2) {
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100),
        "vec_id", "embedding", 10).count()
    }._1
    results("sim_topk_ivf") = timeSteady(2) {
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 100),
        "vec_id", "embedding", 10).count()
    }._1
    results("dedup_embed_cosine") = timeSteady(1) {
      Dedup.embeddingCosineLsh(emb, "vec_id", "embedding").count()
    }._1
    results("dedup_passages") = timeSteady(1) {
      CorpusStats.passageDedup(docs, "doc_id", "text").count()
    }._1

    val total = results.values.sum
    val docsPerSec = extractedDocs / results("extract")
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val json =
      f"""{"metric":"extract_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/sec","total_sec":$total%.3f,"extract_docs":$extractedDocs,"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // machine-readable copy, free of sbt log prefixes (the stdout line is
    // buried in [info] noise when run through sbt): the driver/judge can
    // parse this file even when stdout parsing fails
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch { case _: Throwable => () } // bench result loss must not fail the run
    spark.stop()
  }
}
