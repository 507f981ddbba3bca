package graft.tools

import graft.ops.{CorpusStats, Dedup, Similarity}
import graft.spark.Jobs
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r06 optimization round): per-stage empirical breakdown of the
  * headline bench queries — stage wall/run time, task count, shuffle and
  * spill bytes — plus the formatted plan, so each optimization targets the
  * measured cost, not a guess (guide §1: measure first; §7.1 stage view).
  *
  * Methodology matches Bench: same session confs, same thunks, warm run
  * then timed run(s); the timed run uses the same terminal action as the
  * bench (count) so the measured plan is the benched plan. Usage:
  *   sbt "runMain graft.tools.BenchProbe [query ...]"
  */
object BenchProbe {

  final case class StageRow(id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, shRead: Long, shWrite: Long,
      spill: Long, wallMs: Long)

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

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for { s <- si.submissionTime; c <- si.completionTime }
          yield c - s).getOrElse(0L)
        stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
          si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled + m.diskBytesSpilled, wall))
      }
    })

    val nDocs = graft.Bench.corpusSizeFor(sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()

    // the exact headline thunks from Bench.scala (same args, same action)
    val thunks: Seq[(String, () => Long)] = Seq(
      "extract" -> (() =>
        Jobs.extract(Jobs.syntheticPages(spark, nDocs), cpus.toInt * 2)
          .filter(col("outcome").isNotNull).count()),
      "dedup_exact" -> (() => Dedup.exact(docs, "doc_id", "text").count()),
      "dedup_minhash_lsh" -> (() =>
        Dedup.minhashLsh(docs, "doc_id", "text").count()),
      "dedup_simhash" -> (() =>
        Dedup.simhash(docs, "doc_id", "text", maxHamming = 16).count()),
      "sim_topk_brute" -> (() =>
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 10).count()),
      "sim_topk_ivf" -> (() =>
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", 10, centroids = 16, nprobe = 4).count()),
      "dedup_embed_cosine" -> (() =>
        Dedup.embeddingCosineLsh(emb, "vec_id", "embedding").count()),
      "dedup_passages" -> (() =>
        CorpusStats.passageDedup(docs, "doc_id", "text").count()),
      "dedup_substrings" -> (() =>
        Dedup.substringRuns(docs, "doc_id", "text").count()),
      "dedup_substrings_rolling" -> (() =>
        Dedup.substringRunsRolling(docs, "doc_id", "text").count()),
      "dedup_substrings_keep_first" -> (() =>
        Dedup.substringRunsKeepFirst(docs, "doc_id", "text").count()),
      "decontaminate" -> (() =>
        CorpusStats.decontaminate(docs, "doc_id", "text",
          docs.filter(pmod(col("doc_id"), lit(13)) === 7), "text").count()),
      "trigram_quality" -> (() =>
        CorpusStats.trigramQuality(docs, "doc_id", "text").count()),
      "corpus_chunks" -> (() =>
        CorpusStats.chunkByWords(docs, "doc_id", "text").count()))

    val plansOf: Map[String, () => DataFrame] = Map(
      "dedup_minhash_lsh" -> (() => Dedup.minhashLsh(docs, "doc_id", "text")),
      "dedup_simhash" -> (() =>
        Dedup.simhash(docs, "doc_id", "text", maxHamming = 16)),
      "dedup_embed_cosine" -> (() =>
        Dedup.embeddingCosineLsh(emb, "vec_id", "embedding")),
      "dedup_passages" -> (() =>
        CorpusStats.passageDedup(docs, "doc_id", "text")),
      "dedup_substrings" -> (() => Dedup.substringRuns(docs, "doc_id", "text")),
      "dedup_substrings_rolling" -> (() =>
        Dedup.substringRunsRolling(docs, "doc_id", "text")),
      "dedup_substrings_keep_first" -> (() =>
        Dedup.substringRunsKeepFirst(docs, "doc_id", "text")),
      "trigram_quality" -> (() =>
        CorpusStats.trigramQuality(docs, "doc_id", "text")),
      "dedup_ngram_jaccard" -> (() =>
        Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.1)),
      "dedup_containment" -> (() => Dedup.containmentPairs(docs, "doc_id", "text")),
      "dedup_winnow" -> (() => Dedup.winnow(docs, "doc_id", "text")),
      "sim_allpairs_tokens" -> (() =>
        Similarity.allPairsSetCosine(docs, "doc_id", "text")),
      "dedup_minhash_incremental" -> (() =>
        Dedup.minhashIncremental(
          docs.filter(pmod(col("doc_id"), lit(10)) < 7),
          docs.filter(pmod(col("doc_id"), lit(10)) >= 7), "doc_id", "text")),
      "extract" -> (() =>
        Jobs.extract(Jobs.syntheticPages(spark, nDocs), cpus.toInt * 2)
          .filter(col("outcome").isNotNull).toDF()))

    val want = if (args.isEmpty) thunks.map(_._1).toSet else args.toSet
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    thunks.filter(t => want(t._1)).foreach { case (name, f) =>
      spark.sparkContext.setJobDescription(s"probe:$name")
      // warm run: codegen + file listing, as in Bench.timeTrials
      f(); spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      val n = f()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"\n== $name%-28s $sec%6.2f s  (rows=$n)")
      val rows = stages.toArray(Array.empty[StageRow]).sortBy(_.id)
      val totRun = rows.map(_.runMs).sum.toDouble
      rows.foreach { r =>
        println(f"  stage ${r.id}%4d ${r.tasks}%4dt wall=${r.wallMs}%6dms " +
          f"run=${r.runMs}%6dms cpu=${r.cpuMs}%6dms " +
          f"shR=${r.shRead / 1024}%8dK shW=${r.shWrite / 1024}%8dK " +
          f"spill=${r.spill / 1024}%6dK  ${r.name}%s")
      }
      println(f"  total executor-run ${totRun / 1000}%.2f s over ${rows.length} stages")
      spark.catalog.clearCache()
    }
    // plan dump is independent of the timing loop so non-headline touched
    // queries (jaccard/containment/winnow/...) get plan files too
    planDir.foreach { d =>
      plansOf.foreach { case (name, mk) =>
        val p = java.nio.file.Paths.get(d, s"$name.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p,
          mk().queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
