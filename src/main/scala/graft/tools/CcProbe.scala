package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r06): where does the connected-components apply path spend
  * its time — candidate generation, the CC loop (per-iteration wall), or
  * the join-back? */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    (0 until 2).foreach { round =>
      println(s"== round $round")
      spark.catalog.clearCache()
      val pairs = t("pairs(count)") {
        val p = Dedup.minhashLsh(docs, "doc_id", "text").select("doc_a", "doc_b")
        p.count(); p
      }
      val clusters = t("resolveClusters") {
        val c = Dedup.resolveClusters(pairs)
        c.count(); c
      }
      t("apply join") {
        docs.select(col("doc_id").cast("long").as("doc_id"))
          .join(clusters, Seq("doc_id"), "left").count()
      }
      t("full minhashApply") {
        Dedup.minhashApply(docs, "doc_id", "text").count()
      }
      // inline copy of the resolveClusters loop with per-iteration timing
      spark.catalog.clearCache()
      t("cc inline total") {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val dir = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst"))
        val edges = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().persist(lvl)
        var labels = edges.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("label"))
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 50) {
          val t0 = System.nanoTime()
          val nbrMin = edges.join(labels, edges("dst") === labels("id"))
            .select(edges("src").as("nid"), col("label"))
            .groupBy("nid").agg(min("label").as("nbr_min"))
          val prop = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
            .select(labels("id").as("id"), labels("label").as("old_label"),
              least(labels("label"), coalesce(col("nbr_min"), labels("label")))
                .as("label"))
          val roots = prop.select(col("id").as("rid"), col("label").as("rlabel"))
          val next = prop.join(roots, prop("label") === roots("rid"), "left")
            .select(prop("id").as("id"), prop("old_label").as("old_label"),
              least(prop("label"), coalesce(col("rlabel"), prop("label")))
                .as("label"))
            .localCheckpoint(false)
          changed = next.filter(col("label") =!= col("old_label")).count()
          labels = next.select("id", "label")
          iter += 1
          println(f"    iter $iter%2d changed=$changed%-6d ${(System.nanoTime() - t0) / 1e9}%5.2f s")
        }
        edges.unpersist()
      }
      // variant: TWO pointer jumps per round
      spark.catalog.clearCache()
      t("cc 2jump total") {
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val dir = pairs.select(col("doc_a").cast("long").as("src"),
          col("doc_b").cast("long").as("dst"))
        val edges = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().persist(lvl)
        var labels = edges.select(col("src").as("id")).distinct()
          .select(col("id"), col("id").as("label"))
        var changed = 1L
        var iter = 0
        while (changed > 0 && iter < 50) {
          val t0 = System.nanoTime()
          val nbrMin = edges.join(labels, edges("dst") === labels("id"))
            .select(edges("src").as("nid"), col("label"))
            .groupBy("nid").agg(min("label").as("nbr_min"))
          val prop = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
            .select(labels("id").as("id"), labels("label").as("old_label"),
              least(labels("label"), coalesce(col("nbr_min"), labels("label")))
                .as("label"))
          val roots = prop.select(col("id").as("rid"), col("label").as("rlabel"))
          val j1 = prop.join(roots, prop("label") === roots("rid"), "left")
            .select(prop("id").as("id"), prop("old_label").as("old_label"),
              least(prop("label"), coalesce(col("rlabel"), prop("label")))
                .as("label"))
          val roots2 = j1.select(col("id").as("rid"), col("label").as("rlabel"))
          val next = j1.join(roots2, j1("label") === roots2("rid"), "left")
            .select(j1("id").as("id"), j1("old_label").as("old_label"),
              least(j1("label"), coalesce(col("rlabel"), j1("label")))
                .as("label"))
            .localCheckpoint(false)
          changed = next.filter(col("label") =!= col("old_label")).count()
          labels = next.select("id", "label")
          iter += 1
          println(f"    iter $iter%2d changed=$changed%-6d ${(System.nanoTime() - t0) / 1e9}%5.2f s")
        }
        edges.unpersist()
      }
    }
    spark.stop()
  }
}
