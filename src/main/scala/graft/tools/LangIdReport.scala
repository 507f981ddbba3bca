package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Writes the held-out accuracy table for the trigram-profile language
  * identifier (`graft.ops.LangId`) to `BENCH/langid_accuracy.md` — the
  * breadth evidence for the reference's ~100-language model surface
  * (`/root/reference/src/ocrmypdf/languages.py`): per-language held-out
  * accuracy plus the confusion rows for anything misclassified.
  *
  * Usage: runMain graft.tools.LangIdReport [outPath]
  */
object LangIdReport {
  def main(args: Array[String]): Unit = {
    val outPath = if (args.nonEmpty) args(0) else "BENCH/langid_accuracy.md"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.LangId

    val profiles = LangId.trainProfiles(LangId.trainDf(spark), "lang", "text")
    val test = LangId.testDf(spark)
    val out = LangId.classify(test, "sample_id", "text", profiles)
      .join(test.select("sample_id", "true_lang"), Seq("sample_id"))
      .select(col("true_lang"), col("pred_lang"), col("dist"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)

    val byLang = out.groupBy(_._1).toSeq.sortBy(_._1)
    val nLangs = byLang.size
    val total = out.length
    val correct = out.count(r => r._1 == r._2)
    val wrong = out.filter(r => r._1 != r._2)

    val sb = new StringBuilder
    sb ++= "# Trigram-profile language ID — held-out accuracy\n\n"
    sb ++= s"Model: Cavnar-Trenkle rank profiles (topK=${LangId.topK}), "
    sb ++= s"trained on ${LangId.trainPerLang} sentences/language.\n"
    sb ++= s"Fixture: `graft.ops.LangId.seed` — $nLangs languages, "
    sb ++= "2 held-out sentences each (the sandbox stand-in for the "
    sb ++= "reference's ~100-language model inventory, "
    sb ++= "`src/ocrmypdf/languages.py`).\n\n"
    sb ++= s"**Held-out accuracy: $correct/$total "
    sb ++= f"(${100.0 * correct / total}%.1f%%) over $nLangs languages.**\n\n"
    if (wrong.nonEmpty) {
      sb ++= "Misclassified:\n\n| true | pred | dist |\n|---|---|---|\n"
      wrong.foreach { case (t, p, d) => sb ++= s"| $t | $p | $d |\n" }
      sb ++= "\n"
    }
    sb ++= "| lang | held-out correct | preds |\n|---|---|---|\n"
    byLang.foreach { case (lang, rows) =>
      val c = rows.count(r => r._1 == r._2)
      sb ++= s"| $lang | $c/${rows.length} | ${rows.map(_._2).mkString(" ")} |\n"
    }
    Files.write(Paths.get(outPath),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[langid-report] $correct/$total over $nLangs langs -> $outPath")
    spark.stop()
  }
}
