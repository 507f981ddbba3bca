package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B probe for the passageDedupInDoc hot path: times the
  * shipped formulation against candidate rewrites on the same input so
  * a regression fix is measured, not guessed. */
object IndocProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach(_ => f)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-22s best=${ts.min}%.2f s  trials=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    // the SHIPPED window algebra, not a private copy — if ceilUnitsSql
    // changes, the probe keeps measuring the real formulation
    val units = graft.ops.CorpusStats.ceilUnitsSql(4)
    def base = docs.select(col("doc_id"),
      expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .select(col("doc_id"), expr(units).as("us"))

    time("shipped filter/pos") {
      base.select(col("doc_id"),
        expr("filter(us, (x, i) -> array_position(us, x) = i + 1)").as("kept"))
        .select(col("doc_id"), size(col("kept")).cast("long").as("n_kept"),
          array_join(col("kept"), " ").as("clean_text"))
        .filter(col("n_kept") >= Long.MinValue).count()
    }
    time("aggregate/append") {
      base.select(col("doc_id"),
        expr("""aggregate(us, cast(array() as array<string>),
                  (acc, x) -> CASE WHEN array_contains(acc, x) THEN acc
                              ELSE array_append(acc, x) END)""").as("kept"))
        .select(col("doc_id"), size(col("kept")).cast("long").as("n_kept"),
          array_join(col("kept"), " ").as("clean_text"))
        .filter(col("n_kept") >= Long.MinValue).count()
    }
    // how big are the unit arrays really?
    base.select(expr("max(size(us))").as("mx"), expr("avg(size(us))").as("av"),
      expr("sum(size(us))").as("total")).show()
    spark.stop()
  }
}
