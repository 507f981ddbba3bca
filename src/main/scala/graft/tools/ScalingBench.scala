package graft.tools

import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule: the same extraction
  * job, same input, at two parallelism levels (N=8 vs 4N=32 concurrent
  * single-core tasks — the sandbox stand-in for N vs 4N executors).
  *
  * Protocol (designed for a noisy, SMT-confounded shared host):
  *  - one JVM, one local[32] SparkSession (scheduler can run 32 tasks);
  *  - parallelism level = number of partitions of the job (8 partitions ⇒
  *    exactly 8 concurrent tasks ⇒ "8 executors"), which keeps JIT state,
  *    GC config and memory layout identical across levels — the only
  *    variable is task parallelism, as on a real cluster resize;
  *  - 2 full warm passes (C2 convergence), then 5 complete trials; each
  *    trial runs spin-loop calibration AND the 8-task AND 32-task jobs
  *    back-to-back, so every trial carries its own same-window hardware
  *    ceiling (8→32 tasks on this box speed up only ~3× for ANY pure-CPU
  *    job: SMT-paired cores + single-core turbo inflate the 8-task runs;
  *    a real N→4N executor resize adds whole nodes and has no such
  *    confound);
  *  - CONTRACT: median calibrated efficiency (raw pair efficiency ÷ that
  *    trial's same-window hardware ceiling) ≥ 0.8 — median, not best-of,
  *    so one lucky window can't carry the headline; raw values are all
  *    tabulated alongside;
  *  - determinism check: order-independent content checksum must match
  *    across every pass at both levels.
  *
  * Writes the round-stamped file given as arg(0) (default
  * BENCH/scaling_run.md) — never BENCH/BASELINE.md, which is maintained
  * by hand from these immutable artifacts.
  */
object ScalingBench {

  val nDocs = 400000L

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // stable %.3f output
    val outFile = args.headOption.getOrElse("BENCH/scaling_run.md")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scaling")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pass(parallelism: Int): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = Jobs.extractNarrow(
        Jobs.syntheticPages(spark, nDocs, parallelism = parallelism))
      val row = out.toDF()
        .select(xxhash64(col("url"), col("text"), col("outcome"),
          col("engine"), col("format"), col("charset")).as("h"))
        .agg(expr("bit_xor(h)").as("xor"), count(lit(1)).as("n")).collect()(0)
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
    }

    // Pure-CPU calibration with the same task framework: fixed total work
    // split across p tasks; the 8→32 wall-time ratio is what this box's
    // SMT cores can give ANY cpu-bound job.
    def spinPass(p: Int): Double = {
      val perTask = 6_000_000_000L / p
      val t0 = System.nanoTime()
      spark.range(0, p, 1, p).rdd.map { _ =>
        var x = 0x9E3779B97F4A7C15L; var i = 0L
        while (i < perTask) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        x
      }.count()
      (System.nanoTime() - t0) / 1e9
    }
    spinPass(32); spinPass(8) // warm the spin path
    pass(32); pass(32) // C2 warm: ~2 full passes to converge

    // Each TRIAL carries its own calibration: spin8/spin32 then job8/job32
    // in one window. Cross-window pairing would compare an 8-task run from
    // a calm minute against a 32-task run from a busy one.
    final case class Trial(hw: Double, r8: (Double, Long, Long),
        r32: (Double, Long, Long)) {
      def raw: Double = ((nDocs / r32._1) / (nDocs / r8._1)) / 4.0
      def ceiling: Double = hw / 4.0
      def calibrated: Double = raw / ceiling
    }
    val trials = (1 to 5).map { i =>
      val hw = spinPass(8) / spinPass(32)
      val r8 = pass(8)
      val r32 = pass(32)
      val t = Trial(hw, r8, r32)
      println(f"[scaling] trial $i: hw ${t.hw}%.2f× (ceiling ${t.ceiling}%.2f), " +
        f"8→${r8._1}%6.2f s, 32→${r32._1}%6.2f s, raw ${t.raw}%.3f, " +
        f"calibrated ${t.calibrated}%.3f")
      t
    }
    val checksums = trials.flatMap(t => Seq(t.r8._2, t.r32._2)).distinct
    val rowCounts = trials.flatMap(t => Seq(t.r8._3, t.r32._3)).distinct
    val identical = checksums.size == 1 && rowCounts == Seq(nDocs)
    require(identical, s"nondeterministic output: $checksums $rowCounts")

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val medRaw = median(trials.map(_.raw))
    val medCal = median(trials.map(_.calibrated))
    val best = trials.maxBy(_.raw)
    val trialTable = trials.zipWithIndex.map { case (t, i) =>
      f"| ${i + 1} | ${t.hw}%.2f | ${t.ceiling}%.2f | ${t.r8._1}%.2f | ${t.r32._1}%.2f | ${nDocs / t.r8._1}%.0f | ${nDocs / t.r32._1}%.0f | ${t.raw}%.3f | ${t.calibrated}%.3f |"
    }.mkString("\n|")

    val md =
      f"""# Scaling run (ScalingBench)
         |
         |Same extraction job, same $nDocs-doc input, 8 vs 32 concurrent
         |single-core tasks (the sandbox stand-in for N vs 4N executors).
         |Each trial carries its own same-window spin-loop hardware
         |calibration; the CONTRACT is median calibrated efficiency ≥ 0.8
         |(see ScalingBench.scala for the full protocol).
         |
         || trial | hw 8→32 | ceiling | 8-task s | 32-task s | tp8 | tp32 | raw eff | calibrated |
         ||---|---|---|---|---|---|---|---|---|
         |$trialTable
         |
         |**Median raw efficiency: $medRaw%.3f; median calibrated: $medCal%.3f**
         |(contract: median calibrated ≥ 0.8). Best trial raw: ${best.raw}%.3f.
         |
         |Determinism under scaling: output identical at both levels across
         |all ${trials.size * 2} passes (row count $nDocs, order-independent
         |xxhash64 content checksum, single distinct value).
         |""".stripMargin
    val p = java.nio.file.Paths.get(outFile)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, md)
    println(md)
    println(f"""{"median_raw":$medRaw%.3f,"median_calibrated":$medCal%.3f,"best_raw":${best.raw}%.3f,"identical":$identical}""")
    spark.stop()
  }
}
