package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.spark.Jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-efficiency evidence for the north rule: the same extraction
  * job, same input, at two parallelism levels (N=8 vs 4N=32 task slots
  * — the sandbox stand-in for N vs 4N executors).
  *
  * Protocol (r5, slot-based — designed for a noisy, SMT-confounded
  * shared host):
  *  - a parallelism level is a number of task SLOTS, not a partition
  *    count: local[32] with `spark.task.cpus=4` schedules exactly 8
  *    concurrent tasks; `spark.task.cpus=1` schedules 32. The job keeps
  *    128 partitions at BOTH levels, so each slot drains many task
  *    waves — exactly how an executor drains a real job. (The previous
  *    concurrency=partitions emulation ran ONE wave per level, so any
  *    straggler idled the whole pool and the measured "scaling gap" was
  *    dominated by tail artifacts — profiled in
  *    BENCH/profile_scaling_r05.md: single-wave 0.46–0.57 raw vs
  *    multi-wave 0.76 raw in the same windows.)
  *  - one JVM for the whole run (JIT state shared); each pass gets a
  *    fresh SparkContext because `spark.task.cpus` is fixed at context
  *    creation — context start/stop is ~1 s in local mode and carries
  *    no executor JVM churn;
  *  - 2 full warm passes (C2 convergence), then 5 complete trials; each
  *    trial runs spin-loop calibration AND the 8-slot AND 32-slot jobs
  *    back-to-back, so every trial carries its own same-window hardware
  *    ceiling (8→32 threads on this box speed up only ~3× for ANY
  *    pure-CPU job: SMT-paired cores + single-core turbo inflate the
  *    8-thread runs; a real N→4N executor resize adds whole nodes and
  *    has no such confound);
  *  - CONTRACT: median calibrated efficiency (raw pair efficiency ÷
  *    that trial's same-window hardware ceiling) ≥ 0.8 — median, not
  *    best-of, so one lucky window can't carry the headline; raw values
  *    are all tabulated alongside;
  *  - determinism check: order-independent content checksum must match
  *    across every pass at both levels.
  *
  * Writes the round-stamped file given as arg(0) (default
  * BENCH/scaling_run.md) — never BENCH/BASELINE.md, which is maintained
  * by hand from these immutable artifacts.
  */
object ScalingBench {

  val nDocs = 400000L
  val jobPartitions = 128

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // stable %.3f output
    val outFile = args.headOption.getOrElse("BENCH/scaling_run.md")

    def withCtx[T](taskCpus: Int)(f: SparkSession => T): T = {
      val s = SparkSession.builder()
        .master("local[32]")
        .appName(s"graft-scaling-slots$taskCpus")
        .config("spark.task.cpus", taskCpus.toString)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      try f(s)
      finally {
        s.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    def jobPass(s: SparkSession): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val out = Jobs.extractNarrow(
        Jobs.syntheticPages(s, nDocs, parallelism = jobPartitions))
      val row = out.toDF()
        .select(xxhash64(col("url"), col("text"), col("outcome"),
          col("engine"), col("format"), col("charset")).as("h"))
        .agg(expr("bit_xor(h)").as("xor"), count(lit(1)).as("n")).collect()(0)
      ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
    }

    // Pure-CPU calibration on bare JVM threads (context-free): fixed
    // total work split evenly; the 8→32 wall ratio is what this box's
    // SMT cores can give ANY cpu-bound job.
    def spinPass(threads: Int): Double = {
      val perThread = 6_000_000_000L / threads
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        val t = new Thread(() => {
          var x = 0x9E3779B97F4A7C15L; var i = 0L
          while (i < perThread) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
          }
          if (x == 42L) println("") // sink so the loop can't be elided
        })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    spinPass(32); spinPass(8) // warm the spin path
    withCtx(1) { s => jobPass(s); jobPass(s); () } // C2 warm: 2 full passes

    // Each TRIAL carries its own calibration: spin8/spin32 then job8/job32
    // in one window. Cross-window pairing would compare an 8-slot run from
    // a calm minute against a 32-slot run from a busy one.
    final case class Trial(hw: Double, r8: (Double, Long, Long),
        r32: (Double, Long, Long)) {
      def raw: Double = ((nDocs / r32._1) / (nDocs / r8._1)) / 4.0
      def ceiling: Double = hw / 4.0
      def calibrated: Double = raw / ceiling
    }
    val trials = (1 to 5).map { i =>
      val hw = spinPass(8) / spinPass(32)
      val r8 = withCtx(4)(jobPass)
      val r32 = withCtx(1)(jobPass)
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
      f"""# Scaling run (ScalingBench, slot protocol)
         |
         |Same extraction job, same $nDocs-doc input, 8 vs 32 task SLOTS
         |(spark.task.cpus 4 vs 1 on local[32]; $jobPartitions partitions at
         |both levels, so each slot drains many task waves — the executor
         |emulation; see BENCH/profile_scaling_r05.md for why single-wave
         |concurrency=partitions understates scaling). Each trial carries
         |its own same-window spin-loop hardware calibration; the CONTRACT
         |is median calibrated efficiency ≥ 0.8 (see ScalingBench.scala).
         |
         || trial | hw 8→32 | ceiling | 8-slot s | 32-slot s | tp8 | tp32 | raw eff | calibrated |
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
  }
}
