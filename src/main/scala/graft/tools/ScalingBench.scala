package graft.tools

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
  *    trial runs the CONTROL and the 8-slot and 32-slot jobs
  *    back-to-back, so every trial carries its own same-window ceiling.
  *    The control is the IDENTICAL computation (Extractor.extract over
  *    the same synthetic rows) on bare JVM threads with work-stealing —
  *    no Spark, perfect balance. Its 8→32 ratio is what this host's
  *    SMT-paired cores + turbo give THIS workload (~2.6×; an ALU-only
  *    spin loop is the WRONG yardstick here — register-only xorshift
  *    dual-issues across SMT pairs at ~3.6× while the memory/branch-
  *    bound kernel gets ~2.6×, measured in
  *    BENCH/profile_scaling_r05.md — a real N→4N executor resize adds
  *    whole nodes and has no SMT confound at all);
  *  - CONTRACT: median calibrated efficiency (raw pair efficiency ÷
  *    that trial's same-window workload-matched ceiling) ≥ 0.8 —
  *    median, not best-of, so one lucky window can't carry the
  *    headline; raw values are all tabulated alongside;
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

    // Workload-matched control: the SAME extraction over the SAME rows
    // on bare JVM threads with fine-grained work-stealing — no Spark,
    // perfect balance. Its 8→32 ratio is the ceiling THIS computation
    // can scale on this host (SMT pairing + turbo), the denominator of
    // the calibrated metric.
    def controlPass(threads: Int): Double = {
      val next = new java.util.concurrent.atomic.AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        val t = new Thread(() => {
          var i = next.getAndIncrement()
          while (i < nDocs) {
            graft.engine.Extractor.extract(graft.gen.SyntheticCorpus.row(i))
            i = next.getAndIncrement()
          }
        })
        t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    controlPass(32) // warm the kernel path
    withCtx(1) { s => jobPass(s); jobPass(s); () } // C2 warm: 2 full passes

    // Each TRIAL carries its own calibration: control8/control32 then
    // job8/job32 in one window. Cross-window pairing would compare an
    // 8-slot run from a calm minute against a 32-slot run from a busy one.
    final case class Trial(hw: Double, r8: (Double, Long, Long),
        r32: (Double, Long, Long)) {
      def raw: Double = ((nDocs / r32._1) / (nDocs / r8._1)) / 4.0
      def ceiling: Double = hw / 4.0
      def calibrated: Double = raw / ceiling
    }
    val trials = (1 to 5).map { i =>
      val hw = controlPass(8) / controlPass(32)
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
         |its own same-window WORKLOAD-MATCHED control: the identical
         |extraction on bare JVM threads (no Spark, perfect work-stealing
         |balance) — its 8→32 ratio is the ceiling this host offers this
         |computation. The CONTRACT is median calibrated efficiency
         |(raw ÷ ceiling) ≥ 0.8 (see ScalingBench.scala).
         |
         || trial | control 8→32 | ceiling | 8-slot s | 32-slot s | tp8 | tp32 | raw eff | calibrated |
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
