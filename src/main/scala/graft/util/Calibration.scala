package graft.util

import org.apache.spark.sql.SparkSession

/** Shared pure-CPU calibration lanes: fixed whole-stage-codegen loops
  * whose idle-box wall time is stable, so any timing artifact (bench,
  * scale rehearsal) can stamp the evidence to adjudicate itself instead
  * of relying on a human remembering whether the box was busy — the
  * round-7/8 contamination lesson, factored out of [[graft.Bench]] in
  * round 9 after a rehearsal run was silently polluted the same way.
  *
  * Two lanes because they fail differently (measured on this box):
  *   - [[singleLane]]: one task on one core (idle ~0.27 s) — detects a
  *     FULLY saturated box, reads clean when even one core is free;
  *   - [[parallelLane]]: the same per-core work on `cpus` tasks at once
  *     (idle ~0.55–0.80 s here: 32 SMT threads share 16 physical cores
  *     and forgo the single-task turbo clock) — inflates with exactly
  *     the parallelism a real query loses when SOME cores are stolen.
  */
object Calibration {

  /** Single-task lane: a 2e8 range sum in ONE partition — idle value is
    * independent of the session's core count. Min-of-`runs` after one
    * JIT warm-up. */
  def singleLane(spark: SparkSession, runs: Int = 3): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 1).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up: codegen compile + JIT
    (1 to runs).map(_ => once()).min
  }

  /** Parallel lane: the same 2e8-per-task work fanned out to `cpus`
    * partitions. The summand is bounded (`id % 100000`) so the
    * cpus-scaled range can never overflow the Long sum under ANSI mode;
    * only the loop's wall time matters, so the extra modulo just folds
    * into this lane's own idle reference. Set `warm = false` when the
    * lane already ran in this session (codegen is cached). */
  def parallelLane(spark: SparkSession, cpus: Int, runs: Int = 3,
      warm: Boolean = true, perTask: Long = 200000000L): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, perTask * cpus, 1L, cpus)
        .selectExpr("sum(id % 100000)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    if (warm) once()
    (1 to runs).map(_ => once()).min
  }

  /** Mini parallel lane (round 13): the parallel lane with 10x less work
    * per task (2e7), cheap enough (~0.1 s idle) to run BEFORE EVERY bench
    * query so a contaminated run can name WHICH queries ran under
    * contention instead of poisoning the whole artifact — the round-12
    * driver bench was unusable for exactly this reason (201.8 s total, all
    * 114 queries suspect, adjudicated clean only by a human re-run).
    * Single run, no warm-up: the full lanes already compiled the codegen
    * in this session, and the signal only needs to catch multi-second
    * external load, not 10 ms jitter. */
  def miniLane(spark: SparkSession, cpus: Int): Double =
    parallelLane(spark, cpus, runs = 1, warm = false, perTask = 20000000L)

  /** 1-minute system load average (-1 when the platform can't say). */
  def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
}
