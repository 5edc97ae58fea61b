package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every catalog query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (a bare `.count()` would let Catalyst prune every non-key column
  * and under-measure projection/compute cost).
  *
  * Output contract: the driver captures only the LAST 2000 CHARS of
  * stdout and parses the JSON line it finds there (BENCH_r02..r04 all
  * show `"tail"` of exactly 2000 chars with the line's opening `{` cut
  * off → `"parsed": null` three rounds running). A full-name
  * full-precision map over 88 queries is ~3 KB and can never fit, so
  * stdout gets a COMPACT line — `qNN` keys (the unique catalog prefix)
  * and millisecond precision, ~1.4 KB — and the full-name full-precision
  * line goes to `SPARK_GRAFT_BENCH_OUT` (default `target/bench.json`)
  * for humans and local tooling.
  *
  * SELF-VALIDATION (round 8): BENCH_r07 was 3.3x inflated by box
  * contention and nothing in the artifact said so — a reader concluded
  * the engine regressed when the machine was merely busy. The artifact
  * now carries the evidence to adjudicate itself:
  *   - `load_avg_start` / `load_avg_end`: 1-min system load average
  *     around the run (a load far above the core count = contended box);
  *   - `ts_start` / `ts_end`: epoch-second wall-clock bounds;
  *   - `calibration_sec`: a fixed pure-CPU task (single-partition range
  *     sum, min-of-3 after one warm-up) timed before the queries. Its
  *     idle-box value is stable (measured 0.30 s single-task on this
  *     machine; override with `SPARK_GRAFT_CALIBRATION_IDLE_SEC`);
  *   - `contaminated`: true when calibration exceeds 2x the idle
  *     reference — the run's totals must not be read as a trend.
  * Streaming queries (micro-batch + state-store overhead, AQE off) are
  * also split out: `total_batch` / `total_streaming`, so relational perf
  * trends aren't drowned by micro-batch noise (q75 alone ballooned
  * 6.8 s → 38 s under the r07 contention). */
object Bench {

  /** Structured-streaming catalog queries: timed like everything else but
    * summed separately — their cost is dominated by micro-batch scheduling
    * and state-store IO, not relational execution. */
  private val StreamingQueries: Set[String] =
    Set("q40_stream_window", "q61_stream_dedup", "q75_stream_stream_join")

  /** Pure-CPU calibration: one warm-up then min-of-3 of summing a 2e8
    * range in a SINGLE partition — one task on one core, so the idle
    * value is independent of `SPARK_GRAFT_CPUS` (a parallel range would
    * read "contended" whenever the run uses fewer cores than the idle
    * reference was measured with). Whole-stage-codegen loop, no IO, no
    * shuffle: its runtime moves only with per-core CPU availability,
    * which is exactly what box contention steals. */
  private def calibrate(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 200000000L, 1L, 1).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up: codegen compile + JIT
    (1 to 3).map(_ => once()).min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // optional comma-separated name filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // fail FAST on a typo'd filter: a silent empty selection exits 0 with
    // an empty bench — the silent-empty-output family that keeps biting
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(",")} " +
          s"(known: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(",")})")
    }
    // a renamed streaming query must not silently fall out of the
    // total_streaming split — fail loudly instead
    require(StreamingQueries.subsetOf(SparkEntry.queries.keySet),
      s"StreamingQueries names unknown queries: ${StreamingQueries -- SparkEntry.queries.keySet}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val tsStart = System.currentTimeMillis() / 1000
    val loadStart = osBean.getSystemLoadAverage
    val calibrationSec = calibrate(spark)
    val calibrationIdle =
      sys.env.getOrElse("SPARK_GRAFT_CALIBRATION_IDLE_SEC", "0.30").toDouble
    val contaminated = calibrationSec > 2.0 * calibrationIdle
    if (contaminated)
      System.err.println(
        f"[bench] WARNING: calibration $calibrationSec%.2fs > 2x idle reference " +
          f"$calibrationIdle%.2fs — box is contended, flagging run contaminated")
    // Warm-up pass at the target SF: whole-stage-codegen classes compile on
    // first use and the JVM's C2 JIT needs real iteration counts before the
    // generated loops run at full speed (measured: q01 9.5s cold vs 2.1s
    // warm). Standard measure-the-second-run benchmarking.
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        // a query that crashes only at warm-up would otherwise be timed
        // COLD below, mislabeling JIT cost as query cost — say so
        case e: Throwable =>
          System.err.println(s"[bench] warm-up of $name failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      // median-of-3 timed runs: single-machine runs are noisy (GC, thread
      // scheduling) with a ±3x per-query band observed across rounds;
      // best-of-N under-reports systematically while the median is robust
      // to a single outlier in either direction. The min is kept as a
      // secondary field (the low-noise-floor estimate). A crashed query
      // records -1, never a bogus near-zero "fast" time.
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        spark.catalog.clearCache() // operators may persist intermediates
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val good = times.filter(_ >= 0).sorted
      // size/2 = true median for 3 good runs; the (pessimistic) upper of 2
      (name,
        if (good.nonEmpty) good(good.size / 2) else -1.0,
        if (good.nonEmpty) good.head else -1.0)
    }
    // -1 crash markers stay visible per-query but must not subtract from
    // (or be hidden inside) the total
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalStreaming =
      results.filter(r => StreamingQueries(r._1)).map(_._2).filter(_ >= 0).sum
    val totalBatch = total - totalStreaming
    val tsEnd = System.currentTimeMillis() / 1000
    val loadEnd = osBean.getSystemLoadAverage
    def fmt(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val shortKeys = results.map { case (k, _, _) => k.takeWhile(_ != '_') }
    require(shortKeys.distinct.size == shortKeys.size,
      "catalog qNN prefixes must stay unique — the compact bench line keys on them")
    val qsShort = results.map { case (k, med, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt(med)
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, med, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val bestFull = results.map { case (k, _, best) => "\"" + k + "\":" + best }
      .mkString("{", ",", "}")
    // environment-evidence fields shared by both lines: a contaminated run
    // must be self-identifying wherever it is read
    val envFields =
      s""""load_avg_start":${fmt(loadStart)},"load_avg_end":${fmt(loadEnd)},""" +
        s""""ts_start":$tsStart,"ts_end":$tsEnd,""" +
        s""""calibration_sec":${fmt(calibrationSec)},""" +
        s""""calibration_idle_ref":${fmt(calibrationIdle)},""" +
        s""""contaminated":$contaminated,""" +
        s""""total_batch":${fmt(totalBatch)},"total_streaming":${fmt(totalStreaming)}"""
    // "queries" are MEDIANS (round 7 on); best-of-3 rides along in the full
    // file only — the compact stdout line must stay inside the driver's
    // 2000-char tail capture
    val jsonShort =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median_of_3",$envFields,"queries":$qsShort,"sf":"$sfDir"}"""
    val jsonFull =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_3",$envFields,"queries":$qsFull,"best":$bestFull,"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(outPath, jsonFull + "\n")
    // print LAST, after all Spark/sbt chatter, so the line lands inside the
    // driver's 2000-char tail capture
    println(jsonShort)
    spark.stop()
  }
}
