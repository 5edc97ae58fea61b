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
  * and millisecond precision, ~1.3 KB — and the full-name full-precision
  * line goes to `SPARK_GRAFT_BENCH_OUT` (default `target/bench.json`)
  * for humans and local tooling. */
object Bench {
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass at the target SF: whole-stage-codegen classes compile on
    // first use and the JVM's C2 JIT needs real iteration counts before the
    // generated loops run at full speed (measured: q01 9.5s cold vs 2.1s
    // warm). Standard measure-the-second-run benchmarking.
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.contains(name))
    }
    selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
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
    // "queries" are MEDIANS (round 7 on); best-of-3 rides along in the full
    // file only — the compact stdout line must stay inside the driver's
    // 2000-char tail capture
    val jsonShort =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","stat":"median_of_3","queries":$qsShort,"sf":"$sfDir"}"""
    val jsonFull =
      s"""{"metric":"total","value":$total,"unit":"sec","stat":"median_of_3","queries":$qsFull,"best":$bestFull,"sf":"$sfDir"}"""
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
