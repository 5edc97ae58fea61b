package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal for the dedup path: synthesize an `M`x corpus from the
  * sf0.1 documents fixture, run the heavy dedup queries at 1x and Mx, and
  * report observed scaling exponents — empirical evidence for the O(n)
  * claims the operator docs make from plan shapes alone.
  *
  * Corpus synthesis preserves the duplicate STRUCTURE without creating
  * cross-copy near-dups: copy `i` suffixes every token with `_i`, so every
  * shingle/fingerprint of copy i is distinct from every other copy's, while
  * the near-dup pairs WITHIN copy i mirror the originals exactly. Pair
  * count, cluster count, and survivor count therefore all scale by exactly
  * M — the workload grows linearly, so a linear-time operator shows
  * exponent ~1.0 (t ∝ n^e; e = log(tM/t1)/log(M)) and any quadratic cliff
  * shows e ~2. Naive duplication (same text, new ids) would instead fuse
  * all M copies into giant cross-copy clusters — a different, superlinear
  * workload that measures the mass-duplicate cliff, not scaling.
  *
  * A single 1x->Mx exponent blends the fixed-cost-dominated low end into
  * the estimate (at 10x the observed exponents were <=0.17 — proof of
  * no-cliff, but the data-proportional term was essentially unmeasured).
  * The ladder form times every multiplier in `SPARK_GRAFT_SCALE_MULTS`
  * (default "10,100") and reports, per query, the overall exponent AND the
  * MARGINAL exponent between the two largest points — the data-dominated
  * estimate where exponent ~1 actually validates O(n).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULTS=10,100 \
  *   sbt "runMain graft.examples.ScaleRehearsal"
  * Prints one JSON line per query with per-scale times and both exponents.
  */
object ScaleRehearsal {

  private val RehearsalQueries =
    Seq("q24_dedup_minhash_lsh", "q26_dedup_ngram_jaccard",
      "q77_dedup_clusters", "q88_fuzzy_dedup")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = sys.env.get("SPARK_GRAFT_SCALE_MULT") // legacy single-point form
      .map(m => Seq(m.toInt))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTS", "10,100")
        .split(",").map(_.trim.toInt).toSeq)
      .sorted
    require(mults.nonEmpty && mults.forall(_ > 1), s"multipliers must be > 1: $mults")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dirs = mults.map { m =>
      val d = s"target/scale_rehearsal/x$m"
      synthesize(spark, baseDir, d, m)
      m -> d
    }

    val results = RehearsalQueries.map { name =>
      val fn = graft.SparkEntry.queries(name)
      def time(dir: String): Double = {
        fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
        spark.catalog.clearCache()
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          spark.catalog.clearCache()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      }
      val tBase = time(baseDir)
      val scaled = dirs.map { case (m, d) => m -> time(d) }
      // overall: base -> largest point; marginal: between the two largest
      // points (base counts as point 1x when only one multiplier is given)
      val (mTop, tTop) = scaled.last
      val overall = math.log(tTop / tBase) / math.log(mTop.toDouble)
      val (mPrev, tPrev) =
        if (scaled.size >= 2) scaled(scaled.size - 2) else (1, tBase)
      val marginal = math.log(tTop / tPrev) / math.log(mTop.toDouble / mPrev)
      val timesJson = scaled.map { case (m, t) => f""""x$m":$t%.2f""" }.mkString("{", ",", "}")
      println(
        f"""{"query":"$name","t_base":$tBase%.2f,"times":$timesJson,"exponent_overall":$overall%.2f,"exponent_marginal":$marginal%.2f}""")
      (name, marginal)
    }
    val worst = results.maxBy(_._2)
    println(f"""{"metric":"max_marginal_exponent","query":"${worst._1}","value":${worst._2}%.2f}""")
    spark.stop()
  }

  /** Write the Mx documents corpus: copy 0 is the original; copy i>0 gets
    * ids shifted by i*(maxId+1) and every token suffixed `_i`. */
  def synthesize(spark: SparkSession, baseDir: String, outDir: String, mult: Int): Unit = {
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val copies = (0 until mult).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * maxId))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit(s"_$i"))), " "))
    }
    copies.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }
}
