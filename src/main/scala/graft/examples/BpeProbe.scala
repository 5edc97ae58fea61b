package graft.examples

import org.apache.spark.sql.SparkSession
import graft.operators.Bpe

/** Measures the BPE trainer's production-parameter cliff (round 14):
  * [[Bpe.trainFromCorpus]] runs ONE Spark job per merge (each replaying
  * the merges-so-far over the vocab), so wall time grows ~quadratically
  * with the merge count; [[Bpe.trainFromCorpusLocal]] pays one vocab
  * job then a driver-side incremental loop. Both are bit-identical
  * (asserted here, not just in BpeSpec) — the probe exists to put
  * NUMBERS on the gap at a production-ish merge count, the same
  * measured-not-guessed rule as [[CliffProbe]].
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   java -cp "target/scala-2.13/classes:SPARK_JARS" graft.examples.BpeProbe
  * (SPARK_JARS = the /opt/spark/jars glob — spelled out here because a
  * literal star-after-slash would open a nested Scala comment.)
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val merges = sys.env.getOrElse("SPARK_GRAFT_BPE_MERGES", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // warm the scan + codegen paths once so neither form pays first-run setup
    Bpe.trainFromCorpus(docs, "text", 1)
    val (local, tLocal) = time(Bpe.trainFromCorpusLocal(docs, "text", merges))
    val (dist, tDist) = time(Bpe.trainFromCorpus(docs, "text", merges))
    require(local == dist,
      s"trainLocal and train diverged at $merges merges — investigate before trusting timings")
    println(f"""{"metric":"bpe_train","merges":$merges,"identical":true,""" +
      f""""t_distributed_sec":$tDist%.2f,"t_local_sec":$tLocal%.2f,""" +
      f""""ratio":${tDist / tLocal}%.1f}""")
    spark.stop()
  }
}
