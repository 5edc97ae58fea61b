package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomPrefilter, Curation}
import graft.sources.RangeLayout

/** Range-sorted layout data skipping, bloom-prefiltered joins, and
  * domain-mixture sampling (the round-13 layout/prefilter additions). */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Rows the parquet reader MATERIALIZED for a no-exchange filter query
    * (scan-node numOutputRows after execution). The query must stay
    * exchange-free so AQE never wraps the scan in an opaque query stage. */
  private def materializedRows(df: DataFrame): Long = {
    df.queryExecution.executedPlan // force planning
    assert(df.collect().nonEmpty)
    df.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numOutputRows").value)
      .sum
  }

  test("range-sorted layout skips row groups a hash layout must materialize") {
    val n = 160000
    val data = spark.range(n.toLong).select(
      col("id").as("k"),
      (col("id") % 97).cast("double").as("v"))
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    RangeLayout.writeRangeSorted(data, s"$base/sorted", Seq("k"), numFiles = 8)
    data.repartition(8).write.mode("overwrite").parquet(s"$base/hashed")

    def filtered(path: String): DataFrame =
      spark.read.parquet(path).filter(col("k") < (n / 8).toLong)

    // identical result rows either way — layout never changes content
    assert(filtered(s"$base/sorted").count() === filtered(s"$base/hashed").count())

    val sortedRows = materializedRows(filtered(s"$base/sorted"))
    val hashedRows = materializedRows(filtered(s"$base/hashed"))
    // sorted: the 1/8 key slice lives in ~1 of 8 files, footer stats skip
    // the rest; hashed: every file spans the full key range, nothing skips
    assert(hashedRows >= n * 9L / 10, s"hash layout should materialize ~all rows, got $hashedRows")
    assert(sortedRows * 4 <= hashedRows,
      s"range layout should materialize a fraction of the hash layout's rows " +
        s"(sorted=$sortedRows hashed=$hashedRows)")
  }

  test("z-order layout: BOTH interleaved columns skip; single-key range layout only one") {
    // a 400x400 grid: x and y are independent uniform dimensions
    val n = 160000
    val grid = spark.range(n.toLong).select(
      (col("id") % 400).as("x"),
      (col("id") / 400).as("y"),
      col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    RangeLayout.writeZOrdered(grid, s"$base/z", Seq("x", "y"), numFiles = 16)
    RangeLayout.writeRangeSorted(grid, s"$base/byx", Seq("x"), numFiles = 16)

    def slice(path: String, c: String): DataFrame =
      spark.read.parquet(path).filter(col(c) < 50) // 1/8 of either dimension

    // layout never changes content
    for (c <- Seq("x", "y"))
      assert(slice(s"$base/z", c).count() === slice(s"$base/byx", c).count())

    val zX = materializedRows(slice(s"$base/z", "x"))
    val zY = materializedRows(slice(s"$base/z", "y"))
    val byxX = materializedRows(slice(s"$base/byx", "x"))
    val byxY = materializedRows(slice(s"$base/byx", "y"))
    // the x-range layout is perfect on x...
    assert(byxX * 4 <= n, s"range-by-x should skip the x slice, got $byxX")
    // ...and helpless on y (every file spans the full y range)
    assert(byxY >= n * 9L / 10, s"range-by-x should materialize ~all rows for y, got $byxY")
    // z-order skips BOTH: each file's min/max stays narrow in x AND y
    assert(zX * 2 <= n, s"z layout should skip the x slice, got $zX / $n")
    assert(zY * 2 <= n, s"z layout should skip the y slice, got $zY / $n")
    assert(zY * 2 <= byxY, s"z ($zY) should beat range-by-x ($byxY) on the y predicate")
  }

  test("zValue: rank quantization is skew-proof and null-safe") {
    // heavily skewed x (90% zeros) + a null row: quantile buckets still
    // spread the non-zero tail; nulls land in bucket 0 (nulls-first)
    val skewed = spark.range(10000L).select(
      when(col("id") % 10 === 0, col("id")).otherwise(lit(0L)).as("x"),
      col("id").as("y"))
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], 99999L)).toDF("x", "y"))
    val z = skewed.withColumn("z", RangeLayout.zValue(skewed, Seq("x", "y"), bits = 4))
    assert(z.filter(col("x").isNull && col("z").isNotNull).count() === 1L,
      "null key must still get a z-value")
    // more than one distinct z despite the 90% tie mass
    assert(z.select("z").distinct().count() > 16L)
  }

  // vals, not defs: `fact("fk")` must reference the same instantiation
  // that sits in the join, or dataset-apply resolution fails
  private lazy val dim = Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L).toDF("k")
  private lazy val fact = (0L until 1000L).map(i => (i % 50, i)).toDF("fk", "payload")

  test("bloomSemiJoin equals the plain semi join (false positives removed)") {
    val viaBloom = BloomPrefilter.bloomSemiJoin(fact, "fk", dim, "k", expectedItems = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = fact.join(dim, fact("fk") === dim("k"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom === plain)
    assert(viaBloom.nonEmpty)
  }

  test("bloom prefilter: no false negatives, and it actually filters") {
    val probe = BloomPrefilter.mightContainKeys(dim, "k", col("fk"), 100, 0.02)
    val kept = fact.filter(probe)
    val dimKeys = dim.as[Long].collect().toSet
    val keptKeys = kept.select("fk").as[Long].collect().toSet
    // every dim key < 50 occurs in the fact domain (fk = i % 50)
    assert(dimKeys.subsetOf(keptKeys),
      "bloom false negative: a dim key present in the fact side was dropped")
    // 7 hot keys of 50 → the bitset must kill most of the fact side
    assert(kept.count() < fact.count() / 2,
      "prefilter passed most of the fact side — bitset not filtering")
  }

  test("bloom prefilter rejects non-long keys; V2 sketch self-caps its bitset") {
    val strDim = Seq("a", "b").toDF("k")
    assertThrows[IllegalArgumentException] {
      BloomPrefilter.mightContainKeys(strDim, "k", col("fk"), 10, 0.02)
    }
    // oversizing expectedItems degrades fpp, never driver memory: the V2
    // sketch caps at ~8 MiB, under the maxBloomBytes hard refusal
    val bf = dim.stat.bloomFilter("k", 2000000000L, 0.02)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    assert(bos.size() <= BloomPrefilter.maxBloomBytes)
  }

  private def corpus = Seq(
    // (doc_id, domain, tokens)
    (1L, "en", 10L), (2L, "en", 10L), (3L, "en", 10L), (4L, "en", 10L),
    (5L, "de", 10L), (6L, "de", 10L), (7L, "de", 10L),
    (8L, "xx", 10L) // not in the mixture → dropped
  ).toDF("doc_id", "lang", "n_tokens")

  test("mixtureSample: budgets hold per domain and are maximal in hash order") {
    // total = 80 tokens; budget = 1/2 → 40; en 3/4 → 30, de 1/4 → 10
    val out = Curation.mixtureSample(corpus, "doc_id", "lang", "n_tokens",
      weights = Map("en" -> 3L, "de" -> 1L), budgetNumer = 1L, budgetDenom = 2L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"))).toList
    val byDomain = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byDomain === Map("en" -> 3, "de" -> 1),
      s"en budget 30 = 3 docs, de budget 10 = 1 doc; got $byDomain")
    assert(!out.exists(_._2 == "xx"), "unweighted domain must be dropped")
    // maximality: the selected de doc is the FIRST in (md5(id), id) order
    val deOrder = corpus.filter(col("lang") === "de")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(out.filter(_._2 == "de").map(_._1) === List(deOrder.head))
  }

  test("mixtureSample is deterministic across invocations and guards overflow") {
    def run() = Curation.mixtureSample(corpus, "doc_id", "lang", "n_tokens",
      Map("en" -> 3L, "de" -> 1L), 1L, 2L)
      .orderBy("doc_id").collect().toSeq
    assert(run() === run())
    assertThrows[IllegalArgumentException] {
      Curation.mixtureSample(corpus, "doc_id", "lang", "n_tokens",
        Map("en" -> 2000000L), 1L, 2L)
    }
  }

  test("training shards: lossless, content-derived membership, physically ordered, stable under corpus edits") {
    import graft.sources.TrainingShards
    val rows = (1L to 500L).map(i => (i, s"doc number $i body")).toDF("id", "text")
    val out = "target/test_training_shards"
    TrainingShards.writeShards(rows, "id", 4, out)
    val back = spark.read.parquet(out)
    // lossless: every row lands in exactly one shard, ids intact
    assert(back.count() == 500L)
    assert(back.select("id").as[Long].collect().sorted.toSeq == (1L to 500L).toSeq)
    val shards = back.select("shard").distinct().as[Int].collect().sorted
    assert(shards.toSeq == Seq(0, 1, 2, 3), s"4 shards expected: ${shards.toSeq}")
    // membership is a pure function of the id — recompute and compare
    val expected = rows.select($"id", TrainingShards.shardId($"id", 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    back.select("id", "shard").collect()
      .foreach(r => assert(r.getInt(1) == expected(r.getLong(0))))
    // physical within-file order IS the order key's sort order: read each
    // shard dir alone (single file written by one task) and check the raw
    // row sequence, not an orderBy
    (0 until 4).foreach { sh =>
      val ords = spark.read.parquet(s"$out/shard=$sh").select("ord")
        .collect().map(_.getString(0))
      assert(ords.toSeq == ords.sorted.toSeq,
        s"shard $sh must be physically sorted by ord")
    }
    // removing OTHER rows never moves survivors between shards
    TrainingShards.writeShards(rows.filter($"id" <= 250), "id", 4, out + "_half")
    spark.read.parquet(out + "_half").select("id", "shard").collect()
      .foreach(r => assert(r.getInt(1) == expected(r.getLong(0)),
        s"id ${r.getLong(0)} moved shards after corpus shrink"))
    // house guards
    assertThrows[IllegalArgumentException] {
      TrainingShards.writeShards(rows.withColumn("ord", lit("x")), "id", 4, out)
    }
    assertThrows[IllegalArgumentException] {
      TrainingShards.writeShards(rows, "id", 0, out)
    }
  }
}
