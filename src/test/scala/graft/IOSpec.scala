package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.SparkIO
import graft.stages.Transforms

class IOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val io = new SparkIO
  private def tmpDir(prefix: String) = {
    val d = Files.createTempDirectory(
      java.nio.file.Paths.get("target"), prefix).toString
    d
  }

  test("parquet/csv/json/orc write-read round trips") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    for (fmt <- Seq("parquet", "csv", "json", "orc")) {
      val dir = tmpDir(s"io_$fmt") + "/data"
      io.write(df, dir, fmt)
      val back = io.read(spark, dir, fmt)
      assert(back.count() == 2, s"$fmt round trip")
      val row = back.filter($"id" === 1).head()
      assert(row.getAs[String]("s") == "a" && row.getAs[Double]("v") == 1.5)
    }
  }

  test("unsupported format throws") {
    intercept[IllegalArgumentException](io.read(spark, "/x", "avro"))
  }

  test("chunked sink honors maxRecordsPerFile for small targets") {
    val df = spark.range(1000).toDF("id")
    val dir = tmpDir("io_chunk") + "/data"
    // tiny target -> estimated rows-per-file caps files
    io.write(df.repartition(1), dir, "parquet", targetSizeGb = 3e-6)
    val parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts > 1, s"expected multiple part files, got $parts")
  }

  test("write options pass through: zstd parquet files on disk, csv sep honored on read") {
    val io = new graft.io.SparkIO
    val dir = java.nio.file.Files.createTempDirectory("graft-io-opts").toString
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    io.write(df, s"$dir/zstd", "parquet", options = Map("compression" -> "zstd"))
    val files = new java.io.File(s"$dir/zstd").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")),
      s"zstd compression option must reach the parquet writer: ${files.toSeq}")
    assert(io.read(spark, s"$dir/zstd", "parquet").count() == 2)
    // reader options: a semicolon-separated csv parses as ONE column
    // without the option and two with it
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"), "k;v\n1;a\n2;b\n")
    assert(io.read(spark, s"$dir/data.csv", "csv").columns.length == 1)
    val sep = io.read(spark, s"$dir/data.csv", "csv", Map("sep" -> ";"))
    assert(sep.columns.toSeq == Seq("k", "v") && sep.count() == 2)
  }

  test("custom transformations pipe in order and fail fast on unknown names") {
    val df = Seq(1, 2, 3).toDF("v")
    val registry: Map[String, Transforms.CustomFn] = Map(
      "double" -> ((d, _) => d.withColumn("v", $"v" * 2)),
      "add_n" -> ((d, kw) => d.withColumn("v", $"v" + kw("n").asInstanceOf[Int])))
    val out = Transforms.pipeCustomTransformations(
      registry, Seq("double" -> Map.empty, "add_n" -> Map("n" -> 10)))(df)
    assert(out.select("v").as[Int].collect().sorted.toSeq == Seq(12, 14, 16))
    intercept[NoSuchElementException] {
      Transforms.pipeCustomTransformations(registry, Seq("nope" -> Map.empty))(df)
    }
  }
}
