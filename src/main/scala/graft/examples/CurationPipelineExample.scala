package graft.examples

import org.apache.spark.sql.SparkSession

import graft.config.ConfigLoader
import graft.io.SparkIO
import graft.service.Pipeline

/** The README's flagship feature, runnable: a YAML string alone drives the
  * full LLM-curation path (quality filter -> clean -> fuzzy dedup ->
  * decontaminate -> lang id -> text stats -> sequence packing) against a
  * real parquet source through the real filesystem IO adapter. Mirrors the
  * README's `## YAML-only curation pipeline` example with live testdata
  * paths (the README variant itself is parsed + resolved by DocsParitySpec
  * on every build, so the two can't drift semantically).
  *
  *   sbt "runMain graft.examples.CurationPipelineExample [docsParquet] [dstRoot]"
  *
  * Defaults: sf0.01 documents -> target/curation_out. The eval corpus for
  * decontamination is synthesized first (a handful of docs sampled from the
  * source, exactly how a benchmark-contamination check is wired in
  * practice: eval set on disk, training corpus filtered against it).
  */
object CurationPipelineExample {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.01/documents.parquet")
    val dst = args.lift(1).getOrElse("target/curation_out")
    val evalPath = s"$dst/eval_corpus.parquet"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-curation-example")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stand-in eval benchmark: 5 deterministic docs from the corpus — their
    // training twins must be dropped by the decontaminate stage
    spark.read.parquet(src)
      .orderBy("doc_id").limit(5)
      .write.mode("overwrite").parquet(evalPath)

    val yaml =
      s"""process_name: corpus_curation
         |src_path: $src
         |dst_root: $dst
         |src_file_type: parquet
         |dst_file_type: parquet
         |validation:
         |  text_not_null:
         |    - text
         |    - is_not_null
         |custom_transformations:
         |  quality_filter:          # Gopher-style heuristics; drop failing rows
         |    text_col: text
         |    min_tokens: 5
         |  clean_text:              # HTML strip + URL/email/phone redaction
         |    text_col: text
         |  fuzzy_dedup:             # MinHash-LSH -> connected components -> 1 per cluster
         |    id_col: doc_id
         |    text_col: text
         |    shingle_k: 3
         |    num_hashes: 16
         |    bands: 8
         |  decontaminate:           # drop rows whose n-grams overlap the eval corpus
         |    id_col: doc_id
         |    text_col: text
         |    eval_path: $evalPath
         |    threshold: 0.8
         |  lang_id:                 # n-gram-marker language ID column
         |    text_col: text
         |  text_stats:              # token counts + quality-signal columns
         |    text_col: text
         |  pack_sequences:          # concatenate-and-cut into fixed token budgets
         |    id_col: doc_id
         |    token_col: n_tokens
         |    partition_col: lang_pred
         |    budget: 512
         |select_cols: "*"
         |""".stripMargin

    val t0 = System.nanoTime()
    val res = Pipeline.runPipeline(spark, ConfigLoader.fromYaml(yaml), new SparkIO)
    val kept = res.transformed.count()
    val total = spark.read.parquet(src).count()
    println(f"curated $total%d -> $kept%d docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println(s"guid=${res.guid} artifacts under ${res.outputRoot}")
    res.transformed
      .select("doc_id", "lang_pred", "n_tokens", "bin", "bin_offset")
      .show(5, truncate = false)
    spark.stop()
  }
}
