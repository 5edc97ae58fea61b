package graft.config

/** Config model: the engine's "query language".
  *
  * Mirrors the capability surface of the reference's attrs-based config
  * (reference: src/polars_pipe/core/config.py:15-71 `GeneralConfig`,
  * src/polars_pipe/core/transform.py:26-48 `TransformConfig`) re-expressed as
  * Scala case classes. Stage parameter containers default to empty, which
  * means "stage skipped" — the same uniform no-op convention the reference
  * uses (transform.py:136-138).
  *
  * Ordered `Seq[(K, V)]` is used instead of `Map` wherever the reference
  * relies on insertion order (Python dicts are ordered; column-creation
  * order is observable in the output schema).
  */

/** One validation / filter rule: `[col, op, value]` with a display name.
  * Reference: core/validation.py:89-116 (`parse_validation_config`). */
final case class RuleSpec(name: String, col: String, op: String, value: Option[Any] = None)

object RuleSpec {
  /** name -> [col, op] (nullary op, e.g. is_not_null). */
  def apply(name: String, col: String, op: String): RuleSpec = RuleSpec(name, col, op, None)
}

/** One derived column: registry function name + kwargs.
  * Reference: core/transform.py:287-293 (`{"fn_name": ..., "fn_kwargs": ...}`). */
final case class DeriveSpec(fnName: String, kwargs: Map[String, Any] = Map.empty)

/** Per-stage parameters for the transformation chain.
  * Reference: core/transform.py:26-48. Empty container == stage skipped. */
final case class TransformConfig(
    dropCols: Seq[String] = Nil,
    renameMap: Seq[(String, String)] = Nil,
    recastMap: Seq[(String, String)] = Nil,
    fillMap: Seq[(String, Any)] = Nil,
    clipMap: Seq[(String, (Any, Any))] = Nil,
    filterRules: Seq[RuleSpec] = Nil,
    newColMap: Seq[(String, DeriveSpec)] = Nil,
    dedupeCols: Seq[String] = Nil,
    unnestCols: Seq[String] = Nil,
    nestCols: Seq[(String, Seq[String])] = Nil
)

/** Top-level pipeline config.
  * Reference: core/config.py:15-71. `guid`/`dateTime` are stamped by the
  * pipeline at run time (basic_pipeline.py:20-22), not user-supplied.
  * `pipelinePlan` is filled post-hoc with the optimized-plan text
  * (basic_pipeline.py:79). */
final case class GeneralConfig(
    processName: String,
    srcPath: String,
    dstRoot: String,
    srcFileType: String = "parquet",
    dstFileType: String = "parquet",
    /** Reader/writer option passthrough (reference `**kwargs`,
      * adapters/io_pl.py:28-56 / io_funcs.py:32-34): forwarded verbatim to
      * the Spark DataFrameReader/Writer AFTER the format defaults — e.g.
      * `src_options: {sep: "\t"}` for a TSV source, `dst_options:
      * {compression: zstd}` for a zstd parquet sink. Ordered Seq like the
      * other config maps (emit order is observable in the YAML artifact). */
    srcOptions: Seq[(String, String)] = Nil,
    dstOptions: Seq[(String, String)] = Nil,
    validation: Seq[RuleSpec] = Nil,
    transformations: TransformConfig = TransformConfig(),
    customTransformations: Seq[(String, Map[String, Any])] = Nil,
    selectCols: Seq[String] = Seq("*"),
    transformedDataDir: String = "transformed_data",
    errorRecordsDir: String = "error_records",
    configDir: String = "config",
    descStatsDir: String = "desc_stats",
    /** Exact (interpolated) describe quantiles like the reference's
      * `lf.describe()`, vs the default fixed-memory approx_percentile
      * sketch — the 100 TB-safe default (see Inspect.describe). */
    descStatsExact: Boolean = false,
    /** Incremental runs (round 17): process only source FILES not yet in
      * the run manifest at `dstRoot/manifestDir` — the periodic-crawl
      * shape (a new batch of files lands in the same source directory;
      * re-running the pipeline touches only the new ones, and the union
      * of incremental outputs equals the one-shot full run). The
      * manifest is a plain relation `(src_file, guid, processed_at)`
      * written through the IO seam, so it survives restarts and reads
      * back anywhere. SINGLE-WRITER contract: the manifest update is a
      * read-merge-overwrite, so two incremental runs sharing one
      * `dstRoot` must not run concurrently — the loser's file records
      * would be dropped and its batch reprocessed next run (safe
      * direction: duplicate WORK, never skipped data — outputs land
      * under distinct GUIDs either way). Serialize crawl runs per
      * dstRoot, as every scheduler-driven ingestion naturally does. */
    incremental: Boolean = false,
    manifestDir: String = "_manifest",
    guid: String = "",
    dateTime: String = "",
    pipelinePlan: Seq[String] = Nil
) {
  require(
    FileType.data.contains(srcFileType.toLowerCase) && FileType.data.contains(dstFileType.toLowerCase),
    s"src/dst file types must be one of ${FileType.data.mkString(",")} " +
      "(yaml is the config-artifact format, not a data source/sink)"
  )
}

/** Supported source/sink formats (reference: adapters/io_funcs.py:23-35 +
  * the FileType enum in core/config.py). */
object FileType {
  val Parquet = "parquet"
  val Csv = "csv"
  val Json = "json"
  /** Beyond the reference's parquet/csv/json (adapters/io_pl.py:28-36):
    * ORC is Spark-native (columnar, predicate pushdown, splittable) and
    * costs one dispatch arm — a 100 TB lakehouse routinely carries it. */
  val Orc = "orc"
  val Yaml = "yaml"
  /** Formats a pipeline source/sink can dispatch on. */
  val data: Set[String] = Set(Parquet, Csv, Json, Orc)
  val all: Set[String] = data + Yaml
}

/** Minimal YAML emitter for the config artifact sink (S25). The reference
  * dumps the full config dict via yaml.safe_dump (adapters/io_funcs.py:37-40);
  * we hand-roll the emit (no YAML lib in the dependency budget). */
object YamlEmit {
  private def scalar(v: Any): String = v match {
    case null => "null"
    case s: String =>
      // also quote strings a YAML parser would read back as a non-string
      // (booleans, null, numbers) — "true"/"007"/"null" must survive the
      // round trip as strings
      val ambiguous = s.toLowerCase match {
        case "true" | "false" | "yes" | "no" | "on" | "off" | "null" | "~" => true
        case other => other.matches(
          "[-+]?((\\d[\\d_]*)?\\.?\\d+([eE][-+]?\\d+)?|0x[0-9a-f]+|0o[0-7]+|0b[01_]+|\\.inf|\\.nan)") ||
          other.matches("\\d{4}-\\d{1,2}-\\d{1,2}([tT ].*)?") || // YAML 1.1 timestamps
          other.matches("[-+]?\\d+(:\\d+)+(\\.\\d+)?") // sexagesimal
      }
      val needsQuote = s.isEmpty || s.trim != s || ambiguous ||
        s.exists(c => ":#{}[],\"'\n\t".contains(c)) ||
        "-?&*!|>%@".contains(s.head)
      if (needsQuote)
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\t", "\\t") + "\""
      else s
    case b: Boolean => b.toString
    case n: Number => n.toString
    case other => scalar(other.toString)
  }

  def emit(value: Any, indent: Int = 0): String = {
    val pad = "  " * indent
    value match {
      case m: Map[_, _] if m.isEmpty => pad + "{}"
      case m: Map[_, _] =>
        m.map { case (k, v) =>
          v match {
            case _: Map[_, _] | _: Seq[_] if nonEmptyColl(v) =>
              s"$pad${scalar(k)}:\n${emit(v, indent + 1)}"
            case _ => s"$pad${scalar(k)}: ${inline(v)}"
          }
        }.mkString("\n")
      case s: Seq[_] if s.isEmpty => pad + "[]"
      case s: Seq[_] =>
        s.map {
          case v @ (_: Map[_, _] | _: Seq[_]) if nonEmptyColl(v) =>
            s"$pad-\n${emit(v, indent + 1)}"
          case v => s"$pad- ${inline(v)}"
        }.mkString("\n")
      case other => pad + scalar(other)
    }
  }

  private def nonEmptyColl(v: Any): Boolean = v match {
    case m: Map[_, _] => m.nonEmpty
    case s: Seq[_] => s.nonEmpty
    case _ => false
  }

  private def inline(v: Any): String = v match {
    case m: Map[_, _] if m.isEmpty => "{}"
    case s: Seq[_] if s.isEmpty => "[]"
    case other => scalar(other)
  }

  /** GeneralConfig -> ordered YAML-able map (mirrors config.py field order). */
  def configToMap(cfg: GeneralConfig): Map[String, Any] = {
    // LinkedHashMap-like ordering via ListMap
    scala.collection.immutable.ListMap(
      "guid" -> cfg.guid,
      "date_time" -> cfg.dateTime,
      "process_name" -> cfg.processName,
      "src_path" -> cfg.srcPath,
      "dst_root" -> cfg.dstRoot,
      "src_file_type" -> cfg.srcFileType.toUpperCase,
      "dst_file_type" -> cfg.dstFileType.toUpperCase,
      "src_options" -> scala.collection.immutable.ListMap(cfg.srcOptions: _*),
      "dst_options" -> scala.collection.immutable.ListMap(cfg.dstOptions: _*),
      // rule values keep their NATIVE type (not .toString): the emitter
      // quotes number-like strings, so a stringified 0.0 would round-trip
      // through ConfigLoader as the string "0.0" instead of a double
      "validation" -> cfg.validation.map(r =>
        scala.collection.immutable.ListMap(
          r.name -> (Seq[Any](r.col, r.op) ++ r.value.toSeq))),
      "transformations" -> transformToMap(cfg.transformations),
      // name -> kwargs, like the reference's custom_transformations dict —
      // without this the emit -> load round trip silently dropped the
      // user's custom stages (the fns themselves are code, looked up by
      // name from the customFns map at run time)
      "custom_transformations" -> scala.collection.immutable.ListMap(
        cfg.customTransformations: _*),
      "select_cols" -> cfg.selectCols,
      "transformed_data" -> cfg.transformedDataDir,
      "error_records" -> cfg.errorRecordsDir,
      "config" -> cfg.configDir,
      "desc_stats" -> cfg.descStatsDir,
      "desc_stats_exact" -> cfg.descStatsExact,
      "incremental" -> cfg.incremental,
      "manifest_dir" -> cfg.manifestDir,
      "pipeline_plan" -> cfg.pipelinePlan
    )
  }

  private def transformToMap(t: TransformConfig): Map[String, Any] =
    scala.collection.immutable.ListMap(
      "drop_cols" -> t.dropCols,
      "rename_map" -> scala.collection.immutable.ListMap(t.renameMap: _*),
      "recast_map" -> scala.collection.immutable.ListMap(t.recastMap: _*),
      "fill_map" -> scala.collection.immutable.ListMap(t.fillMap: _*),
      "clip_map" -> scala.collection.immutable.ListMap(t.clipMap.map { case (k, (lo, hi)) => k -> Seq(lo, hi) }: _*),
      // list of single-key name -> rule maps, the same shape as validation
      // above: names survive the emit -> load round trip AND duplicate
      // names can't silently collapse (a name-keyed map kept only the
      // last rule per name)
      "filter_exprs" -> t.filterRules.map(r =>
        scala.collection.immutable.ListMap(
          r.name -> (Seq[Any](r.col, r.op) ++ r.value.toSeq))),
      "new_col_map" -> scala.collection.immutable.ListMap(t.newColMap.map { case (k, d) =>
        k -> scala.collection.immutable.ListMap("fn_name" -> d.fnName, "fn_kwargs" -> d.kwargs)
      }: _*),
      "dedupe_cols" -> t.dedupeCols,
      "unnest_cols" -> t.unnestCols,
      "nest_cols" -> scala.collection.immutable.ListMap(t.nestCols: _*)
    )
}
