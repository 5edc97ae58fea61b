package graft.config

import scala.collection.immutable.ListMap

/** Config-from-data loader: YAML / plain maps -> [[GeneralConfig]].
  *
  * The reference's entire user surface is a config dict compiled into a
  * pipeline — `GeneralConfig.from_dict` filters the dict to known fields
  * (unknown keys DROPPED, reference: src/polars_pipe/core/config.py:65-68)
  * and `TransformConfig.from_dict` compiles filter rules and dtype names
  * (reference: src/polars_pipe/core/transform.py:38-48). This is the Spark
  * twin: a user with a YAML file (or any `Map[String, Any]`) can drive the
  * engine without writing Scala.
  *
  * [[YamlParse]] is the inverse of [[YamlEmit]] — same minimal YAML subset
  * (block maps/lists by 2-space indent, inline `{}`/`[]`, double-quoted
  * strings, plain scalars). No YAML lib is in the dependency budget; the
  * emit->parse round trip is locked by ConfigLoaderSpec.
  */
object YamlParse {

  /** Parse a YAML document produced by [[YamlEmit]] (or hand-written in the
    * same subset). Maps come back as insertion-ordered `ListMap` — key order
    * is semantic (column-creation order is observable in output schemas).
    * Inline ` # comment` tails are stripped (hand-written configs annotate
    * stages that way); safe for the round trip because [[YamlEmit]] quotes
    * every string containing `#`. */
  def parse(text: String): Any = {
    val lines = text.linesIterator.zipWithIndex
      .map { case (l, i) => (stripInlineComment(l), i + 1) }
      .filter { case (l, _) =>
        val t = l.trim
        t.nonEmpty && !t.startsWith("#")
      }
      .map { case (l, n) =>
        val indent = l.takeWhile(_ == ' ').length
        require(indent % 2 == 0, s"line $n: odd indentation (emit uses 2-space steps)")
        Line(indent / 2, l.trim, n)
      }
      .toVector
    if (lines.isEmpty) ListMap.empty[String, Any]
    else {
      val (value, next) = parseBlock(lines, 0, lines.head.depth)
      // a mis-indented key would end the top-level block early; silently
      // dropping the remainder means a silently-skipped pipeline stage
      require(next == lines.length,
        s"line ${lines(next).n}: unreachable content after the top-level block " +
          s"(mis-indented? '${lines(next).content}')")
      value
    }
  }

  private final case class Line(depth: Int, content: String, n: Int)

  /** Cut an unquoted `# ...` tail: a comment starts at `#` at line start or
    * preceded by whitespace, outside double quotes (YAML's rule — `a#b` is
    * one scalar, `a #b` is `a` plus a comment). */
  private def stripInlineComment(l: String): String = {
    var i = 0
    var inQuote = false
    while (i < l.length) {
      val c = l(i)
      if (inQuote) {
        if (c == '\\') i += 1
        else if (c == '"') inQuote = false
      } else if (c == '"') inQuote = true
      else if (c == '#' && (i == 0 || l(i - 1) == ' ' || l(i - 1) == '\t'))
        return l.substring(0, i)
      i += 1
    }
    l
  }

  /** Parse the block starting at `i` whose lines sit at `depth`; returns
    * (value, next index). */
  private def parseBlock(ls: Vector[Line], i: Int, depth: Int): (Any, Int) =
    if (ls(i).content == "-" || ls(i).content.startsWith("- ")) parseList(ls, i, depth)
    else parseMap(ls, i, depth)

  private def parseList(ls: Vector[Line], start: Int, depth: Int): (Seq[Any], Int) = {
    var i = start
    val out = Vector.newBuilder[Any]
    while (i < ls.length && ls(i).depth == depth &&
      (ls(i).content == "-" || ls(i).content.startsWith("- "))) {
      val l = ls(i)
      if (l.content == "-") {
        // nested collection item: block follows at a deeper indent
        require(i + 1 < ls.length && ls(i + 1).depth > depth,
          s"line ${l.n}: bare '-' with no nested block")
        val (v, next) = parseBlock(ls, i + 1, ls(i + 1).depth)
        out += v
        i = next
      } else {
        out += scalar(l.content.drop(2).trim, l.n)
        i += 1
      }
    }
    (out.result(), i)
  }

  private def parseMap(ls: Vector[Line], start: Int, depth: Int): (ListMap[String, Any], Int) = {
    var i = start
    var out = ListMap.empty[String, Any]
    while (i < ls.length && ls(i).depth == depth && ls(i).content != "-" &&
      !ls(i).content.startsWith("- ")) {
      val l = ls(i)
      val (key, rest) = splitKey(l.content, l.n)
      if (rest.nonEmpty) {
        out = out.updated(key, scalar(rest, l.n))
        i += 1
      } else if (i + 1 < ls.length && ls(i + 1).depth > depth) {
        val (v, next) = parseBlock(ls, i + 1, ls(i + 1).depth)
        out = out.updated(key, v)
        i = next
      } else {
        out = out.updated(key, null) // `key:` with no value and no block
        i += 1
      }
    }
    (out, i)
  }

  /** Split `key: value` / `key:` at the first unquoted colon. */
  private def splitKey(s: String, n: Int): (String, String) = {
    val keyEnd =
      if (s.startsWith("\"")) {
        val close = closingQuote(s, n)
        require(close + 1 < s.length && s(close + 1) == ':', s"line $n: expected ':' after quoted key")
        close + 1
      } else {
        val idx = s.indexOf(':')
        require(idx > 0, s"line $n: expected 'key: value', got '$s'")
        idx
      }
    val rawKey = s.substring(0, keyEnd)
    val key = scalar(rawKey, n).toString
    (key, s.substring(keyEnd + 1).trim)
  }

  private def closingQuote(s: String, n: Int): Int = {
    var i = 1
    while (i < s.length) {
      if (s(i) == '\\') i += 2
      else if (s(i) == '"') return i
      else i += 1
    }
    throw new IllegalArgumentException(s"line $n: unterminated quoted string: $s")
  }

  private val intRe = "[-+]?\\d+".r
  private val dblRe = "[-+]?(\\d+\\.\\d*|\\.\\d+|\\d+)([eE][-+]?\\d+)?".r

  private[config] def scalar(s: String, n: Int): Any = s match {
    case "" | "null" | "~" => null
    case "true" => true
    case "false" => false
    case "{}" => ListMap.empty[String, Any]
    case "[]" => Nil
    case q if q.startsWith("\"") =>
      val close = closingQuote(q, n)
      require(close == q.length - 1, s"line $n: trailing content after quoted scalar: $q")
      unescape(q.substring(1, close))
    case i if intRe.pattern.matcher(i).matches =>
      val bi = BigInt(i)
      if (bi.isValidLong) bi.longValue else i
    case d if dblRe.pattern.matcher(d).matches => d.toDouble
    case other => other
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => b += '\n'
          case 't' => b += '\t' // `sep: "\t"` — the TSV source option spelling
          case c => b += c
        }
        i += 2
      } else { b += s(i); i += 1 }
    }
    b.toString
  }
}

/** `Map[String, Any]` -> config model, tolerant of both shapes the system
  * produces: the reference's dict forms and [[YamlEmit]]'s emitted forms. */
object ConfigLoader {

  /** Parse a YAML document into a ready-to-run [[GeneralConfig]]. */
  def fromYaml(text: String): GeneralConfig =
    YamlParse.parse(text) match {
      case m: collection.Map[_, _] => generalFromMap(anyMap(m))
      case other =>
        throw new IllegalArgumentException(s"config YAML root must be a map, got $other")
    }

  private val knownGeneralKeys = Set(
    "process_name", "src_path", "dst_root", "src_file_type", "dst_file_type",
    "src_options", "dst_options",
    "validation", "transformations", "custom_transformations", "select_cols",
    "transformed_data", "error_records", "config", "desc_stats",
    "desc_stats_exact", "guid", "date_time", "pipeline_plan")

  /** Build a [[GeneralConfig]] from a plain map. Unknown keys are DROPPED
    * (reference: core/config.py:65-68 `from_dict` filters to known fields);
    * `guid`/`date_time`/`pipeline_plan` are accepted but normally stamped at
    * run time. */
  def generalFromMap(m: Map[String, Any]): GeneralConfig = {
    val dropped = m.keySet -- knownGeneralKeys
    if (dropped.nonEmpty)
      graft.util.Log.warn(s"config: dropping unknown keys ${dropped.toSeq.sorted.mkString(", ")}")
    def str(k: String): Option[String] = m.get(k).collect { case s: String => s }
    def req(k: String): String =
      str(k).getOrElse(throw new IllegalArgumentException(s"config missing required key '$k'"))
    GeneralConfig(
      processName = req("process_name"),
      srcPath = req("src_path"),
      dstRoot = req("dst_root"),
      srcFileType = str("src_file_type").getOrElse("parquet").toLowerCase,
      dstFileType = str("dst_file_type").getOrElse("parquet").toLowerCase,
      srcOptions = optionsMap(m, "src_options"),
      dstOptions = optionsMap(m, "dst_options"),
      validation = m.get("validation").map(rules).getOrElse(Nil),
      transformations = m.get("transformations").map {
        case t: collection.Map[_, _] => transformFromMap(anyMap(t))
        case null => TransformConfig() // bare `transformations:` with no block
        case other =>
          throw new IllegalArgumentException(s"transformations must be a map, got $other")
      }.getOrElse(TransformConfig()),
      customTransformations = m.get("custom_transformations").map {
        case cm: collection.Map[_, _] =>
          anyMap(cm).toSeq.map { case (k, v) =>
            k -> (v match {
              case kw: collection.Map[_, _] => anyMap(kw)
              case null => Map.empty[String, Any]
              case other =>
                throw new IllegalArgumentException(s"custom transformation '$k' kwargs must be a map, got $other")
            })
          }
        case other => throw new IllegalArgumentException(s"custom_transformations must be a map, got $other")
      }.getOrElse(Nil),
      selectCols = m.get("select_cols") match {
        case Some("*") | None => Seq("*")
        case Some(s: Seq[_]) => s.map(_.toString)
        case Some(other) => throw new IllegalArgumentException(s"select_cols must be '*' or a list, got $other")
      },
      transformedDataDir = str("transformed_data").getOrElse("transformed_data"),
      errorRecordsDir = str("error_records").getOrElse("error_records"),
      configDir = str("config").getOrElse("config"),
      descStatsDir = str("desc_stats").getOrElse("desc_stats"),
      descStatsExact = m.get("desc_stats_exact").collect { case b: Boolean => b }
        .getOrElse(false),
      incremental = m.get("incremental").collect { case b: Boolean => b }.getOrElse(false),
      manifestDir = str("manifest_dir").getOrElse("_manifest"),
      guid = str("guid").getOrElse(""),
      dateTime = str("date_time").getOrElse(""),
      pipelinePlan = m.get("pipeline_plan").collect { case s: Seq[_] => s.map(_.toString) }.getOrElse(Nil)
    )
  }

  /** Reader/writer option map: YAML values arrive typed (Long/Boolean/
    * Double) but Spark's option API is stringly — stringify scalars,
    * reject structures (a nested map inside `sep:` is a config bug, not
    * an option value). */
  private def optionsMap(m: Map[String, Any], key: String): Seq[(String, String)] =
    m.get(key) match {
      case None | Some(null) => Nil
      case Some(om: collection.Map[_, _]) =>
        anyMap(om).toSeq.map {
          case (k, v: String) => k -> v
          case (k, v @ (_: Long | _: Int | _: Double | _: Boolean)) => k -> v.toString
          case (k, other) =>
            throw new IllegalArgumentException(
              s"$key.$k must be a scalar option value, got $other")
        }
      case Some(other) =>
        throw new IllegalArgumentException(s"$key must be a map, got $other")
    }

  /** Build a [[TransformConfig]] from a plain map; compiles filter rules
    * (reference: core/transform.py:42-44) and validates recast dtype names
    * eagerly (reference: core/transform.py:45-47 resolves names through
    * POLARS_DTYPE_MAPPING at config-build time, not first use). */
  def transformFromMap(m: Map[String, Any]): TransformConfig = {
    def strSeq(k: String): Seq[String] =
      m.get(k).collect { case s: Seq[_] => s.map(_.toString) }.getOrElse(Nil)
    def pairSeq(k: String): Seq[(String, Any)] =
      m.get(k).collect { case mm: collection.Map[_, _] => anyMap(mm).toSeq }.getOrElse(Nil)
    val recast = pairSeq("recast_map").map { case (c, v) =>
      val name = v.toString
      graft.expr.DTypes.resolve(name) // fail at config-build time on a bad name
      c -> name
    }
    TransformConfig(
      dropCols = strSeq("drop_cols"),
      renameMap = pairSeq("rename_map").map { case (k, v) => k -> v.toString },
      recastMap = recast,
      fillMap = pairSeq("fill_map"),
      clipMap = pairSeq("clip_map").map {
        case (c, Seq(lo, hi)) => c -> ((lo, hi): (Any, Any))
        case (c, other) =>
          throw new IllegalArgumentException(s"clip_map['$c'] must be [lo, hi], got $other")
      },
      filterRules = m.get("filter_exprs").map(rules).getOrElse(Nil),
      newColMap = pairSeq("new_col_map").map {
        case (name, spec: collection.Map[_, _]) =>
          val sm = anyMap(spec)
          val fn = sm.getOrElse("fn_name",
            throw new IllegalArgumentException(s"new_col_map['$name'] missing fn_name")).toString
          val kwargs = sm.get("fn_kwargs") match {
            case Some(kw: collection.Map[_, _]) => anyMap(kw)
            case _ => Map.empty[String, Any]
          }
          name -> DeriveSpec(fn, kwargs)
        case (name, other) =>
          throw new IllegalArgumentException(s"new_col_map['$name'] must be {fn_name, fn_kwargs}, got $other")
      },
      dedupeCols = strSeq("dedupe_cols"),
      unnestCols = strSeq("unnest_cols"),
      nestCols = pairSeq("nest_cols").map {
        case (k, s: Seq[_]) => k -> s.map(_.toString)
        case (k, other) =>
          throw new IllegalArgumentException(s"nest_cols['$k'] must be a list of columns, got $other")
      }
    )
  }

  /** Rules in either shape: a `name -> [col, op, value?]` map (the
    * reference's dict form, core/validation.py:89-116) or a list — of
    * single-entry maps ([[YamlEmit]]'s validation form) or of bare
    * `[col, op, value?]` triples (its filter_exprs form, names generated). */
  private def rules(v: Any): Seq[RuleSpec] = v match {
    case m: collection.Map[_, _] =>
      anyMap(m).toSeq.map { case (name, spec) => ruleFromSeq(name, spec) }
    case s: Seq[_] =>
      s.zipWithIndex.map {
        case (m: collection.Map[_, _], _) =>
          val entries = anyMap(m).toSeq
          require(entries.size == 1, s"rule entry must be a single-key map, got $entries")
          ruleFromSeq(entries.head._1, entries.head._2)
        case (spec: Seq[_], i) => ruleFromSeq(s"rule_$i", spec)
        case (other, _) =>
          throw new IllegalArgumentException(s"unrecognized rule entry: $other")
      }
    case other => throw new IllegalArgumentException(s"rules must be a map or list, got $other")
  }

  private def ruleFromSeq(name: String, spec: Any): RuleSpec = spec match {
    case s: Seq[_] if s.size == 2 || s.size == 3 =>
      RuleSpec(name, s.head.toString, s(1).toString, s.drop(2).headOption)
    case other =>
      throw new IllegalArgumentException(s"rule '$name' must be [col, op] or [col, op, value], got $other")
  }

  private def anyMap(m: collection.Map[_, _]): Map[String, Any] =
    ListMap(m.toSeq.map { case (k, v) => k.toString -> (v: Any) }: _*)
}
