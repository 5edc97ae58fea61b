package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{DeriveSpec, RuleSpec}
import graft.expr.{DTypes, ExprRegistry, RuleParser}

/** The transformation-stage operators (SURVEY.md §2.1, S4-S5 and S9-S22).
  *
  * Every stage is a pure `DataFrame => DataFrame`, chained with
  * `df.transform(...)` — the idiomatic Spark analogue of the reference's
  * `LazyFrame.pipe` composition (reference: src/polars_pipe/services/
  * basic_pipeline.py:30-77). Stages no-op on empty parameters, mirroring the
  * reference's uniform early-exit pattern (core/transform.py:136-138).
  *
  * Everything here is pure logical-plan construction over `Column`
  * expressions — Catalyst fuses adjacent projections (CollapseProject),
  * prunes columns and pushes predicates into the scan, so composing 16
  * stages costs nothing at run time.
  */
object Transforms {

  /** Columns prefixed this way are engine metadata/lineage: excluded from
    * hashing and string normalisation, forced last in the final projection
    * (reference: core/transform.py:60,107; services/basic_pipeline.py:70-75). */
  val SysColPrefix = "sys_col_"
  val RowHashCol = "sys_col_row_hash"

  private def isSys(name: String): Boolean = name.startsWith(SysColPrefix)

  // S4 ------------------------------------------------------------------
  /** Deterministic row hash of all non-sys columns -> `sys_col_row_hash`.
    *
    * Struct/array/map columns are JSON-encoded, everything else cast to
    * string, then xxhash64 over the field list (reference:
    * core/transform.py:51-74). Idempotent: if the column already exists the
    * frame passes through unchanged (transform.py:57-58 — golden case 3
    * depends on this).
    *
    * Deliberate deviation from the reference (SURVEY.md §2.3-1): the
    * reference's `concat_str` propagates nulls so every row containing any
    * null gets the identical hash — a bug-for-bug quirk we do NOT replicate.
    * Each field is coalesced to a `\u0000` (NUL) sentinel, so distinct rows get
    * distinct hashes. Hash *values* can't match Polars either way (its
    * `.hash()` is implementation-defined xxh3).
    */
  def addHashCol(df: DataFrame): DataFrame =
    if (df.columns.contains(RowHashCol)) df
    else {
      val parts: Seq[Column] = df.schema.fields.toSeq.filterNot(f => isSys(f.name)).map { f =>
        f.dataType match {
          case _: StructType | _: ArrayType | _: MapType =>
            coalesce(to_json(col(f.name)), lit("\u0000"))
          case _ => coalesce(col(f.name).cast(StringType), lit("\u0000"))
        }
      }
      df.withColumn(RowHashCol, xxhash64(parts: _*))
    }

  // S5 ------------------------------------------------------------------
  /** Lineage literal columns: `sys_col_{process}_guid`, `_src_path`,
    * `_datetime` (reference: core/transform.py:77-96). */
  def addProcessCols(
      processName: String,
      guid: String,
      srcPath: String,
      dateTime: java.sql.Timestamp
  )(df: DataFrame): DataFrame =
    df.withColumns(Map(
      s"sys_col_${processName}_guid" -> lit(guid),
      s"sys_col_${processName}_src_path" -> lit(srcPath),
      s"sys_col_${processName}_datetime" -> lit(dateTime)
    ))

  // S9 ------------------------------------------------------------------
  /** Strip + lowercase every string column not prefixed `sys_col_`
    * (reference: core/transform.py:99-109). */
  def normaliseStrCols(df: DataFrame): DataFrame = {
    val targets = df.schema.fields.collect {
      case f if f.dataType == StringType && !isSys(f.name) => f.name
    }
    if (targets.isEmpty) df
    else df.withColumns(targets.map(n => n -> lower(trim(col(n)))).toMap)
  }

  // S10 -----------------------------------------------------------------
  /** Keep-any dedupe on a column subset; `["*"]` or empty = all columns
    * (reference: core/transform.py:232-241). The reference's
    * `maintain_order=True` has no Spark analogue — row order is not defined
    * on a distributed DataFrame; comparisons must be order-insensitive
    * (SURVEY.md §2.3-2). */
  def deduplicateRows(subset: Seq[String])(df: DataFrame): DataFrame =
    if (subset.isEmpty) df
    else if (subset == Seq("*")) df.dropDuplicates()
    else df.dropDuplicates(subset)

  /** Keep-FIRST dedup (polars `unique(keep="first")`, SQL DISTINCT ON):
    * one row per `subset` group — the earliest by `orderBy` — selected
    * deterministically. Spark's `dropDuplicates` keeps an arbitrary row;
    * this keeps a defined one, at the cost of a per-group sort (single
    * window shuffle on `subset`, no global sort). `orderBy` must make rows
    * unique within a group for full determinism. */
  def deduplicateRowsKeepFirst(subset: Seq[String], orderBy: Seq[String])(
      df: DataFrame): DataFrame = {
    require(subset.nonEmpty && subset != Seq("*"),
      "keep-first dedup needs explicit subset columns")
    require(orderBy.nonEmpty, "keep-first dedup needs an explicit order")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(subset.map(col): _*).orderBy(orderBy.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // S11 -----------------------------------------------------------------
  /** Expand struct columns to top level, preserving column position
    * (reference: core/transform.py:207-216). */
  def unnestCols(cols0: Seq[String])(df: DataFrame): DataFrame =
    if (cols0.isEmpty) df
    else {
      val toUnnest = cols0.toSet
      val selection: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
        if (toUnnest.contains(f.name)) f.dataType match {
          case st: StructType =>
            st.fieldNames.toSeq.map(sub => col(s"`${f.name}`.`$sub`").as(sub))
          case other =>
            throw new IllegalArgumentException(
              s"unnest target '${f.name}' is ${other.simpleString}, not a struct")
        }
        else Seq(col(s"`${f.name}`"))
      }
      df.select(selection: _*)
    }

  // S12 -----------------------------------------------------------------
  /** AND-fold of configured predicates (reference: core/transform.py:219-229). */
  def filterRows(rules: Seq[RuleSpec])(df: DataFrame): DataFrame =
    if (rules.isEmpty) df else df.filter(RuleParser.andAll(rules))

  // S13 -----------------------------------------------------------------
  /** Per-column null fill (reference: core/transform.py:167-176).
    * `coalesce` rather than `na.fill` so any literal type works uniformly. */
  def fillNullsPerCol(fillMap: Seq[(String, Any)])(df: DataFrame): DataFrame =
    if (fillMap.isEmpty) df
    else df.withColumns(fillMap.map { case (n, v) => n -> coalesce(col(n), lit(v)) }.toMap)

  // S14 -----------------------------------------------------------------
  /** Per-column cast to a config-named dtype (reference:
    * core/transform.py:155-164). Polars casts strictly (error on overflow);
    * run sessions with `spark.sql.ansi.enabled=true` for matching semantics
    * (SURVEY.md §7.4-6). */
  def recastCols(recastMap: Seq[(String, String)])(df: DataFrame): DataFrame =
    if (recastMap.isEmpty) df
    else df.withColumns(recastMap.map { case (n, t) => n -> col(n).cast(DTypes.resolve(t)) }.toMap)

  // S15 -----------------------------------------------------------------
  /** Per-column clamp to [lo, hi] — Spark has no `clip`, compose
    * `least(greatest(...))` (reference: core/transform.py:179-190).
    * Nulls stay null (Spark's least/greatest SKIP nulls, which would turn
    * null into the bound — Polars clip propagates null; we match Polars). */
  def clipCols(clipMap: Seq[(String, (Any, Any))])(df: DataFrame): DataFrame =
    if (clipMap.isEmpty) df
    else df.withColumns(clipMap.map { case (n, (lo, hi)) =>
      n -> when(col(n).isNotNull, least(greatest(col(n), lit(lo)), lit(hi)))
    }.toMap)

  // S16 -----------------------------------------------------------------
  /** Derived columns from the expression registry (reference:
    * core/transform.py:251-293).
    *
    * Row-wise entries are applied sequentially (later entries may reference
    * earlier ones). Whole-frame scalar aggregates are batched into ONE
    * distributed `df.agg(...)` pass and broadcast-cross-joined back — the
    * scalable rewrite of Polars' aggregate-broadcast behavior
    * (SURVEY.md §2.3-4, §7.4-4); no single-partition window anywhere.
    */
  def deriveNewCols(newColMap: Seq[(String, DeriveSpec)])(df: DataFrame): DataFrame =
    if (newColMap.isEmpty) df
    else {
      val resolved: Seq[(String, ExprRegistry.Derived)] = newColMap.map { case (name, spec) =>
        name -> ExprRegistry.resolve(spec.fnName)(spec.kwargs)
      }
      // Sequential semantics (later entries may reference earlier ones,
      // including aggregates over derived columns) while still batching:
      // CONSECUTIVE INDEPENDENT whole-frame aggregates share one
      // distributed agg pass + broadcast cross join, and CONSECUTIVE
      // INDEPENDENT same-(order_by, desc) global ordered fns share ONE
      // two-level decomposition (one range exchange, one totals agg, one
      // window — 12 naive chained decompositions would be 12 range
      // shuffles). A row-wise entry — or any entry referencing a name a
      // pending batch will produce — flushes first so successors see its
      // columns.
      def refs(c: Column): Set[String] =
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c).collect {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.name
        }.toSet
      // every input column a GlobalOrdered spec reads (combine is probed
      // with dummy placeholders, subtracted back out)
      def goRefs(spec: graft.expr.OrderedAtScale.GlobalOrderedSpec): Set[String] = {
        import org.apache.spark.sql.expressions.Window
        val dummyW = Window.partitionBy(col("__go_probe_b")).orderBy(spec.orderBy.map(col): _*)
        val dummies = Set("__go_probe_b", "__go_probe_p", "__go_probe_t", "__go_probe_v")
        (refs(spec.bucketAgg) ++ refs(spec.within(dummyW)) ++
          refs(spec.combine(col("__go_probe_p"), col("__go_probe_t"), col("__go_probe_v"))) ++
          spec.orderBy) -- dummies - graft.expr.OrderedAtScale.priorBucketName
      }
      // a pending whole-frame entry: plain aggregate-broadcast (rowFn =
      // None) or agg-then-row (Some(rowFn) — the 1-row agg result lands
      // under a temp name the row-wise post-expression consumes, qcut's
      // breakpoints → bin label). Round 19: BOTH share one distributed agg
      // pass — consecutive AggThenRow entries (q107's two qcuts) used to
      // flush one agg job each.
      type Pending = Seq[(String, Column, Option[Column => Column])]
      def flush(acc: DataFrame, pending: Pending): DataFrame =
        if (pending.isEmpty) acc
        else {
          def tmp(n: String) = s"__agg_then_row_$n"
          val aggRow = acc.agg(
            pending.head._2.as(pending.head._3.fold(pending.head._1)(_ => tmp(pending.head._1))),
            pending.tail.map { case (n, a, rf) => a.as(rf.fold(n)(_ => tmp(n))) }: _*)
          // an aggregate derive may OVERWRITE an existing column (polars
          // with_columns semantics): aggregate over the pre-drop frame,
          // then drop the original so the join doesn't duplicate the name
          val colliding = pending.collect {
            case (n, _, None) if acc.columns.contains(n) => n
          }
          val joined = acc.drop(colliding: _*).crossJoin(broadcast(aggRow))
          pending.foldLeft(joined) {
            case (a, (n, _, Some(rowFn))) => a.withColumn(n, rowFn(col(tmp(n)))).drop(tmp(n))
            case (a, _) => a
          }
        }
      // Chained decompositions re-analyze the whole accumulated tree and
      // grow optimizer cost ~3× per level (measured via ChainProbe); a
      // zero-copy plan barrier between levels keeps it linear. The FIRST
      // decomposition never pays it, so single-decomposition plans keep
      // their pushdown/plan-pin shape.
      var decomps = 0
      // Cut-point sampling source (round 19): when a level's order keys
      // all exist on the ORIGINAL stage input, the bucketize sample runs
      // against that (a column-pruned base scan) instead of the chained
      // frozen accumulator — sampling the accumulator re-executes every
      // prior level's post-shuffle stage once per level. Sound because
      // derive levels only add columns (rows are never added, dropped or
      // filtered), so the key-tuple multiset is identical on both frames.
      def sampleSrc(keys: Seq[String]): Option[DataFrame] =
        if (keys.forall(df.columns.contains)) Some(df) else None
      def flushGlobals(
          acc: DataFrame,
          globals: Seq[(String, graft.expr.OrderedAtScale.GlobalOrderedSpec)]): DataFrame =
        if (globals.isEmpty) acc
        else {
          val base =
            if (decomps == 0) acc else org.apache.spark.sql.graftbridge.PlanBarrier.freeze(acc)
          decomps += 1
          graft.expr.OrderedAtScale.applyGlobalMulti(base, globals,
            sampleSrc(globals.head._2.orderBy))
        }
      type Globals = Seq[(String, graft.expr.OrderedAtScale.GlobalOrderedSpec)]
      type Rollings = Seq[(String, ExprRegistry.GlobalRollingFrame)]
      def frameLevel(acc: DataFrame, n: String,
          build: (DataFrame, String) => DataFrame): DataFrame = {
        val base =
          if (decomps == 0) acc else org.apache.spark.sql.graftbridge.PlanBarrier.freeze(acc)
        decomps += 1
        build(base, n)
      }
      // consecutive same-(orderBy, desc, k) raw-frame rolling fns share
      // ONE head+tail decomposition (the GlobalOrdered batching rule
      // applied to the rolling moment/percentile family)
      def flushRollings(acc: DataFrame, rollings: Rollings): DataFrame =
        if (rollings.isEmpty) acc
        else {
          val base =
            if (decomps == 0) acc else org.apache.spark.sql.graftbridge.PlanBarrier.freeze(acc)
          decomps += 1
          val h = rollings.head._2
          graft.expr.OrderedAtScale.globalRollingFrameMulti(base, h.orderBy, h.desc, h.k,
            rollings.map { case (n0, r) => (n0, r.x, r.rollingAgg, r.frameAgg) },
            sampleSrc(h.orderBy))
        }
      type RollingsBy = Seq[(String, ExprRegistry.GlobalRollingBy)]
      def flushRollingsBy(acc: DataFrame, rollingsBy: RollingsBy): DataFrame =
        if (rollingsBy.isEmpty) acc
        else {
          val base =
            if (decomps == 0) acc else org.apache.spark.sql.graftbridge.PlanBarrier.freeze(acc)
          decomps += 1
          val h = rollingsBy.head._2
          graft.expr.OrderedAtScale.globalRollingByMulti(base, h.by, h.window, h.closed,
            rollingsBy.map { case (n0, r) => (n0, r.x, r.rangeAgg, r.own, r.boundary) },
            sampleFrom = sampleSrc(Seq(h.by)))
        }
      // input columns a GlobalRollingFrame reads (frameAgg probed with a
      // dummy array column, subtracted back out)
      def grfRefs(r: ExprRegistry.GlobalRollingFrame): Set[String] = {
        import org.apache.spark.sql.expressions.Window
        val dummyW = Window.partitionBy(col("__go_probe_b")).orderBy(r.orderBy.map(col): _*)
        val dummies = Set("__go_probe_b", "__go_probe_a")
        (refs(r.x) ++ refs(r.rollingAgg(dummyW)) ++
          refs(r.frameAgg(col("__go_probe_a"))) ++ r.orderBy) -- dummies
      }
      def grbRefs(r: ExprRegistry.GlobalRollingBy): Set[String] = {
        import org.apache.spark.sql.expressions.Window
        val dummyW = Window.partitionBy(col("__go_probe_b")).orderBy(col(r.by))
        val dummies = Set("__go_probe_b", "__go_probe_a", "__go_probe_o", "__go_probe_v")
        val ownRefs = r.own match {
          case graft.expr.OrderedAtScale.OwnState(f) => refs(f(dummyW))
          case _ => Set.empty[String]
        }
        (refs(r.x) ++ refs(r.rangeAgg(dummyW)) ++ ownRefs ++
          refs(r.boundary(col("__go_probe_a"), col("__go_probe_o"), col("__go_probe_v"))) +
          r.by) -- dummies
      }
      def flushAll(acc: DataFrame, pending: Pending, globals: Globals,
          rollings: Rollings, rollingsBy: RollingsBy): DataFrame =
        flushRollingsBy(
          flushRollings(flushGlobals(flush(acc, pending), globals), rollings), rollingsBy)
      val (lastAcc, lastPending, lastGlobals, lastRollings, lastRollingsBy) =
        resolved.foldLeft((df,
            Seq.empty[(String, Column, Option[Column => Column])],
            Seq.empty[(String, graft.expr.OrderedAtScale.GlobalOrderedSpec)],
            Seq.empty[(String, ExprRegistry.GlobalRollingFrame)],
            Seq.empty[(String, ExprRegistry.GlobalRollingBy)])) {
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, ExprRegistry.WholeFrameAgg(a))) =>
            val acc1 = flushRollingsBy(
              flushRollings(flushGlobals(acc, globals), rollings), rollingsBy)
            val pendingNames = pending.map(_._1).toSet
            if (refs(a).exists(pendingNames.contains))
              (flush(acc1, pending), Seq((n, a, None)), Nil, Nil, Nil) // depends on the batch
            else (acc1, pending :+ ((n, a, None)), Nil, Nil, Nil)
          case ((acc, pending, globals, rollings, rollingsBy), (n, ExprRegistry.RowWise(c))) =>
            (flushAll(acc, pending, globals, rollings, rollingsBy).withColumn(n, c),
              Nil, Nil, Nil, Nil)
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, ExprRegistry.AggThenRow(a, rowFn))) =>
            // one agg pass + broadcast join shared with the WholeFrameAgg
            // batch; the 1-row agg result lands under a temp name that the
            // row-wise post-expression consumes (qcut: breakpoints -> bin
            // label). The post-expression is row-wise over the joined
            // frame, so its refs (the binned data column) count for the
            // depends-on-the-batch check too.
            val acc1 = flushRollingsBy(
              flushRollings(flushGlobals(acc, globals), rollings), rollingsBy)
            val pendingNames = pending.map(_._1).toSet
            val atrRefs = refs(a) ++ (refs(rowFn(col("__atr_probe"))) - "__atr_probe")
            if (atrRefs.exists(pendingNames.contains))
              (flush(acc1, pending), Seq((n, a, Some(rowFn))), Nil, Nil, Nil)
            else (acc1, pending :+ ((n, a, Some(rowFn))), Nil, Nil, Nil)
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, ExprRegistry.GlobalOrdered(spec))) =>
            // global (no partition_by) ordered fn: range-bucketed two-level
            // decomposition — never a single-partition window (round 16).
            // Batch with the pending same-order globals when independent.
            val sameOrder = globals.forall(g =>
              g._2.orderBy == spec.orderBy && g._2.desc == spec.desc)
            val pendingOut = (globals.map(_._1) ++ pending.map(_._1)).toSet
            if (pending.isEmpty && rollings.isEmpty && rollingsBy.isEmpty && sameOrder &&
              !goRefs(spec).exists(pendingOut.contains))
              (acc, Nil, globals :+ (n -> spec), Nil, Nil)
            else
              (flushAll(acc, pending, globals, rollings, rollingsBy),
                Nil, Seq(n -> spec), Nil, Nil)
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, r: ExprRegistry.GlobalRollingFrame)) =>
            val sameFrame = rollings.forall(g =>
              g._2.orderBy == r.orderBy && g._2.desc == r.desc && g._2.k == r.k)
            val pendingOut = (rollings.map(_._1) ++ globals.map(_._1) ++
              rollingsBy.map(_._1) ++ pending.map(_._1)).toSet
            if (pending.isEmpty && globals.isEmpty && rollingsBy.isEmpty && sameFrame &&
              !grfRefs(r).exists(pendingOut.contains))
              (acc, Nil, Nil, rollings :+ (n -> r), Nil)
            else
              (flushAll(acc, pending, globals, rollings, rollingsBy),
                Nil, Nil, Seq(n -> r), Nil)
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, r: ExprRegistry.GlobalRollingBy)) =>
            val sameFrame = rollingsBy.forall(g =>
              g._2.by == r.by && g._2.window == r.window && g._2.closed == r.closed)
            val pendingOut = (rollings.map(_._1) ++ globals.map(_._1) ++
              rollingsBy.map(_._1) ++ pending.map(_._1)).toSet
            if (pending.isEmpty && globals.isEmpty && rollings.isEmpty && sameFrame &&
              !grbRefs(r).exists(pendingOut.contains))
              (acc, Nil, Nil, Nil, rollingsBy :+ (n -> r))
            else
              (flushAll(acc, pending, globals, rollings, rollingsBy),
                Nil, Nil, Nil, Seq(n -> r))
          case ((acc, pending, globals, rollings, rollingsBy),
              (n, ExprRegistry.FrameLevel(build))) =>
            (frameLevel(flushAll(acc, pending, globals, rollings, rollingsBy), n, build),
              Nil, Nil, Nil, Nil)
        }
      val derived =
        flushAll(lastAcc, lastPending, lastGlobals, lastRollings, lastRollingsBy)
      // restore declared column order (cross joins append agg columns out
      // of order); a derive overwriting an existing column keeps its
      // original position and must not be projected twice
      val ordered =
        (df.columns.toSeq ++ newColMap.map(_._1).filterNot(df.columns.contains)).distinct
      derived.select(ordered.map(n => col(s"`$n`")): _*)
    }

  // S17 -----------------------------------------------------------------
  /** old -> new column rename (reference: core/transform.py:143-152). */
  def renameCols(renameMap: Seq[(String, String)])(df: DataFrame): DataFrame =
    if (renameMap.isEmpty) df else df.withColumnsRenamed(renameMap.toMap)

  // S18 -----------------------------------------------------------------
  /** Pack listed columns into a struct, dropping the packed sources
    * (reference: core/transform.py:193-204). */
  def nestCols(nestMap: Seq[(String, Seq[String])])(df: DataFrame): DataFrame =
    nestMap.foldLeft(df) { case (acc, (name, members)) =>
      acc.withColumn(name, struct(members.map(col): _*)).drop(members: _*)
    }

  // S19 -----------------------------------------------------------------
  /** Drop listed columns (reference: core/transform.py:131-140). */
  def dropCols(cols0: Seq[String])(df: DataFrame): DataFrame =
    if (cols0.isEmpty) df else df.drop(cols0: _*)

  // S20 -----------------------------------------------------------------
  /** User-supplied frame-level transformations, piped in registration order;
    * unknown name throws (reference: core/transform.py:296-329). */
  type CustomFn = (DataFrame, Map[String, Any]) => DataFrame

  def pipeCustomTransformations(
      registry: Map[String, CustomFn],
      configs: Seq[(String, Map[String, Any])]
  )(df: DataFrame): DataFrame =
    configs.foldLeft(df) { case (acc, (name, kwargs)) =>
      val fn = registry.getOrElse(
        name,
        throw new NoSuchElementException(
          s"custom transformation '$name' not in registry (${registry.keys.mkString(", ")})"))
      fn(acc, kwargs)
    }

  // S21 -----------------------------------------------------------------
  /** Final projection: user columns (minus sys cols) first, then all
    * `sys_col*` columns appended in their original relative order
    * (reference: services/basic_pipeline.py:70-75). */
  def finalSelect(selectCols: Seq[String])(df: DataFrame): DataFrame = {
    val user =
      (if (selectCols.isEmpty || selectCols == Seq("*")) df.columns.toSeq else selectCols)
        .filterNot(isSys)
    val sys = df.columns.toSeq.filter(isSys)
    df.select((user ++ sys).map(n => col(s"`$n`")): _*)
  }

  // S22 -----------------------------------------------------------------
  /** Lowercase+strip all column names unless that would collide
    * case-insensitively — then no-op (reference: core/transform.py:112-128). */
  def standardiseColNames(df: DataFrame): DataFrame = {
    val std = df.columns.map(_.trim.toLowerCase)
    if (std.distinct.length != std.length) df else df.toDF(std.toIndexedSeq: _*)
  }
}
