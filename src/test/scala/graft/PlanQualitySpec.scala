package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the things that make queries survive a 100x
  * scale-up. These lock in the optimizations so a refactor can't silently
  * regress them (SURVEY.md §4, builder brief "optimize for scale"). */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  /** Plan AFTER execution — AQE only finalizes (and shows codegen spans)
    * once the query has run. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // run THIS QueryExecution so AQE finalizes it in place
    df.queryExecution.executedPlan.toString
  }

  test("q02: filter AND projection push down to the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_shipdate)"),
      s"filters must reach the scan:\n$p")
    assert(p.contains("LessThan(l_quantity,5.0)"), "quantity predicate pushed")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_shipdate:timestamp"), "only 4 of 11 columns read")
  }

  test("q03: all three dimension joins broadcast (no fact-side shuffle joins)") {
    val p = plan("q03_join_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, s"expected 3 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join for small dims")
  }

  test("q01: aggregation is partial (map-side combine) before the shuffle") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "partial + final HashAggregate expected")
    assert(p.contains("Exchange hashpartitioning(l_returnflag"),
      "single shuffle keyed on the group-by columns")
  }

  test("q09: whole-frame aggregate broadcast uses agg+broadcast join, not a global window") {
    val p = plan("q09_derive_agg_broadcast")
    assert(!p.contains("Window"), s"no window operator allowed:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "1-row aggregate must be broadcast")
  }

  test("q17: scan reads only the columns the aggregate needs") {
    val p = plan("q17_tpch_q6")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double>"), s"3-col pruned read expected:\n$p")
  }

  test("q27: queries side is broadcast; corpus is never shuffled for the join") {
    val p = plan("q27_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin"), "broadcast cross join expected")
  }

  test("q60: bucketed scan — never a join-key shuffle (agg shuffle only)") {
    val p = plan("q60_bucketed_join")
    assert(p.contains("Bucketed: true"), s"scans must use the bucketed layout:\n$p")
    assert(!p.contains("Exchange hashpartitioning(custkey"),
      s"bucketed layout must eliminate any join-key shuffle:\n$p")
  }

  test("q69: unpivot expands without any shuffle") {
    val p = plan("q69_unpivot_melt")
    assert(!p.contains("Exchange"), s"melt is a per-row expand, no shuffle:\n$p")
  }

  test("q66: hash sampling is pure projection (no shuffle, pruned read)") {
    val p = plan("q66_hash_sample_split")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"only the 2 needed columns read:\n$p")
  }

  test("q49: one window shuffle keyed on the partition column") {
    val p = plan("q49_range_frame")
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).length == 1,
      s"exactly one shuffle, keyed on o_custkey:\n$p")
  }

  test("q76: partition predicate becomes a PartitionFilter (pruned directories)") {
    val p = plan("q76_partition_pruning")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition predicate must prune at the directory level:\n$p")
    assert(!p.contains("PushedFilters: [IsNotNull(event_type"),
      s"partition column must not degrade to a row-level filter:\n$p")
  }

  test("q83: nProbe=2 IVF keeps the query side broadcast (corpus never shuffled for the join)") {
    val p = plan("q83_ivf_nprobe")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"exploded query cells must stay the broadcast side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not be shuffled to meet a handful of queries:\n$p")
  }

  test("q73: salted join carries no nondeterministic expression (retry-safe)") {
    val df = SparkEntry.queries("q73_salted_join")(spark, sfDir)
    val nondet = df.queryExecution.analyzed
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case e if !e.deterministic => e })
    assert(nondet.isEmpty, s"nondeterministic exprs in salted-join plan: $nondet")
  }

  /** Physical shuffle nodes in the EXECUTED plan whose hash-partitioning
    * mentions `key`, unwrapping AQE wrappers and counting a reused exchange
    * once. Deliberately a TREE walk, not a regex over the plan STRING: the
    * string renders an `InMemoryRelation`'s private cached plan inline, so
    * a regex double-counts the window exchange that lives INSIDE the
    * persisted bucket frame (round-17 judge item 1 — the q24 pin fired on
    * exactly that after AQE swapped the self-join to a broadcast). An
    * `InMemoryTableScanExec` is a leaf here, so cached internals are
    * excluded by construction. */
  private def shuffleCountOn(name: String, key: String): (Int, String) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // run THIS QueryExecution so AQE finalizes it in place
    def walk(n: SparkPlan): Int = n match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case _: ReusedExchangeExec => 0 // same exchange, already counted where it runs
      case s: ShuffleExchangeLike =>
        (if (s.outputPartitioning.toString.contains(key)) 1 else 0) +
          s.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    (walk(df.queryExecution.executedPlan), df.queryExecution.executedPlan.toString)
  }

  test("q24: LSH bucket cap adds no second shuffle over the (band, digest) keys") {
    // the width count rides the window shuffle (inside the persisted bucket
    // frame); the pair self-join then either re-shuffles each side once on
    // the same keys (sort-merge) or — AQE's call at this SF — broadcasts one
    // side, which needs NO band exchange at all. Both shapes are accepted;
    // what the pin forbids is the cap growing its OWN extra shuffle:
    // anything beyond window + 2 join sides means a 4th band exchange.
    val (exchanges, p) = shuffleCountOn("q24_dedup_minhash_lsh", "band")
    assert(exchanges <= 3, s"cap must reuse the bucket-key shuffle ($exchanges found):\n$p")
  }

  test("q84/q87: sampling and token counting are pure projections (no shuffle)") {
    for (q <- Seq("q84_stratified_sample", "q87_token_budgets")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("q86: sequence packing shuffles exactly once, on the partition column") {
    val p = plan("q86_pack_sequences")
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(p).length == 1,
      s"one window shuffle keyed on lang expected:\n$p")
  }

  test("whole-stage codegen covers the hot paths") {
    for (q <- Seq("q01_pricing_summary", "q08_derive_rowwise", "q20_text_stats")) {
      val p = executedPlan(q)
      // "*(n) Operator" marks a whole-stage-codegen stage in plan strings
      assert(p.contains("*(1)"), s"$q must run inside codegen:\n$p")
    }
  }

  test("q93: semantic dedup pairs only within cells — hash join, never a cartesian") {
    // the within-cluster self-join must key on the cell equality (hash
    // exchange / broadcast), NOT degenerate into CartesianProduct or
    // BroadcastNestedLoopJoin — at corpus scale a cross product here is
    // the difference between n²/k and n² comparisons
    val p = plan("q93_semantic_dedup")
    assert(!p.contains("CartesianProduct"), "within-cell join degenerated to a cross product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "within-cell join lost its equi-key")
  }

  test("q94/q100/q101: ewm scans are one exchange + one sort + MapPartitions, no Window") {
    // the family's whole scale claim: ONE hash shuffle on the key, an
    // in-partition sort, then the O(n) scan — never a window frame
    // (re-aggregation would be O(n²)/key) and never a second exchange
    for (q <- Seq("q94_ewm_mean", "q100_ewm_var_std", "q101_ewm_mean_by")) {
      val p = plan(q)
      assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
        s"$q: exactly one hash exchange on the key expected:\n$p")
      assert("(?m)^\\s*\\+?-? ?Sort ".r.findAllIn(p).length == 1,
        s"$q: exactly one in-partition sort expected:\n$p")
      assert(p.contains("MapPartitions"), s"$q: the scan seam must be present:\n$p")
      assert(!p.contains("Window"), s"$q: no window re-aggregation allowed:\n$p")
      // ts arrives as bigint (legacy nanos) or timestamp_ntz (micros)
      // depending on the testdata generation — pruning to 4 columns is
      // the invariant, not the physical type of ts
      assert(p.contains("ReadSchema: struct<event_id:bigint,ts:bigint," +
        "user_id:bigint,value:double>") ||
        p.contains("ReadSchema: struct<event_id:bigint,ts:timestamp_ntz," +
          "user_id:bigint,value:double>"),
        s"$q: scan must prune to 4 columns:\n$p")
    }
  }

  test("q105: nearest as-of uses only running frames — no UnboundedFollowing re-aggregation") {
    // An UnboundedFollowing window frame is re-aggregated from scratch by
    // WindowExec for every row: O(n²) per key group, a scale-killer on a
    // hot key. The forward leg must ride a running (UnboundedPreceding)
    // frame over the reversed sort instead.
    val p = plan("q105_asof_nearest")
    assert(!p.toLowerCase.contains("unboundedfollowing"),
      s"q105: no UnboundedFollowing frame allowed:\n$p")
    // the merge itself is ONE key-only shuffle shared by both window
    // passes (the second exchange in the full plan is the fixture's
    // tie-collapse groupBy(user_id, ts) — keyed on (user_id, t_us))
    assert("Exchange hashpartitioning\\(user_id#[^,]+, \\d+\\)".r.findAllIn(p).length == 1,
      s"q105: the union-merge must stay one key-only shuffle:\n$p")
  }

  test("q117: bloom prefilter sits on the fact scan; the semi join never shuffles the fact side") {
    // The operator's whole value is WHERE the filter runs: non-matching
    // fact rows must die in the scan stage, and the exact semi join must
    // be broadcast — a fact-side exchange would re-pay everything the
    // bloom saved. Exactly two exchanges are allowed: the dimension's
    // distinct and the final aggregation.
    val p = plan("q117_bloom_prejoin")
    assert(p.contains("might_contain"), s"bloom probe missing from the plan:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"exact pass must be a broadcast semi join:\n${p.take(2000)}")
    val exchanges = "(?m)^\\s*[+:]- Exchange ".r.findAllIn(p).length
    assert(exchanges == 2,
      s"expected 2 exchanges (dim distinct + final agg), got $exchanges:\n${p.take(2000)}")
  }

  test("q122: sketch aggregation combines map-side; exchanges carry sketches, never rows") {
    // The shard->merge shape is the whole point: ObjectHashAggregate must
    // run PARTIAL below each Exchange (per-task sketches reduce before
    // shuffling), so the two exchanges move 8 shard sketches and then 1
    // combined sketch — at 100 TB the only data-proportional work is the
    // accumulate scan. A plan where rows reach an Exchange un-sketched
    // (no partial agg between scan and shuffle) re-pays the full corpus.
    val p = plan("q122_heavy_hitters")
    val exchanges = "(?m)^\\s*[+:]- Exchange ".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 sketch-row exchanges, got $exchanges:\n${p.take(2000)}")
    // below the LAST (innermost, pre-shard) exchange: partial sketch agg,
    // then the scan — i.e. rows are sketched before they ever shuffle
    val belowLast = p.substring(p.lastIndexOf("Exchange "))
    val (oha, scan) = (belowLast.indexOf("ObjectHashAggregate"), belowLast.indexOf("Scan parquet"))
    assert(oha >= 0 && scan >= 0 && oha < scan,
      s"partial sketch aggregation must sit between the scan and the first exchange:\n${p.take(2000)}")
  }

  test("catalog-wide: no cartesian products; nested-loop joins only where the cross is intended") {
    // At 100 TB an accidental CartesianProduct (or an equi-join that lost
    // its key and fell back to BroadcastNestedLoopJoin) is a job-killer.
    // Whitelist = queries whose BNLJ is a DELIBERATE broadcast cross of a
    // tiny side (ANN query fan-out, 1-row aggregate frames).
    val bnljOk: Set[String] = Set(
      "q09_derive_agg_broadcast", // 1-row whole-frame aggregate broadcast onto the fact
      "q111_replace_argextreme", // arg_max/arg_min: same 1-row AggThenRow broadcast shape
      "q27_ann_bruteforce", // query set deliberately broadcast-crossed over the corpus
      "q64_approx_sketches", // three 1-row sketch frames crossJoined (the Expand dodge)
      "q78_tfidf", // 1-row corpus-stats frame broadcast onto per-doc scores
      "q96_hll_merge", // three 1-row sketch/exact frames crossJoined
      "q97_theta_set_algebra", // two 1-row segment sketches crossJoined
      "q98_kll_quantile_merge", // shard sketches + exact band, 1-row crossJoins
      "q107_qcut", // 1-row quantile-breakpoint frames broadcast (AggThenRow)
      "q108_search_sorted", // 1-row whole-frame scalars broadcast onto rows
      "q115_registry_tail", // dot: 1-row whole-frame Σa·b broadcast onto rows
      "q118_mixture_sample", // 1-row corpus-total-tokens frame broadcast onto docs
      "q126_pq_ann_recall", // 5-row query set broadcast-crossed over codes + corpus (q27 shape)
      "q127_ivfpq_rerank_recall", // exact baseline's broadcast cross (the IVF-PQ side joins on cell)
      "q128_winsorize", // 1-row quantile-breakpoint frame broadcast (AggThenRow, q107 shape)
      "q129_ivf_large_k", // exact baseline's broadcast cross (the IVF side joins on cell — q127 shape)
      "q130_incremental_ann", // both ADC search paths broadcast-cross the 5-row query set (q126 shape)
      "q131_bm25", // 1-row (n_docs, avgdl) corpus-stats frame broadcast onto per-doc scores (q78 shape)
      "q132_unigram_nll", // 1-row corpus-total-tokens frame broadcast onto per-term rows (q78 shape)
      "q135_sq8_ann", // 5-row query set broadcast-crossed over the SQ8 codes (q27/q126 shape)
      "q147_dsir_weights", // 1-row (n_raw, n_target) totals frame broadcast onto buckets (q118 shape)
      "q148_dsir_resample", // same DSIR totals broadcast inside the weight stage
      "q152_ccnet_buckets", // q132's 1-row corpus-total-tokens broadcast inside the NLL stage
      "q163_registry_tail_r15", // has_nulls: 1-row whole-frame aggregate broadcast (q09 shape)
      // round 16: the two-level global ordered decomposition's prefix join
      // is a deliberate ≤B² broadcast self-join of the bucket-TOTALS frame
      // (≤ shuffle-partitions rows, never data-sized) on prior < bucket
      "q113_unique_counts",
      "q164_global_ordered",
      "q165_global_rle",
      "q169_global_rolling_moments", // 1-row global-total broadcast cross (cum std/var)
      "q167_image_near_dup", // 1-row exact-dup-total frame broadcast (q09 shape)
      "q173_audio_near_dup", // same 1-row exact-dup-total broadcast (q167 shape)
      "q168_bigram_nll", // 1-row corpus-total broadcast (q132 shape)
      "q175_kn3_nll", // 1-row N1+(··)/total corpus-stat broadcasts (q168 shape)
      "q180_temperature_mixture", // q118's 1-row corpus-total broadcast cross
      "q190_media_novelty" // 1-row batch-count frame broadcast cross (q118 shape)
    )
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      val cart = if (p.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      val bnlj = if (!bnljOk(name) && p.contains("BroadcastNestedLoopJoin"))
        Seq(s"$name: BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q64: no aggregate mixes the distinct rewrite with the sketches") {
    // countDistinct in the SAME agg as approx_count_distinct/
    // approx_percentile drags the sketches through the Expand-based
    // distinct rewrite: measured 48 s vs ~1 s at sf0.1 (round 7). The
    // query must keep them in separate 1-row aggregates.
    val p = plan("q64_approx_sketches")
    val mixed = p.linesIterator.exists(l =>
      l.contains("Expand") && (l.contains("percentile") || l.contains("HyperLogLog")))
    assert(!mixed, s"sketch aggregate routed through the distinct Expand:\n$p")
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r.findAllIn(p).nonEmpty)
    // each side stays a scalar: the join of 1-row frames must broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), s"1-row aggs must broadcast-join:\n$p")
  }
}
