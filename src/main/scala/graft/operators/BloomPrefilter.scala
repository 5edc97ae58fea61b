package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-prefiltered joins: kill non-matching fact rows AT THE SCAN,
  * before they ever reach the join shuffle.
  *
  * The 100 TB shape this serves: a selective dimension (urgent orders,
  * flagged users, a sampled eval set) semi-joined against a huge fact
  * table. A plain semi join shuffles the ENTIRE fact side on the key;
  * Spark's own runtime row-level filtering (`InjectRuntimeFilter`) covers
  * some of these plans but is planner-gated (creation-side thresholds,
  * one filter per plan, shuffle-stage shapes). This operator is the
  * explicit library form: build a bloom filter over the dimension keys
  * (one distributed aggregation pass — executors build partial sketches,
  * the driver only ever holds the OR-merged bitset), embed the serialized
  * bits as a literal in the fact scan's filter, then run the exact semi
  * join on the survivors. The final join removes the bloom's false
  * positives, so results are EXACTLY the plain semi join's — the bloom
  * only changes how many fact rows pay the shuffle (~hit-rate + fpp of
  * them instead of all of them).
  *
  * The probe is Spark's own codegen'd [[BloomFilterMightContain]] (the
  * expression behind runtime filtering), not a UDF, so the prefilter
  * stays inside whole-stage codegen and pushes into the scan stage.
  * Bitset sizing is driver-bounded by [[maxBloomBytes]]: a bloom for 10^9
  * keys at 3% fpp is ~0.9 GB — past the broadcast sweet spot — so
  * `expectedItems` must reflect the FILTERED dimension cardinality, not
  * the raw table's.
  *
  * Determinism: the bitset is a pure function of the key set (fixed hash
  * seeds, OR-merge is order-independent), and false positives never reach
  * the output, so the operator is oracle-checkable exactly.
  *
  * EAGER builder: constructing the returned frame runs the bloom-build
  * aggregation (`stat.bloomFilter` is an action). Plan-only callers pay
  * one scan of the dimension side.
  */
object BloomPrefilter {

  /** Refuse to embed a bitset past this size (64 MiB): literals of this
    * size ship with every task; past it, rethink `expectedItems`/`fpp`
    * or fall back to the plain semi join. Defensive only on Spark 4.1:
    * the V2 sketch impl caps itself at ~8 MiB and degrades fpp instead
    * (measured: expectedItems 1e8 and 2e9 both serialize to 8388624 B),
    * so oversizing costs accuracy — more fact rows pay the shuffle — not
    * driver memory. */
  val maxBloomBytes: Int = 64 << 20

  /** `might_contain(bloomOf(dim.dimKey), fact.factKey)` as a Column.
    * Long-typed keys only — the bitset is built with the long-valued
    * `put` path and the probe must hash identically. */
  def mightContainKeys(
      dim: DataFrame,
      dimKey: String,
      factKey: Column,
      expectedItems: Long,
      fpp: Double
  ): Column = {
    val keyType = dim.schema(dimKey).dataType
    require(keyType == org.apache.spark.sql.types.LongType,
      s"bloom prefilter supports long keys, got $keyType for '$dimKey'")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    require(bytes.length <= maxBloomBytes,
      s"bloom bitset ${bytes.length} B exceeds $maxBloomBytes B — " +
        s"size expectedItems/fpp for the filtered dimension, not the raw table")
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bytes), ColumnBridge.expression(factKey)))
  }

  /** Exact semi join of `fact` against `dim`'s keys with a bloom prefilter
    * on the fact side. Result rows = plain `left_semi` join rows; the
    * bloom only shrinks the shuffled volume. */
  def bloomSemiJoin(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.02
  ): DataFrame = {
    val pre = fact.filter(
      mightContainKeys(dim, dimKey, col(factKey), expectedItems, fpp))
    // distinct() keeps the exact pass semi-join-shaped even if dim carries
    // duplicate keys; Catalyst prunes it to the key column either way.
    // The key is re-aliased to a fresh name so the join condition resolves
    // by NAME against each side — dataset-apply references (`pre(factKey)`)
    // resolve by plan id, which Spark 4's analyzer can fail to re-bind
    // after the custom-expression filter above (MISSING_ATTRIBUTES).
    val probeKey = s"__bloom_$dimKey"
    require(!fact.columns.contains(probeKey),
      s"fact side already has a '$probeKey' column")
    pre.join(dim.select(col(dimKey).as(probeKey)).distinct(),
      col(factKey) === col(probeKey), "left_semi")
  }
}
