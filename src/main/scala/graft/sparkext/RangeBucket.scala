package graft.sparkext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Deterministic range-bucket assignment against driver-computed cut
  * tuples — the single-exchange replacement for the
  * `repartitionByRange + spark_partition_id()` preamble of
  * [[graft.expr.OrderedAtScale]]'s two-level global-window decompositions.
  *
  * With `spark_partition_id()` the bucket is a function of the PHYSICAL
  * layout, so (a) the frame must actually pass through the range exchange
  * before the bucket exists, and (b) every later operator keyed on the
  * bucket (the within-bucket window, the per-bucket totals) needs its OWN
  * hash exchange because nothing in the plan says rows of one bucket are
  * co-located — the decomposition pays TWO full-data shuffles where its
  * arithmetic needs one. This expression makes the bucket a pure,
  * deterministic function of the ROW (binary search of the order key
  * against a sorted cut-tuple array held as one reference object, the
  * [[NearestCentroidId]] pattern), so one hash exchange on the bucket
  * value is the only full-data movement, and every consumer of the
  * bucketed frame agrees on the assignment with no frozen-exchange
  * sharing tricks.
  *
  * Ordering contract (must match the decomposition's window order):
  * lexicographic over the key columns, every column ascending-nulls-first,
  * or — under `desc` — every column descending-nulls-last (the same
  * single-flag contract as `OrderedAtScale`). Equal key tuples ALWAYS get
  * equal buckets (bucket = count of cuts <= key under the effective
  * ordering), so tie groups never split — the property the prefix
  * arithmetic needs. Cut points only steer BALANCE, never values: any cut
  * array yields exact results (the decompositions are
  * bucket-placement-independent by design), so the sampled cuts need no
  * determinism guarantee.
  *
  * CodegenFallback on purpose: evaluation is an O(log nCuts) comparison
  * loop on a shared array — the per-row cost is a few interpreted
  * comparisons, far below the exchange it replaces, and a fallback node
  * keeps the surrounding projection inside whole-stage codegen.
  */
case class RangeBucketId(
    children: Seq[Expression],
    cuts: Seq[Seq[Any]],
    desc: Boolean
) extends Expression with CodegenFallback {
  require(children.nonEmpty, "RangeBucketId needs at least one key column")
  require(cuts.forall(_.size == children.size),
    s"every cut tuple must have ${children.size} fields")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  @transient private lazy val cutArr: Array[Array[Any]] = cuts.map(_.toArray).toArray
  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    children.map(c => TypeUtils.getInterpretedOrdering(c.dataType)).toArray

  private def cmpField(i: Int, a: Any, b: Any): Int = {
    val base =
      if (a == null && b == null) 0
      else if (a == null) -1 // nulls first under asc
      else if (b == null) 1
      else fieldOrds(i).compare(a, b)
    if (desc) -base else base
  }

  /** Lexicographic compare of a cut tuple vs the row's key tuple under the
    * effective (asc-nulls-first / desc-nulls-last) ordering. */
  private def cmpCutVsKey(cut: Array[Any], key: Array[Any]): Int = {
    var i = 0
    while (i < key.length) {
      val c = cmpField(i, cut(i), key(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val key = new Array[Any](children.size)
    var i = 0
    while (i < key.length) { key(i) = children(i).eval(input); i += 1 }
    // bucket = count of cuts <= key: binary search for the first cut > key
    var lo = 0
    var hi = cutArr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpCutVsKey(cutArr(mid), key) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object RangeBucketId {

  /** Bucket column from key columns + cut tuples of CATALYST values (use
    * [[toCatalystCut]] on driver-collected rows first). */
  def apply(keys: Seq[Column], cuts: Seq[Seq[Any]], desc: Boolean): Column =
    ColumnBridge.column(RangeBucketId(keys.map(ColumnBridge.expression), cuts, desc))

  /** External (Row-collected) values -> catalyst values for one cut tuple. */
  def toCatalystCut(values: Seq[Any], dts: Seq[DataType]): Seq[Any] =
    values.zip(dts).map { case (v, dt) =>
      if (v == null) null
      else org.apache.spark.sql.catalyst.CatalystTypeConverters.createToCatalystConverter(dt)(v)
    }

  /** The expression's effective ordering, driver-side, for sorting the
    * sampled catalyst key tuples before cut selection. */
  def tupleOrdering(dts: Seq[DataType], desc: Boolean): Ordering[Seq[Any]] =
    new Ordering[Seq[Any]] {
      private val ords = dts.map(TypeUtils.getInterpretedOrdering).toArray
      def compare(a: Seq[Any], b: Seq[Any]): Int = {
        var i = 0
        while (i < ords.length) {
          val av = a(i); val bv = b(i)
          val base =
            if (av == null && bv == null) 0
            else if (av == null) -1
            else if (bv == null) 1
            else ords(i).compare(av, bv)
          val c = if (desc) -base else base
          if (c != 0) return c
          i += 1
        }
        0
      }
    }
}
