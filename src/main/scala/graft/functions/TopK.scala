package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a real Catalyst aggregate — the scale-safe
  * replacement for the `row_number().over(Window.partitionBy(group))`
  * rank-then-filter idiom, which serializes each group through ONE task's
  * sort (with low-cardinality groups like language, that is 1/|groups| of
  * the corpus per task — the exact trap this repo's q50 verdict named).
  *
  * As a [[TypedImperativeAggregate]] it runs inside ObjectHashAggregate
  * with MAP-SIDE PARTIAL aggregation: every task keeps one k-bounded
  * buffer per group, only O(|groups| · k) serialized buffer bytes cross
  * the exchange, and no sort of group rows ever happens anywhere. At
  * 10^12 rows and k=10 the shuffle carries kilobytes.
  *
  * Semantics: the k largest (value, payload) pairs per group, ordered by
  * (value DESC, payload ASC) — the payload doubles as the deterministic
  * tiebreak, so results are total-ordered and engine-reproducible. Nulls
  * in either child are skipped (standard aggregate null behavior).
  * Result type: array<struct<v: long, p: long>> best-first; pair it with
  * posexplode for (rank, value, payload) rows.
  */
case class TopKPairs(value: Expression, payload: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k >= 1 && k <= (1 << 20), s"top-k bound must be in [1, 2^20], got $k")

  // Coerce INT/SHORT/etc. children to BIGINT at analysis (or fail loudly
  // there, naming the function) — without declared input types the
  // asInstanceOf[Long] in update() throws a bare ClassCastException deep
  // inside ObjectHashAggregate for any non-BIGINT column.
  // (No explicit Seq[AbstractDataType] annotation: that type is
  // private[sql] in Spark 4; the inferred type is identical.)
  override def inputTypes = Seq(LongType, LongType)

  override def children: Seq[Expression] = Seq(value, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKPairs.entryType, containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = value.eval(input)
    val p = payload.eval(input)
    if (v != null && p != null)
      buf.offer(v.asInstanceOf[Long], p.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val best = buf.sortedBestFirst()
    new GenericArrayData(best.map { case (v, p) =>
      InternalRow(v, p): Any
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(value = newChildren(0), payload = newChildren(1))
}

object TopKPairs {
  private[functions] val entryType: StructType =
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("p", LongType, nullable = false)))

  /** DataFrame-API entry: `topKPairs(col("n_tokens"), col("doc_id"), 10)`
    * inside `groupBy(...).agg(...)`. */
  def topKPairs(value: Column, payload: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPairs(ColumnBridge.expression(value), ColumnBridge.expression(payload), k)
        .toAggregateExpression())
}

/** The k-bounded buffer: a binary min-heap keyed by "goodness" (larger
  * value wins; equal values — smaller payload wins), so the ROOT is
  * always the worst retained pair and an incoming pair either replaces it
  * in O(log k) or is rejected in O(1) against the root. No allocation per
  * row, no ordering object, no boxing: two parallel long arrays. */
final class TopKBuffer(k: Int) {
  private val vs = new Array[Long](k)
  private val ps = new Array[Long](k)
  private var n = 0

  /** a strictly worse than b */
  @inline private def worse(va: Long, pa: Long, vb: Long, pb: Long): Boolean =
    va < vb || (va == vb && pa > pb)

  def offer(v: Long, p: Long): Unit = {
    if (n < k) {
      vs(n) = v; ps(n) = p; n += 1
      siftUp(n - 1)
    } else if (worse(vs(0), ps(0), v, p)) {
      vs(0) = v; ps(0) = p
      siftDown(0)
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val parent = (i - 1) >> 1
      if (worse(vs(i), ps(i), vs(parent), ps(parent))) {
        swap(i, parent); i = parent
      } else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var worst = i
      if (l < n && worse(vs(l), ps(l), vs(worst), ps(worst))) worst = l
      if (r < n && worse(vs(r), ps(r), vs(worst), ps(worst))) worst = r
      if (worst == i) return
      swap(i, worst); i = worst
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val tv = vs(a); vs(a) = vs(b); vs(b) = tv
    val tp = ps(a); ps(a) = ps(b); ps(b) = tp
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(vs(i), ps(i)); i += 1 }
  }

  /** Best-first (value desc, payload asc) — heap order is partial, so the
    * final ordering is one O(k log k) sort at EVAL time only. */
  def sortedBestFirst(): Array[(Long, Long)] = {
    val arr = Array.tabulate(n)(i => (vs(i), ps(i)))
    arr.sortInPlace()(Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
    arr
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(vs(i)); bb.putLong(ps(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    require(n >= 0 && n <= k, s"corrupt top-k buffer: $n entries for bound $k")
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}
