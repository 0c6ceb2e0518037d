package operators

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs, ordered by
  * (score DESC, id ASC) — the deterministic ANN ranking order.
  *
  * Why not a window: `row_number().over(partitionBy(q_id))` shuffles EVERY
  * scored candidate of a query to one reducer — with 10⁶ queries over a
  * 100 TB corpus that is the whole corpus through single partitions. This
  * TypedImperativeAggregate gets partial aggregation (map-side combine) for
  * free, so each task ships at most k rows per query and the reducer merges
  * tiny k-sized buffers.
  *
  * Buffer: a size-bounded binary min-heap keyed by the SAME comparator, so
  * the worst element is evicted in O(log k).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  require(k > 0, s"k must be positive, got $k")

  // update() hard-casts score→Double / id→Long; declaring the input types
  // makes a FloatType score or IntegerType id fail at ANALYSIS time
  // instead of ClassCastException on executors mid-job
  // (return type inferred: AbstractDataType is private[sql] by name)
  override def inputTypes = Seq(DoubleType, LongType)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  /** array<struct<score double, id long>> in rank order (best first). */
  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val n = buf.size
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    buf.foreachEntry { (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.offer(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  def apply(score: Column, id: Column, k: Int): Column =
    GraftSqlShim.column(TopKByScore(
      GraftSqlShim.expression(score),
      GraftSqlShim.expression(id), k).toAggregateExpression())
}

/** Bounded min-heap under (score ASC, id DESC) so the root is the WORST
  * entry under the ranking order (score DESC, id ASC) and gets evicted
  * first when full.
  */
final class TopKHeap(k: Int) {
  private val sc = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  /** a "worse-than" b under the ranking order. */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def offer(s: Double, i: Long): Unit = {
    if (n < k) {
      sc(n) = s; ids(n) = i; n += 1
      var c = n - 1
      while (c > 0 && worse(sc(c), ids(c), sc((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(sc(0), ids(0), s, i)) {
      sc(0) = s; ids(0) = i
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = sc(a); sc(a) = sc(b); sc(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var p = 0
    var cont = true
    while (cont) {
      val l = 2 * p + 1
      val r = 2 * p + 2
      var w = p
      if (l < n && worse(sc(l), ids(l), sc(w), ids(w))) w = l
      if (r < n && worse(sc(r), ids(r), sc(w), ids(w))) w = r
      if (w == p) cont = false else { swap(p, w); p = w }
    }
  }

  def absorb(other: TopKHeap): Unit =
    other.foreachEntry((s, i) => offer(s, i))

  def foreachEntry(f: (Double, Long) => Unit): Unit = {
    var j = 0
    while (j < n) { f(sc(j), ids(j)); j += 1 }
  }

  /** Entries best-first: (score DESC, id ASC). */
  def sortedDesc: Seq[(Double, Long)] =
    (0 until n).map(j => (sc(j), ids(j)))
      .sortBy { case (s, i) => (-s, i) }
}
