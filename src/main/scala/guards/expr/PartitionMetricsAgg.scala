package guards.expr

import java.nio.ByteBuffer

import core.RuleSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-logical-partition lineage metrics, designed to ride an
  * `observe()` on the SAME job that writes the kept output — so the
  * production pipeline needs NO persist and NO second scan of the scored
  * corpus to produce its metrics table (SURVEY.md §2.3).
  *
  * Per part_id it accumulates: turns_in, turns_kept, bytes_in, and hits per
  * rule. State is one long[3+13] per partition id seen by the task — at 256
  * logical partitions that is ≤ ~33 KB per task buffer, constant in data
  * size. Output: map<string,long> keyed "pid/in", "pid/kept", "pid/bytes",
  * "pid/<rule>" (rules only when hits > 0).
  */
case class PartitionMetricsAgg(
    partId: Expression,
    keep: Expression,
    text: Expression,
    ruleHits: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[Int, Array[Long]]] {

  private type Buf = scala.collection.mutable.HashMap[Int, Array[Long]]

  private val ruleIndex: Map[UTF8String, Int] =
    RuleSpec.AllRules.zipWithIndex.map { case (r, i) =>
      UTF8String.fromString(r) -> i
    }.toMap
  private def nRules = RuleSpec.AllRules.length
  private def nSlots = 3 + nRules // in, kept, bytes, rules…

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val pid = partId.eval(input).asInstanceOf[Int]
    val slots = buf.getOrElseUpdate(pid, new Array[Long](nSlots))
    slots(0) += 1
    if (keep.eval(input).asInstanceOf[Boolean]) slots(1) += 1
    val t = text.eval(input)
    if (t != null) slots(2) += t.asInstanceOf[UTF8String].numBytes()
    val hits = ruleHits.eval(input)
    if (hits != null) {
      val arr = hits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        ruleIndex.get(arr.getUTF8String(i)).foreach(idx => slots(3 + idx) += 1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (pid, bs) =>
      val as = a.getOrElseUpdate(pid, new Array[Long](nSlots))
      var i = 0
      while (i < as.length) { as(i) += bs(i); i += 1 }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
    buf.toSeq.sortBy(_._1).foreach { case (pid, slots) =>
      keys += UTF8String.fromString(s"$pid/in"); vals += Long.box(slots(0))
      keys += UTF8String.fromString(s"$pid/kept"); vals += Long.box(slots(1))
      keys += UTF8String.fromString(s"$pid/bytes"); vals += Long.box(slots(2))
      var i = 0
      while (i < nRules) {
        if (slots(3 + i) > 0) {
          keys += UTF8String.fromString(s"$pid/${RuleSpec.AllRules(i)}")
          vals += Long.box(slots(3 + i))
        }
        i += 1
      }
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray), new GenericArrayData(vals.toArray))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * (4 + nSlots * 8))
    bb.putInt(buf.size)
    buf.foreach { case (pid, slots) =>
      bb.putInt(pid)
      slots.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
    var j = 0
    while (j < n) {
      val pid = bb.getInt
      buf.put(pid, Array.fill(nSlots)(bb.getLong()))
      j += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(partId, keep, text, ruleHits)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(partId = newChildren(0), keep = newChildren(1),
      text = newChildren(2), ruleHits = newChildren(3))
  override def withNewMutableAggBufferOffset(newOffset: Int): PartitionMetricsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PartitionMetricsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "partition_metrics"
}

object PartitionMetricsAgg {
  def apply(partId: Column, keep: Column, text: Column, ruleHits: Column): Column =
    GraftSqlShim.column(PartitionMetricsAgg(
      GraftSqlShim.expression(partId), GraftSqlShim.expression(keep),
      GraftSqlShim.expression(text), GraftSqlShim.expression(ruleHits))
      .toAggregateExpression())

  /** Parse the flat metric map back into (pid → (in, kept, bytes, ruleHits)). */
  def parse(m: Map[String, Long]): Map[Int, (Long, Long, Long, Map[String, Long])] =
    m.keys.map(_.takeWhile(_ != '/').toInt).toSeq.distinct.sorted.map { pid =>
      val rules = RuleSpec.AllRules
        .flatMap(r => m.get(s"$pid/$r").map(r -> _)).toMap
      pid -> ((m.getOrElse(s"$pid/in", 0L), m.getOrElse(s"$pid/kept", 0L),
        m.getOrElse(s"$pid/bytes", 0L), rules))
    }.toMap
}
