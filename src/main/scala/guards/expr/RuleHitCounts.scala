package guards.expr

import core.RuleSpec
import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ⚙️-tier aggregate (SURVEY.md §3.8 #53): per-rule hit counts in ONE pass
  * over `rule_hits: array<string>` with a fixed long[] buffer — replaces
  * explode(rule_hits) → shuffle-of-every-hit → groupBy with a partial
  * aggregate whose shuffle payload is one 14-slot vector per task.
  * Output: map<rule, hits> (plus the "_rows" slot = input row count).
  */
case class RuleHitCounts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val ruleIndex: Map[UTF8String, Int] =
    RuleSpec.AllRules.zipWithIndex.map { case (r, i) =>
      UTF8String.fromString(r) -> i
    }.toMap
  private def nSlots = RuleSpec.AllRules.length + 1 // last slot: row count

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nSlots)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        ruleIndex.get(arr.getUTF8String(i)).foreach(idx => buf(idx) += 1)
        i += 1
      }
    }
    buf(nSlots - 1) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val keys = RuleSpec.AllRules :+ "_rows"
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(UTF8String.fromString).toArray[Any]),
      new GenericArrayData(buf.map(Long.box).toArray[Any]))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): RuleHitCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RuleHitCounts =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "rule_hit_counts"
}

object RuleHitCounts {
  /** Column API: rule-hit count map aggregate over a rule_hits column. */
  def apply(ruleHits: Column): Column =
    GraftSqlShim.column(
      RuleHitCounts(GraftSqlShim.expression(ruleHits)).toAggregateExpression())
}
