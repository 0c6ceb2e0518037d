package operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §3.5 #29 / §3.8 #52): custom aggregation
  * buffers with automatic partial/final merge — Spark runs these with
  * map-side combine exactly like built-in aggregates, so the shuffle moves
  * one buffer per (task × group), not one row per input.
  */
object Aggregators {

  /** Pricing buffer: count + exact cents sum (long) in one pass. */
  final case class PriceBuf(n: Long, cents: Long)

  /** Custom Aggregator equivalent to
    * (count(*), sum(round(price*100)::bigint)) — oracle-checkable in SQL
    * while exercising the Aggregator/udaf code path.
    */
  object PriceStats extends Aggregator[Double, PriceBuf, PriceBuf] {
    override def zero: PriceBuf = PriceBuf(0L, 0L)
    override def reduce(b: PriceBuf, price: Double): PriceBuf =
      PriceBuf(b.n + 1, b.cents + math.round(price * 100))
    override def merge(a: PriceBuf, b: PriceBuf): PriceBuf =
      PriceBuf(a.n + b.n, a.cents + b.cents)
    override def finish(b: PriceBuf): PriceBuf = b
    override def bufferEncoder: Encoder[PriceBuf] = Encoders.product[PriceBuf]
    override def outputEncoder: Encoder[PriceBuf] = Encoders.product[PriceBuf]
  }

  /** Per-conversation stats buffer (typed Dataset tier, BASELINE.json:15). */
  final case class ConvBuf(nTurns: Long, bytes: Long, maxIdx: Int)

  object ConvStats extends Aggregator[core.Turn, ConvBuf, ConvBuf] {
    override def zero: ConvBuf = ConvBuf(0L, 0L, -1)
    override def reduce(b: ConvBuf, t: core.Turn): ConvBuf = ConvBuf(
      b.nTurns + 1,
      b.bytes + (if (t.text == null) 0
                 else t.text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length),
      math.max(b.maxIdx, t.turn_idx))
    override def merge(a: ConvBuf, b: ConvBuf): ConvBuf =
      ConvBuf(a.nTurns + b.nTurns, a.bytes + b.bytes, math.max(a.maxIdx, b.maxIdx))
    override def finish(b: ConvBuf): ConvBuf = b
    override def bufferEncoder: Encoder[ConvBuf] = Encoders.product[ConvBuf]
    override def outputEncoder: Encoder[ConvBuf] = Encoders.product[ConvBuf]
  }
}
