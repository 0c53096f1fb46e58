package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` registered through `udaf()` — the
  * fourth aggregation surface the engine exercises (built-in codegen'd
  * aggregates, the `TypedImperativeAggregate` bounded heap
  * [TopKAggregate], the `mapGroups` fold [q_capped_balance], and this
  * Encoder-backed typed API). The buffer is a case class serialized by
  * an Encoder, `merge` is associative-commutative (all-integer
  * count/sum/min/max over cents), so map-side partial aggregation
  * applies exactly as with built-ins — and the all-BIGINT state makes
  * the result bit-exact for the DuckDB oracle.
  */
final case class RangeStatsBuf(n: Long, sum: Long, mn: Long, mx: Long)
final case class RangeStatsOut(n: Long, sum_cents: Long, min_cents: Long,
    max_cents: Long)

object RangeStatsAggregator extends Aggregator[Long, RangeStatsBuf, RangeStatsOut] {
  override def zero: RangeStatsBuf =
    RangeStatsBuf(0L, 0L, Long.MaxValue, Long.MinValue)
  override def reduce(b: RangeStatsBuf, cents: Long): RangeStatsBuf =
    RangeStatsBuf(b.n + 1, b.sum + cents, math.min(b.mn, cents),
      math.max(b.mx, cents))
  override def merge(a: RangeStatsBuf, b: RangeStatsBuf): RangeStatsBuf =
    RangeStatsBuf(a.n + b.n, a.sum + b.sum, math.min(a.mn, b.mn),
      math.max(a.mx, b.mx))
  override def finish(r: RangeStatsBuf): RangeStatsOut =
    RangeStatsOut(r.n, r.sum, if (r.n == 0) 0L else r.mn,
      if (r.n == 0) 0L else r.mx)
  override def bufferEncoder: Encoder[RangeStatsBuf] = Encoders.product
  override def outputEncoder: Encoder[RangeStatsOut] = Encoders.product
}
