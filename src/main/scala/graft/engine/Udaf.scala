package graft.engine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed-UDAF surface (SURVEY §4.3): `Aggregator` implementations for
  * the estimator kernels, registerable via `functions.udaf` for SQL use or
  * applied as `TypedColumn`s on Datasets.
  *
  * [[WeightedRatioAgg]] is the closed-form no-intercept least squares
  * sum(x*y)/sum(x*x) (A6/A7, reference main.py:92-103) as a single
  * distributed aggregate: partial (sxy, sxx) pairs merge associatively, so
  * Spark plans it as a two-phase hash aggregation like any built-in.
  *
  * Note the buffer sums are plain doubles — merge order is nondeterministic,
  * so results can differ in final ulps across runs (fine for the estimator
  * use; the oracle-checked queries use the Det.dsum decimal form instead).
  */
object WeightedRatioAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
    (b._1 + a._1 * a._2, b._2 + a._1 * a._1) // (sum(x*y), sum(x*x))
  override def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(r: (Double, Double)): Double = r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** SIR Euler step as an Aggregator over an ORDERED per-entity series
  * (SirStepAggregator from SURVEY §4.3). The recurrence itself is
  * order-sensitive, so this aggregator is only sound where Spark guarantees
  * ordered single-stream reduction — i.e. over a sorted-within-group
  * iterator (flatMapGroups, see Sir.simulatePerKey) or a bounded collected
  * series. The reduce step advances the state by one Euler day; merge
  * concatenation is NOT associative and therefore throws — by design, the
  * same honesty as the reference's sequential loop.
  */
final class SirStepAggregator(p: SirParams, n: Double)
    extends Aggregator[SirSeriesRow, SirPoint, SirPoint] {
  override def zero: SirPoint = null
  override def reduce(s: SirPoint, row: SirSeriesRow): SirPoint =
    if (s == null) SirPoint(0, n - row.i - row.r - row.d, row.i, row.r, row.d)
    else {
      val dS = p.alpha * s.r - p.beta * s.s * s.i / n
      val dI = p.beta * s.s * s.i / n - (p.mu + p.gamma) * s.i
      val dR = p.gamma * s.i - p.alpha * s.r
      val dD = p.mu * s.i
      SirPoint(s.step + 1, s.s + dS, s.i + dI, s.r + dR, s.d + dD)
    }
  override def merge(b1: SirPoint, b2: SirPoint): SirPoint =
    if (b1 == null) b2
    else if (b2 == null) b1
    else throw new UnsupportedOperationException(
      "SIR recurrence is order-sensitive; use over a sorted per-group stream")
  override def finish(r: SirPoint): SirPoint = r
  override def bufferEncoder: Encoder[SirPoint] = Encoders.product[SirPoint]
  override def outputEncoder: Encoder[SirPoint] = Encoders.product[SirPoint]
}
