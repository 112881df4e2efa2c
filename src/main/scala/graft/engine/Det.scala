package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, TimestampType}

/** Determinism helpers for oracle-comparable aggregates.
  *
  * Floating-point SUM/AVG are order-dependent: Spark's partial+final hash
  * aggregation and DuckDB's aggregation visit rows in different orders, so
  * `sum(double)` differs between the two engines in the last few ulps — enough
  * to fail a hash compare. The fix is exact arithmetic: round each input row
  * to a fixed scale (deterministic given identical input doubles), then sum
  * as DECIMAL (exact, order-independent), then cast the final result back to
  * DOUBLE (deterministic). Both engines produce bit-identical results.
  *
  * Results are quantized to 6 decimal places at the *row* level — a documented
  * engine-level contract (the oracle mirrors it). DECIMAL(38,6) leaves 32
  * integer digits of headroom, so the sum cannot overflow at any realistic
  * scale (100 TB of 1e6-scale values is ~1e20 « 1e32); with ANSI off an
  * overflow would silently return NULL, so the headroom is the safety story.
  *
  * SQL-side mirror (DuckDB): `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
  */
object Det {
  /** Exact, order-independent sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(38, 6))).cast(DoubleType)

  /** Exact average: exact decimal sum divided (in double) by non-null count.
    * Mirrors SQL `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)`. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Session-timezone-safe timestamp literal: parsed under
    * spark.sql.session.timeZone (UTC here), unlike java.sql.Timestamp.valueOf
    * which uses the JVM default zone. Mirrors DuckDB's naive TIMESTAMP 'x'. */
  def ts(s: String): Column = lit(s).cast(TimestampType)

  /** Pandas/IEEE754 division (quirk Q9): x/0 -> ±Infinity, 0/0 -> NaN,
    * null propagates. Spark's own `/` returns NULL on a zero divisor for
    * EVERY numeric type (ANSI or not), which silently drops the reference's
    * documented blow-up rows; this wrapper restores the float semantics the
    * reference relies on (README.md:134). Deviation: a negative-zero divisor
    * gets the +0.0 sign (pandas would flip the infinity). */
  def pdiv(num: Column, den: Column): Column =
    when(den === 0.0,
      when(num.isNull, lit(null))
        .when(num > 0, lit(Double.PositiveInfinity))
        .when(num < 0, lit(Double.NegativeInfinity))
        .otherwise(lit(Double.NaN)))
      .otherwise(num / den)
}
