package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact integer floor-division for time-cell bucketing, shared by the
  * grid-bucket operators ([[IntervalJoin]], [[AsofJoin]]'s sliced
  * variants). Two correctness traps live here:
  *
  *   - Spark's `/` on two longs evaluates in Double: for |numerator| >
  *     2^53 (epoch NANOSECONDS are ~2^60 today) the mantissa can't hold
  *     the value and rows land in the WRONG cell — an odd multiple of an
  *     odd width rounds to the neighbouring even double before dividing.
  *   - SQL `div` truncates toward zero, which mis-cells negative epochs
  *     (pre-1970 timestamps): -1/1000 must be cell -1, not cell 0.
  *
  * So: subtract the non-negative `pmod` remainder first (long arithmetic,
  * exact), making the numerator an exact multiple of the divisor, then
  * divide in decimal(38,0) — Spark's decimal division rounds the true
  * quotient to ≥6 fractional digits, and since the true quotient is
  * integral the rounded value is exact for any long input. */
object TimeCells {

  def floorDiv(c: Column, divisor: Column): Column = {
    val cl = c.cast("long")
    ((cl - pmod(cl, divisor)).cast("decimal(38,0)") /
      divisor.cast("decimal(38,0)")).cast("long")
  }
}
