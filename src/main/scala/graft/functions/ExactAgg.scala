package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent exact aggregation over double money/measure
  * columns.
  *
  * Plain `sum(double)` depends on partition-level summation order, so
  * results drift in the last ulp between runs/engines, and rounding
  * the noisy sum is unstable exactly at round boundaries (which
  * k-decimal inputs hit systematically — their sums land on exact
  * .xx5 values). Casting to decimal first makes the sum exact and
  * order-independent: any engine computing the same decimal sum gets
  * the identical value, and the final cast back to double is a single
  * deterministic nearest-double conversion.
  *
  * `scale` must be >= the true decimal precision of the column (the
  * cast is then lossless). Decimal hash aggregation stays inside
  * whole-stage codegen, so the cost vs a double sum is negligible
  * relative to the shuffle it sits on.
  */
object ExactAgg {

  /** Exact sum of a `scale`-decimal double column, returned as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast("double")

  /** Exact-numerator average: decimal sum / count, one IEEE division. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))
}
