package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (z-order) curve values as pure column arithmetic — the
  * clustering key behind `TableIO.compactZOrder`.
  *
  * Why: sorting a table by (a, b) gives every data file a tight
  * min/max range on `a` but a near-full range on `b`, so footer-stats
  * file skipping (graft.io.FileStats) only works for predicates on the
  * leading column. Interleaving the bits of both columns makes each
  * file cover a small square of the (a, b) plane — BOTH single-column
  * predicates prune files (Iceberg's OPTIMIZE ZORDER rationale).
  *
  * Built entirely from shiftleft/bitwise built-ins so it stays inside
  * whole-stage codegen — no UDF, no custom expression needed.
  * Inputs must be NON-NEGATIVE and fit in 31 bits (ids, bucketed
  * hashes, day numbers, rank-normalized values); negative inputs
  * would interleave their sign bits and break curve locality. Callers
  * with arbitrary domains normalize first (e.g. dense_rank - 1, or a
  * fixed offset), as Iceberg does with its fixed-width byte mapping.
  */
object ZOrder {

  /** Spread the low 31 bits of `c` so one zero bit separates each data
    * bit (the Morton encoding half-step): 0b...abc -> 0b...a0b0c.
    */
  private def spread(c: Column): Column = {
    val masks = Seq(
      (16, lit(0x0000FFFF0000FFFFL)),
      (8,  lit(0x00FF00FF00FF00FFL)),
      (4,  lit(0x0F0F0F0F0F0F0F0FL)),
      (2,  lit(0x3333333333333333L)),
      (1,  lit(0x5555555555555555L))
    )
    masks.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(m)
    }
  }

  /** 2-D Morton value: bits of `a` on even positions, `b` on odd. */
  def zvalue(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
}
