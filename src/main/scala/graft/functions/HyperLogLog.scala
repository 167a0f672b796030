package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog: a mergeable distinct-count sketch whose every
  * step is EXACTLY reproducible in a second engine — the sketch-family
  * counterpart of `approx_count_distinct` (q09) with the q12/q98
  * portability construction applied to the Flajolet et al. 2007
  * estimator.
  *
  * Construction (m = 1024 registers, p = 10):
  * - value hash = first 60 bits of md5 of the value string (the
  *   repo-standard portable hash);
  * - register index = top 10 of those bits; rho = leading-zero count
  *   of the remaining 50-bit window + 1 (51 for the all-zero window),
  *   computed by a generated integer-comparison CASE chain — no
  *   engine-specific bit intrinsics, so Spark and DuckDB agree bit for
  *   bit;
  * - per-register state = max(rho): the classic HLL register, and the
  *   reason the sketch MERGES — max is commutative/associative/
  *   idempotent, so partial aggregates combine across partitions,
  *   batches, or snapshots without bias (spec-pinned: halves merged ==
  *   whole corpus);
  * - estimate = alpha_m * m^2 / sum_j 2^(-M_j). The harmonic sum is
  *   kept EXACT: each register contributes the integer 2^(51 - M_j)
  *   (absent registers contribute 2^51), summed as longs (max 2^62 —
  *   no overflow), with ONE double division at the end. Aggregated
  *   doubles are never compared across engines; order-independent
  *   integer sums + a fixed-shape double expression are (the
  *   OracleQueries parity rules).
  *
  * The raw estimator only (no small-range linear-counting branch): the
  * correction needs ln(), which is not correctly-rounded-guaranteed in
  * either engine — the one step that would break bit parity. Callers
  * in the corrected range can apply it to `used_registers` downstream.
  *
  * Scale shape (100 TB): the value shuffle is replaced by a
  * (group, register) key — at most groups x 1024 rows reach the
  * second aggregate regardless of input size, and the first aggregate
  * map-side combines, so the shuffle carries register partials, not
  * values. count(DISTINCT x) at 100 TB shuffles every distinct value;
  * this shuffles 8 KB per group.
  *
  * Reference scope: the reference (AggregationJob.scala) has exact
  * countDistinct only; sketches are part of the large-scale extension
  * surface the brief mandates.
  */
object HyperLogLog {

  val P: Int = 10
  val M: Int = 1 << P // 1024 registers
  val WindowBits: Int = 60 - P // 50
  val WindowMask: Long = (1L << WindowBits) - 1
  /** 2^51 — the contribution of an untouched (M_j = 0) register. */
  val ZeroTerm: Long = 1L << (WindowBits + 1)

  /** 60-bit portable md5 hash (engine-identical; q12's construction). */
  def hash60Sql(valueSql: String): String =
    s"CAST(conv(substring(md5($valueSql), 1, 15), 16, 10) AS BIGINT)"

  /** rho over a 50-bit window column as a generated CASE chain of
    * integer comparisons — valid verbatim in Spark SQL AND DuckDB.
    * bitlength(w) = k+1 when 2^k <= w < 2^(k+1) -> rho = 50 - k.
    */
  def rhoCaseSql(w: String): String = {
    val whens = (WindowBits - 1) to 0 by -1 map { k =>
      s"WHEN $w >= ${1L << k} THEN ${WindowBits - k}"
    }
    s"(CASE ${whens.mkString(" ")} ELSE ${WindowBits + 1} END)"
  }

  /** The deterministic estimate expression over exact long columns
    * `sHit` (sum of 2^(51-M_j) over hit registers) and `used` (hit
    * register count). Identical text runs in DuckDB: every literal is
    * cast to double before use and the operation shape is fixed, so
    * the result is IEEE-identical cross-engine.
    */
  def estimateSql(sHit: String, used: String): String =
    s"""CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST($M.0 AS DOUBLE))
       | * CAST(${M.toLong * M}.0 AS DOUBLE) * CAST($ZeroTerm.0 AS DOUBLE)
       | / CAST($sHit + (${M.toLong} - $used) * $ZeroTerm AS DOUBLE)""".stripMargin.replace("\n", "")

  /** The register frame: one row per (group, register) with the max
    * rho — the sketch in relational form. Mergeable by construction:
    * `registers(a union b)` == max-merge of `registers(a)` and
    * `registers(b)` on the register key.
    */
  def registers(df: DataFrame, valueSql: String, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    // NULL values contribute nothing (count(DISTINCT) semantics — a
    // null would otherwise pollute one register via the CASE fallback)
    df.filter(expr(s"($valueSql) IS NOT NULL"))
      .select(g :+ expr(hash60Sql(valueSql)).as("h"): _*)
      .select(g ++ Seq(
        shiftright(col("h"), WindowBits).as("reg"),
        expr(rhoCaseSql(s"(h & $WindowMask)")).as("rho")): _*)
      .groupBy(g :+ col("reg"): _*)
      .agg(max(col("rho")).as("m"))
  }

  /** Per-group estimate from a register frame (the output shape of
    * [[registers]], or a PERSISTED/merged register table — the
    * incremental path): `(groupCols..., used_registers, hll_estimate)`.
    */
  def estimateFromRegisters(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    regs
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("used_registers"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${WindowBits + 1} - m)")).as("s_hit"))
      .select(g ++ Seq(
        col("used_registers"),
        expr(estimateSql("s_hit", "used_registers")).as("hll_estimate")): _*)
  }

  /** Per-group estimate: `(groupCols..., used_registers, hll_estimate)`. */
  def estimate(df: DataFrame, valueSql: String, groupCols: Seq[String]): DataFrame =
    estimateFromRegisters(registers(df, valueSql, groupCols), groupCols)
}
