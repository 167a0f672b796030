package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance (IVM) for count/sum group-by summaries
  * driven by the table layer's changelog (`TableIO.readChangelog`,
  * `_change_type` INSERT/DELETE rows).
  *
  * The reference recomputes every summary table from the full fact
  * table on each run (AggregationJob.scala:43-86 reads the whole fact
  * and overwrites/appends the rollups). At 100 TB that is the dominant
  * cost of keeping a dashboard fresh: a day's changes are ~0.1% of the
  * table, but the recompute scans 100%. Count/sum aggregates are
  * self-maintainable — INSERT contributes +1/+x, DELETE contributes
  * -1/-x — so the summary can be rolled forward by aggregating ONLY
  * the changelog and merging the signed delta into the stored summary:
  * cost proportional to the change volume, not the table.
  *
  * Exactness: measures are summed as decimals (the [[graft.functions.ExactAgg]]
  * discipline), so base + delta is exact integer arithmetic and the
  * maintained summary is bit-identical to a full recompute — the
  * property `IvmSpec` pins and the q85 oracle checks end-to-end.
  * (Avg derives from sum/count; min/max are NOT self-maintainable
  * under deletes and are deliberately out of scope here — maintaining
  * them needs the changelog-free recompute or a sketch.)
  */
object ViewMaintenance {

  /** One summed measure: source column, output alias, decimal scale
    * (must cover the column's true decimal precision — see ExactAgg).
    */
  final case class Measure(column: String, alias: String, scale: Int = 2)

  private def decType(m: Measure): DecimalType = DecimalType(30, m.scale)

  /** Group-by summary in MERGEABLE form: `count` as BIGINT and each
    * measure as an exact DECIMAL(30, scale) sum (not yet cast to
    * double) so [[applyDelta]] can add deltas without rounding.
    */
  def summarize(df: DataFrame, keys: Seq[String], countAlias: String,
                measures: Seq[Measure]): DataFrame = {
    val aggs = count(lit(1)).as(countAlias) +:
      measures.map(m => sum(col(m.column).cast(decType(m))).as(m.alias))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Roll a [[summarize]]-shaped summary forward by a changelog slice.
    *
    * The delta aggregates the changelog with sign +1 for INSERT and -1
    * for DELETE (an UPDATE arrives as its DELETE+INSERT pair, which
    * composes correctly), then full-outer-merges into the summary by
    * key: groups born in the delta appear (base side null), groups
    * whose count reaches zero are dropped. A negative merged count
    * means the changelog does not actually extend this summary's
    * version — fail loudly rather than publish a corrupt rollup.
    *
    * Scale shape: one map-side-combined aggregate over the changelog
    * (change volume, not table volume) plus a join keyed on the GROUP
    * keys — summary cardinality, typically broadcastable even when
    * the base table is 100 TB.
    */
  def applyDelta(summary: DataFrame, changelog: DataFrame, keys: Seq[String],
                 countAlias: String, measures: Seq[Measure]): DataFrame = {
    // unknown change types must be LOUD: a sign of NULL would make
    // sum() silently skip the row and publish a wrong rollup (e.g. a
    // CDC source emitting UPDATE_AFTER rows this maintainer doesn't
    // understand)
    val sign = when(col("_change_type") === "INSERT", 1L)
      .when(col("_change_type") === "DELETE", -1L)
      .otherwise(raise_error(concat(
        lit("IVM: unknown _change_type '"), col("_change_type").cast("string"),
        lit("' (expected INSERT or DELETE)"))))
    val dCount = s"_d_$countAlias"
    val dKeys = keys.map(k => s"_d_$k")
    val dAggs = sum(sign).as(dCount) +:
      measures.map(m => sum(sign.cast(decType(m)) * col(m.column).cast(decType(m))).as(s"_d_${m.alias}"))
    val delta = changelog.groupBy(keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)
      .select(keys.zip(dKeys).map { case (k, dk) => col(k).as(dk) } ++
        (dCount +: measures.map(m => s"_d_${m.alias}")).map(col): _*)

    // NULL-SAFE key equality: a plain equi-join would never merge a
    // NULL group's base and delta rows (NULL != NULL), splitting the
    // group in two and defeating the underflow guard
    val cond = keys.zip(dKeys).map { case (k, dk) => summary(k) <=> col(dk) }.reduce(_ && _)
    val merged = summary.join(delta, cond, "full_outer")
    val newCount = coalesce(col(countAlias), lit(0L)) + coalesce(col(dCount), lit(0L))
    def newMeasure(m: Measure): Column =
      (coalesce(col(m.alias), lit(0).cast(decType(m))) +
        coalesce(col(s"_d_${m.alias}"), lit(0).cast(decType(m)))).cast(decType(m))
    val outKeys = keys.zip(dKeys).map { case (k, dk) => coalesce(summary(k), col(dk)).as(k) }
    val guarded = when(newCount < 0L,
      raise_error(concat(lit("IVM underflow: changelog deletes more rows than the summary holds for key ("),
        concat_ws(",", keys.zip(dKeys).map { case (k, dk) =>
          coalesce(summary(k), col(dk)).cast("string") }: _*), lit(")"))))
      .otherwise(newCount)
    merged
      .select((outKeys :+ guarded.as(countAlias)) ++ measures.map(m => newMeasure(m).as(m.alias)): _*)
      .filter(col(countAlias) > 0L)
  }
}
