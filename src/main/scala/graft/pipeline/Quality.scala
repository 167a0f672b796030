package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks as data: a list of named predicates evaluated in
  * ONE pass over the table, returning a single-row metrics DataFrame.
  *
  * The reference runs each check as its own `filter(pred).count()` job
  * — three full scans plus thresholding (DataQualityJob.scala:31-41).
  * Folding the checks into one aggregate of `sum(CASE WHEN pred)` costs
  * a single scan regardless of check count, which is the difference
  * between 3 and 1 passes over 100 TB.
  */
object Quality {

  final case class Check(name: String, predicate: Column)

  /** One row; one `<name>` BIGINT column per check + `total_rows`. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => sum(when(c.predicate, 1L).otherwise(0L)).as(c.name)) :+
      count(lit(1)).as("total_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The reference's fact-table checks, transliterated
    * (DataQualityJob.scala:31-35: null boroughs x2, invalid duration).
    */
  def factChecks: Seq[Check] = Seq(
    Check("null_cust_nation", col("cust_nation").isNull),
    Check("null_supp_nation", col("supp_nation").isNull),
    Check("invalid_quantity", col("l_quantity") <= 0 || col("l_quantity") >= 1000),
    Check("negative_revenue", col("revenue") < 0)
  )

  /** Rows of `fact` whose `fkCol` has no match in `dim.pkCol`, counted
    * WITHOUT shuffling the fact table's rows: the fact side first
    * map-side-combines to (fk, row_count) — the shuffle then carries
    * distinct keys, not rows — and the anti-join probes the dim's key
    * set (broadcast when the dim is small). Null FKs count as orphans
    * iff `nullIsViolation` (an anti-join would drop them silently —
    * null never equals anything — so they are split out explicitly).
    */
  private def orphanRows(fact: DataFrame, fkCol: String, dim: DataFrame,
                         pkCol: String, name: String,
                         nullIsViolation: Boolean = true): DataFrame = {
    val nn = fact.filter(col(fkCol).isNotNull)
      .groupBy(col(fkCol)).agg(count(lit(1)).as("_n"))
      .join(dim.select(col(pkCol)).distinct(), col(fkCol) === col(pkCol), "left_anti")
      .agg(coalesce(sum(col("_n")), lit(0L)).as("violations"))
    val base = if (nullIsViolation) {
      val nulls = fact.agg(sum(when(col(fkCol).isNull, 1L).otherwise(0L)).as("_nulls"))
      nn.crossJoin(nulls).select((col("violations") + coalesce(col("_nulls"), lit(0L))).as("violations"))
    } else nn
    base.select(lit(name).as("check"), col("violations").as("violations"))
  }

  /** Surplus rows under a declared primary key: for every key with k>1
    * rows, k-1 rows are violations (0 on a clean table).
    */
  private def duplicateRows(df: DataFrame, pkCol: String, name: String): DataFrame =
    df.groupBy(col(pkCol)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1L)
      .agg(coalesce(sum(col("_n") - 1L), lit(0L)).as("violations"))
      .select(lit(name).as("check"), col("violations"))

  /** Referential-integrity + key-uniqueness audit across the star
    * schema, as data: one (check, violations) row per constraint. The
    * reference's quality job only inspects the fact table post hoc
    * (DataQualityJob.scala:31-41); auditing the FK graph itself is the
    * check that catches a bad ingest BEFORE the fact build left-joins
    * the corruption into every downstream rollup. Each FK check scans
    * its fact side once in pre-aggregated form; the six checks union
    * into one job.
    */
  def referentialAudit(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                       supplier: DataFrame, nation: DataFrame): DataFrame =
    Seq(
      orphanRows(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orphan_orderkey"),
      orphanRows(orders, "o_custkey", customer, "c_custkey", "orders_orphan_custkey"),
      orphanRows(customer, "c_nationkey", nation, "n_nationkey", "customer_orphan_nationkey"),
      orphanRows(supplier, "s_nationkey", nation, "n_nationkey", "supplier_orphan_nationkey"),
      duplicateRows(orders, "o_orderkey", "orders_dup_orderkey"),
      duplicateRows(customer, "c_custkey", "customer_dup_custkey")
    ).reduce(_.unionByName(_))
}
