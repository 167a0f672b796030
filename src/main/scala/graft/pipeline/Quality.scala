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
}
