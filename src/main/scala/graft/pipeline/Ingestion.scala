package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingestion-stage cleaning/enrichment: pure `DataFrame => DataFrame`,
  * separated from IO so it unit-tests on in-memory fixtures.
  *
  * Capability parity with the reference's ingestion transform chain
  * (reference: IngestionJob.scala:44-68): bulk lowercase rename (P1),
  * targeted renames (P2), date/derived columns (P3, X1-X5), null-drop
  * on a column subset (F1), conjunctive positivity filters (F2/F3),
  * and a null-guarded ratio with a CASE WHEN chain (F8).
  *
  * All expressions are built-in `functions._` so the whole chain stays
  * inside whole-stage codegen, and the filters sit directly over the
  * scan so Catalyst pushes them into the parquet reader.
  */
object Ingestion {

  /** Normalize column names to lowercase (reference: IngestionJob.scala:45). */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** Clean + enrich raw lineitem rows (trip-record analog).
    *
    * - rename `l_shipdate` -> `ship_ts` (reference renames
    *   tpep_pickup_datetime -> pickup_datetime, IngestionJob.scala:46-49)
    * - derive `ship_date`, `ship_year`, `ship_month`
    * - drop rows with nulls in the measure columns
    *   (reference: IngestionJob.scala:53)
    * - keep only positive quantity/price and non-negative discount
    *   (reference: IngestionJob.scala:54-58)
    * - `revenue` = extendedprice * (1 - discount); `unit_price` is
    *   null-guarded like the reference's average_speed_mph
    *   (reference: IngestionJob.scala:61-67)
    * - `price_band` CASE WHEN bucketing (reference's borough bucketing
    *   shape, DimensionJob.scala:48-54)
    */
  def cleanLineitem(raw: DataFrame): DataFrame = {
    normalizeColumns(raw)
      .withColumnRenamed("l_shipdate", "ship_ts")
      .withColumn("ship_date", to_date(col("ship_ts")))
      .withColumn("ship_year", year(col("ship_ts")))
      .withColumn("ship_month", month(col("ship_ts")))
      .na.drop(Seq("l_quantity", "l_extendedprice", "l_discount", "ship_ts"))
      .filter(
        col("l_quantity") > 0 &&
          col("l_extendedprice") > 0 &&
          col("l_discount") >= 0 && col("l_discount") < 1
      )
      .withColumn("revenue", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .withColumn(
        "unit_price",
        when(col("l_quantity") > 0, col("l_extendedprice") / col("l_quantity"))
          .otherwise(lit(null))
      )
      .withColumn(
        "price_band",
        when(col("l_extendedprice") < 20000, "low")
          .when(col("l_extendedprice") < 45000, "mid")
          .otherwise("high")
      )
  }
}
