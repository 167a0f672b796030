package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.time.temporal.ChronoUnit

/** Dimension synthesis.
  *
  * Location-dim analog: the set of nation keys referenced by customers
  * and suppliers (the reference unions pickup+dropoff location ids,
  * DimensionJob.scala:39-42), enriched with derived attributes via
  * concat / CASE WHEN / between / isin (reference:
  * DimensionJob.scala:43-56).
  *
  * Date-dim analog: driver-side min/max round-trip feeding
  * `spark.range` + `date_add` (reference: DimensionJob.scala:63-88).
  */
object Dimensions {

  /** Union-distinct of the two role keys, then attribute derivation.
    *
    * Scale note: the union-distinct is a shuffle on a tiny key domain
    * (nation keys) — at 100 TB the fact-side projections feeding it are
    * single-column parquet scans (column pruning reaches the reader),
    * so the shuffle payload is bounded by the key cardinality after
    * partial aggregation, not the fact row count.
    */
  def locationDim(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val custKeys = customer.select(col("c_nationkey").cast("int").as("location_id"))
    val suppKeys = supplier.select(col("s_nationkey").cast("int").as("location_id"))
    custKeys
      .union(suppKeys) // U1: positional UNION ALL (reference: DimensionJob.scala:39-41)
      .distinct()      // U2: set-union semantics (reference: DimensionJob.scala:42)
      .filter(col("location_id").isNotNull && col("location_id") =!= lit(-1)) // F4/F5
      .withColumn("location_name", concat(lit("LOC_"), col("location_id"))) // X7
      .withColumn(
        "region_bucket", // F6/F8: 5-way BETWEEN bucketing (reference: DimensionJob.scala:48-54)
        when(col("location_id").between(0, 4), "AMERICA")
          .when(col("location_id").between(5, 9), "ASIA")
          .when(col("location_id").between(10, 14), "EUROPE")
          .when(col("location_id").between(15, 19), "MIDEAST")
          .otherwise("AFRICA")
      )
      .withColumn("zone", concat(lit("Zone_"), col("location_id")))
      .withColumn("is_hub", col("location_id").isin(1, 7, 13)) // F7
  }

  /** Location dim from a real lookup table (the reference ships
    * taxi-zone-lookup.csv as the realistic source, README.md:50 /
    * SURVEY.md S9). Any (id, name, zone) DataFrame works.
    */
  def locationDimFromLookup(lookup: DataFrame, idCol: String, boroughCol: String, zoneCol: String): DataFrame =
    lookup.select(
      col(idCol).cast("int").as("location_id"),
      col(boroughCol).as("borough"),
      col(zoneCol).as("zone")
    )

  /** Date dimension covering [min, max] of `dateCol` in `src`.
    *
    * Keeps the reference's idiomatic driver round-trip: global min/max
    * agg -> head() -> JVM date math -> re-enters the plan as
    * `spark.range(days)` + `date_add` (reference: DimensionJob.scala:63-79).
    * The range source is a driver-side O(1) metadata node, so this
    * scales regardless of fact size; the min/max agg is a full scan of
    * one column with partial aggregation (cheap at any scale).
    */
  def dateDim(spark: SparkSession, src: DataFrame, dateCol: String): DataFrame = {
    val row = src.agg(min(to_date(col(dateCol))).as("mn"), max(to_date(col(dateCol))).as("mx")).head()
    val minDate = row.getDate(0).toLocalDate
    val maxDate = row.getDate(1).toLocalDate
    val days = ChronoUnit.DAYS.between(minDate, maxDate) + 1
    spark
      .range(days) // S3
      .withColumn("full_date", date_add(lit(minDate.toString).cast("date"), col("id").cast("int"))) // X9
      .select(
        col("full_date"),
        col("full_date").as("date_key"),
        year(col("full_date")).as("year"),            // X10
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        dayofmonth(col("full_date")).as("day_of_month"),
        dayofweek(col("full_date")).as("day_of_week"), // Sunday=1 (pinned by spec test)
        dayofweek(col("full_date")).isin(1, 7).as("is_weekend")
      )
  }
}
