package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg.{davg, dsum}

/** Summary-table aggregations over the fact table.
  *
  * Capability parity with the reference's three aggregation queries
  * (AggregationJob.scala:43-86): multi-key hash aggregates with
  * count/sum/avg batteries (A1, A2), and a pair aggregation feeding a
  * global top-k (A3 + O1).
  *
  * Scale notes: every aggregate is a partial (map-side) + final
  * HashAggregate around one hash-partitioned exchange — the minimum
  * shuffle shape. Double-typed sums/avgs go through ExactAgg (decimal
  * summation) so results are order-independent — summation order
  * varies across partitions and would otherwise make results
  * nondeterministic at any scale. The top-k is orderBy+limit, which
  * Catalyst plans as
  * TakeOrderedAndProject — per-partition top-k then a driver merge of
  * k*numPartitions rows, never a global sort (reference gets the same
  * physical plan from AggregationJob.scala:84-85).
  */
object Aggregations {

  /** A1-shape: date x cust-nation x supp-nation daily summary
    * (reference: AggregationJob.scala:43-51, incl. the sum().cast long
    * — expressed as floor() so the truncation direction is explicit).
    */
  def pairDailySummary(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("ship_date_key"), col("cust_nation"), col("supp_nation"))
      .agg(
        count(lit(1)).as("total_trips"),
        dsum(col("revenue"), 4).as("total_revenue"),
        davg(col("l_quantity"), 2).as("avg_quantity"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        floor(dsum(col("l_quantity"), 2)).cast("long").as("total_quantity")
      )

  /** A2-shape: calendar-attribute summary
    * (reference: AggregationJob.scala:60-66).
    */
  def timeSummary(fact: DataFrame): DataFrame =
    fact
      .groupBy(
        col("order_year"),
        col("order_quarter"),
        month(col("order_date")).as("order_month"),
        dayofweek(col("order_date")).as("day_of_week"),
        dayofweek(col("order_date")).isin(1, 7).as("is_weekend")
      )
      .agg(
        count(lit(1)).as("trip_count"),
        dsum(col("revenue"), 4).as("total_revenue"),
        davg(col("l_extendedprice"), 2).as("avg_fare")
      )

  /** Sketch-based corpus statistics — the approximate battery for
    * scales where exact distinct/percentile shuffles are the cost
    * (SURVEY.md A7 notes approx_count_distinct as the built-in).
    * HLL++ distinct and quantile sketches are mergeable, so both run
    * as one partial+final aggregate with bounded state per partition
    * regardless of cardinality; accuracy bounds are pinned by spec
    * against the exact answers at test scale.
    */
  def approxStats(df: DataFrame, keyCol: String, valueCol: String, rsd: Double = 0.02): DataFrame =
    df.agg(
      approx_count_distinct(col(keyCol), rsd).as("approx_distinct"),
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("approx_median"),
      percentile_approx(col(valueCol), lit(0.99), lit(10000)).as("approx_p99"),
      count(lit(1)).as("n_rows")
    )

  /** A3 + O1: nation-pair aggregate -> global top-k. Tie-broken on the
    * full key so LIMIT is deterministic (SURVEY.md §7 risk 4; the
    * reference's bare orderBy(desc).limit(50) at
    * AggregationJob.scala:84-85 is nondeterministic under ties).
    */
  def topPairs(fact: DataFrame, k: Int = 50): DataFrame =
    fact
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(
        count(lit(1)).as("trip_count"),
        davg(col("l_quantity"), 2).as("avg_distance"),
        davg(col("l_extendedprice"), 2).as("avg_fare"),
        dsum(col("revenue"), 4).as("total_revenue")
      )
      .orderBy(desc("trip_count"), asc_nulls_last("cust_nation"), asc_nulls_last("supp_nation"))
      .limit(k)

  /** Exact second-moment statistics per group: correlation, sample
    * covariance, and sample stddev from ORDER-INDEPENDENT component
    * sums. The built-in corr/covar_samp/stddev_samp accumulate doubles
    * in partition order, so their last ulps drift with partition count
    * and run-to-run scheduling — unacceptable where results are
    * compared across engines or reruns (and the reason q05/q07 sums go
    * through ExactAgg). Here the five component sums (Sx, Sy, Sxx,
    * Syy, Sxy) are EXACT decimal sums (2-decimal inputs cast to
    * decimal, products formed in decimal — lossless), and the textbook
    * combines run once per group in double with a fixed expression
    * tree: every engine computing the same formula over the same exact
    * sums produces bit-identical doubles.
    *
    * Scale shape: one partial+final hash aggregate (map-side combine
    * on all five sums), no extra pass vs a single built-in corr.
    */
  def exactCorrelation(df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val dt = org.apache.spark.sql.types.DecimalType(18, 2)
    val x = col(xCol).cast(dt)
    val y = col(yCol).cast(dt)
    val n = col("cnt").cast("double")
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("cnt"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .select(
        col(keyCol),
        col("cnt").as("n_rows"),
        ((n * col("sxy") - col("sx") * col("sy")) /
          sqrt((n * col("sxx") - col("sx") * col("sx")) * (n * col("syy") - col("sy") * col("sy"))))
          .as("corr_xy"),
        ((col("sxy") - col("sx") * col("sy") / n) / (n - 1)).as("covar_xy"),
        sqrt((col("syy") - col("sy") * col("sy") / n) / (n - 1)).as("stddev_y"))
  }

  /** Customer-revenue decile profile per market segment: every
    * customer (order-less ones at revenue 0) is ranked into NTILE(10)
    * within their segment, then each (segment, decile) reports its
    * population and revenue stats — the "what does my top 10% look
    * like" query.
    *
    * Scale shape: orders pre-aggregate to (custkey, revenue) BEFORE
    * joining customers, so the join shuffle carries one row per
    * customer, not one per order. The NTILE window partitions by
    * segment — the sort is distributed across segments, never a
    * single-partition global sort (the trap a bare
    * `ntile().over(orderBy(...))` with no partitionBy falls into; at
    * 100 TB a global exact decile would instead compute boundary
    * ranks from a mergeable quantile sketch, the approxStats family).
    * Determinism: per-customer revenue is an exact decimal sum, the
    * window order tie-breaks on custkey, and decile revenue sums
    * re-enter decimal — bit-identical across engines and partition
    * counts.
    */
  def segmentDeciles(customer: DataFrame, orders: DataFrame): DataFrame = {
    val rev = orders.groupBy(col("o_custkey"))
      .agg(dsum(col("o_totalprice"), 2).as("revenue"))
    val perCustomer = customer
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("revenue"), lit(0.0d)).as("revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(desc("revenue"), asc("c_custkey"))
    perCustomer
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(
        count(lit(1)).as("n_customers"),
        dsum(col("revenue"), 2).as("total_revenue"),
        min(col("revenue")).as("min_revenue"),
        max(col("revenue")).as("max_revenue"))
  }
}
