package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExactAgg.dsum

/** Event-stream batch analytics: time-bucketed aggregation, JSON
  * property extraction, and gap-based sessionization. The same
  * transforms back the Structured Streaming variant
  * (graft.streaming.EventsStream) — watermark+window there, identical
  * aggregation semantics here.
  */
object Events {

  /** Hourly tumbling aggregate per event type, with a JSON-extracted
    * property predicate (props is a JSON string column).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"),
        sum(
          when(get_json_object(col("props"), "$.k").cast("int") > 50, 1L).otherwise(0L)
        ).as("n_high_k")
      )

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapMinutes`. Window
    * functions partition by user — one shuffle on user_id; at scale
    * the per-user event lists are small. NOTE the skew caveat: AQE's
    * skewed-partition splitting applies to joins, NOT to window
    * shuffles (every row of a key must stay on one task for the
    * window), so a bot-grade hot user serializes onto a single task —
    * the mitigations are upstream rate caps or splitting hot users by
    * a coarse time bucket before sessionizing (accepting split
    * sessions at the bucket seams for those users).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Gap sessions via Spark's NATIVE session_window operator (same
    * semantics as sessionize() modulo the boundary convention: a gap of
    * exactly `gapMinutes` starts a new session here). One aggregate,
    * no window functions — the operator Spark added precisely so
    * sessionization doesn't need the lag/cumsum idiom.
    */
  def sessionWindowStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("session_value"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("n_events"),
        col("session_value")
      )

  /** Per-user session stats on top of sessionize(). */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("session_value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        dsum(col("session_value"), 2).as("total_value")
      )

  /** Conversion funnel: per user, the FIRST view, the first click
    * within `horizonHours` after that view, and the first purchase
    * within `horizonHours` after that click — reduced to one summary
    * row (stage reach counts + exact average conversion delays).
    *
    * Scale shape: each stage is a user-keyed min-aggregate (map-side
    * combinable, shuffle carries one row per user) followed by an
    * equi-join on user_id with the time bound as a join-residual
    * predicate — never a per-user full sort the way a window over the
    * raw event sequence would be, and no stage ever shuffles raw
    * events twice. Delay averages are exact: microsecond longs summed
    * as BIGINT (order-independent), one IEEE division at the end.
    */
  def conversionFunnel(events: DataFrame, horizonHours: Int = 24): DataFrame = {
    val horizon = expr(s"INTERVAL $horizonHours HOURS")
    val firstView = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val firstClick = events.filter(col("event_type") === "click")
      .join(firstView, Seq("user_id"))
      .filter(col("ts") > col("view_ts") && col("ts") <= col("view_ts") + horizon)
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"), min(col("view_ts")).as("view_ts"))
    val firstPurchase = events.filter(col("event_type") === "purchase")
      .join(firstClick.select(col("user_id"), col("click_ts")), Seq("user_id"))
      .filter(col("ts") > col("click_ts") && col("ts") <= col("click_ts") + horizon)
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"), min(col("click_ts")).as("click_ts"))
    val viewers = firstView.agg(count(lit(1)).as("n_viewers"))
    val clickers = firstClick.agg(
      count(lit(1)).as("n_clickers"),
      (sum(unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).cast("double")
        / count(lit(1)) / 1000000.0).as("avg_view_to_click_sec"))
    val purchasers = firstPurchase.agg(
      count(lit(1)).as("n_purchasers"),
      (sum(unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).cast("double")
        / count(lit(1)) / 1000000.0).as("avg_click_to_purchase_sec"))
    viewers.crossJoin(clickers).crossJoin(purchasers)
  }

  /** Weekly cohort retention: users grouped by their FIRST event's
    * ISO week, counted per week offset they were active in again.
    * Output `(cohort_week, week_offset, n_users)`.
    *
    * Scale shape: one user-keyed min-aggregate (cohort assignment),
    * one distinct over (user, week) — both map-side combinable — and
    * an equi-join on user_id; activity weeks are truncated BEFORE the
    * distinct so the join carries one row per user-week, not per
    * event. Week arithmetic is exact: both sides are week-truncated
    * dates, so the day difference is always a multiple of 7.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val cohorts = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val activity = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("act_week"))
      .distinct()
    activity.join(cohorts, Seq("user_id"))
      .withColumn("week_offset", expr("CAST(datediff(act_week, cohort_week) DIV 7 AS INT)"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users")) // (user, act_week) distinct => count = distinct users
  }
}
