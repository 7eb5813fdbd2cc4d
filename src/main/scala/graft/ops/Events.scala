package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational operators the reference lacks but a large-scale
  * pipeline needs (SURVEY.md §2.6): sessionization, tumbling windows,
  * as-of joins. All are single-shuffle window/aggregate shapes that
  * partition by a key (user, type) — skew-safe at scale because key
  * cardinality grows with data.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. One shuffle
    * (partition by user), two windows over the same partitioning — the
    * sort is reused. Output: one row per session with count and span. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val marked = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"))
  }

  /** Tumbling hourly aggregate per event type. The batch shape of the
    * Structured Streaming `window(ts, "1 hour")` aggregation; hour is
    * emitted as a string to stay engine-portable. */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total_value"))

  /** Funnel conversion: per user, did `stepA` occur and then `stepB`
    * within `windowMinutes` after the FIRST `stepA`? One aggregate per
    * user (min A ts, min B-after-A ts), then a global rollup. Output:
    * one row per funnel stage with user counts — the standard
    * event-analytics conversion query, one shuffle on user_id. */
  def funnel(
      events: DataFrame,
      stepA: String,
      stepB: String,
      windowMinutes: Int): DataFrame = {
    val winUs = windowMinutes.toLong * 60 * 1000000
    val perUser = events
      .where(col("event_type").isin(stepA, stepB))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === stepA, unix_micros(col("ts")))).as("a_us"),
        min(when(col("event_type") === stepB, unix_micros(col("ts")))).as("b_any_us"))
    val staged = perUser
      .withColumn("did_a", col("a_us").isNotNull)
      .withColumn("converted",
        col("a_us").isNotNull && col("b_any_us").isNotNull &&
          col("b_any_us") > col("a_us") &&
          col("b_any_us") - col("a_us") <= winUs)
    staged.agg(
      sum(when(col("did_a"), 1).otherwise(0)).as("n_step_a"),
      sum(when(col("converted"), 1).otherwise(0)).as("n_converted"))
  }

  /** Retention cohorts: users grouped by their first-seen day (cohort),
    * counted by activity day offset — the cohort-retention matrix.
    * Two shuffles (per-user first-seen, then cohort aggregate), both on
    * keys that grow with data. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val firstDay = events
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    events
      .select(col("user_id"), to_date(col("ts")).as("activity_day"))
      .distinct()
      .join(firstDay, "user_id")
      .groupBy(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        datediff(col("activity_day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** As-of join: for each left event, the id of the latest right event of
    * the same user with ts_right ≤ ts_left. Implemented as the scalable
    * union + last(ignoreNulls) window pattern — one shuffle on user_id,
    * no range-join explosion, skew bounded by per-user density. Right
    * rows sort before left rows at equal ts, so an event as-of-joins to
    * itself when it is in both streams. */
  def asofJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(
      col("user_id"), col("ts"), col("event_id"),
      lit(null).cast("long").as("right_id"), lit(1).as("is_left"))
    val r = right.select(
      col("user_id"), col("ts"),
      lit(null).cast("long").as("event_id"),
      col("event_id").as("right_id"), lit(0).as("is_left"))
    val win = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("is_left"), coalesce(col("event_id"), col("right_id")))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("asof_id", last(col("right_id"), ignoreNulls = true).over(win))
      .where(col("is_left") === 1)
      .select(col("user_id"), col("event_id"), col("asof_id"))
  }
}
