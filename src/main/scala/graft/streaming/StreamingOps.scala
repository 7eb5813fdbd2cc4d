package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the bounded-time exports (SURVEY.md
  * §2.5 streaming note): the reference's hourly export loop
  * (emiproc/exports/hourly.py:167-169, 168-hour chunks) is a micro-batch
  * pattern — here it becomes a real streaming query.
  *
  * These transforms take a STREAMING DataFrame (from readStream) and
  * return a streaming DataFrame; they also work unchanged on batch inputs
  * (minus the watermark no-op) — same plan, Spark picks the incremental
  * execution. Profiles are static broadcast tables joined to the stream:
  * stream-static joins need no state store, only the windowed aggregate
  * keeps state, bounded by the watermark.
  */
object StreamingOps {

  /** Tumbling 1-hour event-time windows per event type, 2-hour watermark
    * for late data — the incremental form of Events.hourlyWindows /
    * export_hourly_emissions (reference emiproc/exports/hourly.py:22-224). */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(
        col("window.start").as("hour"),
        col("event_type"), col("n"), col("total_value"))

  /** Stream-static join: scale each event by the static hourly profile
    * factor of its event type (missing profile → 1.0) — the streaming form
    * of the temporal explode's factor application (T3). The profile table
    * is a broadcast; the stream stays narrow (no state). */
  def applyHourlyFactors(events: DataFrame, factors: DataFrame): DataFrame =
    events
      .withColumn("hour_of_day", hour(col("ts")))
      .join(broadcast(factors), Seq("event_type", "hour_of_day"), "left")
      .select(
        col("event_id"), col("ts"), col("event_type"),
        (col("value") * coalesce(col("sf"), lit(1.0))).as("scaled_value"))
}
