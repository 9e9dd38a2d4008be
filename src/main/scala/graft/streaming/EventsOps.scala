package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, written once against a DataFrame so the same
  * transform serves batch (parquet) and Structured Streaming (readStream)
  * inputs — the Spark-idiomatic way to keep stream/batch parity.
  */
object EventsOps {

  /** Hourly tumbling-window counts and value sums per event type.
    * On a stream, pairs with a watermark (see [[streamingHourlyCounts]]).
    * Sums go through DECIMAL for cross-engine determinism.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Watermarked streaming variant: tolerates `lateness` of out-of-order
    * data, emits finalized windows. Same aggregation semantics as
    * [[hourlyCounts]].
    */
  def streamingHourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))

  /** Gap-based sessionization (batch): a new session starts when the gap
    * since the user's previous event exceeds `gapMinutes`. Emits one row
    * per session with bounds and counts. Single shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
  }
}
