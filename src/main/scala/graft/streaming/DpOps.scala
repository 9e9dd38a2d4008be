package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** Windowed ε-DP release — the continuous form of
  * [[graft.operators.Privacy.dpRelease]]: per tumbling event-time
  * window and group, release a Laplace-noised count and clipped sum,
  * never the true values. Written once against a DataFrame, so the
  * SAME transform runs batch (parquet in) and as a watermarked
  * Structured Streaming aggregation (the spec proves exact equality).
  *
  * Privacy accounting: tumbling windows partition the data, so each
  * window is a DISJOINT dataset and releases compose in PARALLEL —
  * a continuously published dashboard spends ε per window-slice of a
  * user's data, not ε per emission. The noise seed is
  * (salt, window start, group): deterministic, so micro-batch retries
  * and replays re-emit the SAME noise instead of averaging it away
  * (emitting fresh noise per retry would let a consumer denoise by
  * watching restarts — the replay-safety and the privacy argument are
  * the same property here).
  *
  * Contribution bound, same contract as the batch operator: at most
  * one row per privacy unit per (window, group) — pre-aggregate
  * upstream; under streaming, `dropDuplicatesWithinWatermark` on
  * (window, group, unit) is the usual way to enforce it.
  *
  * Shape: one watermarked windowed aggregation (bounded state: one row
  * per open (window, group)), then per-row scalar noise — the same
  * one-exchange shape as every windowed count here.
  */
object DpOps {

  def dpWindowedRelease(events: DataFrame, groupCol: String,
                        valueCol: Column, epsilon: Double, clip: Double,
                        salt: String = "dpw", windowLen: String = "1 hour",
                        lateness: String = "1 hour",
                        streaming: Boolean = true): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    require(clip > 0, "clip must be positive (the sum sensitivity)")
    require(salt.nonEmpty, "an empty salt makes the noise guessable")
    val clipped = least(greatest(coalesce(valueCol.cast("decimal(18,6)"),
      lit(0).cast("decimal(18,6)")), lit(0).cast("decimal(18,6)")),
      lit(clip).cast("decimal(18,6)"))
    val base = if (streaming) events.withWatermark("ts", lateness) else events
    // group by the WINDOW STRUCT (projecting .start inside the groupBy
    // would strip the event-time metadata the streaming checker needs)
    val agg = base
      .groupBy(window(col("ts"), windowLen),
        col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).as("_n"), sum(clipped).as("_s"))
      .select(col("window").getField("start").as("window_start"),
        col("grp"), col("_n"), col("_s"))
    def seed(stat: String): Column =
      concat(lit(s"$salt:"), col("window_start").cast("long").cast("string"),
        lit(":"), col("grp"), lit(s":$stat"))
    agg.select(col("window_start"), col("grp").as(groupCol),
      round(col("_n").cast("double") +
        Privacy.laplaceNoise(seed("c"), 2.0 / epsilon), 6).as("noisy_count"),
      round(col("_s").cast("double") +
        Privacy.laplaceNoise(seed("s"), 2.0 * clip / epsilon), 6)
        .as("noisy_sum"))
  }
}
