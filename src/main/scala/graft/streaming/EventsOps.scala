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

  /** Streaming exact dedup — the at-least-once-delivery guard an event
    * ingest runs before anything downstream: drop every record whose
    * `keyCols` were already seen, keeping state only within the
    * watermark horizon. `dropDuplicatesWithinWatermark` is exactly this
    * operator in Spark: state per key is one timestamp, and keys whose
    * event time passes below the watermark are evicted, so state is
    * bounded by (arrival rate × lateness), never by stream length —
    * the property that makes exact dedup feasible on an unbounded
    * stream. Batch twin: `dropDuplicates(keyCols)` / Dedup.exactDedup.
    */
  def streamingExactDedup(events: DataFrame, keyCols: Seq[String],
                          lateness: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Streaming twin of
    * [[graft.operators.EventAnalytics.cumulativeDistinctDaily]]'s
    * per-day NEW-user counts: `dropDuplicatesWithinWatermark` on
    * (segments, user) keeps each user's first arrival (on an in-order
    * stream, their true first event), and a daily tumbling-window count
    * over the survivors emits (window day, segments, new_users) as the
    * watermark closes each day. Two chained stateful operators — dedup
    * state is one entry per user inside the watermark horizon, window
    * state one row per (day, segment): both bounded, both finalized.
    * The cumulative series is the consumer-side running sum of the
    * emitted days (a monotone fold the sink can do, exactly like the
    * batch twin's day-bounded window).
    *
    * ATTRIBUTION CAVEAT (load-bearing, not fine print): "first" here is
    * first ARRIVAL, not minimum event time. A user whose day-2 event
    * arrives before their day-1 event — possible within the very
    * lateness window this operator tolerates — is counted on day 2,
    * where the batch twin (min(day) per user) counts them on day 1;
    * and a user recurring after the watermark horizon is re-counted as
    * new (state for them was evicted). Twin equality therefore holds
    * for in-order streams and horizon-bounded histories only — the
    * contract every stateful twin in this file shares. For exact
    * event-time attribution under disorder, run the batch operator
    * over the landed data instead.
    */
  def streamingNewUsers(events: DataFrame, lateness: String = "1 day",
                        userCol: String = "user_id",
                        segmentCols: Seq[String] = Nil): DataFrame = {
    val cols = segmentCols :+ userCol
    val deduped = events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)
    // group by the WINDOW STRUCT: projecting .start inside the groupBy
    // strips the event-time metadata the chained-stateful checker needs
    // (the upstream watermark itself propagates through the dedup)
    deduped
      .groupBy(window(col("ts"), "1 day") +: segmentCols.map(col): _*)
      .agg(count(lit(1)).as("new_users"))
      .select(col("window").getField("start").as("day") +:
        segmentCols.map(col) :+ col("new_users"): _*)
  }

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

  /** Time-series gap fill: per-user daily event counts with every missing
    * day in the user's own [min(day), max(day)] span emitted as a zero
    * row. The calendar is GENERATED per user with `sequence` over the
    * span (no driver-side date list, no cross join against a global
    * calendar): one aggregation to get per-user spans + counts, one
    * explode of the per-user span, one left join back — all keyed on
    * (user, day), linear in users x span at any scale.
    */
  def dailyGapFill(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val calendar = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    calendar.join(daily, Seq("user_id", "day"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
  }

  /** Click-to-purchase attribution via a time-interval join: each purchase
    * is paired with the same user's clicks in the preceding
    * `horizonMinutes`, aggregated to (n_prior_clicks, last_click_value).
    *
    * The SAME expression runs batch (parquet in, DuckDB-oracled) and as a
    * Structured Streaming stream-stream join: with `withWatermark` on both
    * inputs, the equality key plus the two-sided time-range predicate is
    * exactly the form Spark requires to bound stream-stream join state —
    * click state older than the horizon + lateness is evicted, so state
    * stays O(horizon x click rate) regardless of stream length.
    */
  def purchaseAttribution(purchases: DataFrame, clicks: DataFrame,
                          horizonMinutes: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
        "inner")
      .groupBy("event_id", "p_user", "p_ts", "p_value")
      .agg(count(lit(1)).as("n_prior_clicks"),
        max(struct(col("c_ts"), col("c_value"))).getField("c_value").as("last_click_value"))
      .withColumnRenamed("p_user", "user_id")
  }

  /** Left-outer attribution: like [[purchaseAttribution]] but purchases
    * with NO prior click in the horizon are emitted too, with zero
    * clicks and a null last_click_value. Same join shape with
    * `left_outer`; in streaming, Spark emits the unmatched purchase
    * once the watermark proves no matching click can still arrive —
    * the canonical watermarked outer stream-stream join.
    */
  def purchaseAttributionOuter(purchases: DataFrame, clicks: DataFrame,
                               horizonMinutes: Int = 30): DataFrame = {
    val p = purchases.select(col("event_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizonMinutes MINUTES"),
        "left_outer")
      .groupBy("event_id", "p_user", "p_ts", "p_value")
      .agg(count(col("c_ts")).as("n_prior_clicks"),
        max(struct(col("c_ts"), col("c_value"))).getField("c_value").as("last_click_value"))
      .withColumnRenamed("p_user", "user_id")
  }

  /** Watermarked streaming twin of the FULL [[purchaseAttribution]]
    * pipeline — the stream-stream interval join AND the per-purchase
    * aggregation, i.e. two chained stateful operators. Spark supports
    * this chaining in APPEND output mode only (3.4+): the join emits a
    * purchase's matches once its watermark passes, and the downstream
    * aggregation finalizes the group then. State held: click rows for
    * horizon+lateness (join) plus open purchase groups until finalized
    * (agg) — both watermark-bounded.
    */
  def streamingPurchaseAttribution(events: DataFrame, horizonMinutes: Int = 30,
                                   lateness: String = "10 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .withWatermark("ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .withWatermark("ts", lateness)
    purchaseAttribution(purchases, clicks, horizonMinutes)
  }

  /** Streaming exact dedup: keep the first arrival per key, dropping
    * duplicates that arrive within the watermark horizon —
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes, so state is bounded by (key rate x lateness)
    * instead of growing with the stream. The batch twin is
    * `dropDuplicates(keys)`.
    */
  def streamingDedup(events: DataFrame, keys: Seq[String],
                     lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

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

/** Closed session emitted by the stateful streaming sessionizer. */
final case class SessionOut(
    user_id: Long, session_id: Long,
    session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
    n_events: Long)

private[streaming] final case class SessionState(
    sessionId: Long, startMs: Long, lastMs: Long, count: Long)

/** Stateful gap sessionization on a stream via
  * `flatMapGroupsWithState`: per-user state tracks the open session; a
  * new event past the gap closes and emits the previous session; an
  * event-time timeout (watermark-driven) closes idle sessions. The batch
  * equivalent is [[EventsOps.sessionize]].
  */
object StreamingSessionize {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame, gapMinutes: Int = 30,
            lateness: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def flush(userId: Long, st: SessionState): SessionOut =
      SessionOut(userId, st.sessionId,
        new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.lastMs), st.count)

    events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) => {
          if (rows.isEmpty && state.hasTimedOut) {
            // watermark passed the idle horizon: close the open session
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.map(_._2.getTime).toSeq.sorted
            var st = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { t =>
              if (st.lastMs < 0) st = SessionState(st.sessionId + 1, t, t, 1L)
              else if (t - st.lastMs > gapMs) {
                closed += flush(userId, st)
                st = SessionState(st.sessionId + 1, t, t, 1L)
              } else st = st.copy(lastMs = t, count = st.count + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            closed.result().iterator
          }
        })
  }
}

/** Current latest-record snapshot row for one key (streaming log
  * compaction output).
  */
final case class LatestOut(
    user_id: Long, event_id: Long, event_type: String, value: Double,
    ts: java.sql.Timestamp)

/** Streaming twin of [[graft.operators.ChangeCapture.compactLatest]]:
  * maintain the latest record per key over an event stream with
  * `mapGroupsWithState` in Update mode — each micro-batch re-emits the
  * keys it touched with their current winner under the same
  * (ts, event_id) ordering as the batch operator. State per key is ONE
  * record (the reigning winner), so total state is bounded by key
  * cardinality and never grows with stream length; no watermark is
  * needed because compaction semantics WANT late data (a late-arriving
  * newer record must still win).
  */
object StreamingCompactLatest {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

  def apply(events: DataFrame): Dataset[LatestOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("value").cast("double"),
        col("ts").cast("timestamp"))
      .as[LatestOut]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[LatestOut], state: GroupState[LatestOut]) => {
          def newer(a: LatestOut, b: LatestOut): Boolean =
            a.ts.getTime > b.ts.getTime ||
              (a.ts.getTime == b.ts.getTime && a.event_id > b.event_id)
          var best = state.getOption.orNull
          rows.foreach { r => if (best == null || newer(r, best)) best = r }
          state.update(best)
          best
        })
  }
}

/** One observed transition (streaming twin of the batch Markov matrix). */
final case class TransitionOut(from_type: String, to_type: String)

private[streaming] final case class LastEvent(tsMs: Long, id: Long, typ: String)

/** Streaming twin of [[graft.operators.EventAnalytics.transitionMatrix]]:
  * emits one row per observed (from, to) consecutive pair in each user's
  * timeline; the consumer aggregates counts downstream. State is ONE
  * record per user (the last seen event) — bounded by key cardinality.
  * Within a micro-batch rows sort by (ts, id) before chaining, so the
  * pair stream equals the batch operator whenever batches arrive in
  * event-time order per key (out-of-order arrivals ACROSS batches would
  * chain through the stale last-event; bound that skew upstream with a
  * watermark if the source reorders).
  */
object StreamingTransitions {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame): Dataset[TransitionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts").cast("timestamp"))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[LastEvent]) => {
          val sorted = rows.toSeq.sortBy(r => (r._4.getTime, r._2))
          val out = Seq.newBuilder[TransitionOut]
          var last = state.getOption.orNull
          sorted.foreach { case (_, id, typ, ts) =>
            if (last != null) out += TransitionOut(last.typ, typ)
            last = LastEvent(ts.getTime, id, typ)
          }
          if (last != null) state.update(last)
          out.result().iterator
        })
  }
}

/** One observed contiguous trigram (streaming twin of the gram
  * extraction inside
  * [[graft.operators.EventAnalytics.frequentSequences]]).
  */
final case class TrigramOut(user_id: Long, t1: String, t2: String, t3: String)

private[streaming] final case class LastTwo(
    ts1: Long, id1: Long, typ1: String,
    ts2: Long, id2: Long, typ2: String)

/** Streaming twin of the contiguous-trigram extraction inside
  * [[graft.operators.EventAnalytics.frequentSequences]]: emits one row
  * per observed (t1, t2, t3) run in each user's timeline; the consumer
  * aggregates distinct-user support downstream (the Apriori mining
  * itself is a batch decision over the accumulated support table).
  * State is the last TWO events per user — bounded by key cardinality,
  * independent of stream length. Same ordering contract as
  * [[StreamingTransitions]]: rows sort by (ts, id) within a
  * micro-batch, so the gram stream equals the batch window extraction
  * whenever batches arrive in per-key event-time order.
  */
object StreamingTrigrams {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame): Dataset[TrigramOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type"), col("ts").cast("timestamp"))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[LastTwo]) => {
          val sorted = rows.toSeq.sortBy(r => (r._4.getTime, r._2))
          val out = Seq.newBuilder[TrigramOut]
          var last = state.getOption.orNull
          sorted.foreach { case (_, id, typ, ts) =>
            if (last != null && last.typ1 != null)
              out += TrigramOut(user, last.typ1, last.typ2, typ)
            last =
              if (last == null) LastTwo(0L, 0L, null, ts.getTime, id, typ)
              else LastTwo(last.ts2, last.id2, last.typ2, ts.getTime, id, typ)
          }
          if (last != null) state.update(last)
          out.result().iterator
        })
  }
}

/** One space-saving counter: count is an UPPER bound on the key's true
  * frequency; count − err is a lower bound (err is the evicted
  * counter's value the key inherited on admission).
  */
final case class HeavyHitterOut(key: Long, count: Long, err: Long)

private[streaming] final case class SpaceSavingState(
    counts: Map[Long, Long], errs: Map[Long, Long])

/** Streaming heavy hitters with bounded state: the space-saving
  * algorithm (Metwally et al., ICDT 2005) sharded over `nBuckets`
  * hash-partitioned summaries of `m` counters each. Total state is
  * nBuckets × m counters — independent of key cardinality and stream
  * length, the property the batch twin gets from `freqItems`. The
  * standard guarantee applies per bucket: any key whose true count in
  * the bucket exceeds (bucket stream length)/m is guaranteed present,
  * and true_count ∈ [count − err, count].
  *
  * Update mode: each micro-batch re-emits the summaries of touched
  * buckets; the latest emission per key is the current estimate.
  */
object StreamingHeavyHitters {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

  def apply(events: DataFrame, keyCol: String, m: Int = 64,
            nBuckets: Int = 16): Dataset[HeavyHitterOut] = {
    require(m > 0 && nBuckets > 0, "m and nBuckets must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).try_cast("long").as("k"),
        pmod(xxhash64(col(keyCol)), lit(nBuckets)).as("b"))
      // a non-castable key (string etc.) nulls out under try_cast
      // (plain cast THROWS under ANSI mode); dropping it here keeps
      // null keys from pooling into one spurious counter and from
      // NPE-ing the primitive tuple encoder below — callers with
      // non-numeric keys see an empty result, not a crash
      .filter(col("k").isNotNull && col("b").isNotNull)
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long)],
         state: GroupState[SpaceSavingState]) => {
          var st = state.getOption.getOrElse(
            SpaceSavingState(Map.empty, Map.empty))
          rows.foreach { case (k, _) =>
            if (st.counts.contains(k)) {
              st = st.copy(counts = st.counts.updated(k, st.counts(k) + 1))
            } else if (st.counts.size < m) {
              st = SpaceSavingState(st.counts.updated(k, 1L),
                st.errs.updated(k, 0L))
            } else {
              // evict the minimum counter; deterministic tie by key
              val (evictK, evictN) = st.counts.minBy { case (kk, nn) => (nn, kk) }
              st = SpaceSavingState(
                st.counts - evictK + (k -> (evictN + 1)),
                st.errs - evictK + (k -> evictN))
            }
          }
          state.update(st)
          st.counts.iterator.map { case (k, n) =>
            HeavyHitterOut(k, n, st.errs.getOrElse(k, 0L))
          }
        })
  }

  /** Global top-k over the per-bucket emissions: the missing "merge
    * view". Buckets partition the KEY SPACE (each key hashes to exactly
    * one bucket), so no cross-bucket counter combination is needed —
    * the global summary is the union of the buckets' latest summaries,
    * and the per-bucket guarantee carries over unchanged:
    * true_count ∈ [count − err, count].
    *
    * Update-mode streams re-emit a key's counter every micro-batch it
    * survives in; a surviving counter's count is monotone non-decreasing
    * (increments, or eviction + readmission at a HIGHER count), so the
    * latest emission per key is exactly its max — recovered with one
    * `max_by(struct(count, err), count)` hash aggregation, no window,
    * no batch-id bookkeeping. Keys evicted and never readmitted keep
    * their stale last emission; that emission was a valid bound when
    * made and remains an upper bound on the key's count at eviction
    * time, which is the same staleness the raw per-bucket view has.
    *
    * `emitted` is the collected stream output (e.g. a memory/Delta sink
    * of [[apply]]'s rows): columns (key, count, err). Output: the k
    * largest keys by estimated count, with bounds.
    */
  def globalTopK(emitted: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    emitted
      .groupBy("key")
      .agg(max(struct(col("count"), col("err"))).as("last"))
      .select(col("key"), col("last.count").as("count"),
        col("last.err").as("err"))
      .orderBy(col("count").desc, col("key").asc)
      .limit(k)
  }
}

/** One scored event from [[StreamingRollingAnomaly]]: z is null until
  * the trailing window is full and has positive variance.
  */
final case class AnomalyScore(key: Long, event_id: Long, value: Double,
                              z: Option[Double], is_anomaly: Boolean)

private[streaming] final case class RollState(ring: Vector[Double])

/** Streaming twin of [[graft.operators.EventAnalytics.rollingAnomaly]]:
  * per-key z-score of each value against the trailing `n` values.
  * State per key is exactly the `n`-value ring — bounded, independent
  * of stream length. Within a micro-batch rows are processed in
  * (ts, event_id) order (the batch operator's window order); across
  * batches arrival order stands in for event order, the usual
  * streaming contract for in-order sources. Same mean/variance/round-6
  * arithmetic as the batch twin, so in-order replays score
  * identically.
  */
object StreamingRollingAnomaly {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame, keyCol: String, valueCol: String,
            tsCol: String = "ts", idCol: String = "event_id",
            n: Int = 10, threshold: Double = 3.0): Dataset[AnomalyScore] = {
    require(n >= 2, "lookback window must be at least 2")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(keyCol).cast("long").as("k"),
        col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Double)],
         state: GroupState[RollState]) => {
          // per-key per-batch buffer only — sorted to the batch twin's
          // (ts, id) window order at FULL timestamp precision (getTime
          // alone is millis and would tie sub-milli event times), with
          // null ts first (Spark's ASC default)
          val sorted = rows.toArray.sortBy(r =>
            (r._3 != null,
              if (r._3 == null) 0L else r._3.getTime,
              if (r._3 == null) 0 else r._3.getNanos, r._2))
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty[Double])
          val out = sorted.map { case (_, id, _, v) =>
            val z: Option[Double] =
              if (ring.length == n) {
                val cnt = n.toDouble
                val s1 = ring.sum
                val s2 = ring.map(x => x * x).sum
                val mean = s1 / cnt
                val variance = (s2 - cnt * mean * mean) / (cnt - 1)
                if (variance > 0)
                  Some(BigDecimal((v - mean) / math.sqrt(variance))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                else None
              } else None
            ring = (ring :+ v).takeRight(n)
            AnomalyScore(key, id, v, z, z.exists(math.abs(_) > threshold))
          }
          state.update(RollState(ring))
          out.iterator
        })
  }
}

/** One smoothed event from [[StreamingEwma]]: ewma is null only when
  * every value in the trailing horizon (including the current row) is
  * null.
  */
final case class EwmaScore(key: Long, event_id: Long, value: Option[Double],
                           ewma: Option[Double])

/** Per-key trailing values (None = a row with a null value — it still
  * occupies a lag position, exactly like the batch operator's row-based
  * `lag`). At most horizon−1 entries.
  */
private[streaming] final case class EwmaState(ring: Vector[Option[Double]])

/** Streaming twin of [[graft.operators.EventAnalytics.ewmaSmooth]]:
  * the finite-horizon EWMA over each key's trailing `horizon` rows.
  * State per key is the (horizon−1)-slot ring — bounded, independent of
  * stream length. Within a micro-batch rows are processed in
  * (ts, event_id) order (the batch operator's window order); across
  * batches arrival order stands in for event order — the in-order
  * contract shared by every twin here. The weights, the strict
  * left-to-right fold and the 6-dp round replicate the batch operator
  * bit-for-bit, so in-order replays smooth identically.
  */
object StreamingEwma {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame, keyCol: String, valueCol: String,
            tsCol: String = "ts", idCol: String = "event_id",
            alpha: Double = 0.3, horizon: Int = 5): Dataset[EwmaScore] = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0, 1)")
    require(horizon >= 1, "horizon must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    val weights = (0 until horizon).map(j => math.pow(1.0 - alpha, j))
    events
      .select(col(keyCol).cast("long").as("k"),
        col(idCol).cast("long").as("id"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Long, java.sql.Timestamp, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Long, java.sql.Timestamp, Option[Double])],
         state: GroupState[EwmaState]) => {
          // full-precision (ts, id) order with null ts first — the batch
          // window's ASC NULLS FIRST semantics (getTime alone is millis)
          val sorted = rows.toArray.sortBy(r =>
            (r._3 != null,
              if (r._3 == null) 0L else r._3.getTime,
              if (r._3 == null) 0 else r._3.getNanos, r._2))
          var ring = state.getOption.map(_.ring).getOrElse(Vector.empty[Option[Double]])
          val out = sorted.map { case (_, id, _, v) =>
            // lag ladder: index 0 = current row, j = j rows back; fold in
            // ascending j exactly like the batch expression chain
            val lags = v +: ring.reverse
            var num = 0.0; var den = 0.0
            (0 until horizon).foreach { j =>
              val x = if (j < lags.length) lags(j) else None
              num += (if (x.isDefined) x.get * weights(j) else 0.0)
              den += (if (x.isDefined) weights(j) else 0.0)
            }
            val ewma =
              if (den > 0.0)
                Some(BigDecimal(num / den)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
              else None
            ring = (ring :+ v).takeRight(horizon - 1)
            EwmaScore(key, id, v, ewma)
          }
          state.update(EwmaState(ring))
          out.iterator
        })
  }
}

/** One finalized (user, day, count) row — zero-count rows mark gap days. */
final case class DayCount(user_id: Long, day: java.sql.Date, n_events: Long)

/** Per-user streaming state: open per-day counts plus the first/last day
  * seen, so gap days between events can be emitted as zeros.
  */
private[streaming] final case class GapFillState(
    counts: Map[Long, Long], firstDay: Long, lastDay: Long, emittedThrough: Long)

/** Streaming twin of [[EventsOps.dailyGapFill]]: per-user daily counts
  * with gap days emitted as zero rows, finalized as the WATERMARK
  * closes each day — `flatMapGroupsWithState` with an event-time
  * timeout at the next day boundary. State per user is the open days'
  * count map (bounded by lateness horizon in days) plus three longs;
  * closed days are dropped from state as they are emitted, so state
  * does NOT grow with stream length. The batch operator emits exactly
  * the same rows for the days the watermark has closed.
  */
object StreamingGapFill {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  private val DayMs = 86400000L

  def apply(events: DataFrame, lateness: String = "1 day"): Dataset[DayCount] = {
    val spark = events.sparkSession
    import spark.implicits._

    def emitClosed(userId: Long, st: GapFillState, closedThrough: Long):
        (Seq[DayCount], GapFillState) = {
      if (st.firstDay < 0) return (Seq.empty, st)
      val from = if (st.emittedThrough < 0) st.firstDay else st.emittedThrough + 1
      // only days the user's span has reached can be emitted (the batch
      // twin never emits past max(day))
      val to = math.min(closedThrough, st.lastDay)
      if (to < from) return (Seq.empty, st)
      val out = (from to to).map { d =>
        DayCount(userId, new java.sql.Date(d * DayMs), st.counts.getOrElse(d, 0L))
      }
      (out, st.copy(counts = st.counts.filter(_._1 > to), emittedThrough = to))
    }

    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[GapFillState]) => {
          val wmDay = state.getCurrentWatermarkMs() / DayMs
          // the watermark has CLOSED every day strictly before it
          val closedThrough = wmDay - 1
          var st = state.getOption.getOrElse(GapFillState(Map.empty, -1L, -1L, -1L))
          if (!rows.isEmpty) {
            rows.foreach { case (_, ts) =>
              val d = ts.getTime / DayMs
              st = st.copy(
                counts = st.counts.updated(d, st.counts.getOrElse(d, 0L) + 1L),
                firstDay = if (st.firstDay < 0) d else math.min(st.firstDay, d),
                lastDay = math.max(st.lastDay, d))
            }
          }
          val (out, next) = emitClosed(userId, st, closedThrough)
          if (next.emittedThrough >= next.lastDay && state.hasTimedOut) {
            state.remove()
          } else {
            state.update(next)
            // wake at the next day boundary after the last unemitted day;
            // Spark requires the timeout to sit strictly past the current
            // watermark, so clamp when the boundary has already been passed
            val wmMs = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max((next.lastDay + 1) * DayMs, wmMs + DayMs))
          }
          out.iterator
        })
  }
}

/** One streamed register update: the bucket's current max rank. */
final case class HllRegisterOut(bucket: Long, register: Int)

/** Streaming HyperLogLog distinct-count: state is ONE small int per
  * hash bucket — `2^p` total, independent of key cardinality and
  * stream length (the sketch property, kept under streaming state).
  * Row updates share [[graft.operators.Hll.bucketRho]], so the emitted
  * registers are bit-identical to the batch sketch of the same rows,
  * and [[graft.operators.Hll.estimateFromEmissions]] turns a sink of
  * emissions into the standard estimate (registers are monotone per
  * bucket, so latest emission = max = current).
  *
  * Update mode: each micro-batch re-emits only the buckets it touched.
  */
object StreamingHll {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame, keyCol: String, p: Int = 6): Dataset[HllRegisterOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(graft.operators.Hll.bucketRho(col(keyCol), p).as("br"))
      .select(col("br.bucket").as("bucket"), col("br.rho").as("rho"))
      .as[(Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (bucket: Long, rows: Iterator[(Long, Int)], state: GroupState[Int]) => {
          var reg = state.getOption.getOrElse(0)
          rows.foreach { case (_, rho) => if (rho > reg) reg = rho }
          state.update(reg)
          Iterator.single(HllRegisterOut(bucket, reg))
        })
  }
}

/** One streamed histogram update: the bin's current running count. */
final case class BinCountOut(bin: Long, n: Long)

/** Streaming PSI support: running equal-width histogram of a value
  * stream over a FIXED `[lo, hi]` grid — state is one counter per bin
  * (`nBins` longs total, independent of stream length). Each
  * micro-batch re-emits the bins it touched; counts are monotone per
  * bin, so the latest emission per bin is the current histogram, and
  * [[graft.operators.Distribution.psiFromCounts]] against a reference
  * histogram turns any sink snapshot into the drift score — the
  * standard "alert when production input shape leaves the training
  * distribution" monitor, with the grid fixed from the reference
  * sample exactly as batch monitoring does.
  */
object StreamingPsi {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(events: DataFrame, valueCol: String, lo: Double, hi: Double,
            nBins: Int = 10): Dataset[BinCountOut] = {
    require(nBins >= 2, "nBins must be at least 2")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(valueCol).cast("double").as("x")).filter(col("x").isNotNull)
      .select(graft.operators.Distribution.fixedBin(col("x"), lo, hi, nBins).as("bin"))
      .as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (bin: Long, rows: Iterator[Long], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single(BinCountOut(bin, n))
        })
  }
}

/** One streamed CUSUM point: the control statistics and flag after
  * folding the input point into the series' running state.
  */
final case class CusumOut(key: String, t: Long, z: Double,
                          sPlus: Double, sMinus: Double, flag: Boolean)

private[streaming] final case class CusumState(
    spMicro: Long, smMicro: Long, lastT: Long)

/** Streaming twin of [[graft.operators.Stats.cusum]]: the textbook
  * recursion S⁺ = max(0, S⁺ + z − slack), S⁻ = max(0, S⁻ − z − slack)
  * folded per series key with TWO LONGS of state per key — the shape
  * the batch prefix-sum formulation deliberately avoids needing, and
  * exactly what a monitor wants online. Inputs are PRE-standardized
  * points (key, t, z): in production the mean/σ come from a reference
  * window (yesterday's [[graft.operators.Stats]] moments), matching
  * how control charts are actually deployed — the chart never
  * re-estimates its own baseline from the stream it is judging.
  *
  * Exactness: z rounds at 6 dp on entry and the recursion runs in
  * micro-units (10⁻⁶) on longs — bit-identical to the batch decimal
  * arithmetic, no float accumulation. Points must arrive in t order
  * per key ACROSS batches (within a batch they are sorted); a stale
  * point (t ≤ last seen) is dropped, never folded retroactively —
  * the documented contract of an online control chart.
  */
object StreamingCusum {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  def apply(points: DataFrame, keyCol: String, tCol: String, zCol: String,
            slack: Double = 0.5, threshold: Double = 4.0): Dataset[CusumOut] = {
    val slackMicro = java.math.BigDecimal.valueOf(slack)
      .movePointRight(6).setScale(0).longValueExact()
    val hMicro = java.math.BigDecimal.valueOf(threshold)
      .movePointRight(6).setScale(0).longValueExact()
    val spark = points.sparkSession
    import spark.implicits._
    points
      .select(col(keyCol).cast("string").as("k"),
        col(tCol).cast("long").as("t"),
        round(col(zCol).cast("double"), 6).as("z"))
      .filter(col("k").isNotNull && col("t").isNotNull && col("z").isNotNull)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[CusumState]) => {
          var st = state.getOption.getOrElse(CusumState(0L, 0L, Long.MinValue))
          val out = Seq.newBuilder[CusumOut]
          rows.toSeq.sortBy(_._2).foreach { case (_, t, z) =>
            if (t > st.lastT) {
              val zMicro = java.math.BigDecimal.valueOf(z)
                .movePointRight(6).setScale(0, java.math.RoundingMode.HALF_UP)
                .longValueExact()
              val sp = math.max(0L, st.spMicro + zMicro - slackMicro)
              val sm = math.max(0L, st.smMicro - zMicro - slackMicro)
              st = CusumState(sp, sm, t)
              out += CusumOut(key, t, z, sp / 1e6, sm / 1e6,
                sp > hMicro || sm > hMicro)
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}

/** Per-user verdict emitted by [[StreamingBotScore]] after folding the
  * batch's events into the user's running cadence state — the same
  * columns the batch [[graft.operators.EventAnalytics.botScore]] row
  * carries.
  */
final case class BotOut(
    user_id: Long, n_events: Long, span_s: Long,
    events_per_minute: java.lang.Double, gap_cv: java.lang.Double,
    n_types: Long, bot_flag: Boolean)

private[streaming] final case class BotState(
    n: Long, firstSec: Long, lastSec: Long, lastId: Long,
    sumG: Long, g2Hi: Long, g2Lo: Long, types: Seq[String])

/** Streaming twin of [[graft.operators.EventAnalytics.botScore]]: the
  * live bot monitor — per-user cadence state folded online via
  * `flatMapGroupsWithState` (Update mode), one refreshed verdict row
  * per user per micro-batch. State per key is six longs plus the
  * distinct event-type set (bounded by the event-type vocabulary — an
  * enum in any real schema, never corpus-scaled).
  *
  * Exactness: gap moments accumulate as exact integers — Σg in one
  * long, Σg² in a base-10¹⁸ hi/lo pair (a single long overflows once a
  * user has ~1000 gaps of a year each) — and the CV readout reassembles
  * them through the SAME fixed-order double expression as the batch
  * fold, so on an in-order stream the latest verdict per user is
  * bit-identical to running the batch operator over the same rows
  * (spec-proven across micro-batch boundaries). Within a batch events
  * sort by (second, event_id); a stale event (second below the last
  * folded) is dropped, the [[StreamingCusum]] contract.
  */
object StreamingBotScore {
  import org.apache.spark.sql.{DataFrame, Dataset}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  private val Base = 1000000000000000000L // 10^18

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  def apply(events: DataFrame, minEvents: Int = 20,
            cvThreshold: Double = 0.5,
            userCol: String = "user_id", tsCol: String = "ts",
            idCol: String = "event_id",
            typeCol: String = "event_type"): Dataset[BotOut] = {
    require(minEvents >= 3, "minEvents must be >= 3 (variance needs 2 gaps)")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).cast("long").as("u"),
        col(tsCol).cast("long").as("sec"),
        col(idCol).cast("long").as("id"),
        col(typeCol).cast("string").as("ty"))
      .filter(col("u").isNotNull && col("sec").isNotNull)
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[BotState]) => {
          var st = state.getOption.getOrElse(
            BotState(0L, 0L, Long.MinValue, Long.MinValue, 0L, 0L, 0L, Nil))
          var tySet = st.types.toSet
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, sec, id, ty) =>
            if (st.n == 0L) {
              st = BotState(1L, sec, sec, id, 0L, 0L, 0L, Nil)
              // a null type must NOT count as a distinct type — the
              // batch botScore's count_distinct ignores nulls, and the
              // bit-parity contract holds on streams carrying them
              tySet = if (ty != null) Set(ty) else Set.empty
            } else if (sec > st.lastSec ||
              (sec == st.lastSec && id != st.lastId)) {
              val g = sec - st.lastSec
              // g² folds into the base-10^18 hi/lo accumulator
              val g2 = g * g
              var lo = st.g2Lo + g2
              var hi = st.g2Hi
              if (lo >= Base) { hi += lo / Base; lo %= Base }
              st = BotState(st.n + 1, st.firstSec, sec, id,
                st.sumG + g, hi, lo, Nil)
              if (ty != null) tySet += ty
            } // else: stale or duplicate event — dropped, never refolded
          }
          state.update(st.copy(types = tySet.toSeq.sorted))
          if (st.n == 0L) Iterator.empty
          else {
            val m = st.n - 1
            val mD = m.toDouble
            val span = st.lastSec - st.firstSec
            val epm: java.lang.Double =
              if (span > 0) Double.box(r6(st.n.toDouble * 60.0 / span))
              else null
            val cv: java.lang.Double =
              if (m >= 2 && st.sumG > 0) {
                // exact reassembly, then the batch fold's expression order
                val g2 = java.math.BigDecimal.valueOf(st.g2Hi)
                  .multiply(java.math.BigDecimal.valueOf(Base))
                  .add(java.math.BigDecimal.valueOf(st.g2Lo))
                val sg = java.math.BigDecimal.valueOf(st.sumG)
                val varNum = java.math.BigDecimal.valueOf(m).multiply(g2)
                  .subtract(sg.multiply(sg)).doubleValue
                val mean = st.sumG.toDouble / mD
                Double.box(r6(math.sqrt(varNum / (mD * (mD - 1.0))) / mean))
              } else null
            val bot = st.n >= minEvents && cv != null && cv < cvThreshold
            Iterator.single(BotOut(user, st.n, span, epm, cv,
              tySet.size.toLong, bot))
          }
        })
  }
}
