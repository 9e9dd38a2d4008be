package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream registry: sessions, funnels, attribution,
  * temporal joins, retention/LTV and time-series smoothing.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object EventsRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- event stream: hourly tumbling-window aggregation ----
    "q_events_window" -> ((s, dir) => {
      graft.streaming.EventsOps.hourlyCounts(Tables.events(s, dir))
        .withColumn("hour_start", col("hour_start").cast("timestamp_ntz"))
        .orderBy("hour_start", "event_type")
    }),


    // ---- as-of join (union-tag-window; Spark lacks the operator) ----
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      AsOfJoin.asOf(ev, clicks, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz"),
          col("value"), col("asof_ts").cast("timestamp_ntz").as("click_ts"),
          col("click_value"))
        .orderBy("event_id")
    }),


    // ---- event stream: gap-based sessionization via window functions ----
    "q_events_sessions" -> ((s, dir) => {
      graft.streaming.EventsOps.sessionize(Tables.events(s, dir), 30)
        .select(col("user_id"), col("session_id").cast("long"),
          col("session_start").cast("timestamp_ntz"),
          col("session_end").cast("timestamp_ntz"), col("n_events"))
        .orderBy("user_id", "session_id")
    }),


    // ---- rolling EXACT median over a 7-row trailing frame (per-key
    //      robust smoother; exact `percentile` window aggregate, linear
    //      interpolation identical to DuckDB's quantile_cont) ----
    "q_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("med7", round(expr("percentile(value, 0.5)").over(w), 6))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("med7"))
        .orderBy("event_id")
    }),


    // ---- hopping (sliding) windows via the built-in window(ts, dur,
    //      slide): each event lands in dur/slide = 4 overlapping hops —
    //      the streaming-capable sliding aggregate; the oracle replays
    //      the hop expansion with an explicit range(4) unnest ----
    "q_hopping_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").cast("timestamp_ntz").as("win_start"),
          col("w.end").cast("timestamp_ntz").as("win_end"),
          col("event_type"), col("n_events"))
        .orderBy("win_start", "event_type")),


    // ---- the SAME sessions via Spark's built-in session_window (the
    //      Catalyst-native merging-session aggregate; also the streaming
    //      form's engine-managed state path). Boundary semantics differ
    //      from the run-scan form: session_window's window is half-open,
    //      so it splits at gap >= 30 min where sessionize splits at
    //      gap > 30 min. This query's oracle therefore replays the >=
    //      truth (>= 1800000000 epoch_us) rather than sharing
    //      q_events_sessions' strict-> oracle — a future testdata drop
    //      landing a pair at exactly 1800.000000 s stays green on both
    //      gates instead of breaking this one ----
    "q_session_window_builtin" -> ((s, dir) => {
      val sess = Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
      sess
        .withColumn("session_id",
          row_number().over(Window.partitionBy("user_id")
            .orderBy("session_start")).cast("long"))
        .select(col("user_id"), col("session_id"),
          col("session_start").cast("timestamp_ntz"),
          col("session_end").cast("timestamp_ntz"), col("n_events"))
        .orderBy("user_id", "session_id")
    }),


    // ---- range join via bin blocking: point-in-interval as an equi-join
    //      (vs DuckDB's native IEJoin nested-range oracle) ----
    "q_range_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val iv = t(s, dir, "supplier").select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("lo"), (col("s_acctbal") + 50).as("hi"))
      RangeJoin.pointInRange(pts, "c_acctbal", iv, "lo", "hi", 100.0)
        .select("c_custkey", "s_suppkey", "c_acctbal")
        .orderBy("c_custkey", "s_suppkey")
    }),


    // ---- interval-overlap join via bin blocking + stateless bin dedup ----
    "q_interval_overlap" -> ((s, dir) => {
      val l = t(s, dir, "supplier").select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("s_lo"), (col("s_acctbal") + 50).as("s_hi"))
      val r = t(s, dir, "customer").select(col("c_custkey"),
        (col("c_acctbal") - 25).as("c_lo"), (col("c_acctbal") + 25).as("c_hi"))
      RangeJoin.intervalOverlap(l, "s_lo", "s_hi", r, "c_lo", "c_hi", 100.0)
        .select("s_suppkey", "c_custkey").orderBy("s_suppkey", "c_custkey")
    }),


    // ---- click-to-purchase attribution: time-interval join + per-purchase
    //      aggregation (the batch side of the stream-stream join twin) ----
    "q_purchase_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.EventsOps.purchaseAttribution(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), 180)
        .select(col("event_id"), col("user_id"),
          col("p_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("p_value").as("purchase_value"),
          col("n_prior_clicks"), col("last_click_value"))
        .orderBy("event_id")
    }),


    // ---- time-series gap fill: per-user daily event counts with missing
    //      days filled by a generated calendar join ----
    "q_gap_fill" -> ((s, dir) =>
      graft.streaming.EventsOps.dailyGapFill(Tables.events(s, dir))
        .orderBy("user_id", "day")),


    // ---- daily resample with LINEAR interpolation (gap-fill's sibling
    //      for "unobserved", not "zero") — one agg + one Window ----
    "q_interpolate_daily" -> ((s, dir) =>
      EventAnalytics.interpolateDaily(Tables.events(s, dir))
        .orderBy("user_id", "day")),


    // ---- left-outer attribution: zero-click purchases emitted too ----
    "q_attribution_outer" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.EventsOps.purchaseAttributionOuter(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), 180)
        .select(col("event_id"), col("user_id"),
          col("p_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("p_value").as("purchase_value"),
          col("n_prior_clicks"), col("last_click_value"))
        .orderBy("event_id")
    }),


    // ---- CDC: keyed snapshot diff with per-column change attribution ----
    "q_row_changes" -> ((s, dir) => {
      val base = t(s, dir, "orders")
      val oldS = base.filter("o_orderkey % 10 != 3")
      val newS = base.filter("o_orderkey % 10 != 7")
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      ChangeCapture.rowChanges(oldS, newS, "o_orderkey")
        .filter(col("change_type") =!= "unchanged")
        .orderBy("o_orderkey")
    }),


    // ---- MERGE INTO (lakehouse upsert): matched updates, a guarded
    //      matched delete, and unconditional unmatched inserts — note
    //      the inserted 'F' rows: the delete clause only guards MATCHED
    //      rows, so they survive, which the oracle replays ----
    "q_merge_upsert" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val updates = ord.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderpriority", lit("9-MERGED"))
      val inserts = ord.filter(col("o_orderkey") % 10 === 4)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      ChangeCapture.mergeInto(ord, updates.unionByName(inserts), "o_orderkey",
          deleteWhen = Some(col("o_orderstatus") === "F"))
        .orderBy("o_orderkey")
    }),


    // ---- sequential funnel: ordered step conversion over events ----
    "q_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("step_idx")),


    // ---- weekly cohort retention matrix ----
    "q_retention" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),


    // ---- SCD type-2 history: validity intervals per key version ----
    "q_scd_history" -> ((s, dir) =>
      ChangeCapture.scdHistory(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", "event_id")
        .select("user_id", "event_id", "valid_from", "valid_to", "version",
          "is_current")
        .orderBy("user_id", "version")),


    // ---- log compaction: latest record per key, deterministic tie ----
    "q_compact_latest" -> ((s, dir) =>
      ChangeCapture.compactLatest(Tables.events(s, dir), "user_id", "ts", "event_id")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")),


    // ---- market-basket pair co-occurrence over order lines ----
    "q_basket_pairs" -> ((s, dir) =>
      EventAnalytics.coOccurrence(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2)
        .orderBy("item1", "item2")),


    // ---- Apriori frequent triples: candidates only from frequent
    //      pairs (two broadcast semi-joins), never the item cube ----
    "q_frequent_triples" -> ((s, dir) =>
      EventAnalytics.frequentTriples(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", 2)
        .orderBy("item1", "item2", "item3")),


    // ---- cohort LTV curve: decimal-exact cumulative revenue ----
    "q_cohort_ltv" -> ((s, dir) =>
      EventAnalytics.cohortLtv(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),


    // ---- RFM quintile segmentation over purchase events ----
    "q_rfm" -> ((s, dir) =>
      EventAnalytics.rfmSegments(Tables.events(s, dir))
        .orderBy("user_id")),


    // ---- top user paths: most common first-5 event-type prefixes ----
    "q_user_paths" -> ((s, dir) =>
      EventAnalytics.topPaths(Tables.events(s, dir), pathLen = 5, k = 20)),


    // ---- first-order Markov transitions over each user's timeline ----
    "q_event_transitions" -> ((s, dir) =>
      EventAnalytics.transitionMatrix(Tables.events(s, dir))
        .orderBy("from_type", "to_type")),


    // ---- rolling z-score anomalies: trailing-10 window per user ----
    "q_rolling_anomaly" -> ((s, dir) =>
      EventAnalytics.rollingAnomaly(Tables.events(s, dir), "user_id", "value",
          n = 10, threshold = 2.5)
        .filter(col("is_anomaly"))
        .orderBy("user_id", "event_id")),


    // ---- per-domain token-budget cap: within each source keep the
    //      longest docs until 4000 chars — the distributed prefix sum
    //      generalized to composite keys (NO per-domain single-task
    //      window; see Sampling.domainBudgetSelect) ----
    "q_domain_budget" -> ((s, dir) =>
      Sampling.domainBudgetSelect(
          t(s, dir, "documents").select("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", "n_chars", 4000L)
        .select("source", "doc_id", "n_chars", "cum_tokens")
        .orderBy("source", "cum_tokens")),


    // ---- distinct-users-so-far per day via the first-appearance trick:
    //      one user-keyed aggregate + a day-bounded running sum, never
    //      O(days) distinct scans ----
    "q_cum_users" -> ((s, dir) =>
      EventAnalytics.cumulativeDistinctDaily(Tables.events(s, dir),
          segmentCols = Seq("event_type"))
        .orderBy("event_type", "day")),


    // ---- dwell-time profile: session-capped gap to the user's next
    //      event, per event type; integer-micros arithmetic so mean and
    //      interpolated p50 replay exactly ----
    "q_dwell_time" -> ((s, dir) =>
      EventAnalytics.dwellTimes(Tables.events(s, dir), 30)
        .orderBy("event_type")),


    // ---- incremental aggregate maintenance: a pre-1997 snapshot merged
    //      with the 1997+ delta must equal the from-scratch rollup
    //      (decimal sums make the equality exact, not approximate);
    //      delta-sized work at 100 TB, never a historical rescan ----
    "q_incremental_agg" -> ((s, dir) => {
      import IncrementalAgg.Spec
      val specs = Seq(Spec("count", "", "n_orders"),
        Spec("sum", "o_totalprice", "sum_price"),
        Spec("min", "o_orderdate", "first_order"),
        Spec("max", "o_orderdate", "last_order"))
      val o = t(s, dir, "orders")
      val cutoff = lit("1997-01-01").cast("timestamp")
      val snap = IncrementalAgg.aggregate(
        o.filter(col("o_orderdate") < cutoff), Seq("o_custkey"), specs)
      IncrementalAgg.merge(snap, o.filter(col("o_orderdate") >= cutoff),
          Seq("o_custkey"), specs)
        .select(col("o_custkey"), col("n_orders"),
          col("sum_price").cast("double").as("sum_price"),
          col("first_order"), col("last_order"))
        .orderBy("o_custkey")
    }),


    // ---- finite-horizon EWMA per user (one window pass, lag ladder;
    //      weights embedded as shared shortest-roundtrip literals) ----
    "q_ewma" -> ((s, dir) =>
      EventAnalytics.ewmaSmooth(Tables.events(s, dir), "user_id", "ts",
          "event_id", "value", alpha = 0.3, horizon = 5)
        .orderBy("event_id")),


    // ---- behavioral bot screen with one planted metronome user
    //      (30 events exactly 60 s apart -> gap CV 0, flagged) ----
    "q_bot_score" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type")
      val metronome = s.range(30).select(
        (lit(900000L) + col("id")).as("event_id"),
        (lit(1577836800L) + col("id") * 60).cast("timestamp").as("ts"),
        lit(99999L).as("user_id"),
        lit("click").as("event_type"))
      EventAnalytics.botScore(base.unionByName(metronome))
        .orderBy("user_id")
    }),


    // ---- seasonal/trend strength of the daily series (Hyndman Fs/Ft
    //      over the decomposition components) ----
    "q_seasonal_strength" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.seasonalStrength(daily, "t", "v", 7)
    }),


    // ---- Holt linear smoothing of daily purchase revenue: level +
    //      trend state over the bounded daily table (9 dp recursion,
    //      replayed bit-for-bit by a recursive-CTE oracle) ----
    "q_holt" -> ((s, dir) =>
      Stats.holtSmooth(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull && col("ts").isNotNull)
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("rev")),
        "t", "rev", 0.3, 0.1)),


    // ---- single-changepoint locator on daily purchase revenue:
    //      CUSUM-statistic argmax over the bounded daily table ----
    "q_changepoint" -> ((s, dir) =>
      Stats.changepoint(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull && col("ts").isNotNull)
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("rev")),
        "t", "rev")),


    // ---- seasonal (type x dow x hour) baseline anomaly flags: exact
    //      limb-sum slot moments, bounded slot table broadcast back ----
    "q_seasonal_baseline" -> ((s, dir) =>
      EventAnalytics.seasonalBaseline(Tables.events(s, dir), "event_type",
          "ts", "event_id", "value")
        .orderBy("event_id"))
  )

  def oracles: Map[String, String] = dmap(

    "q_events_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |  clicks AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS click_value
        |    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, e.value,
        |  c.ts AS click_ts, c.click_value
        |FROM ev e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,


    "q_range_join" ->
      """SELECT c_custkey, s_suppkey, c_acctbal
        |FROM customer JOIN supplier
        |  ON c_acctbal BETWEEN s_acctbal - 50 AND s_acctbal + 50
        |ORDER BY c_custkey, s_suppkey""".stripMargin,


    "q_interval_overlap" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier JOIN customer
        |  ON s_acctbal - 50 <= c_acctbal + 25 AND c_acctbal - 25 <= s_acctbal + 50
        |ORDER BY s_suppkey, c_custkey""".stripMargin,


    "q_purchase_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    event_type FROM events),
        |  p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
        |  c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
        |  count(*) AS n_prior_clicks,
        |  (max(ROW(c.ts, c.value)))[2] AS last_click_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 180 MINUTE
        |GROUP BY p.event_id, p.user_id, p.ts, p.value
        |ORDER BY p.event_id""".stripMargin,


    "q_attribution_outer" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    event_type FROM events),
        |  p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
        |  c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
        |  count(c.ts) AS n_prior_clicks,
        |  (max(ROW(c.ts, c.value)))[2] AS last_click_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 180 MINUTE
        |GROUP BY p.event_id, p.user_id, p.ts, p.value
        |ORDER BY p.event_id""".stripMargin,


    "q_gap_fill" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |  daily AS (SELECT user_id, day, count(*) AS n_events
        |    FROM ev GROUP BY 1, 2),
        |  span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |    FROM daily GROUP BY 1),
        |  cal AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |    FROM span)
        |SELECT user_id, day, coalesce(n_events, 0) AS n_events
        |FROM cal LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,


    // linear interpolation: same frame expressions as the Spark Window
    // (forward last-ignore-nulls / backward first-ignore-nulls), same
    // float op order prev + (next-prev) * (offset/gap), both rounded 6dp
    "q_interpolate_daily" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value FROM events),
        |  daily AS (SELECT user_id, day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS obs
        |    FROM ev GROUP BY 1, 2),
        |  span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |    FROM daily GROUP BY 1),
        |  cal AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |    FROM span),
        |  g AS (SELECT user_id, day, obs,
        |    last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        |    first_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        |  FROM cal LEFT JOIN daily USING (user_id, day))
        |SELECT user_id, day,
        |  CASE WHEN obs IS NOT NULL THEN round(obs, 6)
        |    ELSE round(prev_v + (next_v - prev_v) *
        |      (CAST(date_diff('day', prev_d, day) AS DOUBLE) /
        |       CAST(date_diff('day', prev_d, next_d) AS DOUBLE)), 6) END AS value,
        |  obs IS NULL AS interpolated
        |FROM g ORDER BY user_id, day""".stripMargin,


    "q_events_sessions" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |  l AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev),
        |  f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |         ELSE 0 END AS ns FROM l),
        |  s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,


    "q_rolling_median" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
        |FROM events ORDER BY event_id""".stripMargin,


    "q_hopping_counts" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |  h AS (SELECT ts, event_type, unnest(range(4)) AS k FROM ev),
        |  w AS (SELECT ts, event_type,
        |      date_trunc('minute', ts)
        |        - INTERVAL (EXTRACT(minute FROM ts)::INT % 15) MINUTE
        |        - INTERVAL (k * 15) MINUTE AS win_start
        |    FROM h),
        |  f AS (SELECT * FROM w
        |    WHERE ts >= win_start AND ts < win_start + INTERVAL 60 MINUTE)
        |SELECT win_start, win_start + INTERVAL 60 MINUTE AS win_end,
        |  event_type, count(*) AS n_events
        |FROM f GROUP BY 1, 2, 3
        |ORDER BY win_start, event_type""".stripMargin,


    // session_window's OWN half-open truth: splits at gap >= 30 min
    // (epoch_us gap >= 1800000000), unlike q_events_sessions' strict >
    "q_session_window_builtin" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |  l AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev),
        |  f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
        |         ELSE 0 END AS ns FROM l),
        |  s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,


    "q_merge_upsert" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, '9-MERGED' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 4),
        |keep AS (SELECT t.* FROM orders t
        |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = t.o_orderkey)),
        |upd AS (SELECT s.* FROM src s
        |  WHERE EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey)
        |    AND NOT (s.o_orderstatus = 'F')),
        |ins AS (SELECT s.* FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey))
        |SELECT * FROM keep UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey""".stripMargin,


    "q_row_changes" ->
      """WITH old_s AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 3),
        |  new_s AS (SELECT o_orderkey, o_custkey,
        |      CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |      CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |      o_orderdate, o_orderpriority
        |    FROM orders WHERE o_orderkey % 10 <> 7),
        |  j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |      (o.o_orderkey IS NULL) AS added, (n.o_orderkey IS NULL) AS removed,
        |      list_sort(list_filter([
        |        CASE WHEN o.o_custkey       IS DISTINCT FROM n.o_custkey       THEN 'o_custkey' END,
        |        CASE WHEN o.o_orderstatus   IS DISTINCT FROM n.o_orderstatus   THEN 'o_orderstatus' END,
        |        CASE WHEN o.o_totalprice    IS DISTINCT FROM n.o_totalprice    THEN 'o_totalprice' END,
        |        CASE WHEN o.o_orderdate     IS DISTINCT FROM n.o_orderdate     THEN 'o_orderdate' END,
        |        CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END
        |      ], x -> x IS NOT NULL)) AS diffs
        |    FROM old_s o FULL JOIN new_s n ON o.o_orderkey = n.o_orderkey),
        |  c AS (SELECT o_orderkey,
        |      CASE WHEN added THEN 'added' WHEN removed THEN 'removed'
        |           WHEN len(diffs) > 0 THEN 'changed' ELSE 'unchanged' END AS change_type,
        |      CASE WHEN NOT added AND NOT removed AND len(diffs) > 0
        |           THEN array_to_string(diffs, ',') ELSE '' END AS changed_cols,
        |      CASE WHEN NOT added AND NOT removed THEN CAST(len(diffs) AS BIGINT)
        |           ELSE 0 END AS n_changed
        |    FROM j)
        |SELECT * FROM c WHERE change_type <> 'unchanged' ORDER BY o_orderkey""".stripMargin,


    "q_funnel" ->
      """WITH s0 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
        |    WHERE event_type = 'view' GROUP BY 1),
        |  s1 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
        |    JOIN s0 ON e.user_id = s0.user_id AND CAST(e.ts AS TIMESTAMP) >= s0.t
        |    WHERE e.event_type = 'click' GROUP BY 1),
        |  s2 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
        |    JOIN s1 ON e.user_id = s1.user_id AND CAST(e.ts AS TIMESTAMP) >= s1.t
        |    WHERE e.event_type = 'purchase' GROUP BY 1),
        |  c AS (SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step, count(*) AS users FROM s0
        |    UNION ALL SELECT 1, 'click', count(*) FROM s1
        |    UNION ALL SELECT 2, 'purchase', count(*) FROM s2)
        |SELECT step_idx, step, users,
        |  CAST(users AS DOUBLE) / (SELECT users FROM c WHERE step_idx = 0) AS pct_of_first
        |FROM c ORDER BY step_idx""".stripMargin,


    "q_retention" ->
      """WITH d AS (SELECT DISTINCT user_id AS u,
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |  f AS (SELECT u, min(day) AS cohort_day FROM d GROUP BY 1),
        |  a AS (SELECT DISTINCT d.u, f.cohort_day,
        |      date_diff('day', f.cohort_day, d.day) // 7 AS week_offset
        |    FROM d JOIN f ON d.u = f.u)
        |SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // SCD2: same (ts, event_id)-ordered lead/rank in one window
    "q_scd_history" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id, t AS valid_from,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS BIGINT) AS version
        |  FROM p)
        |SELECT user_id, event_id, valid_from, valid_to, version,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,


    // log compaction: same (ts DESC, event_id DESC) per-key rank
    "q_compact_latest" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, event_id, event_type, value FROM r
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,


    // basket pairs: same distinct (basket, item) set, same pair join
    "q_basket_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
        |p AS (SELECT x.i AS item1, y.i AS item2, count(*) AS n_baskets
        |  FROM bi x JOIN bi y USING (bk) WHERE x.i < y.i GROUP BY 1, 2)
        |SELECT * FROM p WHERE n_baskets >= 2 ORDER BY item1, item2""".stripMargin,


    // frequent-triples truth: the plain 3-way count — Apriori pruning
    // is an optimization, not a semantics change
    "q_frequent_triples" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
        |  FROM lineitem)
        |SELECT a.i AS item1, b.i AS item2, c.i AS item3,
        |  count(*) AS n_baskets
        |FROM bi a JOIN bi b ON a.bk = b.bk AND a.i < b.i
        |  JOIN bi c ON a.bk = c.bk AND b.i < c.i
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY item1, item2, item3""".stripMargin,


    // cohort LTV: decimal-exact weekly and cumulative revenue, same
    // whole-week offsets as q_retention
    "q_cohort_ltv" ->
      """WITH d AS (SELECT user_id AS u,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
        |      AS DECIMAL(18,2)) AS rev
        |  FROM events),
        |f AS (SELECT u, min(day) AS cohort_day FROM d GROUP BY u),
        |sz AS (SELECT cohort_day, count(*) AS n_users FROM f GROUP BY cohort_day),
        |w AS (SELECT f.cohort_day,
        |    date_diff('day', f.cohort_day, d.day) // 7 AS week_offset, d.rev
        |  FROM d JOIN f ON d.u = f.u),
        |wk AS (SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
        |    sum(rev) AS rev FROM w GROUP BY 1, 2),
        |c AS (SELECT cohort_day, week_offset, rev,
        |    SUM(rev) OVER (PARTITION BY cohort_day ORDER BY week_offset) AS cum_rev
        |  FROM wk)
        |SELECT c.cohort_day, c.week_offset,
        |  CAST(c.rev AS DOUBLE) AS week_rev,
        |  CAST(c.cum_rev AS DOUBLE) AS cum_rev, sz.n_users,
        |  CAST(c.cum_rev AS DOUBLE) / sz.n_users AS ltv_per_user
        |FROM c JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, week_offset""".stripMargin,


    // RFM: same decimal-exact monetary, same interpolated quintile
    // thresholds, same strict-> comparisons
    "q_rfm" ->
      """WITH p AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    value FROM events WHERE event_type = 'purchase'),
        |now_d AS (SELECT max(d) AS nowd FROM p),
        |b AS (SELECT user_id,
        |    date_diff('day', max(d), (SELECT nowd FROM now_d)) AS recency_days,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM p GROUP BY user_id),
        |t AS (SELECT
        |    quantile_cont(recency_days, 0.2) AS r2, quantile_cont(recency_days, 0.4) AS r4,
        |    quantile_cont(recency_days, 0.6) AS r6, quantile_cont(recency_days, 0.8) AS r8,
        |    quantile_cont(frequency, 0.2) AS f2, quantile_cont(frequency, 0.4) AS f4,
        |    quantile_cont(frequency, 0.6) AS f6, quantile_cont(frequency, 0.8) AS f8,
        |    quantile_cont(monetary, 0.2) AS m2, quantile_cont(monetary, 0.4) AS m4,
        |    quantile_cont(monetary, 0.6) AS m6, quantile_cont(monetary, 0.8) AS m8
        |  FROM b),
        |s AS (SELECT user_id, recency_days, frequency, monetary,
        |    6 - (1 + (recency_days > r2)::INT + (recency_days > r4)::INT
        |           + (recency_days > r6)::INT + (recency_days > r8)::INT) AS r_score,
        |    1 + (frequency > f2)::INT + (frequency > f4)::INT
        |      + (frequency > f6)::INT + (frequency > f8)::INT AS f_score,
        |    1 + (monetary > m2)::INT + (monetary > m4)::INT
        |      + (monetary > m6)::INT + (monetary > m8)::INT AS m_score
        |  FROM b, t)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency,
        |  monetary, r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM s ORDER BY user_id""".stripMargin,


    // user paths: same (ts, event_id)-ordered prefix, same top-20
    "q_user_paths" ->
      """WITH p AS (SELECT user_id,
        |    array_to_string(list(event_type
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id)[1:5], '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,


    // Markov transitions: same (ts, event_id)-ordered lead, same
    // bounded (from, to) aggregation, probability rounded at 6 dp
    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |        CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,


    // rolling anomaly replay: identical trailing frame, exact-arithmetic
    // variance from the same double sums, z rounded at 6 dp both sides
    "q_rolling_anomaly" ->
      """WITH w AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |    count(value) OVER win AS cnt,
        |    sum(value) OVER win AS s1,
        |    sum(value * value) OVER win AS s2
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT user_id, event_id, v,
        |    CASE WHEN cnt = 10
        |           AND (s2 - cnt * (s1 / cnt) * (s1 / cnt)) / (cnt - 1) > 0
        |      THEN round((v - s1 / cnt) /
        |             sqrt((s2 - cnt * (s1 / cnt) * (s1 / cnt)) / (cnt - 1)), 6)
        |    END AS z
        |  FROM w)
        |SELECT user_id, event_id, v AS value, z, TRUE AS is_anomaly
        |FROM z WHERE z IS NOT NULL AND abs(z) > 2.5
        |ORDER BY user_id, event_id""".stripMargin,


    // per-domain budget truth: a plain partitioned window cumsum — the
    // oracle may single-task a domain; the engine must not
    "q_domain_budget" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |SELECT source, doc_id, n_chars, cum_tokens FROM r
        |WHERE cum_tokens <= 4000 ORDER BY source, cum_tokens""".stripMargin,


    // cumulative distinct truth: same first-appearance formulation
    // (count(DISTINCT) OVER a growing frame is not generally available
    // and would be the wrong plan anyway)
    "q_cum_users" ->
      """WITH f AS (SELECT event_type, user_id,
        |    min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
        |  FROM events GROUP BY event_type, user_id),
        |d AS (SELECT event_type, day, count(*) AS new_users FROM f
        |  GROUP BY event_type, day)
        |SELECT event_type, day, new_users,
        |  CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin,


    // dwell truth: identical lead-gap window in integer epoch-micros;
    // mean and interpolated median rounded with the same op order
    "q_dwell_time" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT event_type,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id))
        |      - epoch_us(ts) AS gap_us FROM ev),
        |f AS (SELECT * FROM g WHERE gap_us IS NOT NULL AND gap_us <= 1800000000)
        |SELECT event_type, count(*) AS n_dwells,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_dwell_sec,
        |  round(quantile_cont(gap_us, 0.5) / 1000000.0, 6) AS p50_dwell_sec
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,


    // incremental-merge truth: the from-scratch rollup — the merge of
    // snapshot + delta must reproduce it exactly (decimal sums)
    "q_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,


    // EWMA truth: the same lag ladder with the SAME weight literals
    // (interpolated from identical Scala doubles), strictly left-assoc
    // numerator/denominator chains, rounded 6dp
    "q_ewma" -> {
      val ew = (0 until 5).map(j => math.pow(1.0 - 0.3, j))
      val lagsSql = (0 until 5).map {
        case 0 => "v AS x0"
        case j => s"lag(v, $j) OVER w AS x$j"
      }.mkString(", ")
      val num = (0 until 5)
        .map(j => s"CASE WHEN x$j IS NOT NULL THEN x$j * ${ew(j)} ELSE 0.0 END")
        .mkString(" + ")
      val den = (0 until 5)
        .map(j => s"CASE WHEN x$j IS NOT NULL THEN ${ew(j)} ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH ev AS (SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT event_id, user_id, v, $lagsSql FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)),
        |f AS (SELECT user_id, event_id, v AS value,
        |    $num AS num, $den AS den FROM l)
        |SELECT user_id, event_id, value,
        |  CASE WHEN den > 0.0 THEN round(num / den, 6) END AS ewma
        |FROM f ORDER BY event_id""".stripMargin
    },


    // Holt truth: a recursive CTE replays the 9 dp-per-step recursion
    // exactly; the smoothing constants enter as CAST(x AS DOUBLE) so
    // both engines perform the identical IEEE (1.0 - alpha) subtraction
    "q_holt" ->
      """WITH RECURSIVE d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT CAST(t AS BIGINT) AS t, v,
        |    row_number() OVER (ORDER BY t) AS k FROM d),
        |rec AS (
        |  SELECT s1.k AS k, s1.t AS t, s1.v AS v,
        |      round(s1.v, 9) AS level,
        |      round(s2.v - s1.v, 9) AS trend,
        |      CAST(NULL AS DOUBLE) AS fitted,
        |      CAST(NULL AS DOUBLE) AS residual
        |    FROM s s1, s s2 WHERE s1.k = 1 AND s2.k = 2
        |  UNION ALL
        |  SELECT nx.k, nx.t, nx.v,
        |      round(CAST(0.3 AS DOUBLE) * nx.v +
        |        (1.0 - CAST(0.3 AS DOUBLE)) * (rec.level + rec.trend), 9),
        |      round(CAST(0.1 AS DOUBLE) *
        |        (round(CAST(0.3 AS DOUBLE) * nx.v +
        |          (1.0 - CAST(0.3 AS DOUBLE)) * (rec.level + rec.trend), 9)
        |         - rec.level) +
        |        (1.0 - CAST(0.1 AS DOUBLE)) * rec.trend, 9),
        |      round(rec.level + rec.trend, 9),
        |      round(nx.v - round(rec.level + rec.trend, 9), 6)
        |    FROM rec JOIN s nx ON nx.k = rec.k + 1)
        |SELECT t, v AS value, level, trend, fitted, residual
        |FROM rec ORDER BY t""".stripMargin,


    // changepoint truth: exact decimal prefix sums over the bounded
    // daily table, rounded statistic, ORDER BY stat DESC, k ASC picks
    // the same row the operator does
    "q_changepoint" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    sum(CAST(value AS DECIMAL(18,2))) AS rev
        |  FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT CAST(t AS BIGINT) AS t,
        |    CAST(rev AS DECIMAL(18,6)) AS v FROM d),
        |w AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT)
        |      AS k,
        |    sum(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS sk,
        |    CAST(count(*) OVER () AS BIGINT) AS n, sum(v) OVER () AS sn
        |  FROM s),
        |c AS (SELECT *, round(abs(CAST(sk AS DOUBLE) -
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sn AS DOUBLE)),
        |    6) AS stat FROM w WHERE k < n)
        |SELECT n, k, t AS t_split, stat,
        |  round(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE), 6) AS mean_before,
        |  round((CAST(sn AS DOUBLE) - CAST(sk AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 6) AS mean_after
        |FROM c ORDER BY stat DESC, k LIMIT 1""".stripMargin,


    // bot-score truth: same planted metronome, lag gaps in truncated
    // epoch seconds, sample variance from exact HUGEINT moments
    "q_bot_score" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
        |    event_type
        |  FROM events
        |  UNION ALL
        |  SELECT 99999 AS user_id, 900000 + g.i AS event_id,
        |    1577836800 + g.i * 60 AS sec, 'click' AS event_type
        |  FROM generate_series(0, 29) g(i)),
        |gp AS (SELECT user_id, sec, event_type,
        |    sec - lag(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS gap
        |  FROM ev),
        |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(sec) - min(sec) AS span_s,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    sum(CAST(gap AS HUGEINT) * gap) AS sg2,
        |    CAST(count(*) - 1 AS BIGINT) AS m,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |  FROM gp GROUP BY 1),
        |f AS (SELECT user_id, n_events, span_s,
        |    CASE WHEN span_s > 0 THEN round(CAST(n_events AS DOUBLE)
        |      * CAST(60.0 AS DOUBLE) / span_s, 6) END AS events_per_minute,
        |    CASE WHEN m >= 2 AND sg > 0 THEN
        |      round(sqrt(CAST(m * sg2 - CAST(sg AS HUGEINT) * sg AS DOUBLE)
        |        / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE)
        |          - CAST(1.0 AS DOUBLE))))
        |        / (CAST(sg AS DOUBLE) / CAST(m AS DOUBLE)), 6) END AS gap_cv,
        |    n_types
        |  FROM u)
        |SELECT user_id, n_events, span_s, events_per_minute, gap_cv,
        |  n_types, n_events >= 20
        |    AND COALESCE(gap_cv < CAST(0.5 AS DOUBLE), false) AS bot_flag
        |FROM f ORDER BY user_id""".stripMargin,


    // seasonal-strength truth: the decompose oracle's component chain
    // rolled up with exact decimal moments and Hyndman's Fs/Ft
    "q_seasonal_strength" ->
      """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |u AS (SELECT t, v,
        |    CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS uu FROM daily),
        |w AS (SELECT t, v,
        |    SUM(uu) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS wsum,
        |    COUNT(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS wcnt
        |  FROM u),
        |tr AS (SELECT t, v, t % 7 AS slot,
        |    CASE WHEN wcnt = 7
        |      THEN round(CAST(wsum AS DOUBLE) / 700.0, 6) END AS trend
        |  FROM w),
        |det AS (SELECT *, CAST(round(v - trend, 6) AS DECIMAL(18,6)) AS dt
        |  FROM tr),
        |sl AS (SELECT slot, round(CAST(SUM(dt) AS DOUBLE) / COUNT(*), 6)
        |    AS smean
        |  FROM det WHERE trend IS NOT NULL GROUP BY 1),
        |c AS (SELECT round(CAST(SUM(CAST(smean AS DECIMAL(18,6)))
        |    AS DOUBLE) / COUNT(*), 6) AS cc FROM sl),
        |comp AS (SELECT round(smean - cc, 6) AS seasonal, trend,
        |    CASE WHEN trend IS NOT NULL
        |      THEN round(v - trend - round(smean - cc, 6), 6) END AS resid
        |  FROM det LEFT JOIN sl USING (slot) CROSS JOIN c),
        |k AS (SELECT CAST(resid AS DECIMAL(18,6)) AS r,
        |    CAST(seasonal + resid AS DECIMAL(18,6)) AS sr,
        |    CAST(trend + resid AS DECIMAL(18,6)) AS tr2
        |  FROM comp WHERE resid IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(r) AS s_r, SUM(CAST(r * r AS DECIMAL(38,12))) AS q_r,
        |    SUM(sr) AS s_s, SUM(CAST(sr * sr AS DECIMAL(38,12))) AS q_s,
        |    SUM(tr2) AS s_t, SUM(CAST(tr2 * tr2 AS DECIMAL(38,12))) AS q_t
        |  FROM k),
        |f AS (SELECT n,
        |    CAST(n * q_r - CAST(s_r * s_r AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vr,
        |    CAST(n * q_s - CAST(s_s * s_s AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vs,
        |    CAST(n * q_t - CAST(s_t * s_t AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vt
        |  FROM a)
        |SELECT n, round(vr, 6) AS var_resid,
        |  CASE WHEN n >= 2 AND vs > 0 THEN round(greatest(
        |    CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE) - vr / vs), 6)
        |  END AS f_seasonal,
        |  CASE WHEN n >= 2 AND vt > 0 THEN round(greatest(
        |    CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE) - vr / vt), 6)
        |  END AS f_trend
        |FROM f""".stripMargin,


    // seasonal-baseline truth: exact decimal slot moments, the
    // robustOutliers round-before-z policy, identical slot keying
    "q_seasonal_baseline" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS INT) AS dow,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour, value
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |g AS (SELECT event_type, dow, hour, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS p
        |  FROM ev GROUP BY 1, 2, 3),
        |st AS (SELECT event_type, dow, hour,
        |    round(s / n, 6) AS slot_mean,
        |    CASE WHEN n > 1 THEN round(sqrt(greatest(
        |      (n * p - s * s) / CAST(n * (n - 1) AS DOUBLE), 0.0)), 6) END AS slot_std
        |  FROM g)
        |SELECT e.event_id, e.event_type, e.dow, e.hour,
        |  CAST(e.value AS DOUBLE) AS value, st.slot_mean, st.slot_std,
        |  CASE WHEN st.slot_std > 0.0
        |    THEN round((CAST(e.value AS DOUBLE) - st.slot_mean) / st.slot_std, 6)
        |  END AS z,
        |  COALESCE(CASE WHEN st.slot_std > 0.0
        |    THEN abs(round((CAST(e.value AS DOUBLE) - st.slot_mean) / st.slot_std, 6)) > 3.0
        |  END, false) AS is_anomaly
        |FROM ev e JOIN st USING (event_type, dow, hour)
        |ORDER BY event_id""".stripMargin
  )
}
