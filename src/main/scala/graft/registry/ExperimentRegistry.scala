package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation registry: SRM, A/B readouts,
  * variance reduction, sequential tests and causal estimators.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object ExperimentRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- re-randomization test of the click-vs-purchase value gap:
    //      50 content-addressed relabels, add-one p-value ----
    "q_perm_test" -> ((s, dir) =>
      Stats.permutationTest(Tables.events(s, dir), "event_id",
        "event_type", "value", "click", "purchase")),


    // ---- sharp RDD at the quantity-25 cutoff, bandwidth 10: local
    //      linear on each side, effect at the cutoff ----
    "q_rdd" -> ((s, dir) =>
      Experiment.regressionDiscontinuity(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", cutoff = 25, bandwidth = 10)),


    // ---- IV/Wald LATE: parity-assigned encouragement Z, self-selected
    //      conversion D, purchase value Y ----
    "q_iv_wald" -> ((s, dir) =>
      Experiment.ivWald(perUserExperiment(s, dir),
        col("arm") === "A", col("converted") === 1L, "y")),


    // ---- sample-ratio-mismatch check on a 25/25/50 designed split
    //      of distinct users (χ² GOF on the bounded arm table) ----
    "q_srm" -> ((s, dir) =>
      Experiment.srmCheck(
        Tables.events(s, dir).select(col("user_id")).distinct()
          .withColumn("arm",
            when(col("user_id") % 4 === 0, "arm0")
              .when(col("user_id") % 4 === 1, "arm1")
              .otherwise("arm2")),
        "arm", Map("arm0" -> 0.25, "arm1" -> 0.25, "arm2" -> 0.5))),


    // ---- switchback readout: arm alternates per 6-hour block (the
    //      marketplace design when user-level randomization leaks
    //      through shared inventory); blocks are the independent
    //      draws, so the analysis IS the cluster-robust z with
    //      cluster = block ----
    "q_switchback" -> ((s, dir) =>
      Experiment.clusterRobustZ(
        Tables.events(s, dir).filter(col("ts").isNotNull)
          .withColumn("block",
            floor(unix_micros(col("ts")) / lit(21600000000L)))
          .withColumn("arm",
            when(col("block") % 2 === 0, "A").otherwise("B")),
        "arm", "block", col("event_type") === "purchase", "A", "B")),


    // ---- cluster-robust z on EVENT-level conversion with user
    //      clusters: events within a user share an assignment, so the
    //      naive per-event variance is too small ----
    "q_cluster_z" -> ((s, dir) =>
      Experiment.clusterRobustZ(
        Tables.events(s, dir)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "arm", "user_id", col("event_type") === "purchase", "A", "B")),


    // ---- per-segment SRM: day-of-week segments, 50/50 design —
    //      a skew confined to one segment dilutes out of the global
    //      chi2 but flags here ----
    "q_srm_by_segment" -> ((s, dir) =>
      Experiment.srmBySegment(
        Tables.events(s, dir).filter(col("ts").isNotNull)
          .withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "dow", "arm", Map("A" -> 0.5, "B" -> 0.5))),


    // ---- A/A calibration: 50 seeded re-randomizations of the same
    //      population; the z test's false-positive rate should sit
    //      near 5% if the variance model is honest ----
    "q_aa_calibration" -> ((s, dir) =>
      Experiment.aaCalibration(perUserExperiment(s, dir),
        "user_id", col("purchases") >= 14L, 50)),


    // ---- relative lift with a delta-method CI on the RATE RATIO:
    //      the percentage a launch review reads, with the control
    //      rate's own noise priced in ----
    "q_relative_lift" -> ((s, dir) =>
      Experiment.relativeLiftCI(perUserExperiment(s, dir),
        "arm", col("purchases") >= 14L, "A", "B")),


    // ---- two-proportion z test: are heavy buyers (>= 14 purchases,
    //      ~median) more common in arm A? per-user fold, exact counts;
    //      the >=1-purchase outcome saturates at 1.0 here and would
    //      only ever exercise the degenerate-SE NULL path ----
    "q_ab_proportions" -> ((s, dir) =>
      Experiment.twoProportionZ(
        perUserExperiment(s, dir), "arm", col("purchases") >= 14L,
        "A", "B")),


    // ---- CUPED adjusted treatment effect: purchase value per user
    //      adjusted by the engagement covariate (clicks + views);
    //      exact decimal moment fold, one corpus scan ----
    "q_cuped" -> ((s, dir) =>
      Experiment.cuped(perUserExperiment(s, dir),
        "arm", "y", "x", "A", "B")),


    // ---- delta-method CI for the ratio-of-sums metric (purchase
    //      value per engagement event): per-user pairs, one exact
    //      moment fold, Taylor-expanded variance ----
    "q_ratio_ci" -> ((s, dir) =>
      Experiment.ratioMetricCI(perUserExperiment(s, dir), "y", "x")),


    // ---- leave-one-bucket-out jackknife CI for the same ratio:
    //      20 deterministic user buckets, replicate fold on the
    //      bounded bucket table ----
    "q_jackknife_ci" -> ((s, dir) =>
      Experiment.jackknifeRatioCI(
        perUserExperiment(s, dir).withColumn("bucket", col("user_id") % 20),
        "bucket", "y", "x")),


    // ---- McNemar paired test on the SAME users: "converted" vs
    //      "heavy clicker" — the discordant cells carry the signal ----
    "q_mcnemar" -> ((s, dir) => {
      val pu = Tables.events(s, dir).groupBy("user_id").agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
      Experiment.mcNemar(pu, col("conv") === 1L, col("clicks") >= 10L)
    }),


    // ---- per-segment minimum detectable effect: is each market
    //      segment big enough to read a conversion lift at 80%
    //      power before burning traffic on it? ----
    "q_mde" -> ((s, dir) => {
      val ords = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      Experiment.mdeTable(
        t(s, dir, "customer").join(ords, Seq("c_custkey"), "left"),
        "c_mktsegment", col("n_orders") >= 1L)
    }),


    // ---- diff-in-diff on purchase value: arm from the bucketing
    //      hash, period split at mid-month, cell means differenced ----
    "q_did" -> ((s, dir) =>
      Experiment.diffInDiff(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "arm",
        datediff(to_date(col("ts")), lit("1970-01-01")) >= 19738,
        "value", "A", "B")),


    // ---- always-valid sequential monitor: per-day mSPRT trajectory
    //      of the purchase-conversion delta, safe to peek daily ----
    "q_always_valid" -> ((s, dir) =>
      Experiment.alwaysValidMonitor(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B"))
          .withColumn("day",
            datediff(to_date(col("ts")), lit("1970-01-01"))),
        "day", "arm", col("event_type") === "purchase", "A", "B")),


    // ---- winsorized treatment effect: pooled p95 cap on the
    //      per-user purchase value, capped-row count surfaced ----
    "q_winsorized_effect" -> ((s, dir) =>
      Experiment.winsorizedEffect(perUserExperiment(s, dir),
        "arm", "y", 0.95, "A", "B")),


    // ---- uplift by engagement-score quintile + Qini walk: does
    //      high engagement rank the users the "treatment" moves? ----
    "q_uplift" -> ((s, dir) =>
      Experiment.upliftByQuantile(perUserExperiment(s, dir),
        "arm", "x", col("converted") === 1L, 5, "A", "B")),


    // ---- quantile treatment effects: per-arm exact p50/p90/p99 of
    //      the per-user purchase value, one 2x3-percentile fold ----
    "q_qte" -> ((s, dir) =>
      Experiment.quantileTreatmentEffect(perUserExperiment(s, dir),
        "arm", "y", Seq(0.5, 0.9, 0.99), "A", "B")),


    // ---- post-stratified treatment effect by signup-week stratum:
    //      composition-bias-free delta over the bounded strata table ----
    "q_post_strat" -> ((s, dir) => {
      val pu = Tables.events(s, dir).groupBy("user_id")
        .agg(
          min(datediff(to_date(col("ts")), lit("1970-01-01")))
            .as("first_day"),
          coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))),
            lit(0).cast("decimal(18,2)")).as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
        .withColumn("stratum",
          floor((col("first_day") - 19723) / 7).cast("long"))
      Experiment.postStratifiedEffect(pu, "arm", "stratum", "y", "A", "B")
    }),


    // ---- Poisson-bootstrap CI on the ARM-MEAN DIFFERENCE of per-user
    //      purchase value: same seeded integer draws, replicate deltas ----
    "q_bootstrap_delta" -> ((s, dir) =>
      Stats.bootstrapDeltaCI(perUserExperiment(s, dir),
        "user_id", "arm", "y", "A", "B"))
  )

  def oracles: Map[String, String] = dmap(

    // SRM truth: designed shares as exact binary doubles (.25/.5),
    // per-arm (O−E)²/E rounded at 6 dp, exact decimal χ² fold
    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |    WHERE user_id IS NOT NULL),
        |a AS (SELECT CASE WHEN user_id % 4 = 0 THEN 'arm0'
        |    WHEN user_id % 4 = 1 THEN 'arm1' ELSE 'arm2' END AS arm FROM u),
        |c AS (SELECT arm, count(*) AS n FROM a GROUP BY 1),
        |e AS (SELECT * FROM (VALUES ('arm0', 0.25), ('arm1', 0.25),
        |    ('arm2', 0.5)) AS t(arm, share)),
        |j AS (SELECT e.arm, COALESCE(c.n, 0) AS n,
        |    CAST(e.share AS DOUBLE) AS share FROM e LEFT JOIN c USING (arm)),
        |w AS (SELECT arm, n, share,
        |    CAST(sum(n) OVER () AS DOUBLE) AS total,
        |    CAST(count(*) OVER () AS INT) AS arms FROM j),
        |x AS (SELECT arm, CAST(n AS BIGINT) AS n,
        |    round(total * share, 6) AS expected_n,
        |    round((CAST(n AS DOUBLE) - total * share) *
        |      (CAST(n AS DOUBLE) - total * share) / (total * share), 6)
        |      AS contrib,
        |    arms FROM w)
        |SELECT arm, n, expected_n, contrib,
        |  CAST(sum(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE)
        |    AS chi2,
        |  arms - 1 AS dof
        |FROM x ORDER BY arm""".stripMargin,


    // switchback truth: same 6-hour block derivation (double division
    // of exact micros, floor), then the identical CR0 fold with
    // cluster = block
    "q_switchback" ->
      """WITH ev AS (SELECT
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 21600000000)
        |      AS BIGINT) AS block,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE ts IS NOT NULL),
        |ev2 AS (SELECT CASE WHEN block % 2 = 0 THEN 'A' ELSE 'B' END
        |    AS arm, CAST(block AS VARCHAR) AS c, y FROM ev),
        |pc AS (SELECT arm, c, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sm FROM ev2 GROUP BY 1, 2),
        |t AS (SELECT arm, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sm) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS tc
        |  FROM pc GROUP BY 1),
        |j AS (SELECT pc.arm,
        |    CAST(round((CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)) *
        |      (CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)), 9) AS DECIMAL(38,12)) AS r2,
        |    t.tn, t.ts, t.tc
        |  FROM pc JOIN t USING (arm)),
        |g AS (SELECT arm, max(tn) AS n, max(ts) AS sm, max(tc) AS cl,
        |    sum(r2) AS ss FROM j GROUP BY arm),
        |p AS (SELECT
        |    MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    MAX(CASE WHEN arm = 'A' THEN sm END) AS s_a,
        |    MAX(CASE WHEN arm = 'A' THEN cl END) AS clusters_a,
        |    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    MAX(CASE WHEN arm = 'B' THEN sm END) AS s_b,
        |    MAX(CASE WHEN arm = 'B' THEN cl END) AS clusters_b,
        |    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss_b FROM g),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |    sqrt(
        |      (CAST(clusters_a AS DOUBLE) /
        |        (CAST(clusters_a AS DOUBLE) - 1.0)) *
        |        CAST(ss_a AS DOUBLE) /
        |        (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) +
        |      (CAST(clusters_b AS DOUBLE) /
        |        (CAST(clusters_b AS DOUBLE) - 1.0)) *
        |        CAST(ss_b AS DOUBLE) /
        |        (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))) AS se
        |  FROM p)
        |SELECT n_a, s_a, clusters_a, n_b, s_b, clusters_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM d""".stripMargin,


    // cluster-z truth: same (cluster, arm) fold, 9 dp residual-squared
    // quantization, CR0 cluster variance in the operator's fixed order
    "q_cluster_z" ->
      """WITH ev AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(user_id AS VARCHAR) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |pc AS (SELECT arm, c, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sm FROM ev GROUP BY 1, 2),
        |t AS (SELECT arm, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sm) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS tc
        |  FROM pc GROUP BY 1),
        |j AS (SELECT pc.arm,
        |    CAST(round((CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)) *
        |      (CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)), 9) AS DECIMAL(38,12)) AS r2,
        |    t.tn, t.ts, t.tc
        |  FROM pc JOIN t USING (arm)),
        |g AS (SELECT arm, max(tn) AS n, max(ts) AS sm, max(tc) AS cl,
        |    sum(r2) AS ss FROM j GROUP BY arm),
        |p AS (SELECT
        |    MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    MAX(CASE WHEN arm = 'A' THEN sm END) AS s_a,
        |    MAX(CASE WHEN arm = 'A' THEN cl END) AS clusters_a,
        |    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    MAX(CASE WHEN arm = 'B' THEN sm END) AS s_b,
        |    MAX(CASE WHEN arm = 'B' THEN cl END) AS clusters_b,
        |    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss_b FROM g),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |    sqrt(
        |      (CAST(clusters_a AS DOUBLE) /
        |        (CAST(clusters_a AS DOUBLE) - 1.0)) *
        |        CAST(ss_a AS DOUBLE) /
        |        (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) +
        |      (CAST(clusters_b AS DOUBLE) /
        |        (CAST(clusters_b AS DOUBLE) - 1.0)) *
        |        CAST(ss_b AS DOUBLE) /
        |        (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))) AS se
        |  FROM p)
        |SELECT n_a, s_a, clusters_a, n_b, s_b, clusters_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM d""".stripMargin,


    // segment-SRM truth: same per-(dow, arm) counts, per-segment chi2
    // with 6 dp contribution rounding and the df=1 critical value
    "q_srm_by_segment" ->
      """WITH ev AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR)
        |      AS segment,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT segment,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a0,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a1,
        |    CAST(sum(CASE WHEN arm NOT IN ('A', 'B') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unknown
        |  FROM ev GROUP BY 1),
        |c AS (SELECT segment, a0 + a1 AS n, n_unknown,
        |    CASE WHEN a0 + a1 > 0 THEN CAST(
        |      CAST(round((CAST(a0 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        * (CAST(a0 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        / (CAST(a0 + a1 AS DOUBLE) * 0.5), 6) AS DECIMAL(18,6)) +
        |      CAST(round((CAST(a1 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        * (CAST(a1 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        / (CAST(a0 + a1 AS DOUBLE) * 0.5), 6) AS DECIMAL(18,6))
        |      AS DOUBLE) END AS chi2
        |  FROM g)
        |SELECT segment, n, n_unknown, chi2, 1 AS dof,
        |  chi2 > 3.841459 AS srm_flag
        |FROM c ORDER BY segment""".stripMargin,


    // A/A truth: identical md5(unit#k) parity splits, the same pooled-SE
    // z per pseudo-experiment, calibration summary over the k rows
    "q_aa_calibration" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS y
        |  FROM events GROUP BY user_id),
        |e AS (SELECT id, y, k FROM pu CROSS JOIN range(1, 51) AS t(k)),
        |a AS (SELECT k,
        |    CAST(('0x' || substr(md5(id || '#' || CAST(k AS VARCHAR)),
        |      1, 15)) AS UBIGINT) % 2 AS arm, y FROM e),
        |g AS (SELECT k,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM a GROUP BY k),
        |z AS (SELECT *,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |      THEN abs((pa - pb) / se) > 1.96 END AS sig
        |  FROM (SELECT *,
        |      CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |      CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |      sqrt((CAST(s_a + s_b AS DOUBLE) /
        |          nullif(CAST(n_a + n_b AS DOUBLE), 0.0)) *
        |        (1.0 - CAST(s_a + s_b AS DOUBLE) /
        |          nullif(CAST(n_a + n_b AS DOUBLE), 0.0)) *
        |        (1.0 / nullif(CAST(n_a AS DOUBLE), 0.0) +
        |         1.0 / nullif(CAST(n_b AS DOUBLE), 0.0))) AS se
        |    FROM g))
        |SELECT CAST(count(*) AS BIGINT) AS n_experiments,
        |  CAST(sum(CASE WHEN sig THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_significant,
        |  CAST(sum(CASE WHEN sig IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_degenerate,
        |  round(CAST(sum(CASE WHEN sig THEN 1 ELSE 0 END) AS DOUBLE) /
        |    nullif(CAST(count(*) - sum(CASE WHEN sig IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE), 0.0), 6) AS false_positive_rate
        |FROM z""".stripMargin,


    // relative-lift truth: same heavy-buyer fold, the ratio delta-method
    // variance in the operator's fixed double order
    "q_relative_lift" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1
        |      ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1
        |      ELSE 0 END) AS BIGINT) AS s_b
        |  FROM pu),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb
        |  FROM t),
        |v AS (SELECT *,
        |    pa / pb - 1.0 AS lift,
        |    sqrt(pa * (1.0 - pa) / CAST(n_a AS DOUBLE) / (pb * pb) +
        |      pa * pa * (pb * (1.0 - pb) / CAST(n_b AS DOUBLE)) /
        |      (pb * pb * pb * pb)) AS se
        |  FROM d)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN s_b > 0 THEN round(lift, 6) END AS lift,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND s_b > 0 AND se > 0
        |    THEN round(lift - 1.959964 * se, 6) END AS ci_low,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND s_b > 0 AND se > 0
        |    THEN round(lift + 1.959964 * se, 6) END AS ci_high
        |FROM v""".stripMargin,


    // z-test truth: exact per-user heavy-buyer counts (>= 14 purchases),
    // the pooled-SE expression in the operator's fixed order, flag on
    // the unrounded z
    "q_ab_proportions" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS s_b
        |  FROM pu)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
        |  round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM (SELECT *,
        |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |    sqrt((CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 - CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
        |  FROM t)""".stripMargin,


    // CUPED truth: exact decimal moment sums (one per-user fold, then
    // one moment fold); θ/ρ²/deltas recomputed in the operator's fixed
    // double order
    "q_cuped" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS x,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |m AS (SELECT count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    -- one operand widened to DECIMAL(19,6): DuckDB's DECIMAL(18)
        |    -- pair multiply runs on int64 mantissas and overflows; width
        |    -- 19 forces the int128 path (exact value unchanged)
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * y AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * x AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(CAST(y AS DECIMAL(19,6)) * y AS DECIMAL(38,12))) AS syy,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    sum(CASE WHEN arm = 'A' THEN y END) AS sy_a,
        |    sum(CASE WHEN arm = 'A' THEN x END) AS sx_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN arm = 'B' THEN y END) AS sy_b,
        |    sum(CASE WHEN arm = 'B' THEN x END) AS sx_b
        |  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
        |d AS (SELECT CAST(n AS BIGINT) AS n, n_a, n_b,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
        |    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ya,
        |    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS yb,
        |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS xa,
        |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS xb
        |  FROM m)
        |SELECT n, n_a, n_b, round(ya - yb, 6) AS delta_raw,
        |  CASE WHEN varxn > 0 THEN round(
        |    (ya - yb) - (covn / varxn) * (xa - xb), 6) END AS delta_adjusted,
        |  CASE WHEN varxn > 0 THEN round(covn / varxn, 6) END AS theta,
        |  CASE WHEN varxn > 0 AND varyn > 0 THEN round(
        |    covn * covn / (varxn * varyn), 6) END AS rho2
        |FROM d""".stripMargin,


    // delta-method truth: same exact decimal moment fold (DECIMAL(19,6)
    // widening for the int128 multiply path), variance and CI in the
    // operator's fixed double order
    "q_ratio_ci" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS den,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS num
        |  FROM events GROUP BY user_id),
        |m AS (SELECT count(*) AS n, sum(num) AS sn, sum(den) AS sd,
        |    sum(CAST(CAST(num AS DECIMAL(19,6)) * num AS DECIMAL(38,12)))
        |      AS snn,
        |    sum(CAST(CAST(num AS DECIMAL(19,6)) * den AS DECIMAL(38,12)))
        |      AS snd,
        |    sum(CAST(CAST(den AS DECIMAL(19,6)) * den AS DECIMAL(38,12)))
        |      AS sdd
        |  FROM pu WHERE num IS NOT NULL AND den IS NOT NULL),
        |d AS (SELECT CAST(n AS BIGINT) AS n, sd,
        |    CAST(sn AS DOUBLE) AS snd_, CAST(sd AS DOUBLE) AS sdd_,
        |    CAST(sn AS DOUBLE) / nullif(CAST(sd AS DOUBLE), 0.0) AS ratio,
        |    (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cnn,
        |    (CAST(snd AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cnd,
        |    (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cdd,
        |    CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS dbar,
        |    CAST(n AS DOUBLE) AS nd FROM m),
        |v AS (SELECT *,
        |    (cnn - 2.0 * ratio * cnd + ratio * ratio * cdd) /
        |      (nd * dbar * dbar) AS varr FROM d)
        |SELECT n, round(snd_, 6) AS num_sum, round(sdd_, 6) AS den_sum,
        |  CASE WHEN sd <> 0 THEN round(ratio, 6) END AS ratio,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(sqrt(varr), 6) END AS se,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(ratio - 1.959964 * sqrt(varr), 6) END AS ci_low,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(ratio + 1.959964 * sqrt(varr), 6) END AS ci_high
        |FROM v""".stripMargin,


    // jackknife truth: same 20-bucket assignment, 9 dp decimal
    // replicates, exact decimal replicate mean, 12 dp deviation fold
    "q_jackknife_ci" ->
      """WITH pu AS (SELECT user_id, user_id % 20 AS bucket,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS den,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS num
        |  FROM events GROUP BY user_id),
        |pb AS (SELECT bucket, sum(num) AS nx, sum(den) AS ny,
        |    count(*) AS c FROM pu
        |  WHERE num IS NOT NULL AND den IS NOT NULL GROUP BY 1),
        |st AS (SELECT *, sum(nx) OVER () AS tx, sum(ny) OVER () AS ty,
        |    count(*) OVER () AS nb, sum(c) OVER () AS n FROM pb),
        |lo AS (SELECT *, CAST(round(CAST(tx - nx AS DOUBLE) /
        |    nullif(CAST(ty - ny AS DOUBLE), 0.0), 9) AS DECIMAL(28,9))
        |    AS loo FROM st),
        |mn AS (SELECT *, CAST(sum(loo) OVER () AS DOUBLE) /
        |    CAST(nb AS DOUBLE) AS mean_loo FROM lo),
        |f AS (SELECT max(nb) AS buckets, CAST(max(n) AS BIGINT) AS n,
        |    max(tx) AS sx, max(ty) AS sy,
        |    sum(CAST(round((CAST(loo AS DOUBLE) - mean_loo) *
        |      (CAST(loo AS DOUBLE) - mean_loo), 12) AS DECIMAL(38,12)))
        |      AS ss,
        |    sum(CASE WHEN loo IS NULL THEN 1 ELSE 0 END) AS badloo
        |  FROM mn),
        |g AS (SELECT *,
        |    CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), 0.0) AS ratio,
        |    sqrt(1.0 - 1.0 / CAST(buckets AS DOUBLE)) *
        |      sqrt(CAST(ss AS DOUBLE)) AS se FROM f)
        |SELECT CAST(buckets AS INT) AS buckets, n,
        |  CASE WHEN sy <> 0 THEN round(ratio, 6) END AS ratio,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(se, 6) END AS se_jack,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(ratio - 1.959964 * se, 6) END AS ci_low,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(ratio + 1.959964 * se, 6) END AS ci_high
        |FROM g""".stripMargin,


    // McNemar truth: exact discordant cells, continuity-corrected chi2
    // in the operator's fixed order, df=1 5% critical value 3.841459
    "q_mcnemar" ->
      """WITH pu AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS clicks
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN conv = 1 AND clicks >= 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS both_pass,
        |    CAST(sum(CASE WHEN conv = 1 AND clicks < 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS a_only,
        |    CAST(sum(CASE WHEN conv <> 1 AND clicks >= 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS b_only,
        |    CAST(sum(CASE WHEN conv <> 1 AND clicks < 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS neither
        |  FROM pu),
        |c AS (SELECT *,
        |    (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE)) - 1.0) *
        |    (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE)) - 1.0) /
        |    nullif(CAST(a_only AS DOUBLE) + CAST(b_only AS DOUBLE), 0.0)
        |      AS chi2 FROM t)
        |SELECT n, both_pass, a_only, b_only, neither,
        |  CASE WHEN a_only + b_only > 0 THEN round(chi2, 6) END AS chi2_cc,
        |  CASE WHEN a_only + b_only > 0 THEN chi2 > 3.841459 END
        |    AS significant_5pct
        |FROM c""".stripMargin,


    // MDE truth: per-segment unit counts from the same left join, the
    // pinned z constants summed as doubles exactly like the operator
    "q_mde" ->
      """WITH o AS (SELECT o_custkey AS c_custkey, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |u AS (SELECT CAST(c.c_mktsegment AS VARCHAR) AS segment,
        |    CASE WHEN o.n_orders >= 1 THEN 1 ELSE 0 END AS s
        |  FROM customer c LEFT JOIN o USING (c_custkey)),
        |g AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s) AS BIGINT) AS successes FROM u GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p_,
        |    (1.959964 + 0.841621) * sqrt(2.0 *
        |      (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) / 2.0)) AS mde FROM g)
        |SELECT segment, n, successes, round(p_, 6) AS p,
        |  CASE WHEN successes > 0 AND successes < n
        |    THEN round(mde, 6) END AS mde_abs,
        |  CASE WHEN successes > 0 AND successes < n
        |    THEN round(mde / p_, 6) END AS mde_rel
        |FROM d ORDER BY segment""".stripMargin,


    // DiD truth: eight exact conditional decimal sums over purchase
    // events, the four cell means and the difference in the operator's
    // fixed double order; mid-month split day 19738 = 2024-01-16
    "q_did" ->
      """WITH p AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'A' AND t < 19738 AND v IS NOT NULL
        |      THEN v END) AS s_a_pre,
        |    CAST(sum(CASE WHEN arm = 'A' AND t < 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
        |    sum(CASE WHEN arm = 'A' AND t >= 19738 AND v IS NOT NULL
        |      THEN v END) AS s_a_post,
        |    CAST(sum(CASE WHEN arm = 'A' AND t >= 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
        |    sum(CASE WHEN arm = 'B' AND t < 19738 AND v IS NOT NULL
        |      THEN v END) AS s_b_pre,
        |    CAST(sum(CASE WHEN arm = 'B' AND t < 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
        |    sum(CASE WHEN arm = 'B' AND t >= 19738 AND v IS NOT NULL
        |      THEN v END) AS s_b_post,
        |    CAST(sum(CASE WHEN arm = 'B' AND t >= 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post
        |  FROM p),
        |m AS (SELECT *,
        |    CAST(s_a_pre AS DOUBLE) / nullif(CAST(n_a_pre AS DOUBLE), 0.0)
        |      AS ma_pre,
        |    CAST(s_a_post AS DOUBLE) / nullif(CAST(n_a_post AS DOUBLE), 0.0)
        |      AS ma_post,
        |    CAST(s_b_pre AS DOUBLE) / nullif(CAST(n_b_pre AS DOUBLE), 0.0)
        |      AS mb_pre,
        |    CAST(s_b_post AS DOUBLE) / nullif(CAST(n_b_post AS DOUBLE), 0.0)
        |      AS mb_post FROM a)
        |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  round(ma_pre, 6) AS mean_a_pre, round(ma_post, 6) AS mean_a_post,
        |  round(mb_pre, 6) AS mean_b_pre, round(mb_post, 6) AS mean_b_post,
        |  CASE WHEN n_a_pre > 0 AND n_a_post > 0 AND n_b_pre > 0
        |      AND n_b_post > 0
        |    THEN round((ma_post - ma_pre) - (mb_post - mb_pre), 6) END
        |    AS did
        |FROM m""".stripMargin,


    // always-valid truth: same daily fold, cumulative windows, the
    // mSPRT llr in the operator's fixed order rounded 9 dp before the
    // running max, p rounded 6 dp (tau = 0.1 -> tau^2 = 0.010000000000000002
    // as the same double product both sides compute)
    "q_always_valid" ->
      """WITH ev AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE ts IS NOT NULL),
        |d AS (SELECT CAST(day AS BIGINT) AS day,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS sa,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS sb
        |  FROM ev GROUP BY 1),
        |c AS (SELECT day,
        |    CAST(sum(na) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(sa) OVER w AS BIGINT) AS s_a,
        |    CAST(sum(nb) OVER w AS BIGINT) AS n_b,
        |    CAST(sum(sb) OVER w AS BIGINT) AS s_b
        |  FROM d WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |l AS (SELECT *,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND s_a + s_b > 0
        |        AND s_a + s_b < n_a + n_b
        |      THEN round(0.5 * ln(vt / (vt + t2)) +
        |        dlt * dlt * t2 / (2.0 * vt * (vt + t2)), 9) END AS llr,
        |    dlt, n_ok
        |  FROM (SELECT *,
        |      CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |        CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dlt,
        |      (CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |        (1.0 - CAST(s_a + s_b AS DOUBLE) /
        |          CAST(n_a + n_b AS DOUBLE)) *
        |        (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
        |        AS vt,
        |      0.1 * 0.1 AS t2,
        |      (n_a > 0 AND n_b > 0) AS n_ok
        |    FROM c)),
        |m AS (SELECT *, max(llr) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM l)
        |SELECT day, n_a, s_a, n_b, s_b,
        |  CASE WHEN n_ok THEN round(dlt, 6) END AS delta, llr,
        |  CASE WHEN runmax IS NOT NULL
        |    THEN round(exp(-greatest(runmax, 0.0)), 6) ELSE 1.0 END
        |    AS always_valid_p
        |FROM m ORDER BY day""".stripMargin,


    // winsorized truth: pooled p95 cap rounded 6 dp, capped values
    // quantized to DECIMAL(18,6) before the exact arm sums
    "q_winsorized_effect" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y
        |  FROM events GROUP BY user_id),
        |cp AS (SELECT round(quantile_cont(y, 0.95), 6) AS cap FROM pu),
        |j AS (SELECT arm, y, cap,
        |    CAST(least(y, cap) AS DECIMAL(18,6)) AS w,
        |    CAST(y AS DECIMAL(18,6)) AS raw FROM pu, cp),
        |a AS (SELECT max(cap) AS cap,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    sum(CASE WHEN arm = 'A' THEN w END) AS swa,
        |    sum(CASE WHEN arm = 'A' THEN raw END) AS sra,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN arm = 'B' THEN w END) AS swb,
        |    sum(CASE WHEN arm = 'B' THEN raw END) AS srb,
        |    CAST(sum(CASE WHEN y > cap THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_capped
        |  FROM j)
        |SELECT cap, n_a, n_b, n_capped,
        |  round(CAST(swa AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0), 6)
        |    AS mean_a_w,
        |  round(CAST(swb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS mean_b_w,
        |  round(CAST(swa AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(swb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS delta_winsorized,
        |  round(CAST(sra AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(srb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS delta_raw
        |FROM a""".stripMargin,


    // uplift truth: pooled quintile edges from quantile_cont, ties to
    // the LOWER bucket (score > edge), Qini walk down the ranking
    "q_uplift" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DOUBLE) AS x,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id),
        |e AS (SELECT quantile_cont(x, 0.2) AS e1, quantile_cont(x, 0.4)
        |    AS e2, quantile_cont(x, 0.6) AS e3, quantile_cont(x, 0.8)
        |    AS e4 FROM pu),
        |b AS (SELECT arm, conv,
        |    (CASE WHEN x > e1 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e2 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e3 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e4 THEN 1 ELSE 0 END) AS bucket
        |  FROM pu, e),
        |g AS (SELECT bucket,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM b GROUP BY 1),
        |c AS (SELECT *,
        |    sum(n_a) OVER (ORDER BY bucket DESC) AS cna,
        |    sum(s_a) OVER (ORDER BY bucket DESC) AS csa,
        |    sum(n_b) OVER (ORDER BY bucket DESC) AS cnb,
        |    sum(s_b) OVER (ORDER BY bucket DESC) AS csb
        |  FROM g)
        |SELECT bucket, n_a, s_a, n_b, s_b,
        |  round(CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0), 6)
        |    AS p_a,
        |  round(CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS p_b,
        |  round(CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS uplift,
        |  round(CAST(csa AS DOUBLE) - CAST(csb AS DOUBLE) *
        |    (CAST(cna AS DOUBLE) / nullif(CAST(cnb AS DOUBLE), 0.0)), 6)
        |    AS qini
        |FROM c ORDER BY bucket DESC""".stripMargin,


    // QTE truth: quantile_cont matches Spark's interpolated percentile;
    // per-side 6 dp rounding before the delta, exactly like the operator
    "q_qte" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.50), 6)
        |      AS a0,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.50), 6)
        |      AS b0,
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.90), 6)
        |      AS a1,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.90), 6)
        |      AS b1,
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.99), 6)
        |      AS a2,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.99), 6)
        |      AS b2
        |  FROM pu)
        |SELECT CAST(0.5 AS DOUBLE) AS q, a0 AS p_a, b0 AS p_b,
        |    round(a0 - b0, 6) AS qte FROM a
        |UNION ALL SELECT CAST(0.9 AS DOUBLE), a1, b1,
        |    round(a1 - b1, 6) FROM a
        |UNION ALL SELECT CAST(0.99 AS DOUBLE), a2, b2,
        |    round(a2 - b2, 6) FROM a""".stripMargin,


    // post-stratification truth: same signup-week strata, 9 dp decimal
    // per-stratum terms, exact decimal weighted fold
    "q_post_strat" ->
      """WITH pu AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS first_day,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,2)) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (SELECT CAST(floor((first_day - 19723) / 7.0) AS BIGINT) AS s_,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    sum(CASE WHEN arm = 'A' THEN CAST(y AS DECIMAL(18,6)) END)
        |      AS sa,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    sum(CASE WHEN arm = 'B' THEN CAST(y AS DECIMAL(18,6)) END)
        |      AS sb
        |  FROM pu GROUP BY 1),
        |w AS (SELECT *, sum(CASE WHEN na > 0 AND nb > 0 THEN na + nb
        |    ELSE 0 END) OVER () AS nu FROM g),
        |t AS (SELECT *, CASE WHEN na > 0 AND nb > 0 THEN CAST(round(
        |    (CAST(na + nb AS DOUBLE) / CAST(nu AS DOUBLE)) *
        |    (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
        |     CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)), 9)
        |    AS DECIMAL(28,9)) END AS term FROM w)
        |SELECT CAST(sum(na + nb) AS BIGINT) AS n,
        |  CAST(count(*) AS INT) AS strata_total,
        |  CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS INT)
        |    AS strata_used,
        |  round(CAST(sum(sa) AS DOUBLE) /
        |      nullif(CAST(sum(na) AS DOUBLE), 0.0) -
        |    CAST(sum(sb) AS DOUBLE) /
        |      nullif(CAST(sum(nb) AS DOUBLE), 0.0), 6) AS delta_raw,
        |  CASE WHEN sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) > 0
        |    THEN round(CAST(sum(term) AS DOUBLE), 6) END
        |    AS delta_post_strat
        |FROM t""".stripMargin,


    // bootstrap truth: identical seeded integer-threshold Poisson draws
    // (the CASE thresholds are generated from the same constants the
    // kernel uses), exact HUGEINT replicate sums, the same inverted-CDF
    // rank picks evaluated with the same double expressions
    // delta-bootstrap truth: identical per-(unit, replicate) seeded
    // draws; a unit's weight feeds whichever arm owns it; replicates
    // missing an arm are dropped from the CDF exactly like the operator
    "q_bootstrap_delta" -> {
      s"""WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(TRY_CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(9,2))
        |      * 100 AS BIGINT) AS u
        |  FROM events GROUP BY user_id),
        |sd AS (SELECT CAST(('0x' || substr(md5(id), 1, 15)) AS UBIGINT)
        |    AS seed, arm, u FROM pu WHERE u IS NOT NULL),
        |e AS (SELECT seed, arm, u, r FROM sd
        |  CROSS JOIN range(1, 201) AS t(r)),
        |${Stats.BootstrapThresholds.drawSqlCtes("e", Seq("arm", "u"), "seed")},
        |w AS (SELECT arm, u, r,
        |    ${Stats.BootstrapThresholds.sqlCase("x")} AS w FROM dx5),
        |m AS (SELECT r,
        |    SUM(CASE WHEN arm = 'A' THEN CAST(w AS HUGEINT) * u
        |      ELSE 0 END) AS swxa,
        |    SUM(CASE WHEN arm = 'A' THEN CAST(w AS HUGEINT)
        |      ELSE 0 END) AS swa,
        |    SUM(CASE WHEN arm = 'B' THEN CAST(w AS HUGEINT) * u
        |      ELSE 0 END) AS swxb,
        |    SUM(CASE WHEN arm = 'B' THEN CAST(w AS HUGEINT)
        |      ELSE 0 END) AS swb
        |  FROM w GROUP BY r),
        |d AS (SELECT round(CAST(swxa AS DOUBLE)
        |      / (CAST(swa AS DOUBLE) * 100.0)
        |    - CAST(swxb AS DOUBLE) / (CAST(swb AS DOUBLE) * 100.0), 6)
        |    AS m FROM m WHERE swa > 0 AND swb > 0),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rk,
        |    COUNT(*) OVER () AS rc FROM d),
        |ci AS (SELECT
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - 0.95) / 2 * rc)
        |      AS BIGINT), 1) THEN m END) AS lo,
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - (1.0 - 0.95) / 2)
        |      * rc) AS BIGINT), 1) THEN m END) AS hi,
        |    CAST(MAX(rc) AS BIGINT) AS n_replicates FROM ranked),
        |base AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    round(CAST(SUM(CASE WHEN arm = 'A' THEN u ELSE 0 END)
        |        AS DOUBLE)
        |      / (CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
        |        AS DOUBLE) * 100.0)
        |    - CAST(SUM(CASE WHEN arm = 'B' THEN u ELSE 0 END) AS DOUBLE)
        |      / (CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
        |        AS DOUBLE) * 100.0), 6) AS delta
        |  FROM pu WHERE u IS NOT NULL)
        |SELECT n_a, n_b, delta, lo, hi, n_replicates FROM base, ci""".stripMargin
    },


    // re-randomization truth: the same content-addressed md5 parity
    // draw (the aa_calibration rendering), exact decimal value sums,
    // round-6 deltas before the extreme compare
    "q_perm_test" ->
      """WITH rw AS (SELECT CAST(event_id AS VARCHAR) AS id,
        |    event_type AS g, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |ob AS (SELECT
        |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_1,
        |    SUM(CASE WHEN g = 'click' THEN v END) AS s1,
        |    CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_2,
        |    SUM(CASE WHEN g = 'purchase' THEN v END) AS s2
        |  FROM rw),
        |od AS (SELECT n_1, n_2,
        |    round(CAST(s2 AS DOUBLE) / nullif(CAST(n_2 AS DOUBLE), 0.0)
        |      - CAST(s1 AS DOUBLE) / nullif(CAST(n_1 AS DOUBLE), 0.0), 6)
        |      AS obs_diff FROM ob),
        |e AS (SELECT id, v, k FROM rw CROSS JOIN range(1, 51) AS t(k)),
        |a AS (SELECT k, v,
        |    CAST(('0x' || substr(md5(id || '#' || CAST(k AS VARCHAR)),
        |      1, 15)) AS UBIGINT) % 2 AS arm FROM e),
        |g AS (SELECT k,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN arm = 0 THEN v END) AS sa,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN arm = 1 THEN v END) AS sb
        |  FROM a GROUP BY k),
        |d AS (SELECT round(CAST(sb AS DOUBLE)
        |      / nullif(CAST(nb AS DOUBLE), 0.0)
        |    - CAST(sa AS DOUBLE) / nullif(CAST(na AS DOUBLE), 0.0), 6)
        |    AS dd FROM g),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_replicates,
        |    CAST(SUM(CASE WHEN abs(dd) >= abs((SELECT obs_diff FROM od))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme FROM d)
        |SELECT od.n_1, od.n_2, od.obs_diff, f.n_replicates, f.n_extreme,
        |  round(CAST(f.n_extreme + 1 AS DOUBLE) / (f.n_replicates + 1), 6)
        |    AS p_value
        |FROM od, f""".stripMargin,


    // RDD truth: per-side exact decimal moments in [c-h, c) / [c, c+h],
    // closed-form local-linear fit in the same operation order
    "q_rdd" ->
      """WITH r AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_l,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN x END) AS sxl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN y END) AS syl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00
        |      THEN CAST(x * y AS DECIMAL(38,4)) END) AS sxyl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00
        |      THEN CAST(x * x AS DECIMAL(38,4)) END) AS sxxl,
        |    count(DISTINCT CASE WHEN x >= 15.00 AND x < 25.00 THEN x
        |      END) AS dxl,
        |    CAST(SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_r,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN x END) AS sxr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN y END) AS syr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00
        |      THEN CAST(x * y AS DECIMAL(38,4)) END) AS sxyr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00
        |      THEN CAST(x * x AS DECIMAL(38,4)) END) AS sxxr,
        |    count(DISTINCT CASE WHEN x >= 25.00 AND x <= 35.00 THEN x
        |      END) AS dxr
        |  FROM r),
        |f AS (SELECT *,
        |    CAST(n_l * sxyl - CAST(sxl * syl AS DECIMAL(38,4)) AS DOUBLE)
        |      / CAST(n_l * sxxl - CAST(sxl * sxl AS DECIMAL(38,4))
        |        AS DOUBLE) AS sl,
        |    CAST(n_r * sxyr - CAST(sxr * syr AS DECIMAL(38,4)) AS DOUBLE)
        |      / CAST(n_r * sxxr - CAST(sxr * sxr AS DECIMAL(38,4))
        |        AS DOUBLE) AS sr
        |  FROM a),
        |z AS (SELECT *,
        |    CAST(syl AS DOUBLE) / CAST(n_l AS DOUBLE)
        |      + sl * (CAST(25.0 AS DOUBLE)
        |        - CAST(sxl AS DOUBLE) / CAST(n_l AS DOUBLE)) AS yl,
        |    CAST(syr AS DOUBLE) / CAST(n_r AS DOUBLE)
        |      + sr * (CAST(25.0 AS DOUBLE)
        |        - CAST(sxr AS DOUBLE) / CAST(n_r AS DOUBLE)) AS yr
        |  FROM f)
        |SELECT n_l, n_r,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(sl, 6) END AS slope_l,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(sr, 6) END AS slope_r,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yl, 6) END
        |    AS yhat_left,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yr, 6) END
        |    AS yhat_right,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yr - yl, 6) END
        |    AS effect
        |FROM z""".stripMargin,


    // IV/Wald truth: six exact sums, ITT over first stage in the same
    // operation order, weak-instrument NULL guard
    "q_iv_wald" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS z,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    CAST(SUM(z) AS BIGINT) AS n_z1,
        |    CAST(SUM(1 - z) AS BIGINT) AS n_z0,
        |    SUM(CASE WHEN z = 1 THEN y END) AS y1,
        |    SUM(CASE WHEN z = 0 THEN y END) AS y0,
        |    CAST(SUM(CASE WHEN z = 1 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1,
        |    CAST(SUM(CASE WHEN z = 0 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d0
        |  FROM pu),
        |f AS (SELECT *,
        |    CAST(y1 AS DOUBLE) / nullif(CAST(n_z1 AS DOUBLE), 0.0)
        |      - CAST(y0 AS DOUBLE) / nullif(CAST(n_z0 AS DOUBLE), 0.0)
        |      AS itt,
        |    CAST(d1 AS DOUBLE) / nullif(CAST(n_z1 AS DOUBLE), 0.0)
        |      - CAST(d0 AS DOUBLE) / nullif(CAST(n_z0 AS DOUBLE), 0.0)
        |      AS fs
        |  FROM a)
        |SELECT n_z1, n_z0, round(itt, 6) AS itt,
        |  round(fs, 6) AS first_stage,
        |  CASE WHEN abs(fs) > CAST(0.0001 AS DOUBLE)
        |    THEN round(itt / fs, 6) END AS late
        |FROM f""".stripMargin
  )
}
