package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical-statistics registry: hypothesis tests,
  * effect sizes, agreement, distribution diagnostics.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object StatsRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- per-type Tukey-fence outlier screen over event values ----
    "q_iqr_outliers" -> ((s, dir) =>
      Profile.iqrOutliers(Tables.events(s, dir), "event_type", "value", "event_id")
        .orderBy("event_type", "event_id")),


    // ---- median/MAD robust outlier flags per event type (breakdown
    //      point 0.5 — the screen is immune to the outliers it hunts);
    //      med/mad rounded before the z so both engines replay the
    //      arithmetic bit-for-bit ----
    "q_robust_outliers" -> ((s, dir) =>
      EventAnalytics.robustOutliers(Tables.events(s, dir), "event_type",
          "value", 3.5)
        .select("event_id", "event_type", "value", "med", "mad",
          "robust_z", "is_outlier")
        .orderBy("event_id")),


    // ---- pairwise Pearson correlation of the lineitem measures in ONE
    //      scan: decimal-exact moments, model-sized driver math ----
    "q_corr_matrix" -> ((s, dir) =>
      Stats.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col1", "col2")),


    // ---- chi-square independence: event_type x epoch-day-of-week
    //      (integer-derived category, engine-neutral); cell diagnostics
    //      plus the decimal-summed statistic ----
    "q_chi2" -> ((s, dir) =>
      Stats.chiSquare(
          Tables.events(s, dir).select(col("event_type"),
            (datediff(to_date(col("ts")), lit("1970-01-01")) % 7).as("dow")),
          "event_type", "dow")
        .orderBy("row_val", "col_val")),


    // ---- Welch unequal-variance t-test between every event-type pair:
    //      exact limb-sum moments in one grouped scan, bounded group
    //      table to the driver, fixed-order double t/df mirrored by the
    //      oracle ----
    "q_welch_t" -> ((s, dir) =>
      Stats.welchT(Tables.events(s, dir), "event_type", "value")
        .orderBy("g1", "g2")),


    // ---- two-sample Kolmogorov–Smirnov drift test (click vs purchase
    //      value distributions): one full-data count, then everything
    //      runs on the bounded distinct-value table; D maximized over
    //      exact integer cross-scaled gaps ----
    "q_ks_test" -> ((s, dir) =>
      Stats.ksTest(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),


    // ---- mutual information / NMI / Cramér's V between event type and
    //      day-of-week: HOW STRONG the dependence chi2 only detects ----
    "q_mutual_info" -> ((s, dir) =>
      Stats.mutualInfo(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .withColumn("dow",
            (datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
              .cast("string")),
        "event_type", "dow")),


    // ---- per-segment KS drift: WHICH day-of-week slice moved ----
    "q_ks_by_segment" -> ((s, dir) =>
      Stats.ksTestBy(
          Tables.events(s, dir).withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
          "dow", "event_type", "value", "click", "purchase")
        .orderBy(col("segment"))),


    // ---- Q-Q table: WHERE in the distribution the cohorts diverge
    //      (tail drift vs median shift — identical in a KS d) ----
    "q_qq_table" -> ((s, dir) =>
      Stats.qqTable(Tables.events(s, dir), "event_type", "value",
          "click", "purchase")
        .orderBy("p")),


    // ---- BH false-discovery control over the per-segment KS battery:
    //      the multiple-testing step every segment sweep needs ----
    "q_bh_fdr" -> ((s, dir) =>
      Stats.bhAdjust(
          Stats.ksTestBy(
            Tables.events(s, dir).withColumn("dow",
              datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
            "dow", "event_type", "value", "click", "purchase"),
          "p_approx", 0.05)
        .select("segment", "n1", "n2", "d", "p_approx", "p_adj", "reject")
        .orderBy("segment")),


    // ---- Mann–Whitney rank-sum test on the same cohorts: midranks as
    //      exact 2x-scaled integers from the distinct-value prefix
    //      counts, tie-corrected z ----
    "q_mann_whitney" -> ((s, dir) =>
      Stats.mannWhitneyU(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),


    // ---- Cliff's delta ordinal effect size on the same click-vs-
    //      purchase cohorts as the U test: same exact midrank fold,
    //      one driver division, Romano magnitude bands ----
    "q_cliffs_delta" -> ((s, dir) =>
      Stats.cliffsDelta(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),


    // ---- Hodges–Lehmann shift between the same cohorts: weighted
    //      median of pairwise differences computed on value CELLS with
    //      multiplicity weights — never the row-level pair set ----
    "q_hodges_lehmann" -> ((s, dir) =>
      Stats.hodgesLehmannShift(Tables.events(s, dir), "event_type",
        "value", "click", "purchase")),


    // ---- two-group log-rank churn test on the KM lifetime
    //      construction: ever-purchasers vs never-purchasers ----
    "q_logrank" -> ((s, dir) =>
      EventAnalytics.logRank(Tables.events(s, dir))),


    // ---- pass@k over per-user purchase attempts (success = basket
    //      value >= 50): exact falling-factorial estimator, both
    //      factors provably < 2^53 so the division is engine-exact ----
    "q_pass_at_k" -> ((s, dir) =>
      Eval.passAtK(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "user_id", col("value") >= 50, Seq(1, 3, 5))
        .orderBy("problem", "k")),


    // ---- isotonic (PAVA) calibration of return rate over the 11
    //      discount levels; the oracle replays the independent
    //      max_{j<=i} min_{k>=i} minimax characterization ----
    "q_isotonic" -> ((s, dir) =>
      Eval.isotonicCalibration(t(s, dir, "lineitem"), col("l_discount"),
        col("l_returnflag") === "R")
        .orderBy("score")),


    // ---- TOST equivalence gate on the per-user experiment: is B's
    //      10-plus-purchase rate provably within ±0.05 of A's? ----
    "q_tost" -> ((s, dir) =>
      Experiment.tostEquivalence(perUserExperiment(s, dir), "arm",
        col("purchases") >= 10L, "A", "B", margin = 0.05)),


    // ---- group-fairness readout of a length gate across languages:
    //      selection/base rates, TPR/FPR, parity gap, DI ratio ----
    "q_fairness" -> ((s, dir) =>
      Eval.fairnessGaps(t(s, dir, "documents"), "lang",
        col("doc_id") % 3 === 0, col("n_chars") >= 300)
        .orderBy("grp")),


    // ---- Nelson–Aalen cumulative hazard on the KM lifetime
    //      construction: additive companion to q_kaplan_meier ----
    "q_nelson_aalen" -> ((s, dir) =>
      EventAnalytics.nelsonAalen(Tables.events(s, dir)).orderBy("t")),


    // ---- paired t on per-user (engagement, purchases): each user is
    //      their own control ----
    "q_paired_t" -> ((s, dir) =>
      Stats.pairedT(perUserExperiment(s, dir), "x", "purchases")),


    // ---- 2x2 odds ratio: does a deep discount change return odds? ----
    "q_odds_ratio" -> ((s, dir) =>
      Stats.oddsRatio(t(s, dir, "lineitem"),
        col("l_discount") >= 0.05, col("l_returnflag") === "R")),


    // ---- Tukey-HSD pairwise table over the three return-flag cohorts:
    //      which groups differ after the omnibus ANOVA ----
    "q_tukey_hsd" -> ((s, dir) =>
      Stats.tukeyHsd(t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
        .orderBy("g1", "g2")),


    // ---- Cronbach's alpha over three per-line "measurements": do
    //      they measure one construct before averaging them ----
    "q_cronbach" -> ((s, dir) =>
      Stats.cronbachAlpha(
        t(s, dir, "lineitem").select(
          col("l_quantity").as("i0"),
          (col("l_discount") * 100).as("i1"),
          (col("l_tax") * 100).as("i2")),
        Seq("i0", "i1", "i2"))),


    // ---- Theil T concentration of positive account balances ----
    "q_theil_index" -> ((s, dir) =>
      Stats.theilIndex(t(s, dir, "customer"), "c_acctbal")),


    // ---- Chapman capture–recapture estimate of the purchaser
    //      population from two half-window sightings ----
    "q_capture_recapture" -> ((s, dir) =>
      EventAnalytics.captureRecapture(Tables.events(s, dir),
        col("event_type") === "purchase")),


    // ---- mean-excess tail table of account balances: EVT diagnostic
    //      (rising curve = heavy tail) ----
    "q_mean_excess" -> ((s, dir) =>
      Distribution.meanExcess(t(s, dir, "customer"), "c_acctbal",
        Seq(0, 2500, 5000, 7500, 9000)).orderBy("threshold")),


    // ---- one-sample KS of discount against Uniform(0, 0.1): the
    //      "is this randomizer actually uniform" gate ----
    "q_ks_uniform" -> ((s, dir) =>
      Stats.ksUniform(t(s, dir, "lineitem"), "l_discount", 0.0, 0.1)),


    // ---- Friedman test: per-user event-type value profiles as
    //      complete blocks, within-block midranks only ----
    "q_friedman" -> ((s, dir) =>
      Stats.friedman(Tables.events(s, dir), "user_id", "event_type",
        "value")),


    // ---- Cochran's Q: did ANY event type change its big-ticket rate
    //      across the same users (k-way McNemar) ----
    "q_cochran_q" -> ((s, dir) =>
      Stats.cochranQ(Tables.events(s, dir), "user_id", "event_type",
        col("value") >= 50)),


    // ---- Kish effective sample size of the value-weighted corpus ----
    "q_ess" -> ((s, dir) =>
      Stats.effectiveSampleSize(Tables.events(s, dir), "value")),


    // ---- ECE/MCE scalar rollup of the calibration table ----
    "q_ece" -> ((s, dir) =>
      Eval.expectedCalibrationError(
        t(s, dir, "lineitem").select(
          (col("l_discount") * 10).as("score"), col("l_returnflag")),
        "score", col("l_returnflag") === "R")),


    // ---- one-way ICC(1,1): is quantity variance the ORDER or the
    //      line (continuous-scale agreement) ----
    "q_icc" -> ((s, dir) =>
      Stats.icc(t(s, dir, "lineitem"), "l_orderkey", "l_quantity")),


    // ---- Wald–Wolfowitz runs test on the daily event-count series:
    //      randomness screen over the pre-aggregated bounded series ----
    "q_runs_test" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      Stats.runsTest(daily, "d", col("c") >= 333)
    }),


    // ---- order-statistic median CI (one pass, no resampling) ----
    "q_median_ci" -> ((s, dir) =>
      Stats.quantileCI(t(s, dir, "customer"), "c_acctbal")),


    // ---- Jarque–Bera normality screen of quantities ----
    "q_jarque_bera" -> ((s, dir) =>
      Stats.jarqueBera(t(s, dir, "lineitem"), "l_quantity")),


    // ---- Ljung–Box portmanteau over the first 5 daily-count ACF
    //      lags: any autocorrelation left? ----
    "q_ljung_box" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.ljungBox(daily, "t", "v", maxLag = 5)
    }),


    // ---- CART-stump best split of discount against returns ----
    "q_best_split" -> ((s, dir) =>
      Classifier.bestSplit(t(s, dir, "lineitem"), "l_discount",
        col("l_returnflag") === "R")),


    // ---- empirical-Bayes shrinkage of per-source pass rates: small
    //      sources pull to the beta-binomial prior ----
    "q_eb_shrinkage" -> ((s, dir) =>
      Stats.ebShrinkage(t(s, dir, "documents"), "source",
        col("n_chars") >= 300).orderBy("grp")),


    // ---- Mantel–Haenszel OR + CMH chi2, stratified by ship year:
    //      the Simpson-proof discount/returns association ----
    "q_mantel_haenszel" -> ((s, dir) =>
      Stats.mantelHaenszel(
        t(s, dir, "lineitem").select(
          year(col("l_shipdate")).as("yr"),
          col("l_discount"), col("l_returnflag")),
        "yr", col("l_discount") >= 0.05, col("l_returnflag") === "R")),


    // ---- Cochran–Armitage: is the return rate MONOTONE in the
    //      discount tier (ordered dose codes 0..10) ----
    "q_cochran_armitage" -> ((s, dir) =>
      Stats.cochranArmitage(t(s, dir, "lineitem"),
        round(col("l_discount") * 100, 0),
        col("l_returnflag") === "R")),


    // ---- partial correlation quantity~price holding discount fixed ----
    "q_partial_corr" -> ((s, dir) =>
      Stats.partialCorr(t(s, dir, "lineitem"), "l_quantity",
        "l_extendedprice", "l_discount")),


    // ---- Hill tail index of the top-100 account balances ----
    "q_hill_alpha" -> ((s, dir) =>
      Stats.hillAlpha(t(s, dir, "customer"), "c_acctbal", 100)),


    // ---- Benjamini–Yekutieli adjustment of the same per-segment KS
    //      battery as q_bh_fdr (valid under arbitrary dependence) ----
    "q_by_fdr" -> ((s, dir) =>
      Stats.byAdjust(
        Stats.ksTestBy(
          Tables.events(s, dir).withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
          "dow", "event_type", "value", "click", "purchase"),
        "p_approx", 0.05).orderBy("segment")),


    // ---- Wilcoxon signed-rank on the same per-user pairs as
    //      q_paired_t: the outlier-proof paired verdict ----
    "q_wilcoxon_signed" -> ((s, dir) =>
      Stats.wilcoxonSignedRank(perUserExperiment(s, dir),
        "x", "purchases")),


    // ---- linearly weighted kappa between the discount and tax tiers
    //      (ordinal agreement; near-misses cost 1/span) ----
    "q_weighted_kappa" -> ((s, dir) =>
      Stats.weightedKappa(
        t(s, dir, "lineitem").select(
          round(col("l_discount") * 100, 0).as("a"),
          round(col("l_tax") * 100, 0).as("b")),
        "a", "b")),


    // ---- Gwet's AC1 on the same rater pair as q_cohens_kappa:
    //      prevalence-robust agreement ----
    "q_gwet_ac1" -> ((s, dir) =>
      Stats.gwetAC1(t(s, dir, "lineitem"), "l_returnflag",
        "l_linestatus")),


    // ---- G-test (likelihood-ratio chi2) on the same table as q_chi2 ----
    "q_g_test" -> ((s, dir) =>
      Stats.gTest(
        Tables.events(s, dir).select(col("event_type"),
          (datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
            .as("dow")),
        "event_type", "dow")),


    // ---- committed-threshold confusion readout (MCC, balanced
    //      accuracy, F1) for the discount-as-score gate ----
    "q_confusion_stats" -> ((s, dir) =>
      Eval.confusionStats(t(s, dir, "lineitem"), "l_discount",
        col("l_returnflag") === "R", threshold = 0.05)),


    // ---- Benford first-digit audit of extended price: digit from the
    //      DECIMAL canonical rendering (no log10-boundary hazard), all
    //      9 digit rows guaranteed ----
    "q_benford" -> ((s, dir) =>
      Stats.benford(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy("digit")),


    // ---- autocorrelation of the daily event-count series at lags
    //      1..10 (weekly periodicity screen): one lag-expanded
    //      equi-join over the bounded daily table, exact limb-sum
    //      cross moments ----
    "q_acf" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.acf(daily, "t", "v", 10).orderBy("lag")
    }),


    // ---- Theil-Sen robust trend of the daily event-count series:
    //      median pairwise slope over the bounded series table ----
    "q_theil_sen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.theilSen(daily, "t", "v")
    }),


    // ---- classical additive seasonal decomposition of the daily event
    //      series (weekly period): centered moving-average trend,
    //      re-centered slot means, residual — all windows over the
    //      bounded series table ----
    "q_decompose" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.decomposeSeasonal(daily, "t", "v", 7).orderBy("t")
    }),


    // ---- two-proportion z-test: click vs purchase high-value rate ----
    "q_prop_test" -> ((s, dir) =>
      Stats.propTest(Tables.events(s, dir), "event_type",
        col("value") > 75, "click", "purchase")),


    // ---- Spearman rank correlation (tie-aware midranks, exact integer
    //      sums): both columns carry heavy ties, so the 2x-midrank
    //      arithmetic is fully exercised; windows run over bounded
    //      distinct-value tables ----
    "q_spearman" -> ((s, dir) =>
      Stats.spearman(Tables.events(s, dir), "value", "user_id")),


    // ---- Kendall tau-b from the 50x11 contingency table (exact
    //      concordant/discordant masses over cell pairs, tie-corrected) ----
    "q_kendall" -> ((s, dir) =>
      Stats.kendallTau(t(s, dir, "lineitem"), "l_quantity", "l_discount")),


    // ---- Cohen's kappa: returnflag-vs-linestatus agreement corrected
    //      for chance (one cell-table aggregation) ----
    "q_cohens_kappa" -> ((s, dir) =>
      Stats.cohensKappa(t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),


    // ---- Fleiss' κ over a 3-rater panel (three deterministic
    //      "high-value order" judgments per order — o_orderkey is the
    //      unique item key; exact integer folds) ----
    "q_fleiss_kappa" -> ((s, dir) =>
      Stats.fleissKappa(
        t(s, dir, "orders").select(
          col("o_orderkey").as("item"),
          explode(array(
            when(col("o_totalprice") > 150000, "hi").otherwise("lo"),
            when(col("o_orderpriority") < "3", "hi").otherwise("lo"),
            when(col("o_orderstatus") === "F", "hi").otherwise("lo")))
            .as("rating")),
        "item", "rating")),


    // ---- Krippendorff's α (nominal) over the ragged per-order
    //      returnflag panel: units = orders, ratings = line flags,
    //      single-line orders are unpairable and excluded ----
    "q_krippendorff" -> ((s, dir) =>
      Stats.krippendorffAlpha(t(s, dir, "lineitem"),
        "l_orderkey", "l_returnflag")),


    // ---- Poisson-bootstrap CI of the purchase-value mean: seeded
    //      integer-threshold draws, exact decimal replicate sums ----
    "q_bootstrap_ci" -> ((s, dir) =>
      Stats.bootstrapMeanCI(
        Tables.events(s, dir)
          .filter(col("value").isNotNull && col("event_type") === "purchase"),
        "event_id", "value", nReplicates = 100)),


    // ---- Kaplan-Meier survival curve of user lifetimes (censoring-
    //      aware retention): one per-user min/max pass, then all
    //      windows on the bounded lifetime table ----
    "q_kaplan_meier" -> ((s, dir) =>
      EventAnalytics.kaplanMeier(Tables.events(s, dir), "user_id", "ts",
          censorDays = 5)
        .orderBy("t")),


    // ---- tabular CUSUM change-point scan of the daily event-count
    //      series: prefix-sum/running-extreme formulation (no
    //      recursion), exact decimal cumulative arithmetic ----
    "q_cusum" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.cusum(daily, "t", "v", slack = 0.5, threshold = 4.0).orderBy("t")
    }),


    // ---- winsorized document lengths at the 1st/99th percentiles:
    //      inverted-CDF edges from the bounded distinct-value table,
    //      broadcast clip — no global row sort ----
    "q_winsorize" -> ((s, dir) =>
      Profile.winsorize(t(s, dir, "documents"), "doc_id", "n_chars",
          100, 9900)
        .orderBy("doc_id"))
  )

  def oracles: Map[String, String] = dmap(

    // Tukey fences via quantile_cont (pairs with Spark's exact
    // interpolated percentile); only the boolean flag leaves the query
    "q_iqr_outliers" ->
      """WITH th AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, event_id, value,
        |  value < q1 - (q3 - q1) * 1.5 OR value > q3 + (q3 - q1) * 1.5
        |    AS is_outlier
        |FROM events JOIN th USING (event_type)
        |WHERE value IS NOT NULL
        |ORDER BY event_type, event_id""".stripMargin,


    // robust outliers: quantile_cont matches Spark's exact interpolated
    // percentile; med/mad round at 6 dp BEFORE the z so the division
    // replays bit-for-bit
    "q_robust_outliers" ->
      """WITH m AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |md AS (SELECT e.event_type, any_value(m.med) AS med,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN m USING (event_type) GROUP BY e.event_type),
        |z AS (SELECT e.event_id, e.event_type, e.value, md.med, md.mad,
        |    CASE WHEN md.mad > 0
        |      THEN round((e.value - md.med) / (1.4826 * md.mad), 6) END AS robust_z
        |  FROM events e JOIN md USING (event_type))
        |SELECT event_id, event_type, value, med, mad, robust_z,
        |  COALESCE(abs(robust_z) > 3.5, false) AS is_outlier
        |FROM z ORDER BY event_id""".stripMargin,


    // Pearson truth: decimal-exact moments cast to double once, then the
    // identical fixed-order double formula per pair, rounded 6dp
    "q_corr_matrix" ->
      """WITH c0 AS (SELECT CAST(l_quantity AS DECIMAL(19,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(19,2)) AS e,
        |    CAST(l_discount AS DECIMAL(19,2)) AS d,
        |    CAST(l_tax AS DECIMAL(19,2)) AS t
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |  CAST(SUM(q) AS DOUBLE) AS s_q, CAST(SUM(e) AS DOUBLE) AS s_e,
        |  CAST(SUM(d) AS DOUBLE) AS s_d, CAST(SUM(t) AS DOUBLE) AS s_t,
        |  CAST(SUM(q * q) AS DOUBLE) AS p_qq, CAST(SUM(q * e) AS DOUBLE) AS p_qe,
        |  CAST(SUM(q * d) AS DOUBLE) AS p_qd, CAST(SUM(q * t) AS DOUBLE) AS p_qt,
        |  CAST(SUM(e * e) AS DOUBLE) AS p_ee, CAST(SUM(e * d) AS DOUBLE) AS p_ed,
        |  CAST(SUM(e * t) AS DOUBLE) AS p_et, CAST(SUM(d * d) AS DOUBLE) AS p_dd,
        |  CAST(SUM(d * t) AS DOUBLE) AS p_dt, CAST(SUM(t * t) AS DOUBLE) AS p_tt
        |  FROM c0)
        |SELECT col1, col2, n, r FROM (
        |  SELECT 'l_quantity' AS col1, 'l_extendedprice' AS col2, n,
        |    round((n * p_qe - s_q * s_e) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_ee - s_e * s_e)), 6) AS r FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n,
        |    round((n * p_qd - s_q * s_d) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_dd - s_d * s_d)), 6) FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |    round((n * p_qt - s_q * s_t) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        |    round((n * p_ed - s_e * s_d) / (sqrt(n * p_ee - s_e * s_e) * sqrt(n * p_dd - s_d * s_d)), 6) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |    round((n * p_et - s_e * s_t) / (sqrt(n * p_ee - s_e * s_e) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', n,
        |    round((n * p_dt - s_d * s_t) / (sqrt(n * p_dd - s_d * s_d) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m)
        |ORDER BY col1, col2""".stripMargin,


    "q_chi2" ->
      """WITH e AS (SELECT event_type AS row_val,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS col_val
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |cells AS (SELECT row_val, col_val, count(*) AS observed
        |  FROM e GROUP BY row_val, col_val),
        |rt AS (SELECT row_val, SUM(observed) AS mrt FROM cells GROUP BY row_val),
        |ct AS (SELECT col_val, SUM(observed) AS mct FROM cells GROUP BY col_val),
        |tot AS (SELECT SUM(observed) AS n,
        |    count(DISTINCT row_val) AS nr, count(DISTINCT col_val) AS nc FROM cells),
        |s AS (SELECT c.row_val, c.col_val, c.observed,
        |    round(CAST(mrt AS DOUBLE) * mct / n, 6) AS expected, nr, nc
        |  FROM cells c JOIN rt USING (row_val) JOIN ct USING (col_val), tot),
        |s2 AS (SELECT *,
        |    CASE WHEN expected > 0.0
        |      THEN round((observed - expected) * (observed - expected) / expected, 6)
        |      ELSE 0.0 END AS contrib
        |  FROM s),
        |st AS (SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
        |    (max(nr) - 1) * (max(nc) - 1) AS dof FROM s2)
        |SELECT row_val, col_val, observed, expected, contrib, chi2, dof
        |FROM s2, st ORDER BY row_val, col_val""".stripMargin,


    // Welch truth: exact decimal moments per group cast to double once,
    // then the identical fixed-order mean/variance/t/df arithmetic
    "q_welch_t" ->
      """WITH g AS (SELECT event_type AS g, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS p
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY event_type HAVING count(*) >= 2),
        |pr AS (SELECT g1.g AS g1, g2.g AS g2, g1.n AS n1, g2.n AS n2,
        |    g1.s / g1.n AS mean1, g2.s / g2.n AS mean2,
        |    (g1.n * g1.p - g1.s * g1.s) / CAST(g1.n * (g1.n - 1) AS DOUBLE) AS v1,
        |    (g2.n * g2.p - g2.s * g2.s) / CAST(g2.n * (g2.n - 1) AS DOUBLE) AS v2
        |  FROM g g1 JOIN g g2 ON g1.g < g2.g),
        |ab AS (SELECT *, v1 / n1 AS a, v2 / n2 AS b FROM pr)
        |SELECT g1, g2, n1, n2, round(mean1, 6) AS mean1, round(mean2, 6) AS mean2,
        |  CASE WHEN a + b > 0.0
        |    THEN round((mean1 - mean2) / sqrt(a + b), 6) END AS t,
        |  CASE WHEN a + b > 0.0
        |    THEN round((a + b) * (a + b) /
        |      (a * a / (n1 - 1) + b * b / (n2 - 1)), 6) END AS df_w
        |FROM ab ORDER BY g1, g2""".stripMargin,


    // KS truth: same decimal canonicalization, same integer cross-
    // scaled gap max, p from the ROUNDED d so exp sees one double
    "q_ks_test" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2 FROM c),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |m AS (SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |    - CAST(cum2 AS HUGEINT) * n1)) AS dn FROM w, t),
        |d AS (SELECT n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m, t)
        |SELECT n1, n2, d,
        |  round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |    (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |FROM d""".stripMargin,


    // mutual-information truth: same rounded-term decimal folds over
    // the cell/margin tables, identical fixed-order double assembly
    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS a,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS b
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS nab FROM e GROUP BY 1, 2),
        |at AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
        |bt AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(nab) AS BIGINT) AS n,
        |    count(DISTINCT a) AS ra, count(DISTINCT b) AS rb FROM cells),
        |sc AS (SELECT nab, na, nb, n,
        |    CAST(round((CAST(nab AS DOUBLE) / n)
        |      * ln(CAST(n AS DOUBLE) * nab / (CAST(na AS DOUBLE) * nb)), 6)
        |      AS DECIMAL(18,6)) AS mit,
        |    round(CAST(na AS DOUBLE) * nb / n, 6) AS ex
        |  FROM cells JOIN at USING (a) JOIN bt USING (b), t),
        |sc2 AS (SELECT *, CASE WHEN ex > 0.0
        |    THEN CAST(round((nab - ex) * (nab - ex) / ex, 6) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END AS x2t FROM sc),
        |ha AS (SELECT CAST(SUM(CAST(round(-(CAST(na AS DOUBLE) / n)
        |    * ln(CAST(na AS DOUBLE) / n), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS ha FROM at, t),
        |hb AS (SELECT CAST(SUM(CAST(round(-(CAST(nb AS DOUBLE) / n)
        |    * ln(CAST(nb AS DOUBLE) / n), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS hb FROM bt, t),
        |s3 AS (SELECT CAST(SUM(mit) AS DOUBLE) AS mi,
        |    CAST(CAST(SUM(x2t) AS DECIMAL(30,6))
        |      + CAST(max(n) - SUM(CAST(ex AS DECIMAL(18,6)))
        |        AS DECIMAL(30,6)) AS DOUBLE) AS x2 FROM sc2)
        |SELECT n, round(mi, 6) AS mi,
        |  CASE WHEN ha > 0.0 AND hb > 0.0
        |    THEN round(mi / sqrt(ha * hb), 6) END AS nmi,
        |  CASE WHEN least(ra, rb) > 1
        |    THEN round(sqrt(x2 / (n * (least(ra, rb) - 1))), 6)
        |  END AS cramers_v
        |FROM s3, t, ha, hb""".stripMargin,


    // per-segment KS truth: same windows PARTITION BY segment
    "q_ks_by_segment" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |d AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0)
        |SELECT segment, n1, n2, d,
        |  round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |    (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |FROM d ORDER BY segment""".stripMargin,


    // Q-Q truth: same inverted-CDF quantiles at percentiles 1..99
    "q_qq_table" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM c),
        |p AS (SELECT CAST(gs AS BIGINT) AS p
        |  FROM generate_series(1, 99) AS t2(gs)),
        |q AS (SELECT p,
        |    CAST(MIN(CASE WHEN CAST(cum1 AS HUGEINT) * 100
        |      >= CAST(n1 AS HUGEINT) * p THEN v END) AS DOUBLE) AS q1,
        |    CAST(MIN(CASE WHEN CAST(cum2 AS HUGEINT) * 100
        |      >= CAST(n2 AS HUGEINT) * p THEN v END) AS DOUBLE) AS q2
        |  FROM w, p GROUP BY 1)
        |SELECT p, q1, q2, round(q2 - q1, 6) AS gap
        |FROM q ORDER BY p""".stripMargin,


    // BH truth: the per-segment KS battery as a CTE, then the step-up
    // over the bounded distinct-p table with the same tie-deterministic
    // rank (#values <= p)
    "q_bh_fdr" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |dd AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0),
        |ks AS (SELECT segment, n1, n2, d,
        |    round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |      (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |  FROM dd),
        |pc AS (SELECT p_approx AS p, count(*) AS n FROM ks GROUP BY 1),
        |w2 AS (SELECT p, CAST(SUM(n) OVER (ORDER BY p) AS BIGINT) AS i,
        |    CAST(SUM(n) OVER () AS BIGINT) AS m FROM pc),
        |rw AS (SELECT p, p * CAST(m AS DOUBLE) / i AS raw FROM w2),
        |ad AS (SELECT p, round(least(CAST(1 AS DOUBLE),
        |    MIN(raw) OVER (ORDER BY p DESC)), 6) AS p_adj FROM rw)
        |SELECT ks.segment, ks.n1, ks.n2, ks.d, ks.p_approx, ad.p_adj,
        |  ad.p_adj <= 0.05 AS reject
        |FROM ks JOIN ad ON ks.p_approx = ad.p
        |ORDER BY segment""".stripMargin,


    // Mann-Whitney truth: exact 2x-scaled midrank sums and tie cubes
    // from the same distinct-value prefix counts, identical fixed-order
    // double u/z arithmetic
    // decomposition truth: identical window frames and one fixed
    // operation order per column — trend is wsum/700.0 (integer-unit
    // window sum), slot means are decimal sums of rounded terms
    "q_decompose" ->
      """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |u AS (SELECT t, v,
        |    CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS uu FROM daily),
        |w AS (SELECT t, v,
        |    SUM(uu) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |      AS wsum,
        |    COUNT(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |      AS wcnt
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
        |c AS (SELECT round(CAST(SUM(CAST(smean AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS cc FROM sl)
        |SELECT t, v AS value, trend, round(smean - cc, 6) AS seasonal,
        |  CASE WHEN trend IS NOT NULL
        |    THEN round(v - trend - round(smean - cc, 6), 6) END AS resid
        |FROM det LEFT JOIN sl USING (slot) CROSS JOIN c ORDER BY t""".stripMargin,


    "q_cohens_kappa" ->
      """WITH cells AS (SELECT CAST(l_returnflag AS VARCHAR) AS a,
        |    CAST(l_linestatus AS VARCHAR) AS b, COUNT(*) AS c
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT SUM(c) AS n,
        |    SUM(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM cells),
        |ra AS (SELECT a, SUM(c) AS ma FROM cells GROUP BY 1),
        |rb AS (SELECT b, SUM(c) AS mb FROM cells GROUP BY 1),
        |x AS (SELECT COALESCE(SUM(CAST(ma AS HUGEINT) * mb), 0) AS xx
        |  FROM ra JOIN rb ON ra.a = rb.b),
        |f AS (SELECT CAST(n AS BIGINT) AS n,
        |    round(CAST(agree AS DOUBLE) / n, 6) AS po,
        |    round(CAST(xx AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe
        |  FROM t, x)
        |SELECT n, po, pe, CASE WHEN pe < 1.0
        |  THEN round((po - pe) / (1.0 - pe), 6) END AS kappa FROM f""".stripMargin,


    // Fleiss truth: the 3-rater panel unpivots as a UNION ALL; P̄ and
    // P_e are ratios of exact integer aggregates (margins squared as
    // HUGEINT), κ recomputed from the 6-dp-rounded P̄/P_e exactly as
    // the operator does
    "q_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT o_orderkey AS item,
        |    CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END AS rating
        |    FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority < '3' THEN 'hi' ELSE 'lo' END
        |    FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN 'hi' ELSE 'lo' END
        |    FROM orders),
        |cells AS (SELECT item, rating, count(*) AS k FROM r GROUP BY 1, 2),
        |items AS (SELECT item, sum(k) AS m, sum(k * k) AS s2
        |  FROM cells GROUP BY 1),
        |a AS (SELECT count(*) AS nitems, CAST(sum(s2) AS BIGINT) AS s2t
        |  FROM items),
        |tt AS (SELECT COALESCE(sum(CAST(tc AS HUGEINT) * tc), 0) AS tt
        |  FROM (SELECT rating, sum(k) AS tc FROM cells GROUP BY 1)),
        |f AS (SELECT CAST(nitems AS BIGINT) AS n_items,
        |    CAST(3 AS BIGINT) AS n_raters,
        |    round(CAST(s2t - nitems * 3 AS DOUBLE) /
        |      (CAST(nitems AS DOUBLE) * 3 * 2), 6) AS p_bar,
        |    round(CAST(tt AS DOUBLE) /
        |      ((CAST(nitems AS DOUBLE) * 3) * (CAST(nitems AS DOUBLE) * 3)),
        |      6) AS p_e
        |  FROM a, tt)
        |SELECT n_items, n_raters, p_bar, p_e, CASE WHEN p_e < 1.0
        |  THEN round((p_bar - p_e) / (1.0 - p_e), 6) END AS kappa
        |FROM f""".stripMargin,


    // Krippendorff truth: per-unit (m² − Σn²)/(m−1) terms rounded at
    // 9 dp into a decimal fold; margins counted over pairable units
    // only; the three divisions mirror the operator's fixed order
    "q_krippendorff" ->
      """WITH cells AS (SELECT l_orderkey AS u,
        |    CAST(l_returnflag AS VARCHAR) AS v, count(*) AS k
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_returnflag IS NOT NULL GROUP BY 1, 2),
        |units AS (SELECT u, sum(k) AS m, sum(k * k) AS s2
        |  FROM cells GROUP BY 1 HAVING sum(k) >= 2),
        |ua AS (SELECT count(*) AS n_units, CAST(sum(m) AS BIGINT) AS n,
        |    sum(CAST(round(CAST(m * m - s2 AS DOUBLE) /
        |      CAST(m - 1 AS DOUBLE), 9) AS DECIMAL(28,9))) AS dsum
        |  FROM units),
        |va AS (SELECT COALESCE(sum(CAST(t AS HUGEINT) * t), 0) AS tt
        |  FROM (SELECT c.v, sum(c.k) AS t FROM cells c
        |    JOIN units uu ON c.u = uu.u GROUP BY 1))
        |SELECT CAST(n_units AS BIGINT) AS n_units, n AS n_ratings,
        |  round(CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS d_o,
        |  round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(tt AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS d_e,
        |  CASE WHEN n >= 2 AND CAST(tt AS DOUBLE) <
        |      CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |    THEN round(1.0 - (CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(tt AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) END AS alpha
        |FROM ua, va""".stripMargin,


    "q_bootstrap_ci" -> {
      s"""WITH v AS (SELECT CAST(event_id AS VARCHAR) AS id,
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS u
        |  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'),
        |sd AS (SELECT CAST(('0x' || substr(md5(id), 1, 15)) AS UBIGINT)
        |    AS seed, u FROM v),
        |e AS (SELECT seed, u, r FROM sd CROSS JOIN range(1, 101) AS t(r)),
        |${Stats.BootstrapThresholds.drawSqlCtes("e", Seq("u"), "seed")},
        |w AS (SELECT u, r, ${Stats.BootstrapThresholds.sqlCase("x")} AS w
        |  FROM dx5),
        |m AS (SELECT r, SUM(CAST(w AS HUGEINT) * u) AS swx,
        |    SUM(CAST(w AS HUGEINT)) AS sw FROM w GROUP BY r),
        |means AS (SELECT round(CAST(swx AS DOUBLE)
        |    / (CAST(sw AS DOUBLE) * 100.0), 6) AS m FROM m WHERE sw > 0),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rk,
        |    COUNT(*) OVER () AS rc FROM means),
        |ci AS (SELECT
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - 0.95) / 2 * rc)
        |      AS BIGINT), 1) THEN m END) AS lo,
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - (1.0 - 0.95) / 2)
        |      * rc) AS BIGINT), 1) THEN m END) AS hi,
        |    CAST(MAX(rc) AS BIGINT) AS n_replicates FROM ranked),
        |base AS (SELECT COUNT(*) AS n, round(CAST(SUM(u) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * 100.0), 6) AS mean FROM v)
        |SELECT CAST(n AS BIGINT) AS n, mean, lo, hi, n_replicates
        |FROM base, ci""".stripMargin
    },


    // kendall truth: identical cell table, HUGEINT pair masses, integer
    // margin tie terms (t(t-1) is even, so // 2 is exact), one double
    "q_kendall" ->
      """WITH u AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(9,2)) * 100 AS BIGINT) AS a,
        |    CAST(CAST(l_discount AS DECIMAL(9,2)) * 100 AS BIGINT) AS b
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |cells AS (SELECT a, b, COUNT(*) AS c FROM u GROUP BY 1, 2),
        |pq AS (SELECT
        |    COALESCE(SUM(CASE WHEN r.b > l.b
        |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS p,
        |    COALESCE(SUM(CASE WHEN r.b < l.b
        |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS q
        |  FROM cells l JOIN cells r ON r.a > l.a),
        |ma AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n1
        |  FROM (SELECT SUM(c) AS t FROM cells GROUP BY a)),
        |mb AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n2
        |  FROM (SELECT SUM(c) AS t FROM cells GROUP BY b)),
        |nn AS (SELECT SUM(c) AS n FROM cells),
        |f AS (SELECT CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS concordant,
        |    CAST(q AS BIGINT) AS discordant,
        |    CAST(n AS HUGEINT) * (n - 1) // 2 AS n0, p, q, n1, n2
        |  FROM pq, ma, mb, nn)
        |SELECT n, concordant, discordant,
        |  CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN
        |    round(CAST(p - q AS DOUBLE) / (sqrt(CAST(n0 - n1 AS DOUBLE))
        |      * sqrt(CAST(n0 - n2 AS DOUBLE))), 6) END AS tau_b
        |FROM f""".stripMargin,


    "q_spearman" ->
      """WITH r AS (SELECT CAST(value AS DECIMAL(9,2)) AS a,
        |    CAST(user_id AS DECIMAL(9,2)) AS b FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |ca AS (SELECT a, COUNT(*) AS cnt FROM r GROUP BY a),
        |ra AS (SELECT a,
        |    2 * (SUM(cnt) OVER (ORDER BY a) - cnt) + cnt + 1 AS rx FROM ca),
        |cb AS (SELECT b, COUNT(*) AS cnt FROM r GROUP BY b),
        |rb AS (SELECT b,
        |    2 * (SUM(cnt) OVER (ORDER BY b) - cnt) + cnt + 1 AS ry FROM cb),
        |j AS (SELECT rx, ry FROM r JOIN ra USING (a) JOIN rb USING (b)),
        |s AS (SELECT COUNT(*) AS n,
        |    SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
        |    SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
        |    SUM(CAST(ry AS HUGEINT) * ry) AS syy,
        |    SUM(CAST(rx AS HUGEINT) * ry) AS sxy FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END AS rho
        |FROM s""".stripMargin,


    "q_mann_whitney" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT c1, c2,
        |    SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS bef FROM c),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * bef + (c1 + c2) + 1)) AS two_r1,
        |    SUM(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2)
        |      - (c1 + c2)) AS ties,
        |    CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM w),
        |u AS (SELECT n1, n2, n1 + n2 AS n, ties,
        |    CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0 AS u1
        |  FROM a),
        |s AS (SELECT *,
        |    CAST(n1 AS DOUBLE) * n2 / 12.0 * ((n + 1)
        |      - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))) AS sigma2
        |  FROM u)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2,
        |  round(u1, 6) AS u1,
        |  round(CAST(n1 AS DOUBLE) * n2 - u1, 6) AS u2,
        |  CASE WHEN sigma2 > 0.0 THEN
        |    round((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0) / sqrt(sigma2), 6)
        |  END AS z
        |FROM s""".stripMargin,


    // Cliff's delta truth: identical midrank fold to the U oracle;
    // delta's numerator stays HUGEINT-exact until the one division
    "q_cliffs_delta" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT c1, c2,
        |    SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS bef FROM c),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * bef + (c1 + c2) + 1)) AS two_r1,
        |    CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM w),
        |d AS (SELECT n1, n2,
        |    round(CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1)
        |        - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * n2), 6) AS delta
        |  FROM a)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2, delta,
        |  CASE WHEN abs(delta) < CAST(0.147 AS DOUBLE) THEN 'negligible'
        |       WHEN abs(delta) < CAST(0.33 AS DOUBLE) THEN 'small'
        |       WHEN abs(delta) < CAST(0.474 AS DOUBLE) THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,


    // Hodges–Lehmann truth: same integer value units (x100), pair mass
    // per distinct difference, two order statistics off one cumulative
    // window; middle ranks in exact integer arithmetic
    "q_hodges_lehmann" ->
      """WITH c AS (SELECT
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |d AS (SELECT a.v - b.v AS d,
        |    SUM(CAST(a.c1 AS HUGEINT) * b.c2) AS w
        |  FROM (SELECT v, c1 FROM c WHERE c1 > 0) a,
        |       (SELECT v, c2 FROM c WHERE c2 > 0) b
        |  GROUP BY 1),
        |cw AS (SELECT d, SUM(w) OVER (ORDER BY d) AS cw FROM d),
        |r AS (SELECT n1, n2, CAST(n1 AS HUGEINT) * n2 AS pairs FROM t),
        |m AS (SELECT r.n1, r.n2, r.pairs,
        |    (SELECT min(d) FROM cw WHERE cw >= (r.pairs + 1) // 2) AS d1,
        |    (SELECT min(d) FROM cw WHERE cw >= (r.pairs + 2) // 2) AS d2
        |  FROM r)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2,
        |  CAST(pairs AS BIGINT) AS n_pairs,
        |  round(CAST(d1 + d2 AS DOUBLE) / 2.0 / 100.0, 6) AS hl_shift
        |FROM m""".stripMargin,


    // log-rank truth: KM lifetime construction, at-risk windows,
    // per-time e1/v terms rounded at 6 dp into exact decimal sums,
    // fixed-order closing z/chi2
    "q_logrank" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g1
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |mx AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN g1 ELSE 0 END) AS BIGINT)
        |      AS d1,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(SUM(g1) AS BIGINT) AS m1,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM u, mx GROUP BY 1),
        |r AS (SELECT *,
        |    SUM(m) OVER () - (SUM(m) OVER (ORDER BY t) - m) AS n_risk,
        |    SUM(m1) OVER () - (SUM(m1) OVER (ORDER BY t) - m1) AS n1_risk
        |  FROM lt),
        |tm AS (SELECT *,
        |    CASE WHEN d > 0 THEN CAST(round(
        |        CAST(CAST(d AS HUGEINT) * n1_risk AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS e1,
        |    CASE WHEN d > 0 AND n_risk > 1 THEN CAST(round(
        |        CAST(CAST(d AS HUGEINT) * n1_risk * (n_risk - n1_risk)
        |          * (n_risk - d) AS DOUBLE)
        |        / CAST(CAST(n_risk AS HUGEINT) * n_risk * (n_risk - 1)
        |          AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS v
        |  FROM r),
        |f AS (SELECT CAST(SUM(m1) AS BIGINT) AS users_1,
        |    CAST(SUM(m) - SUM(m1) AS BIGINT) AS users_0,
        |    CAST(SUM(d1) AS BIGINT) AS observed_1,
        |    SUM(e1) AS e1s, SUM(v) AS vs FROM tm)
        |SELECT users_1, users_0, observed_1,
        |  round(CAST(e1s AS DOUBLE), 6) AS expected_1,
        |  round(CAST(vs AS DOUBLE), 6) AS variance,
        |  CASE WHEN vs > 0 THEN round((CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) / sqrt(CAST(vs AS DOUBLE)), 6) END AS z,
        |  CASE WHEN vs > 0 THEN round((CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) * (CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) / CAST(vs AS DOUBLE), 6) END AS chi2
        |FROM f""".stripMargin,


    // pass@k truth: falling factorials as order-free products of
    // integers < 2^53 (exact in doubles), per-k mean via exact decimal
    "q_pass_at_k" ->
      """WITH att AS (SELECT user_id AS problem,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |  GROUP BY 1 HAVING count(*) <= 40),
        |pk AS (SELECT problem, n, c, k
        |  FROM att, (SELECT unnest([1, 3, 5]) AS k) ks WHERE k <= n),
        |f AS (SELECT p.problem, p.n, p.c, p.k,
        |    round(CAST(1.0 AS DOUBLE)
        |      - product(CAST(p.n - p.c - g.i AS DOUBLE))
        |        / product(CAST(p.n - g.i AS DOUBLE)), 6) AS pass_at_k
        |  FROM pk p JOIN generate_series(0, 9) AS g(i) ON g.i <= p.k - 1
        |  GROUP BY 1, 2, 3, 4),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_problems,
        |    round(CAST(SUM(CAST(pass_at_k AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS mean_pass_at_k
        |  FROM f GROUP BY 1)
        |SELECT f.problem, f.n, f.c, f.k, f.pass_at_k,
        |  m.n_problems, m.mean_pass_at_k
        |FROM f JOIN m USING (k)
        |ORDER BY problem, k""".stripMargin,


    // isotonic truth: the INDEPENDENT minimax characterization
    // iso_i = max_{j<=i} min_{k>=i} mean(pos_j..k) over prefix sums —
    // block rates are integer-ratio divisions, identical doubles
    "q_isotonic" ->
      """WITH lv AS (SELECT l_discount AS score, count(*) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT score, CAST(n AS BIGINT) AS n,
        |    CAST(pos AS BIGINT) AS pos,
        |    row_number() OVER (ORDER BY score) AS i,
        |    sum(n) OVER (ORDER BY score) AS cn,
        |    sum(pos) OVER (ORDER BY score) AS cp
        |  FROM lv),
        |mins AS (SELECT a.i AS i, j.i AS j,
        |    min(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
        |      / (k.cn - (j.cn - j.n))) AS mn
        |  FROM o a JOIN o j ON j.i <= a.i JOIN o k ON k.i >= a.i
        |  GROUP BY 1, 2),
        |iso AS (SELECT i, max(mn) AS iso_rate FROM mins GROUP BY 1)
        |SELECT o.score, o.n, o.pos,
        |  round(CAST(o.pos AS DOUBLE) / o.n, 6) AS raw_rate,
        |  round(iso.iso_rate, 6) AS iso_rate
        |FROM o JOIN iso USING (i) ORDER BY o.score""".stripMargin,


    // TOST truth: same four exact counts, unpooled SE, rounded one-
    // sided z's compared against the explicit double critical point
    "q_tost" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 10 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM pu),
        |d AS (SELECT *, CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb FROM t),
        |e AS (SELECT *, sqrt(pa * (CAST(1.0 AS DOUBLE) - pa)
        |      / CAST(n_a AS DOUBLE)
        |    + pb * (CAST(1.0 AS DOUBLE) - pb) / CAST(n_b AS DOUBLE)) AS se
        |  FROM d),
        |z AS (SELECT *,
        |    round((pb - pa + CAST(0.05 AS DOUBLE)) / se, 6) AS z_low,
        |    round((pb - pa - CAST(0.05 AS DOUBLE)) / se, 6) AS z_up
        |  FROM e)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round(pb - pa, 6) AS diff, round(se, 6) AS se,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN z_low END AS z_low,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN z_up END AS z_up,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN
        |    z_low > CAST(1.6448536269514722 AS DOUBLE)
        |    AND z_up < -CAST(1.6448536269514722 AS DOUBLE) END AS equivalent
        |FROM z""".stripMargin,


    // fairness truth: per-group exact counts, rates as single double
    // divisions, gap/ratio on the UNROUNDED doubles then one round
    "q_fairness" ->
      """WITH g AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_label,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pred,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp
        |  FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(n_pred AS DOUBLE) / n AS rate,
        |    CAST(SUM(n_pred) OVER () AS DOUBLE) / SUM(n) OVER ()
        |      AS overall,
        |    MIN(CAST(n_pred AS DOUBLE) / n) OVER () AS mn,
        |    MAX(CAST(n_pred AS DOUBLE) / n) OVER () AS mx
        |  FROM g)
        |SELECT grp, n, n_label, n_pred,
        |  round(CAST(n_label AS DOUBLE) / n, 6) AS base_rate,
        |  round(rate, 6) AS selection_rate,
        |  CASE WHEN n_label > 0
        |    THEN round(CAST(tp AS DOUBLE) / n_label, 6) END AS tpr,
        |  CASE WHEN n > n_label
        |    THEN round(CAST(fp AS DOUBLE) / (n - n_label), 6) END AS fpr,
        |  round(rate - overall, 6) AS parity_gap,
        |  CASE WHEN mx > 0 THEN round(mn / mx, 6) END AS di_ratio
        |FROM w ORDER BY grp""".stripMargin,


    // Nelson–Aalen truth: KM's lifetime construction, per-time hazard
    // terms rounded at 6 dp into exact decimal running sums
    "q_nelson_aalen" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_events,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_censored
        |  FROM u, m GROUP BY 1),
        |r AS (SELECT *,
        |    CAST(SUM(n_events + n_censored) OVER () AS BIGINT)
        |      - (CAST(SUM(n_events + n_censored) OVER (ORDER BY t)
        |        AS BIGINT) - (n_events + n_censored)) AS n_risk
        |  FROM lt),
        |tm AS (SELECT *,
        |    CAST(round(CAST(n_events AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) AS h,
        |    CAST(round(CAST(n_events AS DOUBLE)
        |      / CAST(CAST(n_risk AS HUGEINT) * n_risk AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS v
        |  FROM r)
        |SELECT t, n_risk, n_events, n_censored,
        |  CAST(SUM(h) OVER (ORDER BY t) AS DOUBLE) AS cum_hazard,
        |  CAST(SUM(v) OVER (ORDER BY t) AS DOUBLE) AS cum_hazard_var
        |FROM tm ORDER BY t""".stripMargin,


    // paired-t truth: exact decimal difference moments, one fixed-order
    // closing expression
    "q_paired_t" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchases,
        |    sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS x
        |  FROM events GROUP BY 1),
        |d AS (SELECT CAST(CAST(purchases AS DECIMAL(18,2))
        |    - CAST(x AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS dd FROM pu),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(dd) AS sd,
        |    SUM(CAST(dd * dd AS DECIMAL(38,4))) AS sd2 FROM d),
        |f AS (SELECT *, CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_,
        |    CAST(n * sd2 - CAST(sd * sd AS DECIMAL(38,4)) AS DOUBLE)
        |      AS varnum FROM a),
        |z AS (SELECT *, sqrt(varnum / (CAST(n AS DOUBLE)
        |    * (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)))) AS sdd FROM f)
        |SELECT n, round(mean_, 6) AS mean_diff,
        |  CASE WHEN n >= 2 THEN round(sdd, 6) END AS sd_diff,
        |  CASE WHEN n >= 2 AND varnum > 0 THEN
        |    round(mean_ / (sdd / sqrt(CAST(n AS DOUBLE))), 6) END AS t
        |FROM z""".stripMargin,


    // odds-ratio truth: four exact cells, double multiplies (never
    // int64 products), Woolf interval in the same operation order
    "q_odds_ratio" ->
      """WITH a AS (SELECT
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem),
        |f AS (SELECT *,
        |    CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS orat,
        |    sqrt(CAST(1.0 AS DOUBLE) / a + CAST(1.0 AS DOUBLE) / b
        |      + CAST(1.0 AS DOUBLE) / c + CAST(1.0 AS DOUBLE) / d) AS se
        |  FROM a)
        |SELECT a, b, c, d,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
        |    THEN round(orat, 6) END AS odds_ratio,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(ln(orat) - CAST(1.959964 AS DOUBLE) * se), 6)
        |  END AS ci_lo,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(ln(orat) + CAST(1.959964 AS DOUBLE) * se), 6)
        |  END AS ci_hi
        |FROM f""".stripMargin,


    // Tukey truth: per-group exact decimal moments, round-6 SSE terms
    // into an exact decimal sum, same closing expression order
    "q_tukey_hsd" ->
      """WITH g AS (SELECT l_returnflag AS grp,
        |    CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS s2
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot,
        |    CAST(count(*) AS BIGINT) AS k,
        |    SUM(CAST(round(CAST(n * s2 - CAST(s * s AS DECIMAL(38,4))
        |      AS DOUBLE) / n, 6) AS DECIMAL(28,6))) AS sse
        |  FROM g),
        |m AS (SELECT CAST(sse AS DOUBLE) / CAST(ntot - k AS DOUBLE)
        |    AS mse FROM t),
        |p AS (SELECT a.grp AS g1, b.grp AS g2, a.n AS n1, b.n AS n2,
        |    CAST(b.s AS DOUBLE) / b.n - CAST(a.s AS DOUBLE) / a.n AS d,
        |    m.mse
        |  FROM g a, g b, m WHERE a.grp < b.grp)
        |SELECT g1, g2, n1, n2, round(d, 6) AS mean_diff,
        |  CASE WHEN mse > 0 THEN round(abs(d) / sqrt(mse
        |    / CAST(2.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE) / n1
        |    + CAST(1.0 AS DOUBLE) / n2)), 6) END AS q
        |FROM p ORDER BY g1, g2""".stripMargin,


    // Cronbach truth: one fold of exact decimal moments per item and
    // for the row total, fixed-order item-variance sum
    "q_cronbach" ->
      """WITH it AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS i0,
        |    CAST(l_discount * 100 AS DECIMAL(18,2)) AS i1,
        |    CAST(l_tax * 100 AS DECIMAL(18,2)) AS i2 FROM lineitem),
        |w AS (SELECT *, CAST(i0 + i1 + i2 AS DECIMAL(38,4)) AS tt
        |  FROM it WHERE i0 IS NOT NULL AND i1 IS NOT NULL
        |    AND i2 IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(i0) AS s0, SUM(CAST(i0 * i0 AS DECIMAL(38,4))) AS q0,
        |    SUM(i1) AS s1, SUM(CAST(i1 * i1 AS DECIMAL(38,4))) AS q1,
        |    SUM(i2) AS s2, SUM(CAST(i2 * i2 AS DECIMAL(38,4))) AS q2,
        |    SUM(tt) AS st, SUM(CAST(tt * tt AS DECIMAL(38,8))) AS qt
        |  FROM w),
        |v AS (SELECT n,
        |    CAST(n * q0 - CAST(s0 * s0 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v0,
        |    CAST(n * q1 - CAST(s1 * s1 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v1,
        |    CAST(n * q2 - CAST(s2 * s2 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v2,
        |    CAST(n * qt - CAST(st * st AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vt
        |  FROM a)
        |SELECT n, 3 AS k, round(v0 + v1 + v2, 6) AS sum_item_var,
        |  round(vt, 6) AS total_var,
        |  CASE WHEN n >= 2 AND vt > 0 THEN round(CAST(1.5 AS DOUBLE)
        |    * (CAST(1.0 AS DOUBLE) - (v0 + v1 + v2) / vt), 6)
        |  END AS alpha
        |FROM v""".stripMargin,


    // Theil truth: same positive filter, per-row 9 dp terms into an
    // exact decimal sum, one closing division
    "q_theil_index" ->
      """WITH r AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(v) AS s
        |  FROM r WHERE v > 0),
        |dr AS (SELECT CAST(SUM(CASE WHEN v <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped FROM r),
        |mu AS (SELECT n, CAST(s AS DOUBLE) / n AS m FROM t),
        |tm AS (SELECT SUM(CAST(round((CAST(v AS DOUBLE) / mu.m)
        |    * ln(CAST(v AS DOUBLE) / mu.m), 9) AS DECIMAL(28,9))) AS ts
        |  FROM r, mu WHERE v > 0)
        |SELECT mu.n AS n, dr.n_dropped, round(mu.m, 6) AS mean,
        |  round(CAST(tm.ts AS DOUBLE) / mu.n, 6) AS theil_t
        |FROM mu, dr, tm""".stripMargin,


    // capture–recapture truth: same midpoint split, Chapman estimator
    // and Seber variance in the same operation order
    "q_capture_recapture" ->
      """WITH sp AS (SELECT
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS lo,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS hi
        |  FROM events WHERE ts IS NOT NULL),
        |u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND d <= (SELECT (lo + hi) // 2 FROM sp)
        |      THEN 1 ELSE 0 END) AS c1,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND d > (SELECT (lo + hi) // 2 FROM sp)
        |      THEN 1 ELSE 0 END) AS c2
        |  FROM (SELECT user_id, event_type,
        |      date_diff('day', DATE '1970-01-01',
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        |    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        |  GROUP BY 1),
        |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(c1 * c2) AS BIGINT) AS m FROM u),
        |f AS (SELECT *,
        |    (CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
        |      / (CAST(m AS DOUBLE) + 1) - CAST(1.0 AS DOUBLE) AS nhat,
        |    sqrt((CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
        |      * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
        |      * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
        |      / ((CAST(m AS DOUBLE) + 1) * (CAST(m AS DOUBLE) + 1)
        |        * (CAST(m AS DOUBLE) + 2))) AS se
        |  FROM a)
        |SELECT n1, n2, m,
        |  CASE WHEN m > 0 THEN round(nhat, 6) END AS n_hat,
        |  CASE WHEN m > 0 THEN round(se, 6) END AS se,
        |  CASE WHEN m > 0 THEN round(nhat - CAST(1.959964 AS DOUBLE)
        |    * se, 6) END AS ci_lo,
        |  CASE WHEN m > 0 THEN round(nhat + CAST(1.959964 AS DOUBLE)
        |    * se, 6) END AS ci_hi
        |FROM f""".stripMargin,


    // mean-excess truth: same decimal grid, conditional exact sums,
    // one rounded division per threshold
    "q_mean_excess" ->
      """WITH v AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |g AS (SELECT unnest([CAST(0 AS DECIMAL(18,2)),
        |    CAST(2500 AS DECIMAL(18,2)), CAST(5000 AS DECIMAL(18,2)),
        |    CAST(7500 AS DECIMAL(18,2)),
        |    CAST(9000 AS DECIMAL(18,2))]) AS u),
        |a AS (SELECT u,
        |    CAST(SUM(CASE WHEN v > u THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_exceed,
        |    SUM(CASE WHEN v > u THEN CAST(v - u AS DECIMAL(18,2)) END)
        |      AS s
        |  FROM v, g GROUP BY 1)
        |SELECT CAST(u AS DOUBLE) AS threshold, n_exceed,
        |  CASE WHEN n_exceed > 0
        |    THEN round(CAST(s AS DOUBLE) / n_exceed, 6) END AS mean_excess
        |FROM a ORDER BY threshold""".stripMargin,


    // one-sample-KS truth: distinct-value CDF in exact integers, the
    // uniform CDF clamped to [0, 1] outside the support (out-of-range
    // mass enters the empirical CDF and is counted, never dropped)
    "q_ks_uniform" ->
      """WITH c AS (SELECT CAST(l_discount AS DECIMAL(18,6)) AS v,
        |    count(*) AS cc
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT v, cc, SUM(cc) OVER (ORDER BY v) AS cum,
        |    SUM(cc) OVER () AS n FROM c),
        |s AS (SELECT CAST(n AS BIGINT) AS n,
        |    CAST(cum AS DOUBLE) / n - least(greatest((CAST(v AS DOUBLE)
        |      - CAST(0.0 AS DOUBLE)) / CAST(0.1 AS DOUBLE), 0.0), 1.0)
        |      AS dp,
        |    least(greatest((CAST(v AS DOUBLE) - CAST(0.0 AS DOUBLE))
        |      / CAST(0.1 AS DOUBLE), 0.0), 1.0)
        |      - CAST(cum - cc AS DOUBLE) / n AS dm,
        |    CASE WHEN v < 0 OR v > 0.1 THEN cc ELSE 0 END AS oor
        |  FROM w),
        |f AS (SELECT first(n) AS n, round(max(dp), 6) AS d_plus,
        |    round(max(dm), 6) AS d_minus,
        |    CAST(sum(oor) AS BIGINT) AS n_out_of_range FROM s)
        |SELECT n, d_plus, d_minus, n_out_of_range,
        |  greatest(d_plus, d_minus) AS d,
        |  round(sqrt(CAST(n AS DOUBLE))
        |    * greatest(d_plus, d_minus), 6) AS sqrt_n_d
        |FROM f""".stripMargin,


    // Friedman truth: complete blocks, doubled within-block midranks
    // (RANGE cumulative count = through-tie count), exact integer
    // statistic with one closing division
    "q_friedman" ->
      """WITH cells0 AS (SELECT user_id AS b, event_type AS t,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT t) AS k FROM cells0),
        |comp AS (SELECT b FROM cells0 GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |cells AS (SELECT c.* FROM cells0 c JOIN comp USING (b)),
        |r AS (SELECT b, t,
        |    count(*) OVER (PARTITION BY b, v) AS tie,
        |    count(*) OVER (PARTITION BY b ORDER BY v) AS maxcum
        |  FROM cells),
        |r2 AS (SELECT b, t, (maxcum - tie) * 2 + tie + 1 AS rr FROM r),
        |pt AS (SELECT t, CAST(SUM(rr) AS BIGINT) AS rsum FROM r2
        |  GROUP BY 1),
        |a AS (SELECT SUM(CAST(rr AS HUGEINT) * rr) AS a4,
        |    CAST(count(*) / (SELECT k FROM kk) AS BIGINT) AS n FROM r2),
        |f AS (SELECT a.n AS n_blocks, (SELECT k FROM kk) AS k, a.a4,
        |    (SELECT SUM(CAST(rsum - a.n * ((SELECT k FROM kk) + 1)
        |        AS HUGEINT) * (rsum - a.n * ((SELECT k FROM kk) + 1)))
        |      FROM pt) AS snum
        |  FROM a)
        |SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
        |  CAST(k AS BIGINT) AS k,
        |  CASE WHEN CAST(a4 - CAST(n_blocks AS HUGEINT) * k * (k + 1)
        |      * (k + 1) AS DOUBLE) > 0
        |    THEN round(CAST(k - 1 AS DOUBLE) * CAST(snum AS DOUBLE)
        |      / CAST(a4 - CAST(n_blocks AS HUGEINT) * k * (k + 1)
        |        * (k + 1) AS DOUBLE), 6) END AS chi2
        |FROM f""".stripMargin,


    // Cochran-Q truth: per-cell any-success flags, exact integer G/L
    // folds, one closing division
    "q_cochran_q" ->
      """WITH cells0 AS (SELECT user_id AS b, event_type AS t,
        |    max(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT t) AS k FROM cells0),
        |comp AS (SELECT b FROM cells0 GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |cells AS (SELECT c.* FROM cells0 c JOIN comp USING (b)),
        |bl AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(l) AS BIGINT) AS sl,
        |    SUM(CAST(l AS HUGEINT) * l) AS sl2
        |  FROM (SELECT b, SUM(y) AS l FROM cells GROUP BY 1)),
        |tr AS (SELECT CAST(SUM(g) AS BIGINT) AS sg,
        |    SUM(CAST(g AS HUGEINT) * g) AS sg2
        |  FROM (SELECT t, SUM(y) AS g FROM cells GROUP BY 1)),
        |f AS (SELECT bl.n_blocks, (SELECT k FROM kk) AS k,
        |    CAST((SELECT k FROM kk) - 1 AS HUGEINT)
        |      * ((SELECT k FROM kk) * tr.sg2
        |        - CAST(tr.sg AS HUGEINT) * tr.sg) AS qnum,
        |    CAST((SELECT k FROM kk) AS HUGEINT) * bl.sl - bl.sl2 AS qden
        |  FROM bl, tr)
        |SELECT n_blocks, CAST(k AS BIGINT) AS k,
        |  CASE WHEN CAST(qden AS DOUBLE) > 0
        |    THEN round(CAST(qnum AS DOUBLE) / CAST(qden AS DOUBLE), 6)
        |  END AS q
        |FROM f""".stripMargin,


    // ESS truth: exact decimal weight sums, two rounded divisions
    "q_ess" ->
      """WITH w AS (SELECT CAST(value AS DECIMAL(18,6)) AS w FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN w <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dropped,
        |    SUM(CASE WHEN w > 0 THEN w END) AS sw,
        |    SUM(CASE WHEN w > 0
        |      THEN CAST(w * w AS DECIMAL(38,12)) END) AS sw2
        |  FROM w)
        |SELECT n, n_dropped,
        |  CASE WHEN n > 0 THEN round(CAST(sw AS DOUBLE)
        |    * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE), 6) END AS ess,
        |  CASE WHEN n > 0 THEN round(CAST(sw AS DOUBLE)
        |    * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE) / n, 6)
        |  END AS ess_ratio
        |FROM a""".stripMargin,


    // ECE truth: same equal-width bins, 6 dp gap terms into an exact
    // decimal sum, one closing division
    "q_ece" ->
      """WITH b AS (SELECT least(CAST(floor(
        |      CAST(l_discount * 10 AS DECIMAL(9,6)) * 10) AS BIGINT),
        |      9) AS bin,
        |    CAST(l_discount * 10 AS DECIMAL(9,6)) AS s,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem
        |  WHERE CAST(l_discount * 10 AS DECIMAL(9,6)) IS NOT NULL),
        |g AS (SELECT bin, count(*) AS n, SUM(y) AS p, SUM(s) AS c
        |  FROM b GROUP BY 1),
        |t AS (SELECT n,
        |    abs(CAST(p AS DOUBLE) / n - CAST(c AS DOUBLE) / n) AS gap
        |  FROM g)
        |SELECT CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  round(CAST(SUM(CAST(round(gap * n, 6) AS DECIMAL(28,6)))
        |    AS DOUBLE) / SUM(n), 6) AS ece,
        |  max(round(gap, 6)) AS mce
        |FROM t""".stripMargin,


    // ICC truth: per-block exact decimal moments, 6 dp between/within
    // terms into exact decimal sums, k0-corrected closing expression
    "q_icc" ->
      """WITH per AS (SELECT l_orderkey AS b,
        |    CAST(count(*) AS BIGINT) AS ni,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS si,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS qi
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(ni) AS BIGINT) AS n_ratings, SUM(si) AS s,
        |    SUM(CAST(ni AS HUGEINT) * ni) AS n2,
        |    SUM(CAST(round(CAST(qi AS DOUBLE)
        |      - CAST(CAST(si * si AS DECIMAL(38,4)) AS DOUBLE) / ni, 6)
        |      AS DECIMAL(28,6))) AS ssw,
        |    SUM(CAST(round(CAST(CAST(si * si AS DECIMAL(38,4))
        |      AS DOUBLE) / ni, 6) AS DECIMAL(28,6))) AS sb
        |  FROM per),
        |f AS (SELECT *,
        |    (CAST(sb AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n_ratings AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS msb,
        |    CAST(ssw AS DOUBLE) / (CAST(n_ratings AS DOUBLE)
        |      - CAST(n_blocks AS DOUBLE)) AS msw,
        |    (CAST(n_ratings AS DOUBLE) - CAST(n2 AS DOUBLE)
        |      / CAST(n_ratings AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS k0
        |  FROM a)
        |SELECT n_blocks, n_ratings,
        |  CASE WHEN n_blocks >= 2 THEN round(msb, 6) END AS msb,
        |  CASE WHEN n_ratings > n_blocks THEN round(msw, 6) END AS msw,
        |  CASE WHEN n_blocks >= 2 AND n_ratings > n_blocks
        |    AND abs(msb + (k0 - CAST(1.0 AS DOUBLE)) * msw) > 0.0
        |    THEN round((msb - msw)
        |      / (msb + (k0 - CAST(1.0 AS DOUBLE)) * msw), 6) END AS icc1
        |FROM f""".stripMargin,


    // runs-test truth: same daily series, lag sign changes, exact
    // integer counts into the closing fixed-order doubles
    "q_runs_test" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    count(*) AS c
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT d, CASE WHEN c >= 333 THEN 1 ELSE 0 END AS sg,
        |    lag(CASE WHEN c >= 333 THEN 1 ELSE 0 END)
        |      OVER (ORDER BY d) AS pv
        |  FROM d),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(SUM(CASE WHEN pv IS NOT NULL AND pv <> sg THEN 1
        |      ELSE 0 END) + 1 AS BIGINT) AS runs
        |  FROM s),
        |f AS (SELECT *,
        |    CAST(2.0 AS DOUBLE) * n1 * n0 / (CAST(n1 AS DOUBLE) + n0)
        |      + CAST(1.0 AS DOUBLE) AS mu,
        |    CAST(2.0 AS DOUBLE) * n1 * n0 * (CAST(2.0 AS DOUBLE) * n1
        |      * n0 - (CAST(n1 AS DOUBLE) + n0))
        |      / ((CAST(n1 AS DOUBLE) + n0) * (CAST(n1 AS DOUBLE) + n0)
        |        * ((CAST(n1 AS DOUBLE) + n0) - CAST(1.0 AS DOUBLE)))
        |      AS sig2
        |  FROM a)
        |SELECT n1, n0, runs,
        |  CASE WHEN n1 > 0 AND n0 > 0 THEN round(mu, 6) END
        |    AS expected_runs,
        |  CASE WHEN n1 > 0 AND n0 > 0 AND sig2 > 0
        |    THEN round((CAST(runs AS DOUBLE) - mu) / sqrt(sig2), 6)
        |  END AS z
        |FROM f""".stripMargin,


    // median-CI truth: same exact-decimal point ranks, same normal-
    // approximated band ranks, order stats off one cumulative window
    "q_median_ci" ->
      """WITH c AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v,
        |    count(*) AS cc
        |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM c),
        |r AS (SELECT g.n,
        |    greatest(1, least(g.n, CAST(ceil(CAST(0.5 AS DECIMAL(3,2))
        |      * g.n) AS BIGINT))) AS k1,
        |    greatest(1, least(g.n, CAST(floor(CAST(0.5 AS DECIMAL(3,2))
        |      * g.n + 1) AS BIGINT))) AS k2,
        |    greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * g.n
        |      - sqrt(g.n * CAST(0.5 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |        - CAST(0.5 AS DOUBLE))) * CAST(1.959964 AS DOUBLE))
        |      AS BIGINT)) AS lo,
        |    least(g.n, CAST(ceil(CAST(0.5 AS DOUBLE) * g.n
        |      + sqrt(g.n * CAST(0.5 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |        - CAST(0.5 AS DOUBLE))) * CAST(1.959964 AS DOUBLE))
        |      AS BIGINT)) AS hi
        |  FROM g),
        |w AS (SELECT v, SUM(cc) OVER (ORDER BY v) AS cw FROM c),
        |s AS (SELECT r.n, r.lo, r.hi,
        |    MIN(CASE WHEN cw >= r.k1 THEN v END) AS p1,
        |    MIN(CASE WHEN cw >= r.k2 THEN v END) AS p2,
        |    MIN(CASE WHEN cw >= r.lo THEN v END) AS vlo,
        |    MIN(CASE WHEN cw >= r.hi THEN v END) AS vhi
        |  FROM w, r GROUP BY 1, 2, 3)
        |SELECT n, CAST(0.5 AS DOUBLE) AS q,
        |  round((CAST(p1 AS DOUBLE) + CAST(p2 AS DOUBLE)) / 2.0, 6)
        |    AS point,
        |  lo AS lo_rank, hi AS hi_rank,
        |  CAST(vlo AS DOUBLE) AS ci_lo, CAST(vhi AS DOUBLE) AS ci_hi
        |FROM s""".stripMargin,


    // Jarque–Bera truth: one pass of exact decimal power sums, central
    // moments and the statistic in the same operation order
    "q_jarque_bera" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s1,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS s2,
        |    SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6)))
        |      AS s3,
        |    SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      * CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      AS DECIMAL(38,8))) AS s4
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |m AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM a),
        |cm AS (SELECT n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - CAST(3.0 AS DOUBLE) * mu * r2
        |      + CAST(2.0 AS DOUBLE) * mu * mu * mu AS m3,
        |    r4 - CAST(4.0 AS DOUBLE) * mu * r3
        |      + CAST(6.0 AS DOUBLE) * mu * mu * r2
        |      - CAST(3.0 AS DOUBLE) * mu * mu * mu * mu AS m4
        |  FROM m),
        |f AS (SELECT n, m2, m3 / sqrt(m2 * m2 * m2) AS sk,
        |    m4 / (m2 * m2) - CAST(3.0 AS DOUBLE) AS ku
        |  FROM cm)
        |SELECT n,
        |  CASE WHEN m2 > 0 THEN round(sk, 6) END AS skewness,
        |  CASE WHEN m2 > 0 THEN round(ku, 6) END AS ex_kurtosis,
        |  CASE WHEN m2 > 0 AND n >= 4 THEN
        |    round(CAST(n AS DOUBLE) / CAST(6.0 AS DOUBLE)
        |      * (sk * sk + ku * ku / CAST(4.0 AS DOUBLE)), 6) END AS jb
        |FROM f""".stripMargin,


    // Ljung–Box truth: the acf oracle's r_k rolled up with 9 dp terms
    "q_ljung_box" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(v) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |l AS (SELECT CAST(gs AS BIGINT) AS lag
        |  FROM generate_series(1, 5) AS t2(gs)),
        |pr AS (SELECT l.lag, count(*) AS n_pairs,
        |    CAST(SUM(a.v) AS DOUBLE) AS sa, CAST(SUM(b.v) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) AS pp
        |  FROM d a JOIN l ON true JOIN d b ON b.t = a.t + l.lag
        |  GROUP BY 1),
        |r AS (SELECT lag,
        |    CASE WHEN p - s * s / n > 0.0 THEN
        |      round((pp - s / n * (sa + sb) + n_pairs * (s / n) * (s / n))
        |        / (p - s * s / n), 6)
        |    END AS r
        |  FROM pr, g),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |t AS (SELECT SUM(CAST(round(r * r / (nn.n - lag), 9)
        |      AS DECIMAL(28,9))) AS ts, CAST(count(*) AS BIGINT) AS nr
        |  FROM r, nn WHERE r IS NOT NULL)
        |SELECT nn.n, CAST(5 AS BIGINT) AS max_lag,
        |  CASE WHEN t.nr >= 5 THEN round(CAST(nn.n AS DOUBLE)
        |    * (nn.n + 2) * CAST(t.ts AS DOUBLE), 6) END AS q_stat
        |FROM nn, t""".stripMargin,


    // best-split truth: distinct-value CDF, the same 9 dp weighted-
    // impurity expression, argmin with the smaller-split tie-break
    "q_best_split" ->
      """WITH c AS (SELECT CAST(l_discount AS DOUBLE) AS v,
        |    count(*) AS cc,
        |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pp
        |  FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(SUM(cc) AS BIGINT) AS n,
        |    CAST(SUM(pp) AS BIGINT) AS p FROM c),
        |w AS (SELECT v, CAST(SUM(cc) OVER (ORDER BY v) AS BIGINT) AS nl,
        |    CAST(SUM(pp) OVER (ORDER BY v) AS BIGINT) AS pl FROM c),
        |s AS (SELECT v, nl, round(
        |    CAST(nl AS DOUBLE) / g.n * (CAST(1.0 AS DOUBLE)
        |      - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
        |      - (CAST(1.0 AS DOUBLE) - CAST(pl AS DOUBLE) / nl)
        |        * (CAST(1.0 AS DOUBLE) - CAST(pl AS DOUBLE) / nl))
        |    + CAST(g.n - nl AS DOUBLE) / g.n * (CAST(1.0 AS DOUBLE)
        |      - (CAST(g.p - pl AS DOUBLE) / (g.n - nl))
        |        * (CAST(g.p - pl AS DOUBLE) / (g.n - nl))
        |      - (CAST(1.0 AS DOUBLE) - CAST(g.p - pl AS DOUBLE)
        |          / (g.n - nl))
        |        * (CAST(1.0 AS DOUBLE) - CAST(g.p - pl AS DOUBLE)
        |          / (g.n - nl))), 9) AS gini
        |  FROM w, g WHERE nl < g.n),
        |f AS (SELECT v AS split_value, nl AS n_left, gini AS gini_split
        |  FROM s ORDER BY gini, v LIMIT 1),
        |b AS (SELECT n, round(CAST(1.0 AS DOUBLE)
        |    - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
        |    - (CAST(1.0 AS DOUBLE) - CAST(p AS DOUBLE) / n)
        |      * (CAST(1.0 AS DOUBLE) - CAST(p AS DOUBLE) / n), 9)
        |    AS gini_base FROM g)
        |SELECT f.split_value, f.n_left, b.n - f.n_left AS n_right,
        |  f.gini_split, b.gini_base,
        |  round(b.gini_base - f.gini_split, 9) AS gini_gain
        |FROM f, b""".stripMargin,


    // EB-shrinkage truth: 9 dp group rates with exact decimal moments
    // (width-18 operands so the square stays decimal), MoM prior and
    // shrunk rates in the same operation order
    "q_eb_shrinkage" ->
      """WITH g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pos
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |r AS (SELECT CAST(round(CAST(pos AS DOUBLE) / n, 9)
        |    AS DECIMAL(18,9)) AS r FROM g),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS k, SUM(r) AS sr,
        |    SUM(r * r) AS sr2 FROM r),
        |pr AS (SELECT k,
        |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS m,
        |    CAST(k * sr2 - sr * sr AS DOUBLE)
        |      / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v
        |  FROM mom),
        |p2 AS (SELECT k AS n_groups, round(m, 6) AS prior_mean,
        |    CASE WHEN k >= 2 AND v > 0
        |      AND m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE) > 0
        |      THEN round((m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE)) * m, 6) END AS alpha,
        |    CASE WHEN k >= 2 AND v > 0
        |      AND m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE) > 0
        |      THEN round((m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE))
        |        * (CAST(1.0 AS DOUBLE) - m), 6) END AS beta
        |  FROM pr)
        |SELECT g.grp, g.n, g.pos,
        |  round(CAST(g.pos AS DOUBLE) / g.n, 6) AS raw_rate,
        |  p2.n_groups, p2.prior_mean, p2.alpha, p2.beta,
        |  round((CAST(g.pos AS DOUBLE) + p2.alpha)
        |    / (CAST(g.n AS DOUBLE) + p2.alpha + p2.beta), 6)
        |    AS shrunk_rate
        |FROM g, p2 ORDER BY g.grp""".stripMargin,


    // MH/CMH truth: per-stratum cells, 9 dp term sums, fixed-order
    // closing ratio and chi2
    "q_mantel_haenszel" ->
      """WITH c AS (SELECT CAST(year(CAST(l_shipdate AS TIMESTAMP))
        |      AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT *, CAST(a + b + cc + d AS DOUBLE) AS n FROM c
        |  WHERE a + b + cc + d > 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(a) AS BIGINT) AS sa,
        |    SUM(CAST(round(CAST(a AS DOUBLE) * d / n, 9)
        |      AS DECIMAL(28,9))) AS ad,
        |    SUM(CAST(round(CAST(b AS DOUBLE) * cc / n, 9)
        |      AS DECIMAL(28,9))) AS bc,
        |    SUM(CAST(round(CAST(a + b AS DOUBLE) * (a + cc) / n, 9)
        |      AS DECIMAL(28,9))) AS e,
        |    SUM(CAST(round(CAST(a + b AS DOUBLE) * (cc + d) * (a + cc)
        |      * (b + d) / (n * n * (n - CAST(1.0 AS DOUBLE))), 9)
        |      AS DECIMAL(28,9))) AS v
        |  FROM t)
        |SELECT n_strata,
        |  CASE WHEN CAST(bc AS DOUBLE) > 0 THEN
        |    round(CAST(ad AS DOUBLE) / CAST(bc AS DOUBLE), 6)
        |  END AS or_mh,
        |  CASE WHEN CAST(v AS DOUBLE) > 0 THEN
        |    round((CAST(sa AS DOUBLE) - CAST(e AS DOUBLE))
        |      * (CAST(sa AS DOUBLE) - CAST(e AS DOUBLE))
        |      / CAST(v AS DOUBLE), 6) END AS chi2_cmh
        |FROM s2""".stripMargin,


    // Cochran–Armitage truth: integral dose codes, exact integer
    // sums, same closing contrast
    "q_cochran_armitage" ->
      """WITH g AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT)
        |      AS s,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS r,
        |    SUM(CAST(s AS HUGEINT) * g.r) AS sr,
        |    SUM(CAST(s AS HUGEINT) * g.n) AS sn,
        |    SUM(CAST(s AS HUGEINT) * s * g.n) AS s2n
        |  FROM g),
        |f AS (SELECT *, CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pbar
        |  FROM a),
        |z AS (SELECT *,
        |    CAST(sr AS DOUBLE) - pbar * CAST(sn AS DOUBLE) AS t,
        |    pbar * (CAST(1.0 AS DOUBLE) - pbar)
        |      * (CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE)
        |        * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)) AS vt
        |  FROM f)
        |SELECT n_groups, n, r, round(pbar, 6) AS p_bar,
        |  CASE WHEN vt > 0 THEN round(t / sqrt(vt), 6) END AS z
        |FROM z""".stripMargin,


    // partial-correlation truth: the corr-matrix oracle's three 6 dp
    // coefficients closed with the same fixed-order expression
    "q_partial_corr" ->
      """WITH c0 AS (SELECT CAST(l_quantity AS DECIMAL(19,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(19,2)) AS e,
        |    CAST(l_discount AS DECIMAL(19,2)) AS d
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |  CAST(SUM(q) AS DOUBLE) AS s_q, CAST(SUM(e) AS DOUBLE) AS s_e,
        |  CAST(SUM(d) AS DOUBLE) AS s_d,
        |  CAST(SUM(q * q) AS DOUBLE) AS p_qq,
        |  CAST(SUM(q * e) AS DOUBLE) AS p_qe,
        |  CAST(SUM(q * d) AS DOUBLE) AS p_qd,
        |  CAST(SUM(e * e) AS DOUBLE) AS p_ee,
        |  CAST(SUM(e * d) AS DOUBLE) AS p_ed,
        |  CAST(SUM(d * d) AS DOUBLE) AS p_dd
        |  FROM c0),
        |r AS (SELECT CAST(n AS BIGINT) AS n,
        |  round((n * p_qe - s_q * s_e) / (sqrt(n * p_qq - s_q * s_q)
        |    * sqrt(n * p_ee - s_e * s_e)), 6) AS rxy,
        |  round((n * p_qd - s_q * s_d) / (sqrt(n * p_qq - s_q * s_q)
        |    * sqrt(n * p_dd - s_d * s_d)), 6) AS rxz,
        |  round((n * p_ed - s_e * s_d) / (sqrt(n * p_ee - s_e * s_e)
        |    * sqrt(n * p_dd - s_d * s_d)), 6) AS ryz
        |  FROM m)
        |SELECT n, rxy AS r_xy, rxz AS r_xz, ryz AS r_yz,
        |  CASE WHEN abs(rxz) < 1.0 AND abs(ryz) < 1.0 THEN
        |    round((rxy - rxz * ryz) / sqrt((CAST(1.0 AS DOUBLE)
        |      - rxz * rxz) * (CAST(1.0 AS DOUBLE) - ryz * ryz)), 6)
        |  END AS r_partial
        |FROM r""".stripMargin,


    // Hill truth: the same top-(k+1) multiset, 9 dp log terms into an
    // exact decimal sum
    "q_hill_alpha" ->
      """WITH t AS (SELECT CAST(c_acctbal AS DOUBLE) AS v FROM customer
        |  WHERE c_acctbal IS NOT NULL AND CAST(c_acctbal AS DOUBLE) > 0
        |  ORDER BY v DESC LIMIT 101),
        |k1 AS (SELECT min(v) AS xk1 FROM t),
        |s AS (SELECT SUM(CAST(round(ln(v / (SELECT xk1 FROM k1)), 9)
        |      AS DECIMAL(28,9))) AS ls
        |  FROM (SELECT v FROM t ORDER BY v DESC LIMIT 100))
        |SELECT CAST(100 AS BIGINT) AS k,
        |  (SELECT xk1 FROM k1) AS x_threshold,
        |  CASE WHEN CAST(s.ls AS DOUBLE) > 0 THEN
        |    round(CAST(100.0 AS DOUBLE) / CAST(s.ls AS DOUBLE), 6)
        |  END AS alpha
        |FROM s""".stripMargin,


    // BY truth: the bh_fdr oracle chain with the 9 dp harmonic factor
    "q_by_fdr" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR)
        |      AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |dd AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0),
        |ks AS (SELECT segment, n1, n2, d,
        |    round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |      (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |  FROM dd),
        |pc AS (SELECT p_approx AS p, count(*) AS n FROM ks GROUP BY 1),
        |w2 AS (SELECT p, CAST(SUM(n) OVER (ORDER BY p) AS BIGINT) AS i,
        |    CAST(SUM(n) OVER () AS BIGINT) AS m FROM pc),
        |mm AS (SELECT CAST(MAX(m) AS BIGINT) AS m FROM w2),
        |h AS (SELECT CAST(SUM(CAST(round(CAST(1.0 AS DOUBLE) / gs, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS hm
        |  FROM generate_series(1, 100000) AS g(gs), mm
        |  WHERE gs <= mm.m),
        |rw AS (SELECT p, p * CAST(m AS DOUBLE) * (SELECT hm FROM h) / i
        |    AS raw FROM w2),
        |ad AS (SELECT p, round(least(CAST(1 AS DOUBLE),
        |    MIN(raw) OVER (ORDER BY p DESC)), 6) AS p_adj FROM rw)
        |SELECT ks.segment, ks.n1, ks.n2, ks.d, ks.p_approx, ad.p_adj,
        |  ad.p_adj <= 0.05 AS reject
        |FROM ks JOIN ad ON ks.p_approx = ad.p
        |ORDER BY segment""".stripMargin,


    // Wilcoxon truth: distinct-|d| cells, doubled midranks, exact tie
    // cubes, same closing normal approximation
    "q_wilcoxon_signed" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchases,
        |    sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS x
        |  FROM events GROUP BY 1),
        |d AS (SELECT CAST(CAST(purchases AS DECIMAL(18,2))
        |    - CAST(x AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS dd FROM pu),
        |z0 AS (SELECT CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_zero FROM d),
        |c AS (SELECT abs(dd) AS a,
        |    SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cp,
        |    count(*) AS cc
        |  FROM d WHERE dd <> 0 GROUP BY 1),
        |w AS (SELECT cp, cc, SUM(cc) OVER (ORDER BY a) - cc AS bef
        |  FROM c),
        |a AS (SELECT
        |    SUM(CAST(cp AS HUGEINT) * (2 * bef + cc + 1)) AS w2,
        |    SUM(CAST(cc AS HUGEINT) * cc * cc - cc) AS ties,
        |    CAST(SUM(cc) AS BIGINT) AS n_pairs FROM w),
        |f AS (SELECT n_pairs,
        |    CAST(w2 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS wp,
        |    CAST(n_pairs AS DOUBLE) AS nd,
        |    CAST(ties AS DOUBLE) AS td FROM a),
        |g AS (SELECT *,
        |    nd * (nd + CAST(1.0 AS DOUBLE)) / CAST(4.0 AS DOUBLE) AS mu,
        |    nd * (nd + CAST(1.0 AS DOUBLE)) * (CAST(2.0 AS DOUBLE) * nd
        |      + CAST(1.0 AS DOUBLE)) / CAST(24.0 AS DOUBLE)
        |      - td / CAST(48.0 AS DOUBLE) AS sig2
        |  FROM f)
        |SELECT g.n_pairs, z0.n_zero, round(g.wp, 6) AS w_plus,
        |  CASE WHEN g.n_pairs >= 1 AND g.sig2 > 0
        |    THEN round((g.wp - g.mu) / sqrt(g.sig2), 6) END AS z
        |FROM g, z0""".stripMargin,


    // weighted-kappa truth: bounded cell/margin tables, code-distance
    // weights over the observed span, 9 dp terms, same closing ratio
    "q_weighted_kappa" ->
      """WITH r0 AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT)
        |      AS i,
        |    CAST(round(l_tax * 100, 0) AS BIGINT) AS j
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |c AS (SELECT i, j, CAST(count(*) AS BIGINT) AS cc
        |  FROM r0 GROUP BY 1, 2),
        |sp AS (SELECT CAST(max(k) - min(k) AS DOUBLE) AS span,
        |    CAST(count(*) AS BIGINT) AS nc
        |  FROM (SELECT i AS k FROM c UNION SELECT j FROM c)),
        |nn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM c),
        |po AS (SELECT CAST(SUM(CAST(round((CAST(1.0 AS DOUBLE)
        |      - CAST(abs(i - j) AS DOUBLE) / sp.span) * cc, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS po_s FROM c, sp),
        |ri AS (SELECT i, CAST(SUM(cc) AS BIGINT) AS ri FROM c
        |  GROUP BY 1),
        |cj AS (SELECT j, CAST(SUM(cc) AS BIGINT) AS cj FROM c
        |  GROUP BY 1),
        |pe AS (SELECT CAST(SUM(CAST(round((CAST(1.0 AS DOUBLE)
        |      - CAST(abs(ri.i - cj.j) AS DOUBLE) / sp.span)
        |      * (CAST(ri.ri AS DOUBLE) * cj.cj), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS pe_s FROM ri, cj, sp)
        |SELECT nn.n, sp.nc AS k,
        |  round(po.po_s / nn.n, 6) AS po_w,
        |  round(pe.pe_s / (CAST(nn.n AS DOUBLE) * nn.n), 6) AS pe_w,
        |  CASE WHEN pe.pe_s / (CAST(nn.n AS DOUBLE) * nn.n)
        |      < CAST(1.0 AS DOUBLE)
        |    THEN round((po.po_s / nn.n - pe.pe_s
        |        / (CAST(nn.n AS DOUBLE) * nn.n))
        |      / (CAST(1.0 AS DOUBLE) - pe.pe_s
        |        / (CAST(nn.n AS DOUBLE) * nn.n)), 6) END AS kappa_w
        |FROM nn, sp, po, pe""".stripMargin,


    // Gwet-AC1 truth: bounded cell/margin folds, 9 dp chance terms,
    // round-6 po/e before the closing ratio
    "q_gwet_ac1" ->
      """WITH c AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(count(*) AS BIGINT) AS cc
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |nn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN cc ELSE 0 END) AS BIGINT)
        |      AS agree FROM c),
        |ca AS (SELECT a AS q, CAST(SUM(cc) AS BIGINT) AS m FROM c
        |  GROUP BY 1),
        |cb AS (SELECT b AS q, CAST(SUM(cc) AS BIGINT) AS m FROM c
        |  GROUP BY 1),
        |cats AS (SELECT q, CAST(SUM(m) AS BIGINT) AS mm FROM
        |  (SELECT * FROM ca UNION ALL SELECT * FROM cb) GROUP BY 1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(round((CAST(mm AS DOUBLE)
        |      / (CAST(2.0 AS DOUBLE) * (SELECT n FROM nn)))
        |      * (CAST(1.0 AS DOUBLE) - CAST(mm AS DOUBLE)
        |        / (CAST(2.0 AS DOUBLE) * (SELECT n FROM nn))), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS esum
        |  FROM cats),
        |f AS (SELECT nn.n, kk.k,
        |    round(CAST(nn.agree AS DOUBLE) / nn.n, 6) AS po,
        |    round(kk.esum / (kk.k - 1), 6) AS e
        |  FROM nn, kk)
        |SELECT n, k, po, e AS pe_gwet,
        |  CASE WHEN e < CAST(1.0 AS DOUBLE) THEN
        |    round((po - e) / (CAST(1.0 AS DOUBLE) - e), 6) END AS ac1
        |FROM f""".stripMargin,


    // G-test truth: same cell/margin construction as the chi2 oracle,
    // 9 dp O*ln(O/E) terms into an exact decimal sum
    "q_g_test" ->
      """WITH r0 AS (SELECT event_type AS a,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS b
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM r0
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS raa FROM c GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cbb FROM c GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
        |dims AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
        |    CAST(count(DISTINCT b) AS BIGINT) AS cc FROM c),
        |t AS (SELECT CAST(SUM(CAST(round(CAST(o AS DOUBLE)
        |      * ln(CAST(o AS DOUBLE) / (CAST(raa AS DOUBLE) * cbb
        |        / (SELECT n FROM nn))), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS g2
        |  FROM c JOIN ra USING (a) JOIN cb USING (b))
        |SELECT nn.n, (dims.r - 1) * (dims.cc - 1) AS df,
        |  round(CAST(2.0 AS DOUBLE) * t.g2, 6) AS g
        |FROM nn, dims, t""".stripMargin,


    // confusion truth: four exact cells, double multiplies, the same
    // fixed-order closing expressions
    "q_confusion_stats" ->
      """WITH a AS (SELECT
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |      AND CAST(l_discount AS DOUBLE) >= CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R'
        |      AND CAST(l_discount AS DOUBLE) >= CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |      AND CAST(l_discount AS DOUBLE) < CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R'
        |      AND CAST(l_discount AS DOUBLE) < CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM lineitem WHERE l_discount IS NOT NULL),
        |f AS (SELECT *, CAST(tp AS DOUBLE) AS tpd,
        |    CAST(fp AS DOUBLE) AS fpd, CAST(fn AS DOUBLE) AS fnd,
        |    CAST(tn AS DOUBLE) AS tnd FROM a)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0
        |    THEN round(tpd / (tpd + fpd), 6) END AS precision,
        |  CASE WHEN tp + fn > 0
        |    THEN round(tpd / (tpd + fnd), 6) END AS recall,
        |  CASE WHEN tp * 2 + fp + fn > 0 THEN
        |    round(CAST(2.0 AS DOUBLE) * tpd
        |      / (CAST(2.0 AS DOUBLE) * tpd + fpd + fnd), 6) END AS f1,
        |  CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
        |    round((tpd / (tpd + fnd) + tnd / (tnd + fpd))
        |      / CAST(2.0 AS DOUBLE), 6) END AS balanced_accuracy,
        |  CASE WHEN sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd)
        |      * (tnd + fnd)) > 0 THEN
        |    round((tpd * tnd - fpd * fnd) / sqrt((tpd + fpd)
        |      * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)), 6)
        |  END AS mcc
        |FROM f""".stripMargin,


    // Benford truth: first digit from the same DECIMAL(18,6) rendering,
    // all 9 digits via generate_series, decimal-summed contributions
    "q_benford" ->
      """WITH v AS (SELECT CAST(regexp_extract(
        |      CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR),
        |      '[1-9]') AS INT) AS digit
        |  FROM lineitem
        |  WHERE TRY_CAST(l_extendedprice AS DECIMAL(18,6)) IS NOT NULL
        |    AND regexp_extract(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |      AS VARCHAR), '[1-9]') <> ''),
        |c AS (SELECT digit, count(*) AS observed FROM v GROUP BY 1),
        |t AS (SELECT SUM(observed) AS n FROM c),
        |s AS (SELECT g.digit,
        |    coalesce(c.observed, CAST(0 AS BIGINT)) AS observed,
        |    round(CAST(n AS DOUBLE)
        |      * log10(1.0 + CAST(1 AS DOUBLE) / g.digit), 6) AS expected
        |  FROM (SELECT CAST(gs AS INT) AS digit
        |      FROM generate_series(1, 9) AS t2(gs)) g
        |    LEFT JOIN c USING (digit), t),
        |sc AS (SELECT *,
        |    CASE WHEN expected > 0.0 THEN
        |      round((observed - expected) * (observed - expected) / expected, 6)
        |    ELSE 0.0 END AS contrib FROM s),
        |st AS (SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE)
        |    AS chi2 FROM sc)
        |SELECT digit, observed, expected, contrib, chi2
        |FROM sc, st ORDER BY digit""".stripMargin,


    // ACF truth: same daily-count series, exact integer sums and cross
    // sums per lag, identical fixed-order double assembly
    "q_acf" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(v) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |l AS (SELECT CAST(gs AS BIGINT) AS lag
        |  FROM generate_series(1, 10) AS t2(gs)),
        |pr AS (SELECT l.lag, count(*) AS n_pairs,
        |    CAST(SUM(a.v) AS DOUBLE) AS sa, CAST(SUM(b.v) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) AS pp
        |  FROM d a JOIN l ON true JOIN d b ON b.t = a.t + l.lag
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CASE WHEN p - s * s / n > 0.0 THEN
        |    round((pp - s / n * (sa + sb) + n_pairs * (s / n) * (s / n))
        |      / (p - s * s / n), 6)
        |  END AS r
        |FROM pr, g ORDER BY lag""".stripMargin,


    // Theil-Sen truth: same pair slopes (one rounded double division of
    // exact integers), same inverted-CDF medians
    "q_theil_sen" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |p AS (SELECT round((CAST(b.v AS DOUBLE) - a.v) / (b.t - a.t), 6) AS s
        |  FROM d a JOIN d b ON b.t > a.t),
        |sc AS (SELECT s, count(*) AS n FROM p GROUP BY 1),
        |sw AS (SELECT s, SUM(n) OVER (ORDER BY s) AS cum,
        |    SUM(n) OVER () AS tot FROM sc),
        |sm AS (SELECT MIN(CASE WHEN CAST(cum AS HUGEINT) * 2 >= tot
        |    THEN s END) AS slope FROM sw),
        |r AS (SELECT round(CAST(v AS DOUBLE) - slope * t, 6) AS i
        |  FROM d, sm),
        |rc AS (SELECT i, count(*) AS n FROM r GROUP BY 1),
        |rw AS (SELECT i, SUM(n) OVER (ORDER BY i) AS cum,
        |    SUM(n) OVER () AS tot FROM rc),
        |im AS (SELECT MIN(CASE WHEN CAST(cum AS HUGEINT) * 2 >= tot
        |    THEN i END) AS intercept FROM rw),
        |t AS (SELECT count(*) AS n,
        |    CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
        |  FROM d)
        |SELECT n, n_pairs, slope, intercept FROM t, sm, im""".stripMargin,


    // two-proportion truth: four exact integers, identical fixed-order
    // double z arithmetic
    "q_prop_test" ->
      """WITH a AS (SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 75
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value > 75
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |s AS (SELECT *,
        |    CAST(k1 AS DOUBLE) / n1 AS p1r, CAST(k2 AS DOUBLE) / n2 AS p2r,
        |    CAST(k1 + k2 AS DOUBLE) / (n1 + n2) AS pp FROM a),
        |s2 AS (SELECT *,
        |    pp * (1.0 - pp) * (CAST(1 AS DOUBLE) / n1
        |      + CAST(1 AS DOUBLE) / n2) AS se2 FROM s)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, k1, n2, k2,
        |  round(p1r, 6) AS p1, round(p2r, 6) AS p2,
        |  CASE WHEN se2 > 0.0
        |    THEN round((p1r - p2r) / sqrt(se2), 6) END AS z
        |FROM s2""".stripMargin,


    // Kaplan-Meier truth: same lifetime/censor table, at-risk from the
    // same prefix arithmetic, survival via rounded-ln decimal-sum-exp
    "q_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_events,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_censored
        |  FROM u, m GROUP BY 1),
        |r AS (SELECT t, n_events, n_censored,
        |    CAST(SUM(n_events + n_censored) OVER () AS BIGINT)
        |      - (CAST(SUM(n_events + n_censored) OVER (ORDER BY t) AS BIGINT)
        |        - (n_events + n_censored)) AS n_risk
        |  FROM lt),
        |f2 AS (SELECT *,
        |    round(CAST(n_risk - n_events AS DOUBLE) / n_risk, 6) AS factor
        |  FROM r),
        |s AS (SELECT *,
        |    SUM(CASE WHEN factor > 0.0
        |      THEN CAST(round(ln(factor), 6) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) OVER (ORDER BY t) AS lnsum,
        |    MIN(factor) OVER (ORDER BY t) AS minf FROM f2)
        |SELECT t, n_risk, n_events, n_censored,
        |  CASE WHEN minf = 0.0 THEN 0.0
        |    ELSE round(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
        |FROM s ORDER BY t""".stripMargin,


    // CUSUM truth: same standardization from exact integer moments,
    // identical decimal prefix sums and running extremes (incl. the
    // empty-prefix zero), decimal threshold compare
    "q_cusum" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |z AS (SELECT t, CAST(v AS DOUBLE) AS value,
        |    round((CAST(v AS DOUBLE) - s / n)
        |      / sqrt((n * p - s * s) / (CAST(n AS DOUBLE) * (n - 1))), 6) AS z
        |  FROM d, g),
        |w AS (SELECT t, value, z,
        |    CAST(SUM(CAST(z AS DECIMAL(18,6)) - CAST(0.5 AS DECIMAL(7,6)))
        |      OVER (ORDER BY t) AS DECIMAL(30,6)) AS pp,
        |    CAST(SUM(CAST(z AS DECIMAL(18,6)) + CAST(0.5 AS DECIMAL(7,6)))
        |      OVER (ORDER BY t) AS DECIMAL(30,6)) AS np
        |  FROM z),
        |x AS (SELECT t, value, z, pp, np,
        |    MIN(pp) OVER (ORDER BY t) AS mn,
        |    MAX(np) OVER (ORDER BY t) AS mx FROM w),
        |f AS (SELECT t, value, z,
        |    pp - (CASE WHEN mn < 0 THEN mn
        |      ELSE CAST(0 AS DECIMAL(30,6)) END) AS sp,
        |    (CASE WHEN mx > 0 THEN mx
        |      ELSE CAST(0 AS DECIMAL(30,6)) END) - np AS sm
        |  FROM x)
        |SELECT t, value, z, CAST(sp AS DOUBLE) AS s_plus,
        |  CAST(sm AS DOUBLE) AS s_minus,
        |  (sp > CAST(4.0 AS DECIMAL(7,6))
        |    OR sm > CAST(4.0 AS DECIMAL(7,6))) AS flag
        |FROM f ORDER BY t""".stripMargin,


    // winsorize truth: same inverted-CDF integer edge selection and clip
    "q_winsorize" ->
      """WITH c AS (SELECT n_chars AS v, count(*) AS n FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM c),
        |t AS (SELECT SUM(n) AS tot FROM c),
        |e AS (SELECT
        |    MIN(CASE WHEN CAST(cum AS HUGEINT) * 10000 >= tot * 100
        |      THEN v END) AS lo,
        |    MIN(CASE WHEN CAST(cum AS HUGEINT) * 10000 >= tot * 9900
        |      THEN v END) AS hi
        |  FROM w, t)
        |SELECT doc_id, CAST(n_chars AS DOUBLE) AS value,
        |  CAST(least(greatest(n_chars, lo), hi) AS DOUBLE) AS winsorized
        |FROM documents, e WHERE n_chars IS NOT NULL
        |ORDER BY doc_id""".stripMargin
  )
}
