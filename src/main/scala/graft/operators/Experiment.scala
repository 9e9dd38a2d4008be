package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online-experiment (A/B) analysis: sample-ratio-mismatch detection,
  * the two-proportion z test, and CUPED variance reduction. At corpus
  * scale an experiment readout is exactly the shape this engine is
  * built for — billions of assignment rows collapsing to a handful of
  * arms — and the three failure modes these operators catch (broken
  * randomization, underpowered deltas, pre-period imbalance) are the
  * ones that silently invalidate a readout.
  *
  * Scale shape shared by all three: ONE map-side-combined aggregation
  * collapses the corpus to the bounded arm table (or a single moment
  * row); every derived statistic folds from exact integer/decimal
  * aggregates with the repo's fixed-order 6 dp final rounding, so a
  * SQL oracle reproduces each value bit-for-bit.
  */
object Experiment {

  /** Sample-ratio mismatch check: χ² goodness-of-fit of observed arm
    * counts against the DESIGNED split. The first gate on any
    * experiment readout — a 50/50 design that shipped 50.4/49.6 at
    * scale is a broken bucketing hash, and every downstream metric is
    * garbage. Returns one row per arm (observed, expected, the χ²
    * contribution) with the total χ² and dof repeated, ordered by arm.
    *
    * Arms observed in the data but absent from `expected` are a design
    * error and fail fast (a typo'd arm name must not silently shrink
    * the test). Expected shares must sum to 1 (±1e-9).
    *
    * Per-cell (O−E)²/E rounds at 6 dp before the exact decimal total —
    * the same convention as the independence χ² in [[Stats]].
    */
  def srmCheck(df: DataFrame, armCol: String,
               expected: Map[String, Double]): DataFrame = {
    require(expected.nonEmpty, "expected shares must be non-empty")
    require(math.abs(expected.values.sum - 1.0) < 1e-9,
      s"expected shares must sum to 1, got ${expected.values.sum}")
    require(expected.values.forall(_ > 0),
      "expected shares must all be positive (a zero-share arm makes the " +
        "chi-square contribution a division by zero)")
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.toSeq.toDF("arm", "share")
    val counts = df.filter(col(armCol).isNotNull)
      .groupBy(col(armCol).cast("string").as("arm"))
      .agg(count(lit(1)).as("n"))
    // bounded collect: distinct unmatched arm labels, capped at 20 —
    // enough to render the error, safe if armCol is miswired to a
    // high-cardinality column
    val unknown = counts.join(broadcast(exp), Seq("arm"), "left_anti")
      .select("arm").limit(20).collect().map(_.getString(0))
    require(unknown.isEmpty,
      s"arms not in the design: ${unknown.sorted.mkString(", ")} — " +
        "fix the expected map or filter the assignment log")
    val joined = broadcast(exp).join(counts, Seq("arm"), "left")
      .select(col("arm"), coalesce(col("n"), lit(0L)).as("n"), col("share"))
    val tot = Window.partitionBy()
    val eN = col("_total").cast("double") * col("share")
    joined
      .withColumn("_total", sum("n").over(tot))
      .withColumn("expected_n", round(eN, 6))
      .withColumn("contrib", round(
        (col("n").cast("double") - eN) * (col("n").cast("double") - eN) / eN,
        6))
      .withColumn("chi2",
        sum(col("contrib").cast("decimal(18,6)")).over(tot).cast("double"))
      .select(col("arm"), col("n"), col("expected_n"), col("contrib"),
        col("chi2"), (count(lit(1)).over(tot) - lit(1)).cast("int").as("dof"))
      .orderBy("arm")
  }

  /** Cluster-robust two-arm z test: the repair for what
    * [[aaCalibration]] diagnoses. When exposure is clustered (all of a
    * household/session/geo shares one assignment), units within a
    * cluster are correlated and [[twoProportionZ]]'s per-unit variance
    * is too small — the readout fires on noise. Here the arm rate is
    * the ratio of CLUSTER sums p̂ = Σs_c/Σn_c and its variance is the
    * cluster-level delta method
    * Var ≈ (C/(C−1)) · Σ(s_c − p̂·n_c)² / (Σn_c)²
    * — clusters, not units, are the independent draws.
    *
    * Scale shape: one grouped aggregation collapses units to (cluster,
    * arm) rows; a second map-side-combined fold collapses those to one
    * row per arm worth of moments. Nothing bounded-table-sized is
    * assumed of the cluster count. The per-cluster squared residual
    * cannot be exact-decimal (p̂ enters), so the second fold quantizes
    * each residual² at 9 dp into DECIMAL(38,12) — order-free like the
    * jackknife fold. Degenerate variance yields NULL z.
    */
  def clusterRobustZ(df: DataFrame, armCol: String, clusterCol: String,
                     success: Column, armA: String, armB: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val y = when(success, 1L).otherwise(0L)
    val perCluster = df.filter(arm.isin(armA, armB))
      .groupBy(arm.as("_arm"), col(clusterCol).cast("string").as("_c"))
      .agg(count(lit(1)).as("_n"), sum(y).as("_s"))
    // pass 1 over the cluster table: totals per arm (exact integers)
    val tot = perCluster.groupBy("_arm")
      .agg(sum("_n").as("_tn"), sum("_s").as("_ts"),
        count(lit(1)).as("_tc"))
    // p-hat per arm attaches back to every cluster row (tiny 2-row side)
    val joined = perCluster.join(broadcast(tot), "_arm")
    val pHat = col("_ts").cast("double") / col("_tn").cast("double")
    val resid = col("_s").cast("double") - pHat * col("_n").cast("double")
    val folded = joined
      .withColumn("_r2", round(resid * resid, 9).cast("decimal(38,12)"))
      .groupBy("_arm")
      .agg(first("_tn").as("n"), first("_ts").as("s"),
        first("_tc").as("clusters"), sum("_r2").as("_ss"))
    def side(a: String, suff: String): DataFrame = folded
      .filter(col("_arm") === a)
      .select(col("n").as(s"n_$suff"), col("s").as(s"s_$suff"),
        col("clusters").as(s"clusters_$suff"), col("_ss").as(s"_ss_$suff"))
    val both = side(armA, "a").crossJoin(side(armB, "b"))
    def rate(suff: String): Column =
      col(s"s_$suff").cast("double") /
        nullif(col(s"n_$suff").cast("double"), lit(0.0))
    def varSide(suff: String): Column = {
      val c = col(s"clusters_$suff").cast("double")
      (c / (c - lit(1.0))) * col(s"_ss_$suff").cast("double") /
        (col(s"n_$suff").cast("double") * col(s"n_$suff").cast("double"))
    }
    val se = sqrt(varSide("a") + varSide("b"))
    val z = (rate("a") - rate("b")) / se
    val ok = col("clusters_a") > 1 && col("clusters_b") > 1 && se > 0
    both.select(col("n_a"), col("s_a"), col("clusters_a"),
      col("n_b"), col("s_b"), col("clusters_b"),
      round(rate("a"), 6).as("p_a"), round(rate("b"), 6).as("p_b"),
      when(ok, round(z, 6)).as("z"),
      when(ok, abs(z) > 1.96).as("significant_5pct"))
  }

  /** Per-segment SRM: the [[srmCheck]] χ² computed WITHIN each segment
    * (platform, country, entry surface) — a bucketing bug that skews
    * only one segment dilutes to invisibility in the global test while
    * corrupting exactly that segment's readout. One grouped
    * aggregation to (segment, arm), expected counts against the
    * designed shares from the segment's own total, per-segment χ² with
    * the same 6 dp contribution rounding as the global check. Arms
    * outside the design count into `n_unknown` per segment (a grouped
    * report must keep emitting, like the streaming twin — the global
    * [[srmCheck]] is the one that fails fast). One row per segment,
    * ordered; dof = |designed arms| − 1.
    */
  def srmBySegment(df: DataFrame, segmentCol: String, armCol: String,
                   expected: Map[String, Double],
                   chi2Critical: Double = 3.841459): DataFrame = {
    require(expected.nonEmpty, "expected shares must be non-empty")
    require(math.abs(expected.values.sum - 1.0) < 1e-9,
      s"expected shares must sum to 1, got ${expected.values.sum}")
    require(expected.values.forall(_ > 0),
      "expected shares must all be positive")
    val arms = expected.keys.toSeq.sorted
    val arm = col(armCol).cast("string")
    val counts = arms.zipWithIndex.map { case (a, k) =>
      sum(when(arm === a, 1L).otherwise(0L)).as(s"_a$k")
    } :+ sum(when(arm.isin(arms: _*), 0L).otherwise(1L)).as("_unk")
    val g = df.filter(col(segmentCol).isNotNull)
      .groupBy(col(segmentCol).cast("string").as("segment"))
      .agg(counts.head, counts.tail: _*)
    val total = arms.indices.map(k => col(s"_a$k")).reduce(_ + _)
    def contrib(k: Int): Column = {
      val e = col("n").cast("double") * lit(expected(arms(k)))
      round((col(s"_a$k").cast("double") - e) *
        (col(s"_a$k").cast("double") - e) / e, 6).cast("decimal(18,6)")
    }
    g.withColumn("n", total)
      .withColumn("chi2",
        when(col("n") > 0,
          arms.indices.map(contrib).reduce(_ + _).cast("double")))
      .select(col("segment"), col("n"), col("_unk").as("n_unknown"),
        col("chi2"), lit(arms.size - 1).as("dof"),
        (col("chi2") > chi2Critical).as("srm_flag"))
      .orderBy("segment")
  }

  /** A/A calibration: re-randomize the SAME population `k` times with
    * a seeded hash split and run the two-proportion z test on each
    * pseudo-experiment — on null data ~5% of |z| should cross 1.96.
    * A platform whose A/A false-positive rate reads 11% has a broken
    * variance estimate (clustered exposure, dependent units) and every
    * "significant" launch readout it ever produced is suspect. THE
    * validation to run before trusting a new assignment pipeline.
    *
    * The split reuses the bootstrap kernel's md5 parity (unit, k) —
    * deterministic and oracle-reproducible. The corpus explodes ×k but
    * collapses in ONE map-side-combined aggregation to k rows; the z
    * fold and the calibration summary walk that bounded table.
    */
  def aaCalibration(df: DataFrame, idCol: String, success: Column,
                    k: Int = 50): DataFrame = {
    require(k >= 10 && k <= 1000, s"k in [10, 1000], got $k")
    val rows = df.select(col(idCol).cast("string").as("_id"),
      when(success, 1L).otherwise(0L).as("_y"))
    val armBit = conv(substring(
      md5(concat(col("_id"), lit("#"), col("_k"))), 1, 15), 16, 10)
      .cast("decimal(20,0)") % 2
    val per = rows
      .select(col("_id"), col("_y"),
        explode(sequence(lit(1), lit(k))).as("_k"))
      .withColumn("_arm", armBit)
      .groupBy("_k")
      .agg(
        sum(when(col("_arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_arm") === 0, col("_y")).otherwise(0L)).as("s_a"),
        sum(when(col("_arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_arm") === 1, col("_y")).otherwise(0L)).as("s_b"))
    val na = nullif(col("n_a").cast("double"), lit(0.0))
    val nb = nullif(col("n_b").cast("double"), lit(0.0))
    val pa = col("s_a").cast("double") / na
    val pb = col("s_b").cast("double") / nb
    val pPool = (col("s_a") + col("s_b")).cast("double") /
      nullif((col("n_a") + col("n_b")).cast("double"), lit(0.0))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    val z = (pa - pb) / se
    val sig = when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
      abs(z) > 1.96)
    per
      .withColumn("_sig", sig)
      .agg(count(lit(1)).as("n_experiments"),
        sum(when(col("_sig"), 1L).otherwise(0L)).as("n_significant"),
        sum(when(col("_sig").isNull, 1L).otherwise(0L)).as("n_degenerate"))
      .select(col("n_experiments"), col("n_significant"),
        col("n_degenerate"),
        // nullif: every split degenerate (constant outcome) must yield
        // NULL rate, not an ANSI DIVIDE_BY_ZERO task failure
        round(col("n_significant").cast("double") /
          nullif((col("n_experiments") - col("n_degenerate"))
            .cast("double"), lit(0.0)), 6)
          .as("false_positive_rate"))
  }

  /** Two-proportion z test between arms `armA` and `armB`: pooled
    * standard error, z = (p̂A − p̂B)/√(p̂(1−p̂)(1/nA + 1/nB)). The
    * conversion-rate readout. One row: counts, rates, the absolute
    * and signed z, and the |z| > 1.96 flag (two-sided 5%).
    *
    * All four inputs are exact integer counts from one aggregation;
    * z is a single fixed-order double expression rounded at 6 dp.
    */
  def twoProportionZ(df: DataFrame, armCol: String, success: Column,
                     armA: String, armB: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val agg = df.filter(arm.isin(armA, armB))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(arm === armA && success, 1L).otherwise(0L)).as("s_a"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(arm === armB && success, 1L).otherwise(0L)).as("s_b"))
    // nullif denominators: an empty arm must yield NULL columns, not an
    // ANSI DIVIDE_BY_ZERO task failure (the `when` guards below don't
    // stop the unguarded p_a/p_b projections from evaluating)
    val na = nullif(col("n_a").cast("double"), lit(0.0))
    val nb = nullif(col("n_b").cast("double"), lit(0.0))
    val pa = col("s_a").cast("double") / na
    val pb = col("s_b").cast("double") / nb
    val pPool = (col("s_a") + col("s_b")).cast("double") /
      nullif((col("n_a") + col("n_b")).cast("double"), lit(0.0))
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    val z = (pa - pb) / se
    agg.select(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0, round(z, 6)).as("z"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0, abs(z) > 1.96)
        .as("significant_5pct"))
  }

  /** TOST equivalence test for a binary outcome — the INVERSE question
    * to [[twoProportionZ]]: not "did B move the metric" but "is B
    * provably WITHIN ±margin of A" (launch-safety / no-regression
    * gates, where failing to reject H0 is not evidence of equivalence).
    * Two one-sided z tests against the margin ends, unpooled standard
    * error (the margin hypothesis is not a null of equality, so the
    * pooled SE of the superiority test would be wrong here):
    * z_low = (Δ+m)/se must exceed z_crit AND z_up = (Δ−m)/se must fall
    * below −z_crit. `zCrit` defaults to the one-sided 5% normal point
    * (the 90% CI-inside-margin formulation).
    *
    * Shape: ONE map-side-combined aggregation to four integer counts;
    * every double after is a fixed-order expression over those exact
    * counts, rounded at 6 dp — engine-replayable, fully declarative
    * (no driver action). Empty arms or zero spread yield NULL z's and
    * a NULL verdict, never a divide-by-zero task failure.
    */
  def tostEquivalence(df: DataFrame, armCol: String, success: Column,
                      armA: String, armB: String, margin: Double,
                      zCrit: Double = 1.6448536269514722): DataFrame = {
    require(margin > 0, "margin must be positive")
    require(zCrit > 0, "zCrit must be positive")
    val arm = col(armCol).cast("string")
    val agg = df.filter(arm.isin(armA, armB))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(arm === armA && success, 1L).otherwise(0L)).as("s_a"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(arm === armB && success, 1L).otherwise(0L)).as("s_b"))
    val na = nullif(col("n_a").cast("double"), lit(0.0))
    val nb = nullif(col("n_b").cast("double"), lit(0.0))
    val pa = col("s_a").cast("double") / na
    val pb = col("s_b").cast("double") / nb
    val se = sqrt(pa * (lit(1.0) - pa) / na + pb * (lit(1.0) - pb) / nb)
    val zLow = round((pb - pa + lit(margin)) / se, 6)
    val zUp = round((pb - pa - lit(margin)) / se, 6)
    val ok = col("n_a") > 0 && col("n_b") > 0 && se > 0
    agg.select(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      round(pb - pa, 6).as("diff"), round(se, 6).as("se"),
      when(ok, zLow).as("z_low"), when(ok, zUp).as("z_up"),
      when(ok, zLow > lit(zCrit) && zUp < lit(-zCrit)).as("equivalent"))
  }

  /** Sharp regression-discontinuity estimate: local LINEAR fit on each
    * side of the cutoff within a rectangular bandwidth, effect =
    * ŷ₊(c) − ŷ₋(c) — the quasi-experimental readout when treatment
    * flips at a known threshold of a running variable (spend tiers,
    * score cutoffs, eligibility rules) and randomization never
    * happened. Local-linear (not difference-in-means) because the
    * running variable usually trends through the cutoff; means alone
    * would book that slope as "effect".
    *
    * Shape: ONE fold with per-side exact decimal moments (x, y, xy, x²
    * within the bandwidth); slopes/intercepts are fixed-order double
    * expressions over those sums. NULL effect when either side lacks 2
    * distinct x values (no line to fit).
    */
  def regressionDiscontinuity(df: DataFrame, runCol: String,
                              outcomeCol: String, cutoff: Double,
                              bandwidth: Double,
                              precision: Int = 18,
                              scale: Int = 2): DataFrame = {
    require(bandwidth > 0, "bandwidth must be positive")
    val x = col(runCol).cast(s"decimal($precision,$scale)")
    val y = col(outcomeCol).cast(s"decimal($precision,$scale)")
    val c = java.math.BigDecimal.valueOf(cutoff)
    val h = java.math.BigDecimal.valueOf(bandwidth)
    val inWin = x >= lit(c.subtract(h)) && x <= lit(c.add(h))
    val right = x >= lit(c)
    def side(name: String, cond: Column): Seq[Column] = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"n_$name"),
      sum(when(cond, x)).as(s"_sx$name"),
      sum(when(cond, y)).as(s"_sy$name"),
      sum(when(cond, (x * y).cast("decimal(38,4)"))).as(s"_sxy$name"),
      sum(when(cond, (x * x).cast("decimal(38,4)"))).as(s"_sxx$name"),
      count_distinct(when(cond, x)).as(s"_dx$name"))
    val aggs = side("l", inWin && !right) ++ side("r", inWin && right)
    val agg = df.filter(x.isNotNull && y.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    def fit(s: String): (Column, Column) = {
      val nD = col(s"n_$s").cast("double")
      val slopeNum = (col(s"n_$s") * col(s"_sxy$s") -
        (col(s"_sx$s") * col(s"_sy$s")).cast("decimal(38,4)"))
        .cast("double")
      val slopeDen = (col(s"n_$s") * col(s"_sxx$s") -
        (col(s"_sx$s") * col(s"_sx$s")).cast("decimal(38,4)"))
        .cast("double")
      val slope = slopeNum / slopeDen
      val yhat = col(s"_sy$s").cast("double") / nD +
        slope * (lit(cutoff) - col(s"_sx$s").cast("double") / nD)
      (slope, yhat)
    }
    val (slopeL, yhatL) = fit("l")
    val (slopeR, yhatR) = fit("r")
    val ok = col("_dxl") >= 2 && col("_dxr") >= 2
    agg.select(col("n_l"), col("n_r"),
      when(ok, round(slopeL, 6)).as("slope_l"),
      when(ok, round(slopeR, 6)).as("slope_r"),
      when(ok, round(yhatL, 6)).as("yhat_left"),
      when(ok, round(yhatR, 6)).as("yhat_right"),
      when(ok, round(yhatR - yhatL, 6)).as("effect"))
  }

  /** Instrumental-variable Wald estimator (the LATE under monotonicity):
    * (E[Y|Z=1] − E[Y|Z=0]) / (E[D|Z=1] − E[D|Z=0]) — causal readout
    * when treatment D is self-selected but an encouragement Z was
    * randomized. The denominator is the first stage; a weak one (near
    * zero) makes the ratio explode, so it returns NULL below
    * `minFirstStage` with all the pieces exposed.
    *
    * ONE map-side-combined fold to six exact sums; fixed-order closing
    * doubles at 6 dp.
    */
  def ivWald(df: DataFrame, instrument: Column, treatment: Column,
             outcomeCol: String, minFirstStage: Double = 1e-4,
             precision: Int = 18, scale: Int = 2): DataFrame = {
    val y = col(outcomeCol).cast(s"decimal($precision,$scale)")
    val agg = df.filter(y.isNotNull)
      .agg(
        sum(when(instrument, 1L).otherwise(0L)).as("n_z1"),
        sum(when(!instrument, 1L).otherwise(0L)).as("n_z0"),
        sum(when(instrument, y)).as("_y1"),
        sum(when(!instrument, y)).as("_y0"),
        sum(when(instrument && treatment, 1L).otherwise(0L)).as("_d1"),
        sum(when(!instrument && treatment, 1L).otherwise(0L)).as("_d0"))
    val n1 = nullif(col("n_z1").cast("double"), lit(0.0))
    val n0 = nullif(col("n_z0").cast("double"), lit(0.0))
    val itt = col("_y1").cast("double") / n1 -
      col("_y0").cast("double") / n0
    val firstStage = col("_d1").cast("double") / n1 -
      col("_d0").cast("double") / n0
    agg.select(col("n_z1"), col("n_z0"),
      round(itt, 6).as("itt"),
      round(firstStage, 6).as("first_stage"),
      when(abs(firstStage) > lit(minFirstStage),
        round(itt / firstStage, 6)).as("late"))
  }

  /** Exact Bayesian A/B readout for a binary outcome: with independent
    * Beta(a0, b0) priors on each arm's conversion rate, the posterior
    * probability that arm B beats arm A,
    *
    *   P(pB > pA) = Σ_{i=0}^{αB−1} B(αA+i, βA+βB) /
    *                ((βB+i) · B(1+i, βB) · B(αA, βA)),
    *
    * (Cook's closed form for integer αB, where αX = sX + a0 and
    * βX = nX − sX + b0) — no Monte Carlo, no normal approximation, so
    * the result is a deterministic function of the four counts and a
    * SQL oracle reproduces it. The decision-facing companion to
    * [[twoProportionZ]]: a posterior probability instead of a p-value,
    * directly comparable against a ship threshold (e.g. 0.95).
    *
    * Scale shape: ONE map-side-combined aggregation collapses the
    * corpus to four integer counts; everything after is driver math on
    * that 1-row result. The closed-form sum has αB ≤ sB + a0 terms and
    * the log-factorial table it reads spans nA + nB + 2·(a0+b0)
    * integers, so both are bounded by `maxExact` — the guard refuses
    * larger inputs with the remedy (the z test, which is exact-count
    * driven and size-free) rather than looping the driver for minutes,
    * the same fail-fast contract as `kendallTau`'s maxCells. Log-beta
    * values come from an exact cumulative Σln k table (lnΓ of an
    * integer is a prefix sum), not a Stirling approximation, so the
    * only float inexactness is the ln/exp/Σ chain itself, rounded at
    * 6 dp like every derived statistic in this object.
    */
  def bayesianAB(df: DataFrame, armCol: String, success: Column,
                 armA: String, armB: String,
                 priorA: Long = 1L, priorB: Long = 1L,
                 maxExact: Long = 2000000L): DataFrame = {
    require(priorA >= 1 && priorB >= 1,
      "bayesianAB: integer priors must be >= 1 (the closed form walks " +
        "integer alpha/beta indices)")
    val arm = col(armCol).cast("string")
    // the corpus-collapsing fold: four exact integer counts
    val agg = df.filter(arm.isin(armA, armB))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(arm === armA && success, 1L).otherwise(0L)).as("s_a"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(arm === armB && success, 1L).otherwise(0L)).as("s_b"))
    // 1-row, 4-column collect: bounded by construction (the fold above)
    val r = agg.head()
    val (na, sa, nb, sb) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    require(na + nb <= maxExact,
      s"bayesianAB: ${na + nb} units > maxExact=$maxExact — the exact " +
        "closed-form sum is O(successes) driver work; use " +
        "twoProportionZ for large samples, where the normal " +
        "approximation is exact to working precision anyway")
    val (aA, bA) = (sa + priorA, na - sa + priorB)
    val (aB, bB) = (sb + priorA, nb - sb + priorB)
    // lf(m) = Σ_{k=1..m} ln k = lnΓ(m+1), exact prefix-sum table
    val n = (aA + bA + aB + bB).toInt
    val lf = new Array[Double](n + 1)
    var k = 1
    while (k <= n) { lf(k) = lf(k - 1) + math.log(k.toDouble); k += 1 }
    def lbeta(x: Long, y: Long): Double =
      lf((x - 1).toInt) + lf((y - 1).toInt) - lf((x + y - 1).toInt)
    val base = lbeta(aA, bA)
    var p = 0.0
    var i = 0L
    while (i < aB) {
      p += math.exp(lbeta(aA + i, bA + bB) - math.log((bB + i).toDouble) -
        lbeta(1 + i, bB) - base)
      i += 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((na, sa, nb, sb,
      BigDecimal(aA.toDouble / (aA + bA)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(aB.toDouble / (aB + bB)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_a", "s_a", "n_b", "s_b", "post_mean_a", "post_mean_b",
        "p_b_beats_a")
  }

  /** Delta-method CI for a ratio-of-sums metric (CTR, revenue/session,
    * tokens/doc): rows are PER-UNIT (user, session) numerator/
    * denominator pairs, the estimate is R = Σx/Σy, and the variance is
    * the first-order Taylor expansion
    * Var(R) ≈ (Sxx − 2R·Sxy + R²·Syy)/(n·ȳ²) over unit-level sample
    * (co)variances — the standard correction for the fact that a ratio
    * of sums is NOT a mean of per-unit ratios, so the naive binomial SE
    * is wrong whenever the denominator varies per unit.
    *
    * One map-side-combined moment fold (exact decimals) collapses the
    * corpus; every derived value is a fixed-order double expression
    * rounded at 6 dp. Degenerate inputs (Σy = 0, n < 2, zero variance)
    * yield NULL se/CI, never a task failure.
    */
  def ratioMetricCI(df: DataFrame, numCol: String, denCol: String,
                    z: Double = 1.959964): DataFrame = {
    val x = col(numCol).cast("decimal(18,6)")
    val y = col(denCol).cast("decimal(18,6)")
    val m = df.filter(x.isNotNull && y.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * x).cast("decimal(38,12)")).as("sxx"),
        sum((x * y).cast("decimal(38,12)")).as("sxy"),
        sum((y * y).cast("decimal(38,12)")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
    val ratio = sxD / nullif(syD, lit(0.0))
    // sample (co)variances via the n-1 denominator, moments exact
    val cXX = (col("sxx").cast("double") - sxD * sxD / nD) / (nD - lit(1.0))
    val cXY = (col("sxy").cast("double") - sxD * syD / nD) / (nD - lit(1.0))
    val cYY = (col("syy").cast("double") - syD * syD / nD) / (nD - lit(1.0))
    val yBar = syD / nD
    val varR = (cXX - lit(2.0) * ratio * cXY + ratio * ratio * cYY) /
      (nD * yBar * yBar)
    val se = sqrt(varR)
    val ok = col("n") >= 2 && col("sy") =!= 0 && varR >= 0
    m.select(col("n"),
      round(sxD, 6).as("num_sum"), round(syD, 6).as("den_sum"),
      when(col("sy") =!= 0, round(ratio, 6)).as("ratio"),
      when(ok, round(se, 6)).as("se"),
      when(ok, round(ratio - lit(z) * se, 6)).as("ci_low"),
      when(ok, round(ratio + lit(z) * se, 6)).as("ci_high"))
  }

  /** Leave-one-bucket-out jackknife CI for the same ratio-of-sums
    * metric — the assumption-light companion to [[ratioMetricCI]] (no
    * Taylor expansion, no independence-across-units linearity), and the
    * shape big experimentation platforms actually run: units are hashed
    * into B buckets once, per-bucket sums are tiny, and the jackknife
    * replays R without bucket b for each b. `bucketCol` must be a
    * deterministic unit hash (e.g. `user_id % 20`) so the oracle can
    * reproduce the assignment.
    *
    * Scale shape: ONE groupBy collapses the corpus to B rows; the
    * replicate fold runs on that bounded table (window over B rows).
    * Parity discipline: per-bucket replicates round at 9 dp into exact
    * decimals, the replicate mean is an exact decimal sum over B with
    * one final double divide, and the squared-deviation fold rounds at
    * 12 dp into DECIMAL(38,12) — no double-accumulation-order drift.
    */
  def jackknifeRatioCI(df: DataFrame, bucketCol: String, numCol: String,
                       denCol: String, z: Double = 1.959964): DataFrame = {
    val x = col(numCol).cast("decimal(18,6)")
    val y = col(denCol).cast("decimal(18,6)")
    val perBucket = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(bucketCol).cast("long").as("_b"))
      .agg(sum(x).as("_nx"), sum(y).as("_ny"), count(lit(1)).as("_c"))
    val w = Window.partitionBy()
    val totX = sum("_nx").over(w); val totY = sum("_ny").over(w)
    val nB = count(lit(1)).over(w)
    // leave-one-out replicate, rounded into an exact decimal so the
    // replicate mean and deviation folds are order-free
    val loo = round((totX - col("_nx")).cast("double") /
      nullif((totY - col("_ny")).cast("double"), lit(0.0)), 9)
      .cast("decimal(28,9)")
    val staged = perBucket
      .withColumn("_loo", loo)
      .withColumn("_B", nB)
      .withColumn("_tx", totX).withColumn("_ty", totY)
      .withColumn("_n", sum("_c").over(w))
    val meanLoo = sum(col("_loo")).over(Window.partitionBy())
      .cast("double") / col("_B").cast("double")
    val dev = col("_loo").cast("double") - meanLoo
    val folded = staged
      .withColumn("_dev2", round(dev * dev, 12).cast("decimal(38,12)"))
      .agg(
        first(col("_B")).as("buckets"), first(col("_n")).as("n"),
        first(col("_tx")).as("sx"), first(col("_ty")).as("sy"),
        sum(col("_dev2")).as("ss"),
        sum(when(col("_loo").isNull, 1).otherwise(0)).as("_badloo"))
    val bD = col("buckets").cast("double")
    val ratio = col("sx").cast("double") /
      nullif(col("sy").cast("double"), lit(0.0))
    val se = sqrt(lit(1.0) - lit(1.0) / bD) * sqrt(col("ss").cast("double"))
    val ok = col("buckets") >= 2 && col("sy") =!= 0 && col("_badloo") === 0
    folded.select(col("buckets").cast("int").as("buckets"), col("n"),
      when(col("sy") =!= 0, round(ratio, 6)).as("ratio"),
      when(ok, round(se, 6)).as("se_jack"),
      when(ok, round(ratio - lit(z) * se, 6)).as("ci_low"),
      when(ok, round(ratio + lit(z) * se, 6)).as("ci_high"))
  }

  /** McNemar test for PAIRED binary outcomes — two models scored on the
    * SAME examples (the LLM-eval readout: did the new checkpoint pass
    * prompts the old one failed, beyond the reverse?). Only the
    * discordant cells carry signal: χ² = (|b−c|−1)²/(b+c) with the
    * continuity correction, df = 1. A two-proportion z test here is
    * WRONG (the samples are not independent) — that's the whole reason
    * this operator exists next to [[twoProportionZ]].
    *
    * One aggregation to four exact cell counts; χ² is one fixed-order
    * double expression rounded 6 dp; b + c = 0 yields NULL χ², never a
    * division failure. 3.841459 is the df=1 critical value at 5%.
    */
  def mcNemar(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val agg = df.filter(aCol.isNotNull && bCol.isNotNull)
      .agg(
        count(lit(1)).as("n"),
        sum(when(aCol && bCol, 1L).otherwise(0L)).as("both_pass"),
        sum(when(aCol && !bCol, 1L).otherwise(0L)).as("a_only"),
        sum(when(!aCol && bCol, 1L).otherwise(0L)).as("b_only"),
        sum(when(!aCol && !bCol, 1L).otherwise(0L)).as("neither"))
    val b = col("a_only").cast("double"); val c = col("b_only").cast("double")
    val chi2 = (abs(b - c) - lit(1.0)) * (abs(b - c) - lit(1.0)) /
      nullif(b + c, lit(0.0))
    agg.select(col("n"), col("both_pass"), col("a_only"), col("b_only"),
      col("neither"),
      when(col("a_only") + col("b_only") > 0, round(chi2, 6)).as("chi2_cc"),
      when(col("a_only") + col("b_only") > 0, chi2 > 3.841459)
        .as("significant_5pct"))
  }

  /** Per-segment minimum detectable effect at the planned 50/50 split:
    * given each segment's unit count n and baseline rate p, the
    * smallest absolute lift a two-arm test can see at α = 5% two-sided
    * with 80% power is (z_{α/2} + z_β)·√(2·p(1−p)/(n/2)). The
    * pre-launch readout — "this segment is too small to measure a 1%
    * lift" BEFORE burning two weeks of traffic on it.
    *
    * `df` is already unit-level (one row per unit with a success flag);
    * one groupBy collapses it to the bounded segment table. The z
    * constants are pinned (1.959964, 0.841621) so the oracle matches
    * bit-for-bit; mde_rel = mde_abs/p, NULL for degenerate p ∈ {0,1}.
    */
  def mdeTable(df: DataFrame, segmentCol: String, success: Column,
               zAlpha: Double = 1.959964, zBeta: Double = 0.841621): DataFrame = {
    val agg = df.groupBy(col(segmentCol).cast("string").as("segment"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("successes"))
    val nD = col("n").cast("double")
    val p = col("successes").cast("double") / nD
    val perArm = nD / lit(2.0)
    val mde = lit(zAlpha + zBeta) * sqrt(lit(2.0) * p * (lit(1.0) - p) / perArm)
    val ok = col("successes") > 0 && col("successes") < col("n")
    agg.select(col("segment"), col("n"), col("successes"),
        round(p, 6).as("p"),
        when(ok, round(mde, 6)).as("mde_abs"),
        when(ok, round(mde / p, 6)).as("mde_rel"))
      .orderBy("segment")
  }

  /** Quantile treatment effects: the per-quantile deltas that a mean
    * readout hides — a latency experiment that improves p50 but blows
    * up p99 has a POSITIVE mean effect and is still a bad launch. One
    * row per requested quantile with both arms' exact interpolated
    * percentiles (SQL `percentile` semantics) and their difference.
    *
    * ONE aggregation holds 2·|qs| percentile aggregates over the
    * filtered corpus — exact percentiles buffer the arm's values per
    * task, the same trade (and the same remedy: switch to
    * `percentile_approx`) documented on
    * [[graft.operators.EventAnalytics.groupedQuantiles]]. Rounded 6 dp
    * per side; the delta rounds the difference of the published sides.
    */
  def quantileTreatmentEffect(df: DataFrame, armCol: String,
                              valueCol: String, qs: Seq[Double],
                              armA: String, armB: String): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "qs must be non-empty quantiles in [0,1]")
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("double")
    val base = df.filter(arm.isin(armA, armB) && v.isNotNull)
      .select(arm.as("_arm"), v.as("_v"))
    val aggs = qs.zipWithIndex.flatMap { case (q, i) => Seq(
      round(percentile(when(col("_arm") === armA, col("_v")), lit(q)), 6)
        .as(s"_a$i"),
      round(percentile(when(col("_arm") === armB, col("_v")), lit(q)), 6)
        .as(s"_b$i"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stackArgs = qs.indices
      .map(i => s"${qs(i)}D, _a$i, _b$i").mkString(", ")
    one.selectExpr(s"stack(${qs.size}, $stackArgs) AS (q, p_a, p_b)")
      .withColumn("qte", round(col("p_a") - col("p_b"), 6))
  }

  /** Post-stratified treatment effect: the weighted delta
    * Σ_s w_s·(ȳ_{A,s} − ȳ_{B,s}) over strata observed in BOTH arms,
    * with w_s the stratum's share of the usable population — removes
    * the composition bias a raw delta carries whenever the arms drew
    * different stratum mixes (the frequent real-world failure of
    * "randomized" assignment downstream of a filter). Strata missing
    * an arm contribute no comparison and are excluded, with the
    * exclusion COUNTED in the output (silently narrowing the
    * population would misrepresent what the estimate covers).
    *
    * Scale shape: one grouped aggregation collapses the corpus to the
    * stratum table; weights and the weighted fold run on that bounded
    * table (per-stratum terms round at 9 dp into exact decimals, so
    * the fold is accumulation-order-free). delta_raw is the unweighted
    * all-strata comparison for reference.
    */
  def postStratifiedEffect(df: DataFrame, armCol: String,
                           stratumCol: String, valueCol: String,
                           armA: String, armB: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("decimal(18,6)")
    val strata = df.filter(arm.isin(armA, armB) && v.isNotNull)
      .groupBy(col(stratumCol).cast("string").as("_s"))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("_na"),
        sum(when(arm === armA, v)).as("_sa"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("_nb"),
        sum(when(arm === armB, v)).as("_sb"))
    val usable = col("_na") > 0 && col("_nb") > 0
    val all = Window.partitionBy()
    val nUsable = sum(when(usable, col("_na") + col("_nb")).otherwise(0L))
      .over(all)
    val w = (col("_na") + col("_nb")).cast("double") /
      col("_nu").cast("double")
    val deltaS = col("_sa").cast("double") / col("_na").cast("double") -
      col("_sb").cast("double") / col("_nb").cast("double")
    val staged = strata
      .withColumn("_nu", nUsable)
      .withColumn("_term",
        when(usable, round(w * deltaS, 9).cast("decimal(28,9)")))
    val agg = staged.agg(
      count(lit(1)).as("strata_total"),
      sum(when(usable, 1L).otherwise(0L)).as("strata_used"),
      sum(col("_na") + col("_nb")).as("n"),
      sum(col("_na")).as("n_a_all"), sum(col("_sa")).as("s_a_all"),
      sum(col("_nb")).as("n_b_all"), sum(col("_sb")).as("s_b_all"),
      sum(col("_term")).as("_wsum"))
    val rawDelta =
      col("s_a_all").cast("double") /
        nullif(col("n_a_all").cast("double"), lit(0.0)) -
      col("s_b_all").cast("double") /
        nullif(col("n_b_all").cast("double"), lit(0.0))
    agg.select(col("n"), col("strata_total").cast("int").as("strata_total"),
      col("strata_used").cast("int").as("strata_used"),
      round(rawDelta, 6).as("delta_raw"),
      when(col("strata_used") > 0,
        round(col("_wsum").cast("double"), 6)).as("delta_post_strat"))
  }

  /** Difference-in-differences: the launch readout when randomization
    * was impossible (a staged rollout, a geo holdout). Cell means of
    * `valueCol` for arm × {pre, post}, then
    * DiD = (ȳ_{A,post} − ȳ_{A,pre}) − (ȳ_{B,post} − ȳ_{B,pre}) —
    * the parallel-trends estimate of the treatment effect with both
    * arm-level and period-level confounds differenced out.
    *
    * One aggregation with eight conditional exact-decimal sums; the
    * four means and the DiD are fixed-order doubles rounded 6 dp; any
    * empty cell yields NULL DiD (the estimate is undefined, not zero).
    */
  def diffInDiff(df: DataFrame, armCol: String, post: Column,
                 valueCol: String, armA: String, armB: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("decimal(18,6)")
    def cell(a: String, isPost: Boolean): (Column, Column) = {
      val in = arm === a && (if (isPost) post else !post) && v.isNotNull
      (sum(when(in, v)), sum(when(in, 1L).otherwise(0L)))
    }
    val (saPre, naPre) = cell(armA, isPost = false)
    val (saPost, naPost) = cell(armA, isPost = true)
    val (sbPre, nbPre) = cell(armB, isPost = false)
    val (sbPost, nbPost) = cell(armB, isPost = true)
    val agg = df.filter(arm.isin(armA, armB)).agg(
      saPre.as("s_a_pre"), naPre.as("n_a_pre"),
      saPost.as("s_a_post"), naPost.as("n_a_post"),
      sbPre.as("s_b_pre"), nbPre.as("n_b_pre"),
      sbPost.as("s_b_post"), nbPost.as("n_b_post"))
    def mean(s: String, n: String): Column =
      col(s).cast("double") / nullif(col(n).cast("double"), lit(0.0))
    val mAPre = mean("s_a_pre", "n_a_pre")
    val mAPost = mean("s_a_post", "n_a_post")
    val mBPre = mean("s_b_pre", "n_b_pre")
    val mBPost = mean("s_b_post", "n_b_post")
    val ok = col("n_a_pre") > 0 && col("n_a_post") > 0 &&
      col("n_b_pre") > 0 && col("n_b_post") > 0
    agg.select(
      col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      round(mAPre, 6).as("mean_a_pre"), round(mAPost, 6).as("mean_a_post"),
      round(mBPre, 6).as("mean_b_pre"), round(mBPost, 6).as("mean_b_post"),
      when(ok, round((mAPost - mAPre) - (mBPost - mBPre), 6)).as("did"))
  }

  /** Winsorized treatment effect: cap the metric at the POOLED p-th
    * percentile before comparing arm means — the standard defense
    * against a heavy-tailed metric (one whale order flips the raw
    * readout's sign). The cap is pooled across arms on purpose: per-arm
    * caps would clip the arms at different heights and bake a bias into
    * exactly the comparison being protected.
    *
    * Two passes: one exact-percentile aggregation for the cap (swap in
    * `percentile_approx` for monster corpora — same trade as
    * [[quantileTreatmentEffect]]), then one conditional fold of the
    * capped values (capped in double, then quantized to DECIMAL(18,6)
    * so the arm sums are accumulation-order-free). Reports the raw
    * delta alongside and the capped-row count — a winsorized readout
    * that hides how much it clipped is not a readout.
    */
  def winsorizedEffect(df: DataFrame, armCol: String, valueCol: String,
                       p: Double, armA: String, armB: String): DataFrame = {
    require(p > 0 && p < 1, s"cap quantile must be in (0,1), got $p")
    val arm = col(armCol).cast("string")
    val v = col(valueCol).cast("double")
    val base = df.filter(arm.isin(armA, armB) && v.isNotNull)
      .select(arm.as("_arm"), v.as("_v"))
    val capDf = base.agg(round(percentile(col("_v"), lit(p)), 6).as("_cap"))
    val w = least(col("_v"), col("_cap")).cast("decimal(18,6)")
    val raw = col("_v").cast("decimal(18,6)")
    val agg = base.join(broadcast(capDf)).agg(
      first(col("_cap")).as("cap"),
      sum(when(col("_arm") === armA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_arm") === armA, w)).as("_swa"),
      sum(when(col("_arm") === armA, raw)).as("_sra"),
      sum(when(col("_arm") === armB, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_arm") === armB, w)).as("_swb"),
      sum(when(col("_arm") === armB, raw)).as("_srb"),
      sum(when(col("_v") > col("_cap"), 1L).otherwise(0L)).as("n_capped"))
    val nA = nullif(col("n_a").cast("double"), lit(0.0))
    val nB = nullif(col("n_b").cast("double"), lit(0.0))
    agg.select(col("cap"), col("n_a"), col("n_b"), col("n_capped"),
      round(col("_swa").cast("double") / nA, 6).as("mean_a_w"),
      round(col("_swb").cast("double") / nB, 6).as("mean_b_w"),
      round(col("_swa").cast("double") / nA -
        col("_swb").cast("double") / nB, 6).as("delta_winsorized"),
      round(col("_sra").cast("double") / nA -
        col("_srb").cast("double") / nB, 6).as("delta_raw"))
  }

  /** Uplift by score quantile + the Qini trajectory: bucket units into
    * k pooled score quantiles (top bucket first), compare conversion
    * between arms per bucket, and accumulate the Qini numerator
    * cumS_A − cumS_B·(cumN_A/cumN_B) down the ranking — the readout
    * for "does the targeting model rank the people the treatment
    * actually moves?". A model with positive average uplift but a flat
    * Qini curve is ranking noise.
    *
    * Edges come from one exact-percentile aggregation over the pooled
    * scores (approx at monster scale, as elsewhere); each unit folds to
    * its bucket per-row against the broadcast edge array (count of
    * edges strictly below the score — ties fall in the LOWER bucket,
    * [[graft.operators.Stats.psiBin]]'s convention); one grouped
    * aggregation collapses the corpus to k rows; the cumulative walk
    * runs on that bounded table. Heavy score ties make buckets uneven
    * by construction — the per-bucket n columns surface it.
    */
  def upliftByQuantile(df: DataFrame, armCol: String, scoreCol: String,
                       success: Column, k: Int,
                       armA: String, armB: String): DataFrame = {
    require(k >= 2, s"need at least 2 buckets, got $k")
    val arm = col(armCol).cast("string")
    val s = col(scoreCol).cast("double")
    val base = df.filter(arm.isin(armA, armB) && s.isNotNull)
      .select(arm.as("_arm"), s.as("_s"),
        when(success, 1L).otherwise(0L).as("_y"))
    val qs = (1 until k).map(i => lit(i.toDouble / k))
    val edges = base.agg(
      percentile(col("_s"), array(qs: _*)).as("_edges"))
    val bin = aggregate(col("_edges"), lit(0),
      (acc, e) => acc + when(col("_s") > e, 1).otherwise(0))
    val perBucket = base.join(broadcast(edges))
      .withColumn("_bucket", bin)
      .groupBy("_bucket")
      .agg(
        sum(when(col("_arm") === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_arm") === armA, col("_y")).otherwise(0L)).as("s_a"),
        sum(when(col("_arm") === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_arm") === armB, col("_y")).otherwise(0L)).as("s_b"))
    // top scores first: bucket k-1 leads the ranking walk
    val desc = Window.orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pA = col("s_a").cast("double") /
      nullif(col("n_a").cast("double"), lit(0.0))
    val pB = col("s_b").cast("double") /
      nullif(col("n_b").cast("double"), lit(0.0))
    val qini = col("_csa").cast("double") - col("_csb").cast("double") *
      (col("_cna").cast("double") /
        nullif(col("_cnb").cast("double"), lit(0.0)))
    perBucket
      .withColumn("_cna", sum("n_a").over(desc))
      .withColumn("_csa", sum("s_a").over(desc))
      .withColumn("_cnb", sum("n_b").over(desc))
      .withColumn("_csb", sum("s_b").over(desc))
      .select(col("_bucket").as("bucket"),
        col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        round(pA, 6).as("p_a"), round(pB, 6).as("p_b"),
        round(pA - pB, 6).as("uplift"),
        round(qini, 6).as("qini"))
      .orderBy(col("bucket").desc)
  }

  /** Always-valid sequential monitor (mixture SPRT, normal
    * approximation with a Gaussian mixture prior of scale `tau`): the
    * per-day readout that is SAFE to peek at. A fixed-horizon z test
    * recomputed daily inflates false positives severalfold; the mSPRT
    * log-likelihood ratio
    * llr_t = ½·ln(V_t/(V_t+τ²)) + Δ_t²·τ²/(2·V_t·(V_t+τ²))
    * with the running always-valid p-value p_t = exp(−max(0, max_{s≤t}
    * llr_s)) controls the error at α under CONTINUOUS monitoring
    * (Johari et al., "Peeking at A/B tests", KDD 2017).
    *
    * One grouped aggregation collapses the corpus to the daily arm
    * table; cumulative sums, the llr, and the running max all walk
    * that bounded table. V_t is the pooled binomial variance of the
    * cumulative rates. Days where the llr is undefined (an empty arm,
    * a degenerate pooled rate) emit NULL llr and inherit the p-value
    * walk. llr rounds at 9 dp before the max so the oracle reproduces
    * the trajectory; p rounds at 6 dp.
    */
  def alwaysValidMonitor(df: DataFrame, dayCol: String, armCol: String,
                         success: Column, armA: String, armB: String,
                         tau: Double = 0.1): DataFrame = {
    require(tau > 0, s"mixture scale tau must be positive, got $tau")
    val arm = col(armCol).cast("string")
    val y = when(success, 1L).otherwise(0L)
    val daily = df.filter(arm.isin(armA, armB))
      .groupBy(col(dayCol).cast("long").as("day"))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("_na"),
        sum(when(arm === armA, y).otherwise(0L)).as("_sa"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("_nb"),
        sum(when(arm === armB, y).otherwise(0L)).as("_sb"))
    val cum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nA = col("n_a").cast("double"); val nB = col("n_b").cast("double")
    val pA = col("s_a").cast("double") / nA
    val pB = col("s_b").cast("double") / nB
    val pPool = (col("s_a") + col("s_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val vT = pPool * (lit(1.0) - pPool) * (lit(1.0) / nA + lit(1.0) / nB)
    val delta = pA - pB
    val t2 = lit(tau * tau)
    val llr = lit(0.5) * log(vT / (vT + t2)) +
      delta * delta * t2 / (lit(2.0) * vT * (vT + t2))
    val ok = col("n_a") > 0 && col("n_b") > 0 &&
      col("s_a") + col("s_b") > 0 &&
      col("s_a") + col("s_b") < col("n_a") + col("n_b")
    daily
      .withColumn("n_a", sum("_na").over(cum))
      .withColumn("s_a", sum("_sa").over(cum))
      .withColumn("n_b", sum("_nb").over(cum))
      .withColumn("s_b", sum("_sb").over(cum))
      .withColumn("llr", when(ok, round(llr, 9)))
      .withColumn("_runmax", max("llr").over(cum))
      .select(col("day"), col("n_a"), col("s_a"), col("n_b"), col("s_b"),
        when(col("n_a") > 0 && col("n_b") > 0, round(delta, 6)).as("delta"),
        col("llr"),
        when(col("_runmax").isNotNull,
          round(exp(-greatest(col("_runmax"), lit(0.0))), 6))
          .otherwise(lit(1.0)).as("always_valid_p"))
      .orderBy("day")
  }

  /** Relative-lift CI: the "+4.2% (±1.1%)" number a launch review
    * actually reads, with the delta-method variance of the RATIO of
    * rates — reporting the absolute delta's CI divided by the control
    * rate is wrong because the control rate is itself noisy:
    * Var(p̂A/p̂B) ≈ Var(p̂A)/p̂B² + p̂A²·Var(p̂B)/p̂B⁴ with the
    * independent-arm binomial variances p̂(1−p̂)/n. One exact-count
    * aggregation; lift = p̂A/p̂B − 1 and its CI are fixed-order doubles
    * rounded 6 dp; a zero control rate yields NULLs, never a failure.
    */
  def relativeLiftCI(df: DataFrame, armCol: String, success: Column,
                     armA: String, armB: String,
                     z: Double = 1.959964): DataFrame = {
    val arm = col(armCol).cast("string")
    val agg = df.filter(arm.isin(armA, armB))
      .agg(
        sum(when(arm === armA, 1L).otherwise(0L)).as("n_a"),
        sum(when(arm === armA && success, 1L).otherwise(0L)).as("s_a"),
        sum(when(arm === armB, 1L).otherwise(0L)).as("n_b"),
        sum(when(arm === armB && success, 1L).otherwise(0L)).as("s_b"))
    val na = nullif(col("n_a").cast("double"), lit(0.0))
    val nb = nullif(col("n_b").cast("double"), lit(0.0))
    val pa = col("s_a").cast("double") / na
    val pb = col("s_b").cast("double") / nb
    val va = pa * (lit(1.0) - pa) / na
    val vb = pb * (lit(1.0) - pb) / nb
    val varRatio = va / (pb * pb) + pa * pa * vb / (pb * pb * pb * pb)
    val se = sqrt(varRatio)
    val lift = pa / pb - lit(1.0)
    val ok = col("n_a") > 0 && col("n_b") > 0 && col("s_b") > 0 && se > 0
    agg.select(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      when(col("s_b") > 0, round(lift, 6)).as("lift"),
      when(ok, round(lift - lit(z) * se, 6)).as("ci_low"),
      when(ok, round(lift + lit(z) * se, 6)).as("ci_high"))
  }

  /** CUPED (Deng et al. 2013) variance-reduced treatment effect:
    * θ = cov(x, y)/var(x) over the pooled arms for a pre-experiment
    * covariate x, then the adjusted delta
    * Δ_adj = (ȳA − ȳB) − θ(x̄A − x̄B). Reports the raw delta, the
    * adjusted delta, θ, and ρ² = corr(x,y)² — the fraction of metric
    * variance the covariate removes (the whole point of CUPED: the
    * same significance at ~(1−ρ²)× the sample).
    *
    * θ is a ratio of EXACT decimal moment aggregates
    * (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) — no accumulation-order drift; the
    * arm means are exact decimal sums over counts. One aggregation
    * over the corpus produces all moments (arm moments via conditional
    * sums in the same pass), so the corpus is scanned once.
    */
  def cuped(df: DataFrame, armCol: String, metricCol: String,
            covariateCol: String, armA: String, armB: String): DataFrame = {
    val arm = col(armCol).cast("string")
    val y = col(metricCol).cast("decimal(18,6)")
    val x = col(covariateCol).cast("decimal(18,6)")
    val base = df.filter(arm.isin(armA, armB) && y.isNotNull && x.isNotNull)
      .select(arm.as("_arm"), y.as("_y"), x.as("_x"))
    val m = base.agg(
      count(lit(1)).as("n"),
      sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
      sum((col("_x") * col("_y")).cast("decimal(38,12)")).as("sxy"),
      sum((col("_x") * col("_x")).cast("decimal(38,12)")).as("sxx"),
      sum((col("_y") * col("_y")).cast("decimal(38,12)")).as("syy"),
      sum(when(col("_arm") === armA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("_arm") === armA, col("_y"))).as("sy_a"),
      sum(when(col("_arm") === armA, col("_x"))).as("sx_a"),
      sum(when(col("_arm") === armB, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("_arm") === armB, col("_y"))).as("sy_b"),
      sum(when(col("_arm") === armB, col("_x"))).as("sx_b"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varXN = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varYN = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    // nullif guards as in twoProportionZ: empty arm / constant covariate
    // must yield NULLs, not an ANSI DIVIDE_BY_ZERO task failure
    val theta = covN / nullif(varXN, lit(0.0))
    val nA = nullif(col("n_a").cast("double"), lit(0.0))
    val nB = nullif(col("n_b").cast("double"), lit(0.0))
    val yA = col("sy_a").cast("double") / nA
    val yB = col("sy_b").cast("double") / nB
    val xA = col("sx_a").cast("double") / nA
    val xB = col("sx_b").cast("double") / nB
    m.select(col("n"), col("n_a"), col("n_b"),
      round(yA - yB, 6).as("delta_raw"),
      when(varXN > 0, round((yA - yB) - theta * (xA - xB), 6))
        .as("delta_adjusted"),
      when(varXN > 0, round(theta, 6)).as("theta"),
      when(varXN > 0 && varYN > 0, round(covN * covN / (varXN * varYN), 6))
        .as("rho2"))
  }

  /** Knobs for [[readout]] — the full A/B report in one call. */
  final case class ReadoutParams(
      armA: String = "A", armB: String = "B",
      expectedShares: Map[String, Double] = Map("A" -> 0.5, "B" -> 0.5),
      capQuantile: Double = 0.95,
      qteQs: Seq[Double] = Seq(0.5, 0.9, 0.99),
      tau: Double = 0.1)

  /** The assembled experiment report: each readout as its own
    * DataFrame, evaluated lazily — callers pick what to materialize.
    */
  final case class Readout(
      srm: DataFrame, proportions: DataFrame, cuped: DataFrame,
      ratioCi: DataFrame, jackknife: DataFrame, qte: DataFrame,
      winsorized: DataFrame, monitor: DataFrame,
      bayes: Option[DataFrame] = None) {
    def all: Seq[(String, DataFrame)] = Seq(
      "srm" -> srm, "proportions" -> proportions, "cuped" -> cuped,
      "ratio_ci" -> ratioCi, "jackknife_ci" -> jackknife, "qte" -> qte,
      "winsorized" -> winsorized, "monitor" -> monitor) ++
      bayes.map("bayes" -> _)
  }

  /** One-call experiment readout over a per-unit table with the
    * standard column contract — `arm` (string), `converted` (0/1),
    * `y` (metric), `x` (pre-period covariate), `bucket` (deterministic
    * unit hash for the jackknife) — plus a per-observation
    * `(day, arm, converted)` table for the sequential monitor. This is
    * the `graft experiment` CLI's engine: the gate (SRM) first, the
    * mean readout three ways (z test, CUPED, winsorized), the ratio
    * CI both ways (delta method + jackknife), the distributional view
    * (QTE), and the peek-safe trajectory (mSPRT) — every piece the
    * individual operators above, sharing the per-unit fold the caller
    * already paid for.
    */
  def readout(perUnit: DataFrame, daily: DataFrame,
              p: ReadoutParams = ReadoutParams()): Readout = Readout(
    srm = srmCheck(perUnit, "arm", p.expectedShares),
    proportions = twoProportionZ(perUnit, "arm", col("converted") === 1L,
      p.armA, p.armB),
    cuped = cuped(perUnit, "arm", "y", "x", p.armA, p.armB),
    ratioCi = ratioMetricCI(perUnit, "y", "x"),
    jackknife = jackknifeRatioCI(perUnit, "bucket", "y", "x"),
    qte = quantileTreatmentEffect(perUnit, "arm", "y", p.qteQs,
      p.armA, p.armB),
    winsorized = winsorizedEffect(perUnit, "arm", "y", p.capQuantile,
      p.armA, p.armB),
    monitor = alwaysValidMonitor(daily, "day", "arm",
      col("converted") === 1L, p.armA, p.armB, p.tau),
    // the Bayesian table is exact-closed-form and guarded by maxExact:
    // past the guard (its failure mode, not an error in the readout)
    // the bundle simply omits it — the z test carries that regime
    bayes = scala.util.Try(bayesianAB(perUnit, "arm",
      col("converted") === 1L, p.armA, p.armB)).toOption)
}
