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
}
