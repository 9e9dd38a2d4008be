package graft

import org.apache.spark.sql.functions._
import graft.operators.Experiment

/** Closed-form fixtures for the experiment-analysis operators: SRM χ²
  * against hand-computed contributions, the two-proportion z test on a
  * textbook conversion table, and CUPED on a constructed dataset where
  * the covariate explains the metric exactly (ρ² = 1 ⇒ the adjusted
  * delta collapses to 0) and where it is orthogonal (θ = 0 ⇒ adjusted
  * equals raw).
  */
class ExperimentSpec extends SparkSpecBase {
  import spark.implicits._

  test("srmCheck: balanced design has chi2 0; a skewed split is detected") {
    val even = (Seq.fill(50)("A") ++ Seq.fill(50)("B")).toDF("arm")
    val r = Experiment.srmCheck(even, "arm", Map("A" -> 0.5, "B" -> 0.5))
      .collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Double]("chi2") == 0.0))
    assert(r.forall(_.getAs[Int]("dof") == 1))
    // 60/40 observed vs 50/50 designed: (60-50)^2/50 + (40-50)^2/50 = 4.0
    val skew = (Seq.fill(60)("A") ++ Seq.fill(40)("B")).toDF("arm")
    val s = Experiment.srmCheck(skew, "arm", Map("A" -> 0.5, "B" -> 0.5))
      .collect().map(x => x.getAs[String]("arm") -> x).toMap
    assert(s("A").getAs[Double]("contrib") == 2.0)
    assert(s("B").getAs[Double]("contrib") == 2.0)
    assert(s("A").getAs[Double]("chi2") == 4.0)
    assert(s("A").getAs[Long]("n") == 60L)
    assert(s("A").getAs[Double]("expected_n") == 50.0)
  }

  test("srmCheck: designed-but-unobserved arm counts 0; unknown arm fails fast") {
    val d = (Seq.fill(10)("A") ++ Seq.fill(10)("B")).toDF("arm")
    val r = Experiment.srmCheck(d, "arm",
      Map("A" -> 0.4, "B" -> 0.4, "C" -> 0.2))
      .collect().map(x => x.getAs[String]("arm") -> x).toMap
    assert(r("C").getAs[Long]("n") == 0L)
    assert(r("C").getAs[Double]("expected_n") == 4.0)
    assert(r("C").getAs[Double]("contrib") == 4.0) // (0-4)^2/4
    val bad = (Seq.fill(5)("A") ++ Seq.fill(5)("typo")).toDF("arm")
    val e = intercept[IllegalArgumentException] {
      Experiment.srmCheck(bad, "arm", Map("A" -> 0.5, "B" -> 0.5))
    }
    assert(e.getMessage.contains("typo"))
    // shares must sum to 1
    intercept[IllegalArgumentException] {
      Experiment.srmCheck(d, "arm", Map("A" -> 0.5, "B" -> 0.4))
    }
  }

  test("twoProportionZ: textbook counts and the fixed-order z") {
    // A: 200 users 120 converts (0.6); B: 200 users 100 converts (0.5)
    val rows = (Seq.tabulate(200)(i => ("A", i < 120)) ++
      Seq.tabulate(200)(i => ("B", i < 100))).toDF("arm", "conv")
    val r = Experiment.twoProportionZ(rows, "arm", col("conv"), "A", "B").head()
    assert(r.getAs[Long]("n_a") == 200L && r.getAs[Long]("s_a") == 120L)
    assert(r.getAs[Double]("p_a") == 0.6 && r.getAs[Double]("p_b") == 0.5)
    // pooled p = 220/400 = 0.55; se = sqrt(.55*.45*(1/200+1/200))
    val se = math.sqrt(0.55 * 0.45 * (1.0 / 200 + 1.0 / 200))
    val expectZ = BigDecimal(0.1 / se)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == expectZ)
    assert(r.getAs[Boolean]("significant_5pct") == (math.abs(0.1 / se) > 1.96))
    // degenerate: one empty arm -> null z, null flag
    val solo = Seq(("A", true), ("A", false)).toDF("arm", "conv")
    val s = Experiment.twoProportionZ(solo, "arm", col("conv"), "A", "B").head()
    assert(s.isNullAt(s.fieldIndex("z")))
    assert(s.isNullAt(s.fieldIndex("significant_5pct")))
  }

  test("cuped: balanced covariate gives exact theta; unbalanced case is self-consistent") {
    // x identically distributed per arm (cov(x, arm) = 0) and y = 2x + 5
    // for A, 2x for B: pooled theta = cov(x,y)/var(x) = 2 exactly, the
    // x-means cancel, and both deltas equal the designed +5 effect.
    val rows = (Seq.tabulate(50)(i => ("A", i.toDouble, 2.0 * i + 5.0)) ++
      Seq.tabulate(50)(i => ("B", i.toDouble, 2.0 * i)))
      .toDF("arm", "x", "y")
    val r = Experiment.cuped(rows, "arm", "y", "x", "A", "B").head()
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("theta") == 2.0)
    assert(r.getAs[Double]("delta_raw") == 5.0)
    assert(r.getAs[Double]("delta_adjusted") == 5.0)
    assert(r.getAs[Double]("rho2") > 0.99)
    // unbalanced x (A sees 0..49, B sees 10..59): the pooled theta picks
    // up the arm effect through cov(x, arm), so assert the identity
    // delta_adjusted = delta_raw - theta * (xbarA - xbarB) instead of a
    // closed form; the x-means are 24.5 and 34.5 by construction.
    val unb = (Seq.tabulate(50)(i => ("A", i.toDouble, 2.0 * i + 5.0)) ++
      Seq.tabulate(50)(i => ("B", (i + 10).toDouble, 2.0 * (i + 10))))
      .toDF("arm", "x", "y")
    val u = Experiment.cuped(unb, "arm", "y", "x", "A", "B").head()
    assert(u.getAs[Double]("delta_raw") == -15.0)
    // tolerance derivation: the identity is recomputed from the PUBLISHED
    // theta, which is rounded at 6 dp while the operator used the exact
    // one — error bound 0.5e-6 * |xbarA - xbarB| = 5e-6, plus 0.5e-6 for
    // the final rounding of delta_adjusted itself
    val adjExpect = BigDecimal(-15.0 - u.getAs[Double]("theta") * (24.5 - 34.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(u.getAs[Double]("delta_adjusted") - adjExpect) < 6e-6)
    // orthogonal covariate: identical x distribution per arm, y independent
    // of x -> theta 0, adjusted == raw
    val orth = (Seq.tabulate(40)(i => ("A", (i % 4).toDouble, 10.0)) ++
      Seq.tabulate(40)(i => ("B", (i % 4).toDouble, 7.0))).toDF("arm", "x", "y")
    val o = Experiment.cuped(orth, "arm", "y", "x", "A", "B").head()
    assert(o.getAs[Double]("theta") == 0.0)
    assert(o.getAs[Double]("delta_raw") == 3.0)
    assert(o.getAs[Double]("delta_adjusted") == 3.0)
    // constant covariate: var(x) = 0 -> null theta/adjusted, raw still out
    val const = (Seq.fill(10)(("A", 1.0, 4.0)) ++ Seq.fill(10)(("B", 1.0, 1.0)))
      .toDF("arm", "x", "y")
    val c = Experiment.cuped(const, "arm", "y", "x", "A", "B").head()
    assert(c.isNullAt(c.fieldIndex("theta")))
    assert(c.getAs[Double]("delta_raw") == 3.0)
  }

  test("ratioMetricCI: matches the delta-method formula; zero denominator is null") {
    // units (num, den): (10,5), (20,10), (40,10) -> R = 70/25 = 2.8
    val df = Seq((10.0, 5.0), (20.0, 10.0), (40.0, 10.0)).toDF("num", "den")
    val r = Experiment.ratioMetricCI(df, "num", "den").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("num_sum") == 70.0 && r.getAs[Double]("den_sum") == 25.0)
    assert(r.getAs[Double]("ratio") == 2.8)
    // replicate the operator's fixed double order from exact moments
    val (n, sn, sd, snn, snd, sdd) = (3.0, 70.0, 25.0, 2100.0, 650.0, 225.0)
    val cNN = (snn - sn * sn / n) / (n - 1.0)
    val cND = (snd - sn * sd / n) / (n - 1.0)
    val cDD = (sdd - sd * sd / n) / (n - 1.0)
    val ratio = sn / sd
    val varR = (cNN - 2.0 * ratio * cND + ratio * ratio * cDD) /
      (n * (sd / n) * (sd / n))
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("se") == r6(math.sqrt(varR)))
    assert(r.getAs[Double]("ci_low") == r6(ratio - 1.959964 * math.sqrt(varR)))
    assert(r.getAs[Double]("ci_high") == r6(ratio + 1.959964 * math.sqrt(varR)))
    // all-zero denominator: ratio/se/CI null, sums still reported
    val zero = Seq((1.0, 0.0), (2.0, 0.0)).toDF("num", "den")
    val z = Experiment.ratioMetricCI(zero, "num", "den").head()
    assert(z.isNullAt(z.fieldIndex("ratio")) && z.isNullAt(z.fieldIndex("se")))
    assert(z.getAs[Double]("num_sum") == 3.0)
  }

  test("jackknifeRatioCI: two-bucket closed form; bad leave-one-out is null") {
    // bucket 0: (10,5); bucket 1: (30,10) -> R = 40/15, loo = 3.0, 2.0,
    // mean 2.5, ss = 0.5, se = sqrt(1/2)*sqrt(0.5) = 0.5
    val df = Seq((0L, 10.0, 5.0), (1L, 30.0, 10.0)).toDF("b", "num", "den")
    val r = Experiment.jackknifeRatioCI(df, "b", "num", "den").head()
    assert(r.getAs[Int]("buckets") == 2)
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("ratio") == 2.666667)
    assert(r.getAs[Double]("se_jack") == 0.5)
    assert(r.getAs[Double]("ci_low") == 1.686685)  // 2.666667-ish - 0.979982
    assert(r.getAs[Double]("ci_high") == 3.646649)
    // a bucket holding the ENTIRE denominator makes its leave-one-out
    // ratio undefined -> the jackknife SE is null, the ratio survives
    val degen = Seq((0L, 10.0, 15.0), (1L, 30.0, 0.0)).toDF("b", "num", "den")
    val d = Experiment.jackknifeRatioCI(degen, "b", "num", "den").head()
    assert(d.getAs[Double]("ratio") == 2.666667)
    assert(d.isNullAt(d.fieldIndex("se_jack")))
  }

  test("mcNemar: textbook discordant cells; no discordance is null") {
    // both 20, a-only 15, b-only 5, neither 10:
    // chi2_cc = (|15-5|-1)^2/20 = 4.05 > 3.841459
    val rows = (Seq.fill(20)((true, true)) ++ Seq.fill(15)((true, false)) ++
      Seq.fill(5)((false, true)) ++ Seq.fill(10)((false, false)))
      .toDF("a", "b")
    val r = Experiment.mcNemar(rows, col("a"), col("b")).head()
    assert(r.getAs[Long]("n") == 50L)
    assert(r.getAs[Long]("both_pass") == 20L && r.getAs[Long]("neither") == 10L)
    assert(r.getAs[Long]("a_only") == 15L && r.getAs[Long]("b_only") == 5L)
    assert(r.getAs[Double]("chi2_cc") == 4.05)
    assert(r.getAs[Boolean]("significant_5pct"))
    // perfect agreement: b + c = 0 -> null chi2, null flag
    val same = Seq.fill(10)((true, true)).toDF("a", "b")
    val s = Experiment.mcNemar(same, col("a"), col("b")).head()
    assert(s.isNullAt(s.fieldIndex("chi2_cc")))
    assert(s.isNullAt(s.fieldIndex("significant_5pct")))
  }

  test("mdeTable: closed-form MDE per segment; degenerate p is null") {
    // segment s1: 200 units, 50 successes (p = 0.25);
    // s2: 100 units, all successes (p = 1 -> null MDE)
    val df = (Seq.tabulate(200)(i => ("s1", i < 50)) ++
      Seq.fill(100)(("s2", true)))
      .toDF("seg", "ok")
    val out = Experiment.mdeTable(df, "seg", col("ok")).collect()
      .map(x => x.getAs[String]("segment") -> x).toMap
    val s1 = out("s1")
    assert(s1.getAs[Long]("n") == 200L && s1.getAs[Long]("successes") == 50L)
    assert(s1.getAs[Double]("p") == 0.25)
    val mde = (1.959964 + 0.841621) * math.sqrt(2.0 * 0.25 * 0.75 / 100.0)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s1.getAs[Double]("mde_abs") == r6(mde))
    assert(s1.getAs[Double]("mde_rel") == r6(mde / 0.25))
    assert(out("s2").isNullAt(out("s2").fieldIndex("mde_abs")))
    assert(out("s2").getAs[Double]("p") == 1.0)
  }

  test("diffInDiff: parallel-trends fixture; an empty cell nulls the estimate") {
    // A: pre mean 10, post mean 15; B: pre 8, post 9 -> DiD = 5 - 1 = 4
    val rows = Seq(
      ("A", false, 9.0), ("A", false, 11.0), ("A", true, 14.0), ("A", true, 16.0),
      ("B", false, 7.0), ("B", false, 9.0), ("B", true, 8.0), ("B", true, 10.0))
      .toDF("arm", "post", "v")
    val r = Experiment.diffInDiff(rows, "arm", col("post"), "v", "A", "B").head()
    assert(r.getAs[Double]("mean_a_pre") == 10.0 && r.getAs[Double]("mean_a_post") == 15.0)
    assert(r.getAs[Double]("mean_b_pre") == 8.0 && r.getAs[Double]("mean_b_post") == 9.0)
    assert(r.getAs[Double]("did") == 4.0)
    assert(r.getAs[Long]("n_a_pre") == 2L)
    // B never observed post-period: the estimate is undefined, not 0
    val missing = rows.filter(!(col("arm") === "B" && col("post")))
    val m = Experiment.diffInDiff(missing, "arm", col("post"), "v", "A", "B").head()
    assert(m.isNullAt(m.fieldIndex("did")))
    assert(m.isNullAt(m.fieldIndex("mean_b_post")))
  }

  test("relativeLiftCI: matches the ratio delta method; zero control rate is null") {
    // A: 120/200 (0.6); B: 100/200 (0.5) -> lift = +20%
    val rows = (Seq.tabulate(200)(i => ("A", i < 120)) ++
      Seq.tabulate(200)(i => ("B", i < 100))).toDF("arm", "conv")
    val r = Experiment.relativeLiftCI(rows, "arm", col("conv"), "A", "B").head()
    assert(r.getAs[Double]("lift") == 0.2)
    val (pa, pb, na, nb) = (0.6, 0.5, 200.0, 200.0)
    val va = pa * (1.0 - pa) / na; val vb = pb * (1.0 - pb) / nb
    val se = math.sqrt(va / (pb * pb) + pa * pa * vb / (pb * pb * pb * pb))
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ci_low") == r6(pa / pb - 1.0 - 1.959964 * se))
    assert(r.getAs[Double]("ci_high") == r6(pa / pb - 1.0 + 1.959964 * se))
    // control never converts: the ratio is undefined, not infinite
    val zeroB = (Seq.fill(10)(("A", true)) ++ Seq.fill(10)(("B", false)))
      .toDF("arm", "conv")
    val z = Experiment.relativeLiftCI(zeroB, "arm", col("conv"), "A", "B").head()
    assert(z.isNullAt(z.fieldIndex("lift")))
    assert(z.isNullAt(z.fieldIndex("ci_low")))
  }

  test("clusterRobustZ: clustered exposure deflates the naive z below significance") {
    // 10 clusters per arm, 10 units each, outcomes IDENTICAL within a
    // cluster (the worst-case intra-cluster correlation): A has 8
    // all-pass clusters, B has 5. The per-unit z test sees 100 vs 100
    // "independent" units and fires (z ~ 4.4); the cluster-robust test
    // sees 10 vs 10 draws and correctly does not.
    def cluster(arm: String, cid: String, pass: Boolean) =
      Seq.fill(10)((arm, cid, pass))
    val rows = ((0 until 10).flatMap(i => cluster("A", s"a$i", i < 8)) ++
      (0 until 10).flatMap(i => cluster("B", s"b$i", i < 5)))
      .toDF("arm", "household", "ok")
    val naive = Experiment.twoProportionZ(rows, "arm", col("ok"), "A", "B")
      .head()
    assert(naive.getAs[Boolean]("significant_5pct"))
    val r = Experiment.clusterRobustZ(rows, "arm", "household",
      col("ok"), "A", "B").head()
    assert(r.getAs[Long]("n_a") == 100L && r.getAs[Long]("clusters_a") == 10L)
    assert(r.getAs[Double]("p_a") == 0.8 && r.getAs[Double]("p_b") == 0.5)
    // hand CR0: ss_a = 8*(10-8)^2 + 2*(0-8)^2 = 160; ss_b = 10*25 = 250
    val se = math.sqrt((10.0 / 9.0) * 160.0 / 10000.0 +
      (10.0 / 9.0) * 250.0 / 10000.0)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == r6((0.8 - 0.5) / se))
    assert(!r.getAs[Boolean]("significant_5pct"))
    // single cluster in an arm: variance undefined -> NULL z
    val solo = (cluster("A", "a0", true) ++ cluster("B", "b0", false) ++
      cluster("B", "b1", true)).toDF("arm", "household", "ok")
    val s = Experiment.clusterRobustZ(solo, "arm", "household",
      col("ok"), "A", "B").head()
    assert(s.isNullAt(s.fieldIndex("z")))
  }

  test("srmBySegment: a skew confined to one segment flags there and only there") {
    val rows = ((Seq.fill(50)("A") ++ Seq.fill(50)("B")).map(("mobile", _)) ++
      (Seq.fill(30)("A") ++ Seq.fill(10)("B")).map(("web", _)) ++
      Seq(("web", "typo"))).toDF("seg", "arm")
    val out = Experiment.srmBySegment(rows, "seg", "arm",
        Map("A" -> 0.5, "B" -> 0.5))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(out("mobile").getAs[Double]("chi2") == 0.0)
    assert(!out("mobile").getAs[Boolean]("srm_flag"))
    // (30-20)^2/20 + (10-20)^2/20 = 10
    assert(out("web").getAs[Double]("chi2") == 10.0)
    assert(out("web").getAs[Boolean]("srm_flag"))
    assert(out("web").getAs[Long]("n") == 40L) // designed arms only
    assert(out("web").getAs[Long]("n_unknown") == 1L)
    assert(out("web").getAs[Int]("dof") == 1)
  }

  test("aaCalibration: deterministic, near-nominal on null data, degenerates counted") {
    val units = Seq.tabulate(400)(i => (i.toLong, i % 5 == 0))
      .toDF("id", "ok")
    val r1 = Experiment.aaCalibration(units, "id", col("ok"), 50).head()
    val r2 = Experiment.aaCalibration(units, "id", col("ok"), 50).head()
    assert(r1 == r2, "seeded splits must replay bit-for-bit")
    assert(r1.getAs[Long]("n_experiments") == 50L)
    assert(r1.getAs[Long]("n_degenerate") == 0L)
    // null data: the rate must sit near alpha = 5%, certainly under 20%
    assert(r1.getAs[Double]("false_positive_rate") <= 0.2)
    // constant outcome: pooled p = 1 in every split -> all degenerate
    val const = Seq.tabulate(50)(i => (i.toLong, true)).toDF("id", "ok")
    val c = Experiment.aaCalibration(const, "id", col("ok"), 20).head()
    assert(c.getAs[Long]("n_degenerate") == 20L)
    assert(c.isNullAt(c.fieldIndex("false_positive_rate")))
  }

  test("readout bundle: every table evaluates and agrees with its standalone operator") {
    val perUnit = Seq.tabulate(100) { i =>
      val arm = if (i % 2 == 0) "A" else "B"
      (arm, if (i % 3 == 0) 1L else 0L, (i % 7).toDouble + 1.0,
        (i % 5).toDouble + 1.0, (i % 10).toLong)
    }.toDF("arm", "converted", "y", "x", "bucket")
    val daily = Seq.tabulate(60)(i =>
      (i % 3L, if (i % 2 == 0) "A" else "B", if (i % 4 == 0) 1L else 0L))
      .toDF("day", "arm", "converted")
    val r = Experiment.readout(perUnit, daily)
    // every frame materializes non-empty
    r.all.foreach { case (name, df) =>
      assert(df.count() > 0, s"readout table $name is empty") }
    // spot-parity with the standalone operators on identical inputs
    assert(r.srm.head().getAs[Double]("chi2") ==
      Experiment.srmCheck(perUnit, "arm", Map("A" -> 0.5, "B" -> 0.5))
        .head().getAs[Double]("chi2"))
    assert(r.winsorized.head().getAs[Double]("delta_winsorized") ==
      Experiment.winsorizedEffect(perUnit, "arm", "y", 0.95, "A", "B")
        .head().getAs[Double]("delta_winsorized"))
    assert(r.monitor.count() == 3L)
    // the Bayesian table rides along under the guard and parity-checks
    val bp = r.bayes.get.head().getAs[Double]("p_b_beats_a")
    assert(bp >= 0.0 && bp <= 1.0)
    assert(bp == Experiment.bayesianAB(perUnit, "arm",
      col("converted") === 1L, "A", "B").head().getAs[Double]("p_b_beats_a"))
  }

  test("alwaysValidMonitor: p stays 1 through no-signal days, drops on the planted effect") {
    // day 0: only arm A (llr undefined); day 1: balanced 5/10 vs 5/10
    // (delta 0, llr < 0, p still 1); day 2: cumulative 15/20 vs 5/20
    val rows = (Seq.fill(2)((0L, "A", false)) ++
      Seq.tabulate(8)(i => (1L, "A", i < 5)) ++
      Seq.tabulate(10)(i => (1L, "B", i < 5)) ++
      Seq.fill(10)((2L, "A", true)) ++ Seq.fill(10)((2L, "B", false)))
      .toDF("day", "arm", "conv")
    val out = Experiment.alwaysValidMonitor(
        rows, "day", "arm", col("conv"), "A", "B")
      .collect().map(r => r.getAs[Long]("day") -> r).toMap
    assert(out(0L).isNullAt(out(0L).fieldIndex("llr")))
    assert(out(0L).getAs[Double]("always_valid_p") == 1.0)
    assert(out(1L).getAs[Double]("delta") == 0.0)
    assert(out(1L).getAs[Double]("llr") < 0.0)
    assert(out(1L).getAs[Double]("always_valid_p") == 1.0) // peek is free
    // day 2 closed form in the operator's order (tau = 0.1)
    assert(out(2L).getAs[Long]("n_a") == 20L && out(2L).getAs[Long]("s_a") == 15L)
    val v = 0.5 * (1.0 - 0.5) * (1.0 / 20 + 1.0 / 20)
    val t2 = 0.1 * 0.1
    val llr = BigDecimal(0.5 * math.log(v / (v + t2)) +
      0.5 * 0.5 * t2 / (2.0 * v * (v + t2)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L).getAs[Double]("llr") == llr)
    val p = BigDecimal(math.exp(-math.max(0.0, llr)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L).getAs[Double]("always_valid_p") == p)
    assert(p < 0.3) // the planted effect is visible
  }

  test("winsorizedEffect: pooled cap neutralizes a planted whale; clip count surfaced") {
    // pooled p80 of {1,1,2,2,3,3,4,4,5,100} interpolates to 4.2; both
    // arms cap to {1,2,3,4,4.2} -> winsorized delta exactly 0 while the
    // whale drives the raw delta to +19
    val rows = (Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(("A", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("B", _))).toDF("arm", "v")
    val r = Experiment.winsorizedEffect(rows, "arm", "v", 0.8, "A", "B").head()
    assert(r.getAs[Double]("cap") == 4.2)
    assert(r.getAs[Long]("n_capped") == 2L)
    assert(r.getAs[Double]("mean_a_w") == 2.84)
    assert(r.getAs[Double]("mean_b_w") == 2.84)
    assert(r.getAs[Double]("delta_winsorized") == 0.0)
    assert(r.getAs[Double]("delta_raw") == 19.0)
  }

  test("upliftByQuantile: top bucket carries the planted uplift; Qini walk closes at 0") {
    // two buckets around the pooled median 4.5: treatment converts only
    // above it, control only below -> uplift +1 then -1, Qini 2 then 0
    val rows = Seq(
      ("A", 5.0, true), ("A", 7.0, true), ("B", 6.0, false), ("B", 8.0, false),
      ("A", 1.0, false), ("A", 3.0, false), ("B", 2.0, true), ("B", 4.0, true))
      .toDF("arm", "score", "conv")
    val out = Experiment.upliftByQuantile(
      rows, "arm", "score", col("conv"), 2, "A", "B").collect()
    assert(out.map(_.getAs[Int]("bucket")).toSeq == Seq(1, 0))
    val top = out(0); val bot = out(1)
    assert(top.getAs[Double]("p_a") == 1.0 && top.getAs[Double]("p_b") == 0.0)
    assert(top.getAs[Double]("uplift") == 1.0)
    assert(top.getAs[Double]("qini") == 2.0)
    assert(bot.getAs[Double]("uplift") == -1.0)
    assert(bot.getAs[Double]("qini") == 0.0) // ranking gain nets out
    // an arm empty within a bucket: its rate (and the uplift) is null
    val sparse = Seq(("A", 9.0, true), ("A", 1.0, false), ("B", 2.0, false))
      .toDF("arm", "score", "conv")
    val s = Experiment.upliftByQuantile(
        sparse, "arm", "score", col("conv"), 2, "A", "B")
      .collect().map(x => x.getAs[Int]("bucket") -> x).toMap
    assert(s(1).isNullAt(s(1).fieldIndex("p_b")))
    assert(s(1).isNullAt(s(1).fieldIndex("uplift")))
  }

  test("quantileTreatmentEffect: interpolated per-arm percentiles and deltas") {
    // A = 1..9, B = 11..19: p50 = 5 vs 15, p90 = 8.2 vs 18.2 (linear
    // interpolation at rank 0.9*(9-1) = 7.2) -> QTE -10 at both
    val rows = ((1 to 9).map(v => ("A", v.toDouble)) ++
      (11 to 19).map(v => ("B", v.toDouble))).toDF("arm", "v")
    val out = Experiment.quantileTreatmentEffect(
        rows, "arm", "v", Seq(0.5, 0.9), "A", "B")
      .collect().map(r => r.getAs[Double]("q") -> r).toMap
    assert(out(0.5).getAs[Double]("p_a") == 5.0)
    assert(out(0.5).getAs[Double]("p_b") == 15.0)
    assert(out(0.5).getAs[Double]("qte") == -10.0)
    assert(out(0.9).getAs[Double]("p_a") == 8.2)
    assert(out(0.9).getAs[Double]("p_b") == 18.2)
    assert(out(0.9).getAs[Double]("qte") == -10.0)
    // an arm with no rows: its percentile (and the delta) is null
    val solo = (1 to 5).map(v => ("A", v.toDouble)).toDF("arm", "v")
    val s = Experiment.quantileTreatmentEffect(
      solo, "arm", "v", Seq(0.5), "A", "B").head()
    assert(s.getAs[Double]("p_a") == 3.0)
    assert(s.isNullAt(s.fieldIndex("p_b")) && s.isNullAt(s.fieldIndex("qte")))
  }

  test("postStratifiedEffect removes planted composition bias; missing-arm strata counted out") {
    // uniform +2 effect in both strata, but A over-samples the
    // high-value stratum: raw delta 7.0, post-stratified exactly 2.0
    def unit(arm: String, s: String, v: Double, n: Int) =
      Seq.fill(n)((arm, s, v))
    val rows = (unit("A", "s1", 10.0, 10) ++ unit("B", "s1", 8.0, 30) ++
      unit("A", "s2", 20.0, 30) ++ unit("B", "s2", 18.0, 10) ++
      unit("A", "s3", 99.0, 5)) // s3 never observed in B -> excluded
      .toDF("arm", "stratum", "v")
    val r = Experiment.postStratifiedEffect(
      rows, "arm", "stratum", "v", "A", "B").head()
    assert(r.getAs[Long]("n") == 85L)
    assert(r.getAs[Int]("strata_total") == 3)
    assert(r.getAs[Int]("strata_used") == 2)
    assert(r.getAs[Double]("delta_raw") ==
      BigDecimal((100.0 + 600.0 + 495.0) / 45.0 - 420.0 / 40.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("delta_post_strat") == 2.0)
    // no stratum observed in both arms: the estimate is undefined
    val disjoint = (unit("A", "s1", 1.0, 3) ++ unit("B", "s2", 2.0, 3))
      .toDF("arm", "stratum", "v")
    val d = Experiment.postStratifiedEffect(
      disjoint, "arm", "stratum", "v", "A", "B").head()
    assert(d.getAs[Int]("strata_used") == 0)
    assert(d.isNullAt(d.fieldIndex("delta_post_strat")))
  }

  test("bayesianAB: Cook's closed form on a textbook table; symmetry gives 0.5") {
    import spark.implicits._
    // A: 3/10, B: 7/10, Beta(1,1) priors -> posteriors Beta(4,8), Beta(8,4)
    // P(pB > pA) = sum_{i=0}^{7} B(4+i,12)/((4+i... independently computed
    // with python mpmath-grade lgamma: 0.956946 at 6 dp
    val rows = (Seq.fill(3)(("A", 1)) ++ Seq.fill(7)(("A", 0)) ++
      Seq.fill(7)(("B", 1)) ++ Seq.fill(3)(("B", 0))).toDF("arm", "conv")
    val r = Experiment.bayesianAB(rows, "arm", col("conv") === 1, "A", "B")
      .head()
    assert(r.getAs[Long]("n_a") == 10L && r.getAs[Long]("s_a") == 3L)
    assert(r.getAs[Long]("n_b") == 10L && r.getAs[Long]("s_b") == 7L)
    assert(r.getAs[Double]("post_mean_a") == 0.333333)
    assert(r.getAs[Double]("post_mean_b") == 0.666667)
    assert(r.getAs[Double]("p_b_beats_a") == 0.956946)
    // identical arms: identical continuous posteriors tie at exactly 1/2
    val same = (Seq.fill(5)(("A", 1)) ++ Seq.fill(5)(("A", 0)) ++
      Seq.fill(5)(("B", 1)) ++ Seq.fill(5)(("B", 0))).toDF("arm", "conv")
    assert(Experiment.bayesianAB(same, "arm", col("conv") === 1, "A", "B")
      .head().getAs[Double]("p_b_beats_a") == 0.5)
    // the guard refuses unbounded driver work with the remedy named
    val e = intercept[IllegalArgumentException] {
      Experiment.bayesianAB(rows, "arm", col("conv") === 1, "A", "B",
        maxExact = 10L)
    }
    assert(e.getMessage.contains("twoProportionZ"))
  }

  test("regressionDiscontinuity: recovers an exact planted jump on a linear trend") {
    // y = 2x + 10*[x >= 25]: slopes 2 on both sides, effect exactly 10
    val df = (15 to 35).map(x =>
      (x, 2 * x + (if (x >= 25) 10 else 0))).toDF("x", "y")
    val r = Experiment.regressionDiscontinuity(df, "x", "y",
      cutoff = 25, bandwidth = 10).head()
    assert(r.getAs[Long]("n_l") == 10L && r.getAs[Long]("n_r") == 11L)
    assert(r.getAs[Double]("slope_l") == 2.0)
    assert(r.getAs[Double]("slope_r") == 2.0)
    assert(r.getAs[Double]("yhat_left") == 50.0)
    assert(r.getAs[Double]("yhat_right") == 60.0)
    assert(r.getAs[Double]("effect") == 10.0)
    // a side with a single x level cannot fit a line -> NULL effect
    val flat = Seq((24, 1), (24, 2), (26, 3), (27, 4)).toDF("x", "y")
    val z = Experiment.regressionDiscontinuity(flat, "x", "y",
      cutoff = 25, bandwidth = 10).head()
    assert(z.isNullAt(z.fieldIndex("effect")))
  }

  test("ivWald: hand LATE; weak first stage refuses a ratio") {
    // z=1: y mean 15, d rate 1; z=0: y mean 10, d rate 0.5
    // itt 5, first stage 0.5 -> LATE 10
    val df = Seq((1L, true, true, 10.0), (2L, true, true, 20.0),
      (3L, false, false, 10.0), (4L, false, true, 10.0))
      .toDF("id", "z", "d", "y")
    val r = Experiment.ivWald(df, col("z"), col("d"), "y").head()
    assert(r.getAs[Double]("itt") == 5.0)
    assert(r.getAs[Double]("first_stage") == 0.5)
    assert(r.getAs[Double]("late") == 10.0)
    // identical take-up rates: zero first stage -> NULL LATE
    val weak = Seq((1L, true, true, 10.0), (2L, false, true, 99.0))
      .toDF("id", "z", "d", "y")
    val w = Experiment.ivWald(weak, col("z"), col("d"), "y").head()
    assert(w.getAs[Double]("first_stage") == 0.0)
    assert(w.isNullAt(w.fieldIndex("late")))
  }

  test("tostEquivalence: identical arms prove equivalence; a real gap fails") {
    // pA = pB = 0.5 at n=1000 each: se = sqrt(2*0.25/1000) = 0.0223607,
    // z_low = 0.05/se = 2.236068 > 1.645, z_up = -2.236068 -> equivalent
    val same = spark.range(2000).select(
      when($"id" < 1000, "A").otherwise("B").as("arm"),
      ($"id" % 2 === 0).as("conv"))
    val r = Experiment.tostEquivalence(same, "arm", col("conv"),
      "A", "B", margin = 0.05).head()
    assert(r.getAs[Long]("n_a") == 1000L && r.getAs[Long]("s_a") == 500L)
    assert(r.getAs[Double]("diff") == 0.0)
    assert(r.getAs[Double]("z_low") == 2.236068)
    assert(r.getAs[Double]("z_up") == -2.236068)
    assert(r.getAs[Boolean]("equivalent"))
    // pB - pA = 0.2 with margin 0.05: the upper test cannot reject
    val gap = spark.range(2000).select(
      when($"id" < 1000, "A").otherwise("B").as("arm"),
      (when($"id" < 1000, $"id" % 10 < 4).otherwise($"id" % 10 < 6))
        .as("conv"))
    val g = Experiment.tostEquivalence(gap, "arm", col("conv"),
      "A", "B", margin = 0.05).head()
    assert(g.getAs[Double]("diff") == 0.2)
    assert(g.getAs[Double]("z_up") > 0.0)
    assert(!g.getAs[Boolean]("equivalent"))
    // empty arm: NULL z's and verdict, no divide-by-zero task failure
    val empty = Experiment.tostEquivalence(
      same.filter($"arm" === "A"), "arm", col("conv"),
      "A", "B", margin = 0.05).head()
    assert(empty.isNullAt(empty.fieldIndex("z_low")))
    assert(empty.isNullAt(empty.fieldIndex("equivalent")))
  }
}
