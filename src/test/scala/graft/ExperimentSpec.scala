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
}
