package graft

import graft.operators.{Eval, Graph, Stats}
import org.apache.spark.sql.functions._

/** Hand-derived fixtures for the round-13 evaluation wave: every
  * expected constant below is worked out on paper from the closed-form
  * definition, independent of both the implementation and the DuckDB
  * oracle.
  */
class EvalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("calibration: bins, mean score, pos rate") {
    // 4 rows in bin 2 (scores .20/.25), 2 rows in bin 9+top (score 1.0)
    val df = Seq((0.20, true), (0.20, false), (0.25, true), (0.25, true),
      (1.0, true), (1.0, false)).toDF("score", "y")
    val r = Eval.calibration(df, "score", col("y"), nBins = 10)
      .orderBy("bin").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("bin") == 2L)
    assert(r(0).getAs[Long]("n") == 4L)
    assert(r(0).getAs[Long]("n_pos") == 3L)
    assert(r(0).getAs[Double]("mean_score") == 0.225)
    assert(r(0).getAs[Double]("pos_rate") == 0.75)
    // score 1.0 clamps into the top bin (9), not a phantom bin 10
    assert(r(1).getAs[Long]("bin") == 9L)
    assert(r(1).getAs[Double]("pos_rate") == 0.5)
  }

  test("brier decomposition: identity holds when scores are bin-constant") {
    // two bins, constant score within each:
    //   bin A: s=0.25, outcomes (1,0)     -> ybar_A = 0.5
    //   bin B: s=0.75, outcomes (1,1,1,0) -> ybar_B = 0.75
    // brier = [(.75)^2 + (.25)^2 + 3*(.25)^2 + (.75)^2] / 6 = 1.5/6 = 0.25
    // wait: rows: (0.25,1):d=-.75; (0.25,0):d=.25; (0.75,1)x3:d=-.25;
    // (0.75,0):d=.75 -> sum sq = .5625+.0625+3*.0625+.5625 = 1.375
    // brier = 1.375/6 = 0.229167
    // ybar = 4/6 = 0.666667; unc = 2/9 = 0.222222
    // rel = [2*(0.25-0.5)^2 + 4*(0.75-0.75)^2]/6 = 0.125/6 = 0.020833
    // res = [2*(0.5-2/3)^2 + 4*(0.75-2/3)^2]/6 = [2*(1/36)+4*(1/144)]/6
    //     = (1/18 + 1/36)/6 = (1/12)/6 = 0.013889
    // rel - res + unc = 0.020833 - 0.013889 + 0.222222 = 0.229167 = brier
    val df = Seq((0.25, true), (0.25, false), (0.75, true), (0.75, true),
      (0.75, true), (0.75, false)).toDF("score", "y")
    val r = Eval.brierDecomposition(df, "score", col("y"), nBins = 4).head()
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("brier") == 0.229167)
    assert(r.getAs[Double]("reliability") == 0.020833)
    assert(r.getAs[Double]("resolution") == 0.013889)
    assert(r.getAs[Double]("uncertainty") == 0.222222)
    assert(math.abs(r.getAs[Double]("wb_var")) < 1e-5)
  }

  test("threshold sweep: confusion cells and metrics at one threshold") {
    // scores .2/.4/.6/.8 with labels F/T/F/T; at t=0.5: tp=1(.8T),
    // fp=1(.6F), fn=1(.4T), tn=1(.2F); p=r=f1=acc=0.5
    val df = Seq((0.2, false), (0.4, true), (0.6, false), (0.8, true))
      .toDF("score", "y")
    val r = Eval.thresholdMetrics(df, "score", col("y"), Seq(0.0, 0.5, 1.0))
      .orderBy("threshold").collect()
    assert(r.length == 3)
    val t5 = r(1)
    assert(t5.getAs[Long]("tp") == 1L && t5.getAs[Long]("fp") == 1L &&
      t5.getAs[Long]("fn") == 1L && t5.getAs[Long]("tn") == 1L)
    assert(t5.getAs[Double]("precision") == 0.5)
    assert(t5.getAs[Double]("f1") == 0.5)
    // t=0.0 takes everything: recall 1, precision = base rate 0.5
    assert(r(0).getAs[Double]("recall") == 1.0)
    // t=1.0 takes nothing: precision NULL, recall 0, f1 0
    assert(r(2).isNullAt(r(2).fieldIndex("precision")))
    assert(r(2).getAs[Double]("recall") == 0.0)
    assert(r(2).getAs[Double]("f1") == 0.0)
  }

  test("lift table: cumulative gain and lift by descending score") {
    // levels: 0.9 (2 rows, 2 pos), 0.5 (2 rows, 1 pos), 0.1 (4 rows, 1 pos)
    // base rate 4/8 = 0.5
    // at 0.9: depth .25, gain .5, lift (2/2)/(.5) = 2.0
    // at 0.5: depth .5, gain .75, lift (3/4)/.5 = 1.5
    // at 0.1: depth 1, gain 1, lift 1
    val df = Seq((0.9, true), (0.9, true), (0.5, true), (0.5, false),
      (0.1, true), (0.1, false), (0.1, false), (0.1, false))
      .toDF("score", "y")
    val r = Eval.liftTable(df, "score", col("y"))
      .orderBy(col("score").desc).collect()
    assert(r.map(_.getAs[Double]("lift")).toSeq == Seq(2.0, 1.5, 1.0))
    assert(r.map(_.getAs[Double]("gain")).toSeq == Seq(0.5, 0.75, 1.0))
    assert(r(0).getAs[Double]("depth") == 0.25)
  }

  test("weight of evidence: woe sign, IV total, zero-cell exclusion") {
    // cat a: 3 pos, 1 neg; cat b: 1 pos, 3 neg; cat c: 2 pos, 0 neg
    // totals: pos 6, neg 4
    // woe_a = ln((3/6)/(1/4)) = ln 2 = 0.693147
    // woe_b = ln((1/6)/(3/4)) = ln(2/9) = -1.504077
    // iv = (.5-.25)*ln2 + (1/6-.75)*ln(2/9) = 0.173287 + 0.877378 = 1.050665
    // cat c excluded (neg = 0)
    val df = Seq(("a", true), ("a", true), ("a", true), ("a", false),
      ("b", true), ("b", false), ("b", false), ("b", false),
      ("c", true), ("c", true)).toDF("cat", "y")
    val r = Eval.weightOfEvidence(df, "cat", col("y")).orderBy("category")
      .collect()
    assert(r.length == 3)
    assert(r(0).getAs[Double]("woe") == 0.693147)
    assert(r(1).getAs[Double]("woe") == -1.504077)
    assert(r(2).isNullAt(r(2).fieldIndex("woe")))
    assert(r(0).getAs[Double]("iv_total") == 1.050665)
    assert(r(0).getAs[Long]("n_excluded") == 1L)
  }

  test("jsDivergence: identical halves give 0; disjoint give ln 2") {
    val a = Seq("x", "x", "y").toDF("c")
    assert(Stats.jsDivergence(a, a, "c").head().getAs[Double]("jsd") == 0.0)
    val d = Stats.jsDivergence(Seq("x", "x").toDF("c"),
      Seq("y").toDF("c"), "c").head()
    // disjoint supports: JSD = ln 2, normalized 1
    assert(d.getAs[Double]("jsd") == 0.693147)
    assert(d.getAs[Double]("jsd_norm") == 1.0)
    assert(d.getAs[Long]("n_cats") == 2L)
  }

  test("wasserstein1: shifted point masses move distance = shift") {
    // ref all at 1.0, cur all at 3.5 -> W1 = 2.5 regardless of counts
    val r = Stats.wasserstein1(Seq(1.0, 1.0).toDF("v"),
      Seq(3.5, 3.5, 3.5).toDF("v"), "v").head()
    assert(r.getAs[Double]("wasserstein1") == 2.5)
    // identical -> 0
    val z = Stats.wasserstein1(Seq(1.0, 2.0).toDF("v"),
      Seq(1.0, 2.0).toDF("v"), "v").head()
    assert(z.getAs[Double]("wasserstein1") == 0.0)
  }

  test("brownForsythe: equal spreads give F = 0-ish; unequal separate") {
    // group a: {1,2,3} (med 2, z = 1,0,1); group b: {10,20,30}
    // (med 20, z = 10,0,10) -> z-means differ strongly
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0), ("b", 30.0)).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    // z-groups: a (1,0,1) mean 2/3; b (10,0,10) mean 20/3
    // SSB = 3*(2/3-11/3)^2*... = closed form: 2*3*(3)^2/2 = 54? compute:
    // grand mean 11/3; SSB = 3*(2/3-11/3)^2 + 3*(20/3-11/3)^2 = 3*9+3*9 = 54
    // SSW = a: (1-2/3)^2*2 + (0-2/3)^2 = 2/9*... = (1/9)*2+(4/9)=2/3
    //      b: (10-20/3)^2*2 + (20/3)^2 = (100/9)*2+400/9 = 600/9 = 66.667
    // F = (54/1)/((2/3+66.6667)/4) = 54/16.8333 = 3.207921
    assert(r.getAs[Double]("bf_stat") == 3.207921)
    // same spreads -> zero between-group z variance (up to the
    // documented 6-dp term quantization: SSB folds as
    // round(4/3,6)*2 - 16/6, i.e. -2e-6, not exact 0)
    val same = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    assert(math.abs(Stats.brownForsythe(same, "g", "v").head()
      .getAs[Double]("bf_stat")) < 1e-5)
  }

  test("cohensD: textbook two-group effect size") {
    // g1: {2,4,6} n=3 mean 4 var 4; g2: {5,7,9} n=3 mean 7 var 4
    // sp = 2; d = (4-7)/2 = -1.5; J = 1 - 3/(4*6-9) = 0.8
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 5.0), ("b", 7.0), ("b", 9.0)).toDF("g", "v")
    val r = Stats.cohensD(df, "g", "v").head()
    assert(r.getAs[Double]("cohens_d") == -1.5)
    assert(r.getAs[Double]("hedges_g") == -1.2)
  }

  test("moments: symmetric data has zero skew; uniform kurtosis known") {
    // {1,2,3}: mean 2, m2 = 2/3, m3 = 0, m4 = 2/3
    // skew 0; ex_kurt = (2/3)/(4/9) - 3 = 1.5 - 3 = -1.5
    val r = Stats.moments(Seq(("g", 1.0), ("g", 2.0), ("g", 3.0))
      .toDF("g", "v"), "g", "v").head()
    assert(r.getAs[Double]("mean") == 2.0)
    assert(r.getAs[Double]("variance") == 0.666667)
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("ex_kurtosis") == -1.5)
  }

  test("mannKendall: strictly increasing series has S = n(n-1)/2") {
    val df = (1 to 10).map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"),
      i.toDouble)).toDF("t", "v")
    val r = Stats.mannKendall(df, "t", "v").head()
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("s_stat") == 45L)
    // no ties: var = 10*9*25/18 = 125; z = 44/sqrt(125) = 3.9354796...
    assert(r.getAs[Double]("var_s") == 125.0)
    assert(r.getAs[Double]("z") == 3.93548)
  }

  test("trimmedMean: exact tie-splitting at the cut") {
    // 10 rows: 0, 1,2,3,4,5,6,7,8, 100; alpha=.1 -> lo=1, keep ranks 2..9
    // -> drop 0 and 100, mean of 1..8 = 4.5
    val df = (Seq(0.0, 100.0) ++ (1 to 8).map(_.toDouble))
      .map(("g", _)).toDF("g", "v")
    val r = Stats.trimmedMean(df, "g", "v", alpha = 0.1).head()
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 4.5)
    // ties straddling the cut contribute exactly their overlap:
    // values {1,1,1,9}: n=4, lo=0.4 -> floor 0? alpha .25 -> lo=1,
    // keep ranks 2..3 -> one of the 1s and... ranks: 1s at 1-3, 9 at 4.
    // kept for v=1: min(3,3)-max(0,1)=2; for v=9: min(4,3)-max(3,1)=0
    // mean = 2*1/2 = 1.0
    val t = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 9.0))
      .toDF("g", "v")
    val r2 = Stats.trimmedMean(t, "g", "v", alpha = 0.25).head()
    assert(r2.getAs[Long]("n_kept") == 2L)
    assert(r2.getAs[Double]("trimmed_mean") == 1.0)
  }

  test("assortativity: star graph is maximally disassortative") {
    // star K1,3: hub degree 3, leaves degree 1. Every edge joins (3,1):
    // r = -1 exactly... Pearson over constant-x pairs is 0/0 — use a
    // path P4 instead: degrees 1,2,2,1; directed pair list (both
    // orientations): (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    // sx=10, sxx=18, sxy=16, m=6 -> r = (96-100)/(108-100) = -0.5
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.assortativity(edges).head()
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Double]("assortativity") == -0.5)
  }

  test("retrievalMetrics: nDCG/MRR/MAP@3 on a worked two-query fixture") {
    // q1 ranked by score: i1(rel 3), i2(rel 0), i3(rel 1), i4(rel 2, cut)
    //   DCG@3  = 7/log2(2) + 0/log2(3) + 1/log2(4) = 7.5
    //   ideal order i1,i4,i3 -> IDCG@3 = 7 + 3/log2(3) + 0.5
    //            = 7 + 1.892789261 + 0.5 = 9.392789261 (9 dp terms)
    //   ndcg_1 = 7.5/9.392789261 = 0.798484858
    //   MRR: first relevant at rank 1 -> 1.0
    //   AP: hits at rk1 (prec 1) and rk3 (prec 2/3); R = 3 relevant ->
    //       (1 + 0.666666667)/3 = 0.555555556
    // q2 has no relevant item: contributes 0 to all three means.
    val df = Seq(
      (1L, 1, 10.0, 3L), (1L, 2, 9.0, 0L), (1L, 3, 8.0, 1L), (1L, 4, 7.0, 2L),
      (2L, 1, 5.0, 0L), (2L, 2, 4.0, 0L))
      .toDF("q", "item", "score", "rel")
    val r = Eval.retrievalMetrics(df, "q", "item", "score", "rel", k = 3).head()
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Double]("ndcg") == 0.399242)
    assert(r.getAs[Double]("mrr") == 0.5)
    assert(r.getAs[Double]("map") == 0.277778)
  }

  test("retrievalMetrics: perfect ranking gives ndcg = mrr = 1") {
    val df = Seq((1L, 1, 3.0, 2L), (1L, 2, 2.0, 1L), (1L, 3, 1.0, 0L))
      .toDF("q", "item", "score", "rel")
    val r = Eval.retrievalMetrics(df, "q", "item", "score", "rel", k = 3).head()
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    // AP = (1/1 + 2/2)/min(2,3) = 1
    assert(r.getAs[Double]("map") == 1.0)
  }

  test("rankBiasedOverlap: worked depth-3 fixture, p = 0.5") {
    // A = [x,y,z], B = [y,x,w]; overlaps by depth: 0, 2/2, 2/3
    // RBO = 0.5*(0.5^0*0 + 0.5^1*1 + 0.5^2*2/3)
    //     = 0.25 + 0.083333333 = 0.333333 (9 dp terms, 6 dp out)
    val df = Seq(("x", 3.0, 2.0), ("y", 2.0, 3.0), ("z", 1.0, 0.0),
      ("w", 0.0, 1.0)).toDF("item", "a", "b")
    val r = Eval.rankBiasedOverlap(df, "item", "a", "b",
      depth = 3, p = 0.5).head()
    assert(r.getAs[Double]("rbo") == 0.333333)
    assert(r.getAs[Double]("overlap_at_depth") == 0.666667)
    assert(r.getAs[Double]("residual_p_d") == 0.125)
    // identical rankings: RBO = (1-p) * sum p^(i-1) = 1 - p^d
    val same = Eval.rankBiasedOverlap(df, "item", "a", "a",
      depth = 3, p = 0.5).head()
    assert(same.getAs[Double]("rbo") == 0.875)
    assert(same.getAs[Double]("overlap_at_depth") == 1.0)
  }

  test("passAtK: closed-form binomial cases, per-k mean, guards") {
    // p1: n=4, c=2 -> pass@2 = 1 - C(2,2)/C(4,2) = 1 - 1/6 = 0.833333
    //                 pass@1 = 1 - C(2,1)/C(4,1) = 0.5
    // p2: n=3, c=3 -> pass@1 = 1 (numerator falling factorial hits 0)
    // p3: n=3, c=0 -> pass@2 = 1 - C(3,2)/C(3,2) = 0
    val rows = Seq.fill(2)(("p1", 1)) ++ Seq.fill(2)(("p1", 0)) ++
      Seq.fill(3)(("p2", 1)) ++ Seq.fill(3)(("p3", 0))
    val df = rows.toDF("prob", "ok")
    val out = Eval.passAtK(df, "prob", col("ok") === 1, Seq(1, 2))
      .collect().map(r => (r.getAs[String]("problem"),
        r.getAs[Int]("k")) -> r).toMap
    assert(out(("p1", 2)).getAs[Double]("pass_at_k") == 0.833333)
    assert(out(("p1", 1)).getAs[Double]("pass_at_k") == 0.5)
    assert(out(("p2", 1)).getAs[Double]("pass_at_k") == 1.0)
    assert(out(("p3", 2)).getAs[Double]("pass_at_k") == 0.0)
    // k=1 mean over p1,p2,p3: (0.5 + 1.0 + 0.0)/3 = 0.5
    assert(out(("p1", 1)).getAs[Long]("n_problems") == 3L)
    assert(out(("p1", 1)).getAs[Double]("mean_pass_at_k") == 0.5)
    // the exact-double bound guards refuse out-of-range k / maxAttempts
    intercept[IllegalArgumentException] {
      Eval.passAtK(df, "prob", col("ok") === 1, Seq(11))
    }
    intercept[IllegalArgumentException] {
      Eval.passAtK(df, "prob", col("ok") === 1, Seq(1), maxAttempts = 50)
    }
  }

  test("isotonicCalibration: PAVA pools violations to block means") {
    // levels 1..4 with rates [1/2, 0/2, 2/2, 1/2]: PAVA pools (1,2) to
    // 1/4 and (3,4) to 3/4 -> iso = [0.25, 0.25, 0.75, 0.75]
    val rows = Seq((1, 1), (1, 0), (2, 0), (2, 0),
      (3, 1), (3, 1), (4, 1), (4, 0))
    val df = rows.toDF("s", "y")
    val out = Eval.isotonicCalibration(df, col("s"), col("y") === 1)
      .collect().sortBy(_.getAs[Double]("score"))
    assert(out.map(_.getAs[Double]("raw_rate")).toSeq ==
      Seq(0.5, 0.0, 1.0, 0.5))
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq ==
      Seq(0.25, 0.25, 0.75, 0.75))
    // already-monotone input is returned untouched
    val mono = Seq((1, 0), (1, 0), (2, 1), (2, 0), (3, 1), (3, 1))
      .toDF("s", "y")
    val m = Eval.isotonicCalibration(mono, col("s"), col("y") === 1)
      .collect().sortBy(_.getAs[Double]("score"))
    assert(m.map(_.getAs[Double]("iso_rate")).toSeq == Seq(0.0, 0.5, 1.0))
    // the maxBins guard names the binning remedy
    val guard = intercept[IllegalArgumentException] {
      Eval.isotonicCalibration(df, col("s"), col("y") === 1, maxBins = 2)
    }
    assert(guard.getMessage.contains("quantile_bins"))
  }

  test("fairnessGaps: hand-computed rates, gaps, and the DI ratio") {
    // g1: n=4, 2 labeled, 2 selected (both labeled) -> sel 0.5, tpr 1, fpr 0
    // g2: n=4, 2 labeled, 4 selected             -> sel 1.0, tpr 1, fpr 1
    // overall selection 6/8 = 0.75; DI = 0.5/1.0
    val rows = Seq(
      ("g1", 1, 1), ("g1", 1, 1), ("g1", 0, 0), ("g1", 0, 0),
      ("g2", 1, 1), ("g2", 1, 1), ("g2", 0, 1), ("g2", 0, 1))
      .toDF("g", "y", "p")
    val out = Eval.fairnessGaps(rows, "g", col("y") === 1, col("p") === 1)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out("g1").getAs[Double]("selection_rate") == 0.5)
    assert(out("g2").getAs[Double]("selection_rate") == 1.0)
    assert(out("g1").getAs[Double]("base_rate") == 0.5)
    assert(out("g1").getAs[Double]("tpr") == 1.0)
    assert(out("g1").getAs[Double]("fpr") == 0.0)
    assert(out("g2").getAs[Double]("fpr") == 1.0)
    assert(out("g1").getAs[Double]("parity_gap") == -0.25)
    assert(out("g2").getAs[Double]("parity_gap") == 0.25)
    assert(out.values.forall(_.getAs[Double]("di_ratio") == 0.5))
    // degenerate group (nothing labeled / everything labeled): NULL
    // tpr/fpr instead of a divide-by-zero failure
    val deg = Seq(("g1", 0, 1), ("g1", 0, 0), ("g2", 1, 1))
      .toDF("g", "y", "p")
    val d = Eval.fairnessGaps(deg, "g", col("y") === 1, col("p") === 1)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(d("g1").isNullAt(d("g1").fieldIndex("tpr")))
    assert(d("g2").isNullAt(d("g2").fieldIndex("fpr")))
  }

  test("expectedCalibrationError: hand bins, weighted gap rollup, MCE") {
    // bin0: conf 0, acc 0.5 (gap 0.5, n=2); bin9: conf 0.95, acc 1
    // (gap 0.05, n=2) -> ECE = (2*0.5 + 2*0.05)/4 = 0.275, MCE = 0.5
    val df = Seq((0.0, 1), (0.0, 0), (0.95, 1), (0.95, 1))
      .toDF("score", "y")
    val r = Eval.expectedCalibrationError(df, "score", col("y") === 1)
      .head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("n_bins_used") == 2L)
    assert(r.getAs[Double]("ece") == 0.275)
    assert(r.getAs[Double]("mce") == 0.5)
    // a perfectly calibrated constant scorer: ECE exactly 0
    val cal = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))
      .toDF("score", "y")
    assert(Eval.expectedCalibrationError(cal, "score", col("y") === 1)
      .head().getAs[Double]("ece") == 0.0)
  }

  test("confusionStats: hand cells; MCC reads zero on a prior-only classifier") {
    // scores >= 0.5 predict positive: tp=3 fp=1 fn=2 tn=4
    val df = Seq((0.9, 1), (0.8, 1), (0.6, 1), (0.7, 0), (0.2, 1),
      (0.1, 1), (0.3, 0), (0.2, 0), (0.4, 0), (0.0, 0))
      .toDF("s", "y")
    val r = Eval.confusionStats(df, "s", col("y") === 1, 0.5).head()
    assert((r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")) == ((3L, 1L, 2L, 4L)))
    assert(r.getAs[Double]("precision") == 0.75)
    assert(r.getAs[Double]("recall") == 0.6)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    assert(r.getAs[Double]("f1") == r6(6.0 / 9.0))
    assert(r.getAs[Double]("balanced_accuracy") == r6((0.6 + 0.8) / 2))
    assert(r.getAs[Double]("mcc") ==
      r6((3.0 * 4 - 1.0 * 2) / math.sqrt(4.0 * 5 * 5 * 6)))
    // constant positive prediction: high recall, MCC undefined (den 0)
    val prior = Seq((0.9, 1), (0.9, 1), (0.9, 0)).toDF("s", "y")
    val p = Eval.confusionStats(prior, "s", col("y") === 1, 0.5).head()
    assert(p.getAs[Double]("recall") == 1.0)
    assert(p.isNullAt(p.fieldIndex("mcc")))
  }

  test("tripletMining: hardest positive is min-cos, hardest negative max-cos, ties to smaller id") {
    val vecs = Seq(
      (1L, Array(1f, 0f), 0),    // anchor, label A
      (2L, Array(0.5f, 0f), 0),  // easy positive (cos 1)
      (3L, Array(0f, 1f), 0),    // hardest positive (cos 0)
      (6L, Array(0f, 0.5f), 0),  // tied hardest positive (cos 0), larger id
      (4L, Array(0.5f, 0.5f), 1), // hardest negative (cos ~0.7071)
      (5L, Array(0f, 0.25f), 1)) // easy negative (cos 0)
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity
      .tripletMining(vecs, col("vec_id") === 1).head()
    assert(r.getAs[Long]("anchor_id") == 1L)
    assert(r.getAs[Long]("pos_id") == 3L) // tie with 6 broken to smaller id
    assert(r.getAs[Double]("pos_cos") == 0.0)
    assert(r.getAs[Long]("neg_id") == 4L)
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val c14 = 0.5 / (1.0 * math.sqrt(0.5))
    assert(r.getAs[Double]("neg_cos") == r6(c14))
    assert(r.getAs[Double]("margin") == r6(0.0 - c14))
  }
}
