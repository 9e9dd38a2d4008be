package graft

import graft.operators.{Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Hand-derived fixtures for the round-13 series/inequality wave. */
class SeriesOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def day(i: Int) = java.sql.Date.valueOf(f"2024-03-$i%02d")

  test("zipfFit: an exact 1/rank law recovers slope -1, r² = 1") {
    // counts 12/6/4/3 = 12/rank for ranks 1..4
    val text = (Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++
      Seq.fill(4)("cc") ++ Seq.fill(3)("dd")).mkString(" ")
    val r = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text", topK = 10)
      .head()
    assert(r.getAs[Long]("k") == 4L)
    assert(math.abs(r.getAs[Double]("zipf_slope") + 1.0) < 1e-5)
    assert(r.getAs[Double]("r_squared") > 0.999999)
    // intercept ≈ ln 12
    assert(math.abs(r.getAs[Double]("intercept") - math.log(12.0)) < 1e-5)
  }

  test("rollingCorrelation: proportional series lock to 1 once the frame fills") {
    val df = (1 to 5).map(i => (day(i), i.toLong, 2L * i))
      .toDF("t", "x", "y")
    val r = Stats.rollingCorrelation(df, "t", "x", "y", windowSize = 3)
      .orderBy("t").collect()
    assert(r(0).isNullAt(r(0).fieldIndex("rolling_corr"))) // frame not full
    assert(r(1).isNullAt(r(1).fieldIndex("rolling_corr")))
    assert((2 to 4).forall(i => r(i).getAs[Double]("rolling_corr") == 1.0))
    // constant y in-frame -> NULL, not NaN
    val c = (1 to 4).map(i => (day(i), i.toLong, 7L)).toDF("t", "x", "y")
    val rc = Stats.rollingCorrelation(c, "t", "x", "y", windowSize = 3)
      .orderBy("t").collect()
    assert(rc.forall(_.isNullAt(rc.head.fieldIndex("rolling_corr"))))
  }

  test("crossCorrelation: a 1-day lead shows up at lag +1") {
    // y_t = x_{t-1}: pairing x_t with y_{t+1} is an identity match
    val x = Seq(1L, 2L, 3L, 4L, 9L, 6L)
    val df = (1 to 6).map(i =>
      (day(i), x(i - 1), if (i == 1) 0L else x(i - 2))).toDF("t", "x", "y")
    val r = Stats.crossCorrelation(df, "t", "x", "y", maxLag = 2)
      .orderBy("lag").collect()
    val byLag = r.map(row => row.getAs[Int]("lag") ->
      (row.getAs[Long]("n_overlap"), row)).toMap
    assert(byLag(1)._1 == 5L)
    assert(byLag(1)._2.getAs[Double]("ccf") == 1.0)
    // lag 0 pairs shifted values — correlated but not perfectly
    assert(byLag(0)._1 == 6L)
    assert(byLag(0)._2.getAs[Double]("ccf") < 1.0)
  }

  test("gini: equality gives 0; one-holder concentration gives (n-1)/n shape") {
    val eq = Seq.fill(4)(("g", 5.0)).toDF("g", "v")
    assert(Stats.gini(eq, "g", "v").head().getAs[Double]("gini") == 0.0)
    // {0,0,0,1}: G = (2·4 − 5·1)/(4·1) = 0.75
    val conc = Seq(("g", 0.0), ("g", 0.0), ("g", 0.0), ("g", 1.0))
      .toDF("g", "v")
    val r = Stats.gini(conc, "g", "v").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("gini") == 0.75)
  }

  test("robustScale: median/MAD z-scores; zero MAD yields NULL") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0),
      (4L, "g", 4.0), (5L, "g", 100.0)).toDF("id", "g", "v")
    val r = Stats.robustScale(df, "id", "g", "v").orderBy("id").collect()
    // lower median 3, deviations {2,1,0,1,97}, lower MAD 1
    assert(r(2).getAs[Double]("robust_z") == 0.0)
    val expect = java.math.BigDecimal.valueOf(97.0 / 1.4826)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(r(4).getAs[Double]("robust_z") == expect)
    // majority-constant group: MAD 0 -> NULL for every row
    val t = Seq((1L, "h", 5.0), (2L, "h", 5.0), (3L, "h", 5.0),
      (4L, "h", 9.0)).toDF("id", "g", "v")
    val rt = Stats.robustScale(t, "id", "g", "v").collect()
    assert(rt.forall(_.isNullAt(rt.head.fieldIndex("robust_z"))))
  }
}

/** Hand-derived fixture for the rolling-origin forecast backtest. */
class BacktestForecastSpec extends SparkSpecBase {
  import spark.implicits._

  test("backtestForecast: naive and seasonal-naive errors on a linear ramp") {
    // y_t = t for t = 1..10: naive at horizon h has |y_t - y_{t-h}| = h
    // everywhere; seasonal-naive (season 3) has constant error 3
    val df = (1 to 10).map(t => ("k", t.toLong, t.toDouble))
      .toDF("key", "t", "v")
    val out = Stats.backtestForecast(df, "key", "t", "v",
        horizons = 2, season = 3)
      .collect()
      .map(r => (r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getAs[Double]("mae"))).toMap
    assert(out(("naive", 1)) == (9L, 1.0))
    assert(out(("naive", 2)) == (8L, 2.0))
    assert(out(("snaive", 1)) == (7L, 3.0))
    assert(out(("snaive", 2)) == (7L, 3.0))
  }

  test("backtestForecast: sMAPE matches the hand fold; zero-zero is perfect") {
    // series 2, 2, 0, 0: naive h=1 errors |2-2|=0, |0-2|=2, |0-0|=0;
    // sMAPE terms 0, 2*2/(0+2)=2, 0 (zero-denominator term contributes 0)
    val df = Seq(("k", 1L, 2.0), ("k", 2L, 2.0), ("k", 3L, 0.0),
      ("k", 4L, 0.0)).toDF("key", "t", "v")
    val r = Stats.backtestForecast(df, "key", "t", "v",
        horizons = 1, season = 1)
      .filter(col("model") === "naive").head()
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("mae") ==
      BigDecimal(2.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("smape") ==
      BigDecimal(2.0 / 3.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("backtestForecast: refuses a non-causal horizon past the season") {
    val df = Seq(("k", 1L, 1.0)).toDF("key", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.backtestForecast(df, "key", "t", "v", horizons = 8, season = 7)
    }
    assert(e.getMessage.contains("causal"))
  }
}

/** Hand-derived fixtures for the split-conformal interval. */
class ConformalIntervalSpec extends SparkSpecBase {
  import spark.implicits._

  test("conformalInterval: constant residuals give the exact order statistic") {
    // y = 1..11: ten naive residuals, all 1; k = ceil(11 * 0.9) = 10
    val df = (1 to 11).map(t => ("k", t.toLong, t.toDouble)).toDF("key", "t", "v")
    val r = Stats.conformalInterval(df, "key", "t", "v").head()
    assert(r.getAs[Long]("n_calib") == 10L)
    assert(r.getAs[Double]("forecast") == 11.0)
    assert(r.getAs[Double]("q_hat") == 1.0)
    assert(r.getAs[Double]("lo") == 10.0 && r.getAs[Double]("hi") == 12.0)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("conformalInterval: distinct residuals select the k-th smallest; coverage < 1") {
    // y = 0,1,3,6,10,15 -> residuals 1,2,3,4,5; alpha=0.4:
    // k = ceil(6 * 0.6) = 4 -> q_hat = 4, coverage 4/5
    val df = Seq(0.0, 1.0, 3.0, 6.0, 10.0, 15.0).zipWithIndex
      .map { case (v, t) => ("k", t.toLong, v) }.toDF("key", "t", "v")
    val r = Stats.conformalInterval(df, "key", "t", "v", alpha = 0.4).head()
    assert(r.getAs[Long]("n_calib") == 5L)
    assert(r.getAs[Double]("q_hat") == 4.0)
    assert(r.getAs[Double]("forecast") == 15.0)
    assert(r.getAs[Double]("lo") == 11.0 && r.getAs[Double]("hi") == 19.0)
    assert(r.getAs[Double]("coverage") == 0.8)
  }

  test("conformalInterval omits keys too short for the guarantee") {
    // n = 10 residuals, alpha = 0.05 -> k = ceil(11 * 0.95) = 11 > 10
    val df = (1 to 11).map(t => ("k", t.toLong, t.toDouble)).toDF("key", "t", "v")
    assert(Stats.conformalInterval(df, "key", "t", "v", alpha = 0.05).count() == 0)
  }
}
