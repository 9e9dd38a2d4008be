package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric distribution drift between two sides: the Population
  * Stability Index over a shared equal-width grid — the standard
  * model-monitoring statistic (PSI < 0.1 stable, 0.1–0.25 moderate,
  * > 0.25 action), complementing [[DriftCompare]]'s row/schema diffs
  * with a "same rows may be gone, but has the SHAPE moved" signal.
  *
  * Scale shape: each side is scanned once into a bounded bin-count
  * aggregation (nBins keys, map-side combined); the bounds are a 1-row
  * aggregate broadcast into the binning pass, and everything after runs
  * on nBins rows. No sort, no quantile shuffle — equal-width bins keep
  * the whole statistic one-pass, which is why monitoring systems prefer
  * PSI over KS at warehouse scale.
  *
  * Determinism: bin indices are `floor((x-lo)/(hi-lo)*n)` on doubles —
  * identical IEEE expressions replay identically in any engine; bin
  * counts are exact integers; the final PSI (10 smoothed terms with an
  * `ln`) rounds to 6 dp per the cross-engine float policy. Counts are
  * Laplace-smoothed (+0.5 per bin) so empty bins stay finite.
  */
object Distribution {

  /** One row: (col_name, psi, n_a, n_b) for `colName` between `a` and
    * `b`. Null values are excluded (they are schema/row drift, not
    * shape drift). A constant column (hi == lo) puts everything in bin
    * 0 on both sides → psi 0.
    */
  def psi(a: DataFrame, b: DataFrame, colName: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "nBins must be at least 2")
    val av = a.select(col(colName).cast("double").as("x")).filter(col("x").isNotNull)
    val bv = b.select(col(colName).cast("double").as("x")).filter(col("x").isNotNull)
    val bounds = av.unionByName(bv).agg(min("x").as("lo"), max("x").as("hi"))
    def binned(df: DataFrame, out: String) =
      df.crossJoin(broadcast(bounds))
        .select(when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(greatest(
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * lit(nBins.toDouble)),
            lit(0.0)), lit((nBins - 1).toDouble)).cast("long")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(out))
    val grid = a.sparkSession.range(nBins).select(col("id").as("bin"))
      .join(binned(av, "na"), Seq("bin"), "left")
      .join(binned(bv, "nb"), Seq("bin"), "left")
      .na.fill(0L, Seq("na", "nb"))
    val tot = grid.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val half = lit(0.5 * nBins)
    val pa = (col("na").cast("double") + lit(0.5)) / (col("ta").cast("double") + half)
    val pb = (col("nb").cast("double") + lit(0.5)) / (col("tb").cast("double") + half)
    grid.crossJoin(broadcast(tot))
      .select(((pa - pb) * log(pa / pb)).as("term"), col("ta"), col("tb"))
      .groupBy("ta", "tb")
      .agg(round(sum("term"), 6).as("psi"))
      .select(lit(colName).as("col_name"), col("psi"),
        col("ta").as("n_a"), col("tb").as("n_b"))
  }

  /** [[psi]] for several columns at once, one output row per column. */
  def psiAll(a: DataFrame, b: DataFrame, cols: Seq[String],
             nBins: Int = 10): DataFrame =
    cols.map(c => psi(a, b, c, nBins)).reduce(_ unionByName _)

  /** The fixed-bounds bin index used by [[graft.streaming.StreamingPsi]]
    * — same clamp-floor construction as [[psi]]'s, but with caller-fixed
    * `[lo, hi]` (a stream can't know its global bounds up front; the
    * monitoring pattern fixes the grid from the reference sample).
    */
  def fixedBin(x: org.apache.spark.sql.Column, lo: Double, hi: Double,
               nBins: Int): org.apache.spark.sql.Column =
    if (hi == lo) lit(0L)
    else least(greatest(
      floor((x - lit(lo)) / lit(hi - lo) * lit(nBins.toDouble)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")

  /** PSI of observed bin counts against reference bin counts — the
    * shared tail of [[psi]] and the streaming twin's merge view. Both
    * inputs are dense positional arrays (index = bin). Same Laplace
    * smoothing and 6-dp round, computed driver-side: the inputs are
    * nBins numbers, not data.
    */
  def psiFromCounts(obs: Seq[Long], ref: Seq[Long]): Double = {
    require(obs.length == ref.length && obs.nonEmpty, "bin arrays must align")
    val n = obs.length
    val ta = obs.sum.toDouble + 0.5 * n
    val tb = ref.sum.toDouble + 0.5 * n
    val s = (0 until n).map { i =>
      val pa = (obs(i) + 0.5) / ta
      val pb = (ref(i) + 0.5) / tb
      (pa - pb) * math.log(pa / pb)
    }.sum
    BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Mean-excess (mean residual life) table — the EVT diagnostic for a
    * metric's tail: for each threshold u, e(u) = mean(x − u | x > u).
    * A mean-excess curve that RISES with u is a heavy (Pareto-class)
    * tail — the "will p999 keep growing as traffic grows" question;
    * exponential tails plot flat, bounded tails fall. Returns one row
    * per threshold (threshold, n_exceed, mean_excess; NULL when
    * nothing exceeds).
    *
    * Shape: one pass with |thresholds| conditional exact-decimal sums
    * (the bounded grid explodes map-side, collapsing to |grid| rows);
    * each mean is one rounded double division.
    */
  def meanExcess(df: DataFrame, valueCol: String,
                 thresholds: Seq[Double],
                 precision: Int = 18, scale: Int = 2): DataFrame = {
    require(thresholds.nonEmpty && thresholds.size <= 64,
      "1..64 thresholds (a bounded grid)")
    val v = col(valueCol).cast(s"decimal($precision,$scale)")
    val grid = thresholds.distinct.sorted.map(u =>
      java.math.BigDecimal.valueOf(u).setScale(scale,
        java.math.RoundingMode.HALF_UP))
    df.filter(v.isNotNull)
      .select(v.as("_v"), explode(lit(grid.toArray)).as("threshold"))
      .groupBy("threshold")
      .agg(sum(when(col("_v") > col("threshold"), 1L).otherwise(0L))
        .as("n_exceed"),
        sum(when(col("_v") > col("threshold"),
          (col("_v") - col("threshold"))
            .cast(s"decimal($precision,$scale)"))).as("_s"))
      .select(col("threshold").cast("double").as("threshold"),
        col("n_exceed"),
        when(col("n_exceed") > 0,
          round(col("_s").cast("double") / col("n_exceed"), 6))
          .as("mean_excess"))
  }
}
