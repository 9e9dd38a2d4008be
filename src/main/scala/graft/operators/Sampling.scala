package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling for training-data pipelines.
  *
  * Every sampler here keys on [[TextAnalysis.hashBucket]] (md5 of the row
  * key, mod 100) rather than `rand()`: the sample is reproducible across
  * runs, engines, and cluster layouts, rows never migrate between sample
  * and complement on re-runs, and downstream joins against the sample stay
  * consistent. All samplers are narrow per-row filters — no shuffle, fully
  * parallel at any scale, and the filter sits directly above the scan so
  * Catalyst prunes columns beneath it.
  */
object Sampling {

  /** Keep ~`pct`% of rows, selected by the key's hash bucket. */
  def hashSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0,100]")
    df.filter(TextAnalysis.hashBucket(col(keyCol)) < pct)
  }

  /** Stratified deterministic sample: per-stratum percentages (strata not
    * listed fall back to `defaultPct`). The rate lookup compiles to a CASE
    * chain — no join, no shuffle; useful for rebalancing a corpus by
    * language/source/domain while keeping the choice content-addressed.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "all rates must be in [0,100]")
    val pct: Column = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, p)) => when(col(strataCol) === k, lit(p)).otherwise(acc)
    }
    df.filter(TextAnalysis.hashBucket(col(keyCol)) < pct)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by md5-of-key order — a deterministic, content-addressed
    * stand-in for reservoir sampling: stable across runs and layouts,
    * and re-runs pick the same rows. One shuffle on the stratum; the
    * per-group top-n is a window with rank cutoff (no full sort of the
    * stratum beyond the shuffle's local sort). Skewed strata bound the
    * task time; for few huge strata prefer [[stratifiedSample]]'s
    * percentage form, which needs no shuffle at all.
    */
  def exactNPerStratum(df: DataFrame, keyCol: String, strataCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= n)
      .drop("_rk")
  }
}
