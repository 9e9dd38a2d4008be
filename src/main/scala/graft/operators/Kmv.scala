package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / theta sketch (Bar-Yossef et al., RANDOM 2002; the construction
  * behind DataSketches' theta family): keep the k SMALLEST hash values
  * of a set. The k-th smallest value θ estimates density — distinct
  * count ≈ (k−1)/θ — and, unlike HLL's inclusion-exclusion,
  * intersections come from DIRECT sample membership: among the union's
  * k minima, the fraction present in both sets estimates Jaccard with
  * error that doesn't compound across three sketches. The companion to
  * [[Hll]] when the overlap itself is the quantity of interest
  * (decontamination rates, cross-corpus containment).
  *
  * Spark-first shape: a sketch IS a k-row DataFrame of hash values —
  * built by the bounded [[graft.functions.KMinima]] aggregate (each map
  * task keeps a size-≤k ordered distinct set; the shuffle carries one
  * k-long buffer per partition, never the full distinct hash set),
  * merged by union + re-top-k over k-row inputs. Hashes are the
  * md5-first-60-bit construction shared with
  * [[CountMin]]/[[Hll]], so an external engine rebuilds every sketch
  * row bit-for-bit; estimates divide exact integers and round to 6 dp.
  */
object Kmv {

  /** 2^60 as a double — the hash-space size for normalizing θ. */
  private val HashSpace = math.pow(2.0, 60.0)

  private def h60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** The k smallest distinct hash values of `keyCol`: a k-row sketch
    * DataFrame with column `h`, ascending.
    */
  def sketch(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    df.select(graft.functions.KMinima.column(h60(col(keyCol)), k).as("hs"))
      .select(explode(col("hs")).as("h"))
  }

  /** Merge sketches built with the same k: union of candidate minima,
    * re-limited to the k smallest — exactly the sketch of the union.
    */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).distinct().orderBy("h").limit(k)

  /** Distinct-count estimate from a k-row sketch: (k−1)/θ with
    * θ = (k-th smallest hash + 1) / 2^60; when the set has fewer than
    * k distinct values the sketch is exhaustive and the count is EXACT.
    */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n"), max("h").as("hk"))
      .select(when(col("n") < k, col("n").cast("double"))
        .otherwise(round(lit((k - 1).toDouble) /
          ((col("hk").cast("double") + lit(1.0)) / lit(HashSpace)), 6))
        .as("est"))

  /** Jaccard / intersection estimate: among the union sketch's minima,
    * the fraction found in BOTH input sketches estimates J(A,B); the
    * intersection is J × |A ∪ B|-estimate. One row:
    * (jaccard_est, est_union, est_intersect, k_used).
    */
  def overlap(a: DataFrame, b: DataFrame, keyCol: String, k: Int): DataFrame = {
    val sa = sketch(a, keyCol, k)
    val sb = sketch(b, keyCol, k)
    val su = merge(sa, sb, k)
    // membership of the union minima in each side's sketch (semi joins
    // on k-row tables — everything here is model-sized)
    val inBoth = su.join(sa, Seq("h"), "left_semi")
      .join(sb, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    val uEst = estimate(su, k).select(col("est").as("est_union"))
    su.agg(count(lit(1)).as("k_used")).crossJoin(inBoth).crossJoin(uEst)
      .select(
        round(col("n_both").cast("double") / col("k_used").cast("double"), 6)
          .as("jaccard_est"),
        col("est_union"),
        round(col("n_both").cast("double") / col("k_used").cast("double") *
          col("est_union"), 6).as("est_intersect"),
        col("k_used"))
  }
}
