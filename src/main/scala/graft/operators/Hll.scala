package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al., AofA 2007) over a replayable hash —
  * distinct-count and SET-OVERLAP estimation whose register table an
  * external engine rebuilds bit-for-bit (md5 first 60 bits, the same
  * construction as [[CountMin]] / [[graft.functions.SimHash64]]).
  *
  * Spark-first shape: the sketch IS a dense DataFrame of `m = 2^p`
  * `(bucket, register)` rows — one scan builds it through a map-side-
  * combined max-aggregation whose key space is m regardless of corpus
  * size; registers merge by max, so per-shard sketches union into the
  * corpus sketch (what a 100 TB decontamination probe ships between
  * clusters instead of the key sets themselves). The estimator is the
  * standard bias-corrected harmonic mean with the small-range
  * linear-counting correction.
  *
  * Determinism policy: the harmonic denominator is summed as exact
  * integers (`2^(55-M)` per bucket, <= 2^61 total — no float
  * accumulation order), so the raw estimate is one IEEE expression on
  * identical inputs in any engine; ln-path and final outputs round to
  * 6 dp per the cross-engine float policy.
  *
  * Overlap via inclusion-exclusion: `|A ∩ B| ≈ E(A) + E(B) - E(A ∪ B)`
  * where the union sketch is the bucketwise max — the standard HLL
  * intersection estimate (used by e.g. Redis PFCOUNT and DataSketches
  * theta fallbacks); error grows with |A ∪ B| / |A ∩ B|, which callers
  * should mind for tiny overlaps.
  */
object Hll {

  /** First 60 bits of md5(key) as a non-negative long (15 hex chars —
    * exactly the [[CountMin.bucketOf]] replayable-hash construction).
    */
  private def h60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** `(bucket, rho)` struct for `key` — the per-row sketch update,
    * shared by the batch register build and [[graft.streaming.StreamingHll]]
    * so the two produce bit-identical registers.
    */
  def bucketRho(key: Column, p: Int): Column = {
    require(p >= 4 && p <= 14, s"p must be in [4, 14], got $p")
    val m = 1L << p
    val wBits = 60 - p
    val h = h60(key)
    val w = shiftrightunsigned(h, p)
    struct(pmod(h, lit(m)).as("bucket"),
      when(w === 0, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(w))).as("rho"))
  }

  /** Dense `(bucket, register)` table, `2^p` rows: bucket = low p hash
    * bits, register = max over keys of (leading-zero run of the
    * remaining `60 - p` bits) + 1, 0 for never-hit buckets.
    */
  def registers(df: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4, 14], got $p")
    val m = 1L << p
    val spark = df.sparkSession
    val hit = df
      .select(bucketRho(col(keyCol), p).as("br"))
      .select(col("br.bucket").as("bucket"), col("br.rho").as("rho"))
      .groupBy("bucket").agg(max("rho").as("register"))
    spark.range(m).select(col("id").as("bucket"))
      .join(hit, Seq("bucket"), "left")
      .na.fill(0L, Seq("register"))
  }

  /** Union sketch: bucketwise max of two register tables built with the
    * same p. Registers are monoidal, so this is also the shard-merge.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket").agg(max("register").as("register"))

  private def alpha(m: Long): Double = m match {
    case 16L => 0.673
    case 32L => 0.697
    case 64L => 0.709
    case _   => 0.7213 / (1.0 + 1.079 / m.toDouble)
  }

  /** Cardinality estimate from a dense register table: 1 row,
    * `est` double rounded to 6 dp. `p` must match [[registers]].
    */
  def estimate(regs: DataFrame, p: Int = 6): DataFrame =
    estimateCol(regs, p).select(col("est"))

  private def estimateCol(regs: DataFrame, p: Int): DataFrame = {
    val m = 1L << p
    val wBits = 60 - p
    // integer harmonic denominator: sum of 2^(maxRho - M) with
    // maxRho = wBits + 1; each term <= 2^(wBits+1), m terms — exact
    regs.agg(
        // functions.shiftleft only takes literal bits; the SQL form shifts
        // by a column
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - register)")).as("zi"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("v"))
      .select(
        (lit(alpha(m)) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, (wBits + 1).toDouble)) / col("zi").cast("double"))
          .as("raw"), col("v"))
      .select(
        when(col("raw") <= lit(2.5 * m) && col("v") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")), 6))
          .otherwise(round(col("raw"), 6)).as("est"))
  }

  /** Per-group distinct estimate (`(group, est)` rows): registers keyed
    * by `(group, bucket)` — nGroups × 2^p smallints however large the
    * corpus. Never-hit buckets are folded ALGEBRAICALLY into the
    * harmonic sum (`(m − nHit) · 2^(wBits+1)` — a hit bucket always has
    * register ≥ 1, so nHit counts exactly the non-zero registers)
    * instead of densifying with a per-group join. Two shuffles: the
    * corpus into the (group, bucket) agg, then the model-sized register
    * table into the per-group fold.
    */
  def groupedEstimate(df: DataFrame, groupCol: String, keyCol: String,
                      p: Int = 6): DataFrame = {
    val m = 1L << p
    val wBits = 60 - p
    df.select(col(groupCol), bucketRho(col(keyCol), p).as("br"))
      .select(col(groupCol), col("br.bucket").as("bucket"), col("br.rho").as("rho"))
      .groupBy(groupCol, "bucket").agg(max("rho").as("register"))
      .groupBy(groupCol).agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - register)")).as("zhit"),
        count(lit(1)).as("nhit"))
      .select(col(groupCol),
        (col("zhit") + (lit(m) - col("nhit")) * lit(1L << (wBits + 1))).as("zi"),
        (lit(m) - col("nhit")).as("v"))
      .select(col(groupCol),
        (lit(alpha(m)) * lit(m.toDouble) * lit(m.toDouble) *
          lit(math.pow(2.0, (wBits + 1).toDouble)) / col("zi").cast("double"))
          .as("raw"), col("v"))
      .select(col(groupCol),
        when(col("raw") <= lit(2.5 * m) && col("v") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")), 6))
          .otherwise(round(col("raw"), 6)).as("est"))
  }

  /** Merge view over a sink of [[graft.streaming.StreamingHll]]
    * emissions `(bucket, register)`: a bucket's register is monotone
    * non-decreasing across micro-batches, so its latest emission is its
    * max — one hash aggregation recovers the current sketch, densified
    * and fed through the standard estimator.
    */
  def estimateFromEmissions(emitted: DataFrame, p: Int = 6): DataFrame = {
    val m = 1L << p
    val latest = emitted.groupBy("bucket").agg(max("register").as("register"))
    val dense = emitted.sparkSession.range(m).select(col("id").as("bucket"))
      .join(latest, Seq("bucket"), "left")
      .na.fill(0L, Seq("register"))
    estimate(dense, p)
  }

  /** Set-overlap estimate between `a` and `b` on `keyCol`: one row with
    * the three sketch cardinalities, the inclusion-exclusion
    * intersection, and the implied Jaccard. Each side is scanned once;
    * everything downstream is m-row model arithmetic.
    */
  def overlap(a: DataFrame, b: DataFrame, keyCol: String, p: Int = 6): DataFrame = {
    val ra = registers(a, keyCol, p)
    val rb = registers(b, keyCol, p)
    val ru = merge(ra, rb)
    estimateCol(ra, p).select(col("est").as("est_a"))
      .crossJoin(estimateCol(rb, p).select(col("est").as("est_b")))
      .crossJoin(estimateCol(ru, p).select(col("est").as("est_union")))
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6).as("est_intersect"),
        round((col("est_a") + col("est_b") - col("est_union")) / col("est_union"), 6)
          .as("jaccard_est"))
  }
}
