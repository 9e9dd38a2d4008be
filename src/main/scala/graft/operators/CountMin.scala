package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005): a depth x
  * width counter matrix answering point frequency queries with
  * one-sided error — estimate >= true count always, and exceeds it by
  * more than eps*N with probability <= delta for width = e/eps,
  * depth = ln(1/delta).
  *
  * Spark-first shape: the sketch IS a DataFrame of (row, bucket, cnt)
  * counters — built with one explode (x depth) and one map-side-combined
  * aggregation whose key space is bounded by depth x width regardless of
  * stream length or key cardinality; counters merge by addition, so
  * sketches of corpus shards union + re-aggregate into the corpus
  * sketch (the mergeability that makes it work on 100 TB). Estimates
  * are an equi-join on (row, bucket) — broadcastable, since the sketch
  * is at most depth x width rows.
  *
  * The row hashes are md5-first-60-bits (15 hex chars -> fits a signed
  * long exactly), seeded by prefixing the row index — the same
  * every-engine-replayable construction as [[graft.functions.SimHash64]],
  * so an external engine rebuilds the counter matrix bit-for-bit.
  */
object CountMin {

  /** Bucket of `key` in sketch row `j`: first 60 bits of
    * md5("j:" + key) mod width. Codegen'd built-ins only.
    */
  def bucketOf(key: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(j.toString), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(width.toLong))

  private def rowBuckets(key: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(j =>
      struct(lit(j).as("row"), bucketOf(key, j, width).as("bucket"))): _*))

  /** Build the counter table over `df`'s `keyCol`: (row, bucket, cnt),
    * at most depth x width rows.
    */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
             width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    df.select(rowBuckets(col(keyCol), depth, width).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** [[sketch]] from an already key-aggregated (key, count) table: one
    * md5 set per DISTINCT key weighted by its count, instead of one per
    * input row — bit-identical counters (the per-bucket sum of row
    * counts equals the row count per bucket), at hash cost proportional
    * to key cardinality rather than corpus size (r18; §2.3 aggregate
    * before the expensive per-row work). Use when a keyed count table
    * already exists or keys repeat heavily.
    */
  def sketchCounted(counts: DataFrame, keyCol: String, cntCol: String,
                    depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    counts.select(rowBuckets(col(keyCol), depth, width).as("rb"),
        col(cntCol).as("_c"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"), col("_c"))
      .groupBy("row", "bucket").agg(sum("_c").as("cnt"))
  }

  /** Equi-join cardinality estimate from two sketches built with the
    * SAME (depth, width, key normalization): |A join B| <= min over
    * rows of the counter inner products (Cormode & Muthukrishnan §4.2 —
    * the sketch inner product upper-bounds the true join size, with the
    * usual eps*N_a*N_b slack). The pre-join cost estimate a planner
    * checks before committing a 100 TB shuffle, computed from two
    * model-sized tables: the join below is depth x width rows a side at
    * most, so this never touches either corpus.
    */
  def joinSizeEstimate(sketchA: DataFrame, sketchB: DataFrame): DataFrame =
    sketchA.select(col("row"), col("bucket"), col("cnt").as("_ca"))
      .join(sketchB.select(col("row"), col("bucket"), col("cnt").as("_cb")),
        Seq("row", "bucket"))
      .groupBy("row").agg(sum(col("_ca") * col("_cb")).as("_rowEst"))
      .agg(min("_rowEst").as("join_size_est"))

  /** Point estimates for `keys`: min over the depth counters each key
    * hashes to. Keys never counted estimate their collision floor
    * (>= 0), like the classic structure.
    */
  def estimate(sketchDf: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be positive")
    keys.select(col(keyCol), rowBuckets(col(keyCol), depth, width).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(sketchDf, Seq("row", "bucket"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(keyCol).agg(min("cnt").as("est"))
  }
}
