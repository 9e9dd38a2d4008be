package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-time clustering. At 100 TB the scan
  * cost of a query is decided before it runs — by how the writer laid
  * rows into files. Min/max (zone-map) pruning on a single sort key
  * dies the moment a query filters on the OTHER column; a Z-order
  * (Morton) key interleaves the bits of two dimensions so that
  * range-contiguous chunks of the sort order are *square-ish* regions
  * of the (x, y) plane — both dimensions prune, at a modest cost to
  * each individually. (Same layout idea Delta/Iceberg expose as
  * `OPTIMIZE ZORDER BY`; implemented here from the public Morton-code
  * construction.)
  *
  * Everything is composed from codegen'd integer built-ins — the bit
  * spread is the classic 5-step mask/shift ladder, expressible
  * identically in any engine with 64-bit integer ops, so oracles replay
  * the key bit-for-bit. No UDF, no custom expression needed.
  */
object Layout {

  /** Spread the low 31 bits of `v` to the even bit positions of a
    * 64-bit value (Morton/bit-interleave building block).
    */
  private def spread(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0x7FFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 62-bit Morton code of two non-negative integer columns (the low
    * 31 bits of each participate; x occupies even bits, y odd). Always
    * non-negative — safe to range-partition and compare across engines.
    */
  def zOrderKey(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Spread the low 21 bits of `v` to every third bit position — the
    * 3-way interleave ladder (same mask/shift construction, 3-spacing
    * masks).
    */
  private def spread3(v: Column): Column = {
    val a = v.cast("long").bitwiseAND(lit(0x1FFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 32)).bitwiseAND(lit(0x1F00000000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 16)).bitwiseAND(lit(0x1F0000FF0000FFL))
    val d = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x100F00F00F00F00FL))
    val e = d.bitwiseOR(shiftleft(d, 4)).bitwiseAND(lit(0x10C30C30C30C30C3L))
    e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x1249249249249249L))
  }

  /** 63-bit Morton code of THREE non-negative integer columns (low 21
    * bits each; x at bit 3i, y at 3i+1, z at 3i+2) — the clustering key
    * for 3-axis zone-map workloads (e.g. date × tenant × region), where
    * a sort on any single column strands the other two filters.
    */
  def zOrderKey3(x: Column, y: Column, z: Column): Column =
    spread3(x).bitwiseOR(shiftleft(spread3(y), 1))
      .bitwiseOR(shiftleft(spread3(z), 2))

  /** Hilbert-curve index of two non-negative integer columns over a
    * 2^bits × 2^bits grid — the space-filling curve whose consecutive
    * positions are ALWAYS grid neighbors (the Morton/Z curve jumps
    * across the plane at power-of-two seams), so range-contiguous
    * chunks of the sort order cover tighter rectangles: measurably
    * fewer files read per 2-D range filter than [[zOrderKey]] at the
    * same file count. The cost is construction: `bits` unrolled
    * rotate/reflect rounds instead of one mask ladder — still pure
    * codegen'd integer built-ins (CASE/AND/arithmetic), no UDF.
    *
    * Construction is the public xy2d algorithm (Wikipedia, "Hilbert
    * curve"): per level s = 2^(bits−1)..1, take quadrant
    * (3·rx) xor ry (written as 3rx + ry − 2rxry — no cross-engine xor
    * operator needed), then reflect with n−1−v and swap when ry = 0.
    * Inputs are masked to `bits` bits; the key is non-negative and
    * < 4^bits.
    *
    * The iterative loop lives in the codegen'd
    * [[graft.functions.HilbertKey2]] kernel — a built-in-operator
    * unroll re-embeds each level's expression ~4× into the next (the
    * analysis tree grows 4^bits; bits = 10 measured in the seconds of
    * pure plan time even as a projection chain), while the kernel is
    * one virtual call per row inside whole-stage codegen.
    */
  def hilbertKey(x: Column, y: Column, bits: Int): Column =
    graft.functions.HilbertKey2(x, y, bits)

  /** [[hilbertKey]] as a frame transform: append the key column. */
  def withHilbertKey(df: DataFrame, xCol: String, yCol: String,
                     bits: Int, out: String = "h"): DataFrame =
    df.withColumn(out, hilbertKey(col(xCol), col(yCol), bits))

  /** 3-D Hilbert index — [[hilbertKey]] for (time, x, y)-style scan
    * workloads filtering three axes at once, where [[zOrderKey3]]'s
    * Morton seams cost extra file reads. Skilling's transpose
    * construction in a codegen kernel
    * ([[graft.functions.HilbertKey3]]); key < 8^bits, non-negative.
    */
  def hilbertKey3(x: Column, y: Column, z: Column, bits: Int): Column =
    graft.functions.HilbertKey3(x, y, z, bits)

  /** [[hilbertKey3]] as a frame transform: append the key column. */
  def withHilbertKey3(df: DataFrame, xCol: String, yCol: String,
                      zCol: String, bits: Int, out: String = "h"): DataFrame =
    df.withColumn(out, hilbertKey3(col(xCol), col(yCol), col(zCol), bits))

  /** Rewrite a table into files of roughly `targetBytes` each — the
    * small-files compaction every long-lived 100 TB table needs (file
    * counts grow with every incremental append; scans, listings, and
    * footer reads all pay per file). The file count comes from the
    * OPTIMIZER'S size estimate (`sizeInBytes` from the logical plan —
    * parquet footer statistics at the leaves, so no extra scan), times
    * `outputRatio` to account for the on-disk-vs-in-plan encoding gap.
    * One round-robin exchange; pair with [[zOrderLayout]] instead when
    * a filter workload should decide row placement.
    */
  def compactToTargetSize(df: DataFrame, targetBytes: Long,
                          outputRatio: Double = 1.0): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(outputRatio > 0, "outputRatio must be positive")
    val estBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1L, math.ceil(
      estBytes.toDouble * outputRatio / targetBytes).toLong)
    df.repartition(math.min(nFiles, Int.MaxValue.toLong).toInt)
  }

  /** Cluster a table for a two-dimensional filter workload: compute the
    * Morton key and range-partition + locally sort by it, so each
    * output file covers a compact rectangle of (c1, c2) space and
    * zone-map/footer pruning works on BOTH columns.
    *
    * Shape: one range exchange (sampled bounds, uniform by construction
    * — the Morton key inherits the dimensions' joint distribution) and
    * a within-partition sort; `nFiles` controls output granularity.
    */
  def zOrderLayout(df: DataFrame, c1: String, c2: String, nFiles: Int): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    df.withColumn("_z", zOrderKey(col(c1), col(c2)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Write a table hash-bucketed (and sorted) by a join key — the
    * pay-once answer to the recurring-join shuffle: two tables bucketed
    * by the same key into the same bucket count equi-join with ZERO
    * exchanges (each bucket pairs positionally; with sorted buckets the
    * sort-merge needs no sort either). At 100 TB the nightly
    * fact-to-dim or fact-to-fact join is usually the single largest
    * shuffle in the pipeline; bucketing moves that cost to write time
    * and amortizes it over every subsequent join, aggregation, and
    * `MERGE` keyed on the same column. Requires a catalog table
    * (bucket metadata lives in the catalog, not parquet footers).
    */
  def bucketedWrite(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    df
      // pre-partition on the SAME hash the bucketing uses, so each
      // write task holds exactly one bucket and emits ONE file per
      // bucket — the reader only trusts (and elides the sort for) the
      // per-file sort order when a bucket is a single file; multi-file
      // buckets silently re-sort on every downstream join
      .repartition(nBuckets, col(keyCol))
      .write.mode("overwrite")
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** [[zOrderLayout]] along the Hilbert curve: same one-exchange shape,
    * tighter file rectangles (a range-contiguous Hilbert chunk never
    * jumps across the plane, so per-file min/max footers bound BOTH
    * dimensions at least as tightly as the Morton layout's — see the
    * write-path spec for the measured file-skip comparison).
    */
  def hilbertLayout(df: DataFrame, c1: String, c2: String, bits: Int,
                    nFiles: Int): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    df.withColumn("_h", hilbertKey(col(c1), col(c2), bits))
      .repartitionByRange(nFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
  }

  /** [[hilbertLayout]] over three axes ([[hilbertKey3]]) — the
    * (time, x, y)-style clustering write: each range-contiguous chunk
    * of the 3-D curve covers a bounded sub-box, so per-file min/max
    * footers prune on ALL three filter columns.
    */
  def hilbertLayout3(df: DataFrame, c1: String, c2: String, c3: String,
                     bits: Int, nFiles: Int): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    df.withColumn("_h", hilbertKey3(col(c1), col(c2), col(c3), bits))
      .repartitionByRange(nFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
  }
}
