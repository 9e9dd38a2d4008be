package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.BloomMightContainLong

/** Bloom-filter semi-join pruning: build a compact membership sketch of
  * the small side's keys, filter the big side with it BEFORE the exact
  * join, so only probable matches reach the shuffle. This is the
  * classic runtime-filter pattern (Spark's own InjectRuntimeFilter
  * applies it opportunistically); making it an explicit operator lets a
  * pipeline apply it where the optimizer can't see the opportunity —
  * e.g. across separately-materialized stages — and tune its size.
  *
  * Scale math: at fpp 1% the sketch is ~1.2 bytes/key — 100 M small-side
  * keys fit in ~120 MB, built with one `treeAggregate` and shipped once
  * per executor as an expression reference object. A big side whose
  * match rate is r then shuffles ~(r + fpp) of its rows instead of all
  * of them; for a selective small side that is a 10-100x shuffle-volume
  * cut. The final left-semi join makes the result EXACT — the bloom
  * pass only discards guaranteed non-matches.
  */
object BloomPrune {

  /** The pruning predicate alone (exposed for plan/spec inspection):
    * true iff `bigKey` is possibly in `small[smallKey]`.
    */
  def candidateFilter(small: DataFrame, smallKey: String, bigKey: Column,
                      expectedItems: Long, fpp: Double): Column = {
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomMightContainLong(
      ColumnBridge.expression(bigKey.cast("long")), bos.toByteArray))
  }

  /** Exact left-semi join of `big` against `small`'s keys, with the big
    * side bloom-pruned before the shuffle. Output is identical to
    * `big.join(small, bigKey === smallKey, "left_semi")`.
    */
  def prunedSemiJoin(big: DataFrame, bigKey: String, small: DataFrame,
                     smallKey: String, expectedItems: Long = 1000000L,
                     fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    big.filter(candidateFilter(small, smallKey, col(bigKey), expectedItems, fpp))
      .join(keys, col(bigKey) === col(smallKey), "left_semi")
  }
}
