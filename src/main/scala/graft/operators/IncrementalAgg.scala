package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-key rollup current by
  * MERGING a persisted snapshot with the aggregate of a (much smaller)
  * delta, instead of rescanning the corpus — the production shape for
  * daily-updated rollups over append-mostly data: at 100 TB the nightly
  * job aggregates only the new partition (GBs) and folds it into the
  * key-bounded snapshot, never touching historical rows again.
  *
  * Only DECOMPOSABLE aggregates are offered (count/sum/min/max — the
  * ones with an associative, commutative merge); avg and friends derive
  * from (count, sum) at read time. Sums run over DECIMAL(18,2) so the
  * merged total is exact and independent of merge order — a
  * double-accumulated sum would drift from the full recompute by
  * accumulation order, breaking the defining property
  * merge(aggregate(a), b) == aggregate(a ∪ b).
  *
  * Scale shape: [[aggregate]] is one map-side-combined hash aggregation
  * (output bounded by key cardinality); [[merge]] unions the
  * key-bounded snapshot with the delta's aggregate and folds once —
  * cost O(|snapshot| + |delta|), with AQE broadcasting nothing (it is
  * a pure aggregation, no join). When the snapshot is stored bucketed
  * by the key, the union's shuffle moves only the delta side.
  */
object IncrementalAgg {

  /** One maintained aggregate: `op` in count|sum|min|max; `c` is the
    * source column (ignored for count). Output column = `as`.
    */
  final case class Spec(op: String, c: String, as: String) {
    require(Set("count", "sum", "min", "max")(op), s"unsupported op: $op")
  }

  private def firstAgg(s: Spec): Column = s.op match {
    case "count" => count(lit(1)).as(s.as)
    case "sum"   => sum(col(s.c).cast("decimal(18,2)")).as(s.as)
    case "min"   => min(col(s.c)).as(s.as)
    case "max"   => max(col(s.c)).as(s.as)
  }

  /** The re-aggregation that folds two partial states: counts and sums
    * add, mins/maxes fold idempotently.
    */
  private def mergeAgg(s: Spec): Column = s.op match {
    case "count" => sum(col(s.as)).as(s.as)
    case "sum"   => sum(col(s.as)).as(s.as)
    case "min"   => min(col(s.as)).as(s.as)
    case "max"   => max(col(s.as)).as(s.as)
  }

  /** Build a snapshot (or a delta's partial state) from raw rows. */
  def aggregate(df: DataFrame, keys: Seq[String], specs: Seq[Spec]): DataFrame = {
    require(specs.nonEmpty, "need at least one spec")
    df.groupBy(keys.map(col): _*)
      .agg(firstAgg(specs.head), specs.tail.map(firstAgg): _*)
  }

  /** Fold a raw delta into an existing snapshot; the result is
    * value-identical to aggregating snapshot-rows ∪ delta-rows from
    * scratch (exactly — see the DECIMAL note above), and is itself a
    * valid snapshot for the next merge.
    */
  def merge(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
            specs: Seq[Spec]): DataFrame = {
    val deltaAgg = aggregate(delta, keys, specs)
    // count columns come out of aggregate() as non-nullable longs; sum
    // re-widens them fine. unionByName keeps the snapshot's schema
    // authoritative (a snapshot loaded from parquet has nullable cols).
    snapshot.unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(mergeAgg(specs.head), specs.tail.map(mergeAgg): _*)
  }
}
