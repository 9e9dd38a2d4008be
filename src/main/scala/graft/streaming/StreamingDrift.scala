package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CanonicalRowHash

/** Streaming twin of the engine's core operator: continuous row drift of
  * an incoming stream against a STATIC reference side (reference:
  * lotad/db_compare.py's data drift, one direction of it — the batch
  * [[graft.operators.DriftCompare.dataDrift]] run-scan needs both sides
  * complete, so only the "arriving side not in reference" half has a
  * well-defined continuous meaning; the reference-only half is a batch
  * question by nature, answerable any time the monitor is snapshotted).
  *
  * Mechanics: both sides are canonically hashed with the SAME
  * [[CanonicalRowHash]] the batch diff uses, the stream is exact-deduped
  * on the hash (set semantics, matching the batch operator), and a
  * stream-static LEFT ANTI join emits each previously-unseen row that
  * the reference does not contain — a stateless join per micro-batch
  * against the one-time-hashed static side.
  *
  * Scale: reference state is its distinct hash set (16 bytes/row,
  * prunable to the join's hash column only); dedup state grows with the
  * stream's distinct row count — cap it with
  * `withWatermark + dropDuplicatesWithinWatermark` upstream when the
  * monitored feed is time-ordered (same trade the other streaming twins
  * document).
  */
object StreamingDrift {

  /** A running drift monitor: the drift stream plus ownership of the
    * persisted reference hash-set plan. Call [[unpersist]] when the
    * monitor stops — it frees exactly THIS monitor's cached reference,
    * so restarting monitors in a long-lived session never accumulates
    * cache entries (the old guidance, `spark.catalog.clearCache()`, was
    * a global hammer that also nuked every unrelated cached plan).
    */
  final case class Monitor(drift: DataFrame, referenceHashes: DataFrame) {
    def unpersist(): Unit = { referenceHashes.unpersist(); () }
  }

  /** `stream` and `reference` must share the (already normalized)
    * column set — the caller aligns projections the same way
    * [[graft.operators.DriftCompare]] does for batch sides. Convenience
    * form of [[monitor]] for one-shot monitors that live as long as the
    * session.
    */
  @deprecated("apply discards the Monitor handle, so the persisted " +
    "reference hash set can never be released per-monitor; use monitor() " +
    "and call unpersist() when stopping", "round-10")
  def apply(stream: DataFrame, reference: DataFrame): DataFrame =
    monitor(stream, reference).drift

  def monitor(stream: DataFrame, reference: DataFrame): Monitor = {
    require(stream.columns.toSet == reference.columns.toSet,
      s"aligned projections required; stream-only: " +
        s"${stream.columns.toSet.diff(reference.columns.toSet)}, " +
        s"reference-only: ${reference.columns.toSet.diff(stream.columns.toSet)}")
    val cols = stream.columns.toSeq
    // stream-static joins re-evaluate the static plan EVERY micro-batch;
    // persist the hashed reference so batch 2+ reads the 16-byte hash set
    // from cache instead of rescanning + rehashing the reference table.
    // The returned Monitor owns the lifetime (Monitor.unpersist()).
    val refHashes = reference
      .select(CanonicalRowHash(struct(cols.map(c => col(s"`$c`")): _*)).as("hashed_row"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val drift = stream
      .withColumn("hashed_row",
        CanonicalRowHash(struct(cols.map(c => col(s"`$c`")): _*)))
      .dropDuplicates("hashed_row")
      .join(refHashes, Seq("hashed_row"), "left_anti")
    Monitor(drift, refHashes)
  }
}
