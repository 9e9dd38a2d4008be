package graft.streaming

import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Streaming corpus ingestion with incremental near-dup classification —
  * the continuous form of the daily-crawl loop
  * ([[graft.operators.Dedup.dedupAgainstIndex]] +
  * [[graft.operators.Dedup.appendLshIndex]]): every micro-batch of new
  * documents is classified against the SAVED LSH index (asymmetric
  * new×corpus band join — cost scales with the batch, never the corpus),
  * decisions land in an append-only parquet log, and the batch's NOVEL
  * documents fold into the on-disk index so the NEXT batch deduplicates
  * against them too.
  *
  * Shape notes:
  *   - `foreachBatch` rather than chained stateful operators: the
  *     candidate join's "best match per new id" reduction and the index
  *     append are batch-relational steps; holding corpus-scale sketch
  *     state in the streaming state store would re-implement the index,
  *     worse (state store is per-query, unshareable, and rebuilt on
  *     every restart — the parquet index is durable and shared).
  *   - Restart safety: Spark may REPLAY the last uncommitted batch after
  *     a crash. Decisions are keyed by epoch (dedup downstream on
  *     (epoch_id, new_id) if exact-once matters) and the index append is
  *     retry-IDEMPOTENT by construction (appendLshIndex anti-joins ids
  *     already present), so a replayed batch cannot double-append.
  *   - The index must exist (build/save once from the seed corpus); the
  *     meta table pins the banding, so every batch sketches with the
  *     SAME parameters.
  */
object DedupOps {

  /** Build the writer; caller sets checkpoint/trigger options and calls
    * `.start()`. Decision log schema: (epoch_id, new_id, matched_id,
    * jaccard, is_novel).
    */
  def streamingCorpusIngest(newDocs: DataFrame, textCol: String,
                            idCol: String, threshold: Double,
                            indexPath: String,
                            decisionsPath: String): DataStreamWriter[Row] =
    newDocs.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val idx = Dedup.loadLshIndex(spark, indexPath)
        val decisions = Dedup
          .dedupAgainstIndex(batch, textCol, idCol, threshold, idx)
          .withColumn("epoch_id", lit(epochId))
          .select("epoch_id", "new_id", "matched_id", "jaccard", "is_novel")
          .persist() // one classification pass feeds BOTH writes
        try {
          decisions.write.mode("append").parquet(decisionsPath)
          val novelIds = decisions.filter(col("is_novel"))
            .select(col("new_id"))
          val novelDocs = batch.join(novelIds,
            batch(idCol) === novelIds("new_id"), "left_semi")
          Dedup.appendLshIndex(novelDocs, textCol, idCol, indexPath)
        } finally decisions.unpersist(blocking = false)
      }
      ()
    }

  /** Streaming EMBEDDING ingestion with semantic dedup — the
    * [[streamingCorpusIngest]] shape for vectors: every micro-batch is
    * classified against the on-disk embedding corpus with
    * [[graft.operators.Similarity.semanticDedupIncrement]] (no corpus
    * near-neighbor + min-id within the batch), decisions land in an
    * append-only log, and the batch's survivors fold into the corpus so
    * the NEXT batch deduplicates against them too.
    *
    * Same discipline as the text twin: `foreachBatch` (the
    * classification is batch-relational; streaming state would
    * re-implement the corpus, unshareable and restart-fragile), and the
    * corpus append is retry-IDEMPOTENT — survivors anti-join ids already
    * present, so a replayed batch cannot double-append even when its
    * vector can't match itself (a zero vector's self-cosine is NaN; the
    * id check catches what the cosine can't). The corpus parquet must
    * exist (seed it once). Decision log: (epoch_id, idCol, is_novel).
    */
  def streamingSemanticIngest(newVecs: DataFrame, idCol: String,
                              vecCol: String, minCosine: Double, dim: Int,
                              corpusPath: String,
                              decisionsPath: String): DataStreamWriter[Row] =
    newVecs.writeStream.foreachBatch { (batch: DataFrame, epochId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val corpus = spark.read.parquet(corpusPath)
        val kept = graft.operators.Similarity
          .semanticDedupIncrement(batch, corpus, idCol, vecCol, minCosine, dim)
          .persist()
        try {
          val fresh = batch
            .join(kept.select(col(idCol)), Seq(idCol), "left_semi")
            .join(corpus.select(col(idCol)), Seq(idCol), "left_anti")
            .persist()
          // materialize the survivors BEFORE appending to the path the
          // plan reads from — the cache, not the re-listed directory,
          // feeds the write
          fresh.count()
          batch.select(col(idCol))
            .withColumn("epoch_id", lit(epochId))
            .join(kept.select(col(idCol), lit(true).as("_nv")),
              Seq(idCol), "left")
            .select(col("epoch_id"), col(idCol),
              coalesce(col("_nv"), lit(false)).as("is_novel"))
            .write.mode("append").parquet(decisionsPath)
          fresh.write.mode("append").parquet(corpusPath)
          fresh.unpersist(blocking = false)
        } finally kept.unpersist(blocking = false)
      }
      ()
    }
}
