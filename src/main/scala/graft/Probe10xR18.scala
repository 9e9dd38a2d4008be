// scratch driver for manual 10x scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/.
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{SemanticIndex, Similarity}

/** r18 probe: the persisted hyperplane-LSH index (VERDICT r17 item 1).
  *
  * Per-batch incremental semantic dedup must be BATCH-sized: a fixed
  * 200-vector batch is classified against a corpus of N and 10N
  * vectors, via (a) the in-memory `semanticDedupIncrement` — which
  * re-hashes the whole corpus per call, so its wall must grow ~10× —
  * and (b) `SemanticIndex.dedupAgainstIndex` over a pre-built on-disk
  * index — whose wall must stay FLAT because the corpus hashes once at
  * build time and the probe scan prunes to the batch's (t, bucket)
  * directories. Build cost is reported separately (paid once, not per
  * batch). Decisions are asserted identical between the two paths.
  */
object Probe10xR18 {
  private def med3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 64
    // deterministic pseudo-random corpus: hash-mixed phases so vectors
    // are near-orthogonal w.h.p. (a sin(a·d + b·id) grid would confine
    // every vector to the 2-d span of (sin ωd, cos ωd) and near-dup
    // EVERYTHING — measured: kept=0); the only cosine-0.9 pairs are the
    // planted scaled copies
    def vecs(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select($"id",
        transform(sequence(lit(0), lit(dim - 1)),
          d => sin(hash($"id", d).cast("double"))).as("v"))
    // fixed batch: 100 scaled copies of corpus rows (near-dups -> drop)
    // + 100 fresh ids beyond any corpus (novel -> keep)
    val batch = vecs(0L, 100L)
      .select(($"id" + 10000000L).as("id"),
        transform($"v", x => x * lit(3.0)).as("v"))
      .unionByName(vecs(90000000L, 90000100L))
      .localCheckpoint(true)
    Seq(20000L, 200000L).foreach { n =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"probe_semidx_$n").toString
      // the corpus lives ON DISK for both paths — that is the scenario
      // the index exists for (streamingSemanticIngest re-reads the
      // corpus parquet per micro-batch); a cached corpus would hand the
      // in-memory path a free full-corpus scan
      vecs(0L, n).write.parquet(s"$dir/corpus")
      val path = s"$dir/idx"
      // nBits sized per the operator's contract: 2^nBits ≈ n/maxBucket
      // so a bucket directory stays ~maxBucket rows and per-batch I/O
      // is (touched dirs)·(dir size) — batch-bounded, flat in n
      val nBits = math.max(4,
        63 - java.lang.Long.numberOfLeadingZeros(n / 64)).toInt
      val t0 = System.nanoTime()
      SemanticIndex.build(spark.read.parquet(s"$dir/corpus"),
        "id", "v", dim, path, nBits = nBits)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val (idxSec, idxRows) = med3(
        SemanticIndex.dedupAgainstIndex(batch, "id", "v", 0.9, path).count())
      val (incSec, incRows) = med3(
        Similarity.semanticDedupIncrement(batch,
          spark.read.parquet(s"$dir/corpus"), "id", "v", 0.9, dim).count())
      require(idxRows == incRows,
        s"decision mismatch at n=$n: idx=$idxRows inc=$incRows")
      println(f"PROBE corpus=$n nBits=$nBits build=$buildSec%.2f s " +
        f"dedupAgainstIndex=$idxSec%.2f s semanticDedupIncrement=$incSec%.2f s " +
        f"kept=$idxRows")
    }
    spark.stop()
  }
}
