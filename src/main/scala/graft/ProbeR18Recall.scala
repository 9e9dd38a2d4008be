// scratch driver for the r18 whitened-vs-raw PQ recall comparison (not
// part of the library): lives in src/ only while running, then moves to
// tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** VERDICT r18 item 2's measurement half: recall@10 of PQ-ADC against
  * exact cosine top-10 on the real sf0.01 embeddings, raw vs whitened
  * (OPQ-lite). Vectors are L2-normalized first so exact-L2 rank order
  * equals cosine rank order and the ADC metric targets the same truth.
  * Also reports per-subspace reconstruction MSE (the balance whitening
  * buys) via [[Pq.reconstructionDrift]].
  */
object ProbeR18Recall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // ANISO=1: stretch each PQ SUBSPACE (contiguous 8 dims) by
    // 1 + 3·(d div 8) — the anisotropic regime whitening exists for
    // (raw subspaces then carry wildly different energy); default: the
    // corpus as-is (near-isotropic)
    val aniso = sys.env.get("SPARK_GRAFT_PROBE_ANISO").contains("1")
    val raw0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val stretched =
      if (!aniso) raw0.select(col("vec_id"), col("embedding"))
      else raw0.select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, d) => x * (lit(1.0) + lit(3.0) * floor(d / 8).cast("double")))
          .as("embedding"))
    val e = stretched
      .select(col("vec_id"), Similarity.l2Normalize(col("embedding")).as("v"))
      .localCheckpoint(true)
    val queries = e.filter(col("vec_id") < 50)
    val truth = Similarity.bruteForceTopK(queries, e, 10,
        idCol = "vec_id", vecCol = "v")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .localCheckpoint(true)
    val m = 8; val ksub = 16
    def recall(top: org.apache.spark.sql.DataFrame): Double = {
      val t = top.filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id")
      val hits = truth.join(t, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble
      hits / truth.count()
    }
    // raw PQ
    val rawBooks = Pq.fit(e, m, ksub, idCol = "vec_id", vecCol = "v")
    val rawCodes = Pq.encode(e, "vec_id", "v", rawBooks)
    val rawTop = Pq.adcTopK(queries, rawCodes, 11, rawBooks,
      idCol = "vec_id", vecCol = "v")
    val rawRecall = recall(rawTop)
    val rawMse = Pq.reconstructionDrift(e, "v", rawBooks)
      .select("mse").as[Double].collect()
    // whitened PQ (k = full dim: pure rotation+scale, no truncation)
    val (pca, wBooks) = Pq.fitWhitened(e, m, ksub, k = 64,
      center = false, idCol = "vec_id", vecCol = "v")
    val proj = Similarity.pcaApply(e, "vec_id", "v", pca).localCheckpoint(true)
    val wCodes = Pq.encode(proj, "vec_id", "pca", wBooks)
    val wQueries = Similarity.pcaApply(queries, "vec_id", "v", pca)
    val wTop = Pq.adcTopK(wQueries, wCodes, 11, wBooks,
      idCol = "vec_id", vecCol = "pca")
    val wRecall = recall(wTop)
    val wMse = Pq.reconstructionDrift(proj, "pca", wBooks)
      .select("mse").as[Double].collect()
    // rotated (orthogonal + eigenvalue allocation — metric-preserving)
    val (rot, rBooks) = Pq.fitRotated(e, m, ksub, k = 64,
      center = false, idCol = "vec_id", vecCol = "v")
    val rProj = Similarity.pcaApply(e, "vec_id", "v", rot).localCheckpoint(true)
    val rCodes = Pq.encode(rProj, "vec_id", "pca", rBooks)
    val rQueries = Similarity.pcaApply(queries, "vec_id", "v", rot)
    val rTop = Pq.adcTopK(rQueries, rCodes, 11, rBooks,
      idCol = "vec_id", vecCol = "pca")
    val rRecall = recall(rTop)
    val rMse = Pq.reconstructionDrift(rProj, "pca", rBooks)
      .select("mse").as[Double].collect()
    def spread(xs: Array[Double]): Double =
      if (xs.min <= 0) Double.PositiveInfinity else xs.max / xs.min
    println(f"PROBE pq_recall raw=$rawRecall%.3f whitened=$wRecall%.3f " +
      f"rotated=$rRecall%.3f rawMseSpread=${spread(rawMse)}%.1f " +
      f"whitenedMseSpread=${spread(wMse)}%.1f " +
      f"rotatedMseSpread=${spread(rMse)}%.1f " +
      f"(m=$m ksub=$ksub k=64 queries=50 top10)")
    spark.stop()
  }
}
