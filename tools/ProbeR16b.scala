// scratch driver for manual scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** k-bound probe for the r16 cell ops: cellMatching and clusterAgreement
  * at the k = 256 contract limit on the sf0.1 embeddings (2000 rows,
  * 64-dim). The claim under test is the model-size split: the 256×256
  * cosine matrix (matching) and contingency (agreement) stay bounded,
  * so wall should be dominated by the one corpus pass (two NearestCells
  * kernels per row = 2·256 centroid distances each) — NOT by k²-driven
  * shuffles. Also measures k = 64 for the scaling shape: cost should
  * grow ~linearly in k (kernel work), not quadratically (matrix work).
  */
object ProbeR16b {
  private def med3(f: => Long): Double = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    xs.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist()
    val n = emb.count()
    Seq(64, 256).foreach { k =>
      // deterministic synthetic codebooks (no fit cost in the probe)
      val c1 = Array.tabulate(k, 64)((c, j) => math.sin(c * 64 + j).abs + 0.01)
      val c2 = Array.tabulate(k, 64)((c, j) => math.cos(c * 64 + j).abs + 0.01)
      val tm = med3(Similarity.cellMatching(emb, emb, "v", c1, c2).count())
      val ta = med3(Similarity.clusterAgreement(emb, "v", c1, c2).count())
      println(f"PROBE k=$k n=$n cellMatching=$tm%.2f s clusterAgreement=$ta%.2f s")
    }
    spark.stop()
  }
}
