// scratch driver for a manual scale probe (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain ProbeCcChain"`, then remove.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Worst-case diameter probe for the distributed connected-components
  * path (Dedup.connectedComponents above smallGraphEdges): a single
  * path graph of n nodes has diameter n−1, the adversarial shape for
  * label propagation. Before the r13 fix the loop was one-hop
  * min-propagation with persist-only state: O(n) rounds needed and the
  * logical plan DOUBLED per round (2 GB plan strings at round ~30 —
  * caught live when the new collect-audit spec drove a 40-chain down
  * this path). With pointer jumping + localCheckpoint it must converge
  * in O(log n) rounds with flat plan size.
  *
  * Probe shape: chains of 100k and 1M nodes (forced down the
  * distributed path), report rounds implied by wall time and the
  * component count (must be 1).
  */
object ProbeCcChain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-cc-chain").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- Seq(100000L, 1000000L)) {
      val edges = spark.range(n - 1)
        .select(col("id").as("id1"), (col("id") + 1).as("id2"))
      val t0 = System.nanoTime()
      val cc = graft.operators.Dedup.connectedComponents(
        edges, maxIter = 40, smallGraphEdges = 10L)
      val nComp = cc.agg(countDistinct("component")).head().getLong(0)
      val nNodes = cc.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val heap = {
        System.gc(); Thread.sleep(200); System.gc()
        val r = Runtime.getRuntime
        (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
      }
      println(f"[probe] chain n=$n%d components=$nComp%d nodes=$nNodes%d " +
        f"wall=$sec%.2f s heapMb=$heap%d")
      graft.operators.Graph.release(cc)
    }
    spark.stop()
  }
}
