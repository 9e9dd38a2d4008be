// scratch driver for manual 10x scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Planted-hub 10x probe for the walk family (closes the r15 verdict's
  * "hub-degree skew unprobed" finding). The r15b/c probes scaled STARTS
  * on near-uniform graphs; this one scales the DEGREE dimension: S
  * walks are funneled onto a single hub (every start's only out-edge
  * points at node 0) and the hub's out-degree D is multiplied ×10
  * (1e4 → 1e5), so step 2's cost is exactly the hub term Σ_walks
  * outdeg(cur) = S·D. Expected shapes:
  *   - randomWalks: FLAT in D — the md5-index (src, rnk) equi-join
  *     produces exactly one row per walk, never a candidate set;
  *   - weightedWalks (r16 rewrite): ~linear in D with a small constant —
  *     S·D candidate rows stream through the step join's residual
  *     interval filter, but nothing is sorted or windowed;
  *   - node2vecWalks: ~linear in D with the large constant — S·D
  *     candidate rows each take a distance-1 lookup plus a per-walk
  *     cumulative window sort (the inherent second-order cost the
  *     scaladoc contract states).
  */
object Probe10xR16 {
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
    val S = 1000L
    Seq(10000L, 100000L).foreach { d =>
      // starts 1..S each with the single edge s -> 0; hub 0 -> 1e6+j
      val funnel = spark.range(1, S + 1)
        .select($"id".as("src"), lit(0L).as("dst"))
      val hub = spark.range(d)
        .select(lit(0L).as("src"), ($"id" + 1000000L).as("dst"))
      val edges = funnel.unionByName(hub)
        .withColumn("weight", lit(1L))
        .localCheckpoint(true)
      val starts = spark.range(1, S + 1).select($"id")
      for ((name, run) <- Seq[(String, () => Long)](
        ("randomWalks", () =>
          Graph.randomWalks(edges, starts, walkLength = 2).count()),
        ("weightedWalks", () =>
          Graph.weightedWalks(edges, starts, walkLength = 2).count()),
        ("node2vecWalks", () =>
          Graph.node2vecWalks(edges, starts, walkLength = 2,
            p = 2.0, q = 4.0).count()))) {
        val (sec, rows) = med3(run())
        println(f"PROBE hub=$d variant=$name walks=$S rows=$rows med3=$sec%.2f s")
      }
    }
    spark.stop()
  }
}
