// scratch driver for manual 10x scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** 10x probe for Graph.node2vecWalks: the per-step cost is the frontier
  * exploding to its out-neighbors (frontier × avg-degree candidate rows,
  * each carrying one distance-1 lookup and one cumulative-window rank) —
  * THE scale-relevant term, since the uniform-walk probe already showed
  * the join scaffolding is launch-bound. Folding the sf0.1 co-occurrence
  * graph to 500 vs 5000 ids multiplies starts ×10 while average degree
  * stays in the same regime, so candidate rows and wall should scale
  * ~linearly in |starts| — quadratic growth would indicate the selection
  * window or the distance-1 join degenerating.
  */
object Probe10xR15c {
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
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_partkey", "l_suppkey").persist()
    li.count()
    Seq(500L, 5000L).foreach { m =>
      val edges = li.select((col("l_partkey") % m).cast("long").as("src"),
        (col("l_suppkey") % m).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      val nStarts = starts.count()
      val degSum = edges.distinct().count()
      val (sec, rows) = med3(
        Graph.node2vecWalks(edges, starts, walkLength = 4, p = 2.0, q = 4.0)
          .count())
      println(f"PROBE m=$m starts=$nStarts edges=$degSum rows=$rows med3=$sec%.2f s")
    }
    spark.stop()
  }
}
