// scratch driver for manual 10x scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/. See tools/Probe10x.scala.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** 10x probe for Graph.randomWalks: walks over the sf0.1 co-occurrence
  * graph folded to 500 vs 5000 node ids (≈10x nodes, ≈10x distinct
  * edges, same walk length, |starts| scaling with nodes). The frontier
  * is ≤ |starts| per step and every stage is an equi-join on the node
  * key, so wall clock and output rows should scale ~linearly; the
  * ranked-neighbor table is the only materialized state.
  */
object Probe10xR15b {
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
      val nEdges = edges.distinct().count()
      val (sec, rows) = med3(
        Graph.randomWalks(edges, starts, walkLength = 4).count())
      println(f"PROBE m=$m edges=$nEdges rows=$rows med3=$sec%.2f s")
    }
    spark.stop()
  }
}
