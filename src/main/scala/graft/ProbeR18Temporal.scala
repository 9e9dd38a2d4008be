// scratch driver for the r18 temporal-walk planted-hub probe (not part
// of the library): lives in src/ only while running, then moves to
// tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Planted-hub probe for [[Graph.temporalWalks]]: S funnel walks all
  * stand on one hub with D time-stamped out-edges at step 2. The claim
  * under test is the design note in the operator scaladoc — steps are
  * exact-rank equi-joins, so the walk wall must be FLAT in raw hub
  * degree even UNCAPPED (the hub's cost is one per-src window sort at
  * adjacency build, not per-step candidates). maxDeg=64 is measured
  * alongside (it bounds the build window, not the step).
  */
object ProbeR18Temporal {
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
      // funnel at ts=0 into hub 0; hub fans out at ts=1..D
      val funnel = spark.range(1, S + 1)
        .select($"id".as("src"), lit(0L).as("dst"), lit(0L).as("ts"))
      val hub = spark.range(d)
        .select(lit(0L).as("src"), ($"id" + 1000000L).as("dst"),
          ($"id" + 1L).as("ts"))
      val edges = funnel.unionByName(hub).localCheckpoint(true)
      val starts = spark.range(1, S + 1).select($"id")
      for ((name, run) <- Seq[(String, () => Long)](
        ("temporalWalks-uncapped", () =>
          Graph.temporalWalks(edges, starts, walkLength = 2).count()),
        ("temporalWalks-cap64", () =>
          Graph.temporalWalks(edges, starts, walkLength = 2,
            maxDeg = Some(64)).count()))) {
        val (sec, rows) = med3(run())
        println(f"PROBE hub=$d variant=$name walks=$S rows=$rows med3=$sec%.2f s")
      }
    }
    spark.stop()
  }
}
