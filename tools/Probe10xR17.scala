// scratch driver for manual 10x scale probes (not part of the library):
// lives in src/ only while running, then moves to tools/.
package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** r17 planted-hub probe: verifies the two walk-family scale changes.
  *
  *  1. weightedWalks bucketed step join (VERDICT r16 item 1): candidate
  *     PRODUCTION per hub step must drop from D (frontier × out-degree)
  *     to ~D/1024. Measured two ways: wall clock at D = 1e4 → 1e5, and
  *     a direct candidate count — the step-2 join is reproduced with
  *     the operator's own bucket arithmetic, counting matches of
  *     (src, bucket) BEFORE the residual interval filter, against the
  *     r16 shape's (src)-only join.
  *  2. node2vecWalks maxDeg (item 2): with the in-operator cap the
  *     walk must be FLAT in raw hub degree (the capped adjacency is
  *     built once; steps see ≤ maxDeg candidates per walk).
  */
object Probe10xR17 {
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
      val funnel = spark.range(1, S + 1)
        .select($"id".as("src"), lit(0L).as("dst"))
      val hub = spark.range(d)
        .select(lit(0L).as("src"), ($"id" + 1000000L).as("dst"))
      val edges = funnel.unionByName(hub)
        .withColumn("weight", lit(1L))
        .localCheckpoint(true)
      val starts = spark.range(1, S + 1).select($"id")
      for ((name, run) <- Seq[(String, () => Long)](
        ("weightedWalks-bucketed", () =>
          Graph.weightedWalks(edges, starts, walkLength = 2).count()),
        ("node2vecWalks-cap64", () =>
          Graph.node2vecWalks(edges, starts, walkLength = 2,
            p = 2.0, q = 4.0, maxDeg = Some(64)).count()),
        ("node2vecWalks-uncapped", () =>
          Graph.node2vecWalks(edges, starts, walkLength = 2,
            p = 2.0, q = 4.0).count()))) {
        val (sec, rows) = med3(run())
        println(f"PROBE hub=$d variant=$name walks=$S rows=$rows med3=$sec%.2f s")
      }
      // direct candidate count at step 2 (all S walks stand on the hub):
      // the operator's adjacency arithmetic, counting (src, bucket)
      // matches BEFORE the interval filter vs the r16 (src)-only join
      val nB = 1024
      def bkt(x: org.apache.spark.sql.Column, tot: org.apache.spark.sql.Column) =
        least(floor(x * lit(nB.toDouble) / tot), lit((nB - 1).toLong))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy("dst")
      val W = org.apache.spark.sql.expressions.Window
      val nbr = edges.select($"src", $"dst", $"weight".cast("double").as("w"))
        .groupBy("src", "dst").agg(sum("w").as("w"))
        .select($"src", $"dst", $"w",
          sum($"w").over(rw.rowsBetween(W.unboundedPreceding, W.currentRow)).as("cum"),
          sum($"w").over(rw.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)).as("tot"))
        .withColumn("b", explode(sequence(bkt($"cum" - $"w", $"tot"), bkt($"cum", $"tot"))))
        .localCheckpoint(true)
      // frontier at step 2: every walk on node 0 with its threshold bucket
      val u = conv(substring(md5(concat_ws(":", lit("ww"), lit(7L),
          $"walk_id", lit(2), $"node")), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(math.scalb(1.0, 60))
      val fr = spark.range(1, S + 1).select($"id".as("walk_id"), lit(0L).as("node"))
        .join(nbr.groupBy($"src".as("n2")).agg(max("tot").as("tot")), $"node" === $"n2")
        .withColumn("thr", u * $"tot")
        .withColumn("tb", bkt($"thr", $"tot"))
      val bucketed = fr.join(nbr.select($"src".as("ns"), $"b".as("nb")),
        $"node" === $"ns" && $"tb" === $"nb").count()
      val full = fr.join(nbr.select($"src".as("ns"), $"dst").distinct(),
        $"node" === $"ns").count()
      println(f"PROBE hub=$d candidates bucketed=$bucketed " +
        f"r16-shape=$full (per-walk ${bucketed / S} vs ${full / S})")
    }
    spark.stop()
  }
}
