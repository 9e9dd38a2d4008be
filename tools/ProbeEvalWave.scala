// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain ProbeEvalWave"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x probes for the r13 eval/series wave. Checksum-forced (sum of a
  * result column) so Catalyst cannot elide work under a bare count().
  *
  *   - thresholdMetrics: score domain fixed at 11 levels; the sweep
  *     must stay flat-per-row (one corpus scan) => ~linear wall.
  *   - assortativity: edges with bounded degree; symmetrize + 2 joins
  *     + fold => ~linear in edges.
  *   - moments: two scans + broadcast join => ~linear.
  *   - robustScale: two bounded-median passes + 2 broadcast joins =>
  *     ~linear; the distinct-value grid stays fixed (quantized).
  *   - gini: distinct-grid window bounded; fact fold linear.
  */
object ProbeEvalWave {
  private def timeMedian3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-eval-wave").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def scores(n: Long): DataFrame = spark.range(n).select(
      col("id"),
      ((col("id") % 11) / lit(10.0)).as("score"),
      (pmod(hash(col("id")), lit(100)) < 30).as("y"),
      concat(lit("g"), pmod(col("id"), lit(5))).as("g"),
      (pmod(hash(col("id"), lit(7)), lit(5000)).cast("double") / 10).as("v"))

    for (n <- Seq(2000000L, 20000000L)) {
      val df = scores(n)
      val (t1, c1) = timeMedian3 {
        graft.operators.Eval.thresholdMetrics(df, "score", col("y"),
            (0 to 10).map(_ / 10.0))
          .agg(sum("tp")).head().getLong(0)
      }
      println(f"PROBE thresholdMetrics n=$n wall=$t1%.2f s checksum=$c1")
      val (t2, c2) = timeMedian3 {
        graft.operators.Stats.moments(df, "g", "v")
          .agg(sum(abs(col("skewness")) * 1000).cast("long")).head().getLong(0)
      }
      println(f"PROBE moments n=$n wall=$t2%.2f s checksum=$c2")
      val (t3, c3) = timeMedian3 {
        graft.operators.Stats.gini(df, "g", "v")
          .agg(sum(col("gini") * 1000).cast("long")).head().getLong(0)
      }
      println(f"PROBE gini n=$n wall=$t3%.2f s checksum=$c3")
      val (t4, c4) = timeMedian3 {
        graft.operators.Stats.robustScale(df, "id", "g", "v")
          .agg(sum(abs(col("robust_z"))).cast("long")).head().getLong(0)
      }
      println(f"PROBE robustScale n=$n wall=$t4%.2f s checksum=$c4")
    }

    for (m <- Seq(1000000L, 10000000L)) {
      // bounded-degree edge list: 100k..1M nodes, avg degree ~10
      val edges = spark.range(m).select(
        pmod(hash(col("id")), lit(m / 10)).as("src"),
        (pmod(hash(col("id"), lit(3)), lit(m / 10)) + m).as("dst"))
      val (t5, c5) = timeMedian3 {
        graft.operators.Graph.assortativity(edges)
          .agg(sum(col("assortativity") * 1000000).cast("long")).head().getLong(0)
      }
      println(f"PROBE assortativity edges=$m wall=$t5%.2f s checksum=$c5")
    }
    spark.stop()
  }
}
