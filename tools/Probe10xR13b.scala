// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13b"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Experiment

/** 10x probes for the round-13 experiment wave:
  *
  *   - ratioMetricCI at 1x/10x units: one map-side-combined moment fold
  *     must scan-scale linearly with flat driver heap.
  *   - jackknifeRatioCI at 1x/10x units (fixed 20 buckets) AND at 10x
  *     buckets (200): cost must track the corpus scan; the bucket table
  *     stays bounded either way.
  *   - quantileTreatmentEffect at 1x/10x units: exact percentiles
  *     buffer each arm's values in the final aggregation task — the
  *     probe measures how the wall grows and the heap bound, the
  *     documented trade vs percentile_approx.
  *   - postStratifiedEffect at 10x strata (5k): the strata table is
  *     "bounded" only by the stratum cardinality; verify the fold cost
  *     tracks the corpus, not strata^2.
  */
object Probe10xR13b {
  private def timeMedian3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }
  private def heapMb(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe10x-r13b").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def units(n: Long): DataFrame = spark.range(n).select(
      $"id".as("u"),
      when($"id" % 2 === 0, "A").otherwise("B").as("arm"),
      ($"id" % 97).cast("double").as("num"),
      ($"id" % 13 + 1).cast("double").as("den"),
      ($"id" % 20).as("b20"), ($"id" % 200).as("b200"),
      ($"id" % 500).cast("string").as("s500"),
      ($"id" % 5000).cast("string").as("s5000"))

    // checksum-forced single-row reads (the one-row result IS the fold)
    def driveRatio(df: DataFrame): Long =
      (Experiment.ratioMetricCI(df, "num", "den")
        .head().getAs[Double]("ratio") * 1e6).toLong
    def driveJack(df: DataFrame, b: String): Long =
      (Experiment.jackknifeRatioCI(df, b, "num", "den")
        .head().getAs[Double]("se_jack") * 1e9).toLong
    def driveQte(df: DataFrame): Long =
      Experiment.quantileTreatmentEffect(
          df, "arm", "num", Seq(0.5, 0.9, 0.99), "A", "B")
        .agg(sum($"qte")).head().getDouble(0).toLong
    def drivePs(df: DataFrame, s: String): Long =
      (Experiment.postStratifiedEffect(df, "arm", s, "num", "A", "B")
        .head().getAs[Double]("delta_post_strat") * 1e6).toLong

    val h0 = heapMb()
    val (r1, _) = timeMedian3(driveRatio(units(1000000L)))
    val (r10, _) = timeMedian3(driveRatio(units(10000000L)))
    println(f"ratio_ci 1x=1M: $r1%.2f s  10x=10M: $r10%.2f s  " +
      f"ratio=${r10 / r1}%.1fx  heap ${h0}->${heapMb()} MB")

    val (j1, _) = timeMedian3(driveJack(units(1000000L), "b20"))
    val (j10, _) = timeMedian3(driveJack(units(10000000L), "b20"))
    val (j10b, _) = timeMedian3(driveJack(units(10000000L), "b200"))
    println(f"jackknife 1x=1M/20b: $j1%.2f s  10x=10M/20b: $j10%.2f s " +
      f"(${j10 / j1}%.1fx)  10M/200b: $j10b%.2f s  heap ${heapMb()} MB")

    val (q1, _) = timeMedian3(driveQte(units(1000000L)))
    val (q10, _) = timeMedian3(driveQte(units(10000000L)))
    println(f"qte 1x=1M: $q1%.2f s  10x=10M: $q10%.2f s  " +
      f"ratio=${q10 / q1}%.1fx  heap ${heapMb()} MB")

    val (p1, _) = timeMedian3(drivePs(units(1000000L), "s500"))
    val (p10, _) = timeMedian3(drivePs(units(10000000L), "s500"))
    val (p10s, _) = timeMedian3(drivePs(units(10000000L), "s5000"))
    println(f"post_strat 1x=1M/500s: $p1%.2f s  10x=10M/500s: $p10%.2f s " +
      f"(${p10 / p1}%.1fx)  10M/5000s: $p10s%.2f s  heap ${heapMb()} MB")

    spark.stop()
  }
}
