// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13c"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Experiment

/** 10x probes for the third r13 wave:
  *   - aaCalibration explodes the corpus x50: wall must track units
  *     linearly (the explode collapses in ONE map-side-combined agg to
  *     k rows) with flat driver heap.
  *   - clusterRobustZ at 10x units AND 10x clusters: two distributed
  *     folds, no bounded-cluster assumption — cost tracks the scan.
  */
object Probe10xR13c {
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
      .appName("probe10x-r13c").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def units(n: Long): DataFrame = spark.range(n).select(
      $"id".as("u"), ($"id" % 5 === 0).as("ok"),
      when($"id" % 2 === 0, "A").otherwise("B").as("arm"),
      ($"id" % (n / 100)).cast("string").as("cl"))

    def driveAa(df: DataFrame): Long =
      (Experiment.aaCalibration(df, "u", col("ok"), 50)
        .head().getAs[Double]("false_positive_rate") * 1e6).toLong
    def driveCl(df: DataFrame): Long =
      (Experiment.clusterRobustZ(df, "arm", "cl", col("ok"), "A", "B")
        .head().getAs[Double]("p_a") * 1e6).toLong

    val h0 = heapMb()
    val (a1, _) = timeMedian3(driveAa(units(100000L)))
    val (a10, _) = timeMedian3(driveAa(units(1000000L)))
    println(f"aa_calibration 1x=100k: $a1%.2f s  10x=1M: $a10%.2f s  " +
      f"(${a10 / a1}%.1fx)  heap ${h0}->${heapMb()} MB")

    val (c1, _) = timeMedian3(driveCl(units(1000000L)))
    val (c10, _) = timeMedian3(driveCl(units(10000000L)))
    println(f"cluster_z 1x=1M/10k-cl: $c1%.2f s  10x=10M/100k-cl: $c10%.2f s " +
      f"(${c10 / c1}%.1fx)  heap ${heapMb()} MB")
    spark.stop()
  }
}
