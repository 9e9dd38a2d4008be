// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13d"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Multimodal, Privacy, Stats}

/** 10x probes for the fourth r13 wave:
  *   - frequentSequences at 10x events: windows + distinct-user aggs
  *     must track the scan ~linearly (the Apriori probes broadcast a
  *     |types|^2-bounded set, so no quadratic stage exists).
  *   - backtestForecast at 10x keys: one stacked window per key — cost
  *     tracks rows, not horizons x rows.
  *   - dpRelease at 10x rows: one map-side-combined agg, flat beyond
  *     the scan.
  *   - imageExif at 10x payloads: header-only byte walk, scan-speed.
  */
object Probe10xR13d {
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
      .appName("probe10x-r13d").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def events(n: Long): DataFrame = spark.range(n).select(
      $"id".as("event_id"), ($"id" % (n / 20)).as("user_id"),
      ($"id" * 1000000L).cast("timestamp").as("ts"),
      concat(lit("t"), pmod(hash($"id"), lit(6))).as("event_type"))

    def driveSeq(df: DataFrame): Long =
      EventAnalytics.frequentSequences(df, minShare = 0.05).count()

    val h0 = heapMb()
    val (s1, n1) = timeMedian3(driveSeq(events(1000000L)))
    val (s10, n10) = timeMedian3(driveSeq(events(10000000L)))
    println(f"frequent_seqs 1x=1M: $s1%.2f s ($n1 seqs)  10x=10M: $s10%.2f s " +
      f"($n10 seqs)  (${s10 / s1}%.1fx)  heap ${h0}->${heapMb()} MB")

    def daily(keys: Long): DataFrame = spark.range(keys * 1000).select(
      ($"id" % keys).cast("string").as("k"), ($"id" / keys).as("t"),
      ($"id" % 97).cast("double").as("v"))
    def driveBt(df: DataFrame): Long =
      Stats.backtestForecast(df, "k", "t", "v").agg(sum("n")).head().getLong(0)

    val (b1, _) = timeMedian3(driveBt(daily(100L)))
    val (b10, _) = timeMedian3(driveBt(daily(1000L)))
    println(f"backtest 1x=100k-rows: $b1%.2f s  10x=1M-rows: $b10%.2f s " +
      f"(${b10 / b1}%.1fx)  heap ${heapMb()} MB")

    def rows(n: Long): DataFrame = spark.range(n).select(
      concat(lit("g"), pmod(hash($"id"), lit(50))).as("g"),
      ($"id" % 200).cast("double").as("v"))
    def driveDp(df: DataFrame): Long =
      Privacy.dpRelease(df, "g", col("v"), 1.0, 100.0).count()

    val (d1, _) = timeMedian3(driveDp(rows(2000000L)))
    val (d10, _) = timeMedian3(driveDp(rows(20000000L)))
    println(f"dp_release 1x=2M: $d1%.2f s  10x=20M: $d10%.2f s " +
      f"(${d10 / d1}%.1fx)  heap ${heapMb()} MB")

    def payloads(n: Long): DataFrame = {
      val mk = udf((d: Long) => graft.operators.ExifHeader.syntheticExifJpeg(
        (d % 500 + 32).toInt, (d % 300 + 24).toInt, (d % 8 + 1).toInt,
        bigEndian = d % 2 == 0))
      spark.range(n).select($"id".as("doc_id"), mk($"id").as("payload"))
    }
    def driveExif(df: DataFrame): Long =
      Multimodal.imageExif(df).agg(sum("orientation")).head().getLong(0)

    val (e1, _) = timeMedian3(driveExif(payloads(200000L)))
    val (e10, _) = timeMedian3(driveExif(payloads(2000000L)))
    println(f"image_exif 1x=200k: $e1%.2f s  10x=2M: $e10%.2f s " +
      f"(${e10 / e1}%.1fx)  heap ${heapMb()} MB")
    spark.stop()
  }
}
