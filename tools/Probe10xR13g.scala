// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13g"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Classifier, EventAnalytics, Stats, TextAnalysis}

/** 10x probes for the r13 eighth+ waves:
  *   - permutationTest: corpus x50 explode (the aaCalibration shape) —
  *     map-side collapse to 50 rows; should track the explode scan.
  *   - friedman: block-partitioned windows + bounded folds — linear.
  *   - entropyRate: user lag window + bounded transition table.
  *   - bestSplit: distinct-value CDF (bounded candidates) — flat
  *     beyond the scan.
  *   - burstiness / distinctN: corpus folds — linear.
  * Checksums force real output columns (no bare count()).
  */
object Probe10xR13g {
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
  private def sumHash(df: DataFrame): Long = {
    val cs = df.columns.map(col)
    df.agg(sum(hash(cs: _*))).head().getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe10x-r13g").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val h0 = heapMb()

    def rows(n: Long): DataFrame = spark.range(n).select(
      $"id".as("rid"),
      when(pmod(hash($"id"), lit(2)) === 0, "a").otherwise("b").as("g"),
      (pmod(hash($"id" * 3), lit(1000)).cast("double") / 10).as("v"))
    def drivePt(df: DataFrame): Long =
      sumHash(Stats.permutationTest(df, "rid", "g", "v", "a", "b"))
    val (pt1, _) = timeMedian3(drivePt(rows(200000L)))
    val (pt10, _) = timeMedian3(drivePt(rows(2000000L)))
    println(f"perm_test 1x=200k: $pt1%.2f s  10x=2M: $pt10%.2f s (${pt10 / pt1}%.1fx)")

    def blocks(n: Long): DataFrame = spark.range(n).select(
      ($"id" / 5).cast("long").as("b"),
      concat(lit("t"), pmod($"id", lit(5))).as("t"),
      pmod(hash($"id"), lit(100)).cast("double").as("v"))
    def driveFr(df: DataFrame): Long =
      sumHash(Stats.friedman(df, "b", "t", "v"))
    val (fr1, _) = timeMedian3(driveFr(blocks(1000000L)))
    val (fr10, _) = timeMedian3(driveFr(blocks(10000000L)))
    println(f"friedman 1x=1M cells: $fr1%.2f s  10x=10M: $fr10%.2f s (${fr10 / fr1}%.1fx)")

    def events(n: Long): DataFrame = spark.range(n).select(
      $"id".as("event_id"), ($"id" % (n / 50)).as("user_id"),
      ($"id" * 1000000L).cast("timestamp").as("ts"),
      concat(lit("t"), pmod(hash($"id"), lit(7))).as("event_type"))
    def driveEr(df: DataFrame): Long =
      sumHash(EventAnalytics.entropyRate(df))
    val (er1, _) = timeMedian3(driveEr(events(1000000L)))
    val (er10, _) = timeMedian3(driveEr(events(10000000L)))
    println(f"entropy_rate 1x=1M ev: $er1%.2f s  10x=10M: $er10%.2f s (${er10 / er1}%.1fx)")

    def feat(n: Long): DataFrame = spark.range(n).select(
      (pmod(hash($"id"), lit(500)).cast("double") / 100).as("x"),
      (pmod(hash($"id" * 7), lit(3)) === 0).as("y"))
    def driveBs(df: DataFrame): Long =
      sumHash(Classifier.bestSplit(df, "x", col("y")))
    val (bs1, _) = timeMedian3(driveBs(feat(1000000L)))
    val (bs10, _) = timeMedian3(driveBs(feat(10000000L)))
    println(f"best_split 1x=1M: $bs1%.2f s  10x=10M: $bs10%.2f s (${bs10 / bs1}%.1fx)")

    def docs(n: Long): DataFrame = spark.range(n).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash($"id" * 31 + j), lit(2000)))): _*).as("text"))
    def driveBu(df: DataFrame): Long = sumHash(TextAnalysis.burstiness(df))
    val (bu1, _) = timeMedian3(driveBu(docs(100000L)))
    val (bu10, _) = timeMedian3(driveBu(docs(1000000L)))
    println(f"burstiness 1x=100k docs: $bu1%.2f s  10x=1M: $bu10%.2f s (${bu10 / bu1}%.1fx)")

    def driveDn(df: DataFrame): Long = sumHash(TextAnalysis.distinctN(df))
    val (dn1, _) = timeMedian3(driveDn(docs(100000L)))
    val (dn10, _) = timeMedian3(driveDn(docs(1000000L)))
    println(f"distinct_n 1x=100k docs: $dn1%.2f s  10x=1M: $dn10%.2f s (${dn10 / dn1}%.1fx)")

    println(s"driver heap ${h0} -> ${heapMb()} MB")
    spark.stop()
  }
}
