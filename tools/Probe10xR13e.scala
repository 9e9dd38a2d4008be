// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13e"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Privacy, Similarity, Stats, TextAnalysis}

/** 10x probes for the fifth/sixth r13 waves:
  *   - markovAttribution: windows + bounded matrix collect — wall must
  *     track the event scan; the 60 driver iterations are O(|types|²).
  *   - bradleyTerry: one fold to |items|² pairs, driver MM — flat
  *     beyond the scan.
  *   - detectSecrets: regexp + char-explode on the planted density —
  *     linear in candidates.
  *   - mahalanobisScore: gram pass is O(n·d²); scoring narrow — linear.
  *   - heapsCurve: two corpus aggs + bounded windows — linear.
  *   - dpQuantile: distinct-value agg + bounded window — linear.
  */
object Probe10xR13e {
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
      .appName("probe10x-r13e").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def events(n: Long): DataFrame = spark.range(n).select(
      $"id".as("event_id"), ($"id" % (n / 20)).as("user_id"),
      ($"id" * 1000000L).cast("timestamp").as("ts"),
      when(pmod(hash($"id"), lit(11)) === 0, "purchase")
        .otherwise(concat(lit("t"), pmod(hash($"id"), lit(5)))).as("event_type"))

    val h0 = heapMb()
    def driveMk(df: DataFrame): Long =
      EventAnalytics.markovAttribution(df, "purchase").count()
    val (m1, _) = timeMedian3(driveMk(events(1000000L)))
    val (m10, _) = timeMedian3(driveMk(events(10000000L)))
    println(f"markov_attr 1x=1M: $m1%.2f s  10x=10M: $m10%.2f s " +
      f"(${m10 / m1}%.1fx)  heap ${h0}->${heapMb()} MB")

    def driveBt(df: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val prefs = df.withColumn("_w", lead(col("event_type"), 1).over(w))
        .filter(col("_w").isNotNull && col("_w") =!= col("event_type"))
      Stats.bradleyTerry(prefs, "_w", "event_type").count()
    }
    val (b1, _) = timeMedian3(driveBt(events(1000000L)))
    val (b10, _) = timeMedian3(driveBt(events(10000000L)))
    println(f"bradley_terry 1x=1M: $b1%.2f s  10x=10M: $b10%.2f s " +
      f"(${b10 / b1}%.1fx)  heap ${heapMb()} MB")

    def docs(n: Long): DataFrame = spark.range(n).select($"id".as("doc_id"),
      concat(lit("plain words here against "),
        when($"id" % 7 === 0, concat(lit("sk-"), md5($"id".cast("string"))))
          .otherwise(lit("nothing"))).as("text"))
    def driveSec(df: DataFrame): Long = TextAnalysis.detectSecrets(df).count()
    val (s1, _) = timeMedian3(driveSec(docs(1000000L)))
    val (s10, _) = timeMedian3(driveSec(docs(10000000L)))
    println(f"detect_secrets 1x=1M: $s1%.2f s  10x=10M: $s10%.2f s " +
      f"(${s10 / s1}%.1fx)  heap ${heapMb()} MB")

    def vecs(n: Long): DataFrame = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => sin(($"id" + i).cast("double"))).as("embedding"))
    def driveMa(df: DataFrame): Long =
      Similarity.mahalanobisScore(df).agg(sum("mdist2")).head().getDouble(0).toLong
    val (a1, _) = timeMedian3(driveMa(vecs(200000L)))
    val (a10, _) = timeMedian3(driveMa(vecs(2000000L)))
    println(f"mahalanobis-16d 1x=200k: $a1%.2f s  10x=2M: $a10%.2f s " +
      f"(${a10 / a1}%.1fx)  heap ${heapMb()} MB")

    def driveHp(df: DataFrame): Long =
      TextAnalysis.heapsCurve(df.select($"doc_id", $"text")).count()
    val (p1, _) = timeMedian3(driveHp(docs(1000000L)))
    val (p10, _) = timeMedian3(driveHp(docs(10000000L)))
    println(f"heaps_curve 1x=1M: $p1%.2f s  10x=10M: $p10%.2f s " +
      f"(${p10 / p1}%.1fx)  heap ${heapMb()} MB")

    def rows(n: Long): DataFrame = spark.range(n).select(
      (pmod(hash($"id"), lit(50000)).cast("double") / 100.0).as("v"))
    def driveDq(df: DataFrame): Long =
      Privacy.dpQuantile(df, col("v"), 0.9, 1.0).head().getLong(1)
    val (q1, _) = timeMedian3(driveDq(rows(2000000L)))
    val (q10, _) = timeMedian3(driveDq(rows(20000000L)))
    println(f"dp_quantile 1x=2M: $q1%.2f s  10x=20M: $q10%.2f s " +
      f"(${q10 / q1}%.1fx)  heap ${heapMb()} MB")
    spark.stop()
  }
}
