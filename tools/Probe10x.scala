// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10x"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DriftCompare
import graft.sources.MemorySide

/** 10x probes for the diff core (dataDrift/HashRunScan — the flagship
  * q_diff_rows plan) and grouped approx quantiles over monster skewed
  * groups. Both probes are file-backed (written to /tmp parquet first)
  * so scan cost is real, and report median-of-3 wall plus driver heap
  * before/after to show no driver-side growth.
  */
object Probe10x {
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
      .appName("probe10x").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")

    // file-backed 1x and 10x copies; 10x shifts l_orderkey per replica so
    // per-copy drift patterns (%97 / %89) replicate and drift rows scale 10x
    val d1 = "/tmp/probe10x/li1"; val d10 = "/tmp/probe10x/li10"
    base.write.mode("overwrite").parquet(d1)
    (0 until 10).map(i => base.withColumn("l_orderkey",
        col("l_orderkey") + lit(i * 100000000L)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(d10)

    def diffCount(path: String): Long = {
      val li = spark.read.parquet(path)
      val c = new DriftCompare(spark,
        MemorySide("db1", Map("lineitem" -> li.filter("l_orderkey % 97 != 0"))),
        MemorySide("db2", Map("lineitem" -> li.filter("l_orderkey % 89 != 0"))))
      c.dataDrift("lineitem").get.count()
    }
    val h0 = heapMb()
    val (w1, n1) = timeMedian3(diffCount(d1))
    val h1 = heapMb()
    val (w10, n10) = timeMedian3(diffCount(d10))
    val h2 = heapMb()
    println(f"[diff-core] 1x: $w1%.2f s ($n1 drift rows, heap $h0 -> $h1 MB)")
    println(f"[diff-core] 10x: $w10%.2f s ($n10 drift rows, heap -> $h2 MB)")
    println(f"[diff-core] wall ratio ${w10 / w1}%.2f for 10x rows")

    // grouped approx quantiles: 3 monster groups (l_returnflag) of ~2M
    // rows each at 10x; assert the n/accuracy rank-error bound still
    // holds and report wall for the approx pass alone
    def quantiles(path: String): (Double, Boolean) = {
      val li = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val approx = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val w = (System.nanoTime() - t0) / 1e9
      val exact = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5D)").as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      (w, exact.forall { case (k, v) => math.abs(approx(k) - v) <= 1.0 })
    }
    val (qw1, ok1) = quantiles(d1)
    val (qw10, ok10) = quantiles(d10)
    println(f"[quantiles] 1x: $qw1%.2f s bound-ok=$ok1; 10x: $qw10%.2f s bound-ok=$ok10, ratio ${qw10 / qw1}%.2f")
    spark.stop()
  }
}
