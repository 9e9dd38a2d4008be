// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR12"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventAnalytics, Multimodal, Stats}

/** 10x probes for the round-12 additions:
  *
  *   - Apriori frequent-item prune on WIDE heavy-tailed baskets (the
  *     case the r11 verdict flagged): 90% of each 50-item basket is
  *     basket-unique junk that can never reach minSupport; the prune
  *     must keep pair volume bounded by the hot-item set, so 10x
  *     baskets must scale ~linearly, nowhere near the width^2 blowup.
  *   - Real image pixel decode + dHash at 1x/10x: scan-speed (linear).
  *   - Image near-dup banded-Hamming pairs at 1x/10x.
  *   - theilSen with the distributed median at 10x PAIR count: the
  *     pair join is intrinsically O(n^2/2); the probe checks the wall
  *     tracks pair count (no single-task median tail on top).
  */
object Probe10xR12 {
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
      .appName("probe10x-r12").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[probe] heap start: ${heapMb()} MB")

    // ---- wide-basket Apriori: 50-wide baskets, 45 junk + 5 hot items ----
    def baskets(n: Long, path: String): String = {
      spark.range(n).select(col("id").as("basket"),
          explode(sequence(lit(0), lit(49))).as("slot"))
        .select(col("basket"),
          when(col("slot") < 45,
            concat(lit("junk_"), col("basket"), lit("_"), col("slot")))
            .otherwise(concat(lit("hot_"),
              pmod(col("basket") * 7 + col("slot"), lit(40))))
            .as("item"))
        .write.mode("overwrite").parquet(path)
      path
    }
    val b1 = baskets(20000L, "/tmp/probe10x_r12/baskets1")
    val b10 = baskets(200000L, "/tmp/probe10x_r12/baskets10")
    Seq(("1x", b1), ("10x", b10)).foreach { case (tag, p) =>
      val df = spark.read.parquet(p)
      val (t, n) = timeMedian3(
        EventAnalytics.coOccurrence(df, "basket", "item", 100).count())
      println(f"[probe] coOccurrence wide $tag: $t%.2f s, $n pairs")
      val (t3, n3) = timeMedian3(
        EventAnalytics.frequentTriples(df, "basket", "item", 100).count())
      println(f"[probe] frequentTriples wide $tag: $t3%.2f s, $n3 triples")
    }

    // ---- real pixel decode + dHash, planted twins ----
    def images(n: Long, path: String): String = {
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val ids = spark.range(n).select(col("id").as("doc_id"))
      ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(100000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
        .write.mode("overwrite").parquet(path)
      path
    }
    val i1 = images(5000L, "/tmp/probe10x_r12/img1")
    val i10 = images(50000L, "/tmp/probe10x_r12/img10")
    Seq(("1x", i1), ("10x", i10)).foreach { case (tag, p) =>
      val df = spark.read.parquet(p)
      val (td, nd) = timeMedian3(Multimodal.decodeImage(df).count())
      println(f"[probe] decodeImage $tag: $td%.2f s, $nd rows")
      val (tp, np) = timeMedian3(
        Dedup.hammingPairs(Multimodal.imagePHash(df)).count())
      println(f"[probe] image hammingPairs $tag: $tp%.2f s, $np pairs")
    }

    // ---- theilSen distributed median: 10x pair count ----
    Seq(("1x", 2000L), ("10x_pairs", 6325L)).foreach { case (tag, n) =>
      val series = spark.range(n).select(col("id").as("t"),
        (col("id") * 2 + pmod(col("id") * 37, lit(11))).cast("double").as("v"))
      val (t, _) = timeMedian3 {
        Stats.theilSen(series, "t", "v", maxN = 10000).count()
      }
      println(f"[probe] theilSen $tag (n=$n): $t%.2f s")
    }

    println(s"[probe] heap end: ${heapMb()} MB")
    spark.stop()
  }
}
