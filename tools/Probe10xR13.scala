// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Multimodal, TextAnalysis, VideoHeader}

/** 10x probes for the round-13 additions:
  *
  *   - Video container metadata parse (MP4 box walk + AVI RIFF) at
  *     1x/10x docs: a narrow mapPartitions byte walk must scan-scale
  *     linearly with flat driver heap.
  *   - HTML extraction + URL canonicalization at 1x/10x: one codegen'd
  *     Project (plan-audited); the probe checks wall tracks rows.
  *   - Incremental curation screen (dedupAgainstIndex path) with a 10x
  *     batch against a fixed index: cost must track |batch|, not
  *     |index| x |batch|.
  */
object Probe10xR13 {
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
      .appName("probe10x-r13").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def videoCorpus(n: Long): DataFrame = {
      val mk = udf((d: Long) =>
        if (d % 3 == 0) VideoHeader.syntheticMp4(
          (16 * (d % 60 + 4)).toInt, (16 * (d % 40 + 3)).toInt,
          d % 9000 + 1000, ((d / 3) % 3 + 1).toInt)
        else if (d % 3 == 1) VideoHeader.syntheticAvi(
          (d % 320 + 16).toInt, (d % 240 + 12).toInt, 40000L,
          d % 500 + 50, ((d / 3) % 2 + 1).toInt)
        else ("junk payload " + d).getBytes("UTF-8"))
      spark.range(n).select($"id".as("doc_id"), mk($"id").as("payload"))
    }
    // checksum-forced (bare count() lets Catalyst skip the parse)
    def driveVideo(df: DataFrame): Long =
      Multimodal.decodeVideoMeta(df)
        .agg(sum(coalesce($"width", lit(0)) + coalesce($"duration_ms", lit(0L))))
        .head().getLong(0)
    val (v1, s1) = timeMedian3(driveVideo(videoCorpus(100000L)))
    val (v10, s10) = timeMedian3(driveVideo(videoCorpus(1000000L)))
    println(f"video_meta 1x=100k: $v1%.2f s (sum=$s1) 10x=1M: $v10%.2f s " +
      f"(sum=$s10) ratio=${v10 / v1}%.1f heap=${heapMb()} MB")

    def htmlCorpus(n: Long): DataFrame =
      spark.range(n).select($"id".as("doc_id"),
        concat(lit("<html><head><title>T"), $"id",
          lit("</title><script>var x = 1 < 2;</script></head><body><p>body "),
          $"id", lit(" &amp; tail</p><a href=\"/x\">l</a></body></html>"))
          .as("text"))
    def driveHtml(df: DataFrame): Long =
      df.select(TextAnalysis.extractHtmlText($"text").as("t"),
          TextAnalysis.htmlLinkCount($"text").as("l"))
        .agg(sum(length($"t") + $"l")).head().getLong(0)
    val (h1, hs1) = timeMedian3(driveHtml(htmlCorpus(200000L)))
    val (h10, hs10) = timeMedian3(driveHtml(htmlCorpus(2000000L)))
    println(f"html_extract 1x=200k: $h1%.2f s (sum=$hs1) 10x=2M: $h10%.2f s " +
      f"(sum=$hs10) ratio=${h10 / h1}%.1f heap=${heapMb()} MB")

    // incremental screen: fixed 50k-doc index, batches at 1x/10x
    val idxDir = java.nio.file.Files.createTempDirectory("probe_idx").toString + "/idx"
    def corpus(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select($"id".as("doc_id"),
        concat(lit("alpha beta gamma delta epsilon zeta eta theta doc "),
          $"id", lit(" iota kappa lambda mu nu xi omicron pi rho sigma")).as("text"),
        lit("web").as("source"))
    val p = Curation.Params()
    val r0 = Curation.incremental(corpus(0, 50000), idxDir, p)
    r0.novel.unpersist()
    val t1 = { val t0 = System.nanoTime()
      val r = Curation.incremental(corpus(50000, 60000), idxDir, p)
      val n = r.novel.count(); r.novel.unpersist()
      ((System.nanoTime() - t0) / 1e9, n) }
    val t10 = { val t0 = System.nanoTime()
      val r = Curation.incremental(corpus(60000, 160000), idxDir, p)
      val n = r.novel.count(); r.novel.unpersist()
      ((System.nanoTime() - t0) / 1e9, n) }
    println(f"incremental_screen 1x=10k batch: ${t1._1}%.2f s (novel=${t1._2}) " +
      f"10x=100k batch: ${t10._1}%.2f s (novel=${t10._2}) " +
      f"ratio=${t10._1 / t1._1}%.1f heap=${heapMb()} MB")

    spark.stop()
  }
}
