// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR13f"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Eval, Graph, Similarity, Stats, TextAnalysis}

/** 10x probes for the r13 seventh-wave operators (this session):
  *   - kneserNeyBigram: one corpus fold to the bigram-type table, three
  *     derived folds FROM it — wall must track the corpus scan.
  *   - luhnScreen: regexp extraction + row-local fold — linear.
  *   - botScore: lag window + fold sharing one user exchange — linear.
  *   - logRank: per-user fold + bounded lifetime windows — linear.
  *   - hodgesLehmannShift: bounded cell pairing — flat beyond the scan.
  *   - hits (4 iters): per-iteration join+agg, checkpoint-truncated.
  *   - tripletMining: broadcast anchors x one corpus pass — linear.
  *   - canonicalUrl dedup: narrow regex chain + one groupBy — linear.
  * Every drive forces a checksum over the REAL output columns (the r12
  * lesson: bare count() lets Catalyst elide unverified work).
  */
object Probe10xR13f {
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
      .appName("probe10x-r13f").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val h0 = heapMb()

    // ---- kneserNeyBigram: ~40-token docs, zipf-ish vocab ----
    def docs(n: Long): DataFrame = spark.range(n).select($"id".as("doc_id"),
      concat_ws(" ", (0 until 40).map(j =>
        concat(lit("w"), pmod(hash($"id" * 41 + j), lit(500)))): _*).as("text"))
    def driveKn(df: DataFrame): Long = sumHash(TextAnalysis.kneserNeyBigram(df))
    val (kn1, _) = timeMedian3(driveKn(docs(100000L)))
    val (kn10, _) = timeMedian3(driveKn(docs(1000000L)))
    println(f"kneser_ney 1x=100k docs: $kn1%.2f s  10x=1M: $kn10%.2f s (${kn10 / kn1}%.1fx)")

    // ---- luhnScreen: 1-in-16 docs carry a card-length digit run ----
    def cardDocs(n: Long): DataFrame = spark.range(n).select($"id".as("doc_id"),
      concat(lit("lorem ipsum body text "),
        when(pmod($"id", lit(16)) === 0,
          concat(lit("4111"), lpad(pmod(hash($"id"), lit(1000000000)).cast("string"), 12, "1")))
          .otherwise(lit("no digits here"))).as("text"))
    def driveLuhn(df: DataFrame): Long = sumHash(TextAnalysis.luhnScreen(df))
    val (lu1, _) = timeMedian3(driveLuhn(cardDocs(1000000L)))
    val (lu10, _) = timeMedian3(driveLuhn(cardDocs(10000000L)))
    println(f"luhn_screen 1x=1M docs: $lu1%.2f s  10x=10M: $lu10%.2f s (${lu10 / lu1}%.1fx)")

    // ---- botScore / logRank over synthetic events ----
    def events(n: Long): DataFrame = spark.range(n).select(
      $"id".as("event_id"), ($"id" % (n / 50)).as("user_id"),
      (($"id" % (n / 50)) * 86400L + ($"id" / (n / 50)) * 3600L +
        pmod(hash($"id"), lit(1800))).cast("timestamp").as("ts"),
      when(pmod(hash($"id"), lit(11)) === 0, "purchase")
        .otherwise(concat(lit("t"), pmod(hash($"id"), lit(5)))).as("event_type"))
    def driveBot(df: DataFrame): Long = sumHash(EventAnalytics.botScore(df))
    val (bo1, _) = timeMedian3(driveBot(events(1000000L)))
    val (bo10, _) = timeMedian3(driveBot(events(10000000L)))
    println(f"bot_score 1x=1M ev: $bo1%.2f s  10x=10M: $bo10%.2f s (${bo10 / bo1}%.1fx)")

    def driveLr(df: DataFrame): Long = sumHash(EventAnalytics.logRank(df))
    val (lr1, _) = timeMedian3(driveLr(events(1000000L)))
    val (lr10, _) = timeMedian3(driveLr(events(10000000L)))
    println(f"logrank 1x=1M ev: $lr1%.2f s  10x=10M: $lr10%.2f s (${lr10 / lr1}%.1fx)")

    // ---- hodgesLehmannShift: 200 distinct cells per cohort ----
    def cohorts(n: Long): DataFrame = spark.range(n).select(
      when($"id" % 2 === 0, "a").otherwise("b").as("g"),
      (pmod(hash($"id"), lit(200)) + lit(1000)).cast("double").as("v"))
    def driveHl(df: DataFrame): Long =
      Stats.hodgesLehmannShift(df, "g", "v", "a", "b").count()
    val (hl1, _) = timeMedian3(driveHl(cohorts(1000000L)))
    val (hl10, _) = timeMedian3(driveHl(cohorts(10000000L)))
    println(f"hodges_lehmann 1x=1M: $hl1%.2f s  10x=10M: $hl10%.2f s (${hl10 / hl1}%.1fx)")

    // ---- hits, 4 iterations ----
    def edges(n: Long): DataFrame = spark.range(n).select(
      pmod(hash($"id"), lit(n / 100)).as("src"),
      pmod(hash($"id" + 7), lit(n / 100)).as("dst"))
    def driveHits(df: DataFrame): Long = sumHash(Graph.hits(df, iters = 4))
    val (ht1, _) = timeMedian3(driveHits(edges(200000L)))
    val (ht10, _) = timeMedian3(driveHits(edges(2000000L)))
    println(f"hits4 1x=200k edges: $ht1%.2f s  10x=2M: $ht10%.2f s (${ht10 / ht1}%.1fx)")

    // ---- tripletMining: 20 anchors against a growing corpus ----
    def vecs(n: Long): DataFrame = spark.range(n).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => sin(($"id" * 16 + i).cast("double")).cast("float")).as("embedding"),
      pmod($"id", lit(10)).cast("int").as("label"))
    def driveTm(df: DataFrame): Long =
      sumHash(Similarity.tripletMining(df, col("vec_id") < 20))
    val (tm1, _) = timeMedian3(driveTm(vecs(100000L)))
    val (tm10, _) = timeMedian3(driveTm(vecs(1000000L)))
    println(f"triplet_mining 1x=100k vecs: $tm1%.2f s  10x=1M: $tm10%.2f s (${tm10 / tm1}%.1fx)")

    // ---- canonicalUrl dedup ----
    def urls(n: Long): DataFrame = spark.range(n).select($"id".as("doc_id"),
      concat(lit("HTTPS://Shop"), pmod($"id", lit(50)),
        lit(".Example.COM/Item/"), pmod($"id", lit(n / 10)),
        when($"id" % 2 === 0, lit("?utm_source=x&ref=a"))
          .otherwise(lit("?ref=a&b=2")), lit("#f")).as("url"))
    def driveUrl(df: DataFrame): Long = sumHash(
      df.groupBy(TextAnalysis.canonicalUrl(col("url")).as("cu"))
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep")))
    val (ur1, _) = timeMedian3(driveUrl(urls(1000000L)))
    val (ur10, _) = timeMedian3(driveUrl(urls(10000000L)))
    println(f"url_dedup 1x=1M: $ur1%.2f s  10x=10M: $ur10%.2f s (${ur10 / ur1}%.1fx)")

    println(s"driver heap ${h0} -> ${heapMb()} MB")
    spark.stop()
  }
}
