// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR10"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventAnalytics, IncrementalAgg, Sampling, Stats, TextAnalysis}
import graft.Tables

/** 10x probes for the round-10 operator additions: survivorship dedup,
  * per-domain token budget, cumulative distinct users, incremental
  * aggregate maintenance, BM25 retrieval, EWMA smoothing, and the
  * correlation matrix. All inputs are file-backed (written to /tmp
  * parquet first) so scan cost is real; ids/users are shifted per
  * replica so per-key structure stays realistic; median-of-3 wall plus
  * driver heap before/after.
  */
object Probe10xR10 {
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
      .appName("probe10x-r10").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def mk(name: String, base: DataFrame, shift: (DataFrame, Int) => DataFrame): (String, String) = {
      val d1 = s"/tmp/probe10x_r10/${name}1"; val d10 = s"/tmp/probe10x_r10/${name}10"
      base.write.mode("overwrite").parquet(d1)
      (0 until 10).map(i => shift(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(d10)
      (d1, d10)
    }

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (doc1, doc10) = mk("docs", docs,
      (df, i) => df.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
    val events = Tables.events(spark, sf)
    val (ev1, ev10) = mk("events", events, (df, i) =>
      df.withColumn("user_id", col("user_id") + lit(i * 10000000L))
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val (ord1, ord10) = mk("orders", orders, (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val (li1, li10) = mk("li", li,
      (df, i) => df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))

    def probe(name: String, p1: String, p10: String)(f: DataFrame => Long): Unit = {
      val h0 = heapMb()
      val (w1, n1) = timeMedian3(f(spark.read.parquet(p1)))
      val h1 = heapMb()
      val (w10, n10) = timeMedian3(f(spark.read.parquet(p10)))
      val h2 = heapMb()
      println(f"[$name] 1x: $w1%.2f s ($n1 rows, heap $h0 -> $h1 MB); " +
        f"10x: $w10%.2f s ($n10 rows, heap -> $h2 MB); ratio ${w10 / w1}%.2f")
    }

    probe("survivorship", doc1, doc10)(d =>
      Dedup.survivorshipDedup(d, "text", "doc_id", "n_chars", 0.5).count())
    probe("domain_budget", doc1, doc10)(d =>
      Sampling.domainBudgetSelect(d.select("source", "doc_id", "n_chars"),
        "source", "doc_id", "n_chars", "n_chars", 4000L).count())
    probe("bm25", doc1, doc10)(d =>
      TextAnalysis.bm25TopK(d, "text", "doc_id",
        Seq("hash", "join", "spark"), 15).count())
    probe("cum_users", ev1, ev10)(d =>
      EventAnalytics.cumulativeDistinctDaily(d, segmentCols = Seq("event_type")).count())
    probe("ewma", ev1, ev10)(d =>
      EventAnalytics.ewmaSmooth(d, "user_id", "ts", "event_id", "value").count())
    probe("incremental_agg", ord1, ord10) { o =>
      import IncrementalAgg.Spec
      val specs = Seq(Spec("count", "", "n_orders"),
        Spec("sum", "o_totalprice", "sum_price"),
        Spec("min", "o_orderdate", "first_order"),
        Spec("max", "o_orderdate", "last_order"))
      val cutoff = lit("1997-01-01").cast("timestamp")
      val snap = IncrementalAgg.aggregate(
        o.filter(col("o_orderdate") < cutoff), Seq("o_custkey"), specs)
      IncrementalAgg.merge(snap, o.filter(col("o_orderdate") >= cutoff),
        Seq("o_custkey"), specs).count()
    }
    probe("corr_matrix", li1, li10)(d =>
      Stats.corrMatrix(d,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")).count())
    spark.stop()
  }
}
