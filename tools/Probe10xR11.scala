// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR11"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Privacy, Profile, Similarity, Stats}
import graft.Tables

/** 10x probes for the round-11 operator additions: KS / Mann-Whitney
  * (bounded distinct-value tables), Benford, Kaplan-Meier, winsorize,
  * k-anonymity, JL random projection, and the series operators
  * (acf / cusum / theil-sen) whose cost must stay FLAT because the
  * daily series they run on is bounded by the observation window, not
  * row count. File-backed inputs, id/user-shifted replicas,
  * median-of-3 wall, driver heap before/after.
  */
object Probe10xR11 {
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
      .appName("probe10x-r11").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def mk(name: String, base: DataFrame,
           shift: (DataFrame, Int) => DataFrame): (String, String) = {
      val d1 = s"/tmp/probe10x_r11/${name}1"
      val d10 = s"/tmp/probe10x_r11/${name}10"
      base.write.mode("overwrite").parquet(d1)
      (0 until 10).map(i => shift(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(d10)
      (d1, d10)
    }

    val events = Tables.events(spark, sf)
    val (ev1, ev10) = mk("events", events, (df, i) =>
      df.withColumn("user_id", col("user_id") + lit(i * 10000000L))
        .withColumn("event_id", col("event_id") + lit(i * 1000000000L)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val (doc1, doc10) = mk("docs", docs,
      (df, i) => df.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
    val (cu1, cu10) = mk("cust", cust, (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val (li1, li10) = mk("li", li,
      (df, i) => df.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (em1, em10) = mk("emb", emb,
      (df, i) => df.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))

    def probe(name: String, p1: String, p10: String)(f: DataFrame => Long): Unit = {
      val h0 = heapMb()
      val (w1, n1) = timeMedian3(f(spark.read.parquet(p1)))
      val h1 = heapMb()
      val (w10, n10) = timeMedian3(f(spark.read.parquet(p10)))
      val h2 = heapMb()
      println(f"[$name] 1x: $w1%.2f s ($n1 rows, heap $h0 -> $h1 MB); " +
        f"10x: $w10%.2f s ($n10 rows, heap -> $h2 MB); ratio ${w10 / w1}%.2f")
    }

    probe("ks_test", ev1, ev10)(d =>
      Stats.ksTest(d, "event_type", "value", "click", "purchase").count())
    probe("mann_whitney", ev1, ev10)(d =>
      Stats.mannWhitneyU(d, "event_type", "value", "click", "purchase").count())
    probe("benford", li1, li10)(d => Stats.benford(d, "l_extendedprice").count())
    probe("kaplan_meier", ev1, ev10)(d =>
      EventAnalytics.kaplanMeier(d, "user_id", "ts", censorDays = 5).count())
    probe("winsorize", doc1, doc10)(d =>
      Profile.winsorize(d, "doc_id", "n_chars", 100, 9900).count())
    probe("k_anonymity", cu1, cu10)(d =>
      Privacy.kAnonymity(d, Seq("c_mktsegment", "c_nationkey"), 10).count())
    probe("rand_project", em1, em10)(d =>
      Similarity.randomProject(d, "vec_id", "embedding", 8).count())
    def daily(d: DataFrame): DataFrame = d
      .filter(col("ts").isNotNull)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
      .agg(count(lit(1)).cast("double").as("v"))
    probe("acf", ev1, ev10)(d => Stats.acf(daily(d), "t", "v", 10).count())
    probe("cusum", ev1, ev10)(d => Stats.cusum(daily(d), "t", "v").count())
    probe("theil_sen", ev1, ev10)(d => Stats.theilSen(daily(d), "t", "v").count())
    probe("ks_by_segment", ev1, ev10)(d =>
      Stats.ksTestBy(d.withColumn("dow",
          datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
        "dow", "event_type", "value", "click", "purchase").count())
    probe("qq_table", ev1, ev10)(d =>
      Stats.qqTable(d, "event_type", "value", "click", "purchase").count())
    probe("mutual_info", ev1, ev10)(d =>
      Stats.mutualInfo(d.filter(col("ts").isNotNull).withColumn("dow",
          (datediff(to_date(col("ts")), lit("1970-01-01")) % 7).cast("string")),
        "event_type", "dow").count())
    probe("hilbert_key", li1, li10)(d =>
      graft.operators.Layout.withHilbertKey(
        d.select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", 10).count())
    probe("pseudonymize", cu1, cu10)(d =>
      Privacy.pseudonymize(d, Seq("c_name"), "probe-salt").count())
    spark.stop()
  }
}
