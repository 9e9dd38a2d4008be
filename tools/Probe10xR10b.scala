// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR10b"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Graph, Profile, Similarity, Stats}
import graft.Tables

/** 10x probes for the round-10 third-batch operators: Welch t-test,
  * key-skew profile, seasonal baseline, percentile rank, silhouette,
  * and the two iterative graph operators (k-core, label propagation)
  * on a clique-chain graph scaled 10x in node count. File-backed
  * inputs, median-of-3 wall, driver heap before/after.
  */
object Probe10xR10b {
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
      .appName("probe10x-r10b").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    def mk(name: String, base: DataFrame, shift: (DataFrame, Int) => DataFrame): (String, String) = {
      val d1 = s"/tmp/probe10x_r10b/${name}1"; val d10 = s"/tmp/probe10x_r10b/${name}10"
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
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (em1, em10) = mk("emb", emb,
      (df, i) => df.withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
    // clique-chain graphs: n/10 cliques of 10 nodes, consecutive cliques
    // bridged — LPA communities = cliques; 9-core = every clique
    def graph(n: Long, path: String): Unit = {
      val ids = spark.range(n).select(col("id"))
      val intra = ids.as("x").join(ids.as("y"),
          (col("x.id") / 10).cast("long") === (col("y.id") / 10).cast("long") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("src"), col("y.id").as("dst"))
      val bridges = spark.range(n / 10 - 1)
        .select((col("id") * 10 + 9).as("src"), ((col("id") + 1) * 10).as("dst"))
      intra.unionByName(bridges).write.mode("overwrite").parquet(path)
    }
    graph(20000L, "/tmp/probe10x_r10b/g1")
    graph(200000L, "/tmp/probe10x_r10b/g10")

    def probe(name: String, p1: String, p10: String)(f: DataFrame => Long): Unit = {
      val h0 = heapMb()
      val (w1, n1) = timeMedian3(f(spark.read.parquet(p1)))
      val h1 = heapMb()
      val (w10, n10) = timeMedian3(f(spark.read.parquet(p10)))
      val h2 = heapMb()
      println(f"[$name] 1x: $w1%.2f s ($n1 rows, heap $h0 -> $h1 MB); " +
        f"10x: $w10%.2f s ($n10 rows, heap -> $h2 MB); ratio ${w10 / w1}%.2f")
    }

    probe("welch_t", ev1, ev10)(d =>
      Stats.welchT(d, "event_type", "value").count())
    probe("key_skew", ev1, ev10)(d =>
      Profile.keySkew(d, "user_id", 20).count())
    probe("seasonal", ev1, ev10)(d =>
      EventAnalytics.seasonalBaseline(d, "event_type", "ts", "event_id", "value").count())
    probe("pct_rank", doc1, doc10)(d =>
      Profile.percentileRank(d, "doc_id", "n_chars").count())
    probe("silhouette", em1, em10)(d =>
      Similarity.silhouette(d, "vec_id", "label", "embedding").count())
    probe("kcore9", "/tmp/probe10x_r10b/g1", "/tmp/probe10x_r10b/g10")(d =>
      Graph.kCore(d, 9).count())
    probe("lpa", "/tmp/probe10x_r10b/g1", "/tmp/probe10x_r10b/g10")(d =>
      Graph.labelPropagation(d, maxIter = 5).count())
    spark.stop()
  }
}
