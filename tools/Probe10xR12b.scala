// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR12b"`, then remove.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Privacy, Stats, TextAnalysis}

/** 10x probes for the round-12 second wave: CDC overlap pairs,
  * lineDedup, goldenRecord, tCloseness, spearman — all expected
  * ~linear (chunk/line/cluster/cell tables bound every later stage).
  */
object Probe10xR12b {
  private def timeMedian3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe10x-r12b").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(n: Long, path: String): String = {
      spark.range(n).selectExpr("id AS doc_id",
        """concat('boiler plate header line', chr(10),
          | 'unique ', id, ' alpha beta gamma delta epsilon zeta eta theta',
          | chr(10), 'unique ', id, ' two kappa lambda mu nu xi omicron pi rho',
          | chr(10), 'boiler plate footer line') AS text""".stripMargin)
        .write.mode("overwrite").parquet(path)
      path
    }
    val d1 = docs(50000L, "/tmp/probe10x_r12b/d1")
    val d10 = docs(500000L, "/tmp/probe10x_r12b/d10")
    Seq(("1x", d1), ("10x", d10)).foreach { case (tag, p) =>
      val df = spark.read.parquet(p)
      df.agg(sum(length(col("text")))).head() // warm the page cache
      val (tc, nc) = timeMedian3(
        Dedup.cdcOverlapPairs(df, "text", "doc_id", 2).count())
      println(f"[probe] cdcOverlapPairs $tag: $tc%.2f s, $nc pairs")
      // force the rebuilt text: a bare count lets Catalyst ELIMINATE the
      // unique-key left join and measure only the scan
      val (tl, nl) = timeMedian3(
        TextAnalysis.lineDedup(df, "text", "doc_id", 2)
          .agg(sum(length(col("text_clean"))) + sum("n_removed")).head()
          .getLong(0))
      println(f"[probe] lineDedup $tag: $tl%.2f s (checksum $nl)")
    }

    def recs(n: Long, path: String): String = {
      spark.range(n).selectExpr("id % 50000 AS cluster", "id AS rid",
        "CAST(id % 97 AS DOUBLE) AS score",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE concat('f', id) END AS f1",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE concat('g', id) END AS f2")
        .write.mode("overwrite").parquet(path)
      path
    }
    val r1 = recs(500000L, "/tmp/probe10x_r12b/r1")
    val r10 = recs(5000000L, "/tmp/probe10x_r12b/r10")
    Seq(("1x", r1), ("10x", r10)).foreach { case (tag, p) =>
      val df = spark.read.parquet(p)
      df.agg(sum(length(col("f1")))).head() // warm the page cache
      val (tg, ng) = timeMedian3(
        Dedup.goldenRecord(df, "cluster", Seq("f1", "f2"), "score", "rid")
          .agg(sum(length(col("f1")))).head().getLong(0))
      println(f"[probe] goldenRecord $tag: $tg%.2f s (checksum $ng)")
    }

    def priv(n: Long, path: String): String = {
      spark.range(n).selectExpr("CAST(id % 500 AS STRING) AS q",
        "CAST(id % 13 AS STRING) AS s",
        "CAST(id % 1000 AS DOUBLE) AS v", "CAST(id % 777 AS DOUBLE) AS w")
        .write.mode("overwrite").parquet(path)
      path
    }
    val p1 = priv(1000000L, "/tmp/probe10x_r12b/p1")
    val p10 = priv(10000000L, "/tmp/probe10x_r12b/p10")
    Seq(("1x", p1), ("10x", p10)).foreach { case (tag, p) =>
      val df = spark.read.parquet(p)
      df.agg(sum(length(col("q")))).head() // warm the page cache
      val (tt, _) = timeMedian3(
        Privacy.tCloseness(df, Seq("q"), "s", 0.0001).count())
      println(f"[probe] tCloseness $tag: $tt%.2f s")
      val (ts, _) = timeMedian3(
        Stats.spearman(df, "v", "w").count())
      println(f"[probe] spearman $tag: $ts%.2f s")
    }
    spark.stop()
  }
}
