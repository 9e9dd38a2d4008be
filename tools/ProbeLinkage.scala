// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain ProbeLinkage"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x probes for the r13 linkage/analytics wave. Every measurement is
  * checksum-forced (sum of a result column) so Catalyst cannot elide
  * the interesting work under a bare count().
  *
  *   - damerauJoin: planted-typo catalog vs clean catalog, blocked on a
  *     stable suffix. Block sizes are bounded by construction, so wall
  *     must track rows ~linearly.
  *   - invertedIndex: synthetic corpus with a power-law-ish vocabulary;
  *     stop-term maxDf gate on. Explode + distinct dominates: linear.
  *   - associationRules: bounded-width baskets over a bounded item
  *     vocabulary; pair volume per basket is constant, so linear in
  *     baskets.
  */
object ProbeLinkage {
  private def timeMedian3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe-linkage").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def names(n: Long): DataFrame =
      spark.range(n).select(col("id"),
        concat(lit("entity-name-"), col("id") % 997, lit("-"),
          format_string("%09d", col("id"))).as("nm"))
    def dirty(n: Long): DataFrame =
      names(n).select(col("id"),
        // swap two head chars on a third of the rows: a planted typo the
        // last-6 block survives
        when(col("id") % 3 === 0,
          concat(expr("substring(nm, 2, 1)"), expr("substring(nm, 1, 1)"),
            expr("substring(nm, 3)"))).otherwise(col("nm")).as("nm"))

    for (n <- Seq(200000L, 2000000L)) {
      val (sec, matches) = timeMedian3 {
        graft.operators.FuzzyJoin.damerauJoin(
            names(n), "id", "nm", dirty(n), "id", "nm",
            k => k.substr(length(k) - lit(5), lit(6)), maxEdits = 2)
          .agg(sum("dist").as("s"), count(lit(1)).as("n"))
          .select(col("n")).head().getLong(0)
      }
      println(f"[probe] damerauJoin n=$n%d matches=$matches%d wall=$sec%.2f s")
    }

    def corpus(n: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("w"), col("id") % 50),            // frequent terms
          concat(lit("w"), col("id") % 2000),          // mid terms
          concat(lit("w"), col("id") % 50000),         // rare terms
          lit("the common stop term")).as("text"))
    for (n <- Seq(100000L, 1000000L)) {
      val (sec, terms) = timeMedian3 {
        graft.operators.TextAnalysis.invertedIndex(corpus(n), "doc_id", "text",
            minDf = 2L, maxDf = n / 2, maxPostings = 10)
          .agg(count(lit(1)).as("n"), sum(length(col("postings"))).as("s"))
          .select(col("n")).head().getLong(0)
      }
      println(f"[probe] invertedIndex docs=$n%d terms=$terms%d wall=$sec%.2f s")
    }

    def baskets(n: Long): DataFrame =
      spark.range(n * 8).select((col("id") / 8).as("basket"),
        concat(lit("i"), (col("id") * 7919 + col("id") % 13) % 500).as("item"))
    for (n <- Seq(50000L, 500000L)) {
      val (sec, rules) = timeMedian3 {
        graft.operators.EventAnalytics.associationRules(
            baskets(n), "basket", "item", minSupport = 20L)
          .agg(count(lit(1)).as("n"), sum("lift").as("s"))
          .select(col("n")).head().getLong(0)
      }
      println(f"[probe] assocRules baskets=$n%d rules=$rules%d wall=$sec%.2f s")
    }
    spark.stop()
  }
}
