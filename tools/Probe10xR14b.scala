// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR14b"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** 10x probes for the round-14 iteration-cadence restructures
  * (checkpoint-every-2-rounds with lazy persist bridges) across
  * pageRank / personalizedPageRank / hits / labelPropagation: wall
  * must track edges ~linearly and the driver heap must stay flat
  * (a leaked bridge cache or un-dropped checkpoint would grow it).
  * Graph = clique-chain (n/10 cliques of 10, bridged), the R10b probe
  * construction.
  */
object Probe10xR14b {
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
      .appName("probe10x-r14b").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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
    graph(20000L, "/tmp/probe10x_r14b/g1")
    graph(200000L, "/tmp/probe10x_r14b/g10")

    def probe(name: String)(f: DataFrame => Long): Unit = {
      val h0 = heapMb()
      val (w1, n1) = timeMedian3(f(spark.read.parquet("/tmp/probe10x_r14b/g1")))
      val h1 = heapMb()
      val (w10, n10) = timeMedian3(f(spark.read.parquet("/tmp/probe10x_r14b/g10")))
      val h2 = heapMb()
      println(f"[$name] 1x: $w1%.2f s ($n1, heap $h0 -> $h1 MB); " +
        f"10x: $w10%.2f s ($n10, heap -> $h2 MB); ratio ${w10 / w1}%.2f")
    }

    probe("pagerank8") { d =>
      val r = Graph.pageRank(d, 0.85, 8); val n = r.count()
      graft.operators.Sampling.release(r); n
    }
    probe("ppr4") { d =>
      val r = Graph.personalizedPageRank(d, Seq(0L, 10L, 20L), iters = 4)
      val n = r.count(); graft.operators.Sampling.release(r); n
    }
    probe("hits4") { d =>
      val r = Graph.hits(d, iters = 4); val n = r.count()
      graft.operators.Sampling.release(r); n
    }
    probe("lpa5") { d =>
      val r = Graph.labelPropagation(d, maxIter = 5); val n = r.count()
      graft.operators.Sampling.release(r); n
    }
    spark.stop()
  }
}
