// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain Probe10xR14"`, then remove.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Stats}

/** 10x probes for the round-14 fixes:
  *
  *   - Degree-ordered triangle counting on a PLANTED LOW-ID STAR: hub
  *     id 0 with k leaves (plus a small triangle clique so the answer
  *     is non-trivial). Under the old id-ordered orientation the hub
  *     (lowest id) anchored k² wedges — 10¹² at a 10⁶-degree hub — so
  *     the star size explodes the wedge join; under (degree, id)
  *     ordering every star edge points AT the hub and the wedge count
  *     is 0. The probe runs k = 100k and k = 1M: wall must stay ~flat
  *     (scan-dominated), and the triangle answer must stay exactly the
  *     planted clique's.
  *   - One-md5-per-row Poisson bootstrap at 1x/10x rows: wall must
  *     track rows linearly and land well under the per-(row, replicate)
  *     md5 scheme's cost (r13 quiet bench: 6.25 s at sf0.1).
  */
object Probe10xR14 {
  private def timeMedian3(f: => Long): (Double, Long) = {
    val xs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    (xs.map(_._1).sorted.apply(1), xs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe10x-r14").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // hub = id 0 (the adversarial LOW id), leaves 10..k+9, plus a
    // planted 5-clique on ids 1..5 → C(5,3) = 10 triangles, each of
    // the 5 clique nodes in C(4,2) = 6
    def starGraph(k: Long): DataFrame = {
      val star = spark.range(k).select(lit(0L).as("src"), ($"id" + 10L).as("dst"))
      val clique = (for {
        a <- 1 to 5; b <- (a + 1) to 5
      } yield (a.toLong, b.toLong)).toDF("src", "dst")
      star.unionByName(clique)
    }
    def driveTri(k: Long): Long =
      Graph.triangleCounts(starGraph(k)).agg(sum("n_triangles")).head().getLong(0)
    val (t1, c1) = timeMedian3(driveTri(100000L))
    val (t10, c10) = timeMedian3(driveTri(1000000L))
    println(f"triangles low-id star 1x=100k-leaf: $t1%.2f s (sum=$c1) " +
      f"10x=1M-leaf: $t10%.2f s (sum=$c10) ratio=${t10 / t1}%.2f")
    require(c1 == 30L && c10 == 30L, s"clique answer drifted: $c1 / $c10")

    def bootRows(n: Long): DataFrame =
      spark.range(n).select($"id", (($"id" % 997).cast("double") / 10.0).as("v"))
    def driveBoot(n: Long): Long =
      Stats.bootstrapMeanCI(bootRows(n), "id", "v", nReplicates = 200)
        .head().getAs[Long]("n_replicates")
    val (b1, r1) = timeMedian3(driveBoot(100000L))
    val (b10, r10) = timeMedian3(driveBoot(1000000L))
    println(f"bootstrap 200-rep 1x=100k: $b1%.2f s (R=$r1) 10x=1M: $b10%.2f s " +
      f"(R=$r10) ratio=${b10 / b1}%.2f")

    // packWindows: distributed prefix sum — wall must track rows
    // linearly (one range exchange + driver offsets + narrow fold),
    // and the last doc's placement must equal the closed-form total
    def drivePack(n: Long): Long = {
      val docs = spark.range(n).select($"id", ($"id" % 997 + 1).as("nt"))
      val out = graft.operators.Sampling.packWindows(docs, "id", "nt", 2048L)
      val last = out.agg(max($"bin_last")).head().getLong(0)
      graft.operators.Sampling.release(out)
      last
    }
    val (p1, l1) = timeMedian3(drivePack(1000000L))
    val (p10, l10) = timeMedian3(drivePack(10000000L))
    println(f"packWindows 1x=1M: $p1%.2f s (lastBin=$l1) 10x=10M: $p10%.2f s " +
      f"(lastBin=$l10) ratio=${p10 / p1}%.2f")
    spark.stop()
  }
}
