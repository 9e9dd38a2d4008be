// scratch driver for manual 10x scale probes (not part of the library):
// copy into src/main/scala/graft/, `sbt "runMain graft.Probe10xR15"`, then remove.
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** 10x probe for the round-15 semantic diff: the banded (LSH-bucketed)
  * embedding-space anti-join must scale ~linearly in candidate pairs and
  * wall clock — the all-pairs diff it replaces scales 100x in pairs at
  * 10x input.
  *
  * 10x construction: 10 replicas of the sf0.1 embeddings, replica r > 0
  * coordinate-ROTATED by 6·r positions (a permutation — norms preserved,
  * directions decorrelated to the natural ~0.6 cosine regime, so
  * replicas neither match each other nor inflate any single bucket the
  * way exact copies would). Each replica carries the same planted
  * structure as q_semantic_diff: twins (%3==0), negations (%3==1),
  * copies (%3==2).
  */
object Probe10xR15 {
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
      .appName("probe10xr15").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

    def replicate(times: Int): DataFrame =
      (0 until times).map { r =>
        val rot = (r * 6) % 64
        emb.select((col("vec_id") + lit(r * 10000000L)).as("vec_id"),
          (if (rot == 0) col("v")
           else transform(sequence(lit(0), lit(63)),
             i => element_at(col("v"), ((i + lit(rot)) % 64) + 1))).as("v"))
      }.reduce(_ unionByName _)

    def sides(base: DataFrame): (DataFrame, DataFrame) = {
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("vec_id").cast("double"))))
            .as("v"))
      val novel = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      (base, twins.unionByName(novel)
        .unionByName(base.filter(col("vec_id") % 3 === 2)))
    }

    def run(base: DataFrame): (Double, Long, Long) = {
      val (db1, db2) = sides(base)
      // candidate-pair meter: the cross-side bucket collisions the diff
      // actually verifies — the banded-vs-all-pairs scaling witness
      val u = db1.select(lit("db1").as("_side"), col("vec_id").as("id"), col("v"))
        .unionByName(db2.select(lit("db2").as("_side"), col("vec_id").as("id"), col("v")))
      val keyed = Similarity.lshKeyed(u, 64, 8, 16, 64, "id", "v", Seq("_side"),
        refineAll = true)
      val cand = keyed.as("a").join(keyed.as("b"), Seq("t", "bucket", "sub"))
        .filter(col("a._side") =!= col("b._side")).count()
      val (sec, rows) = timeMedian3(
        Similarity.semanticDiff(db1, db2, "vec_id", "v", 0.9, 64).count())
      (sec, rows, cand)
    }

    val h0 = heapMb()
    val (s1, n1, c1) = run(replicate(1))
    val (s10, n10, c10) = run(replicate(10))
    val h1 = heapMb()
    println(f"[probe] semanticDiff 1x:  ${s1}%.2f s, $n1 diff rows, $c1 candidate pairs")
    println(f"[probe] semanticDiff 10x: ${s10}%.2f s, $n10 diff rows, $c10 candidate pairs")
    println(f"[probe] scaling: wall x${s10 / s1}%.1f, candidates x${c10.toDouble / c1}%.1f " +
      f"(all-pairs would be x100), diff rows x${n10.toDouble / n1}%.1f")
    println(s"[probe] driver heap: $h0 MB -> $h1 MB")
    spark.stop()
  }
}
