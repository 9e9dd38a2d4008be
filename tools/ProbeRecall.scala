package graft

import graft.functions.{SimHash64, SortedJaccardSim, TokenArray, WordShingles}
import graft.operators.{Dedup, Similarity}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver: measures whether the sketch operators' outputs equal the
  * exact brute-force truth on the natural test corpora (deterministic, so
  * equality here implies equality in the driver's gate).
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("probe").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // exact shingle-Jaccard truth at 0.5 (all pairs)
      val sh = docs.select(col("doc_id").as("id"), WordShingles(col("text"), 3).as("sh"))
      val l = sh.select(col("id").as("id1"), col("sh").as("sh1"))
      val r = sh.select(col("id").as("id2"), col("sh").as("sh2"))
      val truth = l.crossJoin(r).filter(col("id1") < col("id2"))
        .withColumn("j", SortedJaccardSim(col("sh1"), col("sh2")))
        .filter(col("j") >= 0.5).select("id1", "id2", "j").cache()
      val lsh = Dedup.minHashLshPairs(docs, "text", "doc_id", 0.5)
        .withColumnRenamed("jaccard", "j").cache()
      val nT = truth.count(); val nL = lsh.count()
      val missed = truth.join(lsh.select("id1", "id2"), Seq("id1", "id2"), "left_anti")
      val nMiss = missed.count()
      println(s"[$sf] minhash: truth=$nT lsh=$nL missed=$nMiss")
      if (nMiss > 0) missed.orderBy("j").show(10, false)
      // jaccard distribution of truth pairs near the threshold
      println(s"[$sf] truth pairs with j<0.7: " + truth.filter(col("j") < 0.7).count())

      // simhash: brute force hamming<=3 vs blocked
      val sig = docs.select(col("doc_id").as("id"), SimHash64(TokenArray(col("text"))).as("sig"))
      val sl = sig.select(col("id").as("id1"), col("sig").as("s1"))
      val sr = sig.select(col("id").as("id2"), col("sig").as("s2"))
      val struth = sl.crossJoin(sr).filter(col("id1") < col("id2"))
        .withColumn("h", bit_count(col("s1").bitwiseXOR(col("s2"))))
        .filter(col("h") <= 3).select("id1", "id2")
      val sblk = Dedup.simHashPairs(docs, "text", "doc_id", 3).select("id1", "id2")
      val sMiss = struth.exceptAll(sblk).count()
      val sExtra = sblk.exceptAll(struth).count()
      println(s"[$sf] simhash: truth=${struth.count()} blocked=${sblk.count()} missed=$sMiss extra=$sExtra")

      // ann: multi-table lsh vs brute force, all queries, k=5
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val bf = Similarity.bruteForceTopK(emb, emb, 5).select("query_id", "rank", "neighbor_id").cache()
      val annLsh = Similarity.lshTopK(emb, 64, 5, 8, 16).select("query_id", "rank", "neighbor_id").cache()
      val aMiss = bf.exceptAll(annLsh).count()
      println(s"[$sf] ann: bf=${bf.count()} lsh=${annLsh.count()} missRows=$aMiss")
      truth.unpersist(); lsh.unpersist(); bf.unpersist(); annLsh.unpersist()
    }
    spark.stop()
  }
}
