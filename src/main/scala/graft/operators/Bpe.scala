package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and segmentation (Sennrich et
  * al., ACL 2016) — the tokenizer-construction step of a training-data
  * pipeline.
  *
  * Scale split, deliberately: the DISTRIBUTED part is the word-frequency
  * aggregation (one explode + one map-side-combined hash aggregation over
  * the full corpus — the only pass whose cost grows with data size). The
  * merge loop then runs on the collected word-frequency table, which is
  * explicitly BOUNDED by a frequency floor and a top-N vocabulary cap
  * applied inside the distributed aggregation (web-scale text grows its
  * distinct-token count with corpus size through junk strings, so "the
  * vocabulary is small" is not a safe assumption — the cap makes it one).
  * The 100 TB work stays in the cluster, the bounded model fits on the
  * driver — the same design point as `ivfFit`'s sampled k-means, and how
  * sentencepiece/HF trainers consume a pre-counted, trimmed vocabulary.
  * Encoding distributes again: merges broadcast to executors,
  * `mapPartitions` applies them per token — linear, no shuffle.
  *
  * Determinism: merge selection breaks ties by (count desc, pair
  * lexicographic), so the merge table is a pure function of the corpus;
  * encoding is a pure function of (merges, text). Spec-verified against
  * hand-computed merges; no SQL oracle (the loop is iterative, outside
  * SQL's reach — same verification class as the streaming twins).
  */
object Bpe {

  /** One learned merge: rank is application priority (0 first). */
  final case class Merge(rank: Int, left: String, right: String)

  /** Learn `nMerges` merges from the corpus' word-frequency table.
    * Words are lowercased [a-z0-9]+ tokens split into single characters
    * (no end-of-word marker — segment counts compose across words).
    *
    * The collected table is BOUNDED before it reaches the driver:
    * `minCount` floors the frequency (web-scale corpora have a heavy tail
    * of junk tokens — hex hashes, base64 runs — whose distinct count
    * grows with corpus size even though each appears a handful of times)
    * and `maxVocab` keeps only the top-N most frequent words (count desc,
    * word asc — a deterministic `TakeOrderedAndProject`, no full sort).
    * Both cuts happen in the distributed aggregation, so the driver sees
    * at most `maxVocab` rows regardless of corpus size. Merges learned
    * from the capped table are identical to the uncapped ones whenever
    * the floor is below the true minimum frequency / the cap exceeds the
    * true vocabulary — the same trim sentencepiece and HF trainers apply.
    */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 1L, maxVocab: Int = 1 << 20): Seq[Merge] = {
    require(nMerges > 0, "nMerges must be positive")
    require(minCount >= 1, "minCount must be >= 1")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // the only corpus-scale pass: token counts, map-side combined, then
    // floored and top-N-capped BEFORE the collect
    val wordCounts: Array[(String, Long)] =
      df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
        .filter(col("n") >= minCount)
        .orderBy(col("n").desc, col("w").asc)
        .limit(maxVocab)
        .as[(String, Long)].collect()
    var words: Array[(Vector[String], Long)] =
      wordCounts.map { case (w, n) => (w.map(_.toString).toVector, n) }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    while (rank < nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) return merges.result()
      // deterministic: count desc, then pair lexicographic asc
      val ((l, r), _) = pairCounts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      merges += Merge(rank, l, r)
      val joined = l + r
      words = words.map { case (syms, n) =>
        if (syms.length < 2) (syms, n)
        else {
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += joined; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), n)
        }
      }
      rank += 1
    }
    merges.result()
  }

  /** Persist a learned merge table to parquet (rank, left, right) —
    * train the tokenizer once, [[loadMerges]] it in any later encode
    * job; vocabulary-sized, so the table is metadata-cheap.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    ModelStore.save(merges.toDF("rank", "left", "right"), path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Merge] = {
    ModelStore.loadRows(spark, path, "rank", "left", "right")
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
  }

  /** Greedy BPE segmentation of every token: repeatedly merge the
    * lowest-rank adjacent pair until none applies (the standard encode
    * loop). Returns (id, n_tokens, n_pieces) — the corpus' tokenizer
    * cost under the learned vocabulary. The merge table is captured in
    * the task closure as a plain Map — it is vocabulary-sized (bounded by
    * `train`'s cap), and a closure-captured value leaves nothing to leak,
    * unlike a broadcast variable that a lazily-returned DataFrame could
    * never safely destroy (repeated encode calls in a long session were
    * accumulating broadcast blocks).
    */
  def encode(df: DataFrame, textCol: String, idCol: String,
             merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankOf: Map[(String, String), Int] =
      merges.map(m => (m.left, m.right) -> m.rank).toMap
    val toks: Dataset[(Long, Seq[String])] = df
      .select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
    toks.mapPartitions { it =>
      val ranks = rankOf
      def pieces(word: String): Int = {
        var syms = word.map(_.toString).toVector
        var done = false
        while (!done && syms.length > 1) {
          var bestRank = Int.MaxValue
          var bestIdx = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; bestIdx = i }
            i += 1
          }
          if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
          else syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
            syms.drop(bestIdx + 2)
        }
        syms.length
      }
      it.map { case (id, words) =>
        (id, words.size.toLong, words.map(w => pieces(w).toLong).sum)
      }
    }.toDF(idCol, "n_tokens", "n_pieces")
  }
}
