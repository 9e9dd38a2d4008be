package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(n: Int) = (1L to n.toLong).map(i => (i, i.toDouble))
    .toDF("doc_id", "w")

  test("weightedSample is deterministic, exact-k, and excludes nonpositive weights") {
    val df = docs(200).withColumn("w",
      when($"doc_id" <= 10, lit(0.0)).otherwise($"w"))
    val s1 = Sampling.weightedSample(df, "doc_id", col("w"), 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.weightedSample(df, "doc_id", col("w"), 50)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2) // content-addressed: stable across runs
    assert(s1.size == 50)
    assert(s1.forall(_ > 10)) // zero-weight rows never sampled
  }

  test("weightedSample takes everything when k >= eligible rows") {
    val out = Sampling.weightedSample(docs(5), "doc_id", col("w"), 100)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == (1L to 5L).toSeq)
  }

  test("weightedSample favors heavy rows (A-ES inclusion ~ weight)") {
    // one row with 10_000x the weight of the rest must be included
    val df = docs(500).withColumn("w",
      when($"doc_id" === 42, lit(1e6)).otherwise(lit(100.0)))
    val out = Sampling.weightedSample(df, "doc_id", col("w"), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(42L))
  }
}

class FilterTopQuantileSpec extends SparkSpecBase {
  import spark.implicits._

  test("threshold is min{v : F(v) >= q}") {
    val df = (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val kept = Sampling.filterTopQuantile(df, "v", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    // F(5) = 0.5 -> threshold 5.0, keep 5..10
    assert(kept == (5L to 10L).toSeq)
  }

  test("ties accumulate: a heavy low value can be the threshold") {
    val df = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 2.0)).toDF("id", "v")
    val kept = Sampling.filterTopQuantile(df, "v", 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 4L)) // F(1.0) = 0.75 >= 0.5
  }
}

class IncrementalDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("new docs are matched to lowest-id corpus near-dup or flagged novel") {
    def long(s: String) = Iterator.fill(15)(s).mkString(" ")
    val corpus = Seq(
      (1L, long("alpha beta gamma delta")),
      (2L, long("alpha beta gamma delta")),     // same content as 1
      (3L, long("omega psi chi"))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, long("alpha beta gamma delta")),    // dup of corpus 1 and 2
      (11L, long("totally new content here")),  // novel
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text") // null: novel
    val out = Dedup.incrementalDedup(fresh, corpus, "text", "doc_id", 0.5)
      .select("new_id", "matched_id", "is_novel")
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, Some(1L), false), // lowest-id match wins
      (11L, None, true),
      (12L, None, true)))
  }

  test("asymmetry: corpus-internal duplicates emit nothing") {
    def long(s: String) = Iterator.fill(15)(s).mkString(" ")
    val corpus = Seq((1L, long("a b c")), (2L, long("a b c"))).toDF("doc_id", "text")
    val fresh = Seq((10L, long("x y z"))).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(fresh, corpus, "text", "doc_id", 0.5)
    assert(out.count() == 1) // one row per NEW doc only
  }
}

class DuplicateNgramSpec extends SparkSpecBase {
  import spark.implicits._

  test("duplicate n-gram fraction counts grams shared across documents") {
    val shared = "one two three four five six"           // 2 distinct 5-grams
    val df = Seq(
      (1L, s"$shared unique1 tail1"),
      (2L, s"$shared unique2 tail2"),
      (3L, "completely different words here now ok")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateNgramFraction(df, "text", "doc_id", 5)
      .select("doc_id", "n_grams", "n_dup_grams")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // docs 1/2: 8 tokens -> 4 grams each; the first 2 grams are shared
    assert(out == Seq((1L, 4L, 2L), (2L, 4L, 2L), (3L, 2L, 0L)))
  }

  test("short docs fall back to the whole text as one gram") {
    val df = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other")).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateNgramFraction(df, "text", "doc_id", 5)
      .select("doc_id", "n_grams", "dup_frac")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 1L, 1.0), (2L, 1L, 1.0), (3L, 1L, 0.0)))
  }
}

class ExportSpec extends SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("trainingShards: every doc packed exactly once, sequences respect maxTokens") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxTokens = 64
    val m = graft.operators.Export
      .trainingShards(docs, "text", "doc_id", "lang", maxTokens, nShards = 4,
        nMerges = 40, minCount = 2)
      .cache()
    // bijection: each input doc appears exactly once
    assert(m.count() == docs.count())
    assert(m.select("doc_id").distinct().count() == docs.count())
    // every (shard, lang, seq) either fits the budget or is a single
    // oversize doc with its own sequence
    val bad = m.groupBy("shard", "lang", "seq_id")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("nd"))
      .filter($"tot" > maxTokens && $"nd" > 1)
    assert(bad.count() == 0, s"overfull multi-doc sequences: ${bad.collect().toSeq}")
    // offsets are the running prefix within each sequence
    val offBad = m.groupBy("shard", "lang", "seq_id")
      .agg(min("offset").as("o0"), (sum("n_tokens") - max($"offset" + $"n_tokens")).as("gap"))
      .filter($"o0" =!= 0L || $"gap" =!= 0L)
    assert(offBad.count() == 0, s"broken offsets: ${offBad.collect().toSeq}")
    // shards are balanced within 3x of each other (content-addressed hash)
    val counts = m.groupBy("shard").count().as[(Long, Long)].collect().map(_._2)
    assert(counts.length == 4 && counts.max <= 3 * counts.min, counts.toSeq.toString)
    m.unpersist()
  }

  test("writeShards: partitioned parquet round-trips and the manifest conserves totals") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val maxTokens = 64
    val m = graft.operators.Export
      .trainingShards(docs, "text", "doc_id", "lang", maxTokens, nShards = 2,
        nMerges = 40, minCount = 2)
    val manifest = graft.operators.Export
      .writeShards(docs, m, "text", "doc_id", "lang", maxTokens, out)
      .cache()
    // physical layout: one directory per shard
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1"))
    // totals conserve: docs and pieces match the manifest input
    val total = manifest.agg(sum("n_docs"), sum("n_pieces"))
      .as[(Long, Long)].collect()(0)
    val expected = m.agg(count(lit(1)), sum("n_tokens")).as[(Long, Long)].collect()(0)
    assert(total == expected, s"$total != $expected")
    // and the manifest agrees with what physically landed (the summary
    // itself deliberately does NOT re-scan the export)
    val landed = spark.read.parquet(out)
      .agg(count(lit(1)), sum("n_tokens")).as[(Long, Long)].collect()(0)
    assert(landed == expected, s"landed $landed != $expected")
    // packing actually packs: utilization comfortably above a degenerate
    // one-doc-per-sequence layout
    assert(manifest.filter($"utilization" <= 0.5).count() == 0,
      manifest.collect().toSeq.toString)
    manifest.unpersist()
  }
}
