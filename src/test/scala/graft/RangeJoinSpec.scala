package graft

import graft.operators.{RangeJoin, Similarity, TextAnalysis}

import org.apache.spark.sql.functions._

/** Bin-blocked range joins: oracle is the plain (nested-loop) predicate
  * join on the same data — results must be identical for any binSize, and
  * free of bin-collision duplicates.
  */
class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def pts = Seq((1L, 5.0), (2L, 10.0), (3L, -3.5), (4L, 99.9), (5L, 42.0))
    .toDF("pid", "x")
  private def ivs = Seq((10L, 0.0, 10.0), (11L, -5.0, -1.0), (12L, 9.0, 50.0),
    (13L, 40.0, 45.0), (14L, 100.0, 200.0))
    .toDF("iid", "lo", "hi")

  test("pointInRange matches the nested-loop join for any binSize") {
    val expected = pts.crossJoin(ivs)
      .filter($"x" >= $"lo" && $"x" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (bin <- Seq(0.5, 7.0, 1000.0)) {
      val got = RangeJoin.pointInRange(pts, "x", ivs, "lo", "hi", bin)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.toSet == expected, s"binSize=$bin")
      assert(got.length == expected.size, s"binSize=$bin produced duplicates")
    }
  }

  test("pointInRange compounds equality keys into the join") {
    val p = Seq(("a", 5.0, 1L), ("b", 5.0, 2L)).toDF("k", "x", "pid")
    val i = Seq(("a", 0.0, 10.0, 10L), ("b", 6.0, 10.0, 11L)).toDF("k", "lo", "hi", "iid")
    val got = RangeJoin.pointInRange(p, "x", i, "lo", "hi", 2.0, keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L))) // pid 2 is in range of iid 10 but key differs
  }

  test("intervalOverlap matches the nested-loop join, no bin duplicates") {
    val l = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, -20.0, -15.0), (4L, 30.0, 90.0))
      .toDF("lid", "llo", "lhi")
    val r = Seq((7L, 9.0, 35.0), (8L, -16.0, -1.0), (9L, 200.0, 300.0))
      .toDF("rid", "rlo", "rhi")
    val expected = l.crossJoin(r)
      .filter($"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    for (bin <- Seq(1.0, 8.0, 500.0)) {
      val got = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", bin)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.toSet == expected, s"binSize=$bin")
      assert(got.length == expected.size, s"binSize=$bin produced duplicates")
    }
  }
}

/** Deterministic hash split + repetition features. */
class SplitRepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  test("hashBucket is deterministic, in [0,100), and ~80/10/10 at 10k keys") {
    val ids = spark.range(10000).toDF("id")
    val b = ids.select(TextAnalysis.hashBucket($"id").as("b"))
    val (mn, mx) = b.agg(min("b"), max("b")).as[(Long, Long)].head()
    assert(mn >= 0 && mx < 100)
    val bySplit = ids.select(TextAnalysis.hashSplit($"id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(bySplit("train") - 8000L) < 200, bySplit.toString)
    assert(math.abs(bySplit("val") - 1000L) < 100, bySplit.toString)
    assert(math.abs(bySplit("test") - 1000L) < 100, bySplit.toString)
    // stable under physical layout changes (content-addressed, not rand())
    val again = ids.repartition(7).select($"id", TextAnalysis.hashSplit($"id").as("s"))
    val first = ids.select($"id", TextAnalysis.hashSplit($"id").as("s"))
    assert(first.exceptAll(again).isEmpty && again.exceptAll(first).isEmpty)
  }

  test("repetitionFeatures: null/empty text yields zero features, keeps input columns") {
    val df = Seq((1L, "the cat sat on the mat the cat sat again", "x"),
      (2L, null.asInstanceOf[String], "y"),
      (3L, "", "z"),
      (4L, "word", "w"))
      .toDF("doc_id", "text", "extra")
    val out = TextAnalysis.repetitionFeatures(df, "text", "doc_id")
    // input columns preserved (qualityFeatures parity)
    assert(Seq("doc_id", "text", "extra").forall(out.columns.contains))
    val rows = out.select("doc_id", "n_tokens", "dup_token_frac", "dup_bigram_frac",
      "top_bigram", "top_bigram_n")
      .as[(Long, Int, Double, Double, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // null and empty text: all-zero, never null
    for (id <- Seq(2L, 3L)) {
      val (_, n, dt, db, bg, bn) = rows(id)
      assert(n == 0 && dt == 0.0 && db == 0.0 && bg == "" && bn == 0L, s"doc $id")
    }
    // single token: no bigrams, zero dup fracs
    assert(rows(4L)._2 == 1 && rows(4L)._4 == 0.0)
    // repeated text: "the cat sat" repeats -> dup tokens and a repeated bigram
    val r1 = rows(1L)
    assert(r1._3 > 0.0 && r1._6 == 2L)
    assert(Set("the cat", "cat sat").contains(r1._5)) // count 2 each; tie -> max bigram
    assert(r1._5 == "the cat") // deterministic tie-break: count desc, bigram desc
  }
}

/** IVF ANN: planted-twin recall and deterministic quantizer fit. */
class IvfSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmeansFit is deterministic and assigns empty cells their prior centroid") {
    val sample = Array(
      Array(1.0, 0.0), Array(0.9, 0.1), Array(0.0, 1.0), Array(0.1, 0.9))
    val a = Similarity.kmeansFit(sample, 2, 5)
    val b = Similarity.kmeansFit(sample, 2, 5)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // centroids are unit-norm (spherical k-means)
    a.foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
  }

  test("ivfTopK finds every planted twin at rank 1") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" % 4 === 0).select("vec_id", "embedding")
    val twins = emb.select(($"vec_id" + 1000000L).as("vec_id"),
      transform($"embedding", (x, i) =>
        x * (lit(1.0) + lit(0.02) * sin(i.cast("double") + $"vec_id".cast("double"))))
        .cast("array<float>").as("embedding"))
    val corpus = emb.unionByName(twins)
    val n = emb.count()
    val found = Similarity.ivfTopK(corpus, 1, nCells = 8, nProbe = 4)
      .filter($"rank" === 1)
      .filter(($"query_id" + 1000000L === $"neighbor_id") ||
        ($"neighbor_id" + 1000000L === $"query_id"))
      .count()
    assert(found == 2 * n, s"planted recall ${found.toDouble / (2 * n)} < 1.0")
  }
}
