package graft

import graft.operators.{Sampling, TextAnalysis}

import org.apache.spark.sql.functions._

/** Deterministic sampling + TF-IDF term ranking. */
class SamplingSpec extends SparkSpecBase {
  import spark.implicits._

  test("hashSample is a stable, approximately-sized subset") {
    val df = spark.range(10000).toDF("id")
    val s20 = Sampling.hashSample(df, "id", 20)
    val n = s20.count()
    assert(math.abs(n - 2000L) < 200, s"got $n rows for 20%")
    // re-evaluation and layout changes select the same rows
    val again = Sampling.hashSample(df.repartition(13), "id", 20)
    assert(s20.exceptAll(again).isEmpty && again.exceptAll(s20).isEmpty)
    // nested property: the 10% sample is a subset of the 20% sample
    val s10 = Sampling.hashSample(df, "id", 10)
    assert(s10.exceptAll(s20).isEmpty)
  }

  test("exactNPerStratum takes exactly n per stratum, stable across layouts") {
    val df = spark.range(1000)
      .withColumn("stratum", ($"id" % 3).cast("string"))
    val out = Sampling.exactNPerStratum(df, "id", "stratum", 5)
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 5L, "1" -> 5L, "2" -> 5L))
    // smaller stratum than n: take all of it
    val tiny = Sampling.exactNPerStratum(df.filter($"id" < 4), "id", "stratum", 5)
    assert(tiny.count() == 4)
    // deterministic under repartition
    val again = Sampling.exactNPerStratum(df.repartition(17), "id", "stratum", 5)
    assert(out.select("id").exceptAll(again.select("id")).isEmpty)
  }

  test("profileExact and profileApprox agree on nulls/rows, HLL within 5%") {
    import graft.operators.Profile
    val df = spark.range(5000).toDF("id")
      .withColumn("s", when($"id" % 10 === 0, lit(null)).otherwise(concat(lit("v"), $"id" % 250)))
    val exact = Profile.profileExact(df).as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(exact("id") == (("id", 5000L, 0L, 5000L, "0", "4999")))
    // 500 nulls (id % 10 == 0); since 250 % 10 == 0 those nulls wipe out
    // entire residue classes: 25 of the 250 values never appear -> ndv 225
    assert(exact("s")._3 == 500L && exact("s")._4 == 225L)
    val approx = Profile.profileApprox(df).as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(approx("s")._3 == 500L)
    assert(math.abs(approx("id")._4 - 5000L).toDouble / 5000 <= 0.05)
  }

  test("histogram buckets equi-width with max folded into the last bucket") {
    import graft.operators.Profile
    val df = spark.range(100).toDF("v")
      .unionByName(Seq(Option.empty[Long]).toDF("v")) // null is ignored
    val out = Profile.histogram(df, "v", 10)
      .orderBy("bucket")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(out.map(_._1) == (0L to 9L))
    assert(out.forall(_._4 == 10L))              // 10 ints per 9.9-wide bucket
    assert(out.head._2 == 0.0 && out.last._3 == 99.0)
    // degenerate: constant column -> one bucket, lo = hi = the value
    val const = Profile.histogram(Seq(7.0, 7.0, 7.0).toDF("v"), "v", 10)
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(const == Seq((0L, 7.0, 7.0, 3L)))
  }

  test("collocations ranks PMI exactly with deterministic ties") {
    import graft.operators.TextAnalysis
    val docs = (Seq.fill(5)("new york") ++ Seq.fill(5)("the cat") ++
      Seq.fill(5)("the dog")).toDF("text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5, k = 10)
      .as[(String, String, Long, Double)].collect().toSeq
    // NU=30, NB=15: pmi(new,york)=ln(5*30*30/(5*5*15))=ln(12);
    // pmi(the,*)=ln(6); tie broken by (w1, w2)
    assert(out == Seq(
      ("new", "york", 5L, 2.484907),
      ("the", "cat", 5L, 1.791759),
      ("the", "dog", 5L, 1.791759)))
  }

  test("shuffleShard is a deterministic permutation: stable across layouts, dense seq") {
    val df = spark.range(1000).toDF("id")
    val a = Sampling.shuffleShard(df, "id", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Sampling.shuffleShard(df.repartition(13), "id", 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)                                  // layout-independent
    assert(a.map(_._2).distinct.sorted == (0L to 7L))
    // seq is dense 1..count(shard) within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1L to rows.size))
    }
    // shards are balanced (md5 buckets): no shard over 2x the mean
    val sizes = a.groupBy(_._2).values.map(_.size)
    assert(sizes.max <= 2 * (1000 / 8))
    // a different salt is a different permutation
    val c = Sampling.shuffleShard(df, "id", 8, salt = "epoch2")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(c != a)
  }

  test("tokenBudgetSelect keeps the best-scored prefix that fits, across partition layouts") {
    import graft.operators.Sampling
    // score = quality, tokens = cost; ranked by (score desc, id asc):
    // id 5 (s9, 40), id 2 (s8, 30), id 7 (s8, 30), id 1 (s7, 50), ...
    val docs = Seq(
      (1L, 7L, 50L), (2L, 8L, 30L), (3L, 1L, 10L), (4L, 5L, 25L),
      (5L, 9L, 40L), (6L, 3L, 60L), (7L, 8L, 30L), (8L, 6L, 45L))
      .toDF("id", "score", "tokens")
    // budget 100: 40 + 30 + 30 = 100 fits exactly; the next (id 1, 50) won't
    val sel = Sampling.tokenBudgetSelect(docs, "id", "score", "tokens", 100L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(sel.toSeq == Seq((2L, 70L), (5L, 40L), (7L, 100L)), s"got ${sel.toSeq}")
    // layout-independent: 1 partition and 7 partitions agree
    val one = Sampling.tokenBudgetSelect(docs, "id", "score", "tokens", 100L, nPartitions = 1)
      .select("id").as[Long].collect().sorted.toSeq
    val many = Sampling.tokenBudgetSelect(docs, "id", "score", "tokens", 100L, nPartitions = 7)
      .select("id").as[Long].collect().sorted.toSeq
    assert(one == Seq(2L, 5L, 7L) && many == one, s"one=$one many=$many")
    // a budget smaller than the best doc selects nothing
    assert(Sampling.tokenBudgetSelect(docs, "id", "score", "tokens", 39L).count() == 0)
  }

  test("packWindows places docs in concat order; boundary crossing exact; layout-stable") {
    import graft.operators.Sampling
    // capacity 10, id order tokens 4,4,4,8 → exclusive cums 0,4,8,12:
    // doc 3 starts at offset 8 and spills into bin 1; doc 4 starts in
    // bin 1 at offset 2 and ends at token 19 (bin 1). A zero-token doc
    // occupies no window and must drop.
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 8L), (5L, 0L))
      .toDF("id", "nt")
    val out = Sampling.packWindows(docs, "id", "nt", 10L)
      .select("id", "bin", "offset", "bin_last", "crosses_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, false), (2L, 0L, 4L, 0L, false),
      (3L, 0L, 8L, 1L, true), (4L, 1L, 2L, 1L, false)), s"got $out")
    // layout-independent: 1 and 7 partitions agree cell-for-cell
    val one = Sampling.packWindows(docs, "id", "nt", 10L, nPartitions = 1)
      .orderBy("id").collect().toSeq
    val many = Sampling.packWindows(docs, "id", "nt", 10L, nPartitions = 7)
      .orderBy("id").collect().toSeq
    assert(one == many, s"one=$one many=$many")
    // a doc longer than the capacity spans multiple whole windows
    val long = Sampling.packWindows(Seq((1L, 25L)).toDF("id", "nt"),
      "id", "nt", 10L).head()
    assert(long.getAs[Long]("bin") == 0L &&
      long.getAs[Long]("bin_last") == 2L &&
      long.getAs[Boolean]("crosses_boundary"))
  }

  test("packWindows property: matches a sequential reference fold on random corpora") {
    import graft.operators.Sampling
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val docs = (1L to 400L).map(i => (i, rnd.nextInt(300).toLong))
      val cap = 64L + trial * 37L
      // sequential reference: one pass over id order
      var cum = 0L
      val expect = docs.filter(_._2 > 0).map { case (id, nt) =>
        val before = cum; cum += nt
        (id, nt, before / cap, before % cap, (before + nt - 1) / cap,
          before / cap != (before + nt - 1) / cap)
      }
      val got = Sampling.packWindows(
          docs.toDF("id", "nt"), "id", "nt", cap, nPartitions = 7)
        .as[(Long, Long, Long, Long, Long, Boolean)]
        .collect().sortBy(_._1).toSeq
      assert(got == expect, s"trial $trial cap $cap diverged")
    }
  }

  test("temperature mixing flattens toward uniform as alpha drops") {
    val df = (Seq.fill(900)("big") ++ Seq.fill(100)("small"))
      .zipWithIndex.map(_.swap).toDF("id", "dom")
    val w1 = Sampling.temperatureWeights(df, "dom", 1.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val w3 = Sampling.temperatureWeights(df, "dom", 0.3)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(w1("big") - 0.9) < 1e-6 && math.abs(w1("small") - 0.1) < 1e-6)
    assert(w3("small") > 0.1 && w3("big") < 0.9)    // flattened
    assert(math.abs(w3("small") + w3("big") - 1.0) < 1e-5)
    // sampled corpus honors the quotas (capped at domain size)
    val out = Sampling.temperatureSample(df, "dom", "id", 0.3, 500)
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(out("big") == math.round(500 * w3("big")))
    assert(out("small") == math.min(100L, math.round(500 * w3("small")))) // capped at domain size
    // determinism under re-partitioning
    val again = Sampling.temperatureSample(df.repartition(7), "dom", "id", 0.3, 500)
    assert(Sampling.temperatureSample(df, "dom", "id", 0.3, 500)
      .select("id").exceptAll(again.select("id")).isEmpty)
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val df = spark.range(30000)
      .withColumn("stratum",
        when($"id" % 3 === 0, "a").when($"id" % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratifiedSample(df, "id", "stratum",
      Map("a" -> 50, "b" -> 10), defaultPct = 0)
    val counts = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("a") - 5000L) < 400, counts.toString)
    assert(math.abs(counts("b") - 1000L) < 200, counts.toString)
    assert(!counts.contains("c"), "defaultPct=0 must drop unlisted strata")
  }
}

class TfidfSpec extends SparkSpecBase {
  import spark.implicits._

  test("tfidfTopTerms ranks rare frequent terms first, deterministic ties") {
    // "zebra" appears twice in doc 1 and nowhere else -> tf/df = 2/1 = 2.0 top.
    // "the" is in all three docs -> df 3, low score.
    val docs = Seq(
      (1L, "zebra zebra the cat"),
      (2L, "the cat sat"),
      (3L, "the dog sat")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .as[(Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._3)) == Seq((1, "zebra"), (2, "cat")))
    val d1 = out.find(r => r._1 == 1L && r._2 == 1).get
    assert(d1._4 == 2L && d1._5 == 1L && d1._6 == 2.0)
    // docs 2 and 3: "sat" (df 2) and the unique term tie region — rank 1 is
    // the df-1 term (dog for doc 3), and doc 2's is cat (df 2, tf 1) vs sat
    // (df 2): equal score 0.5, tie breaks to term asc -> "cat"
    assert(out.find(r => r._1 == 3L && r._2 == 1).get._3 == "dog")
    assert(out.find(r => r._1 == 2L && r._2 == 1).get._3 == "cat")
  }
}

class TriangleSpec extends SparkSpecBase {
  import spark.implicits._

  test("triangleCounts is exact on a known graph, robust to dups/orientation/self-loops") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    // and noise: duplicate edges, reversed orientation, a self-loop
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L),      // reverse duplicate
      (3L, 1L),      // reverse duplicate
      (4L, 5L),      // pendant edge: no triangle
      (5L, 5L))      // self-loop: ignored
      .toDF("src", "dst")
    val out = graft.operators.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }
}

class PageRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank matches the analytic stationary distribution on a known graph") {
    // classic 3-node example: A->B, A->C, B->C, C->A (d=0.85)
    // stationary: A ~ 0.38779, B ~ 0.21481, C ~ 0.39740
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = graft.operators.Graph.pageRank(edges, 0.85, 25)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.38779) < 1e-3, r.toString)
    assert(math.abs(r(2L) - 0.21481) < 1e-3, r.toString)
    assert(math.abs(r(3L) - 0.39740) < 1e-3, r.toString)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("dangling nodes keep total mass at 1 and rank above the floor") {
    // 2 -> 1, 1 dangles
    val edges = Seq((2L, 1L)).toDF("src", "dst")
    val r = graft.operators.Graph.pageRank(edges, 0.85, 15)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.toString)
    assert(r.values.forall(_ >= (1 - 0.85) / 2 - 1e-12))
    assert(r(1L) > r(2L)) // the pointed-at node ranks higher
  }
}
