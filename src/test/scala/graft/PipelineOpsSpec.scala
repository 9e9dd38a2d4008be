package graft

import graft.operators._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "yet another unrelated string talking about minhash lsh banding theory")
  ).toDF("doc_id", "text")

  test("exactDedup groups identical texts") {
    val d = Dedup.exactDedup(docs, "text", "doc_id").collect()
    assert(d.length == 4)
    val dup = d.find(_.getLong(1) == 2L).get
    assert(dup.getLong(2) == 1L) // keeper is min id
  }

  test("minhash LSH finds planted near-dups and exact dups, not unrelated docs") {
    val pairs = Dedup.minHashLshPairs(docs, "text", "doc_id", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("naiveBayes: hand-derived posteriors, unseen-token default, largest-label ties") {
    import graft.operators.Classifier
    // train: L1 = "a a b", L2 = "b b"; V = 2, alpha = 1
    // P(a|L1) = 3/5, P(b|L1) = 2/5; P(a|L2) = 1/4, P(b|L2) = 3/4
    val train = Seq(("a a b", "L1"), ("b b", "L2")).toDF("text", "lab")
    val model = Classifier.naiveBayesFit(train, "text", "lab")
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val seen = model.filter($"term".isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(seen(("L1", "a")) == r9(math.log(3.0 / 5.0)))
    assert(seen(("L2", "b")) == r9(math.log(3.0 / 4.0)))
    // "a"-heavy doc goes L1, "b"-heavy goes L2; "c c" is all-unseen and
    // falls to the prior + defaults — L2's default 1/4 beats L1's 1/5
    val docs = Seq((1L, "a a"), (2L, "b b b"), (3L, "c c")).toDF("doc_id", "text")
    val out = Classifier.naiveBayesScore(model, docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "L1", 2L -> "L2", 3L -> "L2"), s"got $out")
    // exact-tie documents break to the lexicographically LARGEST label:
    // symmetric training makes "a b" score identically under both
    val sym = Classifier.naiveBayesFit(
      Seq(("a a b", "L1"), ("b b a", "L2")).toDF("text", "lab"), "text", "lab")
    val tie = Classifier.naiveBayesScore(sym,
      Seq((1L, "a b")).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(tie.getString(1) == "L2")
  }

  test("naiveBayes: a label whose docs all tokenize empty keeps its prior") {
    import graft.operators.Classifier
    // "!!!" tokenizes to zero tokens: L0 has a prior but NO (label, term)
    // counts — before r15 the defaults inner join dropped it and the
    // class was unpredictable forever; defaults now derive from priors
    val train = Seq(("a a b", "L1"), ("b b", "L2"), ("!!!", "L0"))
      .toDF("text", "lab")
    val model = Classifier.naiveBayesFit(train, "text", "lab")
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue
    val defaults = model.filter($"term".isNull).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(defaults.keySet == Set("L0", "L1", "L2"), s"got ${defaults.keySet}")
    // V = {a, b} = 2; L0: N_label = 0 -> default log(1/(0 + 2)), prior 1/3
    assert(defaults("L0")._1 == r9(math.log(1.0 / 2.0)))
    assert(defaults("L0")._2 == r9(math.log(1.0 / 3.0)))
    // an all-unseen doc scores prior + default per label: L0's default
    // log(1/2) beats L1's log(1/7) and L2's log(1/6) at equal priors
    val out = Classifier.naiveBayesScore(model,
      Seq((1L, "z")).toDF("doc_id", "text"), "text", "doc_id").head()
    assert(out.getString(1) == "L0")
  }

  test("lshPlan: divisor table, closed-form s-curve, monotone trade-off") {
    val plan = Dedup.lshPlan(spark, 64, 0.8, 0.3).orderBy("bands").collect()
    // d(64) = 7 factorizations: 1,2,4,8,16,32,64 bands
    assert(plan.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    assert(plan.forall(r => r.getLong(0) * r.getLong(1) == 64L))
    // closed-form spot check: b=16, r=4 -> s* = (1/16)^(1/4) = 0.5
    val b16 = plan.find(_.getLong(0) == 16L).get
    assert(b16.getAs[Double]("s_star") == 0.5)
    // more bands = more permissive: catch probability at the target
    // similarity rises with bands, and always dominates the distractor's
    val catchP = plan.map(_.getAs[Double]("p_at_target")).toSeq
    assert(catchP == catchP.sorted, s"p_at_target not monotone: $catchP")
    assert(plan.forall(r =>
      r.getAs[Double]("p_at_target") >= r.getAs[Double]("p_at_distractor")))
  }

  test("simhash: identical docs collide at hamming 0") {
    val pairs = Dedup.simHashPairs(docs, "text", "doc_id", 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0L))
  }

  test("jaccard is 1.0 for identical sets and order-insensitive") {
    val j = docs.select(Dedup.jaccard(
      split(lit("a b c"), " "), split(lit("c b a"), " ")).as("j"))
      .limit(1).as[Double].collect()(0)
    assert(j == 1.0)
  }

  test("appendToLshIndex equals a full rebuild; on-disk append agrees too") {
    def doc(id: Long, words: String) = (id, words)
    val corpusA = Seq(
      doc(1L, "the quick brown fox jumps over the lazy dog again and again"),
      doc(2L, "completely unrelated text about distributed query engines")
    ).toDF("doc_id", "text")
    val novel = Seq(
      doc(10L, "spark catalyst optimizer rewrites logical plans into physical ones")
    ).toDF("doc_id", "text")
    val probe = Seq(
      // near-dup of novel doc 10 (one word changed)
      doc(20L, "spark catalyst optimizer rewrites logical plans into physical stages"),
      // near-dup of corpus doc 1
      doc(21L, "the quick brown fox jumps over the lazy dog again and again"),
      doc(22L, "nothing like anything indexed so far at all believe me truly")
    ).toDF("doc_id", "text")
    val idxA = Dedup.buildLshIndex(corpusA, "text", "doc_id")
    val appended = Dedup.appendToLshIndex(novel, "text", "doc_id", idxA)
    val rebuilt = Dedup.buildLshIndex(corpusA.unionByName(novel), "text", "doc_id")
    def dedupWith(idx: Dedup.LshIndex) =
      Dedup.dedupAgainstIndex(probe, "text", "doc_id", 0.5, idx)
        .orderBy("new_id")
        .collect().map(r => (r.getLong(0), Option(r.getAs[java.lang.Long](1))
          .map(_.longValue), r.getBoolean(3))).toSeq
    val viaAppend = dedupWith(appended)
    assert(viaAppend == dedupWith(rebuilt))
    assert(viaAppend.map(t => t._1 -> t._2).toMap ==
      Map(20L -> Some(10L), 21L -> Some(1L), 22L -> None))
    // the persisted path: save A, append the increment, reload
    val dir = java.nio.file.Files.createTempDirectory("lsh_inc").toString
    Dedup.saveLshIndex(idxA, dir)
    Dedup.appendLshIndex(novel, "text", "doc_id", dir)
    assert(dedupWith(Dedup.loadLshIndex(spark, dir)) == viaAppend)
  }

  test("goldenRecord picks each field from its own best source row") {
    // cluster 1: row 10 has the phone but low score; row 11 scores
    // higher but lacks the phone -> phone from 10, email from 11
    val rows = Seq(
      (1L, 10L, 1.0, "555-1234", null.asInstanceOf[String]),
      (1L, 11L, 9.0, null.asInstanceOf[String], "a@b.c"),
      (2L, 20L, 5.0, "555-9999", "x@y.z"),
      (2L, 21L, 7.0, "555-0000", null.asInstanceOf[String]))
      .toDF("cluster", "id", "score", "phone", "email")
    val out = Dedup.goldenRecord(rows, "cluster", Seq("phone", "email"),
        "score", "id")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getAs[Long]("n_sources"))).toMap
    assert(out(1L) == ("555-1234", "a@b.c", 2L)) // fields from DIFFERENT rows
    assert(out(2L) == ("555-0000", "x@y.z", 2L)) // score then presence
  }

  test("lineDedup removes corpus-frequent lines, keeps order, counts removals") {
    val docs = Seq(
      (1L, "HEADER\nalpha one\nbeta two\nFOOTER"),
      (2L, "HEADER\ngamma three\nFOOTER"),
      (3L, "HEADER\nFOOTER"),          // fully boilerplate
      (4L, "HEADER\ndelta four\nFOOTER"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(docs, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == ("alpha one\nbeta two", 2L))
    assert(out(2L) == ("gamma three", 2L))
    assert(out(3L) == ("", 2L)) // survives as empty, removal count intact
    assert(out(4L) == ("delta four", 2L))
    // at maxOccur = 4 nothing is frequent enough to remove
    val loose = TextAnalysis.lineDedup(docs, "text", "doc_id", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(loose.values.forall(_ == 0L))
  }

  test("CDC chunking re-synchronizes after a shifted prefix; stop-chunks pruned") {
    import graft.functions.CdcChunkHashes
    val body = (0 until 64).map(j => s"tokenword$j extra").mkString(" ")
    def chunksOf(text: String): Set[Long] =
      Seq(Tuple1(text)).toDF("t")
        .select(CdcChunkHashes(col("t")).as("c"))
        .collect()(0).getSeq[Long](0).toSet
    val a = chunksOf(body)
    val b = chunksOf("completely different prepended head material " + body)
    assert(a.size >= 8, s"expected many chunks, got ${a.size}")
    // boundaries re-synchronize within ~maxLen bytes of the shared
    // region's start: the overwhelming majority of chunks are shared
    assert((a intersect b).size >= a.size - 2,
      s"shared ${(a intersect b).size} of ${a.size}")
    // the planted-pair operator finds the shifted twin, nothing else
    val docs = Seq(
      (1L, body), (2L, "some head " + body),
      (3L, (100 until 164).map(j => s"otherword$j extra").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.cdcOverlapPairs(docs, "text", "doc_id", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
    // boilerplate prune: 10 docs sharing ONLY a common block pair up
    // with a loose maxDocFreq but NOT once the block exceeds it
    val boiler = (0 until 64).map(j => s"licenseline$j shared").mkString(" ")
    val many = (1L to 10L).map(i => (i, s"uniquehead$i " + boiler))
      .toDF("doc_id", "text")
    assert(Dedup.cdcOverlapPairs(many, "text", "doc_id", 2,
      maxDocFreq = 100).count() == 45) // all C(10,2) pairs
    assert(Dedup.cdcOverlapPairs(many, "text", "doc_id", 2,
      maxDocFreq = 3).count() == 0)   // boilerplate dropped pre-join
  }

  test("appendLshIndex retry-idempotent; compactLshIndex equals fresh build") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely unrelated text about distributed query engines")
    ).toDF("doc_id", "text")
    val novel = Seq(
      (10L, "spark catalyst optimizer rewrites logical plans into physical ones")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lsh_cmp").toString
    Dedup.saveLshIndex(Dedup.buildLshIndex(corpus, "text", "doc_id"), dir)
    Dedup.appendLshIndex(novel, "text", "doc_id", dir)
    val nBands = spark.read.parquet(s"$dir/bands").count()
    val nSh = spark.read.parquet(s"$dir/shingles").count()
    // a RETRIED append of the same increment is anti-joined to nothing
    Dedup.appendLshIndex(novel, "text", "doc_id", dir)
    assert(spark.read.parquet(s"$dir/bands").count() == nBands)
    assert(spark.read.parquet(s"$dir/shingles").count() == nSh)
    // simulate legacy (pre-idempotency) double-append damage: duplicate
    // every band/shingle row on disk, then compact
    Seq("bands", "shingles").foreach { sub =>
      val rows = spark.read.parquet(s"$dir/$sub")
      val dup = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.collect().toSeq), rows.schema)
      dup.write.mode("append").parquet(s"$dir/$sub")
      assert(spark.read.parquet(s"$dir/$sub").count() == 2 * rows.count())
    }
    Dedup.compactLshIndex(spark, dir)
    val fresh = Dedup.buildLshIndex(corpus.unionByName(novel), "text", "doc_id")
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSet
    assert(rowSet(spark.read.parquet(s"$dir/bands")) == rowSet(fresh.bandIndex))
    assert(spark.read.parquet(s"$dir/shingles").count() ==
      fresh.shingles.count())
    // and the compacted index still answers probes like the fresh one
    val probe = Seq(
      (20L, "spark catalyst optimizer rewrites logical plans into physical stages")
    ).toDF("doc_id", "text")
    val hit = Dedup.dedupAgainstIndex(probe, "text", "doc_id", 0.5,
      Dedup.loadLshIndex(spark, dir)).collect()(0)
    assert(hit.getLong(1) == 10L && !hit.getBoolean(3))
  }
}

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.01f, 0.0f, 0.0f)), // near 0
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))  // opposite of 0
  ).toDF("vec_id", "embedding")

  test("semanticDiff: new/lost surface; copies, near-dups and matches never do") {
    import graft.operators.Similarity
    // db1: basis vectors e1, e2, e3. db2: a scaled copy of e1 (cos = 1,
    // LSH buckets are scale-invariant so it ALWAYS collides), e2 itself
    // under the same id, and a novel e4. Expected: db1-lost = {3} (e3
    // has no db2 counterpart), db2-new = {30} (e4 matches nothing).
    val db1 = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "v")
    val db2 = Seq(
      (10L, Seq(2.0, 0.0, 0.0, 0.0)), // scaled copy of id 1
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),  // exact copy, same id
      (30L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val out = Similarity.semanticDiff(db1, db2, "id", "v", 0.9, 4)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(out == Set(("db1", 3L), ("db2", 30L)), s"got $out")
    // symmetric on empty sides: everything on the non-empty side is new
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val allNew = Similarity.semanticDiff(empty, db2, "id", "v", 0.9, 4)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(allNew == Set(("db2", 10L), ("db2", 2L), ("db2", 30L)))
  }

  test("semanticJoin: best match per probe, argmax + lower-id ties, no-match absent") {
    import graft.operators.Similarity
    // db1: e1 twice (ids 1, 5 — an exact tie at cos 1 for any e1-ish
    // probe, must resolve to the LOWER id), a slightly-rotated e1
    // (id 2), and e2 (id 3). db2: a scaled e1 (best = tie -> id 1),
    // a vector nearer the rotated copy than pure e1 (best = id 2),
    // and a novel e3 (no match -> absent).
    val db1 = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(1.0, 0.2, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    val db2 = Seq(
      (10L, Seq(3.0, 0.0, 0.0, 0.0)),
      (20L, Seq(1.0, 0.2, 0.0, 0.0)),
      (30L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "v")
    val out = Similarity.semanticJoin(db1, db2, "id", "v", 0.9, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 20L -> 2L), s"got $out")
    // empty build side: nothing matches, nothing crashes
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(Similarity.semanticJoin(empty, db2, "id", "v", 0.9, 4).count() == 0L)
  }

  test("semanticDedupLsh: min-id survivor per near-dup component, singletons kept") {
    import graft.operators.Similarity
    // component {1, 5, 9}: scaled copies of e1 (cos 1 pairwise, min id
    // 1 survives); component {2, 7}: e2 and a near-dup (7 drops);
    // singleton 3 (e3) always survives
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(2.0, 0.0, 0.0, 0.0)),
      (9L, Seq(3.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (7L, Seq(0.0, 1.0, 0.01, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("id", "v")
    val kept = Similarity.semanticDedupLsh(corpus, "id", "v", 0.9, 4)
    assert(kept.columns.toSeq == Seq("id", "v"), "schema unchanged")
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // tightening the threshold past the {2, 7} near-dup margin
    // (cos ~0.99995) splits that component but the exact scaled copies
    // (cos = 1) still collapse
    val tight = Similarity.semanticDedupLsh(corpus, "id", "v", 0.9999999, 4)
    assert(tight.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 7L))
  }

  test("pcaProject: rotated planted axis recovered; whiten equalizes variance") {
    import graft.operators.Similarity
    // points on the diagonal y = x plus small anti-diagonal jitter: the
    // top component is (1,1)/sqrt(2) (sign convention positive), the
    // second (1,-1)/sqrt(2) scaled by the jitter — a REAL rotation case
    // for the Jacobi path (off-diagonal covariance nonzero)
    // jitter keyed on |i| parity so cov(i, jitter) = 0 exactly — the
    // principal axes are then exactly (1,1)/sqrt2 and (1,-1)/sqrt2
    val pts = (-8 to 8).map { i =>
      val j = 0.25 * (math.abs(i) % 2)
      (i.toLong + 10L, Seq(i.toDouble + j, i.toDouble - j))
    }.toDF("id", "v")
    val proj = Similarity.pcaProject(pts, "id", "v", k = 2, center = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // component 1 ~ sqrt(2)*i, component 2 ~ the +-0.35 jitter
    val p0 = proj(18L) // i = 8: on-diagonal, jitter 0
    assert(math.abs(p0(0) - 8 * math.sqrt(2)) < 0.05, s"$p0")
    assert(math.abs(p0(1)) < 0.5, s"$p0")
    val p1 = proj(17L) // i = 7: jitter +0.25/-0.25
    assert(math.abs(p1(1)) > 0.15, "second component carries the jitter")
    // variance along component 1 >> component 2; whitening equalizes
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val c1 = proj.values.map(_(0)).toSeq
    val c2 = proj.values.map(_(1)).toSeq
    assert(variance(c1) > 50 * variance(c2))
    val white = Similarity.pcaProject(pts, "id", "v", k = 2,
        center = true, whiten = true)
      .collect().map(r => r.getSeq[Double](1)).toSeq
    val w1 = variance(white.map(_(0)))
    val w2 = variance(white.map(_(1)))
    assert(math.abs(w1 - 1.0) < 0.05 && math.abs(w2 - 1.0) < 0.05,
      s"whitened variances $w1 $w2")
  }

  test("semanticDedupIncrement: corpus dups drop, batch dups collapse, novel survives") {
    import graft.operators.Similarity
    // corpus: e1, e2. batch: scaled e1 (corpus dup -> drops), two copies
    // of e3 (within-batch dup -> min id 11 survives), e4 (novel)
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("id", "v")
    val batch = Seq(
      (10L, Seq(3.0, 0.0, 0.0, 0.0)),
      (11L, Seq(0.0, 0.0, 1.0, 0.0)),
      (12L, Seq(0.0, 0.0, 2.0, 0.0)),
      (13L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val kept = Similarity.semanticDedupIncrement(batch, corpus, "id", "v", 0.9, 4)
    assert(kept.columns.toSeq == Seq("id", "v"), "schema unchanged")
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == Set(11L, 13L))
    // empty corpus degenerates to semanticDedupLsh on the batch
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val all = Similarity.semanticDedupIncrement(batch, empty, "id", "v", 0.9, 4)
    assert(all.select("id").collect().map(_.getLong(0)).toSet ==
      Set(10L, 11L, 13L))
  }

  test("mmdDrift: near the noise floor on a null split, far above it on a shift") {
    import graft.operators.Similarity
    // deterministic 4-d point cloud; sides = even/odd index (same
    // distribution) vs even/odd-shifted (+1.0 on every coordinate)
    val pts = (0 until 200).map { i =>
      (i.toLong, Seq(math.sin(i * 0.7), math.cos(i * 1.3),
        math.sin(i * 2.1) * 0.5, math.cos(i * 0.4) * 0.25))
    }.toDF("id", "v")
    val even = pts.filter($"id" % 2 === 0)
    val odd = pts.filter($"id" % 2 === 1)
    val shifted = odd.select($"id",
      org.apache.spark.sql.functions.transform($"v", x => x + 1.0).as("v"))
    val nullRow = Similarity.mmdDrift(even, odd, "v", 4).collect()(0)
    val shiftRow = Similarity.mmdDrift(even, shifted, "v", 4).collect()(0)
    assert(nullRow.getLong(0) == 100L && nullRow.getLong(1) == 100L)
    val mNull = nullRow.getDouble(2)
    val mShift = shiftRow.getDouble(2)
    assert(mNull >= 0.0 && mShift >= 0.0, "plug-in MMD^2 is a squared norm")
    assert(mShift > 10 * mNull, s"shift must dominate the null: $mShift vs $mNull")
    // determinism: same seed, same statistic, bit for bit
    val again = Similarity.mmdDrift(even, odd, "v", 4).collect()(0).getDouble(2)
    assert(again == mNull)
    // degenerate side publishes NULL, never NaN (the atkinson discipline)
    val empty = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    val degen = Similarity.mmdDrift(even, empty, "v", 4).collect()(0)
    assert(degen.getLong(1) == 0L && degen.isNullAt(2))
  }

  test("hyperplanePlan: s-curve monotone in bits/tables, near-dup regime ~certain") {
    import graft.operators.Similarity
    val plan = Similarity.hyperplanePlan(spark, 16, 64, 0.9, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // more tables -> more recall; more bits -> fewer collisions
    assert(plan((8L, 16L))._1 > plan((8L, 4L))._1)
    assert(plan((4L, 16L))._2 > plan((8L, 16L))._2)
    // the semanticDiff default (8 bits x 16 tables): even a pair AT the
    // 0.9 threshold boundary collides >99% (true near-dups at ~0.9998
    // are the ~1e-21-miss regime the operator docs state), while the
    // 0.6 distractor collides substantially less
    val (t, d) = plan((8L, 16L))
    assert(t > 0.99, s"boundary-pair recall at the default: $t")
    assert(d < 0.9 && d < t, s"distractor must collide less: $d vs $t")
  }

  test("cellMedoids picks the most-aligned member per cell, ties to lowest id") {
    import graft.operators.Similarity
    // cell 0 around (1,0): id 3 is exactly on-axis (cos 1); ids 1, 5
    // are slightly rotated. cell 1 around (0,1): ids 2 and 4 tie at
    // cos 1 — the LOWER id (2) must win.
    val pts = Seq(
      (1L, Seq(1.0, 0.1)), (3L, Seq(2.0, 0.0)), (5L, Seq(1.0, 0.2)),
      (2L, Seq(0.0, 3.0)), (4L, Seq(0.0, 7.0))).toDF("id", "v")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val out = Similarity.cellMedoids(pts, "id", "v", cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out == Map(0L -> (3L, 3L), 1L -> (2L, 2L)), s"got $out")
  }

  test("cellMassDrift localizes a planted mass shift to its cell") {
    import graft.operators.Similarity
    // two clean 2-d clusters around (10,0) and (0,10); db2 drops half of
    // cluster 0 — cell 0 must carry the big psi_term, cell 1 a small
    // complementary one (its share rose because totals shrank)
    val pts = (0L until 100L).map { i =>
      val c = (i % 2).toInt
      (i, Seq(if (c == 0) 10.0 + 0.01 * i else 0.3,
        if (c == 1) 10.0 - 0.01 * i else 0.2))
    }.toDF("id", "v")
    val db2 = pts.filter(!($"id" % 4 === 0)) // drops half of cluster 0
    val cents = Array(Array(10.0, 0.0), Array(0.0, 10.0))
    val out = Similarity.cellMassDrift(pts, db2, "v", cents)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5))).toMap
    assert(out(0L)._1 == 50L && out(0L)._2 == 25L)
    assert(out(1L)._1 == 50L && out(1L)._2 == 50L)
    // both terms positive (PSI terms are), the emptied cell's larger —
    // with two cells the complement moves too, so only strictly larger
    assert(out(0L)._3 > 0.05, s"shifted cell must alarm: ${out(0L)._3}")
    assert(out(1L)._3 > 0.0 && out(0L)._3 > out(1L)._3,
      s"emptied cell must lead: ${out(0L)._3} vs ${out(1L)._3}")
    // cells sum to the corpus on both sides
    assert(out.values.map(_._1).sum == 100L && out.values.map(_._2).sum == 75L)
  }

  test("cellMatching: greedy centroid-cosine assignment, unmatched cells kept") {
    import graft.operators.Similarity
    // snapshot 1: two axis clusters; snapshot 2 quantized independently
    // with SWAPPED, tilted centroids plus one extra cell nothing matches
    val pts = (0L until 40L).map { i =>
      val c = (i % 2).toInt
      (i, Seq(if (c == 0) 10.0 else 0.1, if (c == 1) 10.0 else 0.1, 0.0))
    }.toDF("id", "v")
    val db2 = pts.filter($"id" % 2 === 1) // only cluster-1 rows survive
    val cents1 = Array(Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0))
    val cents2 = Array(Array(0.0, 7.0, 1.0), // matches cents1(1)
      Array(7.0, 0.0, 1.0),                  // matches cents1(0)
      Array(0.0, 0.0, 5.0))                  // the appeared mode
    val rows = Similarity.cellMatching(pts, db2, "v", cents1, cents2)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), r.getLong(3), r.getLong(4)))
    val matched = rows.filter(r => r._1.isDefined && r._2.isDefined)
      .map(r => r._1.get -> r._2.get).toMap
    assert(matched == Map(0L -> 1L, 1L -> 0L), s"got $matched")
    // partner cosine is 7/sqrt(50) on both pairs, 6-dp rounded
    rows.filter(_._3.isDefined).foreach { r =>
      assert(r._3.get == BigDecimal(7.0 / math.sqrt(50.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"got $r")
    }
    // the extra snapshot-2 cell rides along unmatched with its own mass
    val unmatched = rows.filter(_._1.isEmpty)
    assert(unmatched.map(_._2).toSeq == Seq(Some(2L)))
    assert(unmatched.head._4 == 0L, "no snapshot-1 mass on an unmatched-2 cell")
    // masses: snapshot-1 sides split 20/20; db2 has only cluster 1 (20
    // rows) and nothing lands in the appeared cell (z component is 0)
    val m = rows.map(r => (r._1, r._2) -> (r._4, r._5)).toMap
    assert(m((Some(0L), Some(1L))) == (20L, 0L))
    assert(m((Some(1L), Some(0L))) == (20L, 20L))
    // k > 256 on either side is a contract violation, not a silent collect
    intercept[IllegalArgumentException] {
      Similarity.cellMatching(pts, db2, "v",
        Array.tabulate(257, 2)((_, _) => 1.0), cents2)
    }
    // a zero centroid (NaN cosine against everything) must ride through
    // as an unmatched cell, not crash the 6-dp round
    val withZero = cents1 :+ Array(0.0, 0.0, 0.0)
    val rz = Similarity.cellMatching(pts, db2, "v", withZero, cents2)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(rz.exists(r => r._1 == Some(2L) && r._2.isEmpty),
      s"zero centroid must surface unmatched: ${rz.toSeq}")
  }

  test("clusterAgreement: identical codebooks score 1/1; merge scores between; " +
    "single cluster is NULL") {
    import graft.operators.Similarity
    // four clean 3-d corner clusters, 10 points each
    val pts = (0L until 40L).map { i =>
      val c = (i % 4).toInt
      (i, Seq.tabulate(4)(j => if (j == c) 10.0 else 0.1))
    }.toDF("id", "v")
    val four = Array.tabulate(4, 4)((c, j) => if (j == c) 10.0 else 0.0)
    val same = Similarity.clusterAgreement(pts, "v", four, four).head()
    assert(same.getLong(0) == 40L)
    assert(same.getDouble(1) == 1.0, s"identical partitions: ARI ${same.get(1)}")
    assert(same.getDouble(2) == 1.0, s"identical partitions: NMI ${same.get(2)}")
    // merging two cells: strictly between 0 and 1 on both indices
    val merged = Array(
      Array(7.0, 7.0, 0.0, 0.0), Array(0.0, 0.0, 10.0, 0.0),
      Array(0.0, 0.0, 0.0, 10.0))
    val m = Similarity.clusterAgreement(pts, "v", four, merged).head()
    assert(m.getDouble(1) > 0.0 && m.getDouble(1) < 1.0, s"ARI ${m.get(1)}")
    assert(m.getDouble(2) > 0.0 && m.getDouble(2) < 1.0, s"NMI ${m.get(2)}")
    // hand-checked Hubert-Arabie value for 4x10 -> {0+1, 2, 3}:
    // sij = 4*45 = 180, sa = 180, sb = 190+45+45 = 280,
    // exp = 180*280/780, den = 230 - exp -> ari = (180-exp)/den
    val exp = 180.0 * 280.0 / 780.0
    val ari = BigDecimal((180.0 - exp) / (230.0 - exp))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m.getDouble(1) == ari, s"got ${m.get(1)}, want $ari")
    // V-measure trio, merge signature: V is determined by U (each U cell
    // maps wholly into one V cell) so completeness = 1 exactly, while
    // the merged V cell holds two U cells so homogeneity < 1
    assert(m.getDouble(4) == 1.0, s"merge keeps completeness 1: ${m.get(4)}")
    assert(m.getDouble(3) < 1.0, s"merge lowers homogeneity: ${m.get(3)}")
    assert(m.getDouble(5) > 0.0 && m.getDouble(5) < 1.0, s"V: ${m.get(5)}")
    assert(same.getDouble(5) == 1.0, "identical partitions: V = 1")
    // one-cluster degenerate: NULL, never NaN
    val one = Array(Array(1.0, 1.0, 1.0, 1.0))
    val d = Similarity.clusterAgreement(pts, "v", one, one).head()
    assert(d.isNullAt(1) && d.isNullAt(2), s"degenerate must be NULL: $d")
    assert(d.isNullAt(3) && d.isNullAt(4) && d.isNullAt(5),
      s"degenerate trio must be NULL: $d")
    // ONE-SIDED degeneracy (single cluster vs structured) is NULL too —
    // the formula limit is ~0 but the index is undefined by contract,
    // and the integer-exact max(marginal)==n test fires regardless of
    // float cancellation
    val d1 = Similarity.clusterAgreement(pts, "v", one, four).head()
    assert((1 to 5).forall(d1.isNullAt), s"one-sided degenerate: $d1")
    // n = 1: C(n,2) = 0 must yield NULL, never the NaN of 0/0
    val p1 = Seq((0L, Seq(10.0, 0.1, 0.1, 0.1))).toDF("id", "v")
    val dn = Similarity.clusterAgreement(p1, "v", four, four).head()
    assert(dn.getLong(0) == 1L && (1 to 5).forall(dn.isNullAt),
      s"n=1 must be NULL across all indices: $dn")
  }

  test("centroidOutliers flags the planted far vector, not the tight cluster") {
    import graft.operators.Similarity
    // 12 vectors hug (1,0); one sits far out on the same label. The
    // cluster's member distances have a tiny MAD, so the far point's
    // robust z explodes; the cluster itself stays unflagged.
    val tight = (0L until 12L).map(i =>
      (i, "a", Seq(1.0f + (i % 3) * 0.001f, (i % 2) * 0.001f)))
    val far = Seq((99L, "a", Seq(9.0f, 9.0f)))
    val df = (tight ++ far).toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(df, "vec_id", "label", "embedding")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(out(99L), "the planted far vector must flag")
    assert((0L until 12L).forall(!out(_)), "the tight cluster must not flag")
    // degenerate: all-identical vectors -> MAD 0 -> z NULL, nothing flags
    val const = (0L until 5L).map(i => (i, "b", Seq(1.0f, 2.0f)))
      .toDF("vec_id", "label", "embedding")
    val c = Similarity.centroidOutliers(const, "vec_id", "label", "embedding")
    assert(c.collect().forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("gramMatrix sums exact index-pair products; topComponent finds the planted axis") {
    import graft.operators.Similarity
    // two vectors: (1,2,0) and (3,0,4) -> X'X upper triangle by hand
    val vs = Seq((1L, Seq(1.0, 2.0, 0.0)), (2L, Seq(3.0, 0.0, 4.0)))
      .toDF("vec_id", "v")
    val g = Similarity.gramMatrix(vs, "v")
      .as[(Int, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(g == Map((0, 0) -> 10.0, (0, 1) -> 2.0, (0, 2) -> 12.0,
      (1, 1) -> 4.0, (1, 2) -> 0.0, (2, 2) -> 16.0), s"got $g")
    // dominant variance along axis 1: many (0, 10, 0)-ish vectors
    val pts = ((0 until 50).map(i => (i.toLong, Seq(0.1 * (i % 3), 10.0 + i % 2, 0.2))))
      .toDF("vec_id", "v")
    val top = Similarity.topComponent(pts, "v")
    assert(top.indices.maxBy(i => math.abs(top(i))) == 1 && top(1) > 0.99,
      s"top component ${top.toSeq}")
  }

  test("centroidDrift: planted axis shift yields the exact L2 shift and cosine") {
    import graft.operators.Similarity
    val a = Seq(("x", Seq(1.0f, 0.0f)), ("x", Seq(1.0f, 0.0f)), ("y", Seq(0.0f, 2.0f)))
      .toDF("label", "embedding")
    val b = Seq(("x", Seq(1.0f, 1.0f)), ("y", Seq(0.0f, 2.0f)))
      .toDF("label", "embedding")
    val out = Similarity.centroidDrift(a, b, "label", "embedding")
      .orderBy("label").as[(String, Double, Double, Long, Long)].collect()
    // x: centroids (1,0) vs (1,1) -> cos = 1/sqrt(2), shift = 1; y: unchanged
    assert(out(0) == (("x", 0.707107, 1.0, 2L, 1L)), s"got ${out(0)}")
    assert(out(1) == (("y", 1.0, 0.0, 1L, 1L)), s"got ${out(1)}")
  }

  test("skewReport ranks hot keys and sizes the salt by their multiple of the mean") {
    import graft.operators.Skew
    val rows = (Seq.fill(90)(1L) ++ (2L to 10L)).toDF("k")
    val out = Skew.skewReport(rows, "k", topN = 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.head == ((1L, 90L, math.rint(90.0 / 99 * 1e6) / 1e6, 10L)),
      s"got ${out.head}")
    // the cold keys suggest salt 1 (at the mean, ceil(10/11) rounds to 1)
    assert(out.tail.forall(r => r._2 == 1L && r._4 == 1L), s"got ${out.toSeq}")
    assert(out.length == 3)
  }

  test("logistic GD separates planted margin data and scores new points by the separator") {
    import graft.operators.Classifier
    // planted separator: y = [x1 > 1]; both classes offset from the
    // boundary by a margin of 1, plus an irrelevant noise dimension
    val train = (0 until 40).map { i =>
      val y = i % 2
      val x1 = if (y == 1) 2.0 + (i % 5) * 0.1 else -(i % 5) * 0.1
      (i.toLong, Seq(x1, (i % 7) * 0.3), y.toDouble)
    }.toDF("id", "x", "y")
    val w = Classifier.fitLogistic(train, "x", "y", iters = 60, lr = 5.0)
    val preds = Classifier.predictLogistic(train, "id", "x", w)
      .join(train, "id")
      .filter($"pred" =!= ($"y" === 1.0)).count()
    assert(preds == 0, s"training accuracy must be 1.0 (weights ${w.toSeq})")
    // the learned separator weights the signal dim far above the noise dim
    assert(math.abs(w(1)) > 3 * math.abs(w(2)), s"weights ${w.toSeq}")
    // unseen points score by margin sign
    val test = Seq((100L, Seq(5.0, 0.9)), (101L, Seq(-3.0, 0.9))).toDF("id", "x")
    val out = Classifier.predictLogistic(test, "id", "x", w)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map(100L -> true, 101L -> false))
  }

  test("count-min sketch: estimates are one-sided, exact when width avoids collisions") {
    import graft.operators.CountMin
    val data = (Seq.fill(50)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(7)(3L) ++
      (100L until 160L)).toDF("k")
    val keys = Seq(1L, 2L, 3L, 100L, 999L).toDF("k") // 999 never counted
    // wide sketch: 60-bit hashing over 4096 buckets makes collisions
    // among ~63 keys vanishingly unlikely -> estimates are exact
    val wide = CountMin.estimate(
      CountMin.sketch(data, "k", 4, 4096), keys, "k", 4, 4096)
      .as[(Long, Long)].collect().toMap
    assert(wide == Map(1L -> 50L, 2L -> 30L, 3L -> 7L, 100L -> 1L, 999L -> 0L))
    // narrow sketch: collisions can only INFLATE (one-sided error)
    val narrow = CountMin.estimate(
      CountMin.sketch(data, "k", 2, 8), keys, "k", 2, 8)
      .as[(Long, Long)].collect().toMap
    assert(narrow(1L) >= 50L && narrow(2L) >= 30L && narrow(3L) >= 7L)
    // sketches MERGE: union of shard sketches re-aggregated == whole
    val (s1, s2) = (data.filter($"k" <= 3L), data.filter($"k" > 3L))
    val merged = CountMin.sketch(s1, "k", 4, 64)
      .unionByName(CountMin.sketch(s2, "k", 4, 64))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = CountMin.sketch(data, "k", 4, 64)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty)
  }

  test("CMS inner product upper-bounds the equi-join size, exactly when collision-free") {
    import graft.operators.CountMin
    // A: key 1 x3, key 2 x2; B: key 1 x4, key 3 x5 -> true join = 3*4 = 12
    val a = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L)).toDF("k")
    val b = (Seq.fill(4)(1L) ++ Seq.fill(5)(3L)).toDF("k")
    def est(w: Int): Long = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "k", 4, w), CountMin.sketch(b, "k", 4, w))
      .head().getLong(0)
    assert(est(4096) == 12L, s"collision-free estimate must be exact, got ${est(4096)}")
    // tiny width: collisions only ever inflate
    assert(est(2) >= 12L)
  }

  test("kmeansFitDistributed recovers well-separated clusters and matches driver Lloyd") {
    import graft.operators.Similarity
    // three axis clusters with small jitter; ids interleave the clusters
    val pts = (0L until 30L).map { i =>
      val g = (i % 3).toInt
      val base = Array(0.0, 0.0, 0.0)
      base(g) = 5.0
      base((g + 1) % 3) = 0.01 * (i % 7)  // deterministic jitter
      (i, base.toSeq)
    }.toDF("vec_id", "v")
    val init = Array(Array(5.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 5.0))
    val fitted = Similarity.kmeansFitDistributed(pts, "v", init, iters = 3)
    val assigned = Similarity.kmeansAssign(pts, "vec_id", "v", fitted)
      .as[(Long, Int)].collect().toMap
    (0L until 30L).foreach { i =>
      assert(assigned(i) == (i % 3).toInt, s"vec $i -> ${assigned(i)}")
    }
    // centroids are unit vectors dominated by their axis
    fitted.zipWithIndex.foreach { case (c, g) =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
      assert(c(g) > 0.99, s"centroid $g = ${c.toSeq}")
    }
  }

  test("cosine: identical ~1, orthogonal 0, opposite -1") {
    val r = vecs.filter($"vec_id" === 0).crossJoin(
        vecs.select($"vec_id".as("id2"), $"embedding".as("e2")))
      .select($"id2", Similarity.cosine(
        Similarity.asDouble($"embedding"), Similarity.asDouble($"e2")).as("c"))
      .as[(Long, Double)].collect().toMap
    assert(r(0L) == 1.0)
    assert(math.abs(r(1L) - 1.0) < 1e-3)
    assert(r(2L) == 0.0)
    assert(r(3L) == -1.0)
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak, excludes self") {
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(top.map(_._2).toSeq == Seq(1L, 2L, 3L))
  }

  test("LSH buckets colocate a vector with its near-duplicate") {
    val top = Similarity.lshTopK(vecs, 4, 1, 4)
      .filter($"query_id" === 0).select("neighbor_id").as[Long].collect()
    assert(top.headOption.contains(1L))
  }

  test("lshTopK splits oversize buckets: candidates drop, near-dup recall survives") {
    // 1200 diverse pseudo-random 8-dim vectors with a DELIBERATELY coarse
    // 2-bit key (4 buckets/table): every bucket is oversize, the naive
    // self-join is ~n^2/4 per table.
    val dim = 8
    val base = spark.range(1200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        (xxhash64(concat_ws(":", col("id"), d)).cast("double") /
          lit(9.223372036854776e18)).cast("float")).as("embedding"))
    // planted twins for 40 of them at cosine ~1 (must survive refinement)
    val twins = base.filter(col("vec_id") < 40)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0f) + lit(0.001f) * sin(i.cast("double")).cast("float")))
          .as("embedding"))
    val corpus = base.unionByName(twins)
    val unbounded = Similarity.lshCandidates(
      corpus, dim, 2, 4, Int.MaxValue, "vec_id", "embedding").count()
    val bounded = Similarity.lshCandidates(
      corpus, dim, 2, 4, 64, "vec_id", "embedding").count()
    // refinement must cut the candidate square by a large factor
    assert(bounded < unbounded / 4,
      s"bounded=$bounded not << unbounded=$unbounded")
    // and the planted rank-1 twins are still found under refinement
    val top1 = Similarity.lshTopK(corpus, dim, 1, 2, 4, 64)
      .filter(col("rank") === 1 && col("query_id") < 40)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val found = (0L until 40L).count(q => top1.get(q).contains(q + 100000L))
    assert(found >= 38, s"twin recall $found/40 under refinement")
  }
}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token counts") {
    val df = Seq(("Hello, world! 42 times.")).toDF("text")
    val r = df.select(
      TextAnalysis.wsTokenCount($"text").as("ws"),
      TextAnalysis.bpeishTokenCount($"text").as("bpe"),
      size(TextAnalysis.tokens($"text")).as("toks")).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getInt(2) == 4) // hello, world, 42, times
  }

  test("langId picks the language with most stopword markers") {
    val df = Seq(
      (1L, "the cat and the dog went to the house of friends"),
      (2L, "der Hund und die Katze sind nicht in der Schule"),
      (3L, "el perro y la casa es una maravilla que parece"),
      (4L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val r = TextAnalysis.langId(df, "text").select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "en")
    assert(r(2L) == "de")
    assert(r(3L) == "es")
    assert(r(4L) == "und")
  }

  test("fingerprint is whitespace/case-invariant") {
    val df = Seq(("  The   Quick\tFox  ", "the quick fox")).toDF("a", "b")
    val r = df.select((TextAnalysis.fingerprint($"a") === TextAnalysis.fingerprint($"b")).as("eq"))
      .as[Boolean].collect()(0)
    assert(r)
  }

  test("skipGrams emits right-context pairs within the window, linear (one Window op)") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.skipGrams(docs, "text", "doc_id", window = 2)
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("a", "b", 2L),   // doc 1 and doc 2
      ("a", "c", 1L),
      ("b", "c", 1L), ("b", "d", 1L),
      ("c", "d", 1L)))
    // all lead() offsets share one Window operator: a single sort pass
    val plan = TextAnalysis.skipGrams(docs, "text", "doc_id", window = 4)
      .queryExecution.executedPlan.toString
    assert(plan.split("Window ").length == 2, s"expected one Window operator:\n$plan")
  }

  test("BPE trains the hand-computed merge sequence and encodes greedily") {
    import graft.operators.Bpe
    // word counts: "aa" x3, "ab" x1 -> pair (a,a)=3 wins merge 0;
    // then only "ab" has a pair -> merge 1 = (a,b)
    val docs = Seq((1L, "aa aa"), (2L, "aa ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 5) // asks for 5, corpus yields 2
    assert(merges.map(m => (m.rank, m.left, m.right)) ==
      Seq((0, "a", "a"), (1, "a", "b")))
    // encode: "aab" -> [a,a,b] -> merge0 -> [aa, b] (no (aa,b) merge) = 2 pieces;
    // "aa" -> 1 piece; "ba" has no applicable merge -> 2 pieces
    val out = Bpe.encode(Seq((7L, "aab aa ba")).toDF("doc_id", "text"),
        "text", "doc_id", merges)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((7L, 3L, 5L)))
    // ties break lexicographically: "xy" x2 vs "xz" x2 -> (x,y) first
    val tie = Bpe.train(Seq((1L, "xy xy xz xz")).toDF("doc_id", "text"), "text", 1)
    assert(tie.head.left == "x" && tie.head.right == "y")
  }

  test("BPE merge table save/load round-trips and encodes identically") {
    import graft.operators.Bpe
    val docs = Seq((1L, "aa aa"), (2L, "aa ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", 5)
    val dir = java.nio.file.Files.createTempDirectory("bpemodel").toString
    Bpe.saveMerges(spark, merges, s"$dir/merges")
    val loaded = Bpe.loadMerges(spark, s"$dir/merges")
    assert(loaded.map(m => (m.rank, m.left, m.right)) ==
      merges.map(m => (m.rank, m.left, m.right)))
    val probe = Seq((7L, "aab aa ba")).toDF("doc_id", "text")
    val a = Bpe.encode(probe, "text", "doc_id", merges).collect().toSeq
    val b = Bpe.encode(probe, "text", "doc_id", loaded).collect().toSeq
    assert(a == b)
  }

  test("BPE train vocabulary bound: floor/cap below the true vocab are no-ops; " +
       "an active floor drops tail words before the collect") {
    import graft.operators.Bpe
    // vocab: "aa" x3, "ab" x2, "zq" x1 (the junk tail)
    val docs = Seq((1L, "aa aa ab"), (2L, "aa ab zq")).toDF("doc_id", "text")
    val unbounded = Bpe.train(docs, "text", 5)
    // floor below true min frequency + cap above true vocab => identical merges
    val bounded = Bpe.train(docs, "text", 5, minCount = 1L, maxVocab = 100)
    assert(bounded == unbounded)
    // an active floor (>=2) removes "zq" from the driver table: merges
    // are now learned from {aa x3, ab x2} only, so the tail-word merge
    // (z,q) — which the unbounded run picks up once the frequent pairs
    // are exhausted — correctly disappears, and the frequent-pair
    // merges are untouched
    val floored = Bpe.train(docs, "text", 5, minCount = 2L)
    assert(floored == unbounded.take(2))
    assert(floored.map(m => (m.left, m.right)) == Seq(("a", "a"), ("a", "b")))
    // cap=1 keeps only "aa" (top by count): the sole learnable merge is (a,a)
    val capped = Bpe.train(docs, "text", 5, maxVocab = 1)
    assert(capped.map(m => (m.left, m.right)) == Seq(("a", "a")))
  }

  test("contaminationMatrix counts shared distinct n-grams per group pair") {
    val shared = "alpha beta gamma delta epsilon zeta"   // 2 distinct 5-grams
    val docs = Seq(
      (1L, "a", shared),
      (2L, "a", "one two three four five six"),          // 2 grams, a-only
      (3L, "b", shared),                                  // leaks into b
      (4L, "b", "red green blue cyan magenta"),           // 1 gram (5 tokens)
      (5L, "c", "totally different text here now")        // no overlap
    ).toDF("doc_id", "src", "text")
    val out = TextAnalysis.contaminationMatrix(docs, "text", "src", 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // a: 4 distinct grams, b: 3, shared(a,b) = 2 -> overlap 2/3
    val ab = out(("a", "b"))
    assert(ab._3 == 2L && ab._4 == 4L && ab._5 == 3L)
    assert(math.abs(ab._6 - 2.0 / 3.0) < 1e-12)
    // no row for pairs with zero shared grams
    assert(!out.contains(("a", "c")) && !out.contains(("b", "c")))
  }

  test("gopherRules gates each documented failure mode") {
    val good = (("the data and results show that we have measured " * 8) +
      "a clear effect with strong confidence in every trial we ran").trim
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to keep"),                   // r_word_count
      (3L, ("- item one\n" * 10).trim),            // bullet lines + word count
      (4L, good + (" ###### ##### ####" * 30)),    // symbol ratio
      (5L, null.asInstanceOf[String]))             // null text: keep = false
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs, "text")
      .select("doc_id", "keep", "r_word_count", "r_symbol", "r_bullet")
      .collect().map(x => x.getLong(0) ->
        (x.getBoolean(1), x.isNullAt(2) || x.getBoolean(2),
         x.isNullAt(3) || x.getBoolean(3), x.isNullAt(4) || x.getBoolean(4)))
      .toMap
    assert(r(1L)._1)                               // good doc kept
    assert(!r(2L)._1 && !r(2L)._2)                 // short doc fails word count
    assert(!r(3L)._1 && !r(3L)._4)                 // bullet doc fails bullet rule
    assert(!r(4L)._1 && !r(4L)._3)                 // symbol doc fails symbol rule
    assert(!r(5L)._1)                              // null text never kept
  }

  test("winnowing fingerprints overlap heavily for locally-edited text") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "the quick brown fox jumps over the lazy cat and runs far away home"
    val df = Seq((a, b)).toDF("a", "b")
    val r = df.select(
      size(array_intersect(TextAnalysis.winnowingFingerprint($"a"),
        TextAnalysis.winnowingFingerprint($"b"))).as("common"),
      size(TextAnalysis.winnowingFingerprint($"a")).as("total")).collect()(0)
    assert(r.getInt(0) > r.getInt(1) / 2)
  }
}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("binary payload plumbing + stub decode schema and determinism") {
    val df = Seq((7L, "abcdef")).toDF("doc_id", "text")
    val out = Multimodal.decodeImageMeta(Multimodal.withPayload(df, "text")).collect()(0)
    assert(out.getLong(0) == 7L)
    assert(out.getInt(1) == 6)
    assert(out.getString(2) == "61626364") // 'abcd'
    assert(out.getInt(3) == 6 && out.getInt(4) == 42 && out.getInt(5) == 7)
  }

  test("binary column round-trips through parquet") {
    val df = Multimodal.withPayload(Seq((1L, "xyz")).toDF("doc_id", "text"), "text")
    val path = java.nio.file.Files.createTempDirectory("mm").toString + "/t.parquet"
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(new String(back.select("payload").collect()(0).getAs[Array[Byte]](0)) == "xyz")
  }

  test("real pixel decode: perceptual hashes invariant under resize and re-encode") {
    val docs = (1L to 8L).flatMap { d =>
      val orig = Multimodal.syntheticImage(d)
      Seq(
        (d, orig),
        (d + 100L, Multimodal.resizeImage(orig, 18, 16)), // cell-aligned resize
        (d + 200L, Multimodal.syntheticImage(d, "bmp")),  // container re-encode
        (d + 300L, Multimodal.syntheticImage(d, "gif")))  // palette re-encode
    }
    val out = Multimodal.decodeImage(docs.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5))).toMap
    (1L to 8L).foreach { d =>
      val (fmt, w, h, a0, d0) = out(d)
      assert(fmt == "png" && w == 36 && h == 32)
      assert(out(d + 100L)._2 == 18 && out(d + 100L)._3 == 16)
      // dHash exactly preserved: the pattern is piecewise-constant on
      // the 9-column dHash grid, so cell-aligned downsample and
      // lossless re-encode cannot move a bit. aHash's 8-column grid
      // does NOT align with the 9-column pattern cells, so resize only
      // keeps it CLOSE (mean-threshold bits near the mean can flip) —
      // the realistic property; re-encodes are pixel-identical, exact.
      Seq(100L, 200L, 300L).foreach { off =>
        assert(out(d + off)._5 == d0, s"dhash drift at doc $d +$off")
      }
      assert(java.lang.Long.bitCount(out(d + 100L)._4 ^ a0) <= 8,
        s"ahash too far after resize at doc $d")
      Seq(200L, 300L).foreach { off =>
        assert(out(d + off)._4 == a0, s"ahash drift at doc $d +$off")
      }
      assert(out(d + 200L)._1 == "bmp" && out(d + 300L)._1 == "gif")
    }
    // unrelated images are FAR apart: independent doc seeds
    val hams = for (x <- 1L to 8L; y <- 1L until x) yield
      java.lang.Long.bitCount(out(x)._5 ^ out(y)._5)
    assert(hams.forall(_ > 10), s"unrelated dHash too close: ${hams.min}")
  }

  test("header-parse and pixel-decode agree on dimensions") {
    val docs = Seq((1L, Multimodal.syntheticImage(5L)),
      (2L, Multimodal.syntheticImage(5L, "bmp")),
      (3L, Multimodal.syntheticImage(5L, "gif")))
    docs.foreach { case (_, bytes) =>
      val hdr = graft.operators.ImageHeader.parse(bytes)
      assert(hdr.isDefined)
    }
    val px = Multimodal.decodeImage(docs.toDF("doc_id", "payload")).collect()
    px.foreach { r =>
      val bytes = docs.find(_._1 == r.getLong(0)).get._2
      val Some((fmt, w, h)) = graft.operators.ImageHeader.parse(bytes)
      assert(r.getString(1) == fmt && r.getInt(2) == w && r.getInt(3) == h)
    }
  }

  test("undecodable payloads yield NULL hashes, not task failures") {
    val docs = Seq((1L, "definitely not an image".getBytes("UTF-8")),
      (2L, Array.empty[Byte]),
      (3L, Multimodal.syntheticImage(9L).take(20))) // truncated PNG
    val out = Multimodal.decodeImage(docs.toDF("doc_id", "payload")).collect()
    assert(out.length == 3)
    out.foreach(r => assert(r.isNullAt(4) && r.isNullAt(5), s"doc ${r.getLong(0)}"))
  }

  test("image near-dup pairs: planted resized twins found, unrelated not") {
    val docs = (1L to 10L).flatMap { d =>
      val orig = Multimodal.syntheticImage(d)
      Seq((d, orig), (d + 1000L, Multimodal.resizeImage(orig, 18, 16)))
    }
    val pairs = Dedup.hammingPairs(
        Multimodal.imagePHash(docs.toDF("doc_id", "payload")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L to 10L).map(d => (d, d + 1000L)).toSet)
  }

  test("pixel verify separates true twins from designed dHash collisions") {
    val d = 42L
    val orig = Multimodal.syntheticImage(d)
    val twin = Multimodal.resizeImage(orig, 18, 16)
    val decoy = Multimodal.syntheticImageShifted(d, 40)
    val imgs = Seq((1L, orig), (2L, twin), (3L, decoy)).toDF("doc_id", "payload")
    // the decoy is a REAL collision: both perceptual hashes identical
    val hashes = Multimodal.decodeImage(imgs).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5))).toMap
    assert(hashes(1L) == hashes(3L), "decoy must collide in aHash AND dHash")
    val cand = Dedup.hammingPairs(Multimodal.imagePHash(imgs))
    assert(cand.count() == 3) // all three pairs at Hamming 0
    val verified = Multimodal.verifyImagePairs(cand, imgs, 10.0).collect()
    assert(verified.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(verified(0).getDouble(2) == 0.0)
    // the decoy pairs sit at exactly the planted +40 distance
    val all = Multimodal.verifyImagePairs(cand, imgs, 1000.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(all((1L, 3L)) == 40.0 && all((2L, 3L)) == 40.0)
    // an undecodable side drops the pair, never crashes the stage
    val broken = Seq((1L, orig), (2L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val pair = Seq((1L, 2L)).toDF("id1", "id2")
    assert(Multimodal.verifyImagePairs(pair, broken, 1000.0).count() == 0)
  }

  test("real PCM decode: envelope hash invariant under resample and volume") {
    val docs = (1L to 8L).flatMap { d =>
      val orig = Multimodal.syntheticWav(d)
      // volume-halved re-encode: parse, scale samples, rebuild
      val Some((_, rate, samples)) = Multimodal.parsePcm16(orig)
      val half = {
        val pcm = samples.map(s => (s / 2).toShort)
        val buf = java.nio.ByteBuffer.allocate(44 + pcm.length * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + pcm.length * 2)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
          .putShort(2).putShort(16)
          .put("data".getBytes("US-ASCII")).putInt(pcm.length * 2)
        pcm.foreach(buf.putShort)
        buf.array()
      }
      Seq((d, orig), (d + 100L, Multimodal.resampleWav(orig, 2)),
        (d + 200L, Multimodal.resampleWav(orig, 4)), (d + 300L, half))
    }
    val out = Multimodal.decodeAudio(docs.toDF("doc_id", "payload"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    (1L to 8L).foreach { d =>
      val (ch, rate, n, h) = out(d)
      assert(ch == 1 && rate == 8000 && n == 3200)
      assert(out(d + 100L)._2 == 4000 && out(d + 100L)._3 == 1600)
      Seq(100L, 200L, 300L).foreach { off =>
        assert(out(d + off)._4 == h, s"envelope drift at doc $d +$off")
      }
    }
    val hams = for (x <- 1L to 8L; y <- 1L until x) yield
      java.lang.Long.bitCount(out(x)._4 ^ out(y)._4)
    assert(hams.forall(_ > 10), s"unrelated envelopes too close: ${hams.min}")
  }

  test("audio header-parse and PCM decode agree; junk bytes yield NULLs") {
    val wav = Multimodal.syntheticWav(3L)
    val Some(("wav", ch, rate, ms)) = graft.operators.AudioHeader.parse(wav)
    val row = Multimodal.decodeAudio(Seq((1L, wav)).toDF("doc_id", "payload"))
      .collect()(0)
    assert(row.getInt(1) == ch && row.getInt(2) == rate)
    assert(ms == row.getInt(3).toLong * 1000 / rate)
    val junk = Multimodal.decodeAudio(Seq(
      (1L, "not audio at all".getBytes("UTF-8")),
      (2L, wav.take(30))).toDF("doc_id", "payload")).collect()
    junk.foreach(r => assert(r.isNullAt(4), s"doc ${r.getLong(0)}"))
  }

  test("audio near-dup pairs: planted resampled twins found, unrelated not") {
    val docs = (1L to 10L).flatMap { d =>
      val orig = Multimodal.syntheticWav(d)
      Seq((d, orig), (d + 1000L, Multimodal.resampleWav(orig, 2)))
    }
    val pairs = Dedup.hammingPairs(
        Multimodal.audioPHash(docs.toDF("doc_id", "payload")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (1L to 10L).map(d => (d, d + 1000L)).toSet)
  }
}

class StreamingSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  test("streaming hourly counts with watermark match the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = graft.streaming.EventsOps.streamingHourlyCounts(events, "1 hour")
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.5),
        (ts("2024-01-01 10:55:00"), "click", 2.5),
        (ts("2024-01-01 11:05:00"), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM hourly ORDER BY hour_start, event_type")
        .select($"event_type", $"n_events", $"sum_value").as[(String, Long, Double)].collect()
      assert(rows.toSeq == Seq(("click", 2L, 4.0), ("view", 1L, 4.0)))
      // batch parity
      val batch = graft.streaming.EventsOps.hourlyCounts(
        Seq((ts("2024-01-01 10:05:00"), "click", 1.5),
          (ts("2024-01-01 10:55:00"), "click", 2.5),
          (ts("2024-01-01 11:05:00"), "view", 4.0)).toDF("ts", "event_type", "value"))
        .select($"event_type", $"n_events", $"sum_value")
        .orderBy("event_type").as[(String, Long, Double)].collect()
      assert(batch.toSeq == Seq(("click", 2L, 4.0), ("view", 1L, 4.0)))
    } finally q.stop()
  }
}

class StreamingSessionizeSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  test("stateful streaming sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = graft.streaming.StreamingSessionize(events, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // user 1: two events 10 min apart (one session), then one 2h later
      // (closes session 1); user 2: single event then long silence
      mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:10:00"), 1L))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 12:10:00"), 1L))
      q.processAllAvailable()
      val closed = spark.sql("SELECT * FROM sessions").as[graft.streaming.SessionOut].collect()
      assert(closed.length == 1)
      val s = closed(0)
      assert(s.user_id == 1L && s.session_id == 1L && s.n_events == 2L)
      assert(s.session_start == ts("2024-01-01 10:00:00") && s.session_end == ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }
}

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before left time, per key") {
    val trades = Seq(("A", 10, "t1"), ("A", 25, "t2"), ("B", 5, "t3"), ("A", 3, "t0"))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq(("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0))
      .toDF("sym", "t", "px")
    val out = operators.AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t")
      .select($"trade_id", $"asof_t", $"px").collect()
      .map(r => r.getString(0) -> ((if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap
    assert(out("t1") == ((10, 101.0)))  // equal time matches (inclusive)
    assert(out("t2") == ((20, 102.0)))  // latest at-or-before 25
    assert(out("t3") == ((-1, -1.0)))   // B@5: no quote at-or-before -> nulls
    assert(out("t0") == ((-1, -1.0)))   // A@3: before first quote
  }
}

class GraftFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("all graft functions are callable from SQL") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql("""
      SELECT
        get_row_hash(named_struct('a', 1)) AS h,
        cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
        dot_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS dp,
        array_jaccard_sim(array('a','b'), array('b','c')) AS j,
        sorted_jaccard_sim(array('a','b'), array('b','c')) AS sj,
        token_set('B a a c') AS ts,
        token_array('B a a c') AS ta,
        word_shingles('one two three four', 3) AS ws,
        size(minhash_signature(array('x','y'), 16)) AS mh,
        simhash64(array('x','y')) AS sh,
        sorted_containment_sim(array('a','b'), array('a','b','c')) AS cont
      """).collect()(0)
    assert(r.getString(0).length == 16)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 23.0)
    assert(r.getDouble(3) == 1.0 / 3.0 && r.getDouble(4) == 1.0 / 3.0)
    assert(r.getSeq[String](5) == Seq("a", "b", "c"))
    assert(r.getSeq[String](6) == Seq("b", "a", "a", "c"))
    assert(r.getSeq[String](7) == Seq("one two three", "two three four"))
    assert(r.getInt(8) == 16)
    assert(r.getDouble(10) == 1.0)
  }

  test("GraftExtensions registers every function builder") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions {}
    new graft.functions.GraftExtensions().apply(ext) // must not throw
    assert(graft.functions.GraftFunctions.all.map(_._1).distinct.size ==
      graft.functions.GraftFunctions.all.size)
  }
}

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  test("components via driver union-find (small graph) and iterative propagation agree") {
    val pairs = Seq((2L, 4L), (1L, 2L), (7L, 9L), (9L, 8L)).toDF("id1", "id2")
    val expected = Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 7L)
    val viaUnionFind = operators.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val viaPropagation = operators.Dedup.connectedComponents(pairs, smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaUnionFind == expected)
    assert(viaPropagation == expected)
  }

  test("dedupCorpus keeps one doc per near-dup cluster plus singletons") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (4L, "something entirely different about catalyst expression codegen paths")
    ).toDF("doc_id", "text")
    val kept = operators.Dedup.dedupCorpus(docs, "text", "doc_id", 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L))
  }
}

/** Planted-duplicate recall harnesses: inject near-dups with controlled
  * similarity and assert the sketch operators recover them (the analytic
  * miss probabilities at these operating points are < 1e-12, and the
  * seeded hashes make each outcome deterministic).
  */
class PlantedRecallSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(7L)
  private def word(i: Int, j: Int) = s"w${i}x$j"

  // 120 docs of 30 doc-unique tokens: cross-doc shingle Jaccard is 0.
  private lazy val planted = {
    val base = (0 until 120).map(i => (i.toLong, (0 until 30).map(j => word(i, j)).mkString(" ")))
    // twin = doc minus its last token => shingle J = (S-1)/S = 27/28 ~ 0.96
    val twins = base.map { case (id, text) =>
      (id + 1000L, text.split(" ").dropRight(1).mkString(" "))
    }
    (base ++ twins).toDF("doc_id", "text")
  }

  test("minhash LSH planted recall at J~0.96 is total, with zero false pairs") {
    val pairs = operators.Dedup.minHashLshPairs(planted, "text", "doc_id", 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val expected = (0 until 120).map(i => (i.toLong, i + 1000L)).toSet
    assert(pairs == expected)
  }

  test("simhash quarter blocking equals the brute-force Hamming<=3 scan") {
    val sigs = planted.select($"doc_id",
      functions.SimHash64(functions.TokenArray($"text")).as("sig"))
    val l = sigs.select($"doc_id".as("id1"), $"sig".as("s1"))
    val r = sigs.select($"doc_id".as("id2"), $"sig".as("s2"))
    val truth = l.crossJoin(r).filter($"id1" < $"id2")
      .filter(bit_count($"s1".bitwiseXOR($"s2")) <= 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val blocked = operators.Dedup.simHashPairs(planted, "text", "doc_id", 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(blocked == truth)
  }

  test("multi-table LSH ANN: planted high-cosine twin is every vector's rank-1") {
    val base = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq)
    }
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.zipWithIndex.map { case (x, j) =>
        (x * (1.0 + 0.02 * math.sin(j + id))).toFloat })
    }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val top1 = operators.Similarity.lshTopK(df, 64, 1, 8, 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0 until 100).foreach { i =>
      assert(top1(i.toLong) == i + 1000L, s"query $i")
      assert(top1(i + 1000L) == i.toLong, s"twin of $i")
    }
  }
}

class PpjoinSpec extends SparkSpecBase {
  import spark.implicits._

  // one shared block; several planted near-dup pairs among unrelated docs
  private lazy val corpus = {
    val uniq = (0 until 150).map(i =>
      (i.toLong, "en", (0 until 20).map(j => s"u${i}w$j").mkString(" ")))
    val dups = (0 until 10).flatMap { i =>
      val text = (0 until 20).map(j => s"d${i}w$j").mkString(" ")
      Seq((1000L + i, "en", text), (2000L + i, "en", text + " extra"))
    }
    (uniq ++ dups).toDF("doc_id", "lang", "text")
  }

  private def naivePairs = {
    val toks = corpus.select($"doc_id", $"lang", functions.TokenSet($"text").as("t"))
    toks.select($"doc_id".as("id1"), $"lang", $"t".as("t1"))
      .join(toks.select($"doc_id".as("id2"), $"lang", $"t".as("t2")), Seq("lang"))
      .filter($"id1" < $"id2")
      .withColumn("jaccard", functions.SortedJaccardSim($"t1", $"t2"))
      .filter($"jaccard" >= 0.9)
      .select("id1", "id2", "jaccard")
  }

  test("ppjoin jaccardPairs output equals the naive all-pairs formulation") {
    val pp = operators.Dedup.jaccardPairs(corpus, "text", "doc_id", Seq("lang"), 0.9)
      .as[(Long, Long, Double)].collect().toSet
    val naive = naivePairs.as[(Long, Long, Double)].collect().toSet
    assert(pp == naive)
    assert(pp.size == 10) // exactly the planted pairs
  }

  test("ppjoin boundary threshold: j == t exactly, prefix keeps the needed token") {
    // 4/5-overlap docs at t = 0.8: (1-t)*|x| is 0.9999... in doubles, so
    // the old floor((1-t)|x|)+1 prefix length dropped to 1 and LOST this
    // pair; the ceil form keeps the 2 needed prefix tokens
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta epsilon"),
      (2L, "en", "alpha beta gamma delta zeta"),
      (3L, "en", "totally different words here five"))
      .toDF("doc_id", "lang", "text")
    // jaccard(1,2) = 4/6 < 0.8, so use containment-free check through the
    // candidate generator directly: the (1,2) candidate must survive
    val cand = operators.Dedup
      .ppjoinCandidates(docs, "text", "doc_id", Seq("lang"), 0.8)
      .select("id1", "id2").distinct()
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)),
      s"boundary-threshold candidate (1,2) missing from $cand")
  }

  test("prefix filtering generates far fewer candidates than block-square") {
    val nDocs = corpus.count()
    val blockSquare = nDocs * (nDocs - 1) / 2 // one shared block
    val candidates = operators.Dedup
      .ppjoinCandidates(corpus, "text", "doc_id", Seq("lang"), 0.9)
      .select("id1", "id2").distinct().count()
    assert(candidates < blockSquare / 10,
      s"candidates=$candidates vs blockSquare=$blockSquare")
    // and the candidate set still covers every true pair
    assert(candidates >= 10)
  }
}

class LshIndexSpec extends SparkSpecBase {
  import spark.implicits._

  test("persisted LSH index round trip reproduces direct incrementalDedup") {
    val mk = (id: Long, toks: Seq[String]) => (id, toks.mkString(" "))
    val corpus = Seq(
      mk(1L, (0 until 30).map(i => s"c1w$i")),
      mk(2L, (0 until 30).map(i => s"c2w$i")),
      mk(3L, (0 until 30).map(i => s"c3w$i"))).toDF("doc_id", "text")
    val batch = Seq(
      mk(10L, (0 until 29).map(i => s"c1w$i")),          // near-dup of 1
      mk(11L, (0 until 30).map(i => s"novel$i"))) // novel
      .toDF("doc_id", "text")
    val direct = graft.operators.Dedup
      .incrementalDedup(batch, corpus, "text", "doc_id", 0.5)
      .as[(Long, Option[Long], Option[Double], Boolean)].collect().sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("lshidx").toString
    graft.operators.Dedup.saveLshIndex(
      graft.operators.Dedup.buildLshIndex(corpus, "text", "doc_id"), path)
    val loaded = graft.operators.Dedup.loadLshIndex(spark, path)
    assert(loaded.numPerm == 128 && loaded.bands == 32,
      "banding parameters must survive the round trip")
    val viaIndex = graft.operators.Dedup
      .dedupAgainstIndex(batch, "text", "doc_id", 0.5, loaded)
      .as[(Long, Option[Long], Option[Double], Boolean)].collect().sortBy(_._1).toSeq
    assert(viaIndex == direct, s"index path $viaIndex != direct $direct")
    assert(direct.find(_._1 == 10L).exists(r => r._2.contains(1L) && !r._4),
      s"batch doc 10 must match corpus doc 1: $direct")
    assert(direct.find(_._1 == 11L).exists(_._4), "doc 11 must be novel")
  }
}

class DedupCorpusNullSpec extends SparkSpecBase {
  import spark.implicits._

  test("dedupCorpus keeps every null-text doc (nulls are not duplicates of each other)") {
    val docs = Seq(
      (1L, Option("the same text here repeated words")),
      (2L, Option("the same text here repeated words")), // exact dup of 1
      (3L, None: Option[String]),
      (4L, None: Option[String])).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.dedupCorpus(docs, "text", "doc_id", 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }
}

class ImageHeaderSpec extends SparkSpecBase {
  import graft.operators.ImageHeader
  import spark.implicits._

  private def png(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(24)
    b.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    b.array()
  }

  private def gif(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
    b.array()
  }

  private def bmp(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("BM".getBytes).position(14)
    b.putInt(40) // BITMAPINFOHEADER size field
    b.putInt(w).putInt(h)
    b.array()
  }

  private def jpeg(w: Int, h: Int): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(32)
    b.put(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    b.put(Array(0xFF, 0xE0).map(_.toByte)).putShort(4).putShort(0) // APP0 len 4
    b.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(11) // SOF0
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort).put(3.toByte)
    b.array()
  }

  test("parses PNG/GIF/BMP/JPEG dimensions from real headers") {
    assert(ImageHeader.parse(png(640, 480)) == Some(("png", 640, 480)))
    assert(ImageHeader.parse(gif(320, 200)) == Some(("gif", 320, 200)))
    assert(ImageHeader.parse(bmp(1024, 768)) == Some(("bmp", 1024, 768)))
    assert(ImageHeader.parse(jpeg(800, 600)) == Some(("jpeg", 800, 600)))
    // negative BMP height (top-down) normalizes
    assert(ImageHeader.parse(bmp(10, -20)) == Some(("bmp", 10, 20)))
    // garbage and truncation are safely rejected
    assert(ImageHeader.parse("not an image at all".getBytes).isEmpty)
    assert(ImageHeader.parse(png(1, 1).take(10)).isEmpty)
    assert(ImageHeader.parse(Array[Byte]()).isEmpty)
  }

  test("JPEG 0xFF fill padding before markers does not desync the segment walk") {
    // SOI, then an APP0 whose marker is padded with extra 0xFF fill bytes,
    // then a padded SOF0 — per the JPEG spec markers may be preceded by
    // any number of 0xFF fill bytes
    val b = java.nio.ByteBuffer.allocate(40)
    b.put(Array(0xFF, 0xD8).map(_.toByte)) // SOI
    b.put(Array(0xFF, 0xFF, 0xFF, 0xE0).map(_.toByte)).putShort(4).putShort(0) // padded APP0
    b.put(Array(0xFF, 0xFF, 0xC0).map(_.toByte)).putShort(11) // padded SOF0
    b.put(8.toByte).putShort(600.toShort).putShort(800.toShort).put(3.toByte)
    assert(ImageHeader.parse(b.array()) == Some(("jpeg", 800, 600)))
    // a stuffed byte (FF 00) in the header section is corrupt -> reject
    val stuffed = Array(0xFF, 0xD8, 0xFF, 0x00, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(ImageHeader.parse(stuffed).isEmpty)
    // a segment length < 2 (length includes itself) is corrupt -> reject
    val shortLen = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x01, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(ImageHeader.parse(shortLen).isEmpty)
  }

  test("BMP BITMAPCOREHEADER (DIB size 12) parses 16-bit dimensions") {
    val b = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("BM".getBytes).position(14)
    b.putInt(12).putShort(320.toShort).putShort(240.toShort)
    assert(ImageHeader.parse(b.array()) == Some(("bmp", 320, 240)))
    // an impossible DIB size (e.g. 3) is rejected, not misparsed
    val bad = java.nio.ByteBuffer.allocate(26).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.put("BM".getBytes).position(14)
    bad.putInt(3).putInt(320).putInt(240)
    assert(ImageHeader.parse(bad.array()).isEmpty)
  }

  test("parses WAV channels/rate/duration from a RIFF header") {
    import graft.operators.AudioHeader
    def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
      val byteRate = rate * channels * bits / 8
      val b = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(rate).putInt(byteRate)
        .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      b.put("data".getBytes).putInt(dataBytes)
      b.array()
    }
    // 16kHz mono 16-bit, 32000 bytes of data = 1000 ms
    assert(AudioHeader.parse(wav(1, 16000, 16, 32000)) == Some(("wav", 1, 16000, 1000L)))
    // stereo 44.1kHz: 176400 bytes/s -> 88200 bytes = 500 ms
    assert(AudioHeader.parse(wav(2, 44100, 16, 88200)) == Some(("wav", 2, 44100, 500L)))
    assert(AudioHeader.parse("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(AudioHeader.parse("definitely not audio".getBytes).isEmpty)
    assert(AudioHeader.parse(Array[Byte]()).isEmpty)
  }

  test("malformed RIFF chunk sizes terminate (no unsigned-overflow hang)") {
    import graft.operators.AudioHeader
    // a chunk size of 0xFFFFFFF8 once made the Int step wrap to exactly 0,
    // wedging the walk forever; 0xFFFFFFF7 wrapped it negative
    for (evil <- Seq(0xFFFFFFF8, 0xFFFFFFF7, 0xFFFFFFFF, Int.MinValue)) {
      val b = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(56).put("WAVE".getBytes)
      b.put("junk".getBytes).putInt(evil)
      val done = scala.concurrent.Future(AudioHeader.parse(b.array()))(
        scala.concurrent.ExecutionContext.global)
      val res = scala.concurrent.Await.result(
        done, scala.concurrent.duration.Duration(5, "s"))
      assert(res.isEmpty)
    }
  }

  test("decodeImageMeta extracts REAL dimensions for recognized payloads via mapPartitions") {
    val df = Seq(
      (1L, png(111, 222)),
      (2L, "plain text payload".getBytes)).toDF("doc_id", "payload")
    val out = graft.operators.Multimodal.decodeImageMeta(df)
      .select("doc_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(out.head == ((1L, 111, 222, 1))) // real header wins
    val stub = out(1) // unrecognized -> deterministic stub
    assert(stub._2 == "plain text payload".getBytes.length % 640)
  }
}

class HllSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Hll

  test("registers are dense (2^p rows) and merge is the bucketwise max") {
    val a = (0L until 300L).toDF("k")
    val b = (200L until 500L).toDF("k")
    val ra = Hll.registers(a, "k")
    assert(ra.count() == 64 && ra.select("bucket").distinct().count() == 64)
    // merging with itself is the identity
    val self = Hll.merge(ra, ra).orderBy("bucket").collect().toSeq
    assert(self == ra.orderBy("bucket").collect().toSeq)
    // union sketch == sketch of the union
    val ru = Hll.merge(ra, Hll.registers(b, "k"))
    val direct = Hll.registers(a.unionByName(b), "k")
    assert(ru.orderBy("bucket").collect().toSeq ==
      direct.orderBy("bucket").collect().toSeq)
  }

  test("estimate lands within HLL error on a planted set; overlap brackets the truth") {
    val n = 5000L
    val est = Hll.estimate(Hll.registers((0L until n).toDF("k"), "k"))
      .as[Double].collect()(0)
    // m=64 -> rel std err ~1.04/8 = 13%; 3 sigma bound, deterministic seed
    assert(math.abs(est - n) / n < 0.4, s"est $est for true $n")
    // A = [0, 3000), B = [1500, 4500): true intersection 1500, union 4500
    val out = Hll.overlap((0L until 3000L).toDF("k"),
      (1500L until 4500L).toDF("k"), "k").collect()(0)
    val estU = out.getAs[Double]("est_union")
    val estI = out.getAs[Double]("est_intersect")
    assert(math.abs(estU - 4500) / 4500 < 0.4, s"union $estU")
    // inclusion-exclusion compounds three 13%-sigma estimates; wide bracket
    assert(estI > 0 && math.abs(estI - 1500) / 1500 < 0.8, s"intersect $estI")
  }
  test("groupedEstimate (algebraic empty-bucket fold) == dense per-group estimate") {
    val df = (0L until 2000L).map(i => (s"g${i % 3}", i)).toDF("g", "k")
    val grouped = Hll.groupedEstimate(df, "g", "k")
      .as[(String, Double)].collect().toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val dense = Hll.estimate(Hll.registers(df.filter($"g" === g), "k"))
        .as[Double].collect()(0)
      assert(grouped(g) == dense, s"$g: ${grouped(g)} != $dense")
    }
  }
  test("registers are duplication-insensitive: sketch(df ++ df) == sketch(df)") {
    val df = (0L until 1000L).toDF("k")
    val once = Hll.registers(df, "k").orderBy("bucket").collect().toSeq
    val thrice = Hll.registers(df.unionByName(df).unionByName(df), "k")
      .orderBy("bucket").collect().toSeq
    assert(once == thrice)
  }
  test("null keys are ignored, matching COUNT(DISTINCT) semantics") {
    val df = (Seq[Option[Long]](Some(1L), None, Some(2L), None))
      .toDF("k")
    val regs = Hll.registers(df, "k")
    // only the two non-null keys contribute hit buckets
    assert(regs.filter($"register" > 0).count() == 2)
    val clean = Hll.registers((1L to 2L).toDF("k"), "k")
    assert(regs.orderBy("bucket").collect().toSeq ==
      clean.orderBy("bucket").collect().toSeq)
  }
}

class DistributionSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Distribution

  test("psi: identical sides 0, planted shift flags, constant column 0") {
    val base = (1 to 2000).map(i => (i.toLong, (i % 100).toDouble, 7.0))
      .toDF("id", "v", "c")
    val same = Distribution.psi(base, base, "v")
      .select("psi").as[Double].collect()(0)
    assert(same == 0.0, s"identical sides must be psi 0, got $same")
    // shift a third of side B far enough to cross bins
    val shifted = base.withColumn("v",
      $"v" + org.apache.spark.sql.functions.when($"id" % 3 === 0, 50.0).otherwise(0.0))
    val moved = Distribution.psi(base, shifted, "v")
      .select("psi").as[Double].collect()(0)
    assert(moved > 0.1, s"planted shift must exceed the stability band, got $moved")
    val const = Distribution.psi(base, shifted, "c")
      .select("psi").as[Double].collect()(0)
    assert(const == 0.0, s"constant column must be psi 0, got $const")
  }
  test("DriftCompare.distributionDrift flags only the shifted shared numeric column") {
    import graft.sources.MemorySide
    val base = (1 to 3000).map(i => (i.toLong, (i % 100).toDouble, s"s$i"))
      .toDF("id", "score", "label")
    val moved = base.withColumn("score",
      org.apache.spark.sql.functions.when($"id" % 3 === 0, $"score" * 3.0)
        .otherwise($"score"))
    val c = new graft.operators.DriftCompare(spark,
      MemorySide("db1", Map("t" -> base)), MemorySide("db2", Map("t" -> moved)))
    val out = c.distributionDrift("t").get
      .select("col_name", "psi").as[(String, Double)].collect().toMap
    // id is identical across sides; score carries the planted shift
    assert(out.keySet == Set("id", "score"), out.toString)
    assert(out("id") == 0.0, s"id must not drift: ${out("id")}")
    assert(out("score") > 0.1, s"score must flag: ${out("score")}")
  }
  test("psi is symmetric in its two sides") {
    val a = (1 to 1500).map(i => (i.toLong, (i % 90).toDouble)).toDF("id", "v")
    val b = (1 to 1200).map(i => (i.toLong, (i % 50).toDouble)).toDF("id", "v")
    val ab = Distribution.psi(a, b, "v").select("psi").as[Double].collect()(0)
    val ba = Distribution.psi(b, a, "v").select("psi").as[Double].collect()(0)
    assert(ab == ba && ab > 0.0, s"psi must be symmetric: $ab vs $ba")
  }
}

class KmvSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Kmv

  test("exhaustive sketch (k > ndv) is exact; merge == sketch of the union") {
    val a = (0L until 1000L).toDF("k")
    val b = (500L until 1500L).toDF("k")
    val out = Kmv.overlap(a, b, "k", 2048).collect()(0)
    // 1500 distinct union values < k: everything exact
    assert(out.getAs[Double]("est_union") == 1500.0, out.toString)
    // intersect multiplies the UNROUNDED membership fraction: exact 500
    assert(out.getAs[Double]("est_intersect") == 500.0, out.toString)
    assert(out.getAs[Long]("k_used") == 1500L)
    val mergedTwice = Kmv.merge(Kmv.sketch(a, "k", 64), Kmv.sketch(b, "k", 64), 64)
    val direct = Kmv.sketch(a.unionByName(b), "k", 64)
    assert(mergedTwice.orderBy("h").collect().toSeq ==
      direct.orderBy("h").collect().toSeq)
  }

  test("theta estimates land near the planted truth at k=64") {
    val a = (0L until 1000L).toDF("k")
    val b = (500L until 1500L).toDF("k")
    val out = Kmv.overlap(a, b, "k", 64).collect()(0)
    val (u, j, i) = (out.getAs[Double]("est_union"),
      out.getAs[Double]("jaccard_est"), out.getAs[Double]("est_intersect"))
    // k=64 -> rel err ~1/sqrt(62) ~ 13%; generous deterministic brackets
    assert(math.abs(u - 1500) / 1500 < 0.4, s"union $u")
    assert(math.abs(j - 1.0 / 3.0) < 0.2, s"jaccard $j")
    assert(i > 0 && math.abs(i - 500) / 500 < 0.6, s"intersect $i")
  }

  test("bounded k-minima sketch is bit-identical to the naive distinct/sort " +
    "form and never exchanges the full distinct hash set") {
    // duplicates on purpose: the aggregate must dedup inside the buffer
    val df = (0L until 5000L).map(_ % 1300).toDF("k").repartition(8)
    val bounded = Kmv.sketch(df, "k", 64).orderBy("h").as[Long].collect().toSeq
    val naive = df.select(
        conv(substring(md5(col("k").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct().orderBy("h").limit(64).as[Long].collect().toSeq
    assert(bounded == naive, "bounded sketch diverged from the naive k minima")
    assert(bounded.size == 64 && bounded == bounded.sorted && bounded.distinct == bounded)
    // plan shape: one partial/final k_minima pair around a single
    // SinglePartition exchange — no hash-partitioned distinct of raw hashes
    val plan = Kmv.sketch(df, "k", 64).queryExecution.executedPlan.toString
    assert(plan.contains("k_minima"), plan)
    val shuffles = "Exchange".r.findAllIn(plan).size
    assert(shuffles <= 2, s"expected no distinct exchange, got $shuffles:\n$plan")
    assert(!plan.contains("hashpartitioning(h"), s"full-ndv distinct exchange present:\n$plan")
  }

  test("k-minima merge is associative across partition boundaries (exhaustive exactness)") {
    val df = (0L until 120L).toDF("k").repartition(16)
    // ndv (120) < k (256): sketch must be the full distinct hash set
    val rows = Kmv.sketch(df, "k", 256).count()
    assert(rows == 120L, s"exhaustive sketch must carry all 120 distinct hashes, got $rows")
  }
}
