package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpecBase {
  import spark.implicits._

  // 2 subspaces x 2 dims; sub-vectors sit exactly on a planted grid
  private val planted: Array[Array[Array[Double]]] = Array(
    Array(Array(0.0, 0.0), Array(4.0, 4.0)),
    Array(Array(1.0, -1.0), Array(-3.0, 5.0)))

  private def pointOf(c0: Int, c1: Int, eps: Double): Seq[Double] =
    Seq(planted(0)(c0)(0) + eps, planted(0)(c0)(1) - eps,
      planted(1)(c1)(0) + eps, planted(1)(c1)(1) - eps)

  test("encode picks the nearest centroid per subspace, ties to the lowest index") {
    val df = Seq(
      (0L, pointOf(0, 0, 0.01)),
      (1L, pointOf(0, 1, 0.01)),
      (2L, pointOf(1, 0, -0.02)),
      (3L, pointOf(1, 1, 0.0))).toDF("vec_id", "embedding")
    val got = Pq.encode(df, "vec_id", "embedding", planted)
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == Map(0L -> Seq(0, 0), 1L -> Seq(0, 1), 2L -> Seq(1, 0), 3L -> Seq(1, 1)))

    // exactly equidistant sub-vector (midpoint) must code to the LOWER index
    val mid = Seq((2.0 + 2.0) / 2, 2.0, 1.0, -1.0) // (2,2) is the 0/1 midpoint in subspace 0
    val tie = Pq.encode(Seq((9L, mid)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", planted).as[(Long, Seq[Int])].head()
    assert(tie._2.head == 0, s"midpoint must tie to centroid 0, got ${tie._2}")
  }

  test("reconstructionDrift: on-grid corpus scores 0, drift raises only the moved subspace") {
    // points exactly ON centroids: reconstruction error is exactly 0
    val onGrid = Seq(
      (0L, pointOf(0, 0, 0.0)), (1L, pointOf(0, 1, 0.0)),
      (2L, pointOf(1, 0, 0.0)), (3L, pointOf(1, 1, 0.0)))
      .toDF("vec_id", "embedding")
    val zero = Pq.reconstructionDrift(onGrid, "embedding", planted)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(zero.keySet == Set(0L, 1L) && zero.values.forall(_._1 == 4L))
    assert(zero.values.forall(_._2 == 0.0), s"on-grid must be exact 0: $zero")
    // shift ONLY subspace 1's sub-vectors by (1, 1): its mse jumps to
    // 1+1 = 2 exactly while subspace 0 stays 0 — the per-subspace split
    // localizes the drift
    val drifted = onGrid.select(col("vec_id"), array(
      element_at(col("embedding"), 1), element_at(col("embedding"), 2),
      element_at(col("embedding"), 3) + 1.0,
      element_at(col("embedding"), 4) + 1.0).as("embedding"))
    val d = Pq.reconstructionDrift(drifted, "embedding", planted)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(d(0L) == 0.0, s"unmoved subspace must stay 0: $d")
    assert(d(1L) == 2.0, s"moved subspace must read the planted shift: $d")
    // error agrees with the encoder's choice: the kernel uses the same
    // argmin, so a near-tie point scores the distance of the CHOSEN cell
    val mid = Seq((9L, Seq(2.0, 2.0, 1.0, -1.0))).toDF("vec_id", "embedding")
    val e = Pq.reconstructionDrift(mid, "embedding", planted)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(e(0L) == 8.0, s"midpoint distance to either (0,0)/(4,4) is 8: $e")
    assert(e(1L) == 0.0)
  }

  test("fit recovers well-separated planted centroids from the hash-ordered sample") {
    // 40 points per planted code pair, tiny deterministic jitter
    val rows = for {
      id <- 0 until 160
      c0 = id % 2; c1 = (id / 2) % 2
    } yield (id.toLong, pointOf(c0, c1, 0.001 * (id % 7 - 3)))
    val books = Pq.fit(rows.toDF("vec_id", "embedding"), m = 2, ksub = 2,
      sampleN = 160, iters = 10)
    assert(books.length == 2 && books.forall(_.length == 2))
    // each planted centroid has a learned centroid within the jitter radius
    for (j <- 0 until 2; c <- 0 until 2) {
      val best = books(j).map(l =>
        math.sqrt(l.zip(planted(j)(c)).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(best < 0.01, s"subspace $j centroid $c off by $best")
    }
  }

  test("fitWhitened: axis-planted fixture quantizes whitened projections exactly") {
    // mass on axis id%2 of 4 dims: axis 1 carries 10x the magnitude, so
    // raw subspaces are wildly unbalanced; the uncentered Gram is
    // exactly diagonal -> the whitening transform is closed-form (axes
    // ranked by second moment, scale 1/sqrt(lambda)) and each whitened
    // subspace holds 6 distinct values (5 planted f + 0) -> ksub=6
    // k-means lands centroids exactly on them and the reconstruction
    // equals the whitened projection
    val rows = (0 until 40).map { id =>
      val f = (id % 5 + 1).toDouble * (if (id % 2 == 1) 10.0 else 1.0)
      (id.toLong, Seq.tabulate(4)(d => if (d == id % 2) f else 0.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (pca, books) = Pq.fitWhitened(df, m = 2, ksub = 6, k = 2,
      center = false, sampleN = 40)
    // whitened components carry UNIT second moment: E[p_j^2] = 1
    val proj = Similarity.pcaApply(df, "vec_id", "embedding", pca)
      .as[(Long, Seq[Double])].collect().toMap
    (0 until 2).foreach { j =>
      val m2 = proj.values.map(p => p(j) * p(j)).sum / proj.size
      assert(math.abs(m2 - 1.0) < 1e-6, s"component $j second moment $m2")
    }
    // encodeWhitened == encode-after-project, and the codebook
    // reconstruction round-trips every projection exactly
    val codes = Pq.encodeWhitened(df, "vec_id", "embedding", pca, books)
      .as[(Long, Seq[Int])].collect().toMap
    val viaProject = Pq.encode(
      Similarity.pcaApply(df, "vec_id", "embedding", pca), "vec_id", "pca",
      books).as[(Long, Seq[Int])].collect().toMap
    assert(codes == viaProject)
    rows.foreach { case (id, _) =>
      val recon = codes(id).zipWithIndex.map { case (c, j) => books(j)(c)(0) }
      val expect = proj(id)
      recon.zip(expect).foreach { case (r, e) =>
        assert(math.abs(r - e) < 1e-9, s"id $id recon $recon vs $expect")
      }
    }
    // k must split into m subspaces
    val bad = intercept[IllegalArgumentException] {
      Pq.fitWhitened(df, m = 3, ksub = 2, k = 2)
    }
    assert(bad.getMessage.contains("split evenly"))
  }

  test("fitRotated: eigenvalue allocation deals the spectrum; rotation is an isometry") {
    // strictly decreasing sizes deal into buckets {0,3} {1,2}
    assert(Pq.eigenAllocate(Array(8.0, 4.0, 2.0, 1.0), 2).toSeq == Seq(0, 3, 1, 2))
    // sub-unit spectrum (any L2-normalized corpus) must deal the same —
    // the unshifted min-log-product rule would pile everything into one
    // bucket because adding a factor < 1 lowers a product
    assert(Pq.eigenAllocate(Array(0.8, 0.4, 0.2, 0.1), 2).toSeq == Seq(0, 3, 1, 2))
    // rotation preserves norms: no rescaling, full-rank components
    val rows = (0 until 40).map { id =>
      val f = (id % 5 + 1).toDouble * (if (id % 2 == 1) 10.0 else 1.0)
      (id.toLong, Seq.tabulate(4)(d => if (d == id % 2) f else 0.0))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (rot, _) = Pq.fitRotated(df, m = 2, ksub = 6, k = 4,
      center = false, sampleN = 40)
    assert(rot.scales.forall(_ == 1.0), "no rescaling — metric preserved")
    val proj = Similarity.pcaApply(df, "vec_id", "embedding", rot)
      .as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, v) =>
      val n0 = math.sqrt(v.map(x => x * x).sum)
      val n1 = math.sqrt(proj(id).map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-6, s"id $id norms $n0 vs $n1")
    }
  }

  test("adcTopK ranks the exact-match class first and breaks in-class ties by id") {
    val corpus = Seq(
      (0L, pointOf(0, 0, 0.0)), (1L, pointOf(0, 0, 0.0)), // same codes: tie
      (2L, pointOf(1, 1, 0.0)), (3L, pointOf(0, 1, 0.0)))
      .toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding", planted)
    val queries = Seq((100L, pointOf(0, 0, 0.05)), (101L, pointOf(1, 1, -0.05)))
      .toDF("vec_id", "embedding")
    val top = Pq.adcTopK(queries, codes, 2, planted)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // query 100: class {0,1} ties bit-exactly, id order within the class
    // query 101: class {2} first, then the next-nearest class
    assert(top.contains((100L, 0L, 1)) && top.contains((100L, 1L, 2)), s"got $top")
    assert(top.contains((101L, 2L, 1)), s"got $top")
  }

  test("ADC distance equals the true distance to the reconstruction") {
    val q = pointOf(0, 1, 0.3)
    val queries = Seq((0L, q)).toDF("vec_id", "embedding")
    val corpus = Seq((7L, pointOf(1, 0, 0.02))).toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding", planted)
    val adc = Pq.adcTopK(queries, codes, 1, planted)
      .select("adc_dist").as[Double].head()
    // candidate 7 codes to (1, 0); its reconstruction is those centroids
    val recon = Seq(planted(0)(1)(0), planted(0)(1)(1), planted(1)(0)(0), planted(1)(0)(1))
    val expect = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(adc - expect) < 1e-12, s"adc $adc vs recon-dist $expect")
  }

  test("ivfAdcTopK matches the full ADC scan when the probe covers the class") {
    // coarse clusters live in subspace 0 (cosine-separable directions);
    // the PQ codebook spans both subspaces
    val books: Array[Array[Array[Double]]] = Array(
      Array(Array(10.0, 0.0), Array(0.0, 10.0)),
      Array(Array(1.0, -1.0), Array(-3.0, 5.0)))
    val coarse = Array(Array(10.0, 0.0, 0.0, 0.0), Array(0.0, 10.0, 0.0, 0.0))
    def pt(a: Int, c1: Int, eps: Double) = Seq(
      books(0)(a)(0) + eps, books(0)(a)(1) - eps,
      books(1)(c1)(0) + eps, books(1)(c1)(1) + eps)
    val corpus = (0 until 40).map(i => (i.toLong, pt(i % 2, (i / 2) % 2, 0.001 * (i % 5))))
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, pt(0, 1, 0.02)), (101L, pt(1, 0, -0.02)))
      .toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding", books)
    val full = Pq.adcTopK(queries, codes, 3, books)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val ivf = Pq.ivfAdcTopK(queries, corpus, 3, coarse, books, nProbe = 1)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // each query's class lives wholly in its own cell, so pruning to one
    // probed cell must not change the top-3 (same codes => same ADC ties)
    assert(ivf == full, s"ivf $ivf vs full $full")
  }

  test("codes are m small ints: the compressed scan representation") {
    val df = (0 until 32).map(i => (i.toLong, pointOf(i % 2, (i / 2) % 2, 0.01)))
      .toDF("vec_id", "embedding")
    val enc = Pq.encode(df, "vec_id", "embedding", planted)
      .select(size(col("codes")).as("m"),
        array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn"))
      .agg(max("m").as("m"), max("mx").as("mx"), min("mn").as("mn"))
      .as[(Int, Int, Int)].head()
    assert(enc._1 == 2 && enc._2 <= 1 && enc._3 >= 0)
  }

  test("codebook save/load round-trips exact doubles and encodes identically") {
    val dir = java.nio.file.Files.createTempDirectory("pqmodel").toString
    Pq.saveCodebooks(spark, planted, s"$dir/codebooks")
    val loaded = Pq.loadCodebooks(spark, s"$dir/codebooks")
    assert(loaded.length == planted.length)
    planted.zip(loaded).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
    val pts = Seq((0L, pointOf(0, 1, 0.01)), (1L, pointOf(1, 0, -0.02)))
      .toDF("vec_id", "embedding")
    val a = Pq.encode(pts, "vec_id", "embedding", planted)
      .as[(Long, Seq[Int])].collect().toMap
    val b = Pq.encode(pts, "vec_id", "embedding", loaded)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("IVF centroid save/load round-trips exact doubles in cell order") {
    val cents = Array(Array(1.0, 0.0, 0.25), Array(0.0, -1.0, 1e-17))
    val dir = java.nio.file.Files.createTempDirectory("ivfmodel").toString
    Similarity.saveCentroids(spark, cents, s"$dir/centroids")
    val loaded = Similarity.loadCentroids(spark, s"$dir/centroids")
    assert(loaded.length == 2)
    cents.zip(loaded).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }
}

/** Mahalanobis scoring: covariance-aware ordering and planted outliers. */
class MahalanobisSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Similarity

  test("mahalanobisScore: covariance-awareness beats euclidean; planted outliers top") {
    // tight dimension y (sd ~0.1), loose dimension x (sd ~10): a point
    // at (0, 3) is farther in Mahalanobis than (30, 0) is NOT — but a
    // point 5 tight-sigmas out must beat one 1 loose-sigma out
    val base = (0 until 200).map { i =>
      val x = (i % 20 - 9.5) * 1.0   // sd ~5.8 on x
      val y = (i % 5 - 2.0) * 0.05   // sd ~0.07 on y
      (i.toLong, Array(x, y))
    }
    val probes = Seq(
      (1000L, Array(5.8, 0.0)),   // 1 sigma on the loose axis
      (1001L, Array(0.0, 0.35)))  // ~5 sigma on the tight axis
    val df = (base ++ probes).toDF("vec_id", "embedding")
    val s = Similarity.mahalanobisScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(1001L) > s(1000L),
      "tight-axis excursion must out-score the loose-axis one")
    // planted far outlier dominates everything
    val big = (base ++ Seq((2000L, Array(100.0, 5.0)))).toDF("vec_id", "embedding")
    val top = Similarity.mahalanobisScore(big)
      .orderBy(col("mdist2").desc).limit(1).head().getLong(0)
    assert(top == 2000L)
  }

  test("mahalanobisScore: identity-like covariance reduces to scaled euclidean") {
    // symmetric lattice -> diagonal covariance with equal variances
    val pts = for (x <- -2 to 2; y <- -2 to 2) yield
      ((x + 2) * 5L + (y + 2), Array(x.toDouble, y.toDouble))
    val df = pts.toDF("vec_id", "embedding")
    val s = Similarity.mahalanobisScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // (2,2) corner vs (2,0) edge: d2 ratio must equal euclidean ratio 8/4
    val corner = s(24L); val edge = s(22L)
    assert(math.abs(corner / edge - 2.0) < 1e-9)
  }
}

/** Disk-backed IVF index: build/search recall, idempotent append,
  * and the partition-pruned search scan.
  */
class IvfIndexSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.operators.Similarity

  private def vecs(ids: Range, shift: Double = 0.0) = ids.map { i =>
    (i.toLong, Array.tabulate(8)(d => math.sin(i * 0.37 + d) + shift))
  }

  test("build/search: every query's nearest neighbor is its planted twin") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val base = vecs(0 until 64)
    val twins = base.map { case (id, v) => (id + 1000L, v.map(_ * 1.001)) }
    Similarity.buildIvfIndex((base ++ twins).toDF("vec_id", "embedding"),
      dir, nCells = 4, sampleN = 128)
    val hits = Similarity.searchIvfIndex(base.toDF("vec_id", "embedding"),
        dir, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(base.forall { case (id, _) => hits(id) == id + 1000L },
      s"every query must find its scaled twin: $hits")
  }

  test("append is idempotent and appended vectors become searchable") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    Similarity.buildIvfIndex(vecs(0 until 32).toDF("vec_id", "embedding"),
      dir, nCells = 4, sampleN = 64)
    val novel = vecs(100 until 110).toDF("vec_id", "embedding")
    assert(Similarity.appendIvfIndex(novel, dir) == 10L)
    // replay: nothing double-appends
    assert(Similarity.appendIvfIndex(novel, dir) == 0L)
    val q = vecs(100 until 110).map { case (id, v) =>
      (id + 5000L, v.map(_ * 1.001)) }.toDF("vec_id", "embedding")
    val hits = Similarity.searchIvfIndex(q, dir, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((100 until 110).forall(i => hits(i + 5000L) == i.toLong))
  }

  test("search partition-prunes the posting scan to the probed cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx3").toString
    Similarity.buildIvfIndex(vecs(0 until 64).toDF("vec_id", "embedding"),
      dir, nCells = 8, sampleN = 128)
    val df = Similarity.searchIvfIndex(
      vecs(0 until 2).toDF("vec_id", "embedding"), dir, k = 1, nProbe = 2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val scanLine = p.linesIterator.find(l =>
      l.contains("Scan parquet") && l.contains("postings")).getOrElse("")
    assert(p.contains("PartitionFilters: [cell"),
      s"expected the probed-cell predicate to prune partitions:\n$p")
  }
}
