package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for vector compression and in-compressed-domain
  * nearest-neighbor scanning (Jegou, Douze & Schmid, PAMI 2011) —
  * the standard scale path for embedding search between "broadcast the
  * whole corpus" and a full ANN service: 64-dim float32 vectors become
  * m small integers (m=4, ksub=256 → 64x compression), and a top-k
  * scan touches only the codes.
  *
  * Spark-first decomposition:
  *  - [[fit]]: codebook training is DRIVER-BOUNDED — a deterministic
  *    hash-ordered sample (same construction as `Similarity.ivfFit`)
  *    of a few thousand vectors fits m independent L2 k-means, so the
  *    fit cost is constant in corpus size and the m x ksub x subdim
  *    codebook (m=4, ksub=16, 64 dims → 4 KB) rides in plans as one
  *    reference object.
  *  - [[encode]]: one narrow codegen'd pass
  *    ([[graft.functions.PqCodes]]); no shuffle, no driver data.
  *  - [[adcTopK]]: each query computes its ADC lookup table ONCE
  *    ([[graft.functions.PqAdcLut]]), then scans codes at m additions
  *    per candidate ([[graft.functions.PqAdcDist]]) and keeps top-k
  *    per query through a rank window partitioned by query — the scan
  *    shuffles only (query, candidate-id, distance) survivors. At
  *    cluster scale the scan composes with the IVF coarse quantizer
  *    (probe cells first, ADC within probed cells — IVF-ADC, PAMI'11
  *    §V) exactly as `Similarity.ivfTopK` builds its cell-local scan.
  *
  * Everything is deterministic: hash-ordered sampling, lowest-index
  * tie-breaks in Lloyd assignment and encoding, and left-fold double
  * arithmetic — an external engine replaying the codebooks reproduces
  * codes and ranks bit-for-bit.
  */
object Pq {

  /** Deterministic farthest-point (Gonzalez 1985) seeding: start from
    * the first sample vector, then repeatedly add the sample point
    * farthest from its nearest chosen seed (ties to the lowest index).
    * When clusters are separated by more than their diameters this
    * provably lands one seed per cluster — unlike "first k vectors",
    * which can seed one cluster twice and leave Lloyd in the collapsed
    * local optimum.
    */
  private def farthestPointInit(sample: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val n = sample.length
    val minD = Array.fill(n)(Double.PositiveInfinity)
    val seeds = new Array[Array[Double]](k)
    var next = 0
    var s = 0
    while (s < k) {
      seeds(s) = sample(next).clone()
      var far = 0
      var farD = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        var d = 0.0
        var t = 0
        while (t < sample(i).length) {
          val df = sample(i)(t) - seeds(s)(t); d += df * df; t += 1
        }
        if (d < minD(i)) minD(i) = d
        if (minD(i) > farD) { farD = minD(i); far = i }
        i += 1
      }
      next = far
      s += 1
    }
    seeds
  }

  /** Driver-side Lloyd iterations under plain (non-spherical) L2:
    * assignment by min squared distance with ties to the lowest cell,
    * init = deterministic farthest-point seeds, empty cells keep their
    * previous centroid. PQ sub-quantizers minimize Euclidean
    * reconstruction error, so centroids are NOT normalized (unlike the
    * spherical `Similarity.kmeansFit`).
    */
  private[graft] def kmeansFitL2(sample: Array[Array[Double]], k: Int,
                                 iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"need >= $k sample vectors, got ${sample.length}")
    val dim = sample.head.length
    var centroids = farthestPointInit(sample, k)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val df = v(i) - centroids(c)(i); d += df * df; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centroids
  }

  /** Train the m-subspace PQ codebook on a deterministic hash-ordered
    * sample of `sampleN` vectors (the `Similarity.ivfFit` construction:
    * lowest `xxhash64(id)` first — reproducible, decorrelated from
    * ingest order, and NEVER more than `sampleN` vectors on the
    * driver regardless of corpus size). `dim` must divide evenly into
    * `m` subspaces.
    */
  def fit(df: DataFrame, m: Int, ksub: Int, sampleN: Int = 2048,
          iters: Int = 10, idCol: String = "vec_id",
          vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1, "m and ksub must be >= 1")
    val sample = df.orderBy(xxhash64(col(idCol)), col(idCol)).limit(sampleN)
      .select(Similarity.asDouble(col(vecCol))).collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training frame")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subdim = dim / m
    Array.tabulate(m) { j =>
      kmeansFitL2(sample.map(v => java.util.Arrays.copyOfRange(v, j * subdim, (j + 1) * subdim)),
        ksub, iters)
    }
  }

  /** Persist a trained codebook as a plain parquet table
    * (subspace, code, centroid) so a pipeline can train once and reuse
    * the model across jobs/stages — the encode/scan side loads it back
    * bit-identically ([[loadCodebooks]]); model size is m x ksub rows,
    * so the write/read is metadata-cheap at any corpus scale.
    */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
                    codebooks: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    ModelStore.save(codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "centroid"), path)
  }

  /** Inverse of [[saveCodebooks]]: exact double round-trip (parquet
    * stores IEEE doubles losslessly), rebuilt in (subspace, code) order.
    */
  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Array[Array[Array[Double]]] = {
    val rows = ModelStore.loadRows(spark, path, "subspace", "code", "centroid")
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, sub) =>
      sub.sortBy(_._2).map(_._3)
    }.toArray
  }

  /** Compress: (idCol, codes array<int> of length m). One narrow
    * codegen'd pass; at m=4/ksub=16 the output is ~1/60th the bytes of
    * the float64 input.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebooks: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol),
      graft.functions.PqCodes(col(vecCol), codebooks).as("codes"))

  /** Approximate top-k by asymmetric distance: for each row of
    * `queries` (idCol, vecCol), the `k` code rows of `codes`
    * (idCol, "codes") with the smallest ADC squared distance —
    * (query_id, neighbor_id, adc_dist, rank), ties broken by
    * neighbor id.
    *
    * The LUT column is materialized once per query row BEFORE the
    * candidate join, so the per-pair cost is m array reads. The join
    * below is the full compressed scan — the deliberate PQ trade
    * (codes are 64x smaller than vectors, so a 100 TB float corpus
    * scans as ~1.6 TB of codes); when even that is too much, feed
    * `codes` filtered to IVF-probed cells instead (IVF-ADC).
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, k: Int,
              codebooks: Array[Array[Array[Double]]],
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ksub = codebooks.map(_.length).max
    // the query batch (with LUTs precomputed below the exchange, once
    // per query) BROADCASTS; the compressed corpus STREAMS — the only
    // orientation that survives a corpus 1000x bigger than memory
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      graft.functions.PqAdcLut(col(vecCol), codebooks).as("_lut")))
    val c = codes.select(col(idCol).as("neighbor_id"), col("codes"))
    c.join(q)
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.PqAdcDist(col("_lut"), col("codes"), ksub).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** IVF + PQ: the coarse quantizer prunes candidates to `nProbe` of
    * `coarse.length` inverted cells, and the ADC scan runs over codes
    * WITHIN probed cells only — the two-stage FAISS-style pipeline
    * (PAMI'11 §V; this is the non-residual variant: codes compress the
    * raw vectors, the coarse stage only prunes, so the ADC math and
    * codebooks are shared verbatim with [[adcTopK]]).
    *
    * Shape: the corpus is assigned + encoded in ONE narrow pass
    * (cell and codes are both kernel projections over the same scan);
    * queries explode x nProbe and broadcast; the cell equi-join turns
    * the full compressed scan into a hash probe touching
    * ~nProbe/nCells of the codes. Per-query candidate volume drops by
    * the same factor — the knob that keeps ANN sub-linear when even
    * the compressed corpus is too big to scan per query.
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 coarse: Array[Array[Double]],
                 codebooks: Array[Array[Array[Double]]],
                 nProbe: Int = 4, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nProbe >= 1, "k and nProbe must be >= 1")
    val ksub = codebooks.map(_.length).max
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      element_at(graft.functions.NearestCells(col(vecCol), coarse, 1), lit(1)).as("cell"),
      graft.functions.PqCodes(col(vecCol), codebooks).as("codes"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
        graft.functions.PqAdcLut(col(vecCol), codebooks).as("_lut"),
        explode(graft.functions.NearestCells(col(vecCol), coarse, nProbe)).as("cell")))
    c.join(q, "cell")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.PqAdcDist(col("_lut"), col("codes"), ksub).as("adc_dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dist"), col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** OPQ-lite (whiten-then-quantize): fit [[Similarity.pcaFit]] with
    * `whiten = true` so the top-k rotated components all carry UNIT
    * variance, then train the PQ codebooks on those projections. Plain
    * PQ splits raw dimensions into subspaces as they come, so a
    * high-variance subspace eats the quantization budget while a
    * low-variance one wastes its codes; whitening equalizes the
    * per-subspace energy first — the diagonal special case of OPQ's
    * learned rotation (Ge et al., CVPR 2013: R optimizing
    * min Σ‖x − R⁻¹q(Rx)‖²; with R fixed to the whitened PCA basis the
    * codebook training below is exactly their initialization), traded
    * here for determinism and one closed-form fit pass.
    *
    * Scale shape: the PCA fit adds one distributed Gram pass (dim²
    * shuffle keys) + the same driver-bounded sample k-means [[fit]]
    * runs; everything downstream (encode / ADC / recall) reuses the
    * plain-PQ machinery verbatim on the `pca` column. `k` must split
    * evenly into `m` subspaces. Returns the transform + codebooks —
    * both model-sized; persist the codebooks with [[saveCodebooks]]
    * and re-derive the transform from the (deterministic) fit, or
    * carry the pair in the job.
    */
  def fitWhitened(df: DataFrame, m: Int, ksub: Int, k: Int,
                  center: Boolean = true, sampleN: Int = 2048,
                  iters: Int = 10, idCol: String = "vec_id",
                  vecCol: String = "embedding"):
      (Similarity.PcaModel, Array[Array[Array[Double]]]) = {
    require(k % m == 0, s"k = $k must split evenly into $m subspaces")
    val pca = Similarity.pcaFit(df, vecCol, k, center, whiten = true)
    val proj = Similarity.pcaApply(df, idCol, vecCol, pca)
    (pca, fit(proj, m, ksub, sampleN, iters, idCol, "pca"))
  }

  /** Compress through a [[fitWhitened]] / [[fitRotated]] model: project
    * (one ProjectVec kernel) then [[encode]] (one PqCodes kernel) — a
    * single narrow codegen pass, no shuffle. Queries must go through
    * the SAME transform before [[adcTopK]] (ADC distances live in the
    * projected space — for [[fitRotated]] that space is an isometry of
    * the original, for [[fitWhitened]] it is deliberately rescaled).
    */
  def encodeWhitened(df: DataFrame, idCol: String, vecCol: String,
                     pca: Similarity.PcaModel,
                     codebooks: Array[Array[Array[Double]]]): DataFrame =
    encode(Similarity.pcaApply(df, idCol, vecCol, pca), idCol, "pca",
      codebooks)

  /** Eigenvalue allocation (Ge et al., CVPR 2013 §4 parametric OPQ):
    * partition eigenvalue-descending components into the m subspaces so
    * the per-subspace log-variance products balance. Greedy balanced
    * multiway partition: largest item first into the open bucket with
    * the smallest running size-sum — with sizes log λ SHIFTED to
    * non-negative (subtract the minimum; valid because every bucket
    * ends with exactly subdim items, so a constant shift moves all
    * totals equally — the raw min-log-product rule degenerates on
    * λ < 1 spectra, e.g. any L2-normalized corpus, where adding a
    * factor < 1 LOWERS a product and the "smallest" bucket swallows
    * every large component; probe-measured spread 527 before this
    * shift). Ties to the lower bucket index. Returns the component
    * permutation (bucket-concatenated), deterministic.
    */
  private[graft] def eigenAllocate(vals: Array[Double], m: Int): Array[Int] = {
    val subdim = vals.length / m
    val logs = vals.map(v => math.log(math.max(v, 1e-300)))
    val sizes = logs.map(_ - logs.min)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val sums = new Array[Double](m)
    vals.indices.foreach { i =>
      val best = (0 until m).filter(b => buckets(b).length < subdim)
        .minBy(b => (sums(b), b))
      buckets(best) += i
      sums(best) += sizes(i)
    }
    buckets.flatMap(_.toSeq)
  }

  /** OPQ-lite done RIGHT for retrieval: an ORTHOGONAL rotation — PCA
    * components permuted by [[eigenAllocate]] so each subspace carries
    * a balanced slice of the spectrum — with NO variance rescaling,
    * then PQ on the rotated vectors. Rotation is an isometry, so ADC
    * distances in the rotated space EQUAL original-space distances and
    * the retrieval metric is untouched; only the quantization-budget
    * allocation improves (Ge et al., CVPR 2013: the parametric
    * initialization of their learned R). Contrast [[fitWhitened]]:
    * rescaling by 1/sqrt(λ) equalizes per-subspace MSE but warps the
    * metric — noise directions amplify, and the r18 probe measured
    * recall@10 FALLING 0.32 → 0.13 on an anisotropic corpus while this
    * rotation preserves it. Use [[fitWhitened]] when the whitened space
    * IS the intended metric (Mahalanobis-style semantic dedup);
    * use this for ANN/ADC retrieval. `k` (≤ dim, divisible by m) keeps
    * the top-k components — k = dim for a pure re-ordering rotation.
    */
  def fitRotated(df: DataFrame, m: Int, ksub: Int, k: Int,
                 center: Boolean = true, sampleN: Int = 2048,
                 iters: Int = 10, idCol: String = "vec_id",
                 vecCol: String = "embedding"):
      (Similarity.PcaModel, Array[Array[Array[Double]]]) = {
    require(k % m == 0, s"k = $k must split evenly into $m subspaces")
    val p0 = Similarity.pcaFit(df, vecCol, k, center, whiten = false)
    val order = eigenAllocate(p0.values, m)
    val pca = Similarity.PcaModel(order.map(p0.components),
      p0.means, order.map(p0.scales), order.map(p0.values))
    val proj = Similarity.pcaApply(df, idCol, vecCol, pca)
    (pca, fit(proj, m, ksub, sampleN, iters, idCol, "pca"))
  }

  /** PQ codebook staleness monitor: per-subspace mean reconstruction
    * error of a corpus under an EXISTING codebook — the quantization
    * error [[encode]] silently incurs, surfaced as the signal to refit.
    * When the embedding distribution drifts off the codebook (new
    * model version, new data mix), these errors rise BEFORE ANN recall
    * visibly degrades, and the per-subspace split localizes which
    * dimensions moved (the [[graft.operators.Similarity.cellMassDrift]]
    * question asked of the compression layer). Compare against the
    * same statistic at fit time: the ratio is the staleness.
    *
    * Determinism/parity: the per-row error is the
    * [[graft.functions.PqSubspaceErrors]] kernel (the exact
    * left-fold argmin distance [[graft.functions.PqCodes]] uses, so
    * error and code always agree), rounded at 9 dp; rows fold as exact
    * decimals and the mean is one double division per subspace —
    * independent of row order and partitioning.
    *
    * Scale shape: one narrow codegen pass over the corpus (no shuffle
    * by data — the only exchange carries m partial decimal sums), one
    * m-row result. Returns (subspace, n, mse), subspace ascending.
    */
  def reconstructionDrift(df: DataFrame, vecCol: String,
                          codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val errs = graft.functions.PqSubspaceErrors(col(vecCol), codebooks)
    val aggs = count(lit(1)).as("n") +: (0 until m).map(j =>
      sum(round(element_at(col("_e"), j + 1), 9).cast("decimal(28,9)"))
        .as(s"_s$j"))
    val folded = df.filter(col(vecCol).isNotNull)
      .select(errs.as("_e"))
      .agg(aggs.head, aggs.tail: _*)
    val rows = array((0 until m).map(j =>
      struct(lit(j.toLong).as("subspace"),
        (col(s"_s$j").cast("double") / col("n").cast("double"))
          .as("mse"))): _*)
    folded.select(col("n"), explode(rows).as("_r"))
      .select(col("_r.subspace").as("subspace"), col("n"),
        round(col("_r.mse"), 9).as("mse"))
  }
}
