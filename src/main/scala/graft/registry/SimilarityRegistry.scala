package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity/ANN registry: embedding pairs, top-k
  * (brute / LSH / IVF / PQ), semantic diff/join, vector transforms and
  * cluster diagnostics.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object SimilarityRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

    // ---- embedding near-dup pairs within cluster blocks (IVF-style) ----
    "q_embed_cosine_pairs" -> ((s, dir) =>
      Similarity.cosinePairsBlocked(t(s, dir, "embeddings"), "label", 0.3)
        .orderBy("id1", "id2")),


    // ---- brute-force cosine ANN top-k (broadcast query set) ----
    "q_ann_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e, 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),


    // ---- hard-negative mining (contrastive-training staple): per
    //      query, the top-5 most-similar vectors with a DIFFERENT
    //      label — broadcast queries, one corpus pass ----
    "q_hard_negatives" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.hardNegatives(e.filter(col("vec_id") < 10), e, 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("query_id", "rank")
    }),


    // ---- hyperplane-LSH ANN. Full oracle: plane components are
    //      md5-derived uniforms, so DuckDB replays the 16 x 8-bit bucket
    //      keys, the candidate join, and the exact-cosine top-5
    //      value-exactly (recall at the design regime is separately
    //      verified by q_planted_ann) ----
    "q_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), 64, 5, 8, 16)
        .withColumn("rank", col("rank").cast("long")).orderBy("query_id", "rank")),


    // ---- planted-neighbor recall harness, hyperplane-LSH ANN: one twin
    //      per vector at cosine ~0.999 (tiny deterministic per-coordinate
    //      perturbation), far above the natural max (~0.6), so the true
    //      rank-1 neighbor of every vector is its twin and vice versa.
    //      At cos ~0.9999 a hyperplane agrees w.p. ~0.996, an 8-bit table
    //      w.p. ~0.96, so the 16-table miss prob is ~(0.04)^16 ~ 1e-22 per
    //      pair — and the seeded hashes make the outcome deterministic, so
    //      the output is exactly the planted rank-1 map, which the oracle
    //      states in closed form ----
    "q_planted_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0)
        .select("vec_id", "embedding")
      // `_oid` pre-projection: see q_semantic_join — the sibling
      // col("vec_id") reference resolves laterally to the shifted
      // alias; key the perturbation on the original id
      val twins = emb.select(col("vec_id").as("_oid"), col("embedding"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
          .cast("array<float>").as("embedding"))
      Similarity.lshTopK(emb.unionByName(twins), 64, 1, 8, 16)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),


    // ---- semantic diff: rows with no near-neighbor (cos >= 0.9) on the
    //      other side — q_diff_rows' hash anti-join (J1) generalized to
    //      embedding space via cross-side LSH-bucket collisions + exact
    //      cosine verify + anti-join. Planted sides: db1 = the corpus;
    //      db2 = near-dup twins of vec_id%3==0 (cos ~0.9998 -> matched),
    //      NEGATED vectors of vec_id%3==1 (cos <= natural ~0.6 vs
    //      everything -> db2-new), exact copies of vec_id%3==2 (cos 1 ->
    //      matched); db1's %3==1 rows lose their counterpart -> db1-lost.
    //      The oracle is EXACT BRUTE FORCE (all-pairs NOT EXISTS in
    //      DuckDB): at the planted margins (0.9998 / 0.9 / 0.6) the 16x8
    //      banding misses a true pair w.p. ~1e-21, so the banded result
    //      IS the brute-force truth, deterministically ----
    "q_semantic_diff" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // `_oid` pre-projection: a sibling reference to col("vec_id")
      // resolves laterally to the `... AS vec_id` alias (the shifted
      // id); the perturbation must key on the ORIGINAL id so the
      // oracle's `b.vec_id` replays the construction bit-for-bit
      // (caught by q_semantic_join, which exposes the cosines)
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").as("_oid"), col("v"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
            .as("v"))
      val novel = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val copies = base.filter(col("vec_id") % 3 === 2)
      val db2 = twins.unionByName(novel).unionByName(copies)
      Similarity.semanticDiff(base, db2, "vec_id", "v", 0.9, 64)
        .orderBy("observed_in", "vec_id")
    }),


    // ---- semantic join: the diff's constructive twin — every db2 row
    //      WITH a near-neighbor on db1 aligned to its single best match
    //      (argmax cosine, ties to the lower id). Same planted sides as
    //      q_semantic_diff: twins (%3==0, cos ~0.9998) and exact copies
    //      (%3==2, cos 1) align to their originals; negations (%3==1)
    //      are absent. Oracle is EXACT BRUTE FORCE (all-pairs argmax in
    //      DuckDB); at the planted margins the banded argmax reproduces
    //      it deterministically (the diff's ~1e-21 per-pair bound) ----
    "q_semantic_join" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // `_oid` pre-projection: referencing col("vec_id") in a sibling of
      // an `... AS vec_id` alias resolves LATERALLY to the alias (the
      // shifted id), not the input column — the sin() argument must be
      // the ORIGINAL id for the oracle's `b.vec_id` to replay it
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").as("_oid"), col("v"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
            .as("v"))
      val novel = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val copies = base.filter(col("vec_id") % 3 === 2)
      val db2 = twins.unionByName(novel).unionByName(copies)
      Similarity.semanticJoin(base, db2, "vec_id", "v", 0.9, 64)
        .orderBy("probe_id")
    }),

    // ---- embedding-space dedup with survivorship (r17): one corpus
    //      with planted 3-node near-dup components — for vec_id%3==0,
    //      a twin (+1M, cos ~0.9998) and an exact copy (+3M, cos 1) —
    //      LSH-banded pairs -> connected components -> min-id survivor.
    //      Oracle is EXACT: brute-force all-pairs at >= 0.9 + recursive
    //      min-label CC; at the planted margins the banded pair set IS
    //      the brute-force truth (~1e-21 per-pair miss, deterministic
    //      seeded hyperplanes) ----
    "q_semantic_dedup_lsh" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // `_oid` pre-projection: see q_semantic_join
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").as("_oid"), col("v"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
            .as("v"))
      val copies = base.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(3000000L)).as("vec_id"), col("v"))
      val corpus = base.unionByName(twins).unionByName(copies)
      Similarity.semanticDedupLsh(corpus, "vec_id", "v", 0.9, 64)
        .select("vec_id").orderBy("vec_id")
    }),

    // ---- incremental semantic dedup (r17): corpus = embeddings; the
    //      novel batch plants all three fates — twins of %3==0 (+1M,
    //      corpus near-dups -> dropped), negations of %3==1 (+2M, truly
    //      novel -> survive), exact copies of those negations (+4M,
    //      within-batch dups -> min-id +2M survives). Oracle is exact:
    //      brute-force NOT EXISTS vs corpus, then recursive-CC min-id
    //      among the remainder ----
    "q_semantic_dedup_inc" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // `_oid` pre-projection: see q_semantic_join
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").as("_oid"), col("v"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
            .as("v"))
      val novelNeg = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val negCopies = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(4000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val batch = twins.unionByName(novelNeg).unionByName(negCopies)
      Similarity.semanticDedupIncrement(batch, base, "vec_id", "v", 0.9, 64)
        .select("vec_id").orderBy("vec_id")
    }),

    // ---- incremental semantic dedup against the PERSISTED index (r18):
    //      the q_semantic_dedup_inc fixture driven through
    //      SemanticIndex.build + dedupAgainstIndex — per-batch cost is
    //      batch-sized (the corpus hashes ONCE into the on-disk index;
    //      the probe scan prunes to touched bucket directories). Same
    //      exact oracle: the two paths implement one contract ----
    "q_semantic_dedup_idx" -> ((s, dir) => {
      val base = t(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      // `_oid` pre-projection: see q_semantic_join
      val twins = base.filter(col("vec_id") % 3 === 0)
        .select(col("vec_id").as("_oid"), col("v"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
          transform(col("v"), (x, i) => x * (lit(1.0) +
            lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
            .as("v"))
      val novelNeg = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(2000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val negCopies = base.filter(col("vec_id") % 3 === 1)
        .select((col("vec_id") + lit(4000000L)).as("vec_id"),
          transform(col("v"), x => -x).as("v"))
      val batch = twins.unionByName(novelNeg).unionByName(negCopies)
      val idx = java.nio.file.Files
        .createTempDirectory("q_semantic_dedup_idx").toString
      // nBits/nTables sized to the fixture corpus per the build
      // contract (2^nBits ≈ n/maxBucket) — the default 8/16 writes
      // 4096 directories for a few hundred vectors; at 8×64 the miss
      // probability for the planted cos ≥ 0.998 twins is ~1e-8/pair
      SemanticIndex.build(base, "vec_id", "v", dim = 64, idx,
        nBits = 6, nTables = 8)
      SemanticIndex.dedupAgainstIndex(batch, "vec_id", "v", 0.9, idx)
        .select("vec_id").orderBy("vec_id")
    }),


    // ---- PCA projection (r17): axis-aligned planted fixture — vectors
    //      carry mass only on dim vec_id%4, so the uncentered Gram is
    //      EXACTLY diagonal, Jacobi performs zero rotations, and the
    //      top-2 components are the two highest-second-moment axes; the
    //      oracle ranks the per-dim moments and projects in closed
    //      form. Exploded to scalars (vec_id, component, value) ----
    "q_pca_project" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val f = ((col("vec_id") % 10) + 1).cast("double")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(sequence(lit(0), lit(7)),
          d => when(d === g, f).otherwise(lit(0.0))).as("v"))
      Similarity.pcaProject(pts, "vec_id", "v", k = 2, center = false)
        .select(col("vec_id"),
          posexplode(col("pca")).as(Seq("component", "value")))
        .orderBy("vec_id", "component")
    }),

    // ---- OPQ-lite / whitened PQ (r18): the q_pca_project axis-aligned
    //      fixture extended through fitWhitened — the uncentered Gram is
    //      exactly diagonal, so the whitening transform is closed-form
    //      (top-2 axes by second moment, scale 1/sqrt(λ)); each whitened
    //      subspace then holds ≤ 6 DISTINCT values (five planted f
    //      magnitudes per axis + 0), so ksub=6 k-means lands centroids
    //      exactly on them (farthest-point seeds one per value; Lloyd
    //      over identical points is a fixed point) and the codebook
    //      RECONSTRUCTION of every row equals its whitened projection.
    //      Output (vec_id, subspace, value@9dp); the oracle replays the
    //      moment ranking and f·(1/sqrt(λ)) in closed form ----
    "q_pq_whitened" -> ((s, dir) => {
      import s.implicits._
      val g = (col("vec_id") % 4).cast("int")
      val f = ((col("vec_id") % 10) + 1).cast("double")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(sequence(lit(0), lit(7)),
          d => when(d === g, f).otherwise(lit(0.0))).as("v"))
      val (pca, books) = Pq.fitWhitened(pts, m = 2, ksub = 6, k = 2,
        center = false, idCol = "vec_id", vecCol = "v")
      val cb = books.zipWithIndex.flatMap { case (cbk, j) =>
        cbk.zipWithIndex.map { case (c, code) => (j, code, c(0)) }
      }.toSeq.toDF("subspace", "code", "cent")
      Pq.encodeWhitened(pts, "vec_id", "v", pca, books)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .join(broadcast(cb), Seq("subspace", "code"))
        .select(col("vec_id"), col("subspace"), round(col("cent"), 9).as("value"))
        .orderBy("vec_id", "subspace")
    }),

    // ---- OPQ-lite ROTATED PQ (r18): eigenvalue allocation over the
    //      axis-planted fixture with STRICTLY distinct per-axis moments
    //      (magnitude scales with the axis), so the greedy balanced
    //      partition is closed-form: moment-ranked components deal as
    //      buckets {rk1, rk4} {rk2, rk3} -> output positions
    //      [rk1, rk4, rk2, rk3]. Each 2-d subspace holds 11 distinct
    //      whitening-free projections (5 planted magnitudes per axis +
    //      origin), ksub=11 k-means lands exactly on them, and the
    //      reconstruction equals the rotated projection ----
    "q_pq_rotated" -> ((s, dir) => {
      import s.implicits._
      val g = (col("vec_id") % 4).cast("int")
      val f = (((col("vec_id") % 10) + 1) * ((col("vec_id") % 4) + 1))
        .cast("double")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(sequence(lit(0), lit(7)),
          d => when(d === g, f).otherwise(lit(0.0))).as("v"))
      val (pca, books) = Pq.fitRotated(pts, m = 2, ksub = 11, k = 4,
        center = false, idCol = "vec_id", vecCol = "v")
      val cb = books.zipWithIndex.flatMap { case (cbk, j) =>
        cbk.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
      }.toSeq.toDF("subspace", "code", "cent")
      Pq.encodeWhitened(pts, "vec_id", "v", pca, books)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .join(broadcast(cb), Seq("subspace", "code"))
        .select(col("vec_id"), col("subspace"),
          posexplode(col("cent")).as(Seq("pos", "cval")))
        .select(col("vec_id"),
          (col("subspace") * 2 + col("pos")).cast("int").as("component"),
          round(col("cval"), 9).as("value"))
        .orderBy("vec_id", "component")
    }),

    // ---- hyperplane-LSH banding planner at the semantic-diff regime
    //      (target cos 0.9, distractor 0.6): the s-curve table the
    //      diff/join recall contracts point to; closed-form grid, no
    //      data scanned ----
    "q_hyperplane_plan" -> ((s, dir) =>
      Similarity.hyperplanePlan(s, maxBits = 16, maxTables = 64,
        target = 0.9, distractor = 0.6).orderBy("n_bits", "n_tables")),


    // ---- per-cell medoid selection over the planted corners: the cell
    //      is closed-form (vec_id % 4) and the representative is the
    //      exact argmax cosine to the cell's centroid, tie to lowest id
    //      — a windowed replay over exact cosines in DuckDB ----
    "q_cell_medoids" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val centroids = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      Similarity.cellMedoids(pts, "vec_id", "v", centroids).orderBy("cell")
    }),


    // ---- planted-neighbor recall harness, IVF ANN: same twin construction
    //      as q_planted_ann (cosine ~0.999 far above the natural ~0.6 max).
    //      The twin's IVF cell is the query's own probe #1 (near-identical
    //      vectors assign to the same centroid; nProbe=4 covers boundary
    //      straddles), so rank-1 is exactly the planted map — stated in
    //      closed form by the oracle ----
    "q_planted_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0)
        .select("vec_id", "embedding")
      val twins = emb.select(col("vec_id").as("_oid"), col("embedding"))
        .select((col("_oid") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + lit(0.02) * sin(i.cast("double") + col("_oid").cast("double"))))
          .cast("array<float>").as("embedding"))
      Similarity.ivfTopK(emb.unionByName(twins), 1, nCells = 16, nProbe = 4)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),


    // ---- dense Gram matrix (upper triangle), 6-dp rounded sums ----
    "q_gram_matrix" -> ((s, dir) =>
      Similarity.gramMatrix(t(s, dir, "embeddings"), "embedding")
        .select(col("i"), col("j"), round(col("g"), 6).as("g"), col("n"))
        .orderBy("i", "j")),


    // ---- dominant principal direction via distributed Gram + driver
    //      power iteration: a planted +5 offset on axis 0 makes the
    //      uncentered covariance overwhelmingly axis-0 (Gram[0][0] ~ 25N
    //      vs ~0.01N elsewhere), so the top component must point there ----
    "q_top_component" -> ((s, dir) => {
      import s.implicits._
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          x.cast("double") + when(j === 0, lit(5.0)).otherwise(lit(0.0)))
          .as("v"))
      val v = Similarity.topComponent(pts, "v")
      val lead = v.indices.maxBy(i => math.abs(v(i)))
      Seq(("top_axis_is_0", lead == 0), ("axis0_loading_gt_0.9", v(0) > 0.9))
        .toDF("check_name", "ok")
    }),


    // ---- supervised class centroids: per-label mean embedding ----
    "q_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "i")),


    // ---- distributed full-corpus Lloyd k-means on planted axis-aligned
    //      clusters: point = 10 * onehot(vec_id % 4) + 0.01 * embedding
    //      (noise per dim <= 0.0053 against a 10.0 planted component, so
    //      cosine margins are ~0.999 vs ~0.04 and every Lloyd step
    //      assigns exactly by group). Init = the 4 lowest-id points (one
    //      per group by construction), so cluster index == group and the
    //      oracle states the assignment in closed form ----
    "q_kmeans_planted" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val init = pts.filter(col("vec_id") < 4).orderBy("vec_id")
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      val ctr = Similarity.kmeansFitDistributed(pts, "v", init, iters = 2)
      Similarity.kmeansAssign(pts, "vec_id", "v", ctr).orderBy("vec_id")
    }),


    // ---- product quantization, planted codes: 32-dim points built as
    //      4 subspaces of 10*onehot8(g_j) + 0.01*noise with
    //      g_j = (vec_id >> 2j) & 3, encoded against the exact
    //      centroid codebook — squared-distance margins are ~2e-4 vs
    //      ~200, so code j MUST equal g_j and the oracle states the
    //      full code table in closed form ----
    "q_pq_planted" -> ((s, dir) => {
      Pq.encode(pqPlantedPoints(s, dir), "vec_id", "v", pqPlantedBooks)
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .orderBy("vec_id", "subspace")
    }),


    // ---- PQ asymmetric-distance top-1 on the planted points: all
    //      points sharing low-8-bit vec_id patterns share codes, so
    //      their ADC distances tie bit-exactly and the (dist, id)
    //      tie-break makes the neighbor the LOWEST id of the class —
    //      i.e. vec_id % 256, stated in closed form by the oracle.
    //      (Cross-class distances are >= ~200 vs ~2e-4 in-class, so no
    //      other class can intrude.) ----
    "q_pq_adc" -> ((s, dir) => {
      val pts = pqPlantedPoints(s, dir)
      val enc = Pq.encode(pts, "vec_id", "v", pqPlantedBooks)
      Pq.adcTopK(pts.filter(col("vec_id") >= 256 && col("vec_id") < 320),
          enc, 1, pqPlantedBooks, idCol = "vec_id", vecCol = "v")
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),


    // ---- IVF-PQ two-stage pipeline on the planted points: coarse
    //      centroids are 10*onehot8(c) zero-extended to 32 dims, so a
    //      point's cell is its subspace-0 group (cosine ~0.5 vs ~0) and
    //      every member of a query's low-8-bit class shares its cell —
    //      nProbe=1 keeps the whole class in scope and the ADC
    //      tie-break gives the same closed form as q_pq_adc ----
    "q_pq_ivf" -> ((s, dir) => {
      val pts = pqPlantedPoints(s, dir)
      val coarse = Array.tabulate(4)(c =>
        Array.tabulate(32)(p => if (p == c) 10.0 else 0.0))
      Pq.ivfAdcTopK(pts.filter(col("vec_id") >= 320 && col("vec_id") < 384),
          pts, 1, coarse, pqPlantedBooks, nProbe = 1,
          idCol = "vec_id", vecCol = "v")
        .select("query_id", "neighbor_id").orderBy("query_id")
    }),


    // ---- natural-corpus IVF recall measurement vs brute force (the
    //      "measure, don't guess" check the LSH path got via planting;
    //      deterministic: seeded fit sample + Lloyd's ties to lowest cell) ----
    "q_ivf_recall" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val truth = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e, 5)
        .select("query_id", "neighbor_id")
      val approx = Similarity.ivfTopK(e, 5, nCells = 16, nProbe = 4)
        .filter(col("query_id") < 50).select("query_id", "neighbor_id")
      val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
      val total = truth.count()
      Seq(("ivf_recall_at_5_ge_half", hits.toDouble / total >= 0.5))
        .toDF("check_name", "ok")
    }),


    // ---- embedding L2-normalize, exploded for exact comparison ----
    "q_vec_l2norm" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(Similarity.l2Normalize(col("embedding"))))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "val")
        .orderBy("vec_id", "i")),


    // ---- symmetric int8 embedding quantization with per-vector scale ----
    "q_vec_quant" -> ((s, dir) => {
      val (q, scale) = Similarity.quantizeInt8(col("embedding"))
      t(s, dir, "embeddings")
        .select(col("vec_id"), scale.as("scale"), posexplode(q))
        .withColumnRenamed("pos", "i").withColumnRenamed("col", "q")
        .orderBy("vec_id", "i")
    }),


    // ---- per-dimension z-score standardization of embeddings ----
    "q_vec_standardize" -> ((s, dir) =>
      Similarity.standardizePerDim(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id", "i")),


    // ---- MMR diversity selection, planted gate: 16 candidates in 4
    //      exact one-hot clusters (cluster = vec_id div 4), relevance
    //      1 - 0.001*id. With lambda=0.7 the greedy provably picks
    //      0,4,8,12 (one per cluster: cross-cluster sim is exactly 0,
    //      within-cluster exactly 1, margins ~1e-3 >> float error),
    //      then falls back to relevance order 1,2,3,5 — closed form,
    //      derived independently in the oracle ----
    "q_mmr_diverse" -> ((s, dir) => {
      val pts = t(s, dir, "embeddings").filter(col("vec_id") < 16)
        .select(col("vec_id"),
          transform(sequence(lit(0), lit(15)), i =>
            when(i === floor(col("vec_id") / 4).cast("int"), lit(10.0))
              .otherwise(lit(0.0))).as("v"),
          (lit(1.0) - col("vec_id") * lit(0.001)).as("rel"))
      Similarity.mmrSelect(pts, "vec_id", "v", "rel", 8, 0.7, 16)
        .select("rank", "vec_id")
    }),


    // ---- batch-hard triplet mining over the embeddings table: per
    //      anchor the least-similar positive and most-similar negative,
    //      margins expose where a triplet loss still has gradient ----
    "q_triplet_mining" -> ((s, dir) =>
      Similarity.tripletMining(t(s, dir, "embeddings"), col("vec_id") < 20)
        .orderBy("anchor_id")),


    // ---- JL random projection 64 -> 8 dims: seeded LCG sign grid
    //      (no stored model), exact decimal lane sums ----
    "q_rand_project" -> ((s, dir) =>
      Similarity.randomProject(t(s, dir, "embeddings"), "vec_id",
          "embedding", 8)
        .orderBy("vec_id", "j")),


    // ---- centroid-based silhouette per label cluster: model-sized
    //      centroid table broadcast over the corpus, kernel distances,
    //      decimal-summed per-label means ----
    // ---- embedding outlier screen: distance to own label centroid,
    //      median/MAD robust z within the label — the mislabeled-vector
    //      QA pass (same quantization ladder as q_silhouette +
    //      q_robust_outliers) ----
    "q_embed_outliers" -> ((s, dir) =>
      Similarity.centroidOutliers(t(s, dir, "embeddings"),
          "vec_id", "label", "embedding")
        .orderBy("vec_id")),


    "q_silhouette" -> ((s, dir) =>
      Similarity.silhouette(t(s, dir, "embeddings"), "vec_id", "label",
          "embedding")
        .orderBy("label")),


    // ---- Reciprocal Rank Fusion of two BM25 rankings (multi-query
    //      hybrid-retrieval combiner): candidate-sized stages only,
    //      rounded reciprocal contributions decimal-summed ----
    "q_rrf_fuse" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      def ranked(terms: Seq[String]) = {
        // rank over the k-bounded retrieval output (global window on
        // ≤30 rows — bounded by construction)
        val w = Window.orderBy(col("score").desc, col("doc_id"))
        TextAnalysis.bm25TopK(docs, "text", "doc_id", terms, 30)
          .withColumn("rank", row_number().over(w))
          .select("doc_id", "rank")
      }
      Similarity.rrfFuse(
          Seq(ranked(Seq("hash", "join")), ranked(Seq("spark", "stream"))),
          "doc_id", "rank", 20)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    })
  )

  def oracles: Map[String, String] = dmap(

    "q_planted_ann" ->
      """SELECT query_id, neighbor_id FROM (
        |  SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id
        |  FROM embeddings WHERE vec_id % 4 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000, vec_id FROM embeddings WHERE vec_id % 4 = 0)
        |ORDER BY query_id""".stripMargin,


    "q_embed_cosine_pairs" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |  p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, $cosSql AS cosine
        |    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT id1, id2, cosine FROM p WHERE cosine >= 0.3 ORDER BY id1, id2""".stripMargin,


    "q_ann_topk" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |  q AS (SELECT * FROM v WHERE vec_id < 10),
        |  scored AS (SELECT a.vec_id AS id1, b.vec_id AS id2, $cosSql AS cosine
        |    FROM q a JOIN v b ON b.vec_id <> a.vec_id),
        |  ranked AS (SELECT id1 AS query_id, id2 AS neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY id1 ORDER BY cosine DESC, id2) AS "rank"
        |  FROM scored)
        |SELECT query_id, "rank", neighbor_id, cosine FROM ranked WHERE "rank" <= 5
        |ORDER BY query_id, "rank"""".stripMargin,


    // hard negatives: same cosine replay, restricted to label-crossing
    // pairs (the query keeps its own-label rows out of the rank window)
    "q_hard_negatives" ->
      s"""WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ve
        |    FROM embeddings),
        |  q AS (SELECT * FROM v WHERE vec_id < 10),
        |  scored AS (SELECT a.vec_id AS id1, b.vec_id AS id2, $cosSql AS cosine
        |    FROM q a JOIN v b ON b.label <> a.label),
        |  ranked AS (SELECT id1 AS query_id, id2 AS negative_id, cosine,
        |    row_number() OVER (PARTITION BY id1 ORDER BY cosine DESC, id2) AS "rank"
        |  FROM scored)
        |SELECT query_id, "rank", negative_id, cosine FROM ranked WHERE "rank" <= 5
        |ORDER BY query_id, "rank"""".stripMargin,


    // LSH replay: md5-derived plane components (u64/2^64*2-1), 16 tables
    // x 8 sign bits, per-(table, bucket) candidates, exact-cosine top-5.
    // Dots fold left-to-right in double on both engines, so buckets and
    // scores are bit-exact.
    "q_ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |planes AS (SELECT t, b, list_transform(range(64), d ->
        |    CAST(('0x' || substr(md5('hp:' || CAST(42 + 7919 * t AS VARCHAR) || ':' ||
        |        CAST(b AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 16)) AS UBIGINT)::DOUBLE
        |      / 18446744073709551616.0 * 2 - 1) AS w
        |  FROM range(16) AS rt(t), range(8) AS rb(b)),
        |dots AS (SELECT vec_id, t, b,
        |    list_sum(list_transform(range(64), i -> ve[i + 1] * w[i + 1])) AS dp
        |  FROM v CROSS JOIN planes),
        |keys AS (SELECT vec_id, t,
        |    SUM(CASE WHEN dp >= 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS bucket
        |  FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id
        |  FROM keys l JOIN keys r ON l.t = r.t AND l.bucket = r.bucket
        |    AND l.vec_id <> r.vec_id),
        |scored AS (SELECT query_id, neighbor_id, $cosSql AS cosine
        |  FROM cand JOIN v a ON a.vec_id = query_id JOIN v b ON b.vec_id = neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id)
        |      AS "rank"
        |  FROM scored)
        |SELECT query_id, CAST("rank" AS BIGINT) AS "rank", neighbor_id, cosine
        |FROM ranked WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,


    // EXACT BRUTE FORCE truth for the banded semantic diff: all-pairs
    // NOT EXISTS at cos >= 0.9 over the same planted sides — the banded
    // Spark plan must reproduce it exactly (planted margins make the
    // LSH miss probability ~1e-21, a deterministic property of the data)
    "q_semantic_diff" ->
      s"""WITH base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |tw AS (SELECT b.vec_id + 1000000 AS vec_id,
        |    list_transform(range(64), i -> b.ve[i + 1] * (1.0 +
        |      0.02 * sin(CAST(i AS DOUBLE) + CAST(b.vec_id AS DOUBLE)))) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 0),
        |nv AS (SELECT b.vec_id + 2000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |cp AS (SELECT vec_id, ve FROM base WHERE vec_id % 3 = 2),
        |db2 AS (SELECT * FROM tw UNION ALL SELECT * FROM nv
        |  UNION ALL SELECT * FROM cp),
        |lost AS (SELECT a.vec_id FROM base a WHERE NOT EXISTS (
        |    SELECT 1 FROM db2 b WHERE $cosSql >= 0.9)),
        |added AS (SELECT a.vec_id FROM db2 a WHERE NOT EXISTS (
        |    SELECT 1 FROM base b WHERE $cosSql >= 0.9))
        |SELECT vec_id, 'db1' AS observed_in FROM lost
        |UNION ALL SELECT vec_id, 'db2' AS observed_in FROM added
        |ORDER BY observed_in, vec_id""".stripMargin,


    // EXACT BRUTE FORCE truth for the banded semantic join: all-pairs
    // argmax cosine at >= 0.9 over the same planted sides (rank-1 per
    // probe, ties to the lower match id)
    "q_semantic_join" ->
      s"""WITH base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |tw AS (SELECT b.vec_id + 1000000 AS vec_id,
        |    list_transform(range(64), i -> b.ve[i + 1] * (1.0 +
        |      0.02 * sin(CAST(i AS DOUBLE) + CAST(b.vec_id AS DOUBLE)))) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 0),
        |nv AS (SELECT b.vec_id + 2000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |cp AS (SELECT vec_id, ve FROM base WHERE vec_id % 3 = 2),
        |db2 AS (SELECT * FROM tw UNION ALL SELECT * FROM nv
        |  UNION ALL SELECT * FROM cp),
        |scored AS (SELECT a.vec_id AS probe_id, b.vec_id AS match_id,
        |    $cosSql AS cosine
        |  FROM db2 a CROSS JOIN base b),
        |ranked AS (SELECT probe_id, match_id, cosine,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY cosine DESC, match_id) AS rk
        |  FROM scored WHERE cosine >= 0.9)
        |SELECT probe_id, match_id, cosine FROM ranked WHERE rk = 1
        |ORDER BY probe_id""".stripMargin,

    // EXACT truth for the LSH-banded survivorship dedup: brute-force
    // all-pairs at >= 0.9, then recursive min-label connected
    // components, keep rows whose component label is their own id
    "q_semantic_dedup_lsh" ->
      s"""WITH RECURSIVE base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |tw AS (SELECT b.vec_id + 1000000 AS vec_id,
        |    list_transform(range(64), i -> b.ve[i + 1] * (1.0 +
        |      0.02 * sin(CAST(i AS DOUBLE) + CAST(b.vec_id AS DOUBLE)))) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 0),
        |cp AS (SELECT vec_id + 3000000 AS vec_id, ve FROM base
        |  WHERE vec_id % 3 = 0),
        |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM tw
        |  UNION ALL SELECT * FROM cp),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2 FROM corpus a
        |  JOIN corpus b ON a.vec_id < b.vec_id WHERE $cosSql >= 0.9),
        |edges AS (SELECT id1 AS a, id2 AS b FROM p
        |          UNION SELECT id2, id1 FROM p),
        |reach AS (SELECT vec_id AS id, vec_id AS lab FROM corpus
        |          UNION SELECT e.a, r.lab FROM edges e
        |            JOIN reach r ON r.id = e.b),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT c.vec_id FROM corpus c JOIN comp ON comp.id = c.vec_id
        |WHERE comp.component = c.vec_id ORDER BY c.vec_id""".stripMargin,

    // EXACT truth for the incremental dedup: brute-force NOT EXISTS vs
    // the corpus, then recursive min-label components among the
    // remaining batch rows, min-id survivor
    "q_semantic_dedup_inc" ->
      s"""WITH RECURSIVE base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |tw AS (SELECT b.vec_id + 1000000 AS vec_id,
        |    list_transform(range(64), i -> b.ve[i + 1] * (1.0 +
        |      0.02 * sin(CAST(i AS DOUBLE) + CAST(b.vec_id AS DOUBLE)))) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 0),
        |ng AS (SELECT b.vec_id + 2000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |nc AS (SELECT b.vec_id + 4000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |batch AS (SELECT * FROM tw UNION ALL SELECT * FROM ng
        |  UNION ALL SELECT * FROM nc),
        |kept1 AS (SELECT a.vec_id, a.ve FROM batch a WHERE NOT EXISTS (
        |    SELECT 1 FROM base b WHERE $cosSql >= 0.9)),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2 FROM kept1 a
        |  JOIN kept1 b ON a.vec_id < b.vec_id WHERE $cosSql >= 0.9),
        |edges AS (SELECT id1 AS a, id2 AS b FROM p
        |          UNION SELECT id2, id1 FROM p),
        |reach AS (SELECT vec_id AS id, vec_id AS lab FROM kept1
        |          UNION SELECT e.a, r.lab FROM edges e
        |            JOIN reach r ON r.id = e.b),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT k.vec_id FROM kept1 k JOIN comp ON comp.id = k.vec_id
        |WHERE comp.component = k.vec_id ORDER BY k.vec_id""".stripMargin,

    // the persisted-index path implements the SAME contract as the
    // in-memory incremental operator, so the exact truth is identical:
    // brute-force NOT EXISTS vs the corpus, then recursive min-label
    // components among the remaining batch rows, min-id survivor
    "q_semantic_dedup_idx" ->
      s"""WITH RECURSIVE base AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |tw AS (SELECT b.vec_id + 1000000 AS vec_id,
        |    list_transform(range(64), i -> b.ve[i + 1] * (1.0 +
        |      0.02 * sin(CAST(i AS DOUBLE) + CAST(b.vec_id AS DOUBLE)))) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 0),
        |ng AS (SELECT b.vec_id + 2000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |nc AS (SELECT b.vec_id + 4000000 AS vec_id,
        |    list_transform(b.ve, x -> -x) AS ve
        |  FROM base b WHERE b.vec_id % 3 = 1),
        |batch AS (SELECT * FROM tw UNION ALL SELECT * FROM ng
        |  UNION ALL SELECT * FROM nc),
        |kept1 AS (SELECT a.vec_id, a.ve FROM batch a WHERE NOT EXISTS (
        |    SELECT 1 FROM base b WHERE $cosSql >= 0.9)),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2 FROM kept1 a
        |  JOIN kept1 b ON a.vec_id < b.vec_id WHERE $cosSql >= 0.9),
        |edges AS (SELECT id1 AS a, id2 AS b FROM p
        |          UNION SELECT id2, id1 FROM p),
        |reach AS (SELECT vec_id AS id, vec_id AS lab FROM kept1
        |          UNION SELECT e.a, r.lab FROM edges e
        |            JOIN reach r ON r.id = e.b),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT k.vec_id FROM kept1 k JOIN comp ON comp.id = k.vec_id
        |WHERE comp.component = k.vec_id ORDER BY k.vec_id""".stripMargin,


    // closed-form PCA replay: rank the per-dim second moments (exact
    // integer sums), top-2 axes are the components, projection is the
    // row's own mass on the matching axis
    "q_pca_project" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS INT) AS g,
        |    CAST(vec_id % 10 + 1 AS DOUBLE) AS f FROM embeddings),
        |mom AS (SELECT g, SUM(f * f) AS s FROM pts GROUP BY g),
        |rk AS (SELECT g, row_number() OVER (ORDER BY s DESC, g) AS r
        |  FROM mom),
        |c AS (SELECT CAST(r - 1 AS INT) AS component, g FROM rk
        |  WHERE r <= 2)
        |SELECT p.vec_id, c.component,
        |  CASE WHEN p.g = c.g THEN p.f ELSE 0.0 END AS value
        |FROM pts p CROSS JOIN c
        |ORDER BY vec_id, component""".stripMargin,

    // whitened-PQ truth: the q_pca_project moment ranking picks the two
    // components; exact-reconstruction means value = f·(1/sqrt(λ)) on
    // the matching axis (λ = SUM(f²)/n over ALL rows, exact in double
    // for these integer f), 0 elsewhere — mirrored op for op (multiply
    // by the reciprocal sqrt, the kernel's arithmetic), 9 dp
    "q_pq_whitened" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS INT) AS g,
        |    CAST(vec_id % 10 + 1 AS DOUBLE) AS f FROM embeddings),
        |mom AS (SELECT g, SUM(f * f) / (SELECT COUNT(*) FROM pts) AS lam
        |  FROM pts GROUP BY g),
        |rk AS (SELECT g, lam, row_number() OVER (ORDER BY lam DESC, g)
        |    AS r FROM mom),
        |c AS (SELECT CAST(r - 1 AS INT) AS subspace, g, lam FROM rk
        |  WHERE r <= 2)
        |SELECT p.vec_id, c.subspace,
        |  round(CASE WHEN p.g = c.g THEN p.f * (1.0 / sqrt(c.lam))
        |    ELSE 0.0 END, 9) AS value
        |FROM pts p CROSS JOIN c
        |ORDER BY vec_id, subspace""".stripMargin,

    // rotated-PQ truth: distinct per-axis moments make the eigenvalue
    // allocation closed-form — moment-ranked axes deal into buckets
    // {rk1, rk4} {rk2, rk3} (greedy balanced partition with strictly
    // decreasing shifted sizes), exact reconstruction means value = f
    // on the own axis at its dealt position, 0 elsewhere, 9 dp
    "q_pq_rotated" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS INT) AS g,
        |    CAST((vec_id % 10 + 1) * (vec_id % 4 + 1) AS DOUBLE) AS f
        |  FROM embeddings),
        |mom AS (SELECT g, SUM(f * f) AS s FROM pts GROUP BY g),
        |rk AS (SELECT g, row_number() OVER (ORDER BY s DESC, g) AS r
        |  FROM mom),
        |perm AS (SELECT CAST(CASE r WHEN 1 THEN 0 WHEN 4 THEN 1
        |    WHEN 2 THEN 2 WHEN 3 THEN 3 END AS INT) AS component, g
        |  FROM rk)
        |SELECT p.vec_id, c.component,
        |  round(CASE WHEN p.g = c.g THEN p.f ELSE 0.0 END, 9) AS value
        |FROM pts p CROSS JOIN perm c
        |ORDER BY vec_id, component""".stripMargin,

    // closed-form replay of the hyperplane s-curve grid (acos/pow/pi
    // mirrored op for op, 6 dp)
    "q_hyperplane_plan" ->
      """WITH bits AS (SELECT CAST(b AS BIGINT) AS n_bits
        |  FROM range(2, 17) AS t(b)),
        |tabs AS (SELECT CAST(l AS BIGINT) AS n_tables
        |  FROM (VALUES (1), (2), (4), (8), (16), (32), (64)) AS v(l)),
        |g AS (SELECT n_bits, n_tables FROM bits CROSS JOIN tabs)
        |SELECT n_bits, n_tables,
        |  round(1.0 - pow(1.0 - pow(1.0 - acos(0.9) / pi(),
        |    CAST(n_bits AS DOUBLE)), CAST(n_tables AS DOUBLE)), 6)
        |    AS p_at_target,
        |  round(1.0 - pow(1.0 - pow(1.0 - acos(0.6) / pi(),
        |    CAST(n_bits AS DOUBLE)), CAST(n_tables AS DOUBLE)), 6)
        |    AS p_at_distractor
        |FROM g ORDER BY n_bits, n_tables""".stripMargin,


    // medoid truth: closed-form cells, exact cosine argmax per cell via
    // a windowed rank (ties to the lower id — the struct-max tie rule)
    "q_cell_medoids" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS BIGINT) AS cell,
        |    list_transform(range(64), j ->
        |      (CASE WHEN j = vec_id % 4 THEN 10.0 ELSE 0.0 END)
        |        + 0.01 * CAST(embedding[j + 1] AS DOUBLE)) AS ve
        |  FROM embeddings),
        |cents AS (SELECT c, list_transform(range(64), j ->
        |    CASE WHEN j = c THEN 10.0 ELSE 0.0 END) AS cv
        |  FROM range(4) AS rc(c)),
        |scored AS (SELECT p.vec_id, p.cell,
        |    list_dot_product(p.ve, c.cv) /
        |      (sqrt(list_dot_product(p.ve, p.ve)) *
        |       sqrt(list_dot_product(c.cv, c.cv))) AS cosine
        |  FROM pts p JOIN cents c ON c.c = p.cell),
        |r AS (SELECT cell, vec_id, cosine,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY cosine DESC, vec_id) AS rk,
        |    count(*) OVER (PARTITION BY cell) AS n_members
        |  FROM scored)
        |SELECT cell, vec_id AS id, cosine, n_members FROM r WHERE rk = 1
        |ORDER BY cell""".stripMargin,


    "q_planted_ivf" ->
      """SELECT query_id, neighbor_id FROM (
        |  SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id
        |  FROM embeddings WHERE vec_id % 4 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000, vec_id FROM embeddings WHERE vec_id % 4 = 0)
        |ORDER BY query_id""".stripMargin,


    // Gram replay: second-level unnest crosses each vector with itself,
    // upper triangle only, 6-dp rounding for product-sum order
    "q_gram_matrix" ->
      """WITH x1 AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x,
        |    embedding AS e FROM embeddings),
        |x2 AS (SELECT vec_id, i, x,
        |    CAST(unnest(range(len(e))) AS INT) AS j,
        |    CAST(unnest(e) AS DOUBLE) AS y FROM x1)
        |SELECT i, j, round(sum(x * y), 6) AS g, count(*) AS n
        |FROM x2 WHERE j >= i GROUP BY i, j ORDER BY i, j""".stripMargin,


    "q_top_component" ->
      """SELECT * FROM (VALUES ('top_axis_is_0', true),
        |  ('axis0_loading_gt_0.9', true)) AS t(check_name, ok)""".stripMargin,


    // class centroids: 0-based dim index via range(len), double cast
    // before the mean, 6-dp rounding for float-sum order
    "q_label_centroids" ->
      """WITH x AS (SELECT label,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
        |SELECT label, i, round(avg(x), 6) AS centroid_val,
        |  count(*) AS n_vectors
        |FROM x GROUP BY label, i ORDER BY label, i""".stripMargin,


    // planted k-means truth: cluster index equals the planted group
    // (init order = groups 0..3 of vec_ids 0..3; separation analysis in
    // the query comment)
    "q_kmeans_planted" ->
      """SELECT vec_id, CAST(vec_id % 4 AS INT) AS cluster
        |FROM embeddings ORDER BY vec_id""".stripMargin,


    // planted PQ codes in closed form: code j = (vec_id >> 2j) & 3
    "q_pq_planted" ->
      """SELECT vec_id, CAST(j AS INT) AS subspace,
        |  CAST((vec_id >> (2 * CAST(j AS INT))) & 3 AS INT) AS code
        |FROM embeddings, (SELECT unnest(range(4)) AS j) sub
        |ORDER BY vec_id, subspace""".stripMargin,


    // in-class ADC ties break to the lowest id: neighbor = vec_id % 256
    "q_pq_adc" ->
      """SELECT vec_id AS query_id, vec_id % 256 AS neighbor_id
        |FROM embeddings WHERE vec_id >= 256 AND vec_id < 320
        |ORDER BY query_id""".stripMargin,


    // IVF pruning keeps the class in scope (cell = subspace-0 group),
    // so the two-stage answer has the same closed form
    "q_pq_ivf" ->
      """SELECT vec_id AS query_id, vec_id % 256 AS neighbor_id
        |FROM embeddings WHERE vec_id >= 320 AND vec_id < 384
        |ORDER BY query_id""".stripMargin,


    "q_ivf_recall" ->
      """SELECT * FROM (VALUES ('ivf_recall_at_5_ge_half', true))
        |AS t(check_name, ok)""".stripMargin,


    "q_vec_l2norm" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |  n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |  x AS (SELECT vec_id, nrm, CAST(unnest(range(len(v))) AS INT) AS i,
        |    unnest(v) AS xv FROM n)
        |SELECT vec_id, i, CASE WHEN nrm = 0 THEN xv ELSE xv / nrm END AS val
        |FROM x ORDER BY vec_id, i""".stripMargin,


    "q_vec_standardize" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        |  FROM embeddings),
        |  st AS (SELECT i, avg(x) AS mu, stddev_pop(x) AS sigma
        |    FROM x GROUP BY i)
        |SELECT vec_id, i,
        |  round(CASE WHEN sigma = 0 THEN 0.0 ELSE (x - mu) / sigma END, 6) AS z
        |FROM x JOIN st USING (i) ORDER BY vec_id, i""".stripMargin,


    "q_vec_quant" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |  m AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS maxabs FROM e),
        |  sc AS (SELECT vec_id, v,
        |    CASE WHEN maxabs = 0 THEN 0.0 ELSE 127.0 / maxabs END AS scale FROM m),
        |  x AS (SELECT vec_id, scale, CAST(unnest(range(len(v))) AS INT) AS i,
        |    unnest(v) AS xv FROM sc)
        |SELECT vec_id, scale, i,
        |  greatest(-127, least(127, CAST(floor(xv * scale + 0.5) AS BIGINT))) AS q
        |FROM x ORDER BY vec_id, i""".stripMargin,


    // MMR planted truth, derived by hand from the fixture (see the
    // query comment): lambda*rel dominates until each exact one-hot
    // cluster holds a pick (0,4,8,12), then every candidate carries the
    // same sim penalty of 1.0 and relevance order resumes (1,2,3,5)
    "q_mmr_diverse" ->
      """SELECT * FROM (VALUES
        |  (1, CAST(0 AS BIGINT)), (2, CAST(4 AS BIGINT)),
        |  (3, CAST(8 AS BIGINT)), (4, CAST(12 AS BIGINT)),
        |  (5, CAST(1 AS BIGINT)), (6, CAST(2 AS BIGINT)),
        |  (7, CAST(3 AS BIGINT)), (8, CAST(5 AS BIGINT)))
        |  AS t(rank, vec_id)
        |ORDER BY rank""".stripMargin,


    // triplet truth: brute-force rank-1 positive/negative per anchor
    // with the same deterministic tie-break (smaller candidate id)
    "q_triplet_mining" ->
      s"""WITH v AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |q AS (SELECT * FROM v WHERE vec_id < 20),
        |s AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cid,
        |    a.label AS al, b.label AS cl, $cosSql AS cos
        |  FROM q a JOIN v b ON b.vec_id <> a.vec_id),
        |p AS (SELECT anchor_id, cid, cos, row_number() OVER
        |    (PARTITION BY anchor_id ORDER BY cos ASC, cid) AS rn
        |  FROM s WHERE cl = al),
        |ng AS (SELECT anchor_id, cid, cos, row_number() OVER
        |    (PARTITION BY anchor_id ORDER BY cos DESC, cid) AS rn
        |  FROM s WHERE cl <> al)
        |SELECT p.anchor_id, p.cid AS pos_id, round(p.cos, 6) AS pos_cos,
        |  ng.cid AS neg_id, round(ng.cos, 6) AS neg_cos,
        |  round(p.cos - ng.cos, 6) AS margin
        |FROM p JOIN ng USING (anchor_id)
        |WHERE p.rn = 1 AND ng.rn = 1 ORDER BY anchor_id""".stripMargin,


    // JL truth: identical LCG parity signs, exact decimal lane sums
    "q_rand_project" ->
      """WITH x AS (SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS BIGINT) AS i,
        |    unnest(list_transform(embedding,
        |      v -> CAST(CAST(v AS DOUBLE) AS DECIMAL(18,9)))) AS x
        |  FROM embeddings),
        |j AS (SELECT CAST(gs AS BIGINT) AS j
        |  FROM generate_series(0, 7) AS t2(gs)),
        |s AS (SELECT vec_id, j,
        |    CASE WHEN ((i * 8 + j + 7) * 2654435761)
        |      % 4294967296 < 2147483648 THEN 1 ELSE -1 END AS sgn, x
        |  FROM x, j)
        |SELECT vec_id, j,
        |  round(CAST(SUM(sgn * x) AS DOUBLE) / sqrt(CAST(8 AS DOUBLE)), 6)
        |    AS y
        |FROM s GROUP BY 1, 2 ORDER BY vec_id, j""".stripMargin,


    // silhouette truth: same rounded per-dim centroids, the identical
    // p·p − 2·p·c + c·c distance (list_dot_product parity with the
    // DotProduct kernel is proven by the cosine oracles), per-point
    // scores rounded then decimal-summed per label
    // centroid-outlier truth: silhouette's distance ladder (6dp
    // centroids, list_dot_product distances rounded 6dp), then the
    // robust-outliers median/MAD replay on the rounded distances
    "q_embed_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |cx AS (SELECT label, CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |cm AS (SELECT label, i, round(avg(x), 6) AS c FROM cx GROUP BY 1, 2),
        |cent AS (SELECT label AS clabel, list(c ORDER BY i) AS cv
        |  FROM cm GROUP BY label),
        |cc AS (SELECT clabel, cv, list_dot_product(cv, cv) AS cdot FROM cent),
        |d AS (SELECT e.vec_id, e.label,
        |    round(sqrt(greatest(list_dot_product(e.v, e.v)
        |      - 2.0 * list_dot_product(e.v, cc.cv) + cc.cdot, 0.0)), 6)
        |      AS dist
        |  FROM e JOIN cc ON cc.clabel = e.label),
        |m AS (SELECT label, round(quantile_cont(dist, 0.5), 6) AS med
        |  FROM d GROUP BY label),
        |md AS (SELECT d.label, any_value(m.med) AS med,
        |    round(quantile_cont(abs(d.dist - m.med), 0.5), 6) AS mad
        |  FROM d JOIN m USING (label) GROUP BY d.label)
        |SELECT d.vec_id, d.label, d.dist, md.med, md.mad,
        |  CASE WHEN md.mad > 0
        |    THEN round((d.dist - md.med) / (1.4826 * md.mad), 6) END
        |    AS robust_z,
        |  COALESCE(abs(CASE WHEN md.mad > 0
        |    THEN round((d.dist - md.med) / (1.4826 * md.mad), 6) END)
        |    > 3.5, false) AS is_outlier
        |FROM d JOIN md USING (label) ORDER BY vec_id""".stripMargin,


    "q_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |cx AS (SELECT label, CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
        |cm AS (SELECT label, i, round(avg(x), 6) AS c FROM cx GROUP BY 1, 2),
        |cent AS (SELECT label AS clabel, list(c ORDER BY i) AS cv FROM cm GROUP BY label),
        |cc AS (SELECT clabel, cv, list_dot_product(cv, cv) AS cdot FROM cent),
        |d AS (SELECT e.vec_id, e.label AS plabel, cc.clabel,
        |    sqrt(greatest(list_dot_product(e.v, e.v)
        |      - 2.0 * list_dot_product(e.v, cc.cv) + cc.cdot, 0.0)) AS dist
        |  FROM e, cc),
        |ab AS (SELECT vec_id, plabel,
        |    min(CASE WHEN clabel = plabel THEN dist END) AS a,
        |    min(CASE WHEN clabel <> plabel THEN dist END) AS b
        |  FROM d GROUP BY 1, 2),
        |s AS (SELECT plabel, CASE WHEN greatest(a, b) > 0.0
        |    THEN round((b - a) / greatest(a, b), 6) ELSE 0.0 END AS sil FROM ab)
        |SELECT plabel AS label, count(*) AS n_points,
        |  round(CAST(SUM(CAST(sil AS DECIMAL(18,6))) AS DOUBLE) / count(sil), 6)
        |    AS mean_silhouette
        |FROM s GROUP BY plabel ORDER BY label""".stripMargin,


    // RRF truth: the same two BM25 derivations (shared CTE builder),
    // row_number ranks over each top-30, rounded reciprocal
    // contributions decimal-summed per doc
    "q_rrf_fuse" -> {
      val k1 = 1.2; val b = 0.75
      def bm25Cte(p: String, termsSql: String): String =
        s"""${p}base AS (SELECT doc_id, $toksSql AS tk
          |    FROM documents WHERE text IS NOT NULL),
          |${p}st AS (SELECT count(*) AS n, SUM(len(tk)) AS sumdl FROM ${p}base),
          |${p}p0 AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM ${p}base),
          |${p}p AS (SELECT doc_id, dl, term, count(*) AS tf FROM ${p}p0
          |  WHERE term IN ($termsSql) GROUP BY doc_id, dl, term),
          |${p}d AS (SELECT term, count(*) AS df FROM ${p}p GROUP BY term),
          |${p}w AS (SELECT p.doc_id,
          |    round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${k1 + 1.0}) /
          |      (tf + $k1 * (1.0 - $b + $b * dl / avgdl)), 6) AS w
          |  FROM ${p}p p JOIN ${p}d USING (term),
          |    (SELECT n, CAST(sumdl AS DOUBLE) / n AS avgdl FROM ${p}st) s),
          |${p}top AS (SELECT doc_id,
          |    CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS score
          |  FROM ${p}w GROUP BY doc_id
          |  ORDER BY score DESC, doc_id LIMIT 30),
          |${p}rk AS (SELECT doc_id,
          |    row_number() OVER (ORDER BY score DESC, doc_id) AS rank
          |  FROM ${p}top)""".stripMargin
      s"""WITH ${bm25Cte("a_", "'hash', 'join'")},
        |${bm25Cte("b_", "'spark', 'stream'")},
        |u AS (SELECT doc_id, round(1.0 / (60 + rank), 6) AS c FROM a_rk
        |  UNION ALL SELECT doc_id, round(1.0 / (60 + rank), 6) FROM b_rk)
        |SELECT doc_id,
        |  CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) AS rrf_score,
        |  count(*) AS n_lists
        |FROM u GROUP BY doc_id
        |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin
    }
  )
}
