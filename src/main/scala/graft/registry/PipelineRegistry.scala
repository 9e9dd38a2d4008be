package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operator registry — the dedup, similarity,
  * text-analysis, multimodal and event-stream families, first-class
  * alongside the diff surface (split out of SparkEntry in r16).
  */
private[graft] object PipelineRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  /** Training-data pipeline operators (dedup, similarity, text analysis,
    * multimodal, event streams) — first-class alongside the diff surface.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(
    // ---- token counting (whitespace + BPE-ish regex) ----
    "q_text_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    // ---- quality scoring (length/punct/stopword heuristics) ----
    "q_text_quality" -> ((s, dir) => {
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_tokens").cast("long"),
          col("punct_ratio"), col("stop_ratio"), col("mean_token_len"),
          col("quality_score"))
        .orderBy("doc_id")
    }),

    // ---- language ID (stopword-marker heuristic) ----
    "q_text_langid" -> ((s, dir) => {
      TextAnalysis.langId(t(s, dir, "documents"), "text")
        .select(col("doc_id") +: col("pred_lang") +:
          TextAnalysis.langMarkers.map { case (l, _) => col(s"c_$l").cast("long") }: _*)
        .orderBy("doc_id")
    }),

    // ---- document fingerprint (normalized-content digest) ----
    "q_text_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")).orderBy("doc_id")
    }),

    // ---- exact dedup: digest groupBy, min-id representative ----
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactDedup(t(s, dir, "documents"), "text", "doc_id").orderBy("text_hash")),

    // ---- n-gram (token-set) Jaccard near-dup pairs, lang-blocked ----
    "q_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), "text", "doc_id",
        Seq("lang"), 0.9).orderBy("id1", "id2")),

    // ---- MinHash+LSH near-dup pairs. Full oracle: DuckDB recomputes the
    //      exact all-pairs shingle Jaccard, so this asserts LSH recall is
    //      total on this corpus (banding analysis: every natural pair here
    //      has J >= 0.7, miss prob <= (1-0.7^4)^32 ~ 1.5e-4 per pair, and
    //      the hashes are seeded => deterministic) ----
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"), "text", "doc_id", 0.5)
        .orderBy("id1", "id2")),

    // ---- LSH banding planner: the (bands, rows) trade-off table for a
    //      64-perm signature at target J=0.8 vs distractor J=0.3 —
    //      read before picking minHashLshPairs' banding ----
    "q_lsh_plan" -> ((s, dir) =>
      Dedup.lshPlan(s, 64, 0.8, 0.3).orderBy("bands")),

    // ---- corpus-level dedup: LSH pairs -> connected components -> one
    //      representative per cluster. Full oracle: DuckDB rebuilds the
    //      exact pair graph and folds components with a recursive CTE ----
    "q_dedup_corpus" -> ((s, dir) =>
      Dedup.dedupCorpus(t(s, dir, "documents"), "text", "doc_id", 0.5)
        .select("doc_id", "component").orderBy("doc_id")),

    // ---- SimHash near-dup pairs. Full oracle: the sketch hash is
    //      md5-first-8-bytes, so DuckDB replays the per-token hashes, the
    //      bit votes, the 64-bit signatures, and the Hamming pair set
    //      value-exactly (recall of the quarter blocking is separately
    //      proven lossless by q_planted_simhash) ----
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "text", "doc_id", 3)
        .orderBy("id1", "id2")),

    // ---- planted-duplicate recall harness, MinHash/LSH: per-doc-disjoint
    //      vocabulary (tokens prefixed with the doc id) so cross-doc
    //      Jaccard is exactly 0, plus one planted twin per doc = the doc
    //      minus its last token => shingle Jaccard >= (S-1)/S >= 0.9.
    //      At J >= 0.9 the 32x4 banding miss probability is
    //      (1-0.9^4)^32 ~ 1e-15 per pair, so the deterministic output is
    //      exactly the planted pair set — which DuckDB derives
    //      independently from the shingle-count guard ----
    "q_planted_minhash" -> ((s, dir) => {
      val toks = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), TokenArray(col("text")).as("tk"))
        .withColumn("tk", transform(col("tk"),
          tok => concat(lit("d"), col("doc_id"), lit("x"), tok)))
      val base = toks.select(col("doc_id"), concat_ws(" ", col("tk")).as("text"))
      val twins = toks
        .filter(size(WordShingles(concat_ws(" ", col("tk")), 3)) >= 10)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat_ws(" ", slice(col("tk"), lit(1), size(col("tk")) - 1)).as("text"))
      Dedup.minHashLshPairs(base.unionByName(twins), "text", "doc_id", 0.5)
        .select("id1", "id2").orderBy("id1", "id2")
    }),

    // ---- planted-duplicate harness, SimHash: exact-copy twins (Hamming 0,
    //      guaranteed found) + brute-force all-pairs Hamming truth; asserts
    //      the pigeonhole blocking (any pair at Hamming <= 3 shares an
    //      exact 16-bit quarter) loses nothing vs the O(n^2) scan.
    //      SCALE GUARD: the brute-force truth side is verification-only
    //      and quadratic by construction, so above ~20k corpus rows the
    //      completeness check runs on a deterministic hash-subsample of
    //      the corpus (the production simHashPairs path and the planted
    //      check always run FULL) — the harness stays safe if the driver
    //      raises the bench scale factor ----
    "q_planted_simhash" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select("doc_id", "text")
      def withTwins(b: DataFrame) = b.unionByName(
        b.select((col("doc_id") + lit(10000000L)).as("doc_id"), col("text")))
      val corpus = withTwins(base)
      val blocked = Dedup.simHashPairs(corpus, "text", "doc_id", 3)
        .select("id1", "id2")
      val maxBruteRows = 20000L
      val nBase = base.count()
      val (veriBase, veriFull) =
        if (2 * nBase <= maxBruteRows) (base, true)
        else {
          val k = (2 * nBase + maxBruteRows - 1) / maxBruteRows
          (base.filter(pmod(xxhash64(col("doc_id")), lit(k)) === 0), false)
        }
      val veriCorpus = if (veriFull) corpus else withTwins(veriBase)
      val veriBlocked =
        if (veriFull) blocked
        else Dedup.simHashPairs(veriCorpus, "text", "doc_id", 3).select("id1", "id2")
      val sigs = veriCorpus.select(col("doc_id").as("id"),
        graft.functions.SimHash64(TokenArray(col("text"))).as("sig"))
      val truth = sigs.select(col("id").as("id1"), col("sig").as("s1"))
        .crossJoin(sigs.select(col("id").as("id2"), col("sig").as("s2")))
        .filter(col("id1") < col("id2"))
        .filter(bit_count(col("s1").bitwiseXOR(col("s2"))) <= 3)
        .select("id1", "id2")
      val planted = base.select(col("doc_id").as("id1"),
        (col("doc_id") + lit(10000000L)).as("id2"))
      val blockingComplete = truth.exceptAll(veriBlocked).isEmpty &&
        veriBlocked.exceptAll(truth).isEmpty
      val plantedFound = planted.exceptAll(blocked).isEmpty
      Seq(("blocking_matches_bruteforce", blockingComplete),
          ("planted_pairs_found", plantedFound))
        .toDF("check_name", "ok").orderBy("check_name")
    }),

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

    // ---- cell-mass drift localization: both sides assigned to a
    //      planted 4-cell codebook (10·onehot(vec_id%4) + 1% noise —
    //      cosine margins make cell = vec_id%4 in closed form, the
    //      q_kmeans_planted construction), db2 drops the vec_id%8==4
    //      half of cell 0; the oracle states the counts/shares/psi
    //      directly ----
    "q_cell_mass_drift" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val db2 = pts.filter(!(col("vec_id") % 8 === 4))
      val centroids = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      Similarity.cellMassDrift(pts, db2, "v", centroids).orderBy("cell")
    }),

    // ---- cross-snapshot cell matching: snapshot-2's quantizer is a
    //      PERMUTED, tilted copy of snapshot-1's (cell2 c' sits on
    //      coordinate perm(c') with a 7:1 two-axis tilt), so the greedy
    //      centroid-cosine assignment is closed-form — partner cosine
    //      7/sqrt(50), all cross cosines <= 1/sqrt(50) — and masses are
    //      the planted-corner counts under each side's own quantizer ----
    "q_cell_matching" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val db2 = pts.filter(!(col("vec_id") % 8 === 4))
      val cents1 = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      val perm = Array(2, 0, 3, 1)
      val cents2 = Array.tabulate(4, 64)((c, j) =>
        if (j == perm(c)) 7.0 else if (j == (perm(c) + 1) % 4) 1.0 else 0.0)
      Similarity.cellMatching(pts, db2, "v", cents1, cents2)
        .orderBy("cell1")
    }),

    // ---- quantization agreement (ARI + NMI): snapshot-2's codebook
    //      MERGES planted cells {0,1} onto the diagonal and keeps 2/3 —
    //      the contingency is closed-form (cell2 = 0/0/1/2 by corner),
    //      so both indices replay from the corner counts alone ----
    "q_cluster_agreement" -> ((s, dir) => {
      val g = (col("vec_id") % 4).cast("int")
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
        transform(col("embedding"), (x, j) =>
          when(j === g, lit(10.0)).otherwise(lit(0.0)) +
            lit(0.01) * x.cast("double")).as("v"))
      val cents1 = Array.tabulate(4, 64)((c, j) => if (j == c) 10.0 else 0.0)
      val cents2 = Array(
        Array.tabulate(64)(j => if (j == 0 || j == 1) 7.0 else 0.0),
        Array.tabulate(64)(j => if (j == 2) 10.0 else 0.0),
        Array.tabulate(64)(j => if (j == 3) 10.0 else 0.0))
      Similarity.clusterAgreement(pts, "v", cents1, cents2)
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

    // ---- RFF-MMD kernel two-sample drift between embedding corpora:
    //      the even/odd split of the same table is the exchangeable
    //      null (mmd2 ~ the 1/n noise floor); the same split with a
    //      +0.25 per-coordinate shift on one side must score an order
    //      of magnitude higher. Weights are md5-derived uniforms (pure
    //      IEEE arithmetic — both engines derive them bit-identically);
    //      z quantized at 6 dp and summed as exact decimals, so the
    //      statistic is row-order-independent and the oracle replays it
    //      exactly ----
    "q_mmd_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      val even = emb.filter(col("vec_id") % 2 === 0)
      val odd = emb.filter(col("vec_id") % 2 === 1)
      val shifted = odd.select(col("vec_id"),
        transform(col("v"), x => x + lit(0.25)).as("v"))
      val nullCase = Similarity.mmdDrift(even, odd, "v", 64)
        .select(lit("null").as("pair"), col("n1"), col("n2"), col("mmd2"))
      val shiftCase = Similarity.mmdDrift(even, shifted, "v", 64)
        .select(lit("shifted").as("pair"), col("n1"), col("n2"), col("mmd2"))
      nullCase.unionByName(shiftCase).orderBy("pair")
    }),

    // ---- multimodal: binary payload + stubbed decode via mapPartitions ----
    "q_multimodal_meta" -> ((s, dir) =>
      Multimodal.decodeImageMeta(
        Multimodal.withPayload(t(s, dir, "documents"), "text")).orderBy("doc_id")),

    // ---- multimodal: per-frame sampling (explode shape + digests) ----
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSamples(t(s, dir, "documents"), 4)
        .withColumn("frame_idx", col("frame_idx").cast("long"))
        .orderBy("doc_id", "frame_idx")),

    // ---- video container metadata: REAL MP4 ISO-BMFF box walk + AVI
    //      RIFF header walk (VideoHeader.parse) over planted
    //      deterministic containers — doc_id % 3 picks mp4 / avi /
    //      junk-bytes, parameters are closed-form in doc_id so the
    //      oracle states the parsed truth directly; junk rows prove the
    //      NULL-not-crash contract ----
    "q_video_meta" -> ((s, dir) => {
      val mp4 = udf((d: Long) => VideoHeader.syntheticMp4(
        (16 * (d % 60 + 4)).toInt, (16 * (d % 40 + 3)).toInt,
        d % 9000 + 1000, ((d / 3) % 3 + 1).toInt))
      val avi = udf((d: Long) => VideoHeader.syntheticAvi(
        (d % 320 + 16).toInt, (d % 240 + 12).toInt, 40000L,
        d % 500 + 50, ((d / 3) % 2 + 1).toInt))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, mp4(col("doc_id")))
          .when(col("doc_id") % 3 === 1, avi(col("doc_id")))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      Multimodal.decodeVideoMeta(payloads).orderBy("doc_id")
    }),

    // ---- frame-seek plan from REAL parsed container durations: 5
    //      midpoint-uniform timestamps per video (integer div — exact),
    //      non-videos drop with their NULL duration ----
    "q_frame_timestamps" -> ((s, dir) => {
      val mp4 = udf((d: Long) => VideoHeader.syntheticMp4(
        (16 * (d % 60 + 4)).toInt, (16 * (d % 40 + 3)).toInt,
        d % 9000 + 1000, ((d / 3) % 3 + 1).toInt))
      val avi = udf((d: Long) => VideoHeader.syntheticAvi(
        (d % 320 + 16).toInt, (d % 240 + 12).toInt, 40000L,
        d % 500 + 50, ((d / 3) % 2 + 1).toInt))
      val payloads = t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 3 === 0, mp4(col("doc_id")))
          .when(col("doc_id") % 3 === 1, avi(col("doc_id")))
          .otherwise(encode(col("text"), "UTF-8")).as("payload"))
      Multimodal.frameTimestamps(Multimodal.decodeVideoMeta(payloads), 5)
        .orderBy("doc_id", "frame_idx")
    }),

    // ---- image near-dup via REAL pixel decode (javax.imageio): planted
    //      resized-and-re-encoded twins. Each selected doc gets a
    //      deterministic doc-seeded image, piecewise-constant on the
    //      9x8 dHash grid, and a twin at half resolution — cell-aligned
    //      area-average resize preserves the dHash EXACTLY (spec-
    //      proven), unrelated doc seeds land ~24/64 bits apart, so the
    //      banded-Hamming join returns exactly the planted pair set at
    //      Hamming 0, which the oracle states in closed form ----
    "q_image_neardup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .select("doc_id")
      val imgs = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
      Dedup.hammingPairs(Multimodal.imagePHash(imgs))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id1", "id2")
    }),

    // ---- DSIR importance weights: raw corpus scored against the
    //      English-subset target model (hashed-unigram bucket
    //      log-likelihood ratio, add-0.5 smoothing over 1000 buckets) ----
    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(docs, docs.filter(col("lang") === "en"),
          "text", "doc_id", 1000)
        .orderBy("doc_id")
    }),

    // ---- field-level survivorship (golden record): each field comes
    //      from the best source row that HAS it — planted nulls on
    //      phone prove fields pick different sources than whole-row
    //      survivorship would ----
    "q_golden_record" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .withColumn("alt_name",
          when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("c_name")))
      Dedup.goldenRecord(c, "c_nationkey", Seq("alt_name", "c_mktsegment"),
          "c_acctbal", "c_custkey")
        .orderBy("c_nationkey")
    }),

    // ---- corpus line dedup (C4-style boilerplate removal): planted
    //      4-line docs share header/footer lines across all docs; the
    //      two unique middle lines survive in order ----
    "q_line_dedup" -> ((s, dir) => {
      val ids = t(s, dir, "documents").filter(col("doc_id") % 19 === 0)
        .select("doc_id")
      val docs = ids.select(col("doc_id"), concat_ws("\n",
        lit("boiler plate header"),
        concat(lit("unique"), col("doc_id"), lit(" content line one")),
        concat(lit("unique"), col("doc_id"), lit(" content line two")),
        lit("boiler plate footer")).as("text"))
      TextAnalysis.lineDedup(docs, "text", "doc_id", 2).orderBy("doc_id")
    }),

    // ---- shifted-duplicate pairs via content-defined chunking: twin =
    //      the same 64-token body behind a DIFFERENT head block (the
    //      prepended-boilerplate case fixed-window shingles lose).
    //      Boundaries re-synchronize within one maxLen of the shared
    //      body's start, so >= 7 of ~9 chunks match (minShared = 2 has
    //      wide margin); id-carrying tokens make cross-doc chunks
    //      unequal, so the output is exactly the planted pair set ----
    "q_cdc_dedup" -> ((s, dir) => {
      val ids = t(s, dir, "documents").filter(col("doc_id") % 17 === 0)
        .select("doc_id")
      // the trailing token carries the id too: the tail-remainder chunk
      // (last boundary to end of doc) would otherwise be a short shared
      // string like "w63" across ALL docs — one of the two spurious
      // shared chunks that paired unrelated twins at sf0.1
      val body = concat(
        concat_ws(" ", transform(sequence(lit(0), lit(63)),
          j => concat(lit("d"), col("doc_id"), lit("w"), j))),
        lit(" tail d"), col("doc_id"), lit("x"))
      val base = ids.select(col("doc_id"), body.as("text"))
      // build the twin text FIRST, bump the id after: a `col("doc_id")`
      // inside the transform() lambda of a projection that also aliases
      // doc_id resolves to the LATERAL alias (the +10M id), silently
      // giving every twin a different body than its base
      val twins = ids
        .select(col("doc_id"),
          concat(lit("shifted head block "), body).as("text"))
        .withColumn("doc_id", col("doc_id") + lit(10000000L))
      Dedup.cdcOverlapPairs(base.unionByName(twins), "text", "doc_id",
          minShared = 2)
        .select("id1", "id2").orderBy("id1", "id2")
    }),

    // ---- image near-dup with PIXEL verification: the corpus-scale
    //      two-stage shape (banded dHash candidates -> exact-grid
    //      verify). Planted per doc: a true resized twin (+10M) AND a
    //      DESIGNED dHash collision (+20M, every cell +40 — gradient
    //      directions unchanged, so both perceptual hashes match while
    //      pixels differ by exactly 40). The hash stage surfaces all
    //      three pairs at Hamming 0; the pixel stage keeps only the
    //      true twin — which the oracle states in closed form ----
    "q_image_verified_dedup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val mkDecoy = udf((d: Long) => Multimodal.syntheticImageShifted(d, 40))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 13 === 0)
        .select("doc_id")
      val imgs = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
        .unionByName(ids.select((col("doc_id") + lit(20000000L)).as("doc_id"),
          mkDecoy(col("doc_id")).as("payload")))
      val cand = Dedup.hammingPairs(Multimodal.imagePHash(imgs))
      Multimodal.verifyImagePairs(cand, imgs, maxMeanAbsDiff = 10.0)
        .orderBy("id1", "id2")
    }),

    // ---- audio near-dup via REAL PCM decode (RIFF/WAV chunk walk, no
    //      codec): planted half-rate resampled twins. Segment-aligned
    //      square-wave amplitudes make the 64-bit energy-envelope hash
    //      EXACTLY resample-invariant (spec-proven), unrelated seeds
    //      ~32/64 bits apart — the banded-Hamming join returns exactly
    //      the planted pairs at Hamming 0 ----
    "q_audio_neardup" -> ((s, dir) => {
      val mk = udf((d: Long) => Multimodal.syntheticWav(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resampleWav(Multimodal.syntheticWav(d), 2))
      val ids = t(s, dir, "documents").filter(col("doc_id") % 11 === 0)
        .select("doc_id")
      val clips = ids.select(col("doc_id"), mk(col("doc_id")).as("payload"))
        .unionByName(ids.select((col("doc_id") + lit(10000000L)).as("doc_id"),
          mkTwin(col("doc_id")).as("payload")))
      Dedup.hammingPairs(Multimodal.audioPHash(clips))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy("id1", "id2")
    }),

    // ---- joint image+text dedup: the pretraining-corpus curation shape.
    //      Docs carry BOTH a text and an image; near-dup pairs from text
    //      MinHash-LSH and image dHash UNION into one graph, connected
    //      components fold, survivorship keeps the min id. Planted:
    //      text twins (+10M, drop-last-token, disjoint vocab) for
    //      d % 2 = 0, image twins (+20M, resized pixels) for d % 3 = 0 —
    //      twin rows carry UNRELATED content in the OTHER modality (own
    //      seed/vocab), so each modality contributes exactly its planted
    //      edges and the union clusters {d, d+10M?, d+20M?} collapse to
    //      component d. Oracle derives the same map in closed form ----
    "q_multimodal_dedup" -> ((s, dir) => {
      val base = t(s, dir, "documents").filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"), TokenArray(col("text")).as("tk"))
        .withColumn("tk", transform(col("tk"),
          tok => concat(lit("d"), col("doc_id"), lit("x"), tok)))
      val origs = base.select(col("doc_id"), concat_ws(" ", col("tk")).as("text"))
      val textTwins = base
        .filter(col("doc_id") % 2 === 0 &&
          size(WordShingles(concat_ws(" ", col("tk")), 3)) >= 10)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          concat_ws(" ", slice(col("tk"), lit(1), size(col("tk")) - 1)).as("text"))
      // image twins get their own disjoint vocabulary (no text edges)
      val imageTwins = base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(20000000L)).as("doc_id"),
          concat(lit("img"), col("doc_id"), lit(" solo row")).as("text"))
      val all = origs.unionByName(textTwins).unionByName(imageTwins)
      // image payload: base docs and their +20M twins share pixels
      // (twin = cell-aligned resize); text twins get their own seed
      val mk = udf((d: Long) => Multimodal.syntheticImage(d))
      val mkTwin = udf((d: Long) =>
        Multimodal.resizeImage(Multimodal.syntheticImage(d), 18, 16))
      val withImg = all.withColumn("payload",
        when(col("doc_id") >= 20000000L, mkTwin(col("doc_id") - 20000000L))
          .otherwise(mk(col("doc_id"))))
      val textPairs = Dedup.minHashLshPairs(withImg, "text", "doc_id", 0.5)
        .select("id1", "id2")
      val imagePairs = Dedup.hammingPairs(Multimodal.imagePHash(withImg))
        .select("id1", "id2")
      val comp = Dedup.connectedComponents(textPairs.unionByName(imagePairs))
        .select(col("id").as("doc_id"), col("component"))
      // isolated docs (no twin in either modality) are their own cluster
      withImg.select("doc_id").join(comp, Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
        .orderBy("doc_id")
    }),

    // ---- pivot: event counts per user across a fixed category list ----
    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // ---- cube: all grouping-set combinations with grouping ids ----
    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
          dsum("o_totalprice").as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // ---- unpivot/melt: wide measures to long form ----
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          expr("stack(2, 'p_size', CAST(p_size AS DOUBLE), 'p_retailprice', p_retailprice) AS (measure, value)"))
        .orderBy("p_partkey", "measure")
    }),

    // ---- JSON extraction over a string column (semi-structured path) ----
    "q_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"))
        .groupBy(pmod(col("k_val"), lit(10)).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k_val")).as("sum_k"))
        .orderBy("k_mod")
    }),

    // ---- skew: two-phase salted aggregation (== plain aggregate) ----
    "q_salted_agg" -> ((s, dir) => {
      Skew.saltedSumCount(Tables.events(s, dir), Seq("event_type"), "value", 16)
        .orderBy("event_type")
    }),

    // ---- skew: salted equi-join (== plain join output) ----
    "q_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "value")
      val dim = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("user_events"))
      Skew.saltedJoin(ev, dim, Seq("user_id"), 8)
        .select("event_id", "user_id", "value", "user_events")
        .orderBy("event_id")
    }),

    // ---- event stream: hourly tumbling-window aggregation ----
    "q_events_window" -> ((s, dir) => {
      graft.streaming.EventsOps.hourlyCounts(Tables.events(s, dir))
        .withColumn("hour_start", col("hour_start").cast("timestamp_ntz"))
        .orderBy("hour_start", "event_type")
    }),

    // ---- as-of join (union-tag-window; Spark lacks the operator) ----
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = Tables.events(s, dir).filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
      AsOfJoin.asOf(ev, clicks, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz"),
          col("value"), col("asof_ts").cast("timestamp_ntz").as("click_ts"),
          col("click_value"))
        .orderBy("event_id")
    }),

    // ---- rollup (multi-level aggregation with grouping ids) ----
    "q_rollup_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          dsum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // ---- INTERSECT / EXCEPT set operations ----
    "q_set_ops" -> ((s, dir) => {
      val a = t(s, dir, "orders").filter("o_orderkey % 3 = 0")
        .select("o_orderkey", "o_orderstatus")
      val b = t(s, dir, "orders").filter("o_orderkey % 5 = 0")
        .select("o_orderkey", "o_orderstatus")
      a.intersect(b).withColumn("op", lit("intersect"))
        .unionByName(a.except(b).withColumn("op", lit("except")))
        .orderBy("op", "o_orderkey")
    }),

    // ---- event stream: gap-based sessionization via window functions ----
    "q_events_sessions" -> ((s, dir) => {
      graft.streaming.EventsOps.sessionize(Tables.events(s, dir), 30)
        .select(col("user_id"), col("session_id").cast("long"),
          col("session_start").cast("timestamp_ntz"),
          col("session_end").cast("timestamp_ntz"), col("n_events"))
        .orderBy("user_id", "session_id")
    }),

    // ---- rolling EXACT median over a 7-row trailing frame (per-key
    //      robust smoother; exact `percentile` window aggregate, linear
    //      interpolation identical to DuckDB's quantile_cont) ----
    "q_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("med7", round(expr("percentile(value, 0.5)").over(w), 6))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("med7"))
        .orderBy("event_id")
    }),

    // ---- hopping (sliding) windows via the built-in window(ts, dur,
    //      slide): each event lands in dur/slide = 4 overlapping hops —
    //      the streaming-capable sliding aggregate; the oracle replays
    //      the hop expansion with an explicit range(4) unnest ----
    "q_hopping_counts" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").cast("timestamp_ntz").as("win_start"),
          col("w.end").cast("timestamp_ntz").as("win_end"),
          col("event_type"), col("n_events"))
        .orderBy("win_start", "event_type")),

    // ---- the SAME sessions via Spark's built-in session_window (the
    //      Catalyst-native merging-session aggregate; also the streaming
    //      form's engine-managed state path). Boundary semantics differ
    //      from the run-scan form: session_window's window is half-open,
    //      so it splits at gap >= 30 min where sessionize splits at
    //      gap > 30 min. This query's oracle therefore replays the >=
    //      truth (>= 1800000000 epoch_us) rather than sharing
    //      q_events_sessions' strict-> oracle — a future testdata drop
    //      landing a pair at exactly 1800.000000 s stays green on both
    //      gates instead of breaking this one ----
    "q_session_window_builtin" -> ((s, dir) => {
      val sess = Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(min("ts").as("session_start"), max("ts").as("session_end"),
          count(lit(1)).as("n_events"))
      sess
        .withColumn("session_id",
          row_number().over(Window.partitionBy("user_id")
            .orderBy("session_start")).cast("long"))
        .select(col("user_id"), col("session_id"),
          col("session_start").cast("timestamp_ntz"),
          col("session_end").cast("timestamp_ntz"), col("n_events"))
        .orderBy("user_id", "session_id")
    }),

    // ---- range join via bin blocking: point-in-interval as an equi-join
    //      (vs DuckDB's native IEJoin nested-range oracle) ----
    "q_range_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val iv = t(s, dir, "supplier").select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("lo"), (col("s_acctbal") + 50).as("hi"))
      RangeJoin.pointInRange(pts, "c_acctbal", iv, "lo", "hi", 100.0)
        .select("c_custkey", "s_suppkey", "c_acctbal")
        .orderBy("c_custkey", "s_suppkey")
    }),

    // ---- interval-overlap join via bin blocking + stateless bin dedup ----
    "q_interval_overlap" -> ((s, dir) => {
      val l = t(s, dir, "supplier").select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("s_lo"), (col("s_acctbal") + 50).as("s_hi"))
      val r = t(s, dir, "customer").select(col("c_custkey"),
        (col("c_acctbal") - 25).as("c_lo"), (col("c_acctbal") + 25).as("c_hi"))
      RangeJoin.intervalOverlap(l, "s_lo", "s_hi", r, "c_lo", "c_hi", 100.0)
        .select("s_suppkey", "c_custkey").orderBy("s_suppkey", "c_custkey")
    }),

    // ---- bag diff, hash-keyed shuffle variant (same answer as q_diff_bag
    //      with ~row-width-times less shuffle volume on wide tables) ----
    "q_diff_bag_hashed" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val c = new DriftCompare(s,
        MemorySide("db1", Map("lineitem" -> li.unionByName(li.filter("l_orderkey % 7 = 0")))),
        MemorySide("db2", Map("lineitem" -> li)))
      c.dataDriftBagHashed("lineitem").get.drop("hashed_row")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- Gopher-style repetition features (dup token/bigram fractions,
    //      top-bigram character share) ----
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens").cast("long"),
          col("dup_token_frac"), col("dup_bigram_frac"),
          col("top_bigram"), col("top_bigram_n"), col("top_bigram_frac"))
        .orderBy("doc_id")),

    // ---- deterministic content-addressed train/val/test split ----
    "q_hash_split" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.hashBucket(col("doc_id")).as("bucket"),
        TextAnalysis.hashSplit(col("doc_id")).as("split"))
        .orderBy("doc_id")),

    // ---- GROUP-AWARE (leakage-safe) split: hash the group key instead
    //      of the row key, so every member of a group (here: language —
    //      in a real pipeline, a URL/domain or a near-dup cluster id)
    //      lands in the SAME split and no group straddles train/test ----
    "q_group_split" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"), col("lang"),
        TextAnalysis.hashBucket(col("lang")).as("bucket"),
        TextAnalysis.hashSplit(col("lang")).as("split"))
        .orderBy("doc_id")),

    // ---- click-to-purchase attribution: time-interval join + per-purchase
    //      aggregation (the batch side of the stream-stream join twin) ----
    "q_purchase_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.EventsOps.purchaseAttribution(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), 180)
        .select(col("event_id"), col("user_id"),
          col("p_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("p_value").as("purchase_value"),
          col("n_prior_clicks"), col("last_click_value"))
        .orderBy("event_id")
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

    // ---- sketch-estimated join cardinality vs truth: lineitem joins
    //      orders on the order key; the CMS inner product upper-bounds
    //      the true size from two 4x256 counter tables ----
    "q_join_size_est" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey").as("k"))
      val ord = t(s, dir, "orders").select(col("o_orderkey").as("k"))
      val est = CountMin.joinSizeEstimate(
        CountMin.sketch(li, "k", 4, 256), CountMin.sketch(ord, "k", 4, 256))
      val truth = li.join(ord, "k").agg(count(lit(1)).as("true_size"))
      est.crossJoin(truth)
        .withColumn("overestimate", col("join_size_est") - col("true_size"))
    }),

    // ---- pre-join skew diagnostics on the event user key ----
    "q_skew_report" -> ((s, dir) =>
      Skew.skewReport(Tables.events(s, dir), "user_id", topN = 10)),

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

    // ---- per-type Tukey-fence outlier screen over event values ----
    "q_iqr_outliers" -> ((s, dir) =>
      Profile.iqrOutliers(Tables.events(s, dir), "event_type", "value", "event_id")
        .orderBy("event_type", "event_id")),

    // ---- supervised class centroids: per-label mean embedding ----
    "q_label_centroids" -> ((s, dir) =>
      Similarity.labelCentroids(t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("label", "i")),

    // ---- embedding drift between two derived snapshots (overlapping
    //      thirds of the corpus; snapshot B carries a planted +0.5
    //      shift on axis 0, so centroid_shift must exceed ~0.5 while
    //      centroid_cosine stays high) ----
    "q_centroid_drift" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val snapA = e.filter(col("vec_id") % 3 =!= 0)
      val snapB = e.filter(col("vec_id") % 3 =!= 1)
        .withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            x.cast("double") + when(i === 0, lit(0.5)).otherwise(lit(0.0))))
      Similarity.centroidDrift(snapA, snapB, "label", "embedding")
        .orderBy("label")
    }),

    // ---- token-budget curation: the best-scored docs whose running
    //      total fits 100k chars (distributed prefix sum, no global
    //      window) ----
    "q_token_budget" -> ((s, dir) =>
      Sampling.tokenBudgetSelect(
        t(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", "n_chars", 100000L)
        .select(col("doc_id"), col("n_chars"), col("cum_tokens"))
        .orderBy("cum_tokens", "doc_id")),

    // ---- concat-and-chunk window packing (contrast q_pack_sequences,
    //      the greedy no-split packer): docs concatenate in id order
    //      into 256-token context windows; per-doc (bin, offset,
    //      bin_last, crosses) placement via the same distributed prefix
    //      sum as q_token_budget (no global window) ----
    "q_pack_windows" -> ((s, dir) =>
      Sampling.packWindows(
        t(s, dir, "documents").filter(col("text").isNotNull)
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long")
              .as("n_tokens")),
        "doc_id", "n_tokens", 256L)
        .orderBy("doc_id")),

    // ---- linear quality classifier, distributed logistic GD: planted
    //      separable labels (sign of embedding dim 1, margin-filtered at
    //      0.1 against a ~0.5 feature scale) over the first 8 dims; the
    //      driver-gate row asserts the fitted model separates its
    //      training corpus perfectly, which the planted margin makes a
    //      deterministic outcome ----
    // ---- multinomial Naive Bayes language-ID: fit on the even-id half
    //      (labels = lang), score the odd-id half; all logs quantized
    //      at 9 dp so the oracle replays model and argmax exactly ----
    "q_naive_bayes" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val model = Classifier.naiveBayesFit(
        docs.filter(col("doc_id") % 2 === 0), "text", "lang")
      Classifier.naiveBayesScore(model,
          docs.filter(col("doc_id") % 2 === 1), "text", "doc_id")
        .orderBy("doc_id")
    }),

    "q_quality_classifier" -> ((s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
        .filter(abs(element_at(col("embedding"), 1)) > 0.1f)
        .select(col("vec_id"),
          slice(col("embedding"), 1, 8).cast("array<double>").as("x"),
          (element_at(col("embedding"), 1) > 0f).cast("double").as("y"))
      val w = Classifier.fitLogistic(e, "x", "y", iters = 30, lr = 5.0)
      val wrong = Classifier.predictLogistic(e, "vec_id", "x", w)
        .join(e.select("vec_id", "y"), "vec_id")
        .filter(col("pred") =!= (col("y") === 1.0)).count()
      Seq(("classifier_train_accuracy_eq_1", wrong == 0L))
        .toDF("check_name", "ok")
    }),

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

    // ---- PQ codebook staleness: per-subspace mean reconstruction error
    //      of the planted points under the exact planted codebook — the
    //      chosen centroid is closed-form (code j = g_j, margins ~2e-4
    //      vs ~200), so the error is the noise term alone and the oracle
    //      replays the kernel's left-fold distance op for op ----
    "q_pq_recon_drift" -> ((s, dir) =>
      Pq.reconstructionDrift(pqPlantedPoints(s, dir), "v", pqPlantedBooks)
        .orderBy("subspace")),

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

    // ---- deterministic stratified sampling (content-addressed, no rand) ----
    "q_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 50, "de" -> 20), defaultPct = 10)
        .select("doc_id", "lang").orderBy("doc_id")),

    // ---- weighted sampling: inclusion ~ token count, content-addressed
    //      A-ES keys (ln(u)/w, u md5-derived) replayed exactly by the
    //      oracle ----
    "q_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(
        t(s, dir, "documents").withColumn("w",
          TextAnalysis.wsTokenCount(col("text")).cast("double")),
        "doc_id", col("w"), 100)
        .select(col("doc_id"), col("w").as("weight")).orderBy("doc_id")),

    // ---- deterministic shuffle-shard export layout ----
    "q_shuffle_shard" -> ((s, dir) =>
      Sampling.shuffleShard(t(s, dir, "documents").select("doc_id"), "doc_id", 8)
        .orderBy("shard", "seq")),

    // ---- temperature mixing weights per source (alpha = 0.7) ----
    "q_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureWeights(t(s, dir, "documents"), "source", 0.7)
        .orderBy("source")),

    // ---- temperature-mixed corpus: ~300 rows, per-source quotas ----
    "q_temperature_sample" -> ((s, dir) =>
      Sampling.temperatureSample(t(s, dir, "documents").select("doc_id", "source"),
          "source", "doc_id", 0.7, 300)
        .select("doc_id", "source").orderBy("doc_id")),

    // ---- exact quantile gate: keep docs at/above the median quality ----
    "q_quality_gate" -> ((s, dir) =>
      Sampling.filterTopQuantile(
        TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("quality_score")),
        "quality_score", 0.5)
        .orderBy("doc_id")),

    // ---- incremental corpus update: new batch (doc_id % 3 = 0) vs the
    //      existing corpus; asymmetric LSH band join, exact-Jaccard
    //      oracle (same banding-completeness regime as q_dedup_minhash) ----
    "q_incremental_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Dedup.incrementalDedup(d.filter(col("doc_id") % 3 === 0),
        d.filter(col("doc_id") % 3 =!= 0), "text", "doc_id", 0.5)
        .orderBy("new_id")
    }),

    // ---- PERSISTED LSH index round trip (the production incremental-
    //      ingest shape: the corpus is sketched once into a saved band
    //      index + shingle store; each increment pays only its own
    //      sketch and the asymmetric candidate join, never re-reading
    //      corpus text). Must reproduce q_incremental_dedup exactly ----
    "q_dedup_index" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      // per-run unique dir: a FIXED tmp path races concurrent harness
      // processes (one run's overwrite deletes the index another run's
      // lazy dedupAgainstIndex is still scanning). Deleted at JVM exit
      // (not eagerly — the returned frame scans the index lazily) via
      // ONE process-lifetime hook draining a queue, so repeated runs in
      // a long session don't accumulate hook threads.
      val tmpDir = java.nio.file.Files.createTempDirectory("graft_lsh_index")
      val path = tmpDir.toString
      exitCleanupDirs.add(tmpDir)
      Dedup.saveLshIndex(
        Dedup.buildLshIndex(d.filter(col("doc_id") % 3 =!= 0), "text", "doc_id"),
        path)
      Dedup.dedupAgainstIndex(d.filter(col("doc_id") % 3 === 0),
          "text", "doc_id", 0.5, Dedup.loadLshIndex(s, path))
        .orderBy("new_id")
    }),

    // ---- cross-source contamination matrix (pairwise shared 5-grams) ----
    "q_contamination_matrix" -> ((s, dir) =>
      TextAnalysis.contaminationMatrix(t(s, dir, "documents"), "text", "source", 5)
        .orderBy("src1", "src2")),

    // ---- duplicate n-gram fraction (Lee et al. ACL'22 repetition gate) ----
    "q_dup_ngrams" -> ((s, dir) =>
      TextAnalysis.duplicateNgramFraction(t(s, dir, "documents"), "text", "doc_id", 5)
        .orderBy("doc_id")),

    // ---- maximal duplicated-substring spans (Lee et al. ACL'22 §4,
    //      the span-level substring-dedup signal) ----
    "q_dup_spans" -> ((s, dir) =>
      TextAnalysis.duplicatedSpans(t(s, dir, "documents"), "text", "doc_id", 8)
        .orderBy("doc_id", "span_start")),

    // ---- per-doc top TF-IDF terms (tf/df score, integer-exact ordering) ----
    "q_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), "text", "doc_id", 3)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy("doc_id", "rank")),

    // ---- full Gopher quality-rule gate (Rae et al. 2021 A1.1) ----
    "q_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents"), "text")
        .select("doc_id", "n_words", "mean_word_len", "hash_ratio",
          "ellipsis_ratio", "bullet_line_frac", "ellipsis_line_frac",
          "alpha_word_frac", "stop_hits", "r_word_count", "r_mean_len",
          "r_symbol", "r_bullet", "r_ellipsis", "r_alpha", "r_stopwords",
          "keep")
        .orderBy("doc_id")),

    // ---- top PMI bigram collocations over the corpus ----
    "q_collocations" -> ((s, dir) =>
      TextAnalysis.collocations(t(s, dir, "documents"), "text",
        minCount = 5, k = 50)),

    // ---- equi-width histogram over a numeric column ----
    "q_histogram" -> ((s, dir) =>
      Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice", 20)
        .orderBy("bucket")),

    // ---- approx sketches (HLL ndv, approximate percentile) checked
    //      against their exact counterparts within stated error bounds ----
    "q_approx_bounds" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      // two separate jobs: mixing a DISTINCT aggregate with the
      // typed-imperative sketches (percentile/HLL) in one agg forces an
      // Expand + per-row sketch-buffer serialization plan that measured
      // 40x slower than the two aggregations run back to back
      val rNdv = li.agg(
        countDistinct(col("l_orderkey")).as("exact_ndv"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_ndv"))
        .head()
      val rP50 = li.agg(
        expr("percentile(l_quantity, 0.5D)").as("exact_p50"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_p50"))
        .head()
      val ndvOk = math.abs(rNdv.getLong(1) - rNdv.getLong(0)).toDouble / rNdv.getLong(0) <= 0.05
      // percentile_approx guarantees RANK error <= n/accuracy; on the
      // unit-spaced discrete l_quantity domain that bounds the VALUE to
      // within one unit of the (interpolated) exact quantile — a
      // relative check breaks at scale when exact lands between units
      val p50Ok = math.abs(rP50.getDouble(1) - rP50.getDouble(0)) <= 1.0
      Seq(("hll_ndv_within_5pct", ndvOk), ("approx_p50_within_1unit", p50Ok))
        .toDF("check_name", "ok").orderBy("check_name")
    }),

    // ---- end-to-end corpus curation: quality filter -> language filter ->
    //      exact dedup -> deterministic split, reported as per-split counts
    //      (composes the individually-oracled stages into one plan) ----
    "q_curation_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = TextAnalysis.langId(
        TextAnalysis.qualityFeatures(docs, "text"), "text")
        .filter(col("quality_score") >= 0.8 && col("pred_lang") === "en")
      val keepers = Dedup.exactDedup(scored, "text", "doc_id")
        .select(col("keeper").as("doc_id"))
      scored.join(keepers, "doc_id")
        .select(TextAnalysis.hashSplit(col("doc_id")).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n_docs"))
        .orderBy("split")
    }),

    // ---- canonical text normalization (narrow, codegen'd regexes) ----
    "q_text_normalize" -> ((s, dir) =>
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("norm_text"))
        .orderBy("doc_id")),

    // ---- sentence segmentation (decontamination/packing granularity):
    //      RE2-safe match-the-sentence extraction, original match index
    //      preserved through the empty-match filter ----
    "q_split_sentences" -> ((s, dir) =>
      // the synthetic corpus has no terminators — plant a deterministic
      // multi-sentence suffix (adjacent "?!" exercises the empty-match
      // filter) so the segmentation actually splits
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextAnalysis.sentences(concat(col("text"),
            lit(". Tail one! Really?! The end")))))
        .select(col("doc_id"), col("pos").cast("long").as("sent_idx"),
          trim(col("col")).as("sentence"))
        .filter(col("sentence") =!= "")
        .orderBy("doc_id", "sent_idx")),

    // ---- URL parse + canonicalize over planted URLs: mixed-case
    //      scheme/host, default ports, query strings, fragments — the
    //      oracle derives host/domain/canonical form INDEPENDENTLY from
    //      doc_id arithmetic (end-to-end gate, not a regex replay) ----
    "q_url_parse" -> ((s, dir) => {
      val url = concat(
        lit("HTTP://WWW.Example"), col("doc_id") % 50, lit(".COM"),
        when(col("doc_id") % 7 === 0, lit(":80")).otherwise(lit("")),
        lit("/Path/"), col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(lit("?id="), col("doc_id"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("#Frag")).otherwise(lit("")))
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.urlHost(url).as("host"),
        TextAnalysis.urlDomain(url).as("domain"),
        TextAnalysis.normalizeUrl(url).as("norm_url"))
        .orderBy("doc_id")
    }),

    // ---- HTML -> text extraction over planted markup: script/style/
    //      comment blocks dropped wholesale (including a decoy "1 < 2"
    //      inside the script), tags stripped, entities decoded, title
    //      and out-link count extracted — the crawl-ingest stage; every
    //      pattern is RE2-safe so DuckDB replays the chain exactly ----
    "q_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"), lit("</title>"),
        when(col("doc_id") % 6 === 0,
          lit("<meta name=\"ROBOTS\" content=\"NOINDEX, nofollow\">"))
          .otherwise(lit("")),
        lit("<script type=\"text/javascript\">var x = 1 < 2 && doc;</script>"),
        lit("<style>p { color: red; }</style></head><body><h1>Doc "),
        col("doc_id"), lit("</h1>"),
        when(col("doc_id") % 3 === 0,
          lit("<a href=\"/a\">a &amp; b</a> <a\nhref=\"/b\">c</a>"))
          .otherwise(lit("")),
        lit("<p>"), col("text"), lit("</p><!-- hidden --></body></html>"))
      t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.htmlTitle(html).as("title"),
        TextAnalysis.htmlLinkCount(html).cast("long").as("n_links"),
        TextAnalysis.htmlNoindex(html).as("noindex"),
        TextAnalysis.extractHtmlText(html).as("extracted"))
        .orderBy("doc_id")
    }),

    // ---- PII detect + redact over deterministically-planted PII (the
    //      synthetic corpus is PII-free, so every 7th doc gets a known
    //      email/IP/SSN suffix — the oracle must find and redact them) ----
    "q_pii_redact" -> ((s, dir) => {
      val withPii = t(s, dir, "documents").withColumn("text2",
        concat(col("text"), when(col("doc_id") % 7 === 0,
          lit(" contact alice.smith@example.org or 203.0.113.7 ssn 123-45-6789"))
          .otherwise(lit(""))))
      TextAnalysis.piiFeatures(withPii, "text2")
        .select("doc_id", "n_emails", "n_ipv4", "n_ssn", "redacted")
        .orderBy("doc_id")
    }),

    // ---- benchmark decontamination: flag train docs sharing a 3-shingle
    //      with the (doc_id % 20 == 0) benchmark slice ----
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.contamination(
        docs.filter(col("doc_id") % 20 =!= 0),
        docs.filter(col("doc_id") % 20 === 0),
        "text", "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- unigram-LM surprisal (perplexity-filter signal) ----
    "q_unigram_lm" -> ((s, dir) =>
      TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    // ---- interpolated bigram LM surprisal (KenLM-style quality gate) ----
    "q_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    // ---- CCNet-style perplexity bucketing: bigram-LM surprisal per doc
    //      (6 dp, canonicalized to exact micro-units) equi-depth binned
    //      into deciles WITHOUT a global sort (quantileBins' bounded
    //      distinct-value CDF) — the perplexity-filter triage report
    //      ("which surprisal band is this corpus concentrated in") ----
    "q_perplexity_buckets" -> ((s, dir) => {
      val sup = TextAnalysis.bigramSurprisal(
        t(s, dir, "documents"), "text", "doc_id")
      Profile.quantileBins(
        sup.withColumn("s_micro",
          round(col("bigram_surprisal") * 1e6).cast("long")),
        "s_micro", 10)
        .orderBy("bin")
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

    // ---- per-column profile (exact variant; min/max restricted to
    //      int/string/date columns so the string rendering is
    //      engine-independent) ----
    "q_profile" -> ((s, dir) =>
      Profile.profileExact(t(s, dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_orderdate"))
        .orderBy("col_name")),

    // ---- exact-N-per-stratum deterministic sample ----
    "q_exact_n_sample" -> ((s, dir) =>
      Sampling.exactNPerStratum(t(s, dir, "documents"), "doc_id", "lang", 7)
        .select("doc_id", "lang").orderBy("lang", "doc_id")),

    // ---- analytic window functions beyond ranking: lag/lead offsets,
    //      ntile buckets, exact-rational percent_rank/cume_dist ----
    "q_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
        .select(col("o_orderpriority"), col("o_orderkey"),
          lag("o_orderkey", 1).over(w).as("prev_key"),
          lead("o_orderkey", 2).over(w).as("next2_key"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderpriority", "o_orderkey")
    }),

    // ---- GROUPING SETS with grouping() null-disambiguation ----
    "q_grouping_sets" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority,
          |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          |  count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
          |  (o_orderstatus, o_orderpriority))
          |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin)
    }),

    // ---- time-series gap fill: per-user daily event counts with missing
    //      days filled by a generated calendar join ----
    "q_gap_fill" -> ((s, dir) =>
      graft.streaming.EventsOps.dailyGapFill(Tables.events(s, dir))
        .orderBy("user_id", "day")),

    // ---- daily resample with LINEAR interpolation (gap-fill's sibling
    //      for "unobserved", not "zero") — one agg + one Window ----
    "q_interpolate_daily" -> ((s, dir) =>
      EventAnalytics.interpolateDaily(Tables.events(s, dir))
        .orderBy("user_id", "day")),

    // ---- fixed-token-window document chunking with overlap ----
    "q_chunk_docs" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "text", "doc_id", 10, 2)
        .orderBy("doc_id", "chunk_id")),

    // ---- per-dimension z-score standardization of embeddings ----
    "q_vec_standardize" -> ((s, dir) =>
      Similarity.standardizePerDim(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id", "i")),

    // ---- greedy sequence packing manifest (context-length fill) ----
    "q_pack_sequences" -> ((s, dir) =>
      TextAnalysis.packSequences(t(s, dir, "documents"), "text", "doc_id", "lang", 64)
        .orderBy("lang", "doc_id")),

    // ---- PageRank over the part -> supplier supply graph; the oracle
    //      asserts the invariants (mass conservation, rank floor) plus a
    //      deterministic top node ----
    "q_pagerank_checks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      val r = Graph.pageRank(edges, 0.85, 5)
      // all three invariants stay on the cluster: one full-pass aggregate
      // over the (checkpointed) rank vector yields mass, node count, rank
      // floor, and the arg-max node (ties toward the smallest id) in a
      // single 1-row result; supplier membership of the top node is a
      // 1-row semi-join — nothing data-scaled ever reaches the driver
      val stats = r.agg(
        sum("rank").as("total"),
        count(lit(1)).as("n"),
        min("rank").as("min_rank"),
        max_by(col("id"), struct(col("rank"), -col("id"))).as("top_node"))
      val suppliers = edges
        .select(col("dst").cast("long").as("top_node")).distinct()
      val topOk = stats.select("top_node")
        .join(suppliers, Seq("top_node"), "left_semi")
        .agg(count(lit(1)).as("n_top_supplier"))
      stats.crossJoin(topOk).select(
        explode(map(
          lit("mass_sums_to_one"),
          abs(col("total") - lit(1.0)) < lit(1e-9),
          lit("all_ranks_above_floor"),
          col("min_rank") >= lit(0.15) / col("n") - lit(1e-12),
          lit("top_node_is_a_supplier"),
          col("n_top_supplier") === 1)).as(Seq("check_name", "ok")))
        .orderBy("check_name")
    }),

    // ---- semantic dedup: cosine pairs -> components -> representative ----
    "q_semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedupCorpus(t(s, dir, "embeddings"), "label", 0.3)
        .select("vec_id", "label").orderBy("vec_id")),

    // ---- asymmetric containment near-dup (embedded-document detection) ----
    "q_containment" -> ((s, dir) =>
      Dedup.containmentPairs(
        t(s, dir, "documents").filter(col("doc_id") % 5 === 0),
        "text", "doc_id", Seq("lang"), 0.95)
        .orderBy("id1", "id2")),

    // ---- global vocabulary top-k (agg -> TakeOrdered, no full sort) ----
    "q_vocab_topk" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(25)),

    // ---- corpus-level stats in one pass ----
    "q_corpus_stats" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"),
          length(col("text")).cast("long").as("nc"))
        .agg(count(lit(1)).as("n_docs"),
          sum("nt").as("total_tokens"),
          sum("nc").as("total_chars"),
          min("nt").as("min_tokens"),
          max("nt").as("max_tokens"))),

    // ---- left-outer attribution: zero-click purchases emitted too ----
    "q_attribution_outer" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.EventsOps.purchaseAttributionOuter(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"), 180)
        .select(col("event_id"), col("user_id"),
          col("p_ts").cast("timestamp_ntz").as("purchase_ts"),
          col("p_value").as("purchase_value"),
          col("n_prior_clicks"), col("last_click_value"))
        .orderBy("event_id")
    }),

    // ---- CDC: keyed snapshot diff with per-column change attribution ----
    "q_row_changes" -> ((s, dir) => {
      val base = t(s, dir, "orders")
      val oldS = base.filter("o_orderkey % 10 != 3")
      val newS = base.filter("o_orderkey % 10 != 7")
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + lit(1.0))
            .otherwise(col("o_totalprice")))
      ChangeCapture.rowChanges(oldS, newS, "o_orderkey")
        .filter(col("change_type") =!= "unchanged")
        .orderBy("o_orderkey")
    }),

    // ---- MERGE INTO (lakehouse upsert): matched updates, a guarded
    //      matched delete, and unconditional unmatched inserts — note
    //      the inserted 'F' rows: the delete clause only guards MATCHED
    //      rows, so they survive, which the oracle replays ----
    "q_merge_upsert" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val updates = ord.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_orderpriority", lit("9-MERGED"))
      val inserts = ord.filter(col("o_orderkey") % 10 === 4)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
      ChangeCapture.mergeInto(ord, updates.unionByName(inserts), "o_orderkey",
          deleteWhen = Some(col("o_orderstatus") === "F"))
        .orderBy("o_orderkey")
    }),

    // ---- sequential funnel: ordered step conversion over events ----
    "q_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("step_idx")),

    // ---- weekly cohort retention matrix ----
    "q_retention" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),

    // ---- exact heavy hitters via approximate candidate pass ----
    "q_heavy_hitters" -> ((s, dir) =>
      EventAnalytics.heavyHitters(Tables.events(s, dir), "user_id", 0.008)
        .orderBy("user_id")),

    // ---- global top-k merge view over space-saving heavy-hitter
    //      emissions: the SAME flatMapGroupsWithState operator the
    //      stream runs, executed on the static frame (Spark's batch
    //      mode: empty initial state, one group-iterator pass per
    //      bucket), its per-bucket summaries merged by globalTopK. Key
    //      cardinality is held under the nBuckets × m counter capacity,
    //      so no counter evicts, every count is exact (err = 0), and the
    //      merge view replays in plain SQL ----
    "q_hh_global_topk" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id") % 3 === 0)
      val emitted = graft.streaming.StreamingHeavyHitters(
        ev.select("user_id"), "user_id").toDF()
      graft.streaming.StreamingHeavyHitters.globalTopK(emitted, 15)
    }),

    // ---- count-min sketch: build the 4x256 counter matrix over the
    //      event stream's user ids, estimate every 10th user, and show
    //      the one-sided error against the exact counts. md5-seeded
    //      buckets -> DuckDB rebuilds the matrix bit-for-bit ----
    "q_count_min" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val sk = CountMin.sketch(ev, "user_id", depth = 4, width = 256)
      val keys = ev.select("user_id").distinct()
        .filter(col("user_id") % 10 === 0)
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
      CountMin.estimate(sk, keys, "user_id", depth = 4, width = 256)
        .join(exact, "user_id")
        .withColumn("overcount", col("est") - col("exact"))
        .orderBy("user_id")
    }),

    // ---- HLL set-overlap probe (decontamination at 100 TB: ship two
    //      64-register sketches, not the key sets): per-side and union
    //      estimates, inclusion-exclusion intersection, implied
    //      Jaccard; the exact intersection rides along to expose the
    //      sketch error. md5-seeded registers -> DuckDB rebuilds the
    //      sketch bit-for-bit ----
    "q_hll_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("user_id") % 3 =!= 0)
      val b = ev.filter(col("user_id") % 2 =!= 0)
      Hll.overlap(a, b, "user_id")
        .crossJoin(a.select("user_id").intersect(b.select("user_id"))
          .agg(count(lit(1)).as("exact_intersect")))
    }),

    // ---- per-group HLL distinct (daily-active users per event type):
    //      registers keyed (group, bucket), empty buckets folded
    //      algebraically — the per-domain ndv probe that replaces a
    //      full countDistinct shuffle at 100 TB; exact countDistinct
    //      rides along to expose the sketch error ----
    "q_hll_grouped" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          concat_ws(":", col("user_id"),
            col("ts").cast("date").cast("string")).as("uk"))
      Hll.groupedEstimate(ev, "event_type", "uk")
        .join(ev.groupBy("event_type")
          .agg(countDistinct("uk").as("exact_distinct")), "event_type")
        .orderBy("event_type")
    }),

    // ---- KMV/theta overlap (the HLL companion when the INTERSECTION
    //      is the quantity of interest): direct sample-membership
    //      Jaccard from the union sketch's minima — no compounding
    //      inclusion-exclusion error; md5 minima replay bit-for-bit ----
    "q_kmv_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = ev.filter(col("user_id") % 3 =!= 0)
      val b = ev.filter(col("user_id") % 2 =!= 0)
      Kmv.overlap(a, b, "user_id", 128)
        .crossJoin(a.select("user_id").intersect(b.select("user_id"))
          .agg(count(lit(1)).as("exact_intersect")))
    }),

    // ---- A-class filter-aggregate (TPC-H Q6 shape): every predicate
    //      pushed to the scan, decimal-exact revenue sum ----
    "q6_forecast_revenue" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(8,4)"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))),

    // ---- TPC-H Q18 shape (large-volume orders): the HAVING subquery
    //      becomes an aggregated semi-side joined back to lineitem —
    //      the big-side aggregation runs ONCE and its survivors (a tiny
    //      fraction of orders) broadcast under AQE into the
    //      customer/orders joins; deterministic top-100 by
    //      (totalprice desc, orderkey) ----
    "q18_big_spenders" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val big = li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // ---- TPC-H Q17 shape (small-quantity-order revenue): a CORRELATED
    //      scalar subquery — per-part 20%-of-average quantity threshold —
    //      written as the correlated form on purpose so Catalyst's
    //      decorrelation rewrites it into aggregate-then-join (one
    //      per-part Aggregate over lineitem joined back to the fact),
    //      never a per-row subquery re-execution. Decimal-exact sums so
    //      both engines emit bit-identical doubles ----
    "q17_small_qty" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q17")
      t(s, dir, "part").createOrReplaceTempView("part_q17")
      s.sql(
        """SELECT
          |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    / 7.0, 6) AS avg_yearly,
          |  count(*) AS n_lines
          |FROM li_q17 JOIN part_q17 ON p_partkey = l_partkey
          |WHERE p_brand = 'Brand#23'
          |  AND l_quantity < (
          |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
          |      AS DOUBLE) / count(*))
          |    FROM li_q17 l2 WHERE l2.l_partkey = p_partkey)""".stripMargin)
    }),

    // ---- TPC-H Q2 shape (minimum-cost supplier): lineitem stands in for
    //      partsupp (supply cost = min extendedprice per part/supplier —
    //      a picked value, so doubles stay bit-identical cross-engine);
    //      the correlated min-cost-in-region subquery decorrelates into
    //      a per-part Aggregate re-joined on (partkey, cost) ----
    "q2_min_cost" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q2")
      t(s, dir, "part").createOrReplaceTempView("part_q2")
      t(s, dir, "supplier").createOrReplaceTempView("sup_q2")
      t(s, dir, "nation").createOrReplaceTempView("nat_q2")
      t(s, dir, "region").createOrReplaceTempView("reg_q2")
      s.sql(
        """WITH ps AS (
          |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |         min(l_extendedprice) AS ps_supplycost
          |  FROM li_q2 GROUP BY 1, 2)
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
          |FROM part_q2
          |JOIN ps ON p_partkey = ps_partkey
          |JOIN sup_q2 ON s_suppkey = ps_suppkey
          |JOIN nat_q2 ON s_nationkey = n_nationkey
          |JOIN reg_q2 ON n_regionkey = r_regionkey
          |WHERE p_size = 15 AND r_name = 'EUROPE'
          |  AND ps_supplycost = (
          |    SELECT min(ps2.ps_supplycost)
          |    FROM ps ps2
          |    JOIN sup_q2 s2 ON s2.s_suppkey = ps2.ps_suppkey
          |    JOIN nat_q2 n2 ON n2.n_nationkey = s2.s_nationkey
          |    JOIN reg_q2 r2 ON r2.r_regionkey = n2.n_regionkey
          |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          |LIMIT 100""".stripMargin)
    }),

    // ---- TPC-H Q8 shape (national market share): one fact scan feeding
    //      a two-armed star — customer-side nation→region filter and
    //      supplier-side share nation — constant dims hinted, SF-scaled
    //      dims left to AQE, one agg with a null-skipping conditional
    //      numerator. The big
    //      shuffles are the lineitem⋈orders key exchange and the final
    //      single-key agg ----
    "q8_market_share" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      // hints only on the CONSTANT dims (nation 25, region 5 rows);
      // part/customer/supplier grow with SF — AQE decides those
      li.join(t(s, dir, "part").filter(col("p_type") === "ECONOMY")
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))),
          col("c_nationkey") === col("cn_key"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(year(col("o_orderdate")).cast("bigint").as("o_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
            .as("volume"),
          col("supp_nation"))
        .groupBy("o_year")
        .agg(round(sum(when(col("supp_nation") === "NATION_3", col("volume"))).cast("double") /
            sum(col("volume")).cast("double"), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // ---- TPC-H Q9 shape (product-type profit by nation and year):
    //      LIKE-filtered part dim joined into the fact (AQE-sized,
    //      part grows with SF), supplier→
    //      nation broadcast chain, orders re-join for the year; decimal
    //      profit so both engines agree bit-for-bit ----
    "q9_profit_by_nation" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(t(s, dir, "part").filter(col("p_name").like("%red%"))
          .select("p_partkey"), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("bigint").as("o_year"),
          (col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
            .as("profit"))
        .groupBy("nation", "o_year")
        .agg(sum(col("profit")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // ---- TPC-H Q11 shape (important stock): the schema has no
    //      partsupp, so per-(part,supplier) line value stands in; the
    //      global-fraction threshold is the classic uncorrelated scalar
    //      subquery — Catalyst plans it as a 1-row broadcast into the
    //      HAVING filter, never a rescan per group. The threshold total
    //      is a decimal-exact sum rendered to double ONCE (double
    //      re-aggregation of per-part doubles would be order-sensitive) ----
    "q11_top_stock" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q11")
      t(s, dir, "supplier").createOrReplaceTempView("sup_q11")
      t(s, dir, "nation").createOrReplaceTempView("nat_q11")
      s.sql(
        """WITH fact AS (
          |  SELECT l_partkey,
          |    CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      CAST(l_quantity AS DECIMAL(18,2)) AS line_value
          |  FROM li_q11 JOIN sup_q11 ON l_suppkey = s_suppkey
          |  JOIN nat_q11 ON s_nationkey = n_nationkey
          |  WHERE n_name = 'NATION_7')
          |SELECT l_partkey AS ps_partkey,
          |  CAST(sum(line_value) AS DOUBLE) AS value
          |FROM fact
          |GROUP BY l_partkey
          |HAVING CAST(sum(line_value) AS DOUBLE) >
          |  (SELECT CAST(sum(line_value) AS DOUBLE) * 1.5
          |     / count(DISTINCT l_partkey) FROM fact)
          |ORDER BY value DESC, ps_partkey""".stripMargin)
    }),

    // ---- TPC-H Q12 shape (late shipments by priority class): the
    //      orders⋈lineitem key join with a row-level date-arithmetic
    //      predicate and two null-skipping conditional counts ----
    "q12_late_shipments" -> ((s, dir) => {
      t(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, dir, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(year(col("l_shipdate")).cast("bigint").as("ship_year"),
          col("o_orderpriority"))
        .groupBy("ship_year")
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
        .orderBy("ship_year")
    }),

    // ---- TPC-H Q13 shape (customer order-count distribution): LEFT
    //      OUTER join with the filter folded into the join condition
    //      (so zero-order customers survive), then a second aggregation
    //      over the first's result ----
    "q13_order_count_dist" -> ((s, dir) => {
      t(s, dir, "customer").select("c_custkey")
        .join(t(s, dir, "orders").filter(col("o_orderpriority") =!= "5-LOW")
          .select("o_custkey", "o_orderkey"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // ---- TPC-H Q15 shape (top supplier): the revenue CTE is built
    //      once and referenced twice (join side + scalar max); the
    //      equality test stays in exact DECIMAL until the final render
    //      so cross-engine max-equality cannot be lost to float ties ----
    "q15_top_supplier" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q15")
      t(s, dir, "supplier").createOrReplaceTempView("sup_q15")
      s.sql(
        """WITH revenue AS (
          |  SELECT l_suppkey AS supplier_no,
          |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
          |      (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
          |      AS total_revenue
          |  FROM li_q15
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |    AND l_shipdate < TIMESTAMP '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name,
          |  CAST(total_revenue AS DOUBLE) AS total_revenue
          |FROM sup_q15 JOIN revenue ON s_suppkey = supplier_no
          |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
          |ORDER BY s_suppkey""".stripMargin)
    }),

    // ---- TPC-H Q16 shape (supplier variety per part profile):
    //      distinct (part,supplier) pairs from the fact, a broadcast
    //      filtered part dim, and a NOT-IN-style anti join against
    //      negative-balance suppliers before a countDistinct ----
    "q16_supplier_variety" -> ((s, dir) => {
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
        .distinct()
      ps.join(t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#15" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("ps_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier").filter(col("s_acctbal") < 0).select("s_suppkey"),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // ---- TPC-H Q19 shape (disjunctive-predicate revenue): three OR
    //      branches each tying part attributes to lineitem quantity —
    //      the join keeps one equi-key (partkey) with the disjunction
    //      as a post-join filter, exercising CNF extraction rather
    //      than a cartesian ----
    "q19_disjunctive_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(t(s, dir, "part").select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q20 shape (promotable-part suppliers): a semi-join
    //      chain — supplier IN (pairs over LIKE-filtered parts whose
    //      accumulated quantity beats a correlated half-of-recent-
    //      shipments threshold). Catalyst decorrelates the inner scalar
    //      into a per-(part,supplier) aggregate joined back, so the
    //      fact is scanned a bounded number of times, never per row ----
    "q20_promo_parts" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q20")
      t(s, dir, "part").createOrReplaceTempView("part_q20")
      t(s, dir, "supplier").createOrReplaceTempView("sup_q20")
      s.sql(
        """WITH ps AS (
          |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
          |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
          |  FROM li_q20 GROUP BY 1, 2)
          |SELECT s_name, s_acctbal
          |FROM sup_q20
          |WHERE s_suppkey IN (
          |  SELECT ps_suppkey FROM ps
          |  WHERE ps_partkey IN
          |    (SELECT p_partkey FROM part_q20 WHERE p_name LIKE 'red%')
          |  AND ps_availqty > (
          |    SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          |    FROM li_q20
          |    WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          |      AND l_shipdate >= TIMESTAMP '1997-01-01'
          |      AND l_shipdate < TIMESTAMP '1998-01-01'))
          |ORDER BY s_name""".stripMargin)
    }),

    // ---- TPC-H Q21 shape (sole-blame suppliers): the EXISTS /
    //      NOT-EXISTS pair over the same fact — an order with other
    //      suppliers where ONLY this supplier's lines were returned.
    //      Both subqueries decorrelate to semi/anti joins on orderkey ----
    "q21_waiting_suppliers" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_q21")
      t(s, dir, "orders").createOrReplaceTempView("ord_q21")
      t(s, dir, "supplier").createOrReplaceTempView("sup_q21")
      t(s, dir, "nation").createOrReplaceTempView("nat_q21")
      s.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM sup_q21
          |JOIN li_q21 l1 ON s_suppkey = l1.l_suppkey
          |JOIN ord_q21 ON o_orderkey = l1.l_orderkey
          |JOIN nat_q21 ON s_nationkey = n_nationkey
          |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          |  AND n_name = 'NATION_7'
          |  AND EXISTS (SELECT 1 FROM li_q21 l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM li_q21 l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_returnflag = 'R')
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name
          |LIMIT 100""".stripMargin)
    }),

    // ---- TPC-H Q22 shape (idle high-balance customers): every
    //      customer here has SOME order, so the classic no-orders
    //      anti join becomes no-RECENT-orders; the positive-balance
    //      average is the uncorrelated scalar subquery, the country
    //      code a deterministic custkey bucket. The cutoff sits INSIDE
    //      the synthetic order-date range (1995..2001) so the anti join
    //      actually excludes customers with recent orders on both
    //      engines — at 2000-01-01 it was vacuously true ----
    "q22_idle_customers" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("cust_q22")
      t(s, dir, "orders").createOrReplaceTempView("ord_q22")
      s.sql(
        """SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
          |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
          |FROM cust_q22
          |WHERE c_custkey % 7 IN (1, 3, 5)
          |  AND c_acctbal > (
          |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
          |    FROM cust_q22
          |    WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
          |  AND NOT EXISTS (SELECT 1 FROM ord_q22
          |    WHERE o_custkey = c_custkey
          |      AND o_orderdate >= TIMESTAMP '1998-01-01')
          |GROUP BY c_custkey % 7
          |ORDER BY cntrycode""".stripMargin)
    }),

    // ---- ORC federation round-trip: a side materialized as ORC reads
    //      back through the same FormatSide discovery/scan path as
    //      parquet/csv/json (Spark's native ORC source; predicate
    //      pushdown and column pruning apply as with parquet). The
    //      oracle replays the aggregate over the parquet original —
    //      identical data, different storage format ----
    "q_orc_federation" -> ((s, dir) => {
      val base = s"${System.getProperty("java.io.tmpdir")}/graft_orc_side"
      t(s, dir, "lineitem").filter(col("l_orderkey") % 7 === 0)
        .write.mode("overwrite").format("orc").save(s"$base/lineitem.orc")
      FormatSide(s, base, "orc", "orcdb").table("lineitem")
        .filter(col("l_quantity") < 25)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"), dsum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // ---- TPC-H Q3 shape (shipping priority): the segment-filtered
    //      customer dim broadcasts into date-pruned orders, both date
    //      predicates push to the parquet scans, decimal-exact revenue,
    //      deterministic top-10 by (revenue desc, orderkey) ----
    "q3_shipping_priority" -> ((s, dir) => {
      val cutoff = lit("1996-03-15").cast("timestamp")
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      cust.join(ord, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // ---- TPC-H Q5 shape (local-supplier volume): region -> nation ->
    //      supplier dims collapse to a broadcast side before touching
    //      the fact table; customer joins on (custkey, nationkey) to
    //      keep only local orders; one decimal-exact agg per nation ----
    "q5_local_supplier" -> ((s, dir) => {
      val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nat = t(s, dir, "nation")
        .join(asia, col("n_regionkey") === col("r_regionkey"))
      val sup = t(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- TPC-H Q4 shape (order priority checking): the EXISTS
    //      subquery becomes a LEFT-SEMI join — orders keep at most one
    //      match, no fan-out, and the semi side carries only the join
    //      key after its pushed quantity filter ----
    "q4_order_priority" -> ((s, dir) => {
      val qualifying = t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey")
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .join(qualifying, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- TPC-H Q7 shape (volume shipping): the DISJUNCTIVE nation-pair
    //      predicate — both nation dims pre-filter to the two names
    //      (pushed to their scans) and the OR pairing applies after the
    //      joins; per (supp_nation, cust_nation, year) decimal-exact ----
    "q7_volume_shipping" -> ((s, dir) => {
      val names = Seq("NATION_3", "NATION_7")
      val n1 = t(s, dir, "nation").filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").filter(col("n_name").isin(names: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      li.join(t(s, dir, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("n1_key"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(n2, col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // ---- distribution drift (PSI): equal-width-grid population
    //      stability index between two derived sides — the planted
    //      2x scaling of a third of side B's prices must move
    //      l_extendedprice's PSI while l_quantity stays ~0 ----
    "q_psi_drift" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_orderkey") % 97 =!= 0)
      val b = li.filter(col("l_orderkey") % 89 =!= 0)
        .withColumn("l_extendedprice", col("l_extendedprice") *
          when(col("l_orderkey") % 3 === 0, lit(2.0)).otherwise(lit(1.0)))
      Distribution.psiAll(a, b, Seq("l_extendedprice", "l_quantity"))
        .orderBy("col_name")
    }),

    // ---- TPC-H Q14 shape (promo revenue share): month-pruned lineitem
    //      joins the broadcast part dim; conditional decimal-exact sums
    //      ratio to one row (the null-skipping CASE sum — no promo rows
    //      would null the share in both engines identically) ----
    "q14_promo_revenue" -> ((s, dir) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(t(s, dir, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) * sum(when(col("p_type") === "ECONOMY", rev)).cast("double") /
            sum(rev).cast("double"), 6).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    }),

    // ---- TPC-H Q10 shape (returned-item reporting): quarter-filtered
    //      orders and return-flagged lineitems join down to a
    //      per-customer revenue loss; nation broadcasts; top-20 ----
    "q10_returned_items" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(8,4)") - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- exact triangle counts on the co-purchase graph ----
    "q_triangles" -> ((s, dir) => {
      val edges = EventAnalytics
        .coOccurrence(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2)
        .select(col("item1").as("src"), col("item2").as("dst"))
      Graph.triangleCounts(edges).orderBy("id")
    }),

    // ---- Z-order (Morton) clustering key for 2-D zone-map pruning ----
    "q_zorder_key" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          Layout.zOrderKey(col("p_partkey"), col("p_size")).as("z"))
        .orderBy("z", "p_partkey")),

    // ---- Hilbert-curve clustering key (neighbor-preserving layout;
    //      tighter 2-D pruning rectangles than the Morton seam-jumps) ----
    "q_hilbert_key" -> ((s, dir) =>
      Layout.withHilbertKey(
          t(s, dir, "part")
            .select(col("p_partkey"), col("p_size").cast("long").as("p_size")),
          "p_partkey", "p_size", 10)
        .orderBy("h", "p_partkey")),

    // ---- 3-D Z-order key: the 3-way interleave for workloads filtering
    //      three axes at once (floor() the double axis in BOTH engines —
    //      raw double->bigint casts truncate in Spark but round in
    //      DuckDB) ----
    "q_zorder3_key" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          floor(col("p_retailprice")).as("p_price"),
          Layout.zOrderKey3(col("p_partkey"), col("p_size"),
            floor(col("p_retailprice"))).as("z"))
        .orderBy("z", "p_partkey")),

    // ---- 3-D Hilbert key (Skilling transpose, codegen kernel): the
    //      (time, x, y)-style layout key; oracle replays the transform
    //      as mechanically-unrolled CTE levels ----
    "q_hilbert3_key" -> ((s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("long").as("p_size"),
          floor(col("p_retailprice")).as("p_price"),
          Layout.hilbertKey3(col("p_partkey"), col("p_size"),
            floor(col("p_retailprice")), 10).as("h"))
        .orderBy("h", "p_partkey")),

    // ---- BPE planted truth: the merge loop's output on a corpus whose
    //      merge sequence is hand-derivable (same class as q_planted_*) ----
    "q_bpe_planted" -> ((s, dir) => {
      import s.implicits._
      val corpus = Seq((1L, "aa aa"), (2L, "aa ab")).toDF("doc_id", "text")
      val merges = Bpe.train(corpus, "text", 5) // corpus exhausts at 2
      val table = merges.map(m => (m.rank.toLong, m.left, m.right))
        .toDF("rank", "left_sym", "right_sym")
      val enc = Bpe.encode(Seq((7L, "aab aa ba")).toDF("doc_id", "text"),
        "text", "doc_id", merges)
        .select(col("doc_id"), col("n_tokens"), col("n_pieces"))
      // one result set: merge rows + an encode summary row
      table.select(lit("merge").as("kind"), col("rank"),
          col("left_sym"), col("right_sym"))
        .unionByName(enc.select(lit("encode").as("kind"),
          col("n_tokens").as("rank"),
          col("doc_id").cast("string").as("left_sym"),
          col("n_pieces").cast("string").as("right_sym")))
        .orderBy("kind", "rank")
    }),

    // ---- SCD type-2 history: validity intervals per key version ----
    "q_scd_history" -> ((s, dir) =>
      ChangeCapture.scdHistory(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", "event_id")
        .select("user_id", "event_id", "valid_from", "valid_to", "version",
          "is_current")
        .orderBy("user_id", "version")),

    // ---- skip-gram pairs: word2vec-style (center, context) counts ----
    "q_skipgrams" -> ((s, dir) =>
      TextAnalysis.skipGrams(t(s, dir, "documents"), "text", "doc_id",
          window = 3, minCount = 5)
        .orderBy("center", "context")),

    // ---- feature hashing: vocabulary-free sparse featurization ----
    "q_feature_hash" -> ((s, dir) =>
      TextAnalysis.featureHash(t(s, dir, "documents"), "text", "doc_id", 64)
        .orderBy("doc_id", "bucket")),

    // ---- log compaction: latest record per key, deterministic tie ----
    "q_compact_latest" -> ((s, dir) =>
      ChangeCapture.compactLatest(Tables.events(s, dir), "user_id", "ts", "event_id")
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")),

    // ---- market-basket pair co-occurrence over order lines ----
    "q_basket_pairs" -> ((s, dir) =>
      EventAnalytics.coOccurrence(t(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2)
        .orderBy("item1", "item2")),

    // ---- Apriori frequent triples: candidates only from frequent
    //      pairs (two broadcast semi-joins), never the item cube ----
    "q_frequent_triples" -> ((s, dir) =>
      EventAnalytics.frequentTriples(t(s, dir, "lineitem"),
          "l_orderkey", "l_partkey", 2)
        .orderBy("item1", "item2", "item3")),

    // ---- grouped sketched quantiles checked against grouped exact:
    //      the monster-group path (bounded state, partial merge) must
    //      land within the sketch's rank-error bound per group ----
    "q_grouped_quantiles_approx" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val rows = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5D)").as("exact_p50"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("approx_p50"))
        .collect()
      // unit-spaced discrete domain: rank error <= n/accuracy bounds the
      // VALUE to within one unit (same argument as q_approx_bounds)
      rows.map(r => (r.getString(0),
          math.abs(r.getDouble(2) - r.getDouble(1)) <= 1.0))
        .toSeq.toDF("l_returnflag", "ok").orderBy("l_returnflag")
    }),

    // ---- exact per-group quantiles (interpolated percentile) ----
    "q_grouped_quantiles" -> ((s, dir) =>
      EventAnalytics.groupedQuantiles(t(s, dir, "lineitem"), "l_returnflag",
          "l_quantity", Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("l_returnflag")),

    // ---- declarative data-quality expectations over orders ----
    "q_expectations" -> ((s, dir) => {
      import Expectations._
      validate(t(s, dir, "orders"), Seq(
        NotNull("o_orderstatus"),
        InRange("o_totalprice", 0.0, 400000.0, maxViolations = 100),
        MatchesRegex("o_orderstatus", "^[A-Z]$"),
        // accepted_values (dbt parity): priorities all pass; the status
        // set deliberately omits 'P', so partial orders violate
        InSet("o_orderpriority", Set("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW")),
        InSet("o_orderstatus", Set("O", "F")),
        Unique("o_orderkey"),
        RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")))
        .orderBy("rule", "column")
    }),

    // ---- ROW-LEVEL referential-integrity violations (the drill-down
    //      behind the count-based RefIntegrity rule above): parent
    //      pruned to every-7th-removed so violations are planted ----
    "q_fk_violations" -> ((s, dir) => {
      Expectations.foreignKeyViolations(
          t(s, dir, "orders").select("o_orderkey", "o_custkey"), "o_custkey",
          t(s, dir, "customer").filter(col("c_custkey") % 7 =!= 0), "c_custkey")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    // ---- functional-dependency audit: brands mapping to >1 part type
    //      (the FD p_brand -> p_type is violated by construction) ----
    "q_fd_violations" -> ((s, dir) =>
      Expectations.functionalDependencyViolations(t(s, dir, "part"), "p_brand", "p_type")
        .orderBy("p_brand")),

    // ---- replayable approx-uniqueness gate: the UniqueApprox rule on
    //      graft's md5-register HLL (not Spark's internal sketch), so the
    //      oracle rebuilds every estimated duplicate fraction bit-for-bit.
    //      Three gates: two genuinely-unique key columns and one heavily
    //      duplicated foreign key that must fail the tolerance ----
    "q_unique_approx" -> ((s, dir) =>
      Expectations.uniqueApproxGate(t(s, dir, "orders"), Seq("o_orderkey" -> 0.05))
        .unionByName(Expectations.uniqueApproxGate(
          t(s, dir, "lineitem"), Seq("l_orderkey" -> 0.05)))
        .unionByName(Expectations.uniqueApproxGate(
          t(s, dir, "customer"), Seq("c_custkey" -> 0.05)))
        .orderBy("column")),

    // ---- cohort LTV curve: decimal-exact cumulative revenue ----
    "q_cohort_ltv" -> ((s, dir) =>
      EventAnalytics.cohortLtv(Tables.events(s, dir))
        .orderBy("cohort_day", "week_offset")),

    // ---- RFM quintile segmentation over purchase events ----
    "q_rfm" -> ((s, dir) =>
      EventAnalytics.rfmSegments(Tables.events(s, dir))
        .orderBy("user_id")),

    // ---- top user paths: most common first-5 event-type prefixes ----
    "q_user_paths" -> ((s, dir) =>
      EventAnalytics.topPaths(Tables.events(s, dir), pathLen = 5, k = 20)),

    // ---- first-order Markov transitions over each user's timeline ----
    "q_event_transitions" -> ((s, dir) =>
      EventAnalytics.transitionMatrix(Tables.events(s, dir))
        .orderBy("from_type", "to_type")),

    // ---- rolling z-score anomalies: trailing-10 window per user ----
    "q_rolling_anomaly" -> ((s, dir) =>
      EventAnalytics.rollingAnomaly(Tables.events(s, dir), "user_id", "value",
          n = 10, threshold = 2.5)
        .filter(col("is_anomaly"))
        .orderBy("user_id", "event_id")),

    // ---- edit-distance join (PassJoin segments): dirty catalog vs clean ----
    "q_fuzzy_match" -> ((s, dir) => {
      val clean = t(s, dir, "part").select(col("p_partkey"),
        concat(lower(concat(col("p_type"), lit(" "), col("p_name"))), lit(" #"), col("p_partkey")).as("nm"))
      val dirty = clean.select(col("p_partkey").as("d_key"),
        when(col("p_partkey") % 5 === 0, concat(lit("x"), expr("substr(nm, 2)")))
          .otherwise(col("nm")).as("nm"))
      FuzzyJoin.editJoin(dirty, "d_key", "nm", clean, "p_partkey", "nm", maxEdits = 1)
        .groupBy(col("l_id").as("d_key"))
        .agg(count(lit(1)).as("n_matches"), min("dist").cast("long").as("best_dist"))
        .orderBy("d_key")
    }),

    // ---- entity resolution: edit-join self-match -> connected components ----
    "q_entity_resolution" -> ((s, dir) => {
      val dirty = t(s, dir, "part").select(col("p_partkey"),
        when(col("p_partkey") % 5 === 0,
            concat(lit("x"), expr("substr(concat(lower(concat(p_type, ' ', p_name)), ' #', p_partkey), 2)")))
          .otherwise(concat(lower(concat(col("p_type"), lit(" "), col("p_name"))), lit(" #"), col("p_partkey"))).as("nm"))
      FuzzyJoin.resolveEntitiesExact(dirty, "p_partkey", "nm", maxEdits = 1)
        .orderBy("p_partkey")
    }),

    // ---- bloom-pruned exact semi join (runtime-filter pattern) ----
    "q_bloom_prune" -> ((s, dir) => {
      val hi = t(s, dir, "orders").filter(col("o_totalprice") > 450000.0)
      BloomPrune.prunedSemiJoin(t(s, dir, "lineitem"), "l_orderkey",
          hi, "o_orderkey", expectedItems = 100000L, fpp = 0.01)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum("l_extendedprice").as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // ---- survivorship dedup: near-dup clusters keep their BEST member
    //      (highest n_chars, tie lowest id) instead of the min-id one;
    //      cluster graph shared with q_dedup_corpus, representative
    //      chosen by one struct-min hash aggregation ----
    "q_survivorship" -> ((s, dir) =>
      Dedup.survivorshipDedup(t(s, dir, "documents"), "text", "doc_id",
          "n_chars", 0.5)
        .orderBy("component")),

    // ---- per-domain token-budget cap: within each source keep the
    //      longest docs until 4000 chars — the distributed prefix sum
    //      generalized to composite keys (NO per-domain single-task
    //      window; see Sampling.domainBudgetSelect) ----
    "q_domain_budget" -> ((s, dir) =>
      Sampling.domainBudgetSelect(
          t(s, dir, "documents").select("source", "doc_id", "n_chars"),
          "source", "doc_id", "n_chars", "n_chars", 4000L)
        .select("source", "doc_id", "n_chars", "cum_tokens")
        .orderBy("source", "cum_tokens")),

    // ---- distinct-users-so-far per day via the first-appearance trick:
    //      one user-keyed aggregate + a day-bounded running sum, never
    //      O(days) distinct scans ----
    "q_cum_users" -> ((s, dir) =>
      EventAnalytics.cumulativeDistinctDaily(Tables.events(s, dir),
          segmentCols = Seq("event_type"))
        .orderBy("event_type", "day")),

    // ---- median/MAD robust outlier flags per event type (breakdown
    //      point 0.5 — the screen is immune to the outliers it hunts);
    //      med/mad rounded before the z so both engines replay the
    //      arithmetic bit-for-bit ----
    "q_robust_outliers" -> ((s, dir) =>
      EventAnalytics.robustOutliers(Tables.events(s, dir), "event_type",
          "value", 3.5)
        .select("event_id", "event_type", "value", "med", "mad",
          "robust_z", "is_outlier")
        .orderBy("event_id")),

    // ---- equi-depth decile bins of doc length WITHOUT ntile's global
    //      sort: edges from the bounded distinct-value CDF, assignment
    //      by broadcast edge list ----
    "q_quantile_bins" -> ((s, dir) =>
      Profile.quantileBins(t(s, dir, "documents"), "n_chars", 10)
        .orderBy("bin")),

    // ---- drift localization: the flagship diff rolled up into
    //      key-range buckets — WHERE does the drift live, before
    //      reading a single drifted row ----
    "q_drift_localize" -> ((s, dir) => {
      val (s1, s2) = lineitemSides(s, dir)
      val c = new DriftCompare(s, s1, s2)
      c.driftLocalize(c.dataDrift("lineitem").get, "l_orderkey", 1000L)
        .orderBy("bucket_lo", "observed_in")
    }),

    // ---- column-level drift triage: WHICH columns carry the change —
    //      rowChanges' full-outer join folded to one row per column
    //      (sum-of-case, no explode; output bounded by column count).
    //      Sides: orders.o_totalprice mutated on %17 keys,
    //      o_orderpriority on %23 ----
    "q_column_drift" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val oldDf = o.filter(col("o_orderkey") % 59 =!= 0)
      val newDf = o.filter(col("o_orderkey") % 53 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 17 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 23 === 0, lit("X-DRIFTED"))
            .otherwise(col("o_orderpriority")))
      ChangeCapture.columnDriftProfile(oldDf, newDf, "o_orderkey")
        .orderBy("column")
    }),

    // ---- dwell-time profile: session-capped gap to the user's next
    //      event, per event type; integer-micros arithmetic so mean and
    //      interpolated p50 replay exactly ----
    "q_dwell_time" -> ((s, dir) =>
      EventAnalytics.dwellTimes(Tables.events(s, dir), 30)
        .orderBy("event_type")),

    // ---- incremental aggregate maintenance: a pre-1997 snapshot merged
    //      with the 1997+ delta must equal the from-scratch rollup
    //      (decimal sums make the equality exact, not approximate);
    //      delta-sized work at 100 TB, never a historical rescan ----
    "q_incremental_agg" -> ((s, dir) => {
      import IncrementalAgg.Spec
      val specs = Seq(Spec("count", "", "n_orders"),
        Spec("sum", "o_totalprice", "sum_price"),
        Spec("min", "o_orderdate", "first_order"),
        Spec("max", "o_orderdate", "last_order"))
      val o = t(s, dir, "orders")
      val cutoff = lit("1997-01-01").cast("timestamp")
      val snap = IncrementalAgg.aggregate(
        o.filter(col("o_orderdate") < cutoff), Seq("o_custkey"), specs)
      IncrementalAgg.merge(snap, o.filter(col("o_orderdate") >= cutoff),
          Seq("o_custkey"), specs)
        .select(col("o_custkey"), col("n_orders"),
          col("sum_price").cast("double").as("sum_price"),
          col("first_order"), col("last_order"))
        .orderBy("o_custkey")
    }),

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

    // ---- BM25 top-k retrieval: posting lists bounded to the query
    //      terms, broadcast df/corpus stats, TakeOrdered top-k; per-term
    //      scores rounded 6dp then decimal-summed so partitioning can
    //      never move a bit ----
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
        Seq("hash", "join", "spark"), 15)),

    // ---- pairwise Pearson correlation of the lineitem measures in ONE
    //      scan: decimal-exact moments, model-sized driver math ----
    "q_corr_matrix" -> ((s, dir) =>
      Stats.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col1", "col2")),

    // ---- chi-square independence: event_type x epoch-day-of-week
    //      (integer-derived category, engine-neutral); cell diagnostics
    //      plus the decimal-summed statistic ----
    "q_chi2" -> ((s, dir) =>
      Stats.chiSquare(
          Tables.events(s, dir).select(col("event_type"),
            (datediff(to_date(col("ts")), lit("1970-01-01")) % 7).as("dow")),
          "event_type", "dow")
        .orderBy("row_val", "col_val")),

    // ---- finite-horizon EWMA per user (one window pass, lag ladder;
    //      weights embedded as shared shortest-roundtrip literals) ----
    "q_ewma" -> ((s, dir) =>
      EventAnalytics.ewmaSmooth(Tables.events(s, dir), "user_id", "ts",
          "event_id", "value", alpha = 0.3, horizon = 5)
        .orderBy("event_id")),

    // ---- k-core planted gate: 6-clique with a 19-node chain tail
    //      (joined at node 5) built from nation keys; the 3-core peels
    //      the whole chain in one round and keeps exactly the clique ----
    "q_kcore" -> ((s, dir) => {
      val ids = t(s, dir, "nation").select(col("n_nationkey").cast("long").as("id"))
      val a = ids.select(col("id").as("src"))
      val b = ids.select(col("id").as("dst"))
      val edges = a.crossJoin(b).filter(
        (col("src") < 6 && col("dst") < 6 && col("src") < col("dst")) ||
          (col("src") >= 5 && col("dst") === col("src") + 1))
      Graph.kCore(edges, k = 3).orderBy("id")
    }),

    // ---- Welch unequal-variance t-test between every event-type pair:
    //      exact limb-sum moments in one grouped scan, bounded group
    //      table to the driver, fixed-order double t/df mirrored by the
    //      oracle ----
    "q_welch_t" -> ((s, dir) =>
      Stats.welchT(Tables.events(s, dir), "event_type", "value")
        .orderBy("g1", "g2")),

    // ---- two-sample Kolmogorov–Smirnov drift test (click vs purchase
    //      value distributions): one full-data count, then everything
    //      runs on the bounded distinct-value table; D maximized over
    //      exact integer cross-scaled gaps ----
    "q_ks_test" -> ((s, dir) =>
      Stats.ksTest(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),

    // ---- distribution drift as a first-class expectation: the second
    //      half of the month KS-gated against the first (the
    //      yesterday-vs-training-snapshot monitor shape) ----
    "q_expectations_drift" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit("2024-01-15").cast("timestamp")
      Expectations.validate(
        ev.filter(col("ts") >= cut),
        Seq(Expectations.Drift("value",
          ev.filter(col("ts") < cut).select("value"), 0.05)))
    }),

    // ---- mutual information / NMI / Cramér's V between event type and
    //      day-of-week: HOW STRONG the dependence chi2 only detects ----
    "q_mutual_info" -> ((s, dir) =>
      Stats.mutualInfo(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .withColumn("dow",
            (datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
              .cast("string")),
        "event_type", "dow")),

    // ---- per-segment KS drift: WHICH day-of-week slice moved ----
    "q_ks_by_segment" -> ((s, dir) =>
      Stats.ksTestBy(
          Tables.events(s, dir).withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
          "dow", "event_type", "value", "click", "purchase")
        .orderBy(col("segment"))),

    // ---- Q-Q table: WHERE in the distribution the cohorts diverge
    //      (tail drift vs median shift — identical in a KS d) ----
    "q_qq_table" -> ((s, dir) =>
      Stats.qqTable(Tables.events(s, dir), "event_type", "value",
          "click", "purchase")
        .orderBy("p")),

    // ---- BH false-discovery control over the per-segment KS battery:
    //      the multiple-testing step every segment sweep needs ----
    "q_bh_fdr" -> ((s, dir) =>
      Stats.bhAdjust(
          Stats.ksTestBy(
            Tables.events(s, dir).withColumn("dow",
              datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
            "dow", "event_type", "value", "click", "purchase"),
          "p_approx", 0.05)
        .select("segment", "n1", "n2", "d", "p_approx", "p_adj", "reject")
        .orderBy("segment")),

    // ---- Mann–Whitney rank-sum test on the same cohorts: midranks as
    //      exact 2x-scaled integers from the distinct-value prefix
    //      counts, tie-corrected z ----
    "q_mann_whitney" -> ((s, dir) =>
      Stats.mannWhitneyU(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),

    // ---- Cliff's delta ordinal effect size on the same click-vs-
    //      purchase cohorts as the U test: same exact midrank fold,
    //      one driver division, Romano magnitude bands ----
    "q_cliffs_delta" -> ((s, dir) =>
      Stats.cliffsDelta(Tables.events(s, dir), "event_type", "value",
        "click", "purchase")),

    // ---- Hodges–Lehmann shift between the same cohorts: weighted
    //      median of pairwise differences computed on value CELLS with
    //      multiplicity weights — never the row-level pair set ----
    "q_hodges_lehmann" -> ((s, dir) =>
      Stats.hodgesLehmannShift(Tables.events(s, dir), "event_type",
        "value", "click", "purchase")),

    // ---- two-group log-rank churn test on the KM lifetime
    //      construction: ever-purchasers vs never-purchasers ----
    "q_logrank" -> ((s, dir) =>
      EventAnalytics.logRank(Tables.events(s, dir))),

    // ---- pass@k over per-user purchase attempts (success = basket
    //      value >= 50): exact falling-factorial estimator, both
    //      factors provably < 2^53 so the division is engine-exact ----
    "q_pass_at_k" -> ((s, dir) =>
      Eval.passAtK(
        Tables.events(s, dir).filter(col("event_type") === "purchase"),
        "user_id", col("value") >= 50, Seq(1, 3, 5))
        .orderBy("problem", "k")),

    // ---- isotonic (PAVA) calibration of return rate over the 11
    //      discount levels; the oracle replays the independent
    //      max_{j<=i} min_{k>=i} minimax characterization ----
    "q_isotonic" -> ((s, dir) =>
      Eval.isotonicCalibration(t(s, dir, "lineitem"), col("l_discount"),
        col("l_returnflag") === "R")
        .orderBy("score")),

    // ---- TOST equivalence gate on the per-user experiment: is B's
    //      10-plus-purchase rate provably within ±0.05 of A's? ----
    "q_tost" -> ((s, dir) =>
      Experiment.tostEquivalence(perUserExperiment(s, dir), "arm",
        col("purchases") >= 10L, "A", "B", margin = 0.05)),

    // ---- Luhn payment-card screen: planted valid/invalid test PANs
    //      (split literals — no card-shaped token in source) plus a
    //      too-short decoy; candidates come back masked ----
    "q_luhn_screen" -> ((s, dir) => {
      val valid = " 4111" + "1111" + "1111" + "1111"
      val invalid = " 4111" + "1111" + "1111" + "1112"
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 17 === 0, lit(valid)).otherwise(lit("")),
          when(col("doc_id") % 19 === 0, lit(invalid)).otherwise(lit("")),
          when(col("doc_id") % 23 === 0, lit(" 12345678"))
            .otherwise(lit(""))).as("text"))
      TextAnalysis.luhnScreen(planted)
        .orderBy("doc_id", "masked", "luhn_valid")
    }),

    // ---- mojibake screen: planted UTF-8-as-Latin1 digraphs and a
    //      replacement character; only damaged docs return ----
    "q_mojibake" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 23 === 0,
            lit(" Caf\u00C3\u00A9 clich\u00C3\u00A9")).otherwise(lit("")),
          when(col("doc_id") % 29 === 0,
            lit(" bad\uFFFDchar")).otherwise(lit(""))).as("text"))
      TextAnalysis.mojibakeScreen(planted).orderBy("doc_id")
    }),

    // ---- group-fairness readout of a length gate across languages:
    //      selection/base rates, TPR/FPR, parity gap, DI ratio ----
    "q_fairness" -> ((s, dir) =>
      Eval.fairnessGaps(t(s, dir, "documents"), "lang",
        col("doc_id") % 3 === 0, col("n_chars") >= 300)
        .orderBy("grp")),

    // ---- behavioral bot screen with one planted metronome user
    //      (30 events exactly 60 s apart -> gap CV 0, flagged) ----
    "q_bot_score" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type")
      val metronome = s.range(30).select(
        (lit(900000L) + col("id")).as("event_id"),
        (lit(1577836800L) + col("id") * 60).cast("timestamp").as("ts"),
        lit(99999L).as("user_id"),
        lit("click").as("event_type"))
      EventAnalytics.botScore(base.unionByName(metronome))
        .orderBy("user_id")
    }),

    // ---- interpolated Kneser–Ney bigram table over the corpus:
    //      continuation counts, top 50 bigrams by raw count ----
    "q_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNeyBigram(t(s, dir, "documents"))
        .orderBy(col("c12").desc, col("w1"), col("w2")).limit(50)),

    // ---- HITS hubs/authorities on the part->supplier graph (same
    //      edge construction as pagerank); 4 L1-normalized rounds,
    //      9 dp decimal state, oracle = unrolled CTE chain ----
    "q_hits" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      Graph.hits(edges, iters = 4)
        .orderBy(col("authority").desc, col("id")).limit(20)
    }),

    // ---- crawl-URL dedup: canonicalization (tracking params dropped,
    //      params sorted, fragment cut, host case-folded) collapses 5
    //      synthetic variants per page into one survivor group ----
    "q_url_dedup" -> ((s, dir) => {
      val url = concat(
        lit("HTTPS://Shop"), col("doc_id") % 20,
        lit(".Example.COM/Item/"), col("doc_id") % 100,
        when(col("doc_id") % 2 === 0, lit("?utm_source=feed&ref=a"))
          .otherwise(lit("?ref=a&utm_campaign=x&b=2")),
        when(col("doc_id") % 5 === 0, lit("#Frag")).otherwise(lit("")))
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.canonicalUrl(url).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"), min("doc_id").as("keep_doc_id"))
        .orderBy("canonical_url")
    }),

    // ---- batch-hard triplet mining over the embeddings table: per
    //      anchor the least-similar positive and most-similar negative,
    //      margins expose where a triplet loss still has gradient ----
    "q_triplet_mining" -> ((s, dir) =>
      Similarity.tripletMining(t(s, dir, "embeddings"), col("vec_id") < 20)
        .orderBy("anchor_id")),

    // ---- Nelson–Aalen cumulative hazard on the KM lifetime
    //      construction: additive companion to q_kaplan_meier ----
    "q_nelson_aalen" -> ((s, dir) =>
      EventAnalytics.nelsonAalen(Tables.events(s, dir)).orderBy("t")),

    // ---- re-randomization test of the click-vs-purchase value gap:
    //      50 content-addressed relabels, add-one p-value ----
    "q_perm_test" -> ((s, dir) =>
      Stats.permutationTest(Tables.events(s, dir), "event_id",
        "event_type", "value", "click", "purchase")),

    // ---- Unicode-script profile with planted Cyrillic/Han/Arabic
    //      spans; char-level cross-check for language ID ----
    "q_script_detect" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 31 === 0,
            lit(" \u0410\u0411\u0412")).otherwise(lit("")),
          when(col("doc_id") % 37 === 0,
            lit(" \u4E00\u4E8C\u4E09")).otherwise(lit("")),
          when(col("doc_id") % 41 === 0,
            lit(" \u0627\u0628")).otherwise(lit(""))).as("text"))
      TextAnalysis.scriptProfile(planted).orderBy("doc_id")
    }),

    // ---- paired t on per-user (engagement, purchases): each user is
    //      their own control ----
    "q_paired_t" -> ((s, dir) =>
      Stats.pairedT(perUserExperiment(s, dir), "x", "purchases")),

    // ---- 2x2 odds ratio: does a deep discount change return odds? ----
    "q_odds_ratio" -> ((s, dir) =>
      Stats.oddsRatio(t(s, dir, "lineitem"),
        col("l_discount") >= 0.05, col("l_returnflag") === "R")),

    // ---- Tukey-HSD pairwise table over the three return-flag cohorts:
    //      which groups differ after the omnibus ANOVA ----
    "q_tukey_hsd" -> ((s, dir) =>
      Stats.tukeyHsd(t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
        .orderBy("g1", "g2")),

    // ---- Cronbach's alpha over three per-line "measurements": do
    //      they measure one construct before averaging them ----
    "q_cronbach" -> ((s, dir) =>
      Stats.cronbachAlpha(
        t(s, dir, "lineitem").select(
          col("l_quantity").as("i0"),
          (col("l_discount") * 100).as("i1"),
          (col("l_tax") * 100).as("i2")),
        Seq("i0", "i1", "i2"))),

    // ---- Theil T concentration of positive account balances ----
    "q_theil_index" -> ((s, dir) =>
      Stats.theilIndex(t(s, dir, "customer"), "c_acctbal")),

    // ---- Chapman capture–recapture estimate of the purchaser
    //      population from two half-window sightings ----
    "q_capture_recapture" -> ((s, dir) =>
      EventAnalytics.captureRecapture(Tables.events(s, dir),
        col("event_type") === "purchase")),

    // ---- 2-D skyline over (length, distinct-vocab): the Pareto set
    //      no single quality score can pick; oracle = independent
    //      NOT-EXISTS dominance formulation ----
    "q_skyline" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        col("n_chars"),
        size(array_distinct(TextAnalysis.tokens(col("text"))))
          .as("vocab"))
      Curation.skyline2d(docs, "n_chars", "vocab", "doc_id").orderBy("x")
    }),

    // ---- personalized PageRank from a 5-part seed set over the
    //      part->supplier graph: seed-expansion trust propagation ----
    "q_ppr" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 13 === 0)
        .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      Graph.personalizedPageRank(edges, Seq(1L, 2L, 3L, 4L, 5L),
        damping = 0.85, iters = 4)
        .orderBy(col("ppr").desc, col("id")).limit(20)
    }),

    // ---- distinct-1/2/3 corpus diversity (mode-collapse detector) ----
    "q_distinct_n" -> ((s, dir) =>
      TextAnalysis.distinctN(t(s, dir, "documents")).orderBy("n")),

    // ---- term burstiness (Fano factor over per-doc counts, zeros by
    //      moment algebra): topical terms vs glue ----
    "q_burstiness" -> ((s, dir) =>
      TextAnalysis.burstiness(t(s, dir, "documents"))),

    // ---- mean-excess tail table of account balances: EVT diagnostic
    //      (rising curve = heavy tail) ----
    "q_mean_excess" -> ((s, dir) =>
      Distribution.meanExcess(t(s, dir, "customer"), "c_acctbal",
        Seq(0, 2500, 5000, 7500, 9000)).orderBy("threshold")),

    // ---- sharp RDD at the quantity-25 cutoff, bandwidth 10: local
    //      linear on each side, effect at the cutoff ----
    "q_rdd" -> ((s, dir) =>
      Experiment.regressionDiscontinuity(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice", cutoff = 25, bandwidth = 10)),

    // ---- IV/Wald LATE: parity-assigned encouragement Z, self-selected
    //      conversion D, purchase value Y ----
    "q_iv_wald" -> ((s, dir) =>
      Experiment.ivWald(perUserExperiment(s, dir),
        col("arm") === "A", col("converted") === 1L, "y")),

    // ---- one-sample KS of discount against Uniform(0, 0.1): the
    //      "is this randomizer actually uniform" gate ----
    "q_ks_uniform" -> ((s, dir) =>
      Stats.ksUniform(t(s, dir, "lineitem"), "l_discount", 0.0, 0.1)),

    // ---- Friedman test: per-user event-type value profiles as
    //      complete blocks, within-block midranks only ----
    "q_friedman" -> ((s, dir) =>
      Stats.friedman(Tables.events(s, dir), "user_id", "event_type",
        "value")),

    // ---- Cochran's Q: did ANY event type change its big-ticket rate
    //      across the same users (k-way McNemar) ----
    "q_cochran_q" -> ((s, dir) =>
      Stats.cochranQ(Tables.events(s, dir), "user_id", "event_type",
        col("value") >= 50)),

    // ---- Kish effective sample size of the value-weighted corpus ----
    "q_ess" -> ((s, dir) =>
      Stats.effectiveSampleSize(Tables.events(s, dir), "value")),

    // ---- ECE/MCE scalar rollup of the calibration table ----
    "q_ece" -> ((s, dir) =>
      Eval.expectedCalibrationError(
        t(s, dir, "lineitem").select(
          (col("l_discount") * 10).as("score"), col("l_returnflag")),
        "score", col("l_returnflag") === "R")),

    // ---- one-way ICC(1,1): is quantity variance the ORDER or the
    //      line (continuous-scale agreement) ----
    "q_icc" -> ((s, dir) =>
      Stats.icc(t(s, dir, "lineitem"), "l_orderkey", "l_quantity")),

    // ---- Wald–Wolfowitz runs test on the daily event-count series:
    //      randomness screen over the pre-aggregated bounded series ----
    "q_runs_test" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
      Stats.runsTest(daily, "d", col("c") >= 333)
    }),

    // ---- order-statistic median CI (one pass, no resampling) ----
    "q_median_ci" -> ((s, dir) =>
      Stats.quantileCI(t(s, dir, "customer"), "c_acctbal")),

    // ---- Jarque–Bera normality screen of quantities ----
    "q_jarque_bera" -> ((s, dir) =>
      Stats.jarqueBera(t(s, dir, "lineitem"), "l_quantity")),

    // ---- Ljung–Box portmanteau over the first 5 daily-count ACF
    //      lags: any autocorrelation left? ----
    "q_ljung_box" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.ljungBox(daily, "t", "v", maxLag = 5)
    }),

    // ---- entropy rate of the event-type Markov chain: how scripted
    //      is the next action given the current one ----
    "q_entropy_rate" -> ((s, dir) =>
      EventAnalytics.entropyRate(Tables.events(s, dir))),

    // ---- CART-stump best split of discount against returns ----
    "q_best_split" -> ((s, dir) =>
      Classifier.bestSplit(t(s, dir, "lineitem"), "l_discount",
        col("l_returnflag") === "R")),

    // ---- empirical-Bayes shrinkage of per-source pass rates: small
    //      sources pull to the beta-binomial prior ----
    "q_eb_shrinkage" -> ((s, dir) =>
      Stats.ebShrinkage(t(s, dir, "documents"), "source",
        col("n_chars") >= 300).orderBy("grp")),

    // ---- Mantel–Haenszel OR + CMH chi2, stratified by ship year:
    //      the Simpson-proof discount/returns association ----
    "q_mantel_haenszel" -> ((s, dir) =>
      Stats.mantelHaenszel(
        t(s, dir, "lineitem").select(
          year(col("l_shipdate")).as("yr"),
          col("l_discount"), col("l_returnflag")),
        "yr", col("l_discount") >= 0.05, col("l_returnflag") === "R")),

    // ---- Cochran–Armitage: is the return rate MONOTONE in the
    //      discount tier (ordered dose codes 0..10) ----
    "q_cochran_armitage" -> ((s, dir) =>
      Stats.cochranArmitage(t(s, dir, "lineitem"),
        round(col("l_discount") * 100, 0),
        col("l_returnflag") === "R")),

    // ---- seasonal/trend strength of the daily series (Hyndman Fs/Ft
    //      over the decomposition components) ----
    "q_seasonal_strength" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.seasonalStrength(daily, "t", "v", 7)
    }),

    // ---- partial correlation quantity~price holding discount fixed ----
    "q_partial_corr" -> ((s, dir) =>
      Stats.partialCorr(t(s, dir, "lineitem"), "l_quantity",
        "l_extendedprice", "l_discount")),

    // ---- Hill tail index of the top-100 account balances ----
    "q_hill_alpha" -> ((s, dir) =>
      Stats.hillAlpha(t(s, dir, "customer"), "c_acctbal", 100)),

    // ---- Benjamini–Yekutieli adjustment of the same per-segment KS
    //      battery as q_bh_fdr (valid under arbitrary dependence) ----
    "q_by_fdr" -> ((s, dir) =>
      Stats.byAdjust(
        Stats.ksTestBy(
          Tables.events(s, dir).withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7),
          "dow", "event_type", "value", "click", "purchase"),
        "p_approx", 0.05).orderBy("segment")),

    // ---- Wilcoxon signed-rank on the same per-user pairs as
    //      q_paired_t: the outlier-proof paired verdict ----
    "q_wilcoxon_signed" -> ((s, dir) =>
      Stats.wilcoxonSignedRank(perUserExperiment(s, dir),
        "x", "purchases")),

    // ---- linearly weighted kappa between the discount and tax tiers
    //      (ordinal agreement; near-misses cost 1/span) ----
    "q_weighted_kappa" -> ((s, dir) =>
      Stats.weightedKappa(
        t(s, dir, "lineitem").select(
          round(col("l_discount") * 100, 0).as("a"),
          round(col("l_tax") * 100, 0).as("b")),
        "a", "b")),

    // ---- Gwet's AC1 on the same rater pair as q_cohens_kappa:
    //      prevalence-robust agreement ----
    "q_gwet_ac1" -> ((s, dir) =>
      Stats.gwetAC1(t(s, dir, "lineitem"), "l_returnflag",
        "l_linestatus")),

    // ---- G-test (likelihood-ratio chi2) on the same table as q_chi2 ----
    "q_g_test" -> ((s, dir) =>
      Stats.gTest(
        Tables.events(s, dir).select(col("event_type"),
          (datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
            .as("dow")),
        "event_type", "dow")),

    // ---- committed-threshold confusion readout (MCC, balanced
    //      accuracy, F1) for the discount-as-score gate ----
    "q_confusion_stats" -> ((s, dir) =>
      Eval.confusionStats(t(s, dir, "lineitem"), "l_discount",
        col("l_returnflag") === "R", threshold = 0.05)),

    // ---- co-missingness pattern profile over planted null structure
    //      (value nulled on 7-multiples, props on 5-multiples) ----
    "q_null_pattern" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"),
        when(col("user_id") % 7 === 0, lit(null))
          .otherwise(col("value")).as("value"),
        when(col("user_id") % 5 === 0, lit(null))
          .otherwise(col("props")).as("props"))
      Profile.missingnessPatterns(ev, Seq("value", "props"))
        .orderBy("missing_cols")
    }),

    // ---- Benford first-digit audit of extended price: digit from the
    //      DECIMAL canonical rendering (no log10-boundary hazard), all
    //      9 digit rows guaranteed ----
    "q_benford" -> ((s, dir) =>
      Stats.benford(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy("digit")),

    // ---- autocorrelation of the daily event-count series at lags
    //      1..10 (weekly periodicity screen): one lag-expanded
    //      equi-join over the bounded daily table, exact limb-sum
    //      cross moments ----
    "q_acf" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.acf(daily, "t", "v", 10).orderBy("lag")
    }),

    // ---- Theil-Sen robust trend of the daily event-count series:
    //      median pairwise slope over the bounded series table ----
    "q_theil_sen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.theilSen(daily, "t", "v")
    }),

    // ---- classical additive seasonal decomposition of the daily event
    //      series (weekly period): centered moving-average trend,
    //      re-centered slot means, residual — all windows over the
    //      bounded series table ----
    "q_decompose" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.decomposeSeasonal(daily, "t", "v", 7).orderBy("t")
    }),

    // ---- two-proportion z-test: click vs purchase high-value rate ----
    "q_prop_test" -> ((s, dir) =>
      Stats.propTest(Tables.events(s, dir), "event_type",
        col("value") > 75, "click", "purchase")),

    // ---- Spearman rank correlation (tie-aware midranks, exact integer
    //      sums): both columns carry heavy ties, so the 2x-midrank
    //      arithmetic is fully exercised; windows run over bounded
    //      distinct-value tables ----
    "q_spearman" -> ((s, dir) =>
      Stats.spearman(Tables.events(s, dir), "value", "user_id")),

    // ---- Kendall tau-b from the 50x11 contingency table (exact
    //      concordant/discordant masses over cell pairs, tie-corrected) ----
    "q_kendall" -> ((s, dir) =>
      Stats.kendallTau(t(s, dir, "lineitem"), "l_quantity", "l_discount")),

    // ---- Cohen's kappa: returnflag-vs-linestatus agreement corrected
    //      for chance (one cell-table aggregation) ----
    "q_cohens_kappa" -> ((s, dir) =>
      Stats.cohensKappa(t(s, dir, "lineitem"), "l_returnflag", "l_linestatus")),

    // ---- Fleiss' κ over a 3-rater panel (three deterministic
    //      "high-value order" judgments per order — o_orderkey is the
    //      unique item key; exact integer folds) ----
    "q_fleiss_kappa" -> ((s, dir) =>
      Stats.fleissKappa(
        t(s, dir, "orders").select(
          col("o_orderkey").as("item"),
          explode(array(
            when(col("o_totalprice") > 150000, "hi").otherwise("lo"),
            when(col("o_orderpriority") < "3", "hi").otherwise("lo"),
            when(col("o_orderstatus") === "F", "hi").otherwise("lo")))
            .as("rating")),
        "item", "rating")),

    // ---- Krippendorff's α (nominal) over the ragged per-order
    //      returnflag panel: units = orders, ratings = line flags,
    //      single-line orders are unpairable and excluded ----
    "q_krippendorff" -> ((s, dir) =>
      Stats.krippendorffAlpha(t(s, dir, "lineitem"),
        "l_orderkey", "l_returnflag")),

    // ---- sample-ratio-mismatch check on a 25/25/50 designed split
    //      of distinct users (χ² GOF on the bounded arm table) ----
    "q_srm" -> ((s, dir) =>
      Experiment.srmCheck(
        Tables.events(s, dir).select(col("user_id")).distinct()
          .withColumn("arm",
            when(col("user_id") % 4 === 0, "arm0")
              .when(col("user_id") % 4 === 1, "arm1")
              .otherwise("arm2")),
        "arm", Map("arm0" -> 0.25, "arm1" -> 0.25, "arm2" -> 0.5))),

    // ---- switchback readout: arm alternates per 6-hour block (the
    //      marketplace design when user-level randomization leaks
    //      through shared inventory); blocks are the independent
    //      draws, so the analysis IS the cluster-robust z with
    //      cluster = block ----
    "q_switchback" -> ((s, dir) =>
      Experiment.clusterRobustZ(
        Tables.events(s, dir).filter(col("ts").isNotNull)
          .withColumn("block",
            floor(unix_micros(col("ts")) / lit(21600000000L)))
          .withColumn("arm",
            when(col("block") % 2 === 0, "A").otherwise("B")),
        "arm", "block", col("event_type") === "purchase", "A", "B")),

    // ---- cluster-robust z on EVENT-level conversion with user
    //      clusters: events within a user share an assignment, so the
    //      naive per-event variance is too small ----
    "q_cluster_z" -> ((s, dir) =>
      Experiment.clusterRobustZ(
        Tables.events(s, dir)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "arm", "user_id", col("event_type") === "purchase", "A", "B")),

    // ---- per-segment SRM: day-of-week segments, 50/50 design —
    //      a skew confined to one segment dilutes out of the global
    //      chi2 but flags here ----
    "q_srm_by_segment" -> ((s, dir) =>
      Experiment.srmBySegment(
        Tables.events(s, dir).filter(col("ts").isNotNull)
          .withColumn("dow",
            datediff(to_date(col("ts")), lit("1970-01-01")) % 7)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "dow", "arm", Map("A" -> 0.5, "B" -> 0.5))),

    // ---- A/A calibration: 50 seeded re-randomizations of the same
    //      population; the z test's false-positive rate should sit
    //      near 5% if the variance model is honest ----
    "q_aa_calibration" -> ((s, dir) =>
      Experiment.aaCalibration(perUserExperiment(s, dir),
        "user_id", col("purchases") >= 14L, 50)),

    // ---- relative lift with a delta-method CI on the RATE RATIO:
    //      the percentage a launch review reads, with the control
    //      rate's own noise priced in ----
    "q_relative_lift" -> ((s, dir) =>
      Experiment.relativeLiftCI(perUserExperiment(s, dir),
        "arm", col("purchases") >= 14L, "A", "B")),

    // ---- two-proportion z test: are heavy buyers (>= 14 purchases,
    //      ~median) more common in arm A? per-user fold, exact counts;
    //      the >=1-purchase outcome saturates at 1.0 here and would
    //      only ever exercise the degenerate-SE NULL path ----
    "q_ab_proportions" -> ((s, dir) =>
      Experiment.twoProportionZ(
        perUserExperiment(s, dir), "arm", col("purchases") >= 14L,
        "A", "B")),

    // ---- CUPED adjusted treatment effect: purchase value per user
    //      adjusted by the engagement covariate (clicks + views);
    //      exact decimal moment fold, one corpus scan ----
    "q_cuped" -> ((s, dir) =>
      Experiment.cuped(perUserExperiment(s, dir),
        "arm", "y", "x", "A", "B")),

    // ---- delta-method CI for the ratio-of-sums metric (purchase
    //      value per engagement event): per-user pairs, one exact
    //      moment fold, Taylor-expanded variance ----
    "q_ratio_ci" -> ((s, dir) =>
      Experiment.ratioMetricCI(perUserExperiment(s, dir), "y", "x")),

    // ---- leave-one-bucket-out jackknife CI for the same ratio:
    //      20 deterministic user buckets, replicate fold on the
    //      bounded bucket table ----
    "q_jackknife_ci" -> ((s, dir) =>
      Experiment.jackknifeRatioCI(
        perUserExperiment(s, dir).withColumn("bucket", col("user_id") % 20),
        "bucket", "y", "x")),

    // ---- McNemar paired test on the SAME users: "converted" vs
    //      "heavy clicker" — the discordant cells carry the signal ----
    "q_mcnemar" -> ((s, dir) => {
      val pu = Tables.events(s, dir).groupBy("user_id").agg(
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
      Experiment.mcNemar(pu, col("conv") === 1L, col("clicks") >= 10L)
    }),

    // ---- per-segment minimum detectable effect: is each market
    //      segment big enough to read a conversion lift at 80%
    //      power before burning traffic on it? ----
    "q_mde" -> ((s, dir) => {
      val ords = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      Experiment.mdeTable(
        t(s, dir, "customer").join(ords, Seq("c_custkey"), "left"),
        "c_mktsegment", col("n_orders") >= 1L)
    }),

    // ---- diff-in-diff on purchase value: arm from the bucketing
    //      hash, period split at mid-month, cell means differenced ----
    "q_did" -> ((s, dir) =>
      Experiment.diffInDiff(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B")),
        "arm",
        datediff(to_date(col("ts")), lit("1970-01-01")) >= 19738,
        "value", "A", "B")),

    // ---- keyword topic router: token-boundary broadcast join,
    //      dominant topic per doc, zero-hit docs absent by design ----
    "q_topic_tags" -> ((s, dir) =>
      TextAnalysis.topicTag(t(s, dir, "documents"), Map(
        "query_exec" -> Seq("scan", "filter", "join", "agg", "group"),
        "storage" -> Seq("table", "row", "column", "part", "hash"),
        "streaming" -> Seq("window", "batch", "order", "merge")))),

    // ---- tokenizer fertility per language: subwords per word and
    //      chars per subword — the multilingual budget dial ----
    "q_token_fertility" -> ((s, dir) =>
      TextAnalysis.tokenFertility(t(s, dir, "documents"))),

    // ---- always-valid sequential monitor: per-day mSPRT trajectory
    //      of the purchase-conversion delta, safe to peek daily ----
    "q_always_valid" -> ((s, dir) =>
      Experiment.alwaysValidMonitor(
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .withColumn("arm",
            when(col("user_id") % 2 === 0, "A").otherwise("B"))
          .withColumn("day",
            datediff(to_date(col("ts")), lit("1970-01-01"))),
        "day", "arm", col("event_type") === "purchase", "A", "B")),

    // ---- winsorized treatment effect: pooled p95 cap on the
    //      per-user purchase value, capped-row count surfaced ----
    "q_winsorized_effect" -> ((s, dir) =>
      Experiment.winsorizedEffect(perUserExperiment(s, dir),
        "arm", "y", 0.95, "A", "B")),

    // ---- uplift by engagement-score quintile + Qini walk: does
    //      high engagement rank the users the "treatment" moves? ----
    "q_uplift" -> ((s, dir) =>
      Experiment.upliftByQuantile(perUserExperiment(s, dir),
        "arm", "x", col("converted") === 1L, 5, "A", "B")),

    // ---- quantile treatment effects: per-arm exact p50/p90/p99 of
    //      the per-user purchase value, one 2x3-percentile fold ----
    "q_qte" -> ((s, dir) =>
      Experiment.quantileTreatmentEffect(perUserExperiment(s, dir),
        "arm", "y", Seq(0.5, 0.9, 0.99), "A", "B")),

    // ---- post-stratified treatment effect by signup-week stratum:
    //      composition-bias-free delta over the bounded strata table ----
    "q_post_strat" -> ((s, dir) => {
      val pu = Tables.events(s, dir).groupBy("user_id")
        .agg(
          min(datediff(to_date(col("ts")), lit("1970-01-01")))
            .as("first_day"),
          coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))),
            lit(0).cast("decimal(18,2)")).as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
        .withColumn("stratum",
          floor((col("first_day") - 19723) / 7).cast("long"))
      Experiment.postStratifiedEffect(pu, "arm", "stratum", "y", "A", "B")
    }),

    // ---- Holt linear smoothing of daily purchase revenue: level +
    //      trend state over the bounded daily table (9 dp recursion,
    //      replayed bit-for-bit by a recursive-CTE oracle) ----
    "q_holt" -> ((s, dir) =>
      Stats.holtSmooth(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull && col("ts").isNotNull)
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("rev")),
        "t", "rev", 0.3, 0.1)),

    // ---- single-changepoint locator on daily purchase revenue:
    //      CUSUM-statistic argmax over the bounded daily table ----
    "q_changepoint" -> ((s, dir) =>
      Stats.changepoint(
        Tables.events(s, dir)
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull && col("ts").isNotNull)
          .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("rev")),
        "t", "rev")),

    // ---- Poisson-bootstrap CI on the ARM-MEAN DIFFERENCE of per-user
    //      purchase value: same seeded integer draws, replicate deltas ----
    "q_bootstrap_delta" -> ((s, dir) =>
      Stats.bootstrapDeltaCI(perUserExperiment(s, dir),
        "user_id", "arm", "y", "A", "B")),

    // ---- Poisson-bootstrap CI of the purchase-value mean: seeded
    //      integer-threshold draws, exact decimal replicate sums ----
    "q_bootstrap_ci" -> ((s, dir) =>
      Stats.bootstrapMeanCI(
        Tables.events(s, dir)
          .filter(col("value").isNotNull && col("event_type") === "purchase"),
        "event_id", "value", nReplicates = 100)),

    // ---- PSI drift score: purchase values vs click-value reference
    //      bins (inverted-CDF decile edges, epsilon-clamped log-odds) ----
    "q_psi" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      Stats.psi(ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"), "value", 10)
        .withColumn("bin", col("bin").cast("long"))
        .orderBy("bin")
    }),

    // ---- JL random projection 64 -> 8 dims: seeded LCG sign grid
    //      (no stored model), exact decimal lane sums ----
    "q_rand_project" -> ((s, dir) =>
      Similarity.randomProject(t(s, dir, "embeddings"), "vec_id",
          "embedding", 8)
        .orderBy("vec_id", "j")),

    // ---- Kaplan-Meier survival curve of user lifetimes (censoring-
    //      aware retention): one per-user min/max pass, then all
    //      windows on the bounded lifetime table ----
    "q_kaplan_meier" -> ((s, dir) =>
      EventAnalytics.kaplanMeier(Tables.events(s, dir), "user_id", "ts",
          censorDays = 5)
        .orderBy("t")),

    // ---- tabular CUSUM change-point scan of the daily event-count
    //      series: prefix-sum/running-extreme formulation (no
    //      recursion), exact decimal cumulative arithmetic ----
    "q_cusum" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).cast("double").as("v"))
      Stats.cusum(daily, "t", "v", slack = 0.5, threshold = 4.0).orderBy("t")
    }),

    // ---- winsorized document lengths at the 1st/99th percentiles:
    //      inverted-CDF edges from the bounded distinct-value table,
    //      broadcast clip — no global row sort ----
    "q_winsorize" -> ((s, dir) =>
      Profile.winsorize(t(s, dir, "documents"), "doc_id", "n_chars",
          100, 9900)
        .orderBy("doc_id")),

    // ---- keyed pseudonymization: sha256(salt:value), referential
    //      integrity preserved, NULLs stay NULL, scan-speed ----
    "q_pseudonymize" -> ((s, dir) =>
      Privacy.pseudonymize(
          t(s, dir, "customer").select("c_custkey", "c_name", "c_mktsegment"),
          Seq("c_name"), "graft-salt")
        .orderBy("c_custkey")),

    // ---- k-anonymity audit: quasi-identifier groups smaller than k
    //      (re-identifiable combinations) + global risk summary; one
    //      map-side-combined count, bounded group table after ----
    "q_k_anonymity" -> ((s, dir) =>
      Privacy.kAnonymity(t(s, dir, "customer"),
          Seq("c_mktsegment", "c_nationkey"), 10)
        .orderBy("c_mktsegment", "c_nationkey")),

    // ---- l-diversity audit: quasi groups whose sensitive column
    //      collapses below l distinct values (attribute disclosure
    //      inside a k-anonymous group) ----
    "q_l_diversity" -> ((s, dir) =>
      Privacy.lDiversity(
          t(s, dir, "orders").withColumn("ym",
            year(col("o_orderdate")) * 100 + month(col("o_orderdate"))),
          Seq("o_orderpriority", "ym"), "o_orderstatus", 3)
        .orderBy("o_orderpriority", "ym")),

    // ---- t-closeness audit: quasi groups whose sensitive distribution
    //      sits > t total-variation from the global one (diverse-but-
    //      skewed leakage that l-diversity misses); absent-value mass
    //      added analytically, exact cross-multiplied integer terms ----
    "q_t_closeness" -> ((s, dir) =>
      Privacy.tCloseness(
          t(s, dir, "orders").withColumn("ym",
            year(col("o_orderdate")) * 100 + month(col("o_orderdate"))),
          Seq("o_orderpriority", "ym"), "o_orderstatus", 0.2)
        .orderBy("o_orderpriority", "ym")),

    // ---- key-skew profile of the event user distribution: top-20
    //      heavy keys + decimal-summed Shannon entropy; every stage
    //      after the first runs on the key-count table ----
    "q_key_skew" -> ((s, dir) =>
      Profile.keySkew(Tables.events(s, dir), "user_id", 20)
        .orderBy(col("cnt").desc, col("key"))),

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

    // ---- seasonal (type x dow x hour) baseline anomaly flags: exact
    //      limb-sum slot moments, bounded slot table broadcast back ----
    "q_seasonal_baseline" -> ((s, dir) =>
      EventAnalytics.seasonalBaseline(Tables.events(s, dir), "event_type",
          "ts", "event_id", "value")
        .orderBy("event_id")),

    // ---- percentile-rank transform from the bounded distinct-value
    //      CDF (no global sort-window); oracle cross-checks with
    //      DuckDB's cume_dist ----
    "q_pct_rank" -> ((s, dir) =>
      Profile.percentileRank(t(s, dir, "documents"), "doc_id", "n_chars")
        .orderBy("doc_id")),

    // ---- grouped percentile rank: each doc's length percentile within
    //      its OWN language — the per-group CDF join (windows run over
    //      the group's distinct values, never its rows) ----
    "q_pct_rank_by" -> ((s, dir) =>
      Profile.percentileRankBy(t(s, dir, "documents"), "doc_id", "n_chars",
          Seq("lang"))
        .orderBy("doc_id")),

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
    }),

    // ---- label-propagation communities, planted gate: two 5-cliques
    //      bridged by one edge (4-5) from nation keys converge in 3
    //      deterministic rounds to communities 0 and 5 (hand-traced:
    //      self-vote + min tie-break; node 5 briefly takes 4 in round 1
    //      and is pulled back by its clique's majority in round 2) ----
    "q_lpa" -> ((s, dir) => {
      val ids = t(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id"))
        .filter(col("id") <= 9)
      val a = ids.select(col("id").as("src"))
      val b = ids.select(col("id").as("dst"))
      val edges = a.crossJoin(b).filter(
        (col("src") < 5 && col("dst") < 5 && col("src") < col("dst")) ||
          (col("src") >= 5 && col("dst") >= 5 && col("src") < col("dst")) ||
          (col("src") === 4 && col("dst") === 5))
      // 3 fixed rounds, no early-exit jobs: the hand-trace reaches the
      // fixpoint after round 2, round 3 re-confirms it (identical
      // labeling), so the fixed-round mode returns the converged result
      Graph.labelPropagation(edges, maxIter = 3, earlyExit = false)
        .orderBy("id")
    }),

    // ---- seeded uniform random walks (the DeepWalk/node2vec corpus
    //      generator) over the part->supplier co-occurrence graph folded
    //      into one id space; md5-indexed neighbor choice makes every
    //      walk a pure function of (seed, data), so the oracle replays
    //      the four steps bit-for-bit with unrolled joins ----
    "q_random_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.randomWalks(edges, starts, walkLength = 4)
        .orderBy("walk_id", "step", "node")
    }),

    // ---- the DeepWalk pipeline end-to-end: the seeded walks above piped
    //      into skip-gram (center, context) pair counts — the training
    //      corpus a graph-embedding model consumes. One walk-keyed
    //      window pass, map-side-combined pair aggregation ----
    "q_walk_skipgrams" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      val walks = Graph.randomWalks(edges, starts, walkLength = 4)
      Graph.walkContextPairs(walks, window = 2)
        .orderBy("center", "context")
    }),

    // ---- edge-weight-proportional walks over the co-occurrence
    //      MULTIGRAPH (weight = pair multiplicity, so heavily co-bought
    //      pairs are walked proportionally more): integer weights keep
    //      the cumulative sums exact, so the oracle's windowed running
    //      sums replay the interval draws bit-for-bit ----
    "q_weighted_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"),
        lit(1L).as("weight"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.weightedWalks(edges, starts, walkLength = 4)
        .orderBy("walk_id", "step", "node")
    }),

    // ---- node2vec biased walks (p=2 discourages backtracking, q=4
    //      keeps the walk in the BFS neighborhood) over the same graph.
    //      DYADIC weights (0.5 / 1.0 / 0.25) make every cumulative sum
    //      exact in binary floating point, so the oracle's windowed
    //      running sums replay the interval selection bit-for-bit ----
    "q_node2vec_walks" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      val starts = edges.select(col("src").as("id"))
        .filter(col("id") % 7 === 0).distinct()
      Graph.node2vecWalks(edges, starts, walkLength = 4, p = 2.0, q = 4.0)
        .orderBy("walk_id", "step", "node")
    }),

    // ---- deterministic out-degree cap (the GraphSAGE-style neighbor
    //      sample the node2vec hub contract points to): keep the maxDeg
    //      neighbors with smallest md5("cap:seed:src:dst") — a pure
    //      function of (seed, data) the oracle ranks identically ----
    "q_degree_cap" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem").select(
        (col("l_partkey") % 500).cast("long").as("src"),
        (col("l_suppkey") % 500).cast("long").as("dst"))
      Graph.capOutDegree(edges, maxDeg = 3).orderBy("src", "dst")
    })
  )

  def oracles: Map[String, String] = dmap(
    // lowercase-hex md5 strings order byte-identically in both engines
    "q_degree_cap" ->
      """WITH e AS (SELECT DISTINCT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst FROM lineitem),
        |r AS (SELECT src, dst, row_number() OVER (PARTITION BY src
        |    ORDER BY md5('cap:7:' || CAST(src AS VARCHAR) || ':' ||
        |      CAST(dst AS VARCHAR))) AS rn
        |  FROM e)
        |SELECT src, dst FROM r WHERE rn <= 3 ORDER BY src, dst""".stripMargin,
    "q_text_tokens" ->
      s"""SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      s"""WITH $qualityCtes
        |SELECT doc_id, n_tokens, punct_ratio, stop_ratio, mean_token_len,
        |  quality_score
        |FROM qs ORDER BY doc_id""".stripMargin,

    // exact quantile gate: threshold = min{v : F(v) >= 0.5} over the
    // (bounded-cardinality) quality scores — same cumulative definition
    // as Sampling.filterTopQuantile
    "q_quality_gate" ->
      s"""WITH $qualityCtes,
        |c AS (SELECT quality_score AS v, count(*) AS n FROM qs GROUP BY v),
        |cc AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum,
        |    (SELECT count(*) FROM qs) AS tot FROM c),
        |t AS (SELECT min(v) AS thr FROM cc WHERE cum >= 0.5 * tot)
        |SELECT doc_id, quality_score FROM qs, t
        |WHERE quality_score >= thr ORDER BY doc_id""".stripMargin,

    // shuffle-shard replay: same md5 digest, same 60-bit shard bucket,
    // same (digest, key) in-shard rank
    "q_shuffle_shard" ->
      """WITH d AS (SELECT doc_id,
        |    md5('shuf:' || CAST(doc_id AS VARCHAR)) AS dig FROM documents),
        |s AS (SELECT doc_id,
        |    CAST(('0x' || substr(dig, 1, 15)) AS BIGINT) % 8 AS shard, dig
        |  FROM d)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY dig, doc_id)
        |    AS BIGINT) AS seq
        |FROM s ORDER BY shard, seq""".stripMargin,

    // temperature weights: same pow/normalize, rounded at 6 dp
    "q_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source)
        |SELECT source, n,
        |  round(pow(CAST(n AS DOUBLE), 0.7)
        |        / SUM(pow(CAST(n AS DOUBLE), 0.7)) OVER (), 6) AS weight
        |FROM c ORDER BY source""".stripMargin,

    // temperature sample replay: quotas from the rounded weights, rows
    // by the same md5-of-key per-domain rank
    "q_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |w AS (SELECT source, n,
        |    round(pow(CAST(n AS DOUBLE), 0.7)
        |          / SUM(pow(CAST(n AS DOUBLE), 0.7)) OVER (), 6) AS weight
        |  FROM c),
        |q AS (SELECT source,
        |    least(n, CAST(round(300.0 * weight, 0) AS BIGINT)) AS take_n FROM w),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5('tmix:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source FROM r JOIN q USING (source)
        |WHERE rk <= take_n ORDER BY doc_id""".stripMargin,

    // A-ES weighted sample replay: same md5-uniform, same ln(u)/w key,
    // same (key DESC, id) top-100
    "q_weighted_sample" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE) AS w
        |  FROM documents),
        |k AS (SELECT doc_id, w,
        |    ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 16))
        |          AS UBIGINT)::DOUBLE + 1)
        |       / 18446744073709551616.0) / w AS wkey
        |  FROM d WHERE w > 0),
        |top AS (SELECT doc_id, w FROM k ORDER BY wkey DESC, doc_id LIMIT 100)
        |SELECT doc_id, w AS weight FROM top ORDER BY doc_id""".stripMargin,

    // incremental dedup truth: exact all-pairs Jaccard between the new
    // batch and the corpus (banding completeness per the q_dedup_minhash
    // analysis: natural near-dup pairs here sit at J >= 0.7)
    // new-vs-corpus candidates via the same inverted-index trick as
    // jaccardTruthSql (the n×c cross is quadratic at sf0.1; a pair with
    // j >= 0.5 shares a shingle, so the gram equi-join loses nothing)
    "q_incremental_dedup" -> incrementalDedupTruthSql,

    // the persisted-index round trip must reproduce the direct
    // computation exactly, so it shares the same truth
    "q_dedup_index" -> incrementalDedupTruthSql,

    // contamination matrix: same distinct (source, 5-gram) set, same
    // pair join and overlap coefficient (exact int/int division)
    "q_contamination_matrix" ->
      s"""WITH tks AS (SELECT source, $toksSql AS tk FROM documents),
        |g AS (SELECT DISTINCT source, unnest(
        |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(tk) - 3),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |                tk[i+3] || ' ' || tk[i+4])) END) AS gram
        |  FROM tks),
        |s AS (SELECT source, count(*) AS n_grams FROM g GROUP BY source),
        |p AS (SELECT a.source AS src1, b.source AS src2, count(*) AS shared_grams
        |  FROM g a JOIN g b USING (gram) WHERE a.source < b.source GROUP BY 1, 2)
        |SELECT src1, src2, shared_grams, s1.n_grams AS n1, s2.n_grams AS n2,
        |  CAST(shared_grams AS DOUBLE) / least(s1.n_grams, s2.n_grams) AS overlap
        |FROM p JOIN s s1 ON s1.source = src1 JOIN s s2 ON s2.source = src2
        |ORDER BY src1, src2""".stripMargin,

    // duplicate n-gram fraction truth: distinct per-doc 5-gram shingles
    // (whole-text fallback under 5 tokens), corpus document counts
    "q_dup_ngrams" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |g AS (SELECT doc_id, unnest(
        |    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
        |         ELSE list_distinct(list_transform(range(1, len(tk) - 3),
        |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |                tk[i+3] || ' ' || tk[i+4])) END) AS gram
        |  FROM tks),
        |c AS (SELECT gram, count(*) AS docs_with FROM g GROUP BY gram)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
        |  CAST(SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS dup_frac
        |FROM g JOIN c USING (gram) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // duplicated-substring spans: positioned 8-grams (0-based start) via
    // parallel list unnest, occurrence counts >= 2, then the same
    // gaps-and-islands fold (break when pos - prev > k) — all integers,
    // exact replay of the engine's window plan
    "q_dup_spans" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |g AS (SELECT doc_id,
        |    CAST(unnest(range(0, len(tk) - 7)) AS INT) AS pos,
        |    unnest(list_transform(range(1, len(tk) - 6),
        |      i -> array_to_string(tk[i:i+7], ' '))) AS gram
        |  FROM tks WHERE len(tk) >= 8),
        |rep AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |dp AS (SELECT doc_id, pos FROM g JOIN rep USING (gram)),
        |brk AS (SELECT doc_id, pos,
        |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
        |         THEN 1 ELSE 0 END AS b
        |  FROM dp),
        |isl AS (SELECT doc_id, pos,
        |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS UNBOUNDED PRECEDING) AS island
        |  FROM brk)
        |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
        |  CAST(max(pos) + 7 AS INT) AS span_end,
        |  count(*) AS n_dup_grams
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    "q_text_langid" -> {
      val langs = TextAnalysis.langMarkers.map(_._1)
      val counts = TextAnalysis.langMarkers.map { case (l, re) =>
        s"len(regexp_extract_all(lower(text), '$re')) AS c_$l"
      }.mkString(",\n|    ")
      val cases = langs.map { l =>
        val ge = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN c_$l > 0 AND $ge THEN '$l'"
      }.mkString("\n|    ")
      s"""WITH c AS (SELECT doc_id,
        |    $counts
        |  FROM documents)
        |SELECT doc_id,
        |  CASE $cases
        |    ELSE 'und' END AS pred_lang,
        |  ${langs.map(l => s"c_$l").mkString(", ")}
        |FROM c ORDER BY doc_id""".stripMargin
    },

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_copies,
        |  min(doc_id) AS keeper
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "q_dedup_jaccard" ->
      s"""WITH toks AS (SELECT doc_id, lang, list_distinct($toksSql) AS t FROM documents),
        |  pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
        |      / CAST(len(list_distinct(a.t || b.t)) AS DOUBLE) AS jaccard
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        |SELECT id1, id2, jaccard FROM pairs WHERE jaccard >= 0.9 ORDER BY id1, id2""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $jaccardTruthSql
        |SELECT id1, id2, jaccard FROM pairs WHERE jaccard >= 0.5
        |ORDER BY id1, id2""".stripMargin,

    // banding-planner truth: same closed-form s-curve per divisor pair
    // (CAST to DOUBLE everywhere — DuckDB bare literals are DECIMAL and
    // decimal pow would diverge from the operator's double math)
    "q_lsh_plan" ->
      """WITH f AS (SELECT CAST(b AS BIGINT) AS bands,
        |    CAST(64 // b AS BIGINT) AS rows_per_band
        |  FROM range(1, 65) t(b) WHERE 64 % b = 0)
        |SELECT bands, rows_per_band,
        |  round(pow(CAST(1.0 AS DOUBLE) / CAST(bands AS DOUBLE),
        |    CAST(1.0 AS DOUBLE) / CAST(rows_per_band AS DOUBLE)), 6)
        |    AS s_star,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE)
        |    - pow(CAST(0.8 AS DOUBLE), CAST(rows_per_band AS DOUBLE)),
        |    CAST(bands AS DOUBLE)), 6) AS p_at_target,
        |  round(CAST(1.0 AS DOUBLE) - pow(CAST(1.0 AS DOUBLE)
        |    - pow(CAST(0.3 AS DOUBLE), CAST(rows_per_band AS DOUBLE)),
        |    CAST(bands AS DOUBLE)), 6) AS p_at_distractor
        |FROM f ORDER BY bands""".stripMargin,

    "q_dedup_corpus" ->
      s"""WITH RECURSIVE $jaccardTruthSql,
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs WHERE jaccard >= 0.5
        |          UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
        |reach AS (SELECT doc_id AS id, doc_id AS lab FROM documents
        |          UNION SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT doc_id, component FROM documents JOIN comp ON id = doc_id
        |WHERE component = doc_id ORDER BY doc_id""".stripMargin,

    // SimHash replay: per-token md5-u64 hashes -> signed bit votes ->
    // 64-bit signature -> all-pairs Hamming. Bit-exact vs the Spark
    // kernel because both sides hash the same UTF-8 bytes with md5 and
    // take the first 8 bytes big-endian.
    "q_dedup_simhash" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |tok AS (SELECT doc_id, unnest(tk) AS t FROM tks),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS hv FROM tok),
        |votes AS (SELECT doc_id, b,
        |    SUM(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN range(64) AS rb(b) GROUP BY doc_id, b),
        |sig0 AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b
        |             ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS sig
        |  FROM votes GROUP BY doc_id),
        |sigs AS (SELECT d.doc_id, COALESCE(s.sig, CAST(0 AS UBIGINT)) AS sig
        |  FROM documents d LEFT JOIN sig0 s USING (doc_id)),
        |pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    bit_count(xor(a.sig, b.sig)) AS hamming
        |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
        |SELECT id1, id2, CAST(hamming AS INT) AS hamming FROM pairs
        |WHERE hamming <= 3 ORDER BY id1, id2""".stripMargin,

    "q_planted_minhash" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents
        |  WHERE doc_id % 5 = 0),
        |sh AS (SELECT doc_id, $shinglesSql AS s FROM tks)
        |SELECT doc_id AS id1, doc_id + 10000000 AS id2 FROM sh
        |WHERE len(s) >= 10 ORDER BY id1, id2""".stripMargin,

    "q_planted_simhash" ->
      """SELECT * FROM (VALUES ('blocking_matches_bruteforce', true),
        |  ('planted_pairs_found', true)) AS t(check_name, ok)
        |ORDER BY check_name""".stripMargin,

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

    // bit-for-bit replay of the seeded walks: the md5-indexed neighbor
    // choice is a pure function of (seed, data), so four unrolled joins
    // reproduce the Spark iteration exactly
    "q_random_walks" ->
      s"""WITH $walkOracleCtes
        |SELECT walk_id, step, node FROM steps
        |ORDER BY walk_id, step, node""".stripMargin,

    // weighted-walk replay: multiplicity-weighted adjacency, per-step
    // interval selection over exact integer-valued running sums
    "q_weighted_walks" -> {
      def stepCte(k: Int): String =
        s"""wt$k AS (SELECT f.walk_id, f.node AS cur, n.dst AS cand, n.w,
           |    SUM(n.w) OVER (PARTITION BY f.walk_id ORDER BY n.rnk) AS cum,
           |    CAST(CAST(CAST(('0x' || substr(md5('ww:7:' ||
           |        CAST(f.walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(f.node AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |        AS DOUBLE) / 1152921504606846976.0
           |      * SUM(n.w) OVER (PARTITION BY f.walk_id) AS thr
           |  FROM ws${k - 1} f JOIN wnbr n ON n.src = f.node),
           |ws$k AS (SELECT walk_id, cand AS node FROM wt$k
           |  WHERE cum > thr AND cum - w <= thr)""".stripMargin
      s"""WITH we AS (SELECT CAST(l_partkey % 500 AS BIGINT) AS src,
        |    CAST(l_suppkey % 500 AS BIGINT) AS dst,
        |    CAST(count(*) AS DOUBLE) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |wnbr AS (SELECT src, dst, w,
        |    CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1
        |      AS BIGINT) AS rnk
        |  FROM we),
        |ws0 AS (SELECT DISTINCT src AS walk_id, src AS node FROM we
        |  WHERE src % 7 = 0),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM ws0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM ws1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM ws2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM ws3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM ws4
        |ORDER BY walk_id, step, node""".stripMargin
    },

    // node2vec replay: same nbr/start CTEs, per-step candidate weights
    // (prev-NULL uniform / return 0.5 / distance-1 1.0 / drift 0.25 —
    // dyadic, so the running sums are exact), interval selection by the
    // 60-bit md5 uniform times the partition total
    "q_node2vec_walks" -> {
      def stepCte(k: Int): String =
        s"""n2c$k AS (SELECT f.walk_id, f.node AS cur, f.prev,
           |    n.dst AS cand, n.rnk,
           |    CASE WHEN f.prev IS NULL THEN 1.0
           |         WHEN n.dst = f.prev THEN 0.5
           |         WHEN d.dst IS NOT NULL THEN 1.0
           |         ELSE 0.25 END AS w
           |  FROM n2s${k - 1} f JOIN nbr n ON n.src = f.node
           |  LEFT JOIN e d ON d.src = f.prev AND d.dst = n.dst),
           |n2t$k AS (SELECT walk_id, cur, cand, w,
           |    SUM(w) OVER (PARTITION BY walk_id ORDER BY rnk) AS cum,
           |    CAST(CAST(CAST(('0x' || substr(md5('n2v:7:' ||
           |        CAST(walk_id AS VARCHAR) || ':$k:' ||
           |        CAST(cur AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT)
           |        AS DOUBLE) / 1152921504606846976.0
           |      * SUM(w) OVER (PARTITION BY walk_id) AS thr
           |  FROM n2c$k),
           |n2s$k AS (SELECT walk_id, cand AS node, cur AS prev FROM n2t$k
           |  WHERE cum > thr AND cum - w <= thr)""".stripMargin
      s"""WITH $walkOracleCtes,
        |n2s0 AS (SELECT walk_id, node, CAST(NULL AS BIGINT) AS prev FROM s0),
        |${stepCte(1)},
        |${stepCte(2)},
        |${stepCte(3)},
        |${stepCte(4)}
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM n2s0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM n2s1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM n2s2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM n2s3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM n2s4
        |ORDER BY walk_id, step, node""".stripMargin
    },

    // the DeepWalk pipeline's training pairs: the same replayed walks
    // fed through a walk-keyed lead() window, exactly the q_skipgrams
    // extraction shape on node sequences
    "q_walk_skipgrams" ->
      s"""WITH $walkOracleCtes,
        |c AS (SELECT node AS center,
        |    lead(node, 1) OVER win AS c1,
        |    lead(node, 2) OVER win AS c2
        |  FROM steps WINDOW win AS (PARTITION BY walk_id ORDER BY step)),
        |pairs AS (
        |  SELECT center, c1 AS context FROM c WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM c WHERE c2 IS NOT NULL)
        |SELECT center, context, count(*) AS n FROM pairs
        |GROUP BY 1, 2 ORDER BY center, context""".stripMargin,

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

    // closed-form truth for the cell-mass drift: the planted margins pin
    // cell = vec_id % 4, so counts/shares/psi compute directly
    "q_cell_mass_drift" ->
      """WITH pts AS (SELECT vec_id, CAST(vec_id % 4 AS BIGINT) AS cell
        |  FROM embeddings),
        |a AS (SELECT cell, count(*) AS n1 FROM pts GROUP BY cell),
        |b AS (SELECT cell, count(*) AS n2 FROM pts
        |  WHERE vec_id % 8 <> 4 GROUP BY cell),
        |j AS (SELECT COALESCE(a.cell, b.cell) AS cell,
        |    COALESCE(n1, 0) AS n1, COALESCE(n2, 0) AS n2
        |  FROM a FULL OUTER JOIN b ON a.cell = b.cell),
        |t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM j),
        |sh AS (SELECT cell, n1, n2,
        |    round(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE), 6) AS share1,
        |    round(CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE), 6) AS share2
        |  FROM j, t)
        |SELECT cell, n1, n2, share1, share2,
        |  round((greatest(share1, 1e-6) - greatest(share2, 1e-6)) *
        |    ln(greatest(share1, 1e-6) / greatest(share2, 1e-6)), 6) AS psi_term
        |FROM sh ORDER BY cell""".stripMargin,

    // closed-form replay of the planted cross-snapshot matching: the
    // greedy assignment collapses to the stated pairs (one 7/sqrt(50)
    // partner per cell, cross terms <= 1/sqrt(50)), and each side's
    // masses are the planted-corner counts under its own quantizer
    "q_cell_matching" ->
      """WITH m1 AS (SELECT CAST(vec_id % 4 AS BIGINT) AS cell1,
        |    count(*) AS mass1
        |  FROM embeddings GROUP BY 1),
        |m2 AS (SELECT CAST(vec_id % 4 AS BIGINT) AS g, count(*) AS n
        |  FROM embeddings WHERE vec_id % 8 <> 4 GROUP BY 1),
        |pairs(c1, c2) AS (VALUES (0, 1), (1, 3), (2, 0), (3, 2))
        |SELECT m1.cell1, CAST(p.c2 AS BIGINT) AS cell2,
        |  round(7.0 / sqrt(50.0), 6) AS cosine, m1.mass1, m2.n AS mass2
        |FROM pairs p
        |JOIN m1 ON m1.cell1 = p.c1
        |JOIN m2 ON m2.g = (CASE p.c2 WHEN 0 THEN 2 WHEN 1 THEN 0
        |  WHEN 2 THEN 3 ELSE 1 END)
        |ORDER BY cell1""".stripMargin,

    // ARI/NMI replay from the closed-form contingency (cell1 = corner,
    // cell2 merges corners {0,1}): pair counts as exact decimal Σx² with
    // the halving on the final double scalar, 9-dp ln terms folded as
    // exact decimals — the operator's op order mirrored step for step
    "q_cluster_agreement" ->
      """WITH m AS (SELECT CAST(vec_id % 4 AS BIGINT) AS c1,
        |    CAST(CASE WHEN vec_id % 4 IN (0, 1) THEN 0
        |              WHEN vec_id % 4 = 2 THEN 1 ELSE 2 END AS BIGINT) AS c2
        |  FROM embeddings),
        |cont AS (SELECT c1, c2, count(*) AS nij FROM m GROUP BY 1, 2),
        |r AS (SELECT c1, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY 1),
        |c AS (SELECT c2, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY 1),
        |n AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
        |    sum(CAST(nij AS DECIMAL(18,0)) * CAST(nij AS DECIMAL(18,0))) AS qij
        |  FROM cont),
        |qa AS (SELECT sum(CAST(ai AS DECIMAL(18,0)) *
        |    CAST(ai AS DECIMAL(18,0))) AS qa FROM r),
        |qb AS (SELECT sum(CAST(bj AS DECIMAL(18,0)) *
        |    CAST(bj AS DECIMAL(18,0))) AS qb FROM c),
        |mi AS (SELECT sum(CAST(round((CAST(nij AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(nij AS DOUBLE) * CAST(n.n AS DOUBLE) /
        |        (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE))), 9)
        |    AS DECIMAL(20,9))) AS mi
        |  FROM cont JOIN r USING (c1) JOIN c USING (c2), n),
        |hu AS (SELECT sum(CAST(round(-(CAST(ai AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(ai AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
        |    AS DECIMAL(20,9))) AS hu FROM r, n),
        |hv AS (SELECT sum(CAST(round(-(CAST(bj AS DOUBLE) / CAST(n.n AS DOUBLE)) *
        |      ln(CAST(bj AS DOUBLE) / CAST(n.n AS DOUBLE)), 9)
        |    AS DECIMAL(20,9))) AS hv FROM c, n),
        |f AS (SELECT n.n AS n, CAST(n.n AS DOUBLE) AS nd,
        |    (CAST(qij AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sij,
        |    (CAST(qa AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sa2,
        |    (CAST(qb AS DOUBLE) - CAST(n.n AS DOUBLE)) / 2.0 AS sb2,
        |    CAST(mi AS DOUBLE) AS mid, CAST(hu AS DOUBLE) AS hud,
        |    CAST(hv AS DOUBLE) AS hvd
        |  FROM n, qa, qb, mi, hu, hv),
        |f2 AS (SELECT n, sij, sa2, sb2, mid, hud, hvd,
        |    sa2 * sb2 / ((nd * nd - nd) / 2.0) AS expv FROM f)
        |SELECT n,
        |  round((sij - expv) /
        |    nullif((sa2 + sb2) / 2.0 - expv, 0.0), 9) AS ari,
        |  round(mid / nullif(sqrt(hud * hvd), 0.0), 6) AS nmi,
        |  round(mid / nullif(hud, 0.0), 6) AS homogeneity,
        |  round(mid / nullif(hvd, 0.0), 6) AS completeness,
        |  round(2.0 * mid / nullif(hud + hvd, 0.0), 6) AS v_measure
        |FROM f2""".stripMargin,

    // bit-for-bit replay of the RFF-MMD statistic: md5-derived uniform
    // weights (pure IEEE arithmetic, no libm in the derivation), z
    // quantized at 6 dp and summed as exact decimals, Σ gap² summed as
    // exact decimals — every float op order mirrored
    "q_mmd_drift" -> {
      def zCte(src: String, name: String): String =
        s"""z$name AS (SELECT j, CAST(round(cos(list_dot_product(ve, wv) + b), 6)
           |    AS DECIMAL(20,6)) AS z
           |  FROM $src CROSS JOIN wl JOIN bv USING (j)),
           |m$name AS (SELECT j, SUM(z) AS s FROM z$name GROUP BY j)""".stripMargin
      def mmdCte(a: String, b: String, na: String, nb: String, name: String): String =
        s"""g$name AS (SELECT x.j,
           |    CAST(x.s AS DOUBLE) / CAST($na.n AS DOUBLE) -
           |    CAST(y.s AS DOUBLE) / CAST($nb.n AS DOUBLE) AS g
           |  FROM m$a x JOIN m$b y USING (j), $na, $nb),
           |r$name AS (SELECT CAST(SUM(CAST(round(g * g, 12) AS DECIMAL(24,12)))
           |    AS DOUBLE) * 0.125 AS mmd2 FROM g$name)""".stripMargin
      s"""WITH w AS (SELECT j, i,
        |    (CAST(('0x' || substr(md5('mmdw:7:' || CAST(j AS VARCHAR) || ':' ||
        |        CAST(i AS VARCHAR)), 1, 16)) AS UBIGINT)::DOUBLE
        |      / 18446744073709551616.0 * 2.0 - 1.0) AS wv
        |  FROM range(16) AS rj(j), range(64) AS ri(i)),
        |wl AS (SELECT j, list(wv ORDER BY i) AS wv FROM w GROUP BY j),
        |bv AS (SELECT j,
        |    CAST(('0x' || substr(md5('mmdb:7:' || CAST(j AS VARCHAR)), 1, 16))
        |      AS UBIGINT)::DOUBLE
        |      / 18446744073709551616.0 * 2.0 * pi() AS b
        |  FROM range(16) AS rj(j)),
        |v AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
        |  FROM embeddings),
        |ev AS (SELECT ve FROM v WHERE vec_id % 2 = 0),
        |od AS (SELECT ve FROM v WHERE vec_id % 2 = 1),
        |sh AS (SELECT list_transform(ve, x -> x + 0.25) AS ve FROM od),
        |n1c AS (SELECT count(*) AS n FROM ev),
        |n2c AS (SELECT count(*) AS n FROM od),
        |${zCte("ev", "ev")},
        |${zCte("od", "od")},
        |${zCte("sh", "sh")},
        |${mmdCte("ev", "od", "n1c", "n2c", "null")},
        |${mmdCte("ev", "sh", "n1c", "n2c", "sh")}
        |SELECT 'null' AS pair, n1c.n AS n1, n2c.n AS n2, mmd2
        |FROM rnull, n1c, n2c
        |UNION ALL SELECT 'shifted', n1c.n, n2c.n, mmd2 FROM rsh, n1c, n2c
        |ORDER BY pair""".stripMargin
    },

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  hex(encode(substr(text, 1, 4))) AS header_hex,
        |  CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_unpivot" ->
      """SELECT p_partkey, measure, value FROM (
        |  SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'p_retailprice', p_retailprice FROM part)
        |ORDER BY p_partkey, measure""".stripMargin,

    "q_json_extract" ->
      """WITH e AS (SELECT event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val FROM events)
        |SELECT k_val % 10 AS k_mod, count(*) AS n, CAST(sum(k_val) AS BIGINT) AS sum_k
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_salted_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value, d.user_events
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |ORDER BY e.event_id""".stripMargin,

    "q_multimodal_frames" ->
      """WITH f AS (SELECT doc_id, text,
        |    greatest(CAST(floor(length(text) / 4) AS INTEGER), 1) AS w FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |  md5(substr(text, 1 + i * w, w)) AS frame_md5
        |FROM f, generate_series(0, 3) AS t(i) ORDER BY doc_id, frame_idx""".stripMargin,

    // planted truth: container parameters are pure doc_id arithmetic
    // (mp4: mvhd timescale 1000 so duration units are ms; avi: 40000
    // us/frame so duration_ms = 40 * frames); junk rows parse to NULLs
    "q_video_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'mp4'
        |       WHEN doc_id % 3 = 1 THEN 'avi' END AS container,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 * (doc_id % 60 + 4) AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 320 + 16 AS INTEGER)
        |       END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST(16 * (doc_id % 40 + 3) AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST(doc_id % 240 + 12 AS INTEGER)
        |       END AS height,
        |  CASE WHEN doc_id % 3 = 0 THEN doc_id % 9000 + 1000
        |       WHEN doc_id % 3 = 1 THEN 40 * (doc_id % 500 + 50)
        |       END AS duration_ms,
        |  CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id // 3) % 3 + 1 AS INTEGER)
        |       WHEN doc_id % 3 = 1 THEN CAST((doc_id // 3) % 2 + 1 AS INTEGER)
        |       END AS n_tracks
        |FROM documents ORDER BY doc_id""".stripMargin,

    // frame-plan truth: closed-form duration per container class (the
    // q_video_meta derivation), midpoint-uniform integer timestamps
    "q_frame_timestamps" ->
      """WITH m AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 9000 + 1000
        |         WHEN doc_id % 3 = 1 THEN 40 * (doc_id % 500 + 50)
        |         END AS dur
        |  FROM documents),
        |f AS (SELECT doc_id, dur, CAST(i AS INTEGER) AS frame_idx
        |  FROM m CROSS JOIN range(0, 5) t(i)
        |  WHERE dur IS NOT NULL AND dur > 0)
        |SELECT doc_id, frame_idx,
        |  CAST(((2 * frame_idx + 1) * dur) // 10 AS BIGINT) AS ts_ms
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // planted truth: every selected doc pairs with its +10M resized twin
    // at dHash Hamming 0 (cell-aligned pattern, spec-proven exact);
    // unrelated doc seeds sit ~24/64 bits apart, far outside <= 3
    "q_image_neardup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id % 7 = 0 ORDER BY id1, id2""".stripMargin,

    // DSIR truth: same md5 buckets, same smoothing, same fixed
    // operation order per bucket, decimal-summed per doc
    "q_dsir_weights" ->
      s"""WITH rawt AS (SELECT doc_id,
        |    unnest($toksSql) AS term FROM documents),
        |tart AS (SELECT unnest($toksSql) AS term FROM documents
        |  WHERE lang = 'en'),
        |rb AS (SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS UBIGINT)
        |    % 1000 AS bucket, COUNT(*) AS nr FROM rawt GROUP BY 1),
        |tb AS (SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS UBIGINT)
        |    % 1000 AS bucket, COUNT(*) AS nt FROM tart GROUP BY 1),
        |tot AS (SELECT (SELECT SUM(nr) FROM rb) AS rt,
        |    (SELECT SUM(nt) FROM tb) AS tt),
        |ratio AS (SELECT COALESCE(rb.bucket, tb.bucket) AS bucket,
        |    round(ln((COALESCE(nt, 0) + 0.5) / (tt + 500.0))
        |      - ln((COALESCE(nr, 0) + 0.5) / (rt + 500.0)), 6) AS lr
        |  FROM rb FULL OUTER JOIN tb ON rb.bucket = tb.bucket CROSS JOIN tot),
        |d AS (SELECT doc_id, COUNT(*) AS n_tokens,
        |    CAST(SUM(CAST(lr AS DECIMAL(18,6))) AS DOUBLE) AS log_weight
        |  FROM (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 15))
        |      AS UBIGINT) % 1000 AS bucket FROM rawt) r
        |    JOIN ratio USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, COALESCE(n_tokens, 0) AS n_tokens,
        |  COALESCE(log_weight, 0.0) AS log_weight
        |FROM documents LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin,

    // golden-record truth: per cluster and per FIELD, the row winning
    // (non-null, score, tie) — replayed with one window per field
    "q_golden_record" ->
      """WITH b AS (SELECT c_nationkey, c_custkey, c_acctbal, c_mktsegment,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS alt_name
        |  FROM customer),
        |p AS (SELECT c_nationkey, alt_name, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY (alt_name IS NOT NULL) DESC,
        |      c_acctbal DESC, c_custkey DESC) AS rn FROM b),
        |m AS (SELECT c_nationkey, c_mktsegment, row_number() OVER (
        |    PARTITION BY c_nationkey ORDER BY (c_mktsegment IS NOT NULL) DESC,
        |      c_acctbal DESC, c_custkey DESC) AS rn FROM b),
        |n AS (SELECT c_nationkey, count(*) AS n_sources FROM b GROUP BY 1)
        |SELECT p.c_nationkey, p.alt_name, m.c_mktsegment, n.n_sources
        |FROM p JOIN m USING (c_nationkey) JOIN n USING (c_nationkey)
        |WHERE p.rn = 1 AND m.rn = 1 ORDER BY c_nationkey""".stripMargin,

    // line-dedup truth in closed form: the shared header/footer exceed
    // maxOccur document-frequency, the two id-bearing lines never do
    "q_line_dedup" ->
      """SELECT doc_id,
        |  'unique' || CAST(doc_id AS VARCHAR) || ' content line one' ||
        |    chr(10) ||
        |  'unique' || CAST(doc_id AS VARCHAR) || ' content line two'
        |    AS text_clean,
        |  CAST(2 AS BIGINT) AS n_removed
        |FROM documents WHERE doc_id % 19 = 0 ORDER BY doc_id""".stripMargin,

    // planted truth: every selected doc pairs with its +10M
    // shifted-duplicate twin (chunk re-synchronization guarantees well
    // over minShared shared chunks; id-carrying tokens keep cross-doc
    // chunks unequal)
    "q_cdc_dedup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2
        |FROM documents WHERE doc_id % 17 = 0 ORDER BY id1, id2""".stripMargin,

    // planted truth: of the three Hamming-0 candidate pairs per doc,
    // only the true resized twin survives pixel verification (exact
    // grid distance 0; the +40 decoy sits at exactly 40)
    "q_image_verified_dedup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0.0 AS DOUBLE) AS mean_abs_diff
        |FROM documents WHERE doc_id % 13 = 0 ORDER BY id1, id2""".stripMargin,

    // planted truth: every selected doc pairs with its +10M resampled
    // twin at envelope Hamming 0 (segment-aligned amplitudes,
    // spec-proven exact); unrelated seeds sit ~32/64 bits apart
    "q_audio_neardup" ->
      """SELECT doc_id AS id1, doc_id + 10000000 AS id2,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id % 11 = 0 ORDER BY id1, id2""".stripMargin,

    // planted truth of the joint clusters: base docs are their own
    // component; +10M text twins attach when the drop-last-token twin
    // exists (shingle guard, same regime as q_planted_minhash); +20M
    // image twins always attach (resized pixels, dHash Hamming 0)
    "q_multimodal_dedup" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents
        |  WHERE doc_id % 9 = 0),
        |sh AS (SELECT doc_id, $shinglesSql AS s FROM tks)
        |SELECT doc_id, component FROM (
        |  SELECT doc_id, doc_id AS component FROM tks
        |  UNION ALL
        |  SELECT doc_id + 10000000, doc_id FROM sh
        |  WHERE doc_id % 2 = 0 AND len(s) >= 10
        |  UNION ALL
        |  SELECT doc_id + 20000000, doc_id FROM tks WHERE doc_id % 3 = 0)
        |ORDER BY doc_id""".stripMargin,

    "q_events_window" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |  clicks AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS click_value
        |    FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, e.value,
        |  c.ts AS click_ts, c.click_value
        |FROM ev e ASOF LEFT JOIN clicks c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,

    "q_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_set_ops" ->
      """WITH a AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |  b AS (SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT * FROM (
        |SELECT *, 'intersect' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL
        |SELECT *, 'except' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |ORDER BY op, o_orderkey""".stripMargin,

    "q_range_join" ->
      """SELECT c_custkey, s_suppkey, c_acctbal
        |FROM customer JOIN supplier
        |  ON c_acctbal BETWEEN s_acctbal - 50 AND s_acctbal + 50
        |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "q_interval_overlap" ->
      """SELECT s_suppkey, c_custkey
        |FROM supplier JOIN customer
        |  ON s_acctbal - 50 <= c_acctbal + 25 AND c_acctbal - 25 <= s_acctbal + 50
        |ORDER BY s_suppkey, c_custkey""".stripMargin,

    "q_diff_bag_hashed" ->
      """WITH u AS (
        |  SELECT *, 'db1' AS observed_in FROM lineitem
        |  UNION ALL SELECT *, 'db1' FROM lineitem WHERE l_orderkey % 7 = 0
        |  UNION ALL SELECT *, 'db2' FROM lineitem)
        |SELECT * EXCLUDE (observed_in), count(*) FILTER (observed_in = 'db1') AS n_db1,
        |  count(*) FILTER (observed_in = 'db2') AS n_db2
        |FROM u GROUP BY ALL
        |HAVING n_db1 <> n_db2
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_repetition" ->
      s"""WITH b AS (SELECT doc_id, text, $toksSql AS tk FROM documents),
        |  g AS (SELECT doc_id, text, tk,
        |    list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS bgs FROM b),
        |  f AS (SELECT doc_id, length(text) AS n_chars, len(tk) AS n_tokens,
        |    CASE WHEN len(tk) = 0 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) END AS dup_token_frac,
        |    CASE WHEN len(bgs) = 0 THEN 0.0
        |         ELSE 1.0 - CAST(len(list_distinct(bgs)) AS DOUBLE) / len(bgs) END AS dup_bigram_frac,
        |    bgs FROM g),
        |  e AS (SELECT doc_id, unnest(bgs) AS bg FROM f),
        |  c AS (SELECT doc_id, bg, count(*) AS c FROM e GROUP BY doc_id, bg),
        |  top AS (SELECT doc_id, bg, c,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bg DESC) AS rn FROM c)
        |SELECT f.doc_id, n_tokens, dup_token_frac, dup_bigram_frac,
        |  coalesce(t.bg, '') AS top_bigram,
        |  coalesce(t.c, 0) AS top_bigram_n,
        |  CAST(coalesce(t.c, 0) AS DOUBLE) * length(coalesce(t.bg, ''))
        |    / greatest(n_chars, 1) AS top_bigram_frac
        |FROM f LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_hash_split" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_group_split" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(lang), 1, 8)) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    "q_purchase_attribution" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    event_type FROM events),
        |  p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
        |  c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
        |  count(*) AS n_prior_clicks,
        |  (max(ROW(c.ts, c.value)))[2] AS last_click_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 180 MINUTE
        |GROUP BY p.event_id, p.user_id, p.ts, p.value
        |ORDER BY p.event_id""".stripMargin,

    "q_vocab_topk" ->
      s"""SELECT term, count(*) AS n
        |FROM (SELECT unnest($toksSql) AS term FROM documents)
        |GROUP BY term ORDER BY n DESC, term LIMIT 25""".stripMargin,

    "q_corpus_stats" ->
      s"""WITH d AS (SELECT CAST(len($toksSql) AS BIGINT) AS nt,
        |    CAST(length(text) AS BIGINT) AS nc FROM documents)
        |SELECT count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(nc) AS BIGINT) AS total_chars,
        |  min(nt) AS min_tokens, max(nt) AS max_tokens
        |FROM d""".stripMargin,

    "q_pagerank_checks" ->
      """SELECT * FROM (VALUES ('all_ranks_above_floor', true),
        |  ('mass_sums_to_one', true), ('top_node_is_a_supplier', true))
        |AS t(check_name, ok) ORDER BY check_name""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
        |  p AS (SELECT a.vec_id AS id1, b.vec_id AS id2 FROM v a
        |    JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |    WHERE $cosSql >= 0.3),
        |  edges AS (SELECT id1 AS a, id2 AS b FROM p
        |            UNION SELECT id2, id1 FROM p),
        |  reach AS (SELECT vec_id AS id, vec_id AS lab FROM embeddings
        |            UNION SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b),
        |  comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT vec_id, label FROM embeddings JOIN comp ON id = vec_id
        |WHERE component = vec_id ORDER BY vec_id""".stripMargin,

    "q_containment" ->
      s"""WITH d AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
        |  tks AS (SELECT doc_id, lang,
        |    list_sort(list_distinct($toksSql)) AS tk FROM d)
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / len(a.tk)
        |    AS containment
        |FROM tks a JOIN tks b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        |WHERE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE) / len(a.tk) >= 0.95
        |ORDER BY id1, id2""".stripMargin,

    "q_attribution_outer" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    event_type FROM events),
        |  p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
        |  c AS (SELECT user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
        |  count(c.ts) AS n_prior_clicks,
        |  (max(ROW(c.ts, c.value)))[2] AS last_click_value
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 180 MINUTE
        |GROUP BY p.event_id, p.user_id, p.ts, p.value
        |ORDER BY p.event_id""".stripMargin,

    "q_planted_ivf" ->
      """SELECT query_id, neighbor_id FROM (
        |  SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id
        |  FROM embeddings WHERE vec_id % 4 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000, vec_id FROM embeddings WHERE vec_id % 4 = 0)
        |ORDER BY query_id""".stripMargin,

    "q_quality_classifier" ->
      """SELECT 'classifier_train_accuracy_eq_1' AS check_name, true AS ok""",

    // join-size sketch: same md5-seeded 4x256 matrices for both sides,
    // per-row counter inner products, min across rows — all integers
    "q_join_size_est" ->
      """WITH la AS (SELECT l_orderkey AS k FROM lineitem),
        |ob AS (SELECT o_orderkey AS k FROM orders),
        |ba AS (SELECT k, j,
        |    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |        CAST(k AS VARCHAR)), 1, 15)) AS UBIGINT) % 256 AS BIGINT) AS bucket
        |  FROM la CROSS JOIN range(4) AS r(j)),
        |bb AS (SELECT k, j,
        |    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |        CAST(k AS VARCHAR)), 1, 15)) AS UBIGINT) % 256 AS BIGINT) AS bucket
        |  FROM ob CROSS JOIN range(4) AS r(j)),
        |sa AS (SELECT j, bucket, count(*) AS ca FROM ba GROUP BY 1, 2),
        |sb AS (SELECT j, bucket, count(*) AS cb FROM bb GROUP BY 1, 2),
        |re AS (SELECT sa.j, CAST(sum(ca * cb) AS BIGINT) AS row_est
        |  FROM sa JOIN sb ON sa.j = sb.j AND sa.bucket = sb.bucket
        |  GROUP BY sa.j),
        |est AS (SELECT min(row_est) AS join_size_est FROM re),
        |tr AS (SELECT count(*) AS true_size FROM la JOIN ob USING (k))
        |SELECT join_size_est, true_size,
        |  join_size_est - true_size AS overestimate
        |FROM est CROSS JOIN tr""".stripMargin,

    // skew report: integer counts, correctly-rounded double division on
    // both engines -> identical share/ceil; (n desc, key) tie order
    "q_skew_report" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |s AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS nkeys FROM c)
        |SELECT user_id, n, round(CAST(n AS DOUBLE) / total, 6) AS share,
        |  CAST(least(ceil(n * nkeys / CAST(total AS DOUBLE)), 64) AS BIGINT)
        |    AS suggested_salt
        |FROM c CROSS JOIN s
        |ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

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

    // Naive-Bayes truth: full model replay (Laplace-smoothed 9dp log
    // likelihoods, 9dp log priors, exact decimal per-doc sums, argmax
    // ties to the lexicographically largest label)
    "q_naive_bayes" ->
      s"""WITH tr AS (SELECT lang AS label, text FROM documents
        |  WHERE doc_id % 2 = 0 AND lang IS NOT NULL AND text IS NOT NULL),
        |tok AS (SELECT label, unnest($toksSql) AS term FROM tr),
        |tc AS (SELECT label, term, count(*) AS c FROM tok GROUP BY 1, 2),
        |nl AS (SELECT label, CAST(sum(c) AS BIGINT) AS n FROM tc
        |  GROUP BY 1),
        |vc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tc),
        |pr AS (SELECT label, CAST(count(*) AS BIGINT) AS docs FROM tr
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(docs) AS BIGINT) AS tot FROM pr),
        |seen AS (SELECT label, term,
        |    round(ln((CAST(c AS DOUBLE) + CAST(1.0 AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |        * CAST(v AS DOUBLE))), 9) AS logp
        |  FROM tc JOIN nl USING (label), vc),
        |defs AS (SELECT label,
        |    round(ln(CAST(1.0 AS DOUBLE) /
        |      (CAST(n AS DOUBLE) + CAST(1.0 AS DOUBLE)
        |        * CAST(v AS DOUBLE))), 9) AS dflt,
        |    round(ln(CAST(docs AS DOUBLE) / CAST(tot AS DOUBLE)), 9)
        |      AS lp
        |  FROM nl JOIN pr USING (label), vc, tt),
        |te AS (SELECT doc_id, unnest($toksSql) AS term FROM documents
        |  WHERE doc_id % 2 = 1 AND text IS NOT NULL),
        |sc AS (SELECT te.doc_id, d.label,
        |    round(CAST(sum(CAST(coalesce(s.logp, d.dflt)
        |      AS DECIMAL(28,9))) AS DOUBLE) + d.lp, 6) AS score
        |  FROM te CROSS JOIN defs d
        |  LEFT JOIN seen s ON s.label = d.label AND s.term = te.term
        |  GROUP BY te.doc_id, d.label, d.lp),
        |r AS (SELECT doc_id, label, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, label DESC) AS rk
        |  FROM sc)
        |SELECT doc_id, label AS predicted, score FROM r WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,

    // Tukey fences via quantile_cont (pairs with Spark's exact
    // interpolated percentile); only the boolean flag leaves the query
    "q_iqr_outliers" ->
      """WITH th AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT event_type, event_id, value,
        |  value < q1 - (q3 - q1) * 1.5 OR value > q3 + (q3 - q1) * 1.5
        |    AS is_outlier
        |FROM events JOIN th USING (event_type)
        |WHERE value IS NOT NULL
        |ORDER BY event_type, event_id""".stripMargin,

    // class centroids: 0-based dim index via range(len), double cast
    // before the mean, 6-dp rounding for float-sum order
    "q_label_centroids" ->
      """WITH x AS (SELECT label,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)
        |SELECT label, i, round(avg(x), 6) AS centroid_val,
        |  count(*) AS n_vectors
        |FROM x GROUP BY label, i ORDER BY label, i""".stripMargin,

    // centroid drift: same planted axis-0 shift, same 6-dp fold policy
    "q_centroid_drift" ->
      """WITH ea AS (SELECT label, unnest(range(len(embedding))) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id % 3 <> 0),
        |eb0 AS (SELECT label, unnest(range(len(embedding))) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id % 3 <> 1),
        |eb AS (SELECT label, i,
        |    x + (CASE WHEN i = 0 THEN 0.5 ELSE 0.0 END) AS x FROM eb0),
        |a AS (SELECT label, i, avg(x) AS ca, count(*) AS na
        |  FROM ea GROUP BY 1, 2),
        |b AS (SELECT label, i, avg(x) AS cb, count(*) AS nb
        |  FROM eb GROUP BY 1, 2),
        |f AS (SELECT a.label, sum(ca * cb) AS dot, sum(ca * ca) AS aa,
        |    sum(cb * cb) AS bb, sum((ca - cb) * (ca - cb)) AS d2,
        |    min(na) AS n_a, min(nb) AS n_b
        |  FROM a JOIN b USING (label, i) GROUP BY 1)
        |SELECT label, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS centroid_cosine,
        |  round(sqrt(d2), 6) AS centroid_shift, n_a, n_b
        |FROM f ORDER BY label""".stripMargin,

    // token-budget truth: one global window cumsum over (score desc, id)
    // — fine in DuckDB at oracle scale; the engine's distributed
    // prefix-sum replays the identical integer totals
    "q_token_budget" ->
      """WITH r AS (SELECT doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id ASC
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |SELECT doc_id, n_chars, cum_tokens FROM r WHERE cum_tokens <= 100000
        |ORDER BY cum_tokens, doc_id""".stripMargin,

    // window-packing truth: exclusive cumsum over doc_id order, integer
    // div/mod placements — the engine's distributed prefix sum replays
    // the identical integer totals
    "q_pack_windows" ->
      s"""WITH d AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS nt
        |  FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, nt,
        |    CAST(coalesce(sum(nt) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cb
        |  FROM d WHERE nt > 0)
        |SELECT doc_id, nt AS n_tokens,
        |  CAST(cb // 256 AS BIGINT) AS bin,
        |  CAST(cb % 256 AS BIGINT) AS offset,
        |  CAST((cb + nt - 1) // 256 AS BIGINT) AS bin_last,
        |  (cb // 256) <> ((cb + nt - 1) // 256) AS crosses_boundary
        |FROM p ORDER BY doc_id""".stripMargin,

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

    // the chosen centroid cancels the planted one-hot exactly as doubles
    // ((10 + 0.01x) - 10 on the hot coordinate, 0.01x elsewhere), and the
    // oracle folds the 8 squared diffs in the kernel's exact left order
    "q_pq_recon_drift" -> {
      def errExpr(j: Int): String = {
        val terms = (0 until 8).map { p =>
          val d = s"((CASE WHEN $p = g$j THEN 10.0 ELSE 0.0 END) + " +
            s"0.01 * CAST(embedding[${j * 8 + p + 1}] AS DOUBLE) - " +
            s"(CASE WHEN $p = g$j THEN 10.0 ELSE 0.0 END))"
          s"($d * $d)"
        }
        terms.reduce((a, b) => s"($a + $b)")
      }
      val gCols = (0 until 4).map(j =>
        s"CAST((vec_id >> ${2 * j}) & 3 AS INT) AS g$j").mkString(",\n    ")
      val eCols = (0 until 4).map(j =>
        s"CAST(round(${errExpr(j)}, 9) AS DECIMAL(28,9)) AS e$j")
        .mkString(",\n    ")
      val sCols = (0 until 4).map(j => s"sum(e$j) AS s$j").mkString(", ")
      val caseS = (0 until 4).map(j => s"WHEN $j THEN s$j").mkString(" ")
      s"""WITH g AS (SELECT vec_id, embedding,
        |    $gCols
        |  FROM embeddings),
        |e AS (SELECT
        |    $eCols
        |  FROM g),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n, $sCols FROM e)
        |SELECT CAST(j AS BIGINT) AS subspace, n,
        |  round(CAST((CASE j $caseS END) AS DOUBLE) / CAST(n AS DOUBLE), 9)
        |    AS mse
        |FROM s, (SELECT unnest(range(4)) AS j) sub
        |ORDER BY subspace""".stripMargin
    },

    "q_ivf_recall" ->
      """SELECT * FROM (VALUES ('ivf_recall_at_5_ge_half', true))
        |AS t(check_name, ok)""".stripMargin,

    "q_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |      AS bucket
        |  FROM documents)
        |SELECT doc_id, lang FROM b
        |WHERE bucket < (CASE WHEN lang = 'en' THEN 50
        |                     WHEN lang = 'de' THEN 20 ELSE 10 END)
        |ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        |  tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
        |  dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |  sc AS (SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score
        |    FROM tf JOIN dfq USING (term)),
        |  r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS "rank" FROM sc)
        |SELECT doc_id, "rank", term, tf, df, score FROM r WHERE "rank" <= 3
        |ORDER BY doc_id, "rank"""".stripMargin,

    // Gopher rules: identical ASCII tokenization, exact int/int IEEE
    // ratios, same null-text semantics (rules null, keep false)
    "q_gopher_rules" -> {
      val stopHits = TextAnalysis.gopherStopwords.map(s =>
        s"CASE WHEN list_contains(list_transform(words, x -> lower(x)), '$s') " +
          "THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH w AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '[ \\t\\r\\n]+'), x -> x <> '') AS words,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    len(words) AS n_words,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE) / len(words)
        |    END AS mean_word_len,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(regexp_extract_all(text, '#')) AS DOUBLE) / len(words)
        |    END AS hash_ratio,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(regexp_extract_all(text, '(\\.\\.\\.|\\x{2026})')) AS DOUBLE)
        |        / len(words)
        |    END AS ellipsis_ratio,
        |    CAST(len(list_filter(lines,
        |        l -> regexp_matches(trim(l), '^[-*\\x{2022}]'))) AS DOUBLE)
        |      / len(lines) AS bullet_line_frac,
        |    CAST(len(list_filter(lines,
        |        l -> regexp_matches(trim(l), '(\\.\\.\\.|\\x{2026})${"$"}'))) AS DOUBLE)
        |      / len(lines) AS ellipsis_line_frac,
        |    CASE WHEN len(words) > 0 THEN
        |      CAST(len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
        |        / len(words)
        |    END AS alpha_word_frac,
        |    $stopHits AS stop_hits
        |  FROM w),
        |r AS (SELECT *,
        |    n_words >= 50 AND n_words <= 100000 AS r_word_count,
        |    mean_word_len >= 3 AND mean_word_len <= 10 AS r_mean_len,
        |    hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1 AS r_symbol,
        |    bullet_line_frac <= 0.9 AS r_bullet,
        |    ellipsis_line_frac <= 0.3 AS r_ellipsis,
        |    alpha_word_frac >= 0.8 AS r_alpha,
        |    stop_hits >= 2 AS r_stopwords
        |  FROM f)
        |SELECT *, COALESCE(r_word_count AND r_mean_len AND r_symbol AND r_bullet
        |    AND r_ellipsis AND r_alpha AND r_stopwords, FALSE) AS keep
        |FROM r ORDER BY doc_id""".stripMargin
    },

    // PMI collocations: identical bigram/unigram counts, identical
    // association order ((cxy·nu)·nu)/((cx·cy)·nb), ln rounded at 6 dp
    "q_collocations" ->
      s"""WITH tks AS (SELECT $toksSql AS tk FROM documents),
        |bg AS (SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS gram FROM tks),
        |u AS (SELECT unnest(tk) AS term FROM tks),
        |uc AS (SELECT term, count(*) AS c1 FROM u GROUP BY term),
        |p AS (SELECT gram, count(*) AS cxy FROM bg GROUP BY gram
        |  HAVING count(*) >= 5),
        |nu AS (SELECT CAST(sum(c1) AS DOUBLE) AS nu FROM uc),
        |nb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM bg),
        |sp AS (SELECT string_split(gram, ' ')[1] AS w1,
        |    string_split(gram, ' ')[2] AS w2, cxy FROM p)
        |SELECT w1, w2, cxy,
        |  round(ln((CAST(cxy AS DOUBLE) * nu * nu)
        |           / (CAST(u1.c1 AS DOUBLE) * u2.c1 * nb)), 6) AS pmi
        |FROM sp JOIN uc u1 ON u1.term = w1 JOIN uc u2 ON u2.term = w2, nu, nb
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,

    // equi-width histogram: same (min,max) bounds, same double bucket
    // arithmetic ((v−mn)·20/(mx−mn), floor, clamp), same edge formulas
    "q_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |d AS (SELECT CASE WHEN mx = mn THEN 0
        |    ELSE least(CAST(floor((l_extendedprice - mn) * 20 / (mx - mn)) AS BIGINT),
        |               19) END AS bucket, mn, mx
        |  FROM lineitem, b WHERE l_extendedprice IS NOT NULL)
        |SELECT bucket, mn + bucket * (mx - mn) / 20 AS lo,
        |  mn + (bucket + 1) * (mx - mn) / 20 AS hi, count(*) AS n
        |FROM d GROUP BY bucket, mn, mx ORDER BY bucket""".stripMargin,

    "q_approx_bounds" ->
      """SELECT * FROM (VALUES ('approx_p50_within_1unit', true),
        |  ('hll_ndv_within_5pct', true)) AS t(check_name, ok)
        |ORDER BY check_name""".stripMargin,

    "q_text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same RE2 pattern, same original-index-preserving empty filter
    // (index attaches via the two-arg list_transform lambda — DuckDB's
    // generate_series cannot lateral-reference a column)
    "q_split_sentences" ->
      """WITH s AS (SELECT doc_id,
        |    unnest(list_transform(
        |      regexp_extract_all(text || '. Tail one! Really?! The end',
        |        '[^.!?]+[.!?]*'),
        |      (x, i) -> struct_pack(i := i - 1, s := x))) AS e
        |  FROM documents)
        |SELECT doc_id, CAST(e.i AS BIGINT) AS sent_idx,
        |  trim(e.s) AS sentence
        |FROM s WHERE trim(e.s) <> ''
        |ORDER BY doc_id, sent_idx""".stripMargin,

    // closed-form truth: host/domain/canonical url derived directly from
    // doc_id arithmetic — lowercased host, :80 stripped, fragment gone,
    // path case preserved
    "q_url_parse" ->
      """SELECT doc_id,
        |  'www.example' || (doc_id % 50) || '.com' AS host,
        |  'example' || (doc_id % 50) || '.com' AS domain,
        |  'http://www.example' || (doc_id % 50) || '.com/Path/' || doc_id ||
        |    CASE WHEN doc_id % 4 = 0 THEN '?id=' || doc_id ELSE '' END
        |    AS norm_url
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same planted wrapper, same RE2 patterns, same entity decode order
    // (&amp; last) — the chain replays byte-identically
    "q_html_extract" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id || '</title>' ||
        |  CASE WHEN doc_id % 6 = 0
        |    THEN '<meta name="ROBOTS" content="NOINDEX, nofollow">'
        |    ELSE '' END ||
        |  '<script type="text/javascript">var x = 1 < 2 && doc;</script>' ||
        |  '<style>p { color: red; }</style></head><body><h1>Doc ' ||
        |  doc_id || '</h1>' ||
        |  CASE WHEN doc_id % 3 = 0
        |    THEN '<a href="/a">a &amp; b</a> <a' || chr(10) || 'href="/b">c</a>'
        |    ELSE '' END ||
        |  '<p>' || text || '</p><!-- hidden --></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_extract(html,
        |    '(?is)<title[^>]*>(.*?)</title>', 1), '[ \t\r\n]+', ' ', 'g'))
        |    AS title,
        |  CAST(length(regexp_extract_all(html, '(?i)<a[ \t\r\n][^>]*>'))
        |    AS BIGINT) AS n_links,
        |  (doc_id % 6 = 0) AS noindex,
        |  trim(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |        '<[^>]+>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |    '[ \t\r\n]+', ' ', 'g')) AS extracted
        |FROM h ORDER BY doc_id""".stripMargin,

    "q_pii_redact" -> {
      val em = TextAnalysis.piiEmailPattern
      val ip = TextAnalysis.piiIpv4Pattern
      val ssn = TextAnalysis.piiSsnPattern
      s"""WITH p AS (SELECT doc_id, text ||
        |    (CASE WHEN doc_id % 7 = 0
        |      THEN ' contact alice.smith@example.org or 203.0.113.7 ssn 123-45-6789'
        |      ELSE '' END) AS text2 FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text2, '$em')) AS n_emails,
        |  len(regexp_extract_all(text2, '$ip')) AS n_ipv4,
        |  len(regexp_extract_all(text2, '$ssn')) AS n_ssn,
        |  regexp_replace(regexp_replace(regexp_replace(text2,
        |    '$em', '[EMAIL]', 'g'), '$ip', '[IP]', 'g'), '$ssn', '[SSN]', 'g')
        |    AS redacted
        |FROM p ORDER BY doc_id""".stripMargin
    },

    "q_decontaminate" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |  sh AS (SELECT doc_id, $shinglesSql AS s FROM tks),
        |  bench AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
        |  train AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
        |SELECT doc_id, count(*) AS n_shared
        |FROM train JOIN bench USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_unigram_lm" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS toks FROM documents),
        |  tfc AS (SELECT doc_id, term, count(*) AS tf
        |    FROM (SELECT doc_id, unnest(toks) AS term FROM tks) GROUP BY 1, 2),
        |  model AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ctf FROM tfc GROUP BY 1),
        |  tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS n_total,
        |    count(*) AS v_size FROM model)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round(-sum(tf * ln(CAST(ctf + 1 AS DOUBLE) / (n_total + v_size)))
        |    / sum(tf), 6) AS surprisal
        |FROM tfc JOIN model USING (term) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // interpolated bigram surprisal: same token split, bigrams from the
    // 1-based position range, p = 0.75*ML + 0.25*add-one-unigram floor —
    // every division is exact IEEE from integer counts; ln/sum-order
    // rounded to 6 dp on both engines
    "q_bigram_lm" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |  bg AS (SELECT doc_id, unnest(tk[:-2]) AS w1, unnest(tk[2:]) AS w2
        |    FROM tks WHERE len(tk) >= 2),
        |  tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
        |  bgm AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cbg
        |    FROM tf GROUP BY 1, 2),
        |  uni AS (SELECT term, count(*) AS ctf
        |    FROM (SELECT unnest(tk) AS term FROM tks) GROUP BY 1),
        |  tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS n_total,
        |    count(*) AS v_size FROM uni)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  round(-sum(tf * ln(
        |      0.75 * (CAST(cbg AS DOUBLE) / u1.ctf) +
        |      0.25 * (CAST(u2.ctf + 1 AS DOUBLE) / (n_total + v_size))))
        |    / sum(tf), 6) AS bigram_surprisal
        |FROM tf JOIN bgm USING (w1, w2)
        |  JOIN uni u1 ON u1.term = w1 JOIN uni u2 ON u2.term = w2
        |  CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the q_bigram_lm surprisal CTE feeding the q_quantile_bins decile
    // construction on exact micro-units — same rounding, same edges
    "q_perplexity_buckets" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |  bg AS (SELECT doc_id, unnest(tk[:-2]) AS w1, unnest(tk[2:]) AS w2
        |    FROM tks WHERE len(tk) >= 2),
        |  tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
        |  bgm AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cbg
        |    FROM tf GROUP BY 1, 2),
        |  uni AS (SELECT term, count(*) AS ctf
        |    FROM (SELECT unnest(tk) AS term FROM tks) GROUP BY 1),
        |  tot AS (SELECT CAST(sum(ctf) AS BIGINT) AS n_total,
        |    count(*) AS v_size FROM uni),
        |  sup AS (SELECT doc_id,
        |    round(-sum(tf * ln(
        |        0.75 * (CAST(cbg AS DOUBLE) / u1.ctf) +
        |        0.25 * (CAST(u2.ctf + 1 AS DOUBLE) / (n_total + v_size))))
        |      / sum(tf), 6) AS s
        |    FROM tf JOIN bgm USING (w1, w2)
        |      JOIN uni u1 ON u1.term = w1 JOIN uni u2 ON u2.term = w2
        |      CROSS JOIN tot
        |    GROUP BY doc_id),
        |  m AS (SELECT CAST(round(s * 1000000) AS BIGINT) AS v FROM sup),
        |  c AS (SELECT v, count(*) AS n FROM m GROUP BY 1),
        |  cc AS (SELECT v,
        |      SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |      SUM(n) OVER () AS tot FROM c),
        |  e AS (SELECT i, min(v) AS edge FROM cc
        |    JOIN (SELECT unnest(range(1, 10)) AS i) ii ON cum * 10 >= i * tot
        |    GROUP BY i),
        |  b AS (SELECT m.v,
        |      CAST((SELECT count(*) FROM e WHERE m.v > e.edge) AS INT) AS bin
        |    FROM m)
        |SELECT bin, count(*) AS n_rows, min(v) AS min_v, max(v) AS max_v,
        |  round(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
        |    AS avg_v
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_vec_l2norm" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |  n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |  x AS (SELECT vec_id, nrm, CAST(unnest(range(len(v))) AS INT) AS i,
        |    unnest(v) AS xv FROM n)
        |SELECT vec_id, i, CASE WHEN nrm = 0 THEN xv ELSE xv / nrm END AS val
        |FROM x ORDER BY vec_id, i""".stripMargin,

    "q_profile" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          |  count(*) - count($c) AS n_nulls,
          |  count(DISTINCT $c) AS ndv,
          |  CAST(min($c) AS VARCHAR) AS min_str,
          |  CAST(max($c) AS VARCHAR) AS max_str FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },

    "q_window_analytics" ->
      """WITH f AS (SELECT * FROM orders WHERE o_custkey % 100 = 0)
        |SELECT o_orderpriority, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 2) OVER w AS next2_key,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM f
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))
        |ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority""".stripMargin,

    "q_chunk_docs" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents),
        |  nn AS (SELECT doc_id, tk, len(tk) AS n FROM tks WHERE len(tk) > 0),
        |  c AS (SELECT doc_id, tk,
        |    CAST(unnest(range(CAST(floor((n - 1) / 8.0) AS BIGINT) + 1)) AS INT)
        |      AS chunk_id FROM nn)
        |SELECT doc_id, chunk_id,
        |  array_to_string(list_slice(tk, chunk_id * 8 + 1, chunk_id * 8 + 10), ' ')
        |    AS chunk_text,
        |  len(list_slice(tk, chunk_id * 8 + 1, chunk_id * 8 + 10))
        |    AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH RECURSIVE d AS (SELECT lang, doc_id,
        |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |  p AS (
        |    SELECT lang, doc_id, n_tokens, rn,
        |      CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS "offset",
        |      n_tokens AS fill
        |    FROM d WHERE rn = 1
        |    UNION ALL
        |    SELECT d.lang, d.doc_id, d.n_tokens, d.rn,
        |      CASE WHEN p.fill + d.n_tokens > 64
        |        THEN p.seq_id + 1 ELSE p.seq_id END,
        |      CASE WHEN p.fill + d.n_tokens > 64
        |        THEN CAST(0 AS BIGINT) ELSE p.fill END,
        |      CASE WHEN p.fill + d.n_tokens > 64
        |        THEN d.n_tokens ELSE p.fill + d.n_tokens END
        |    FROM d JOIN p ON d.lang = p.lang AND d.rn = p.rn + 1)
        |SELECT lang, doc_id, n_tokens, seq_id, "offset"
        |FROM p ORDER BY lang, doc_id""".stripMargin,

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

    "q_gap_fill" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |  daily AS (SELECT user_id, day, count(*) AS n_events
        |    FROM ev GROUP BY 1, 2),
        |  span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |    FROM daily GROUP BY 1),
        |  cal AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |    FROM span)
        |SELECT user_id, day, coalesce(n_events, 0) AS n_events
        |FROM cal LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,

    // linear interpolation: same frame expressions as the Spark Window
    // (forward last-ignore-nulls / backward first-ignore-nulls), same
    // float op order prev + (next-prev) * (offset/gap), both rounded 6dp
    "q_interpolate_daily" ->
      """WITH ev AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value FROM events),
        |  daily AS (SELECT user_id, day,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS obs
        |    FROM ev GROUP BY 1, 2),
        |  span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |    FROM daily GROUP BY 1),
        |  cal AS (SELECT user_id,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |    FROM span),
        |  g AS (SELECT user_id, day, obs,
        |    last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        |    first_value(obs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN obs IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        |  FROM cal LEFT JOIN daily USING (user_id, day))
        |SELECT user_id, day,
        |  CASE WHEN obs IS NOT NULL THEN round(obs, 6)
        |    ELSE round(prev_v + (next_v - prev_v) *
        |      (CAST(date_diff('day', prev_d, day) AS DOUBLE) /
        |       CAST(date_diff('day', prev_d, next_d) AS DOUBLE)), 6) END AS value,
        |  obs IS NULL AS interpolated
        |FROM g ORDER BY user_id, day""".stripMargin,

    "q_exact_n_sample" ->
      """WITH r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rk <= 7
        |ORDER BY lang, doc_id""".stripMargin,

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

    "q_curation_pipeline" -> {
      val langs = TextAnalysis.langMarkers.map(_._1)
      val counts = TextAnalysis.langMarkers.map { case (l, re) =>
        s"len(regexp_extract_all(lower(text), '$re')) AS c_$l"
      }.mkString(",\n|      ")
      val cases = langs.map { l =>
        val ge = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
        s"WHEN c_$l > 0 AND $ge THEN '$l'"
      }.mkString("\n|      ")
      s"""WITH f AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
        |  m AS (SELECT doc_id, text,
        |    len(toks) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
        |      / greatest(length(text), 1) AS punct_ratio,
        |    CAST(len(list_filter(toks, x -> list_contains($stopSql, x))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS stop_ratio,
        |    CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mean_token_len,
        |      $counts
        |  FROM f),
        |  q AS (SELECT doc_id, text,
        |    CAST((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 4 ELSE 0 END +
        |          CASE WHEN punct_ratio <= 0.2 THEN 2 ELSE 0 END +
        |          CASE WHEN stop_ratio >= 0.05 THEN 2 ELSE 0 END +
        |          CASE WHEN mean_token_len BETWEEN 3 AND 12 THEN 2 ELSE 0 END)
        |      AS DOUBLE) / CAST(10 AS DOUBLE) AS quality_score,
        |    CASE $cases
        |      ELSE 'und' END AS pred_lang
        |  FROM m),
        |  kept AS (SELECT doc_id, text FROM q
        |    WHERE quality_score >= 0.8 AND pred_lang = 'en'),
        |  keepers AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        |  s AS (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |    FROM (SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 100 AS b FROM keepers))
        |SELECT split, count(*) AS n_docs FROM s GROUP BY split ORDER BY split""".stripMargin
    },

    "q_events_sessions" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |  l AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev),
        |  f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |         ELSE 0 END AS ns FROM l),
        |  s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_rolling_median" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
        |FROM events ORDER BY event_id""".stripMargin,

    "q_hopping_counts" ->
      """WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |  h AS (SELECT ts, event_type, unnest(range(4)) AS k FROM ev),
        |  w AS (SELECT ts, event_type,
        |      date_trunc('minute', ts)
        |        - INTERVAL (EXTRACT(minute FROM ts)::INT % 15) MINUTE
        |        - INTERVAL (k * 15) MINUTE AS win_start
        |    FROM h),
        |  f AS (SELECT * FROM w
        |    WHERE ts >= win_start AND ts < win_start + INTERVAL 60 MINUTE)
        |SELECT win_start, win_start + INTERVAL 60 MINUTE AS win_end,
        |  event_type, count(*) AS n_events
        |FROM f GROUP BY 1, 2, 3
        |ORDER BY win_start, event_type""".stripMargin,

    // session_window's OWN half-open truth: splits at gap >= 30 min
    // (epoch_us gap >= 1800000000), unlike q_events_sessions' strict >
    "q_session_window_builtin" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |  l AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts FROM ev),
        |  f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
        |         ELSE 0 END AS ns FROM l),
        |  s AS (SELECT user_id, ts, sum(ns) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_merge_upsert" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    o_orderdate, '9-MERGED' AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 10 = 4),
        |keep AS (SELECT t.* FROM orders t
        |  WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.o_orderkey = t.o_orderkey)),
        |upd AS (SELECT s.* FROM src s
        |  WHERE EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey)
        |    AND NOT (s.o_orderstatus = 'F')),
        |ins AS (SELECT s.* FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey))
        |SELECT * FROM keep UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
        |ORDER BY o_orderkey""".stripMargin,

    "q_row_changes" ->
      """WITH old_s AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 3),
        |  new_s AS (SELECT o_orderkey, o_custkey,
        |      CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |      CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
        |      o_orderdate, o_orderpriority
        |    FROM orders WHERE o_orderkey % 10 <> 7),
        |  j AS (SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        |      (o.o_orderkey IS NULL) AS added, (n.o_orderkey IS NULL) AS removed,
        |      list_sort(list_filter([
        |        CASE WHEN o.o_custkey       IS DISTINCT FROM n.o_custkey       THEN 'o_custkey' END,
        |        CASE WHEN o.o_orderstatus   IS DISTINCT FROM n.o_orderstatus   THEN 'o_orderstatus' END,
        |        CASE WHEN o.o_totalprice    IS DISTINCT FROM n.o_totalprice    THEN 'o_totalprice' END,
        |        CASE WHEN o.o_orderdate     IS DISTINCT FROM n.o_orderdate     THEN 'o_orderdate' END,
        |        CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END
        |      ], x -> x IS NOT NULL)) AS diffs
        |    FROM old_s o FULL JOIN new_s n ON o.o_orderkey = n.o_orderkey),
        |  c AS (SELECT o_orderkey,
        |      CASE WHEN added THEN 'added' WHEN removed THEN 'removed'
        |           WHEN len(diffs) > 0 THEN 'changed' ELSE 'unchanged' END AS change_type,
        |      CASE WHEN NOT added AND NOT removed AND len(diffs) > 0
        |           THEN array_to_string(diffs, ',') ELSE '' END AS changed_cols,
        |      CASE WHEN NOT added AND NOT removed THEN CAST(len(diffs) AS BIGINT)
        |           ELSE 0 END AS n_changed
        |    FROM j)
        |SELECT * FROM c WHERE change_type <> 'unchanged' ORDER BY o_orderkey""".stripMargin,

    "q_funnel" ->
      """WITH s0 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
        |    WHERE event_type = 'view' GROUP BY 1),
        |  s1 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
        |    JOIN s0 ON e.user_id = s0.user_id AND CAST(e.ts AS TIMESTAMP) >= s0.t
        |    WHERE e.event_type = 'click' GROUP BY 1),
        |  s2 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
        |    JOIN s1 ON e.user_id = s1.user_id AND CAST(e.ts AS TIMESTAMP) >= s1.t
        |    WHERE e.event_type = 'purchase' GROUP BY 1),
        |  c AS (SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step, count(*) AS users FROM s0
        |    UNION ALL SELECT 1, 'click', count(*) FROM s1
        |    UNION ALL SELECT 2, 'purchase', count(*) FROM s2)
        |SELECT step_idx, step, users,
        |  CAST(users AS DOUBLE) / (SELECT users FROM c WHERE step_idx = 0) AS pct_of_first
        |FROM c ORDER BY step_idx""".stripMargin,

    "q_retention" ->
      """WITH d AS (SELECT DISTINCT user_id AS u,
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |  f AS (SELECT u, min(day) AS cohort_day FROM d GROUP BY 1),
        |  a AS (SELECT DISTINCT d.u, f.cohort_day,
        |      date_diff('day', f.cohort_day, d.day) // 7 AS week_offset
        |    FROM d JOIN f ON d.u = f.u)
        |SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_heavy_hitters" ->
      """WITH tot AS (SELECT count(*) AS n FROM events)
        |SELECT user_id, count(*) AS n,
        |  CAST(count(*) AS DOUBLE) / (SELECT CAST(n AS DOUBLE) FROM tot) AS share
        |FROM events GROUP BY user_id
        |HAVING count(*) > 0.008 * (SELECT CAST(n AS DOUBLE) FROM tot)
        |ORDER BY user_id""".stripMargin,

    // no evictions by construction (keys < counter capacity), so the
    // space-saving merge view equals the exact top-k with zero error
    "q_hh_global_topk" ->
      """SELECT user_id AS key, count(*) AS count, CAST(0 AS BIGINT) AS err
        |FROM events WHERE user_id % 3 = 0
        |GROUP BY 1 ORDER BY count DESC, key ASC LIMIT 15""".stripMargin,

    // count-min replay: same md5-60-bit seeded buckets (row index
    // prefixed), same 4x256 matrix, min-over-rows estimate — integers
    // end to end
    "q_count_min" ->
      """WITH b AS (SELECT user_id, j,
        |    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |        CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 256
        |      AS BIGINT) AS bucket
        |  FROM events CROSS JOIN range(4) AS r(j)),
        |sk AS (SELECT j, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |keys AS (SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0),
        |kb AS (SELECT user_id, j,
        |    CAST(CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |        CAST(user_id AS VARCHAR)), 1, 15)) AS UBIGINT) % 256
        |      AS BIGINT) AS bucket
        |  FROM keys CROSS JOIN range(4) AS r(j)),
        |est AS (SELECT kb.user_id, min(cnt) AS est
        |  FROM kb JOIN sk ON sk.j = kb.j AND sk.bucket = kb.bucket
        |  GROUP BY 1),
        |exact AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1)
        |SELECT user_id, est, exact, est - exact AS overcount
        |FROM est JOIN exact USING (user_id) ORDER BY user_id""".stripMargin,

    // HLL overlap: rebuild the 64-register sketches from the same
    // md5-first-60-bit hash, identical estimator arithmetic (integer
    // harmonic denominator, 6-dp rounds on the float outputs)
    "q_hll_overlap" ->
      """WITH au AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 <> 0),
        |bu AS (SELECT DISTINCT user_id FROM events WHERE user_id % 2 <> 0),
        |ha AS (SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15)) AS UBIGINT) AS BIGINT) AS h FROM au),
        |hb AS (SELECT CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15)) AS UBIGINT) AS BIGINT) AS h FROM bu),
        |ra1 AS (SELECT h % 64 AS bucket, max(CASE WHEN (h >> 6) = 0 THEN 55
        |    ELSE 55 - length(bin(h >> 6)) END) AS register FROM ha GROUP BY 1),
        |rb1 AS (SELECT h % 64 AS bucket, max(CASE WHEN (h >> 6) = 0 THEN 55
        |    ELSE 55 - length(bin(h >> 6)) END) AS register FROM hb GROUP BY 1),
        |ra AS (SELECT r.bucket, coalesce(register, 0) AS register
        |  FROM range(64) AS r(bucket) LEFT JOIN ra1 ON ra1.bucket = r.bucket),
        |rb AS (SELECT r.bucket, coalesce(register, 0) AS register
        |  FROM range(64) AS r(bucket) LEFT JOIN rb1 ON rb1.bucket = r.bucket),
        |ru AS (SELECT bucket, max(register) AS register
        |  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
        |ea AS (SELECT sum(CAST(1 AS BIGINT) << (55 - register)) AS zi,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v FROM ra),
        |eb AS (SELECT sum(CAST(1 AS BIGINT) << (55 - register)) AS zi,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v FROM rb),
        |eu AS (SELECT sum(CAST(1 AS BIGINT) << (55 - register)) AS zi,
        |    sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS v FROM ru),
        |fa AS (SELECT CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE)
        |      * CAST(64 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
        |      / CAST(zi AS DOUBLE) AS raw, v FROM ea),
        |fb AS (SELECT CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE)
        |      * CAST(64 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
        |      / CAST(zi AS DOUBLE) AS raw, v FROM eb),
        |fu AS (SELECT CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE)
        |      * CAST(64 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
        |      / CAST(zi AS DOUBLE) AS raw, v FROM eu),
        |ga AS (SELECT CASE WHEN raw <= 160.0 AND v > 0
        |    THEN round(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE)
        |      / CAST(v AS DOUBLE)), 6) ELSE round(raw, 6) END AS est_a FROM fa),
        |gb AS (SELECT CASE WHEN raw <= 160.0 AND v > 0
        |    THEN round(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE)
        |      / CAST(v AS DOUBLE)), 6) ELSE round(raw, 6) END AS est_b FROM fb),
        |gu AS (SELECT CASE WHEN raw <= 160.0 AND v > 0
        |    THEN round(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE)
        |      / CAST(v AS DOUBLE)), 6) ELSE round(raw, 6) END AS est_union FROM fu),
        |x AS (SELECT user_id FROM au INTERSECT SELECT user_id FROM bu),
        |xc AS (SELECT count(*) AS exact_intersect FROM x)
        |SELECT est_a, est_b, est_union,
        |  round(est_a + est_b - est_union, 6) AS est_intersect,
        |  round((est_a + est_b - est_union) / est_union, 6) AS jaccard_est,
        |  exact_intersect
        |FROM ga, gb, gu, xc""".stripMargin,

    // grouped HLL: same register construction keyed by event_type; the
    // never-hit buckets fold in as (64 - nhit) * 2^55
    "q_hll_grouped" ->
      """WITH ev AS (SELECT event_type, CAST(user_id AS VARCHAR) || ':' ||
        |    CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS uk
        |  FROM events),
        |h AS (SELECT event_type, CAST(CAST(('0x' || substr(md5(uk), 1, 15))
        |    AS UBIGINT) AS BIGINT) AS h FROM ev),
        |r AS (SELECT event_type, h % 64 AS bucket,
        |    max(CASE WHEN (h >> 6) = 0 THEN 55
        |      ELSE 55 - length(bin(h >> 6)) END) AS register
        |  FROM h GROUP BY 1, 2),
        |z AS (SELECT event_type, sum(CAST(1 AS BIGINT) << (55 - register)) AS zhit,
        |    count(*) AS nhit FROM r GROUP BY 1),
        |f AS (SELECT event_type,
        |    zhit + (64 - nhit) * (CAST(1 AS BIGINT) << 55) AS zi,
        |    64 - nhit AS v FROM z),
        |g AS (SELECT event_type, CAST(0.709 AS DOUBLE) * CAST(64 AS DOUBLE)
        |      * CAST(64 AS DOUBLE) * CAST(36028797018963968 AS DOUBLE)
        |      / CAST(zi AS DOUBLE) AS raw, v FROM f),
        |e AS (SELECT event_type, CASE WHEN raw <= 160.0 AND v > 0
        |    THEN round(CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE)
        |      / CAST(v AS DOUBLE)), 6) ELSE round(raw, 6) END AS est FROM g),
        |x AS (SELECT event_type, count(DISTINCT uk) AS exact_distinct
        |  FROM ev GROUP BY 1)
        |SELECT e.event_type AS event_type, est, exact_distinct
        |FROM e JOIN x ON e.event_type = x.event_type
        |ORDER BY e.event_type""".stripMargin,

    // KMV: rebuild the k-minima from the same md5 hash; θ estimate with
    // exact-integer inputs; union minima membership via IN on the k-row
    // sketches (exact by the θ_U <= min(θ_A, θ_B) argument)
    "q_kmv_overlap" ->
      """WITH au AS (SELECT DISTINCT user_id FROM events WHERE user_id % 3 <> 0),
        |bu AS (SELECT DISTINCT user_id FROM events WHERE user_id % 2 <> 0),
        |ha AS (SELECT DISTINCT CAST(CAST(('0x' || substr(md5(CAST(user_id
        |    AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM au),
        |hb AS (SELECT DISTINCT CAST(CAST(('0x' || substr(md5(CAST(user_id
        |    AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h FROM bu),
        |sa AS (SELECT h FROM ha ORDER BY h LIMIT 128),
        |sb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
        |su AS (SELECT DISTINCT h FROM
        |  (SELECT h FROM sa UNION ALL SELECT h FROM sb) ORDER BY h LIMIT 128),
        |nb AS (SELECT count(*) AS n_both FROM su
        |  WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
        |ku AS (SELECT count(*) AS k_used, max(h) AS hk FROM su),
        |ue AS (SELECT CASE WHEN k_used < 128 THEN CAST(k_used AS DOUBLE)
        |    ELSE round(CAST(127 AS DOUBLE) / ((CAST(hk AS DOUBLE) + 1.0)
        |      / CAST(1152921504606846976 AS DOUBLE)), 6) END AS est_union,
        |    k_used FROM ku),
        |x AS (SELECT count(*) AS exact_intersect FROM
        |  (SELECT user_id FROM au INTERSECT SELECT user_id FROM bu))
        |SELECT round(CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE), 6)
        |    AS jaccard_est,
        |  est_union,
        |  round(CAST(n_both AS DOUBLE) / CAST(k_used AS DOUBLE) * est_union, 6)
        |    AS est_intersect,
        |  k_used, exact_intersect
        |FROM nb, ue, x""".stripMargin,

    // TPC-H Q6: same decimal-exact arithmetic as q1/q3
    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    // ORC federation: the engine aggregated the ORC copy; the oracle
    // replays over the parquet original (same rows by construction)
    "q_orc_federation" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_quantity < 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // TPC-H Q3: same decimal-exact revenue; top-10 by (revenue desc, orderkey)
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |    AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    // TPC-H Q5: local-supplier revenue per nation, decimal-exact
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    // TPC-H Q4: EXISTS == semi-join; counts per priority
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // TPC-H Q7: disjunctive nation pair, per-year decimal-exact volume
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |    AS DOUBLE) AS revenue
        |FROM supplier, lineitem, orders, customer,
        |  nation AS n1, nation AS n2
        |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |  AND c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |  AND l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // PSI: same equal-width bins (floor on identical IEEE doubles),
    // integer counts, Laplace-smoothed terms, 6-dp round on the ln sum
    "q_psi_drift" ->
      """WITH a_rows AS (SELECT * FROM lineitem WHERE l_orderkey % 97 <> 0),
        |b_rows AS (SELECT l_quantity, l_extendedprice
        |    * CASE WHEN l_orderkey % 3 = 0 THEN 2.0 ELSE 1.0 END
        |    AS l_extendedprice
        |  FROM lineitem WHERE l_orderkey % 89 <> 0),
        |pe_a AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM a_rows
        |  WHERE l_extendedprice IS NOT NULL),
        |pe_b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM b_rows
        |  WHERE l_extendedprice IS NOT NULL),
        |pe_bd AS (SELECT min(x) AS lo, max(x) AS hi
        |  FROM (SELECT x FROM pe_a UNION ALL SELECT x FROM pe_b)),
        |pe_na AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS na FROM pe_a, pe_bd GROUP BY 1),
        |pe_nb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS nb FROM pe_b, pe_bd GROUP BY 1),
        |pe_g AS (SELECT r.range AS bin, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM range(10) r LEFT JOIN pe_na ON pe_na.bin = r.range
        |  LEFT JOIN pe_nb ON pe_nb.bin = r.range),
        |pe_t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM pe_g),
        |pe_s AS (SELECT round(sum(
        |    ((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0)
        |      - (CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))
        |    * ln(((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0))
        |      / ((CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0)))), 6)
        |    AS psi, CAST(min(ta) AS BIGINT) AS n_a, CAST(min(tb) AS BIGINT) AS n_b FROM pe_g, pe_t),
        |qt_a AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM a_rows
        |  WHERE l_quantity IS NOT NULL),
        |qt_b AS (SELECT CAST(l_quantity AS DOUBLE) AS x FROM b_rows
        |  WHERE l_quantity IS NOT NULL),
        |qt_bd AS (SELECT min(x) AS lo, max(x) AS hi
        |  FROM (SELECT x FROM qt_a UNION ALL SELECT x FROM qt_b)),
        |qt_na AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS na FROM qt_a, qt_bd GROUP BY 1),
        |qt_nb AS (SELECT CASE WHEN hi = lo THEN 0 ELSE CAST(least(greatest(
        |    floor((x - lo) / (hi - lo) * 10.0), 0.0), 9.0) AS BIGINT) END AS bin,
        |    count(*) AS nb FROM qt_b, qt_bd GROUP BY 1),
        |qt_g AS (SELECT r.range AS bin, coalesce(na, 0) AS na, coalesce(nb, 0) AS nb
        |  FROM range(10) r LEFT JOIN qt_na ON qt_na.bin = r.range
        |  LEFT JOIN qt_nb ON qt_nb.bin = r.range),
        |qt_t AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM qt_g),
        |qt_s AS (SELECT round(sum(
        |    ((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0)
        |      - (CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0))
        |    * ln(((CAST(na AS DOUBLE) + 0.5) / (CAST(ta AS DOUBLE) + 5.0))
        |      / ((CAST(nb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 5.0)))), 6)
        |    AS psi, CAST(min(ta) AS BIGINT) AS n_a, CAST(min(tb) AS BIGINT) AS n_b FROM qt_g, qt_t)
        |SELECT 'l_extendedprice' AS col_name, psi, n_a, n_b FROM pe_s
        |UNION ALL
        |SELECT 'l_quantity' AS col_name, psi, n_a, n_b FROM qt_s
        |ORDER BY col_name""".stripMargin,

    // TPC-H Q14: promo share of the month's decimal-exact revenue
    "q14_promo_revenue" ->
      """SELECT round(CAST(100 AS DOUBLE)
        |    * CAST(sum(CASE WHEN p_type = 'ECONOMY'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |          * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
        |        END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |      AS DOUBLE), 6) AS promo_pct,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    // TPC-H Q10: returned-item revenue loss per customer, top-20
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    // TPC-H Q18 shape: decimal-exact quantity sums, top-100 by
    // (totalprice desc, orderkey)
    "q18_big_spenders" ->
      """WITH big AS (SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
        |SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q17_small_qty" ->
      """SELECT
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / 7.0, 6) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2)))
        |      AS DOUBLE) / count(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "q2_min_cost" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |         min(l_extendedprice) AS ps_supplycost
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        |FROM part
        |JOIN ps ON p_partkey = ps_partkey
        |JOIN supplier ON s_suppkey = ps_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size = 15 AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps2.ps_supplycost)
        |    FROM ps ps2
        |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) AS volume,
        |    n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY')
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
        |FROM vol GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
        |    AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q11_top_stock" ->
      """WITH fact AS (
        |  SELECT l_partkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      CAST(l_quantity AS DECIMAL(18,2)) AS line_value
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7')
        |SELECT l_partkey AS ps_partkey,
        |  CAST(sum(line_value) AS DOUBLE) AS value
        |FROM fact
        |GROUP BY l_partkey
        |HAVING CAST(sum(line_value) AS DOUBLE) >
        |  (SELECT CAST(sum(line_value) AS DOUBLE) * 1.5
        |     / count(DISTINCT l_partkey) FROM fact)
        |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q12_late_shipments" ->
      """SELECT year(l_shipdate) AS ship_year,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
        |    AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_order_count_dist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |  CAST(total_revenue AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
        |    l_suppkey AS ps_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = ps_partkey
        |WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_promo_parts" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_availqty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT s_name, s_acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT ps_suppkey FROM ps
        |  WHERE ps_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  AND ps_availqty > (
        |    SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM lineitem
        |    WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'))
        |ORDER BY s_name""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q22_idle_customers" ->
      """SELECT c_custkey % 7 AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_custkey % 7 IN (1, 3, 5)
        |  AND c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer
        |    WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1998-01-01')
        |GROUP BY c_custkey % 7
        |ORDER BY cntrycode""".stripMargin,

    // triangle truth: same low->high orientation, wedge join, closure
    "q_triangles" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
        |e AS (SELECT x.i AS a, y.i AS b FROM bi x JOIN bi y USING (bk)
        |  WHERE x.i < y.i GROUP BY 1, 2 HAVING count(*) >= 2),
        |w AS (SELECT e1.a, e1.b AS w1, e2.b AS w2
        |  FROM e e1 JOIN e e2 USING (a) WHERE e1.b < e2.b),
        |t AS (SELECT w.a, w.w1, w.w2 FROM w
        |  JOIN e ON e.a = w.w1 AND e.b = w.w2),
        |n AS (SELECT unnest([a, w1, w2]) AS id FROM t)
        |SELECT id, count(*) AS n_triangles FROM n GROUP BY id
        |ORDER BY id""".stripMargin,

    // 3-D Morton replay: the 3-spacing mask ladder, decimal masks
    "q_zorder3_key" ->
      """WITH b AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |    CAST(floor(p_retailprice) AS BIGINT) AS p_price,
        |    p_partkey & 2097151 AS xa, CAST(p_size AS BIGINT) & 2097151 AS ya,
        |    CAST(floor(p_retailprice) AS BIGINT) & 2097151 AS za
        |  FROM part),
        |s1 AS (SELECT *, (xa | (xa << 32)) & 8725724278095871 AS xb,
        |    (ya | (ya << 32)) & 8725724278095871 AS yb,
        |    (za | (za << 32)) & 8725724278095871 AS zb FROM b),
        |s2 AS (SELECT *, (xb | (xb << 16)) & 8725728556220671 AS xc,
        |    (yb | (yb << 16)) & 8725728556220671 AS yc,
        |    (zb | (zb << 16)) & 8725728556220671 AS zc FROM s1),
        |s3 AS (SELECT *, (xc | (xc << 8)) & 1157144660301377551 AS xd,
        |    (yc | (yc << 8)) & 1157144660301377551 AS yd,
        |    (zc | (zc << 8)) & 1157144660301377551 AS zd FROM s2),
        |s4 AS (SELECT *, (xd | (xd << 4)) & 1207822528635744451 AS xe,
        |    (yd | (yd << 4)) & 1207822528635744451 AS ye,
        |    (zd | (zd << 4)) & 1207822528635744451 AS ze FROM s3),
        |s5 AS (SELECT *, (xe | (xe << 2)) & 1317624576693539401 AS xf,
        |    (ye | (ye << 2)) & 1317624576693539401 AS yf,
        |    (ze | (ze << 2)) & 1317624576693539401 AS zf FROM s4)
        |SELECT p_partkey, p_size, p_price, xf | (yf << 1) | (zf << 2) AS z
        |FROM s5 ORDER BY z, p_partkey""".stripMargin,

    // Morton key replay: the same 5-step mask/shift spread ladder in
    // 64-bit integer ops (x even bits, y odd)
    "q_zorder_key" ->
      """WITH b AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
        |    p_partkey & 2147483647 AS xa, CAST(p_size AS BIGINT) & 2147483647 AS ya
        |  FROM part),
        |s1 AS (SELECT *, (xa | (xa << 16)) & 281470681808895 AS xb,
        |                 (ya | (ya << 16)) & 281470681808895 AS yb FROM b),
        |s2 AS (SELECT *, (xb | (xb << 8)) & 71777214294589695 AS xc,
        |                 (yb | (yb << 8)) & 71777214294589695 AS yc FROM s1),
        |s3 AS (SELECT *, (xc | (xc << 4)) & 1085102592571150095 AS xd,
        |                 (yc | (yc << 4)) & 1085102592571150095 AS yd FROM s2),
        |s4 AS (SELECT *, (xd | (xd << 2)) & 3689348814741910323 AS xe,
        |                 (yd | (yd << 2)) & 3689348814741910323 AS ye FROM s3),
        |s5 AS (SELECT *, (xe | (xe << 1)) & 6148914691236517205 AS xf,
        |                 (ye | (ye << 1)) & 6148914691236517205 AS yf FROM s4)
        |SELECT p_partkey, p_size, xf | (yf << 1) AS z
        |FROM s5 ORDER BY z, p_partkey""".stripMargin,

    // Hilbert truth: mechanically generated unrolled xy2d (see
    // hilbertOracle), bit-for-bit the Scala construction
    "q_hilbert_key" -> hilbertOracle(10),
    "q_hilbert3_key" -> hilbert3Oracle(10),

    // BPE planted truth, hand-derived: word counts aa x3, ab x1 ->
    // merge 0 = (a,a); only ab pairs remain -> merge 1 = (a,b);
    // encode("aab aa ba") = 2 + 1 + 2 = 5 pieces over 3 tokens
    "q_bpe_planted" ->
      """SELECT * FROM (VALUES
        |  ('encode', CAST(3 AS BIGINT), '7', '5'),
        |  ('merge', CAST(0 AS BIGINT), 'a', 'a'),
        |  ('merge', CAST(1 AS BIGINT), 'a', 'b'))
        |AS t(kind, "rank", left_sym, right_sym)
        |ORDER BY kind, "rank"""".stripMargin,

    // SCD2: same (ts, event_id)-ordered lead/rank in one window
    "q_scd_history" ->
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id, t AS valid_from,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS valid_to,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS BIGINT) AS version
        |  FROM p)
        |SELECT user_id, event_id, valid_from, valid_to, version,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // skip-grams: same right-context window over the same token order
    "q_skipgrams" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS t FROM documents),
        |p AS (SELECT doc_id, unnest(t) AS center,
        |    generate_subscripts(t, 1) AS pos FROM tk),
        |c AS (SELECT center,
        |    lead(center, 1) OVER win AS c1,
        |    lead(center, 2) OVER win AS c2,
        |    lead(center, 3) OVER win AS c3
        |  FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |pairs AS (
        |  SELECT center, c1 AS context FROM c WHERE c1 IS NOT NULL
        |  UNION ALL SELECT center, c2 FROM c WHERE c2 IS NOT NULL
        |  UNION ALL SELECT center, c3 FROM c WHERE c3 IS NOT NULL)
        |SELECT center, context, count(*) AS n FROM pairs
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY center, context""".stripMargin,

    // feature hashing replay: same md5 bucket and sign nibble,
    // integer-exact signed counts
    "q_feature_hash" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
        |h AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST(('0x' || substr(md5(term), 16, 1)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS s
        |  FROM tk)
        |SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
        |FROM h GROUP BY 1, 2 HAVING sum(s) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,

    // log compaction: same (ts DESC, event_id DESC) per-key rank
    "q_compact_latest" ->
      """WITH r AS (SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rk
        |  FROM events)
        |SELECT user_id, event_id, event_type, value FROM r
        |WHERE rk = 1 ORDER BY user_id""".stripMargin,

    // basket pairs: same distinct (basket, item) set, same pair join
    "q_basket_pairs" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
        |p AS (SELECT x.i AS item1, y.i AS item2, count(*) AS n_baskets
        |  FROM bi x JOIN bi y USING (bk) WHERE x.i < y.i GROUP BY 1, 2)
        |SELECT * FROM p WHERE n_baskets >= 2 ORDER BY item1, item2""".stripMargin,

    // frequent-triples truth: the plain 3-way count — Apriori pruning
    // is an optimization, not a semantics change
    "q_frequent_triples" ->
      """WITH bi AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
        |  FROM lineitem)
        |SELECT a.i AS item1, b.i AS item2, c.i AS item3,
        |  count(*) AS n_baskets
        |FROM bi a JOIN bi b ON a.bk = b.bk AND a.i < b.i
        |  JOIN bi c ON a.bk = c.bk AND b.i < c.i
        |GROUP BY 1, 2, 3 HAVING count(*) >= 2
        |ORDER BY item1, item2, item3""".stripMargin,

    // grouped sketch bound check: truth is "every group within bound"
    "q_grouped_quantiles_approx" ->
      """SELECT l_returnflag, true AS ok FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // grouped exact quantiles: linear interpolation on both engines,
    // rounded at 6 dp
    "q_grouped_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.50), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // expectations: each rule metric recomputed independently
    "q_expectations" ->
      """WITH n AS (SELECT count(*) AS n FROM orders),
        |rows_ AS (
        |  SELECT 'not_null' AS rule, 'o_orderstatus' AS "column",
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |      / (SELECT n FROM n) AS metric, 0.0 AS threshold FROM orders
        |  UNION ALL
        |  SELECT 'in_range', 'o_totalprice',
        |    CAST(sum(CASE WHEN o_totalprice IS NOT NULL
        |      AND (o_totalprice < 0.0 OR o_totalprice > 400000.0)
        |      THEN 1 ELSE 0 END) AS DOUBLE), 100.0 FROM orders
        |  UNION ALL
        |  SELECT 'matches_regex', 'o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |      AND NOT regexp_matches(o_orderstatus, '^[A-Z]$')
        |      THEN 1 ELSE 0 END) AS DOUBLE), 0.0 FROM orders
        |  UNION ALL
        |  SELECT 'in_set', 'o_orderpriority',
        |    CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
        |      AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM',
        |        '4-NOT SPECIFIED', '5-LOW')
        |      THEN 1 ELSE 0 END) AS DOUBLE), 0.0 FROM orders
        |  UNION ALL
        |  SELECT 'in_set', 'o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
        |      AND o_orderstatus NOT IN ('O', 'F')
        |      THEN 1 ELSE 0 END) AS DOUBLE), 0.0 FROM orders
        |  UNION ALL
        |  SELECT 'unique', 'o_orderkey',
        |    CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS DOUBLE), 0.0
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ref_integrity', 'o_custkey',
        |    CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL
        |      AND NOT EXISTS (SELECT 1 FROM customer c
        |        WHERE c.c_custkey = o.o_custkey)) AS DOUBLE), 0.0)
        |SELECT rule, "column", metric, threshold, metric <= threshold AS ok
        |FROM rows_ ORDER BY rule, "column"""".stripMargin,

    "q_fk_violations" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE o_custkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM customer c
        |    WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 7 <> 0)
        |ORDER BY o_orderkey""".stripMargin,

    "q_fd_violations" ->
      """SELECT p_brand, count(DISTINCT p_type) AS n_distinct
        |FROM part GROUP BY p_brand
        |HAVING count(DISTINCT p_type) > 1
        |ORDER BY p_brand""".stripMargin,

    // replayable HLL uniqueness gate: register replay per column (same
    // md5-first-60-bit construction as the q_hll_* oracles)
    "q_unique_approx" ->
      (uniqueApproxOracleBlock("orders", "o_orderkey", "0.05") +
        "\nUNION ALL\n" +
        uniqueApproxOracleBlock("lineitem", "l_orderkey", "0.05") +
        "\nUNION ALL\n" +
        uniqueApproxOracleBlock("customer", "c_custkey", "0.05") +
        "\nORDER BY \"column\""),

    // cohort LTV: decimal-exact weekly and cumulative revenue, same
    // whole-week offsets as q_retention
    "q_cohort_ltv" ->
      """WITH d AS (SELECT user_id AS u,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
        |      AS DECIMAL(18,2)) AS rev
        |  FROM events),
        |f AS (SELECT u, min(day) AS cohort_day FROM d GROUP BY u),
        |sz AS (SELECT cohort_day, count(*) AS n_users FROM f GROUP BY cohort_day),
        |w AS (SELECT f.cohort_day,
        |    date_diff('day', f.cohort_day, d.day) // 7 AS week_offset, d.rev
        |  FROM d JOIN f ON d.u = f.u),
        |wk AS (SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
        |    sum(rev) AS rev FROM w GROUP BY 1, 2),
        |c AS (SELECT cohort_day, week_offset, rev,
        |    SUM(rev) OVER (PARTITION BY cohort_day ORDER BY week_offset) AS cum_rev
        |  FROM wk)
        |SELECT c.cohort_day, c.week_offset,
        |  CAST(c.rev AS DOUBLE) AS week_rev,
        |  CAST(c.cum_rev AS DOUBLE) AS cum_rev, sz.n_users,
        |  CAST(c.cum_rev AS DOUBLE) / sz.n_users AS ltv_per_user
        |FROM c JOIN sz USING (cohort_day)
        |ORDER BY cohort_day, week_offset""".stripMargin,

    // RFM: same decimal-exact monetary, same interpolated quintile
    // thresholds, same strict-> comparisons
    "q_rfm" ->
      """WITH p AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    value FROM events WHERE event_type = 'purchase'),
        |now_d AS (SELECT max(d) AS nowd FROM p),
        |b AS (SELECT user_id,
        |    date_diff('day', max(d), (SELECT nowd FROM now_d)) AS recency_days,
        |    count(*) AS frequency,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        |  FROM p GROUP BY user_id),
        |t AS (SELECT
        |    quantile_cont(recency_days, 0.2) AS r2, quantile_cont(recency_days, 0.4) AS r4,
        |    quantile_cont(recency_days, 0.6) AS r6, quantile_cont(recency_days, 0.8) AS r8,
        |    quantile_cont(frequency, 0.2) AS f2, quantile_cont(frequency, 0.4) AS f4,
        |    quantile_cont(frequency, 0.6) AS f6, quantile_cont(frequency, 0.8) AS f8,
        |    quantile_cont(monetary, 0.2) AS m2, quantile_cont(monetary, 0.4) AS m4,
        |    quantile_cont(monetary, 0.6) AS m6, quantile_cont(monetary, 0.8) AS m8
        |  FROM b),
        |s AS (SELECT user_id, recency_days, frequency, monetary,
        |    6 - (1 + (recency_days > r2)::INT + (recency_days > r4)::INT
        |           + (recency_days > r6)::INT + (recency_days > r8)::INT) AS r_score,
        |    1 + (frequency > f2)::INT + (frequency > f4)::INT
        |      + (frequency > f6)::INT + (frequency > f8)::INT AS f_score,
        |    1 + (monetary > m2)::INT + (monetary > m4)::INT
        |      + (monetary > m6)::INT + (monetary > m8)::INT AS m_score
        |  FROM b, t)
        |SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days, frequency,
        |  monetary, r_score, f_score, m_score,
        |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
        |    || CAST(m_score AS VARCHAR) AS segment
        |FROM s ORDER BY user_id""".stripMargin,

    // user paths: same (ts, event_id)-ordered prefix, same top-20
    "q_user_paths" ->
      """WITH p AS (SELECT user_id,
        |    array_to_string(list(event_type
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id)[1:5], '>') AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    // Markov transitions: same (ts, event_id)-ordered lead, same
    // bounded (from, to) aggregation, probability rounded at 6 dp
    "q_event_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_type
        |  FROM events),
        |c AS (SELECT event_type AS from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) /
        |        CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,

    // rolling anomaly replay: identical trailing frame, exact-arithmetic
    // variance from the same double sums, z rounded at 6 dp both sides
    "q_rolling_anomaly" ->
      """WITH w AS (SELECT user_id, event_id, CAST(value AS DOUBLE) AS v,
        |    count(value) OVER win AS cnt,
        |    sum(value) OVER win AS s1,
        |    sum(value * value) OVER win AS s2
        |  FROM events
        |  WINDOW win AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT user_id, event_id, v,
        |    CASE WHEN cnt = 10
        |           AND (s2 - cnt * (s1 / cnt) * (s1 / cnt)) / (cnt - 1) > 0
        |      THEN round((v - s1 / cnt) /
        |             sqrt((s2 - cnt * (s1 / cnt) * (s1 / cnt)) / (cnt - 1)), 6)
        |    END AS z
        |  FROM w)
        |SELECT user_id, event_id, v AS value, z, TRUE AS is_anomaly
        |FROM z WHERE z IS NOT NULL AND abs(z) > 2.5
        |ORDER BY user_id, event_id""".stripMargin,

    // FastSS deletion-neighborhood blocking (radius 1): two strings are
    // within one edit only if they share a single-deletion variant
    // (i = 0 keeps the string, i = j deletes char j), so the signature
    // join enumerates a small candidate superset and levenshtein
    // verifies exactly — value-identical to the all-pairs form it
    // replaces, ~50x faster (the sf0.1 sweep pole)
    "q_fuzzy_match" ->
      """WITH clean AS (SELECT p_partkey,
        |      lower(p_type || ' ' || p_name) || ' #' || CAST(p_partkey AS VARCHAR) AS nm FROM part),
        |  dirty AS (SELECT p_partkey AS d_key,
        |      CASE WHEN p_partkey % 5 = 0 THEN 'x' || substr(nm, 2) ELSE nm END AS nm
        |    FROM clean),
        |  sd AS (SELECT d_key, nm, unnest(range(0, length(nm) + 1)) AS i FROM dirty),
        |  sigd AS (SELECT d_key, CASE WHEN i = 0 THEN nm
        |      ELSE substr(nm, 1, CAST(i AS INT) - 1) || substr(nm, CAST(i AS INT) + 1) END AS v
        |    FROM sd),
        |  sc AS (SELECT p_partkey, nm, unnest(range(0, length(nm) + 1)) AS i FROM clean),
        |  sigc AS (SELECT p_partkey, CASE WHEN i = 0 THEN nm
        |      ELSE substr(nm, 1, CAST(i AS INT) - 1) || substr(nm, CAST(i AS INT) + 1) END AS v
        |    FROM sc),
        |  cand AS (SELECT DISTINCT sigd.d_key, sigc.p_partkey
        |    FROM sigd JOIN sigc ON sigd.v = sigc.v),
        |  m AS (SELECT cand.d_key, levenshtein(d.nm, c.nm) AS dist
        |    FROM cand JOIN dirty d ON d.d_key = cand.d_key
        |    JOIN clean c ON c.p_partkey = cand.p_partkey
        |    WHERE levenshtein(d.nm, c.nm) <= 1)
        |SELECT d_key, count(*) AS n_matches, CAST(min(dist) AS BIGINT) AS best_dist
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // same FastSS radius-1 blocking as q_fuzzy_match, feeding the
    // unchanged recursive-components tail
    "q_entity_resolution" ->
      """WITH RECURSIVE
        |  base AS (SELECT p_partkey,
        |      lower(p_type || ' ' || p_name) || ' #' || CAST(p_partkey AS VARCHAR) AS nm FROM part),
        |  dirty AS (SELECT p_partkey,
        |      CASE WHEN p_partkey % 5 = 0 THEN 'x' || substr(nm, 2) ELSE nm END AS nm
        |    FROM base),
        |  sa AS (SELECT p_partkey, nm, unnest(range(0, length(nm) + 1)) AS i FROM dirty),
        |  sig AS (SELECT p_partkey, CASE WHEN i = 0 THEN nm
        |      ELSE substr(nm, 1, CAST(i AS INT) - 1) || substr(nm, CAST(i AS INT) + 1) END AS v
        |    FROM sa),
        |  cand AS (SELECT DISTINCT x.p_partkey AS id1, y.p_partkey AS id2
        |    FROM sig x JOIN sig y ON x.v = y.v AND x.p_partkey < y.p_partkey),
        |  e0 AS (SELECT cand.id1, cand.id2 FROM cand
        |    JOIN dirty a ON a.p_partkey = cand.id1
        |    JOIN dirty b ON b.p_partkey = cand.id2
        |    WHERE levenshtein(a.nm, b.nm) <= 1),
        |  edges AS (SELECT id1 AS a, id2 AS b FROM e0
        |            UNION SELECT id2, id1 FROM e0),
        |  reach AS (SELECT p_partkey AS id, p_partkey AS lab FROM dirty
        |            UNION SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b),
        |  comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id)
        |SELECT p_partkey, component AS entity_id
        |FROM dirty JOIN comp ON id = p_partkey ORDER BY p_partkey""".stripMargin,

    "q_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // survivorship truth: the exact all-pairs cluster graph (same
    // recursive CTE as q_dedup_corpus, unfiltered), representative by
    // (n_chars DESC, doc_id ASC) per component
    "q_survivorship" ->
      s"""WITH RECURSIVE $jaccardTruthSql,
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs WHERE jaccard >= 0.5
        |          UNION SELECT id2, id1 FROM pairs WHERE jaccard >= 0.5),
        |reach AS (SELECT doc_id AS id, doc_id AS lab FROM documents
        |          UNION SELECT e.a, r.lab FROM edges e JOIN reach r ON r.id = e.b),
        |comp AS (SELECT id, min(lab) AS component FROM reach GROUP BY id),
        |m AS (SELECT c.component, d.doc_id, d.n_chars
        |  FROM comp c JOIN documents d ON d.doc_id = c.id),
        |r AS (SELECT component, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC, doc_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY component) AS cluster_size FROM m)
        |SELECT component, cluster_size, doc_id AS rep_id, n_chars AS rep_score
        |FROM r WHERE rk = 1 ORDER BY component""".stripMargin,

    // per-domain budget truth: a plain partitioned window cumsum — the
    // oracle may single-task a domain; the engine must not
    "q_domain_budget" ->
      """WITH r AS (SELECT source, doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |SELECT source, doc_id, n_chars, cum_tokens FROM r
        |WHERE cum_tokens <= 4000 ORDER BY source, cum_tokens""".stripMargin,

    // cumulative distinct truth: same first-appearance formulation
    // (count(DISTINCT) OVER a growing frame is not generally available
    // and would be the wrong plan anyway)
    "q_cum_users" ->
      """WITH f AS (SELECT event_type, user_id,
        |    min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
        |  FROM events GROUP BY event_type, user_id),
        |d AS (SELECT event_type, day, count(*) AS new_users FROM f
        |  GROUP BY event_type, day)
        |SELECT event_type, day, new_users,
        |  CAST(SUM(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d ORDER BY event_type, day""".stripMargin,

    // robust outliers: quantile_cont matches Spark's exact interpolated
    // percentile; med/mad round at 6 dp BEFORE the z so the division
    // replays bit-for-bit
    "q_robust_outliers" ->
      """WITH m AS (SELECT event_type,
        |    round(quantile_cont(value, 0.5), 6) AS med
        |  FROM events GROUP BY event_type),
        |md AS (SELECT e.event_type, any_value(m.med) AS med,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        |  FROM events e JOIN m USING (event_type) GROUP BY e.event_type),
        |z AS (SELECT e.event_id, e.event_type, e.value, md.med, md.mad,
        |    CASE WHEN md.mad > 0
        |      THEN round((e.value - md.med) / (1.4826 * md.mad), 6) END AS robust_z
        |  FROM events e JOIN md USING (event_type))
        |SELECT event_id, event_type, value, med, mad, robust_z,
        |  COALESCE(abs(robust_z) > 3.5, false) AS is_outlier
        |FROM z ORDER BY event_id""".stripMargin,

    // equi-depth bins: replay the distinct-value-CDF edge derivation
    // (edge_i = min{v : cum*10 >= i*tot}), bin = #edges strictly below v
    "q_quantile_bins" ->
      """WITH c AS (SELECT n_chars AS v, count(*) AS n FROM documents GROUP BY 1),
        |cc AS (SELECT v,
        |    SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(n) OVER () AS tot FROM c),
        |e AS (SELECT i, min(v) AS edge FROM cc
        |  JOIN (SELECT unnest(range(1, 10)) AS i) ii ON cum * 10 >= i * tot
        |  GROUP BY i),
        |b AS (SELECT d.n_chars,
        |    CAST((SELECT count(*) FROM e WHERE d.n_chars > e.edge) AS INT) AS bin
        |  FROM documents d)
        |SELECT bin, count(*) AS n_rows, min(n_chars) AS min_v, max(n_chars) AS max_v,
        |  round(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_v
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    // drift localization truth: the EXCEPT diffs bucketed by integer
    // key-range (pure integer arithmetic, keys never touch a double)
    "q_drift_localize" ->
      s"""WITH $lineitemSidesSql
        |SELECT bucket_lo, observed_in, count(*) AS n_rows FROM (
        |  SELECT l_orderkey - l_orderkey % 1000 AS bucket_lo,
        |    'db1' AS observed_in FROM d1
        |  UNION ALL
        |  SELECT l_orderkey - l_orderkey % 1000, 'db2' FROM d2) u
        |GROUP BY bucket_lo, observed_in
        |ORDER BY bucket_lo, observed_in""".stripMargin,

    // column-drift truth: per-column null-safe comparisons over the
    // key-matched join, summed to one row per drifting column
    "q_column_drift" ->
      """WITH old AS (SELECT o_orderkey AS pk, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderkey % 59 <> 0),
        |new AS (SELECT o_orderkey AS pk,
        |    CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 100.0
        |      ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 23 = 0 THEN 'X-DRIFTED'
        |      ELSE o_orderpriority END AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 53 <> 0),
        |j AS (SELECT old.o_totalprice AS p1, new.o_totalprice AS p2,
        |    old.o_orderpriority AS r1, new.o_orderpriority AS r2
        |  FROM old JOIN new USING (pk))
        |SELECT "column", n_rows FROM (
        |  SELECT '(added rows)' AS "column", CAST((SELECT count(*) FROM new
        |    WHERE pk NOT IN (SELECT pk FROM old)) AS BIGINT) AS n_rows
        |  UNION ALL
        |  SELECT '(removed rows)', CAST((SELECT count(*) FROM old
        |    WHERE pk NOT IN (SELECT pk FROM new)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(sum(CASE WHEN p1 IS DISTINCT FROM p2
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM j
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(sum(CASE WHEN r1 IS DISTINCT FROM r2
        |    THEN 1 ELSE 0 END) AS BIGINT) FROM j) u
        |WHERE n_rows > 0 ORDER BY "column"""".stripMargin,

    // dwell truth: identical lead-gap window in integer epoch-micros;
    // mean and interpolated median rounded with the same op order
    "q_dwell_time" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |g AS (SELECT event_type,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id))
        |      - epoch_us(ts) AS gap_us FROM ev),
        |f AS (SELECT * FROM g WHERE gap_us IS NOT NULL AND gap_us <= 1800000000)
        |SELECT event_type, count(*) AS n_dwells,
        |  round(CAST(sum(gap_us) AS DOUBLE) / count(*) / 1000000.0, 6) AS avg_dwell_sec,
        |  round(quantile_cont(gap_us, 0.5) / 1000000.0, 6) AS p50_dwell_sec
        |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,

    // incremental-merge truth: the from-scratch rollup — the merge of
    // snapshot + delta must reproduce it exactly (decimal sums)
    "q_incremental_agg" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

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

    // BM25 truth: same posting/df/corpus-stat derivation, the per-term
    // score in the identical fixed op order rounded 6dp, decimal-summed;
    // k1/b literals interpolated from the SAME Scala doubles the engine
    // embeds (shortest-roundtrip parse parity)
    "q_bm25" -> {
      val k1 = 1.2; val b = 0.75
      s"""WITH base AS (SELECT doc_id, $toksSql AS tk
        |    FROM documents WHERE text IS NOT NULL),
        |st AS (SELECT count(*) AS n, SUM(len(tk)) AS sumdl FROM base),
        |p0 AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM base),
        |p AS (SELECT doc_id, dl, term, count(*) AS tf FROM p0
        |  WHERE term IN ('hash', 'join', 'spark') GROUP BY doc_id, dl, term),
        |d AS (SELECT term, count(*) AS df FROM p GROUP BY term),
        |w AS (SELECT p.doc_id,
        |    round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * ${k1 + 1.0}) /
        |      (tf + $k1 * (1.0 - $b + $b * dl / avgdl)), 6) AS w
        |  FROM p JOIN d USING (term),
        |    (SELECT n, CAST(sumdl AS DOUBLE) / n AS avgdl FROM st) s)
        |SELECT doc_id, CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |  count(*) AS n_terms_matched
        |FROM w GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin
    },

    // Pearson truth: decimal-exact moments cast to double once, then the
    // identical fixed-order double formula per pair, rounded 6dp
    "q_corr_matrix" ->
      """WITH c0 AS (SELECT CAST(l_quantity AS DECIMAL(19,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(19,2)) AS e,
        |    CAST(l_discount AS DECIMAL(19,2)) AS d,
        |    CAST(l_tax AS DECIMAL(19,2)) AS t
        |  FROM lineitem WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |  CAST(SUM(q) AS DOUBLE) AS s_q, CAST(SUM(e) AS DOUBLE) AS s_e,
        |  CAST(SUM(d) AS DOUBLE) AS s_d, CAST(SUM(t) AS DOUBLE) AS s_t,
        |  CAST(SUM(q * q) AS DOUBLE) AS p_qq, CAST(SUM(q * e) AS DOUBLE) AS p_qe,
        |  CAST(SUM(q * d) AS DOUBLE) AS p_qd, CAST(SUM(q * t) AS DOUBLE) AS p_qt,
        |  CAST(SUM(e * e) AS DOUBLE) AS p_ee, CAST(SUM(e * d) AS DOUBLE) AS p_ed,
        |  CAST(SUM(e * t) AS DOUBLE) AS p_et, CAST(SUM(d * d) AS DOUBLE) AS p_dd,
        |  CAST(SUM(d * t) AS DOUBLE) AS p_dt, CAST(SUM(t * t) AS DOUBLE) AS p_tt
        |  FROM c0)
        |SELECT col1, col2, n, r FROM (
        |  SELECT 'l_quantity' AS col1, 'l_extendedprice' AS col2, n,
        |    round((n * p_qe - s_q * s_e) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_ee - s_e * s_e)), 6) AS r FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount', n,
        |    round((n * p_qd - s_q * s_d) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_dd - s_d * s_d)), 6) FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', n,
        |    round((n * p_qt - s_q * s_t) / (sqrt(n * p_qq - s_q * s_q) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', n,
        |    round((n * p_ed - s_e * s_d) / (sqrt(n * p_ee - s_e * s_e) * sqrt(n * p_dd - s_d * s_d)), 6) FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', n,
        |    round((n * p_et - s_e * s_t) / (sqrt(n * p_ee - s_e * s_e) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', n,
        |    round((n * p_dt - s_d * s_t) / (sqrt(n * p_dd - s_d * s_d) * sqrt(n * p_tt - s_t * s_t)), 6) FROM m)
        |ORDER BY col1, col2""".stripMargin,

    "q_chi2" ->
      """WITH e AS (SELECT event_type AS row_val,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS col_val
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |cells AS (SELECT row_val, col_val, count(*) AS observed
        |  FROM e GROUP BY row_val, col_val),
        |rt AS (SELECT row_val, SUM(observed) AS mrt FROM cells GROUP BY row_val),
        |ct AS (SELECT col_val, SUM(observed) AS mct FROM cells GROUP BY col_val),
        |tot AS (SELECT SUM(observed) AS n,
        |    count(DISTINCT row_val) AS nr, count(DISTINCT col_val) AS nc FROM cells),
        |s AS (SELECT c.row_val, c.col_val, c.observed,
        |    round(CAST(mrt AS DOUBLE) * mct / n, 6) AS expected, nr, nc
        |  FROM cells c JOIN rt USING (row_val) JOIN ct USING (col_val), tot),
        |s2 AS (SELECT *,
        |    CASE WHEN expected > 0.0
        |      THEN round((observed - expected) * (observed - expected) / expected, 6)
        |      ELSE 0.0 END AS contrib
        |  FROM s),
        |st AS (SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
        |    (max(nr) - 1) * (max(nc) - 1) AS dof FROM s2)
        |SELECT row_val, col_val, observed, expected, contrib, chi2, dof
        |FROM s2, st ORDER BY row_val, col_val""".stripMargin,

    // EWMA truth: the same lag ladder with the SAME weight literals
    // (interpolated from identical Scala doubles), strictly left-assoc
    // numerator/denominator chains, rounded 6dp
    "q_ewma" -> {
      val ew = (0 until 5).map(j => math.pow(1.0 - 0.3, j))
      val lagsSql = (0 until 5).map {
        case 0 => "v AS x0"
        case j => s"lag(v, $j) OVER w AS x$j"
      }.mkString(", ")
      val num = (0 until 5)
        .map(j => s"CASE WHEN x$j IS NOT NULL THEN x$j * ${ew(j)} ELSE 0.0 END")
        .mkString(" + ")
      val den = (0 until 5)
        .map(j => s"CASE WHEN x$j IS NOT NULL THEN ${ew(j)} ELSE 0.0 END")
        .mkString(" + ")
      s"""WITH ev AS (SELECT event_id, user_id, CAST(value AS DOUBLE) AS v,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |l AS (SELECT event_id, user_id, v, $lagsSql FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)),
        |f AS (SELECT user_id, event_id, v AS value,
        |    $num AS num, $den AS den FROM l)
        |SELECT user_id, event_id, value,
        |  CASE WHEN den > 0.0 THEN round(num / den, 6) END AS ewma
        |FROM f ORDER BY event_id""".stripMargin
    },

    // k-core planted truth: the 3-core of clique(0..5) + chain tail is
    // exactly the clique, every member at in-core degree 5
    "q_kcore" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(3 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(4 AS BIGINT), CAST(5 AS BIGINT)),
        |  (CAST(5 AS BIGINT), CAST(5 AS BIGINT)))
        |  AS t(id, degree)
        |ORDER BY id""".stripMargin,

    // Welch truth: exact decimal moments per group cast to double once,
    // then the identical fixed-order mean/variance/t/df arithmetic
    "q_welch_t" ->
      """WITH g AS (SELECT event_type AS g, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS p
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY event_type HAVING count(*) >= 2),
        |pr AS (SELECT g1.g AS g1, g2.g AS g2, g1.n AS n1, g2.n AS n2,
        |    g1.s / g1.n AS mean1, g2.s / g2.n AS mean2,
        |    (g1.n * g1.p - g1.s * g1.s) / CAST(g1.n * (g1.n - 1) AS DOUBLE) AS v1,
        |    (g2.n * g2.p - g2.s * g2.s) / CAST(g2.n * (g2.n - 1) AS DOUBLE) AS v2
        |  FROM g g1 JOIN g g2 ON g1.g < g2.g),
        |ab AS (SELECT *, v1 / n1 AS a, v2 / n2 AS b FROM pr)
        |SELECT g1, g2, n1, n2, round(mean1, 6) AS mean1, round(mean2, 6) AS mean2,
        |  CASE WHEN a + b > 0.0
        |    THEN round((mean1 - mean2) / sqrt(a + b), 6) END AS t,
        |  CASE WHEN a + b > 0.0
        |    THEN round((a + b) * (a + b) /
        |      (a * a / (n1 - 1) + b * b / (n2 - 1)), 6) END AS df_w
        |FROM ab ORDER BY g1, g2""".stripMargin,

    // KS truth: same decimal canonicalization, same integer cross-
    // scaled gap max, p from the ROUNDED d so exp sees one double
    "q_ks_test" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2 FROM c),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |m AS (SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |    - CAST(cum2 AS HUGEINT) * n1)) AS dn FROM w, t),
        |d AS (SELECT n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m, t)
        |SELECT n1, n2, d,
        |  round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |    (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |FROM d""".stripMargin,

    // drift-expectation truth: the same KS D between the month halves
    "q_expectations_drift" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
        |      THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
        |      THEN 1 ELSE 0 END) AS c2
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2 FROM c),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |m AS (SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |    - CAST(cum2 AS HUGEINT) * n1)) AS dn FROM w, t),
        |d AS (SELECT round(CAST(dn AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * n2), 6) AS d FROM m, t)
        |SELECT 'drift' AS rule, 'value' AS "column", d AS metric,
        |  0.05 AS threshold, d <= 0.05 AS ok
        |FROM d""".stripMargin,

    // mutual-information truth: same rounded-term decimal folds over
    // the cell/margin tables, identical fixed-order double assembly
    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS a,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS b
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS nab FROM e GROUP BY 1, 2),
        |at AS (SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY 1),
        |bt AS (SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |t AS (SELECT CAST(SUM(nab) AS BIGINT) AS n,
        |    count(DISTINCT a) AS ra, count(DISTINCT b) AS rb FROM cells),
        |sc AS (SELECT nab, na, nb, n,
        |    CAST(round((CAST(nab AS DOUBLE) / n)
        |      * ln(CAST(n AS DOUBLE) * nab / (CAST(na AS DOUBLE) * nb)), 6)
        |      AS DECIMAL(18,6)) AS mit,
        |    round(CAST(na AS DOUBLE) * nb / n, 6) AS ex
        |  FROM cells JOIN at USING (a) JOIN bt USING (b), t),
        |sc2 AS (SELECT *, CASE WHEN ex > 0.0
        |    THEN CAST(round((nab - ex) * (nab - ex) / ex, 6) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END AS x2t FROM sc),
        |ha AS (SELECT CAST(SUM(CAST(round(-(CAST(na AS DOUBLE) / n)
        |    * ln(CAST(na AS DOUBLE) / n), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS ha FROM at, t),
        |hb AS (SELECT CAST(SUM(CAST(round(-(CAST(nb AS DOUBLE) / n)
        |    * ln(CAST(nb AS DOUBLE) / n), 6) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS hb FROM bt, t),
        |s3 AS (SELECT CAST(SUM(mit) AS DOUBLE) AS mi,
        |    CAST(CAST(SUM(x2t) AS DECIMAL(30,6))
        |      + CAST(max(n) - SUM(CAST(ex AS DECIMAL(18,6)))
        |        AS DECIMAL(30,6)) AS DOUBLE) AS x2 FROM sc2)
        |SELECT n, round(mi, 6) AS mi,
        |  CASE WHEN ha > 0.0 AND hb > 0.0
        |    THEN round(mi / sqrt(ha * hb), 6) END AS nmi,
        |  CASE WHEN least(ra, rb) > 1
        |    THEN round(sqrt(x2 / (n * (least(ra, rb) - 1))), 6)
        |  END AS cramers_v
        |FROM s3, t, ha, hb""".stripMargin,

    // per-segment KS truth: same windows PARTITION BY segment
    "q_ks_by_segment" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |d AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0)
        |SELECT segment, n1, n2, d,
        |  round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |    (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |FROM d ORDER BY segment""".stripMargin,

    // Q-Q truth: same inverted-CDF quantiles at percentiles 1..99
    "q_qq_table" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT v, SUM(c1) OVER (ORDER BY v) AS cum1,
        |    SUM(c2) OVER (ORDER BY v) AS cum2,
        |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM c),
        |p AS (SELECT CAST(gs AS BIGINT) AS p
        |  FROM generate_series(1, 99) AS t2(gs)),
        |q AS (SELECT p,
        |    CAST(MIN(CASE WHEN CAST(cum1 AS HUGEINT) * 100
        |      >= CAST(n1 AS HUGEINT) * p THEN v END) AS DOUBLE) AS q1,
        |    CAST(MIN(CASE WHEN CAST(cum2 AS HUGEINT) * 100
        |      >= CAST(n2 AS HUGEINT) * p THEN v END) AS DOUBLE) AS q2
        |  FROM w, p GROUP BY 1)
        |SELECT p, q1, q2, round(q2 - q1, 6) AS gap
        |FROM q ORDER BY p""".stripMargin,

    // BH truth: the per-segment KS battery as a CTE, then the step-up
    // over the bounded distinct-p table with the same tie-deterministic
    // rank (#values <= p)
    "q_bh_fdr" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |dd AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0),
        |ks AS (SELECT segment, n1, n2, d,
        |    round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |      (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |  FROM dd),
        |pc AS (SELECT p_approx AS p, count(*) AS n FROM ks GROUP BY 1),
        |w2 AS (SELECT p, CAST(SUM(n) OVER (ORDER BY p) AS BIGINT) AS i,
        |    CAST(SUM(n) OVER () AS BIGINT) AS m FROM pc),
        |rw AS (SELECT p, p * CAST(m AS DOUBLE) / i AS raw FROM w2),
        |ad AS (SELECT p, round(least(CAST(1 AS DOUBLE),
        |    MIN(raw) OVER (ORDER BY p DESC)), 6) AS p_adj FROM rw)
        |SELECT ks.segment, ks.n1, ks.n2, ks.d, ks.p_approx, ad.p_adj,
        |  ad.p_adj <= 0.05 AS reject
        |FROM ks JOIN ad ON ks.p_approx = ad.p
        |ORDER BY segment""".stripMargin,

    // Mann-Whitney truth: exact 2x-scaled midrank sums and tie cubes
    // from the same distinct-value prefix counts, identical fixed-order
    // double u/z arithmetic
    // decomposition truth: identical window frames and one fixed
    // operation order per column — trend is wsum/700.0 (integer-unit
    // window sum), slot means are decimal sums of rounded terms
    "q_decompose" ->
      """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |u AS (SELECT t, v,
        |    CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS uu FROM daily),
        |w AS (SELECT t, v,
        |    SUM(uu) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |      AS wsum,
        |    COUNT(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |      AS wcnt
        |  FROM u),
        |tr AS (SELECT t, v, t % 7 AS slot,
        |    CASE WHEN wcnt = 7
        |      THEN round(CAST(wsum AS DOUBLE) / 700.0, 6) END AS trend
        |  FROM w),
        |det AS (SELECT *, CAST(round(v - trend, 6) AS DECIMAL(18,6)) AS dt
        |  FROM tr),
        |sl AS (SELECT slot, round(CAST(SUM(dt) AS DOUBLE) / COUNT(*), 6)
        |    AS smean
        |  FROM det WHERE trend IS NOT NULL GROUP BY 1),
        |c AS (SELECT round(CAST(SUM(CAST(smean AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*), 6) AS cc FROM sl)
        |SELECT t, v AS value, trend, round(smean - cc, 6) AS seasonal,
        |  CASE WHEN trend IS NOT NULL
        |    THEN round(v - trend - round(smean - cc, 6), 6) END AS resid
        |FROM det LEFT JOIN sl USING (slot) CROSS JOIN c ORDER BY t""".stripMargin,

    "q_cohens_kappa" ->
      """WITH cells AS (SELECT CAST(l_returnflag AS VARCHAR) AS a,
        |    CAST(l_linestatus AS VARCHAR) AS b, COUNT(*) AS c
        |  FROM lineitem WHERE l_returnflag IS NOT NULL
        |    AND l_linestatus IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT SUM(c) AS n,
        |    SUM(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM cells),
        |ra AS (SELECT a, SUM(c) AS ma FROM cells GROUP BY 1),
        |rb AS (SELECT b, SUM(c) AS mb FROM cells GROUP BY 1),
        |x AS (SELECT COALESCE(SUM(CAST(ma AS HUGEINT) * mb), 0) AS xx
        |  FROM ra JOIN rb ON ra.a = rb.b),
        |f AS (SELECT CAST(n AS BIGINT) AS n,
        |    round(CAST(agree AS DOUBLE) / n, 6) AS po,
        |    round(CAST(xx AS DOUBLE) / (CAST(n AS DOUBLE) * n), 6) AS pe
        |  FROM t, x)
        |SELECT n, po, pe, CASE WHEN pe < 1.0
        |  THEN round((po - pe) / (1.0 - pe), 6) END AS kappa FROM f""".stripMargin,

    // Fleiss truth: the 3-rater panel unpivots as a UNION ALL; P̄ and
    // P_e are ratios of exact integer aggregates (margins squared as
    // HUGEINT), κ recomputed from the 6-dp-rounded P̄/P_e exactly as
    // the operator does
    "q_fleiss_kappa" ->
      """WITH r AS (
        |  SELECT o_orderkey AS item,
        |    CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END AS rating
        |    FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderpriority < '3' THEN 'hi' ELSE 'lo' END
        |    FROM orders
        |  UNION ALL
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN 'hi' ELSE 'lo' END
        |    FROM orders),
        |cells AS (SELECT item, rating, count(*) AS k FROM r GROUP BY 1, 2),
        |items AS (SELECT item, sum(k) AS m, sum(k * k) AS s2
        |  FROM cells GROUP BY 1),
        |a AS (SELECT count(*) AS nitems, CAST(sum(s2) AS BIGINT) AS s2t
        |  FROM items),
        |tt AS (SELECT COALESCE(sum(CAST(tc AS HUGEINT) * tc), 0) AS tt
        |  FROM (SELECT rating, sum(k) AS tc FROM cells GROUP BY 1)),
        |f AS (SELECT CAST(nitems AS BIGINT) AS n_items,
        |    CAST(3 AS BIGINT) AS n_raters,
        |    round(CAST(s2t - nitems * 3 AS DOUBLE) /
        |      (CAST(nitems AS DOUBLE) * 3 * 2), 6) AS p_bar,
        |    round(CAST(tt AS DOUBLE) /
        |      ((CAST(nitems AS DOUBLE) * 3) * (CAST(nitems AS DOUBLE) * 3)),
        |      6) AS p_e
        |  FROM a, tt)
        |SELECT n_items, n_raters, p_bar, p_e, CASE WHEN p_e < 1.0
        |  THEN round((p_bar - p_e) / (1.0 - p_e), 6) END AS kappa
        |FROM f""".stripMargin,

    // Krippendorff truth: per-unit (m² − Σn²)/(m−1) terms rounded at
    // 9 dp into a decimal fold; margins counted over pairable units
    // only; the three divisions mirror the operator's fixed order
    "q_krippendorff" ->
      """WITH cells AS (SELECT l_orderkey AS u,
        |    CAST(l_returnflag AS VARCHAR) AS v, count(*) AS k
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |    AND l_returnflag IS NOT NULL GROUP BY 1, 2),
        |units AS (SELECT u, sum(k) AS m, sum(k * k) AS s2
        |  FROM cells GROUP BY 1 HAVING sum(k) >= 2),
        |ua AS (SELECT count(*) AS n_units, CAST(sum(m) AS BIGINT) AS n,
        |    sum(CAST(round(CAST(m * m - s2 AS DOUBLE) /
        |      CAST(m - 1 AS DOUBLE), 9) AS DECIMAL(28,9))) AS dsum
        |  FROM units),
        |va AS (SELECT COALESCE(sum(CAST(t AS HUGEINT) * t), 0) AS tt
        |  FROM (SELECT c.v, sum(c.k) AS t FROM cells c
        |    JOIN units uu ON c.u = uu.u GROUP BY 1))
        |SELECT CAST(n_units AS BIGINT) AS n_units, n AS n_ratings,
        |  round(CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS d_o,
        |  round((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(tt AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS d_e,
        |  CASE WHEN n >= 2 AND CAST(tt AS DOUBLE) <
        |      CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |    THEN round(1.0 - (CAST(dsum AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(tt AS DOUBLE)) /
        |       (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) END AS alpha
        |FROM ua, va""".stripMargin,

    // SRM truth: designed shares as exact binary doubles (.25/.5),
    // per-arm (O−E)²/E rounded at 6 dp, exact decimal χ² fold
    "q_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events
        |    WHERE user_id IS NOT NULL),
        |a AS (SELECT CASE WHEN user_id % 4 = 0 THEN 'arm0'
        |    WHEN user_id % 4 = 1 THEN 'arm1' ELSE 'arm2' END AS arm FROM u),
        |c AS (SELECT arm, count(*) AS n FROM a GROUP BY 1),
        |e AS (SELECT * FROM (VALUES ('arm0', 0.25), ('arm1', 0.25),
        |    ('arm2', 0.5)) AS t(arm, share)),
        |j AS (SELECT e.arm, COALESCE(c.n, 0) AS n,
        |    CAST(e.share AS DOUBLE) AS share FROM e LEFT JOIN c USING (arm)),
        |w AS (SELECT arm, n, share,
        |    CAST(sum(n) OVER () AS DOUBLE) AS total,
        |    CAST(count(*) OVER () AS INT) AS arms FROM j),
        |x AS (SELECT arm, CAST(n AS BIGINT) AS n,
        |    round(total * share, 6) AS expected_n,
        |    round((CAST(n AS DOUBLE) - total * share) *
        |      (CAST(n AS DOUBLE) - total * share) / (total * share), 6)
        |      AS contrib,
        |    arms FROM w)
        |SELECT arm, n, expected_n, contrib,
        |  CAST(sum(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE)
        |    AS chi2,
        |  arms - 1 AS dof
        |FROM x ORDER BY arm""".stripMargin,

    // switchback truth: same 6-hour block derivation (double division
    // of exact micros, floor), then the identical CR0 fold with
    // cluster = block
    "q_switchback" ->
      """WITH ev AS (SELECT
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 21600000000)
        |      AS BIGINT) AS block,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE ts IS NOT NULL),
        |ev2 AS (SELECT CASE WHEN block % 2 = 0 THEN 'A' ELSE 'B' END
        |    AS arm, CAST(block AS VARCHAR) AS c, y FROM ev),
        |pc AS (SELECT arm, c, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sm FROM ev2 GROUP BY 1, 2),
        |t AS (SELECT arm, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sm) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS tc
        |  FROM pc GROUP BY 1),
        |j AS (SELECT pc.arm,
        |    CAST(round((CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)) *
        |      (CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)), 9) AS DECIMAL(38,12)) AS r2,
        |    t.tn, t.ts, t.tc
        |  FROM pc JOIN t USING (arm)),
        |g AS (SELECT arm, max(tn) AS n, max(ts) AS sm, max(tc) AS cl,
        |    sum(r2) AS ss FROM j GROUP BY arm),
        |p AS (SELECT
        |    MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    MAX(CASE WHEN arm = 'A' THEN sm END) AS s_a,
        |    MAX(CASE WHEN arm = 'A' THEN cl END) AS clusters_a,
        |    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    MAX(CASE WHEN arm = 'B' THEN sm END) AS s_b,
        |    MAX(CASE WHEN arm = 'B' THEN cl END) AS clusters_b,
        |    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss_b FROM g),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |    sqrt(
        |      (CAST(clusters_a AS DOUBLE) /
        |        (CAST(clusters_a AS DOUBLE) - 1.0)) *
        |        CAST(ss_a AS DOUBLE) /
        |        (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) +
        |      (CAST(clusters_b AS DOUBLE) /
        |        (CAST(clusters_b AS DOUBLE) - 1.0)) *
        |        CAST(ss_b AS DOUBLE) /
        |        (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))) AS se
        |  FROM p)
        |SELECT n_a, s_a, clusters_a, n_b, s_b, clusters_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM d""".stripMargin,

    // cluster-z truth: same (cluster, arm) fold, 9 dp residual-squared
    // quantization, CR0 cluster variance in the operator's fixed order
    "q_cluster_z" ->
      """WITH ev AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(user_id AS VARCHAR) AS c,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |pc AS (SELECT arm, c, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sm FROM ev GROUP BY 1, 2),
        |t AS (SELECT arm, CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sm) AS BIGINT) AS ts, CAST(count(*) AS BIGINT) AS tc
        |  FROM pc GROUP BY 1),
        |j AS (SELECT pc.arm,
        |    CAST(round((CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)) *
        |      (CAST(pc.sm AS DOUBLE) -
        |      (CAST(t.ts AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        |      CAST(pc.n AS DOUBLE)), 9) AS DECIMAL(38,12)) AS r2,
        |    t.tn, t.ts, t.tc
        |  FROM pc JOIN t USING (arm)),
        |g AS (SELECT arm, max(tn) AS n, max(ts) AS sm, max(tc) AS cl,
        |    sum(r2) AS ss FROM j GROUP BY arm),
        |p AS (SELECT
        |    MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
        |    MAX(CASE WHEN arm = 'A' THEN sm END) AS s_a,
        |    MAX(CASE WHEN arm = 'A' THEN cl END) AS clusters_a,
        |    MAX(CASE WHEN arm = 'A' THEN ss END) AS ss_a,
        |    MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
        |    MAX(CASE WHEN arm = 'B' THEN sm END) AS s_b,
        |    MAX(CASE WHEN arm = 'B' THEN cl END) AS clusters_b,
        |    MAX(CASE WHEN arm = 'B' THEN ss END) AS ss_b FROM g),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |    sqrt(
        |      (CAST(clusters_a AS DOUBLE) /
        |        (CAST(clusters_a AS DOUBLE) - 1.0)) *
        |        CAST(ss_a AS DOUBLE) /
        |        (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE)) +
        |      (CAST(clusters_b AS DOUBLE) /
        |        (CAST(clusters_b AS DOUBLE) - 1.0)) *
        |        CAST(ss_b AS DOUBLE) /
        |        (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))) AS se
        |  FROM p)
        |SELECT n_a, s_a, clusters_a, n_b, s_b, clusters_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN clusters_a > 1 AND clusters_b > 1 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM d""".stripMargin,

    // segment-SRM truth: same per-(dow, arm) counts, per-segment chi2
    // with 6 dp contribution rounding and the df=1 critical value
    "q_srm_by_segment" ->
      """WITH ev AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR)
        |      AS segment,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events WHERE ts IS NOT NULL),
        |g AS (SELECT segment,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a0,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a1,
        |    CAST(sum(CASE WHEN arm NOT IN ('A', 'B') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_unknown
        |  FROM ev GROUP BY 1),
        |c AS (SELECT segment, a0 + a1 AS n, n_unknown,
        |    CASE WHEN a0 + a1 > 0 THEN CAST(
        |      CAST(round((CAST(a0 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        * (CAST(a0 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        / (CAST(a0 + a1 AS DOUBLE) * 0.5), 6) AS DECIMAL(18,6)) +
        |      CAST(round((CAST(a1 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        * (CAST(a1 AS DOUBLE) - CAST(a0 + a1 AS DOUBLE) * 0.5)
        |        / (CAST(a0 + a1 AS DOUBLE) * 0.5), 6) AS DECIMAL(18,6))
        |      AS DOUBLE) END AS chi2
        |  FROM g)
        |SELECT segment, n, n_unknown, chi2, 1 AS dof,
        |  chi2 > 3.841459 AS srm_flag
        |FROM c ORDER BY segment""".stripMargin,

    // A/A truth: identical md5(unit#k) parity splits, the same pooled-SE
    // z per pseudo-experiment, calibration summary over the k rows
    "q_aa_calibration" ->
      """WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS y
        |  FROM events GROUP BY user_id),
        |e AS (SELECT id, y, k FROM pu CROSS JOIN range(1, 51) AS t(k)),
        |a AS (SELECT k,
        |    CAST(('0x' || substr(md5(id || '#' || CAST(k AS VARCHAR)),
        |      1, 15)) AS UBIGINT) % 2 AS arm, y FROM e),
        |g AS (SELECT k,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM a GROUP BY k),
        |z AS (SELECT *,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |      THEN abs((pa - pb) / se) > 1.96 END AS sig
        |  FROM (SELECT *,
        |      CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |      CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb,
        |      sqrt((CAST(s_a + s_b AS DOUBLE) /
        |          nullif(CAST(n_a + n_b AS DOUBLE), 0.0)) *
        |        (1.0 - CAST(s_a + s_b AS DOUBLE) /
        |          nullif(CAST(n_a + n_b AS DOUBLE), 0.0)) *
        |        (1.0 / nullif(CAST(n_a AS DOUBLE), 0.0) +
        |         1.0 / nullif(CAST(n_b AS DOUBLE), 0.0))) AS se
        |    FROM g))
        |SELECT CAST(count(*) AS BIGINT) AS n_experiments,
        |  CAST(sum(CASE WHEN sig THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_significant,
        |  CAST(sum(CASE WHEN sig IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_degenerate,
        |  round(CAST(sum(CASE WHEN sig THEN 1 ELSE 0 END) AS DOUBLE) /
        |    nullif(CAST(count(*) - sum(CASE WHEN sig IS NULL THEN 1
        |      ELSE 0 END) AS DOUBLE), 0.0), 6) AS false_positive_rate
        |FROM z""".stripMargin,

    // relative-lift truth: same heavy-buyer fold, the ratio delta-method
    // variance in the operator's fixed double order
    "q_relative_lift" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1
        |      ELSE 0 END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1
        |      ELSE 0 END) AS BIGINT) AS s_b
        |  FROM pu),
        |d AS (SELECT *,
        |    CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) AS pa,
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0) AS pb
        |  FROM t),
        |v AS (SELECT *,
        |    pa / pb - 1.0 AS lift,
        |    sqrt(pa * (1.0 - pa) / CAST(n_a AS DOUBLE) / (pb * pb) +
        |      pa * pa * (pb * (1.0 - pb) / CAST(n_b AS DOUBLE)) /
        |      (pb * pb * pb * pb)) AS se
        |  FROM d)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  CASE WHEN s_b > 0 THEN round(lift, 6) END AS lift,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND s_b > 0 AND se > 0
        |    THEN round(lift - 1.959964 * se, 6) END AS ci_low,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND s_b > 0 AND se > 0
        |    THEN round(lift + 1.959964 * se, 6) END AS ci_high
        |FROM v""".stripMargin,

    // z-test truth: exact per-user heavy-buyer counts (>= 14 purchases),
    // the pooled-SE expression in the operator's fixed order, flag on
    // the unrounded z
    "q_ab_proportions" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS s_a,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN user_id % 2 <> 0 AND conv = 1 THEN 1 ELSE 0
        |      END) AS BIGINT) AS s_b
        |  FROM pu)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
        |  round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN round((pa - pb) / se, 6) END AS z,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
        |    THEN abs((pa - pb) / se) > 1.96 END AS significant_5pct
        |FROM (SELECT *,
        |    CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
        |    sqrt((CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 - CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |      (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))) AS se
        |  FROM t)""".stripMargin,

    // CUPED truth: exact decimal moment sums (one per-user fold, then
    // one moment fold); θ/ρ²/deltas recomputed in the operator's fixed
    // double order
    "q_cuped" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS x,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |m AS (SELECT count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    -- one operand widened to DECIMAL(19,6): DuckDB's DECIMAL(18)
        |    -- pair multiply runs on int64 mantissas and overflows; width
        |    -- 19 forces the int128 path (exact value unchanged)
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * y AS DECIMAL(38,12))) AS sxy,
        |    sum(CAST(CAST(x AS DECIMAL(19,6)) * x AS DECIMAL(38,12))) AS sxx,
        |    sum(CAST(CAST(y AS DECIMAL(19,6)) * y AS DECIMAL(38,12))) AS syy,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    sum(CASE WHEN arm = 'A' THEN y END) AS sy_a,
        |    sum(CASE WHEN arm = 'A' THEN x END) AS sx_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN arm = 'B' THEN y END) AS sy_b,
        |    sum(CASE WHEN arm = 'B' THEN x END) AS sx_b
        |  FROM pu WHERE x IS NOT NULL AND y IS NOT NULL),
        |d AS (SELECT CAST(n AS BIGINT) AS n, n_a, n_b,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
        |      CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn,
        |    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ya,
        |    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS yb,
        |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS xa,
        |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS xb
        |  FROM m)
        |SELECT n, n_a, n_b, round(ya - yb, 6) AS delta_raw,
        |  CASE WHEN varxn > 0 THEN round(
        |    (ya - yb) - (covn / varxn) * (xa - xb), 6) END AS delta_adjusted,
        |  CASE WHEN varxn > 0 THEN round(covn / varxn, 6) END AS theta,
        |  CASE WHEN varxn > 0 AND varyn > 0 THEN round(
        |    covn * covn / (varxn * varyn), 6) END AS rho2
        |FROM d""".stripMargin,

    // delta-method truth: same exact decimal moment fold (DECIMAL(19,6)
    // widening for the int128 multiply path), variance and CI in the
    // operator's fixed double order
    "q_ratio_ci" ->
      """WITH pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS den,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS num
        |  FROM events GROUP BY user_id),
        |m AS (SELECT count(*) AS n, sum(num) AS sn, sum(den) AS sd,
        |    sum(CAST(CAST(num AS DECIMAL(19,6)) * num AS DECIMAL(38,12)))
        |      AS snn,
        |    sum(CAST(CAST(num AS DECIMAL(19,6)) * den AS DECIMAL(38,12)))
        |      AS snd,
        |    sum(CAST(CAST(den AS DECIMAL(19,6)) * den AS DECIMAL(38,12)))
        |      AS sdd
        |  FROM pu WHERE num IS NOT NULL AND den IS NOT NULL),
        |d AS (SELECT CAST(n AS BIGINT) AS n, sd,
        |    CAST(sn AS DOUBLE) AS snd_, CAST(sd AS DOUBLE) AS sdd_,
        |    CAST(sn AS DOUBLE) / nullif(CAST(sd AS DOUBLE), 0.0) AS ratio,
        |    (CAST(snn AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cnn,
        |    (CAST(snd AS DOUBLE) - CAST(sn AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cnd,
        |    (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cdd,
        |    CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS dbar,
        |    CAST(n AS DOUBLE) AS nd FROM m),
        |v AS (SELECT *,
        |    (cnn - 2.0 * ratio * cnd + ratio * ratio * cdd) /
        |      (nd * dbar * dbar) AS varr FROM d)
        |SELECT n, round(snd_, 6) AS num_sum, round(sdd_, 6) AS den_sum,
        |  CASE WHEN sd <> 0 THEN round(ratio, 6) END AS ratio,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(sqrt(varr), 6) END AS se,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(ratio - 1.959964 * sqrt(varr), 6) END AS ci_low,
        |  CASE WHEN n >= 2 AND sd <> 0 AND varr >= 0
        |    THEN round(ratio + 1.959964 * sqrt(varr), 6) END AS ci_high
        |FROM v""".stripMargin,

    // jackknife truth: same 20-bucket assignment, 9 dp decimal
    // replicates, exact decimal replicate mean, 12 dp deviation fold
    "q_jackknife_ci" ->
      """WITH pu AS (SELECT user_id, user_id % 20 AS bucket,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DECIMAL(18,6)) AS den,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,6)) AS num
        |  FROM events GROUP BY user_id),
        |pb AS (SELECT bucket, sum(num) AS nx, sum(den) AS ny,
        |    count(*) AS c FROM pu
        |  WHERE num IS NOT NULL AND den IS NOT NULL GROUP BY 1),
        |st AS (SELECT *, sum(nx) OVER () AS tx, sum(ny) OVER () AS ty,
        |    count(*) OVER () AS nb, sum(c) OVER () AS n FROM pb),
        |lo AS (SELECT *, CAST(round(CAST(tx - nx AS DOUBLE) /
        |    nullif(CAST(ty - ny AS DOUBLE), 0.0), 9) AS DECIMAL(28,9))
        |    AS loo FROM st),
        |mn AS (SELECT *, CAST(sum(loo) OVER () AS DOUBLE) /
        |    CAST(nb AS DOUBLE) AS mean_loo FROM lo),
        |f AS (SELECT max(nb) AS buckets, CAST(max(n) AS BIGINT) AS n,
        |    max(tx) AS sx, max(ty) AS sy,
        |    sum(CAST(round((CAST(loo AS DOUBLE) - mean_loo) *
        |      (CAST(loo AS DOUBLE) - mean_loo), 12) AS DECIMAL(38,12)))
        |      AS ss,
        |    sum(CASE WHEN loo IS NULL THEN 1 ELSE 0 END) AS badloo
        |  FROM mn),
        |g AS (SELECT *,
        |    CAST(sx AS DOUBLE) / nullif(CAST(sy AS DOUBLE), 0.0) AS ratio,
        |    sqrt(1.0 - 1.0 / CAST(buckets AS DOUBLE)) *
        |      sqrt(CAST(ss AS DOUBLE)) AS se FROM f)
        |SELECT CAST(buckets AS INT) AS buckets, n,
        |  CASE WHEN sy <> 0 THEN round(ratio, 6) END AS ratio,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(se, 6) END AS se_jack,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(ratio - 1.959964 * se, 6) END AS ci_low,
        |  CASE WHEN buckets >= 2 AND sy <> 0 AND badloo = 0
        |    THEN round(ratio + 1.959964 * se, 6) END AS ci_high
        |FROM g""".stripMargin,

    // McNemar truth: exact discordant cells, continuity-corrected chi2
    // in the operator's fixed order, df=1 5% critical value 3.841459
    "q_mcnemar" ->
      """WITH pu AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS clicks
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN conv = 1 AND clicks >= 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS both_pass,
        |    CAST(sum(CASE WHEN conv = 1 AND clicks < 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS a_only,
        |    CAST(sum(CASE WHEN conv <> 1 AND clicks >= 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS b_only,
        |    CAST(sum(CASE WHEN conv <> 1 AND clicks < 10 THEN 1 ELSE 0
        |      END) AS BIGINT) AS neither
        |  FROM pu),
        |c AS (SELECT *,
        |    (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE)) - 1.0) *
        |    (abs(CAST(a_only AS DOUBLE) - CAST(b_only AS DOUBLE)) - 1.0) /
        |    nullif(CAST(a_only AS DOUBLE) + CAST(b_only AS DOUBLE), 0.0)
        |      AS chi2 FROM t)
        |SELECT n, both_pass, a_only, b_only, neither,
        |  CASE WHEN a_only + b_only > 0 THEN round(chi2, 6) END AS chi2_cc,
        |  CASE WHEN a_only + b_only > 0 THEN chi2 > 3.841459 END
        |    AS significant_5pct
        |FROM c""".stripMargin,

    // MDE truth: per-segment unit counts from the same left join, the
    // pinned z constants summed as doubles exactly like the operator
    "q_mde" ->
      """WITH o AS (SELECT o_custkey AS c_custkey, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |u AS (SELECT CAST(c.c_mktsegment AS VARCHAR) AS segment,
        |    CASE WHEN o.n_orders >= 1 THEN 1 ELSE 0 END AS s
        |  FROM customer c LEFT JOIN o USING (c_custkey)),
        |g AS (SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s) AS BIGINT) AS successes FROM u GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(successes AS DOUBLE) / CAST(n AS DOUBLE) AS p_,
        |    (1.959964 + 0.841621) * sqrt(2.0 *
        |      (CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(successes AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) / 2.0)) AS mde FROM g)
        |SELECT segment, n, successes, round(p_, 6) AS p,
        |  CASE WHEN successes > 0 AND successes < n
        |    THEN round(mde, 6) END AS mde_abs,
        |  CASE WHEN successes > 0 AND successes < n
        |    THEN round(mde / p_, 6) END AS mde_rel
        |FROM d ORDER BY segment""".stripMargin,

    // DiD truth: eight exact conditional decimal sums over purchase
    // events, the four cell means and the difference in the operator's
    // fixed double order; mid-month split day 19738 = 2024-01-16
    "q_did" ->
      """WITH p AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(value AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    sum(CASE WHEN arm = 'A' AND t < 19738 AND v IS NOT NULL
        |      THEN v END) AS s_a_pre,
        |    CAST(sum(CASE WHEN arm = 'A' AND t < 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
        |    sum(CASE WHEN arm = 'A' AND t >= 19738 AND v IS NOT NULL
        |      THEN v END) AS s_a_post,
        |    CAST(sum(CASE WHEN arm = 'A' AND t >= 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
        |    sum(CASE WHEN arm = 'B' AND t < 19738 AND v IS NOT NULL
        |      THEN v END) AS s_b_pre,
        |    CAST(sum(CASE WHEN arm = 'B' AND t < 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
        |    sum(CASE WHEN arm = 'B' AND t >= 19738 AND v IS NOT NULL
        |      THEN v END) AS s_b_post,
        |    CAST(sum(CASE WHEN arm = 'B' AND t >= 19738 AND v IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post
        |  FROM p),
        |m AS (SELECT *,
        |    CAST(s_a_pre AS DOUBLE) / nullif(CAST(n_a_pre AS DOUBLE), 0.0)
        |      AS ma_pre,
        |    CAST(s_a_post AS DOUBLE) / nullif(CAST(n_a_post AS DOUBLE), 0.0)
        |      AS ma_post,
        |    CAST(s_b_pre AS DOUBLE) / nullif(CAST(n_b_pre AS DOUBLE), 0.0)
        |      AS mb_pre,
        |    CAST(s_b_post AS DOUBLE) / nullif(CAST(n_b_post AS DOUBLE), 0.0)
        |      AS mb_post FROM a)
        |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  round(ma_pre, 6) AS mean_a_pre, round(ma_post, 6) AS mean_a_post,
        |  round(mb_pre, 6) AS mean_b_pre, round(mb_post, 6) AS mean_b_post,
        |  CASE WHEN n_a_pre > 0 AND n_a_post > 0 AND n_b_pre > 0
        |      AND n_b_post > 0
        |    THEN round((ma_post - ma_pre) - (mb_post - mb_pre), 6) END
        |    AS did
        |FROM m""".stripMargin,

    // topic truth: same token-boundary join against the VALUES keyword
    // table, same dominance tie-break (hits DESC, topic ASC)
    "q_topic_tags" ->
      """WITH kw AS (SELECT * FROM (VALUES
        |    ('query_exec', 'scan'), ('query_exec', 'filter'),
        |    ('query_exec', 'join'), ('query_exec', 'agg'),
        |    ('query_exec', 'group'),
        |    ('storage', 'table'), ('storage', 'row'),
        |    ('storage', 'column'), ('storage', 'part'),
        |    ('storage', 'hash'),
        |    ('streaming', 'window'), ('streaming', 'batch'),
        |    ('streaming', 'order'), ('streaming', 'merge'))
        |  AS t(topic, tok)),
        |tk AS (SELECT doc_id,
        |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, topic, CAST(count(*) AS BIGINT) AS hits
        |  FROM tk JOIN kw USING (tok) GROUP BY 1, 2),
        |w AS (SELECT *,
        |    round(CAST(hits AS DOUBLE) /
        |      CAST(sum(hits) OVER (PARTITION BY doc_id) AS DOUBLE), 6)
        |      AS share,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY hits DESC, topic) = 1 AS is_dominant
        |  FROM h)
        |SELECT doc_id, topic, hits, share, is_dominant
        |FROM w ORDER BY doc_id, topic""".stripMargin,

    // fertility truth: the repo's two token counters as SQL fragments,
    // exact integer sums, fixed-order ratio rounding
    "q_token_fertility" ->
      """SELECT CAST(lang AS VARCHAR) AS lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '),
        |    x -> x <> ''))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(lower(text),
        |    '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
        |  round(CAST(sum(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS DOUBLE) /
        |    nullif(CAST(sum(len(list_filter(string_split(text, ' '),
        |      x -> x <> ''))) AS DOUBLE), 0.0), 6) AS fertility,
        |  round(CAST(sum(length(text)) AS DOUBLE) /
        |    nullif(CAST(sum(len(regexp_extract_all(lower(text),
        |      '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS DOUBLE), 0.0), 6)
        |    AS chars_per_token
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // always-valid truth: same daily fold, cumulative windows, the
    // mSPRT llr in the operator's fixed order rounded 9 dp before the
    // running max, p rounded 6 dp (tau = 0.1 -> tau^2 = 0.010000000000000002
    // as the same double product both sides compute)
    "q_always_valid" ->
      """WITH ev AS (SELECT
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events WHERE ts IS NOT NULL),
        |d AS (SELECT CAST(day AS BIGINT) AS day,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS sa,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS sb
        |  FROM ev GROUP BY 1),
        |c AS (SELECT day,
        |    CAST(sum(na) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(sa) OVER w AS BIGINT) AS s_a,
        |    CAST(sum(nb) OVER w AS BIGINT) AS n_b,
        |    CAST(sum(sb) OVER w AS BIGINT) AS s_b
        |  FROM d WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |l AS (SELECT *,
        |    CASE WHEN n_a > 0 AND n_b > 0 AND s_a + s_b > 0
        |        AND s_a + s_b < n_a + n_b
        |      THEN round(0.5 * ln(vt / (vt + t2)) +
        |        dlt * dlt * t2 / (2.0 * vt * (vt + t2)), 9) END AS llr,
        |    dlt, n_ok
        |  FROM (SELECT *,
        |      CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
        |        CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dlt,
        |      (CAST(s_a + s_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |        (1.0 - CAST(s_a + s_b AS DOUBLE) /
        |          CAST(n_a + n_b AS DOUBLE)) *
        |        (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))
        |        AS vt,
        |      0.1 * 0.1 AS t2,
        |      (n_a > 0 AND n_b > 0) AS n_ok
        |    FROM c)),
        |m AS (SELECT *, max(llr) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM l)
        |SELECT day, n_a, s_a, n_b, s_b,
        |  CASE WHEN n_ok THEN round(dlt, 6) END AS delta, llr,
        |  CASE WHEN runmax IS NOT NULL
        |    THEN round(exp(-greatest(runmax, 0.0)), 6) ELSE 1.0 END
        |    AS always_valid_p
        |FROM m ORDER BY day""".stripMargin,

    // winsorized truth: pooled p95 cap rounded 6 dp, capped values
    // quantized to DECIMAL(18,6) before the exact arm sums
    "q_winsorized_effect" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y
        |  FROM events GROUP BY user_id),
        |cp AS (SELECT round(quantile_cont(y, 0.95), 6) AS cap FROM pu),
        |j AS (SELECT arm, y, cap,
        |    CAST(least(y, cap) AS DECIMAL(18,6)) AS w,
        |    CAST(y AS DECIMAL(18,6)) AS raw FROM pu, cp),
        |a AS (SELECT max(cap) AS cap,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    sum(CASE WHEN arm = 'A' THEN w END) AS swa,
        |    sum(CASE WHEN arm = 'A' THEN raw END) AS sra,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN arm = 'B' THEN w END) AS swb,
        |    sum(CASE WHEN arm = 'B' THEN raw END) AS srb,
        |    CAST(sum(CASE WHEN y > cap THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_capped
        |  FROM j)
        |SELECT cap, n_a, n_b, n_capped,
        |  round(CAST(swa AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0), 6)
        |    AS mean_a_w,
        |  round(CAST(swb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS mean_b_w,
        |  round(CAST(swa AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(swb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS delta_winsorized,
        |  round(CAST(sra AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(srb AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS delta_raw
        |FROM a""".stripMargin,

    // uplift truth: pooled quintile edges from quantile_cont, ties to
    // the LOWER bucket (score > edge), Qini walk down the ranking
    "q_uplift" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS DOUBLE) AS x,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY user_id),
        |e AS (SELECT quantile_cont(x, 0.2) AS e1, quantile_cont(x, 0.4)
        |    AS e2, quantile_cont(x, 0.6) AS e3, quantile_cont(x, 0.8)
        |    AS e4 FROM pu),
        |b AS (SELECT arm, conv,
        |    (CASE WHEN x > e1 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e2 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e3 THEN 1 ELSE 0 END +
        |     CASE WHEN x > e4 THEN 1 ELSE 0 END) AS bucket
        |  FROM pu, e),
        |g AS (SELECT bucket,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM b GROUP BY 1),
        |c AS (SELECT *,
        |    sum(n_a) OVER (ORDER BY bucket DESC) AS cna,
        |    sum(s_a) OVER (ORDER BY bucket DESC) AS csa,
        |    sum(n_b) OVER (ORDER BY bucket DESC) AS cnb,
        |    sum(s_b) OVER (ORDER BY bucket DESC) AS csb
        |  FROM g)
        |SELECT bucket, n_a, s_a, n_b, s_b,
        |  round(CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0), 6)
        |    AS p_a,
        |  round(CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS p_b,
        |  round(CAST(s_a AS DOUBLE) / nullif(CAST(n_a AS DOUBLE), 0.0) -
        |    CAST(s_b AS DOUBLE) / nullif(CAST(n_b AS DOUBLE), 0.0), 6)
        |    AS uplift,
        |  round(CAST(csa AS DOUBLE) - CAST(csb AS DOUBLE) *
        |    (CAST(cna AS DOUBLE) / nullif(CAST(cnb AS DOUBLE), 0.0)), 6)
        |    AS qini
        |FROM c ORDER BY bucket DESC""".stripMargin,

    // QTE truth: quantile_cont matches Spark's interpolated percentile;
    // per-side 6 dp rounding before the delta, exactly like the operator
    "q_qte" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS y
        |  FROM events GROUP BY user_id),
        |a AS (SELECT
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.50), 6)
        |      AS a0,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.50), 6)
        |      AS b0,
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.90), 6)
        |      AS a1,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.90), 6)
        |      AS b1,
        |    round(quantile_cont(CASE WHEN arm = 'A' THEN y END, 0.99), 6)
        |      AS a2,
        |    round(quantile_cont(CASE WHEN arm = 'B' THEN y END, 0.99), 6)
        |      AS b2
        |  FROM pu)
        |SELECT CAST(0.5 AS DOUBLE) AS q, a0 AS p_a, b0 AS p_b,
        |    round(a0 - b0, 6) AS qte FROM a
        |UNION ALL SELECT CAST(0.9 AS DOUBLE), a1, b1,
        |    round(a1 - b1, 6) FROM a
        |UNION ALL SELECT CAST(0.99 AS DOUBLE), a2, b2,
        |    round(a2 - b2, 6) FROM a""".stripMargin,

    // post-stratification truth: same signup-week strata, 9 dp decimal
    // per-stratum terms, exact decimal weighted fold
    "q_post_strat" ->
      """WITH pu AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS first_day,
        |    CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0)
        |      AS DECIMAL(18,2)) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (SELECT CAST(floor((first_day - 19723) / 7.0) AS BIGINT) AS s_,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    sum(CASE WHEN arm = 'A' THEN CAST(y AS DECIMAL(18,6)) END)
        |      AS sa,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    sum(CASE WHEN arm = 'B' THEN CAST(y AS DECIMAL(18,6)) END)
        |      AS sb
        |  FROM pu GROUP BY 1),
        |w AS (SELECT *, sum(CASE WHEN na > 0 AND nb > 0 THEN na + nb
        |    ELSE 0 END) OVER () AS nu FROM g),
        |t AS (SELECT *, CASE WHEN na > 0 AND nb > 0 THEN CAST(round(
        |    (CAST(na + nb AS DOUBLE) / CAST(nu AS DOUBLE)) *
        |    (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
        |     CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)), 9)
        |    AS DECIMAL(28,9)) END AS term FROM w)
        |SELECT CAST(sum(na + nb) AS BIGINT) AS n,
        |  CAST(count(*) AS INT) AS strata_total,
        |  CAST(sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) AS INT)
        |    AS strata_used,
        |  round(CAST(sum(sa) AS DOUBLE) /
        |      nullif(CAST(sum(na) AS DOUBLE), 0.0) -
        |    CAST(sum(sb) AS DOUBLE) /
        |      nullif(CAST(sum(nb) AS DOUBLE), 0.0), 6) AS delta_raw,
        |  CASE WHEN sum(CASE WHEN na > 0 AND nb > 0 THEN 1 ELSE 0 END) > 0
        |    THEN round(CAST(sum(term) AS DOUBLE), 6) END
        |    AS delta_post_strat
        |FROM t""".stripMargin,

    // Holt truth: a recursive CTE replays the 9 dp-per-step recursion
    // exactly; the smoothing constants enter as CAST(x AS DOUBLE) so
    // both engines perform the identical IEEE (1.0 - alpha) subtraction
    "q_holt" ->
      """WITH RECURSIVE d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT CAST(t AS BIGINT) AS t, v,
        |    row_number() OVER (ORDER BY t) AS k FROM d),
        |rec AS (
        |  SELECT s1.k AS k, s1.t AS t, s1.v AS v,
        |      round(s1.v, 9) AS level,
        |      round(s2.v - s1.v, 9) AS trend,
        |      CAST(NULL AS DOUBLE) AS fitted,
        |      CAST(NULL AS DOUBLE) AS residual
        |    FROM s s1, s s2 WHERE s1.k = 1 AND s2.k = 2
        |  UNION ALL
        |  SELECT nx.k, nx.t, nx.v,
        |      round(CAST(0.3 AS DOUBLE) * nx.v +
        |        (1.0 - CAST(0.3 AS DOUBLE)) * (rec.level + rec.trend), 9),
        |      round(CAST(0.1 AS DOUBLE) *
        |        (round(CAST(0.3 AS DOUBLE) * nx.v +
        |          (1.0 - CAST(0.3 AS DOUBLE)) * (rec.level + rec.trend), 9)
        |         - rec.level) +
        |        (1.0 - CAST(0.1 AS DOUBLE)) * rec.trend, 9),
        |      round(rec.level + rec.trend, 9),
        |      round(nx.v - round(rec.level + rec.trend, 9), 6)
        |    FROM rec JOIN s nx ON nx.k = rec.k + 1)
        |SELECT t, v AS value, level, trend, fitted, residual
        |FROM rec ORDER BY t""".stripMargin,

    // changepoint truth: exact decimal prefix sums over the bounded
    // daily table, rounded statistic, ORDER BY stat DESC, k ASC picks
    // the same row the operator does
    "q_changepoint" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    sum(CAST(value AS DECIMAL(18,2))) AS rev
        |  FROM events WHERE event_type = 'purchase'
        |    AND value IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT CAST(t AS BIGINT) AS t,
        |    CAST(rev AS DECIMAL(18,6)) AS v FROM d),
        |w AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT)
        |      AS k,
        |    sum(v) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS sk,
        |    CAST(count(*) OVER () AS BIGINT) AS n, sum(v) OVER () AS sn
        |  FROM s),
        |c AS (SELECT *, round(abs(CAST(sk AS DOUBLE) -
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sn AS DOUBLE)),
        |    6) AS stat FROM w WHERE k < n)
        |SELECT n, k, t AS t_split, stat,
        |  round(CAST(sk AS DOUBLE) / CAST(k AS DOUBLE), 6) AS mean_before,
        |  round((CAST(sn AS DOUBLE) - CAST(sk AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)), 6) AS mean_after
        |FROM c ORDER BY stat DESC, k LIMIT 1""".stripMargin,

    // bootstrap truth: identical seeded integer-threshold Poisson draws
    // (the CASE thresholds are generated from the same constants the
    // kernel uses), exact HUGEINT replicate sums, the same inverted-CDF
    // rank picks evaluated with the same double expressions
    // delta-bootstrap truth: identical per-(unit, replicate) seeded
    // draws; a unit's weight feeds whichever arm owns it; replicates
    // missing an arm are dropped from the CDF exactly like the operator
    "q_bootstrap_delta" -> {
      s"""WITH pu AS (SELECT CAST(user_id AS VARCHAR) AS id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CAST(TRY_CAST(COALESCE(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END), 0) AS DECIMAL(9,2))
        |      * 100 AS BIGINT) AS u
        |  FROM events GROUP BY user_id),
        |sd AS (SELECT CAST(('0x' || substr(md5(id), 1, 15)) AS UBIGINT)
        |    AS seed, arm, u FROM pu WHERE u IS NOT NULL),
        |e AS (SELECT seed, arm, u, r FROM sd
        |  CROSS JOIN range(1, 201) AS t(r)),
        |${Stats.BootstrapThresholds.drawSqlCtes("e", Seq("arm", "u"), "seed")},
        |w AS (SELECT arm, u, r,
        |    ${Stats.BootstrapThresholds.sqlCase("x")} AS w FROM dx5),
        |m AS (SELECT r,
        |    SUM(CASE WHEN arm = 'A' THEN CAST(w AS HUGEINT) * u
        |      ELSE 0 END) AS swxa,
        |    SUM(CASE WHEN arm = 'A' THEN CAST(w AS HUGEINT)
        |      ELSE 0 END) AS swa,
        |    SUM(CASE WHEN arm = 'B' THEN CAST(w AS HUGEINT) * u
        |      ELSE 0 END) AS swxb,
        |    SUM(CASE WHEN arm = 'B' THEN CAST(w AS HUGEINT)
        |      ELSE 0 END) AS swb
        |  FROM w GROUP BY r),
        |d AS (SELECT round(CAST(swxa AS DOUBLE)
        |      / (CAST(swa AS DOUBLE) * 100.0)
        |    - CAST(swxb AS DOUBLE) / (CAST(swb AS DOUBLE) * 100.0), 6)
        |    AS m FROM m WHERE swa > 0 AND swb > 0),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rk,
        |    COUNT(*) OVER () AS rc FROM d),
        |ci AS (SELECT
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - 0.95) / 2 * rc)
        |      AS BIGINT), 1) THEN m END) AS lo,
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - (1.0 - 0.95) / 2)
        |      * rc) AS BIGINT), 1) THEN m END) AS hi,
        |    CAST(MAX(rc) AS BIGINT) AS n_replicates FROM ranked),
        |base AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    round(CAST(SUM(CASE WHEN arm = 'A' THEN u ELSE 0 END)
        |        AS DOUBLE)
        |      / (CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
        |        AS DOUBLE) * 100.0)
        |    - CAST(SUM(CASE WHEN arm = 'B' THEN u ELSE 0 END) AS DOUBLE)
        |      / (CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
        |        AS DOUBLE) * 100.0), 6) AS delta
        |  FROM pu WHERE u IS NOT NULL)
        |SELECT n_a, n_b, delta, lo, hi, n_replicates FROM base, ci""".stripMargin
    },

    "q_bootstrap_ci" -> {
      s"""WITH v AS (SELECT CAST(event_id AS VARCHAR) AS id,
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS u
        |  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'),
        |sd AS (SELECT CAST(('0x' || substr(md5(id), 1, 15)) AS UBIGINT)
        |    AS seed, u FROM v),
        |e AS (SELECT seed, u, r FROM sd CROSS JOIN range(1, 101) AS t(r)),
        |${Stats.BootstrapThresholds.drawSqlCtes("e", Seq("u"), "seed")},
        |w AS (SELECT u, r, ${Stats.BootstrapThresholds.sqlCase("x")} AS w
        |  FROM dx5),
        |m AS (SELECT r, SUM(CAST(w AS HUGEINT) * u) AS swx,
        |    SUM(CAST(w AS HUGEINT)) AS sw FROM w GROUP BY r),
        |means AS (SELECT round(CAST(swx AS DOUBLE)
        |    / (CAST(sw AS DOUBLE) * 100.0), 6) AS m FROM m WHERE sw > 0),
        |ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rk,
        |    COUNT(*) OVER () AS rc FROM means),
        |ci AS (SELECT
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - 0.95) / 2 * rc)
        |      AS BIGINT), 1) THEN m END) AS lo,
        |    MIN(CASE WHEN rk = greatest(CAST(ceil((1.0 - (1.0 - 0.95) / 2)
        |      * rc) AS BIGINT), 1) THEN m END) AS hi,
        |    CAST(MAX(rc) AS BIGINT) AS n_replicates FROM ranked),
        |base AS (SELECT COUNT(*) AS n, round(CAST(SUM(u) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE) * 100.0), 6) AS mean FROM v)
        |SELECT CAST(n AS BIGINT) AS n, mean, lo, hi, n_replicates
        |FROM base, ci""".stripMargin
    },

    // PSI truth: same integer-exact decile edges from the reference's
    // distinct-value CDF, bin = count of edges strictly below, shares
    // rounded, epsilon-clamped term, decimal-summed total
    "q_psi" ->
      """WITH refv AS (SELECT CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)
        |    AS u FROM events WHERE event_type = 'click' AND value IS NOT NULL),
        |curv AS (SELECT CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)
        |    AS u FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |c AS (SELECT u, COUNT(*) AS n FROM refv GROUP BY 1),
        |w AS (SELECT u, SUM(n) OVER (ORDER BY u) AS cum, SUM(n) OVER () AS tot
        |  FROM c),
        |ed AS (SELECT DISTINCT e FROM (
        |  SELECT k, MIN(CASE WHEN cum * 10 >= tot * k THEN u END) AS e
        |  FROM w CROSS JOIN range(1, 10) AS r(k) GROUP BY k)),
        |rb AS (SELECT (SELECT COUNT(*) FROM ed WHERE e < u) AS bin,
        |    COUNT(*) AS ref_n FROM refv GROUP BY 1),
        |cb AS (SELECT (SELECT COUNT(*) FROM ed WHERE e < u) AS bin,
        |    COUNT(*) AS cur_n FROM curv GROUP BY 1),
        |j AS (SELECT COALESCE(rb.bin, cb.bin) AS bin,
        |    COALESCE(ref_n, 0) AS ref_n, COALESCE(cur_n, 0) AS cur_n
        |  FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin),
        |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM j),
        |sc AS (SELECT bin, ref_n, cur_n,
        |    round(CAST(ref_n AS DOUBLE) / rt, 6) AS ref_share,
        |    round(CAST(cur_n AS DOUBLE) / ct, 6) AS cur_share FROM j, t),
        |s2 AS (SELECT *, round((greatest(cur_share, 0.000001)
        |      - greatest(ref_share, 0.000001))
        |    * ln(greatest(cur_share, 0.000001)
        |      / greatest(ref_share, 0.000001)), 6) AS term FROM sc),
        |p AS (SELECT CAST(SUM(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi
        |  FROM s2)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(ref_n AS BIGINT) AS ref_n,
        |  CAST(cur_n AS BIGINT) AS cur_n, ref_share, cur_share, term, psi
        |FROM s2, p ORDER BY bin""".stripMargin,

    // kendall truth: identical cell table, HUGEINT pair masses, integer
    // margin tie terms (t(t-1) is even, so // 2 is exact), one double
    "q_kendall" ->
      """WITH u AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(9,2)) * 100 AS BIGINT) AS a,
        |    CAST(CAST(l_discount AS DECIMAL(9,2)) * 100 AS BIGINT) AS b
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
        |cells AS (SELECT a, b, COUNT(*) AS c FROM u GROUP BY 1, 2),
        |pq AS (SELECT
        |    COALESCE(SUM(CASE WHEN r.b > l.b
        |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS p,
        |    COALESCE(SUM(CASE WHEN r.b < l.b
        |      THEN CAST(l.c AS HUGEINT) * r.c END), 0) AS q
        |  FROM cells l JOIN cells r ON r.a > l.a),
        |ma AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n1
        |  FROM (SELECT SUM(c) AS t FROM cells GROUP BY a)),
        |mb AS (SELECT SUM(CAST(t AS HUGEINT) * (t - 1) // 2) AS n2
        |  FROM (SELECT SUM(c) AS t FROM cells GROUP BY b)),
        |nn AS (SELECT SUM(c) AS n FROM cells),
        |f AS (SELECT CAST(n AS BIGINT) AS n, CAST(p AS BIGINT) AS concordant,
        |    CAST(q AS BIGINT) AS discordant,
        |    CAST(n AS HUGEINT) * (n - 1) // 2 AS n0, p, q, n1, n2
        |  FROM pq, ma, mb, nn)
        |SELECT n, concordant, discordant,
        |  CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0 THEN
        |    round(CAST(p - q AS DOUBLE) / (sqrt(CAST(n0 - n1 AS DOUBLE))
        |      * sqrt(CAST(n0 - n2 AS DOUBLE))), 6) END AS tau_b
        |FROM f""".stripMargin,

    "q_spearman" ->
      """WITH r AS (SELECT CAST(value AS DECIMAL(9,2)) AS a,
        |    CAST(user_id AS DECIMAL(9,2)) AS b FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL),
        |ca AS (SELECT a, COUNT(*) AS cnt FROM r GROUP BY a),
        |ra AS (SELECT a,
        |    2 * (SUM(cnt) OVER (ORDER BY a) - cnt) + cnt + 1 AS rx FROM ca),
        |cb AS (SELECT b, COUNT(*) AS cnt FROM r GROUP BY b),
        |rb AS (SELECT b,
        |    2 * (SUM(cnt) OVER (ORDER BY b) - cnt) + cnt + 1 AS ry FROM cb),
        |j AS (SELECT rx, ry FROM r JOIN ra USING (a) JOIN rb USING (b)),
        |s AS (SELECT COUNT(*) AS n,
        |    SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
        |    SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
        |    SUM(CAST(ry AS HUGEINT) * ry) AS syy,
        |    SUM(CAST(rx AS HUGEINT) * ry) AS sxy FROM j)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
        |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END AS rho
        |FROM s""".stripMargin,

    "q_mann_whitney" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT c1, c2,
        |    SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS bef FROM c),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * bef + (c1 + c2) + 1)) AS two_r1,
        |    SUM(CAST(c1 + c2 AS HUGEINT) * (c1 + c2) * (c1 + c2)
        |      - (c1 + c2)) AS ties,
        |    CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM w),
        |u AS (SELECT n1, n2, n1 + n2 AS n, ties,
        |    CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0 AS u1
        |  FROM a),
        |s AS (SELECT *,
        |    CAST(n1 AS DOUBLE) * n2 / 12.0 * ((n + 1)
        |      - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))) AS sigma2
        |  FROM u)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2,
        |  round(u1, 6) AS u1,
        |  round(CAST(n1 AS DOUBLE) * n2 - u1, 6) AS u2,
        |  CASE WHEN sigma2 > 0.0 THEN
        |    round((u1 - CAST(n1 AS DOUBLE) * n2 / 2.0) / sqrt(sigma2), 6)
        |  END AS z
        |FROM s""".stripMargin,

    // Cliff's delta truth: identical midrank fold to the U oracle;
    // delta's numerator stays HUGEINT-exact until the one division
    "q_cliffs_delta" ->
      """WITH c AS (SELECT CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT c1, c2,
        |    SUM(c1 + c2) OVER (ORDER BY v) - (c1 + c2) AS bef FROM c),
        |a AS (SELECT
        |    SUM(CAST(c1 AS HUGEINT) * (2 * bef + (c1 + c2) + 1)) AS two_r1,
        |    CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM w),
        |d AS (SELECT n1, n2,
        |    round(CAST(two_r1 - CAST(n1 AS HUGEINT) * (n1 + 1)
        |        - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * n2), 6) AS delta
        |  FROM a)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2, delta,
        |  CASE WHEN abs(delta) < CAST(0.147 AS DOUBLE) THEN 'negligible'
        |       WHEN abs(delta) < CAST(0.33 AS DOUBLE) THEN 'small'
        |       WHEN abs(delta) < CAST(0.474 AS DOUBLE) THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM d""".stripMargin,

    // Hodges–Lehmann truth: same integer value units (x100), pair mass
    // per distinct difference, two order statistics off one cumulative
    // window; middle ranks in exact integer arithmetic
    "q_hodges_lehmann" ->
      """WITH c AS (SELECT
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
        |d AS (SELECT a.v - b.v AS d,
        |    SUM(CAST(a.c1 AS HUGEINT) * b.c2) AS w
        |  FROM (SELECT v, c1 FROM c WHERE c1 > 0) a,
        |       (SELECT v, c2 FROM c WHERE c2 > 0) b
        |  GROUP BY 1),
        |cw AS (SELECT d, SUM(w) OVER (ORDER BY d) AS cw FROM d),
        |r AS (SELECT n1, n2, CAST(n1 AS HUGEINT) * n2 AS pairs FROM t),
        |m AS (SELECT r.n1, r.n2, r.pairs,
        |    (SELECT min(d) FROM cw WHERE cw >= (r.pairs + 1) // 2) AS d1,
        |    (SELECT min(d) FROM cw WHERE cw >= (r.pairs + 2) // 2) AS d2
        |  FROM r)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, n2,
        |  CAST(pairs AS BIGINT) AS n_pairs,
        |  round(CAST(d1 + d2 AS DOUBLE) / 2.0 / 100.0, 6) AS hl_shift
        |FROM m""".stripMargin,

    // log-rank truth: KM lifetime construction, at-risk windows,
    // per-time e1/v terms rounded at 6 dp into exact decimal sums,
    // fixed-order closing z/chi2
    "q_logrank" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS g1
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |mx AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN g1 ELSE 0 END) AS BIGINT)
        |      AS d1,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d,
        |    CAST(SUM(g1) AS BIGINT) AS m1,
        |    CAST(COUNT(*) AS BIGINT) AS m
        |  FROM u, mx GROUP BY 1),
        |r AS (SELECT *,
        |    SUM(m) OVER () - (SUM(m) OVER (ORDER BY t) - m) AS n_risk,
        |    SUM(m1) OVER () - (SUM(m1) OVER (ORDER BY t) - m1) AS n1_risk
        |  FROM lt),
        |tm AS (SELECT *,
        |    CASE WHEN d > 0 THEN CAST(round(
        |        CAST(CAST(d AS HUGEINT) * n1_risk AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS e1,
        |    CASE WHEN d > 0 AND n_risk > 1 THEN CAST(round(
        |        CAST(CAST(d AS HUGEINT) * n1_risk * (n_risk - n1_risk)
        |          * (n_risk - d) AS DOUBLE)
        |        / CAST(CAST(n_risk AS HUGEINT) * n_risk * (n_risk - 1)
        |          AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END AS v
        |  FROM r),
        |f AS (SELECT CAST(SUM(m1) AS BIGINT) AS users_1,
        |    CAST(SUM(m) - SUM(m1) AS BIGINT) AS users_0,
        |    CAST(SUM(d1) AS BIGINT) AS observed_1,
        |    SUM(e1) AS e1s, SUM(v) AS vs FROM tm)
        |SELECT users_1, users_0, observed_1,
        |  round(CAST(e1s AS DOUBLE), 6) AS expected_1,
        |  round(CAST(vs AS DOUBLE), 6) AS variance,
        |  CASE WHEN vs > 0 THEN round((CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) / sqrt(CAST(vs AS DOUBLE)), 6) END AS z,
        |  CASE WHEN vs > 0 THEN round((CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) * (CAST(observed_1 AS DOUBLE)
        |    - CAST(e1s AS DOUBLE)) / CAST(vs AS DOUBLE), 6) END AS chi2
        |FROM f""".stripMargin,

    // pass@k truth: falling factorials as order-free products of
    // integers < 2^53 (exact in doubles), per-k mean via exact decimal
    "q_pass_at_k" ->
      """WITH att AS (SELECT user_id AS problem,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c
        |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |  GROUP BY 1 HAVING count(*) <= 40),
        |pk AS (SELECT problem, n, c, k
        |  FROM att, (SELECT unnest([1, 3, 5]) AS k) ks WHERE k <= n),
        |f AS (SELECT p.problem, p.n, p.c, p.k,
        |    round(CAST(1.0 AS DOUBLE)
        |      - product(CAST(p.n - p.c - g.i AS DOUBLE))
        |        / product(CAST(p.n - g.i AS DOUBLE)), 6) AS pass_at_k
        |  FROM pk p JOIN generate_series(0, 9) AS g(i) ON g.i <= p.k - 1
        |  GROUP BY 1, 2, 3, 4),
        |m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_problems,
        |    round(CAST(SUM(CAST(pass_at_k AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*), 6) AS mean_pass_at_k
        |  FROM f GROUP BY 1)
        |SELECT f.problem, f.n, f.c, f.k, f.pass_at_k,
        |  m.n_problems, m.mean_pass_at_k
        |FROM f JOIN m USING (k)
        |ORDER BY problem, k""".stripMargin,

    // isotonic truth: the INDEPENDENT minimax characterization
    // iso_i = max_{j<=i} min_{k>=i} mean(pos_j..k) over prefix sums —
    // block rates are integer-ratio divisions, identical doubles
    "q_isotonic" ->
      """WITH lv AS (SELECT l_discount AS score, count(*) AS n,
        |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
        |  FROM lineitem GROUP BY 1),
        |o AS (SELECT score, CAST(n AS BIGINT) AS n,
        |    CAST(pos AS BIGINT) AS pos,
        |    row_number() OVER (ORDER BY score) AS i,
        |    sum(n) OVER (ORDER BY score) AS cn,
        |    sum(pos) OVER (ORDER BY score) AS cp
        |  FROM lv),
        |mins AS (SELECT a.i AS i, j.i AS j,
        |    min(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
        |      / (k.cn - (j.cn - j.n))) AS mn
        |  FROM o a JOIN o j ON j.i <= a.i JOIN o k ON k.i >= a.i
        |  GROUP BY 1, 2),
        |iso AS (SELECT i, max(mn) AS iso_rate FROM mins GROUP BY 1)
        |SELECT o.score, o.n, o.pos,
        |  round(CAST(o.pos AS DOUBLE) / o.n, 6) AS raw_rate,
        |  round(iso.iso_rate, 6) AS iso_rate
        |FROM o JOIN iso USING (i) ORDER BY o.score""".stripMargin,

    // TOST truth: same four exact counts, unpooled SE, rounded one-
    // sided z's compared against the explicit double critical point
    "q_tost" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
        |      ELSE 0 END) >= 10 THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM pu),
        |d AS (SELECT *, CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
        |    CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb FROM t),
        |e AS (SELECT *, sqrt(pa * (CAST(1.0 AS DOUBLE) - pa)
        |      / CAST(n_a AS DOUBLE)
        |    + pb * (CAST(1.0 AS DOUBLE) - pb) / CAST(n_b AS DOUBLE)) AS se
        |  FROM d),
        |z AS (SELECT *,
        |    round((pb - pa + CAST(0.05 AS DOUBLE)) / se, 6) AS z_low,
        |    round((pb - pa - CAST(0.05 AS DOUBLE)) / se, 6) AS z_up
        |  FROM e)
        |SELECT n_a, s_a, n_b, s_b,
        |  round(pa, 6) AS p_a, round(pb, 6) AS p_b,
        |  round(pb - pa, 6) AS diff, round(se, 6) AS se,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN z_low END AS z_low,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN z_up END AS z_up,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND se > 0 THEN
        |    z_low > CAST(1.6448536269514722 AS DOUBLE)
        |    AND z_up < -CAST(1.6448536269514722 AS DOUBLE) END AS equivalent
        |FROM z""".stripMargin,

    // Luhn truth: same lookaround-free candidate extraction, the mod-10
    // fold replayed per digit via generate_series — all-integer math
    "q_luhn_screen" ->
      """WITH d AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 17 = 0
        |      THEN ' 4111' || '1111' || '1111' || '1111' ELSE '' END
        |    || CASE WHEN doc_id % 19 = 0
        |      THEN ' 4111' || '1111' || '1111' || '1112' ELSE '' END
        |    || CASE WHEN doc_id % 23 = 0 THEN ' 12345678' ELSE '' END
        |      AS text
        |  FROM documents),
        |runs AS (SELECT doc_id,
        |    unnest(regexp_extract_all(text, '[0-9]+')) AS cand FROM d),
        |c AS (SELECT doc_id, cand FROM runs
        |  WHERE length(cand) BETWEEN 13 AND 19),
        |s AS (SELECT doc_id, cand,
        |    SUM(CASE WHEN g.i % 2 = 1
        |      THEN CAST(substr(reverse(cand), g.i, 1) AS INT)
        |      ELSE CAST(substr(reverse(cand), g.i, 1) AS INT) * 2
        |        - CASE WHEN CAST(substr(reverse(cand), g.i, 1) AS INT) > 4
        |          THEN 9 ELSE 0 END END) AS tot
        |  FROM c JOIN generate_series(1, 19) g(i) ON g.i <= length(cand)
        |  GROUP BY 1, 2)
        |SELECT doc_id, '****' || right(cand, 4) AS masked,
        |  CAST(length(cand) AS BIGINT) AS n_digits,
        |  tot % 10 = 0 AS luhn_valid
        |FROM s ORDER BY doc_id, masked, luhn_valid""".stripMargin,

    // mojibake truth: identical planted damage via chr(), length-diff
    // counting of the same marker characters
    "q_mojibake" ->
      """WITH d AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 23 = 0 THEN ' Caf' || chr(195)
        |      || chr(169) || ' clich' || chr(195) || chr(169)
        |      ELSE '' END
        |    || CASE WHEN doc_id % 29 = 0 THEN ' bad' || chr(65533)
        |      || 'char' ELSE '' END AS text
        |  FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(length(text) - length(replace(text, chr(65533), ''))
        |      AS BIGINT) AS n_replacement,
        |    CAST(length(text) - length(replace(replace(text,
        |      chr(195), ''), chr(194), '')) AS BIGINT) AS n_latin1_marker
        |  FROM d)
        |SELECT * FROM m
        |WHERE n_replacement > 0 OR n_latin1_marker > 0
        |ORDER BY doc_id""".stripMargin,

    // fairness truth: per-group exact counts, rates as single double
    // divisions, gap/ratio on the UNROUNDED doubles then one round
    "q_fairness" ->
      """WITH g AS (SELECT lang AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_label,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_pred,
        |    CAST(sum(CASE WHEN doc_id % 3 = 0 AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN doc_id % 3 <> 0 AND n_chars >= 300
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp
        |  FROM documents GROUP BY 1),
        |w AS (SELECT *, CAST(n_pred AS DOUBLE) / n AS rate,
        |    CAST(SUM(n_pred) OVER () AS DOUBLE) / SUM(n) OVER ()
        |      AS overall,
        |    MIN(CAST(n_pred AS DOUBLE) / n) OVER () AS mn,
        |    MAX(CAST(n_pred AS DOUBLE) / n) OVER () AS mx
        |  FROM g)
        |SELECT grp, n, n_label, n_pred,
        |  round(CAST(n_label AS DOUBLE) / n, 6) AS base_rate,
        |  round(rate, 6) AS selection_rate,
        |  CASE WHEN n_label > 0
        |    THEN round(CAST(tp AS DOUBLE) / n_label, 6) END AS tpr,
        |  CASE WHEN n > n_label
        |    THEN round(CAST(fp AS DOUBLE) / (n - n_label), 6) END AS fpr,
        |  round(rate - overall, 6) AS parity_gap,
        |  CASE WHEN mx > 0 THEN round(mn / mx, 6) END AS di_ratio
        |FROM w ORDER BY grp""".stripMargin,

    // bot-score truth: same planted metronome, lag gaps in truncated
    // epoch seconds, sample variance from exact HUGEINT moments
    "q_bot_score" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
        |    event_type
        |  FROM events
        |  UNION ALL
        |  SELECT 99999 AS user_id, 900000 + g.i AS event_id,
        |    1577836800 + g.i * 60 AS sec, 'click' AS event_type
        |  FROM generate_series(0, 29) g(i)),
        |gp AS (SELECT user_id, sec, event_type,
        |    sec - lag(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec, event_id) AS gap
        |  FROM ev),
        |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    max(sec) - min(sec) AS span_s,
        |    CAST(sum(gap) AS BIGINT) AS sg,
        |    sum(CAST(gap AS HUGEINT) * gap) AS sg2,
        |    CAST(count(*) - 1 AS BIGINT) AS m,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |  FROM gp GROUP BY 1),
        |f AS (SELECT user_id, n_events, span_s,
        |    CASE WHEN span_s > 0 THEN round(CAST(n_events AS DOUBLE)
        |      * CAST(60.0 AS DOUBLE) / span_s, 6) END AS events_per_minute,
        |    CASE WHEN m >= 2 AND sg > 0 THEN
        |      round(sqrt(CAST(m * sg2 - CAST(sg AS HUGEINT) * sg AS DOUBLE)
        |        / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE)
        |          - CAST(1.0 AS DOUBLE))))
        |        / (CAST(sg AS DOUBLE) / CAST(m AS DOUBLE)), 6) END AS gap_cv,
        |    n_types
        |  FROM u)
        |SELECT user_id, n_events, span_s, events_per_minute, gap_cv,
        |  n_types, n_events >= 20
        |    AND COALESCE(gap_cv < CAST(0.5 AS DOUBLE), false) AS bot_flag
        |FROM f ORDER BY user_id""".stripMargin,

    // Kneser–Ney truth: same tokenization, bigram-type counts, and the
    // continuation-count formula as one fixed-order double expression
    "q_kneser_ney" ->
      s"""WITH tks AS (SELECT $toksSql AS tk FROM documents),
        |bg AS (SELECT unnest(tk[:-2]) AS w1, unnest(tk[2:]) AS w2
        |  FROM tks WHERE len(tk) >= 2),
        |ty AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |  FROM bg GROUP BY 1, 2),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS n_follow FROM ty GROUP BY 1),
        |r AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_prec
        |  FROM ty GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM ty)
        |SELECT ty.w1, ty.w2, ty.c12, l.c1, l.n_follow, r.n_prec,
        |  round(greatest(CAST(ty.c12 AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |      CAST(0.0 AS DOUBLE)) / l.c1
        |    + CAST(0.75 AS DOUBLE) * CAST(l.n_follow AS DOUBLE) / l.c1
        |      * (CAST(r.n_prec AS DOUBLE) / n_types), 6) AS p_kn
        |FROM ty JOIN l USING (w1) JOIN r USING (w2), tt
        |ORDER BY ty.c12 DESC, ty.w1, ty.w2 LIMIT 50""".stripMargin,

    // HITS truth: generated unrolled CTE chain (see hitsOracle)
    "q_hits" -> hitsOracle,

    // URL-dedup truth: the canonical form synthesized ARITHMETICALLY
    // from the same doc_id construction (the q_url_parse pattern) —
    // independent of the operator's regex pipeline
    "q_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        |    'https://shop' || (doc_id % 20) || '.example.com/Item/'
        |    || (doc_id % 100)
        |    || CASE WHEN doc_id % 2 = 0 THEN '?ref=a'
        |       ELSE '?b=2&ref=a' END AS canonical_url
        |  FROM documents)
        |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_variants,
        |  CAST(min(doc_id) AS BIGINT) AS keep_doc_id
        |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin,

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

    // Nelson–Aalen truth: KM's lifetime construction, per-time hazard
    // terms rounded at 6 dp into exact decimal running sums
    "q_nelson_aalen" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_events,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_censored
        |  FROM u, m GROUP BY 1),
        |r AS (SELECT *,
        |    CAST(SUM(n_events + n_censored) OVER () AS BIGINT)
        |      - (CAST(SUM(n_events + n_censored) OVER (ORDER BY t)
        |        AS BIGINT) - (n_events + n_censored)) AS n_risk
        |  FROM lt),
        |tm AS (SELECT *,
        |    CAST(round(CAST(n_events AS DOUBLE) / n_risk, 6)
        |      AS DECIMAL(18,6)) AS h,
        |    CAST(round(CAST(n_events AS DOUBLE)
        |      / CAST(CAST(n_risk AS HUGEINT) * n_risk AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS v
        |  FROM r)
        |SELECT t, n_risk, n_events, n_censored,
        |  CAST(SUM(h) OVER (ORDER BY t) AS DOUBLE) AS cum_hazard,
        |  CAST(SUM(v) OVER (ORDER BY t) AS DOUBLE) AS cum_hazard_var
        |FROM tm ORDER BY t""".stripMargin,

    // re-randomization truth: the same content-addressed md5 parity
    // draw (the aa_calibration rendering), exact decimal value sums,
    // round-6 deltas before the extreme compare
    "q_perm_test" ->
      """WITH rw AS (SELECT CAST(event_id AS VARCHAR) AS id,
        |    event_type AS g, CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |ob AS (SELECT
        |    CAST(SUM(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_1,
        |    SUM(CASE WHEN g = 'click' THEN v END) AS s1,
        |    CAST(SUM(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_2,
        |    SUM(CASE WHEN g = 'purchase' THEN v END) AS s2
        |  FROM rw),
        |od AS (SELECT n_1, n_2,
        |    round(CAST(s2 AS DOUBLE) / nullif(CAST(n_2 AS DOUBLE), 0.0)
        |      - CAST(s1 AS DOUBLE) / nullif(CAST(n_1 AS DOUBLE), 0.0), 6)
        |      AS obs_diff FROM ob),
        |e AS (SELECT id, v, k FROM rw CROSS JOIN range(1, 51) AS t(k)),
        |a AS (SELECT k, v,
        |    CAST(('0x' || substr(md5(id || '#' || CAST(k AS VARCHAR)),
        |      1, 15)) AS UBIGINT) % 2 AS arm FROM e),
        |g AS (SELECT k,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
        |    SUM(CASE WHEN arm = 0 THEN v END) AS sa,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
        |    SUM(CASE WHEN arm = 1 THEN v END) AS sb
        |  FROM a GROUP BY k),
        |d AS (SELECT round(CAST(sb AS DOUBLE)
        |      / nullif(CAST(nb AS DOUBLE), 0.0)
        |    - CAST(sa AS DOUBLE) / nullif(CAST(na AS DOUBLE), 0.0), 6)
        |    AS dd FROM g),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_replicates,
        |    CAST(SUM(CASE WHEN abs(dd) >= abs((SELECT obs_diff FROM od))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme FROM d)
        |SELECT od.n_1, od.n_2, od.obs_diff, f.n_replicates, f.n_extreme,
        |  round(CAST(f.n_extreme + 1 AS DOUBLE) / (f.n_replicates + 1), 6)
        |    AS p_value
        |FROM od, f""".stripMargin,

    // script-profile truth: identical codepoint-range classes (the
    // \x{...} syntax both regex engines share), planted via chr(),
    // global-replace length differences, same dominance precedence
    "q_script_detect" ->
      """WITH d AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 31 = 0 THEN ' ' || chr(1040)
        |      || chr(1041) || chr(1042) ELSE '' END
        |    || CASE WHEN doc_id % 37 = 0 THEN ' ' || chr(19968)
        |      || chr(20108) || chr(19977) ELSE '' END
        |    || CASE WHEN doc_id % 41 = 0 THEN ' ' || chr(1575)
        |      || chr(1576) ELSE '' END AS text
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_han,
        |    CAST(length(text) - length(regexp_replace(text,
        |      '[\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic
        |  FROM d)
        |SELECT *, CASE
        |    WHEN greatest(n_latin, n_cyrillic, n_han, n_arabic) = 0
        |      THEN 'none'
        |    WHEN n_latin = greatest(n_latin, n_cyrillic, n_han, n_arabic)
        |      THEN 'latin'
        |    WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_han,
        |      n_arabic) THEN 'cyrillic'
        |    WHEN n_han = greatest(n_latin, n_cyrillic, n_han, n_arabic)
        |      THEN 'han'
        |    ELSE 'arabic' END AS dominant
        |FROM c ORDER BY doc_id""".stripMargin,

    // paired-t truth: exact decimal difference moments, one fixed-order
    // closing expression
    "q_paired_t" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchases,
        |    sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS x
        |  FROM events GROUP BY 1),
        |d AS (SELECT CAST(CAST(purchases AS DECIMAL(18,2))
        |    - CAST(x AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS dd FROM pu),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(dd) AS sd,
        |    SUM(CAST(dd * dd AS DECIMAL(38,4))) AS sd2 FROM d),
        |f AS (SELECT *, CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS mean_,
        |    CAST(n * sd2 - CAST(sd * sd AS DECIMAL(38,4)) AS DOUBLE)
        |      AS varnum FROM a),
        |z AS (SELECT *, sqrt(varnum / (CAST(n AS DOUBLE)
        |    * (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)))) AS sdd FROM f)
        |SELECT n, round(mean_, 6) AS mean_diff,
        |  CASE WHEN n >= 2 THEN round(sdd, 6) END AS sd_diff,
        |  CASE WHEN n >= 2 AND varnum > 0 THEN
        |    round(mean_ / (sdd / sqrt(CAST(n AS DOUBLE))), 6) END AS t
        |FROM z""".stripMargin,

    // odds-ratio truth: four exact cells, double multiplies (never
    // int64 products), Woolf interval in the same operation order
    "q_odds_ratio" ->
      """WITH a AS (SELECT
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem),
        |f AS (SELECT *,
        |    CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS orat,
        |    sqrt(CAST(1.0 AS DOUBLE) / a + CAST(1.0 AS DOUBLE) / b
        |      + CAST(1.0 AS DOUBLE) / c + CAST(1.0 AS DOUBLE) / d) AS se
        |  FROM a)
        |SELECT a, b, c, d,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0
        |    THEN round(orat, 6) END AS odds_ratio,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(ln(orat) - CAST(1.959964 AS DOUBLE) * se), 6)
        |  END AS ci_lo,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(exp(ln(orat) + CAST(1.959964 AS DOUBLE) * se), 6)
        |  END AS ci_hi
        |FROM f""".stripMargin,

    // Tukey truth: per-group exact decimal moments, round-6 SSE terms
    // into an exact decimal sum, same closing expression order
    "q_tukey_hsd" ->
      """WITH g AS (SELECT l_returnflag AS grp,
        |    CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS s2
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS ntot,
        |    CAST(count(*) AS BIGINT) AS k,
        |    SUM(CAST(round(CAST(n * s2 - CAST(s * s AS DECIMAL(38,4))
        |      AS DOUBLE) / n, 6) AS DECIMAL(28,6))) AS sse
        |  FROM g),
        |m AS (SELECT CAST(sse AS DOUBLE) / CAST(ntot - k AS DOUBLE)
        |    AS mse FROM t),
        |p AS (SELECT a.grp AS g1, b.grp AS g2, a.n AS n1, b.n AS n2,
        |    CAST(b.s AS DOUBLE) / b.n - CAST(a.s AS DOUBLE) / a.n AS d,
        |    m.mse
        |  FROM g a, g b, m WHERE a.grp < b.grp)
        |SELECT g1, g2, n1, n2, round(d, 6) AS mean_diff,
        |  CASE WHEN mse > 0 THEN round(abs(d) / sqrt(mse
        |    / CAST(2.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE) / n1
        |    + CAST(1.0 AS DOUBLE) / n2)), 6) END AS q
        |FROM p ORDER BY g1, g2""".stripMargin,

    // Cronbach truth: one fold of exact decimal moments per item and
    // for the row total, fixed-order item-variance sum
    "q_cronbach" ->
      """WITH it AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS i0,
        |    CAST(l_discount * 100 AS DECIMAL(18,2)) AS i1,
        |    CAST(l_tax * 100 AS DECIMAL(18,2)) AS i2 FROM lineitem),
        |w AS (SELECT *, CAST(i0 + i1 + i2 AS DECIMAL(38,4)) AS tt
        |  FROM it WHERE i0 IS NOT NULL AND i1 IS NOT NULL
        |    AND i2 IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(i0) AS s0, SUM(CAST(i0 * i0 AS DECIMAL(38,4))) AS q0,
        |    SUM(i1) AS s1, SUM(CAST(i1 * i1 AS DECIMAL(38,4))) AS q1,
        |    SUM(i2) AS s2, SUM(CAST(i2 * i2 AS DECIMAL(38,4))) AS q2,
        |    SUM(tt) AS st, SUM(CAST(tt * tt AS DECIMAL(38,8))) AS qt
        |  FROM w),
        |v AS (SELECT n,
        |    CAST(n * q0 - CAST(s0 * s0 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v0,
        |    CAST(n * q1 - CAST(s1 * s1 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v1,
        |    CAST(n * q2 - CAST(s2 * s2 AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v2,
        |    CAST(n * qt - CAST(st * st AS DECIMAL(38,8)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vt
        |  FROM a)
        |SELECT n, 3 AS k, round(v0 + v1 + v2, 6) AS sum_item_var,
        |  round(vt, 6) AS total_var,
        |  CASE WHEN n >= 2 AND vt > 0 THEN round(CAST(1.5 AS DOUBLE)
        |    * (CAST(1.0 AS DOUBLE) - (v0 + v1 + v2) / vt), 6)
        |  END AS alpha
        |FROM v""".stripMargin,

    // Theil truth: same positive filter, per-row 9 dp terms into an
    // exact decimal sum, one closing division
    "q_theil_index" ->
      """WITH r AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(v) AS s
        |  FROM r WHERE v > 0),
        |dr AS (SELECT CAST(SUM(CASE WHEN v <= 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_dropped FROM r),
        |mu AS (SELECT n, CAST(s AS DOUBLE) / n AS m FROM t),
        |tm AS (SELECT SUM(CAST(round((CAST(v AS DOUBLE) / mu.m)
        |    * ln(CAST(v AS DOUBLE) / mu.m), 9) AS DECIMAL(28,9))) AS ts
        |  FROM r, mu WHERE v > 0)
        |SELECT mu.n AS n, dr.n_dropped, round(mu.m, 6) AS mean,
        |  round(CAST(tm.ts AS DOUBLE) / mu.n, 6) AS theil_t
        |FROM mu, dr, tm""".stripMargin,

    // capture–recapture truth: same midpoint split, Chapman estimator
    // and Seber variance in the same operation order
    "q_capture_recapture" ->
      """WITH sp AS (SELECT
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS lo,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS hi
        |  FROM events WHERE ts IS NOT NULL),
        |u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND d <= (SELECT (lo + hi) // 2 FROM sp)
        |      THEN 1 ELSE 0 END) AS c1,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND d > (SELECT (lo + hi) // 2 FROM sp)
        |      THEN 1 ELSE 0 END) AS c2
        |  FROM (SELECT user_id, event_type,
        |      date_diff('day', DATE '1970-01-01',
        |        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d
        |    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
        |  GROUP BY 1),
        |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2,
        |    CAST(SUM(c1 * c2) AS BIGINT) AS m FROM u),
        |f AS (SELECT *,
        |    (CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
        |      / (CAST(m AS DOUBLE) + 1) - CAST(1.0 AS DOUBLE) AS nhat,
        |    sqrt((CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1)
        |      * (CAST(n1 AS DOUBLE) - CAST(m AS DOUBLE))
        |      * (CAST(n2 AS DOUBLE) - CAST(m AS DOUBLE))
        |      / ((CAST(m AS DOUBLE) + 1) * (CAST(m AS DOUBLE) + 1)
        |        * (CAST(m AS DOUBLE) + 2))) AS se
        |  FROM a)
        |SELECT n1, n2, m,
        |  CASE WHEN m > 0 THEN round(nhat, 6) END AS n_hat,
        |  CASE WHEN m > 0 THEN round(se, 6) END AS se,
        |  CASE WHEN m > 0 THEN round(nhat - CAST(1.959964 AS DOUBLE)
        |    * se, 6) END AS ci_lo,
        |  CASE WHEN m > 0 THEN round(nhat + CAST(1.959964 AS DOUBLE)
        |    * se, 6) END AS ci_hi
        |FROM f""".stripMargin,

    // skyline truth: the INDEPENDENT NOT-EXISTS dominance formulation
    // over per-x maxima — no window, no cumulative trick
    "q_skyline" ->
      s"""WITH d AS (SELECT doc_id, n_chars AS x,
        |    CAST(len(list_distinct($toksSql)) AS BIGINT) AS y
        |  FROM documents),
        |px AS (SELECT x, max(y) AS y FROM d GROUP BY 1),
        |sky AS (SELECT p.x, p.y FROM px p WHERE NOT EXISTS (
        |    SELECT 1 FROM px q WHERE q.x >= p.x AND q.y >= p.y
        |      AND (q.x > p.x OR q.y > p.y)))
        |SELECT s.x, s.y,
        |  (SELECT min(doc_id) FROM d
        |    WHERE d.x = s.x AND d.y = s.y) AS keep_id
        |FROM sky s ORDER BY s.x""".stripMargin,

    // personalized-PageRank truth: generated unrolled MATERIALIZED
    // iterations (see pprOracle — teleport constants interpolated from
    // the operator's own doubles)
    "q_ppr" -> pprOracle,

    // distinct-n truth: same tokenization, positional zip slices for
    // the 2-/3-gram projections, exact counts, one rounded division
    "q_distinct_n" ->
      s"""WITH tks AS (SELECT $toksSql AS tk FROM documents),
        |u1 AS (SELECT unnest(tk) AS g FROM tks WHERE len(tk) >= 1),
        |u2 AS (SELECT w1 || ' ' || w2 AS g FROM (
        |  SELECT unnest(tk[:-2]) AS w1, unnest(tk[2:]) AS w2
        |  FROM tks WHERE len(tk) >= 2)),
        |u3 AS (SELECT w1 || ' ' || w2 || ' ' || w3 AS g FROM (
        |  SELECT unnest(tk[:-3]) AS w1, unnest(tk[2:-2]) AS w2,
        |    unnest(tk[3:]) AS w3
        |  FROM tks WHERE len(tk) >= 3)),
        |a1 AS (SELECT 1 AS n, CAST(count(*) AS BIGINT) AS total_ngrams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams FROM u1),
        |a2 AS (SELECT 2 AS n, CAST(count(*) AS BIGINT) AS total_ngrams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams FROM u2),
        |a3 AS (SELECT 3 AS n, CAST(count(*) AS BIGINT) AS total_ngrams,
        |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams FROM u3),
        |u AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2
        |  UNION ALL SELECT * FROM a3)
        |SELECT n, total_ngrams, distinct_ngrams,
        |  round(CAST(distinct_ngrams AS DOUBLE) / total_ngrams, 6)
        |    AS distinct_ratio
        |FROM u ORDER BY n""".stripMargin,

    // burstiness truth: (doc,term) fold, term fold, zeros by moment
    // algebra against the broadcast N — identical expression order
    "q_burstiness" ->
      s"""WITH tks AS (SELECT doc_id, $toksSql AS tk FROM documents
        |  WHERE text IS NOT NULL),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents
        |  WHERE text IS NOT NULL),
        |pd AS (SELECT doc_id, unnest(tk) AS term FROM tks),
        |pdc AS (SELECT doc_id, term, count(*) AS c FROM pd GROUP BY 1, 2),
        |pt AS (SELECT term, CAST(SUM(c) AS BIGINT) AS tf,
        |    CAST(count(*) AS BIGINT) AS df,
        |    SUM(CAST(c AS HUGEINT) * c) AS c2 FROM pdc GROUP BY 1),
        |f AS (SELECT term, tf, df AS doc_freq,
        |    CAST(tf AS DOUBLE) / nd.n AS mean_,
        |    CAST(nd.n * c2 - CAST(tf AS HUGEINT) * tf AS DOUBLE)
        |      / (CAST(nd.n AS DOUBLE) * (CAST(nd.n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS var_
        |  FROM pt, nd WHERE nd.n >= 2)
        |SELECT term, tf, doc_freq, round(mean_, 6) AS mean_count,
        |  round(var_, 6) AS var_count,
        |  CASE WHEN mean_ > 0 THEN round(var_ / mean_, 6) END AS fano
        |FROM f ORDER BY tf DESC, term LIMIT 50""".stripMargin,

    // mean-excess truth: same decimal grid, conditional exact sums,
    // one rounded division per threshold
    "q_mean_excess" ->
      """WITH v AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v
        |  FROM customer WHERE c_acctbal IS NOT NULL),
        |g AS (SELECT unnest([CAST(0 AS DECIMAL(18,2)),
        |    CAST(2500 AS DECIMAL(18,2)), CAST(5000 AS DECIMAL(18,2)),
        |    CAST(7500 AS DECIMAL(18,2)),
        |    CAST(9000 AS DECIMAL(18,2))]) AS u),
        |a AS (SELECT u,
        |    CAST(SUM(CASE WHEN v > u THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_exceed,
        |    SUM(CASE WHEN v > u THEN CAST(v - u AS DECIMAL(18,2)) END)
        |      AS s
        |  FROM v, g GROUP BY 1)
        |SELECT CAST(u AS DOUBLE) AS threshold, n_exceed,
        |  CASE WHEN n_exceed > 0
        |    THEN round(CAST(s AS DOUBLE) / n_exceed, 6) END AS mean_excess
        |FROM a ORDER BY threshold""".stripMargin,

    // RDD truth: per-side exact decimal moments in [c-h, c) / [c, c+h],
    // closed-form local-linear fit in the same operation order
    "q_rdd" ->
      """WITH r AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_l,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN x END) AS sxl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00 THEN y END) AS syl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00
        |      THEN CAST(x * y AS DECIMAL(38,4)) END) AS sxyl,
        |    SUM(CASE WHEN x >= 15.00 AND x < 25.00
        |      THEN CAST(x * x AS DECIMAL(38,4)) END) AS sxxl,
        |    count(DISTINCT CASE WHEN x >= 15.00 AND x < 25.00 THEN x
        |      END) AS dxl,
        |    CAST(SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN 1 ELSE 0
        |      END) AS BIGINT) AS n_r,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN x END) AS sxr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00 THEN y END) AS syr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00
        |      THEN CAST(x * y AS DECIMAL(38,4)) END) AS sxyr,
        |    SUM(CASE WHEN x >= 25.00 AND x <= 35.00
        |      THEN CAST(x * x AS DECIMAL(38,4)) END) AS sxxr,
        |    count(DISTINCT CASE WHEN x >= 25.00 AND x <= 35.00 THEN x
        |      END) AS dxr
        |  FROM r),
        |f AS (SELECT *,
        |    CAST(n_l * sxyl - CAST(sxl * syl AS DECIMAL(38,4)) AS DOUBLE)
        |      / CAST(n_l * sxxl - CAST(sxl * sxl AS DECIMAL(38,4))
        |        AS DOUBLE) AS sl,
        |    CAST(n_r * sxyr - CAST(sxr * syr AS DECIMAL(38,4)) AS DOUBLE)
        |      / CAST(n_r * sxxr - CAST(sxr * sxr AS DECIMAL(38,4))
        |        AS DOUBLE) AS sr
        |  FROM a),
        |z AS (SELECT *,
        |    CAST(syl AS DOUBLE) / CAST(n_l AS DOUBLE)
        |      + sl * (CAST(25.0 AS DOUBLE)
        |        - CAST(sxl AS DOUBLE) / CAST(n_l AS DOUBLE)) AS yl,
        |    CAST(syr AS DOUBLE) / CAST(n_r AS DOUBLE)
        |      + sr * (CAST(25.0 AS DOUBLE)
        |        - CAST(sxr AS DOUBLE) / CAST(n_r AS DOUBLE)) AS yr
        |  FROM f)
        |SELECT n_l, n_r,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(sl, 6) END AS slope_l,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(sr, 6) END AS slope_r,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yl, 6) END
        |    AS yhat_left,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yr, 6) END
        |    AS yhat_right,
        |  CASE WHEN dxl >= 2 AND dxr >= 2 THEN round(yr - yl, 6) END
        |    AS effect
        |FROM z""".stripMargin,

    // IV/Wald truth: six exact sums, ITT over first stage in the same
    // operation order, weak-instrument NULL guard
    "q_iv_wald" ->
      """WITH pu AS (SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS z,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv,
        |    coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1),
        |a AS (SELECT
        |    CAST(SUM(z) AS BIGINT) AS n_z1,
        |    CAST(SUM(1 - z) AS BIGINT) AS n_z0,
        |    SUM(CASE WHEN z = 1 THEN y END) AS y1,
        |    SUM(CASE WHEN z = 0 THEN y END) AS y0,
        |    CAST(SUM(CASE WHEN z = 1 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d1,
        |    CAST(SUM(CASE WHEN z = 0 AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d0
        |  FROM pu),
        |f AS (SELECT *,
        |    CAST(y1 AS DOUBLE) / nullif(CAST(n_z1 AS DOUBLE), 0.0)
        |      - CAST(y0 AS DOUBLE) / nullif(CAST(n_z0 AS DOUBLE), 0.0)
        |      AS itt,
        |    CAST(d1 AS DOUBLE) / nullif(CAST(n_z1 AS DOUBLE), 0.0)
        |      - CAST(d0 AS DOUBLE) / nullif(CAST(n_z0 AS DOUBLE), 0.0)
        |      AS fs
        |  FROM a)
        |SELECT n_z1, n_z0, round(itt, 6) AS itt,
        |  round(fs, 6) AS first_stage,
        |  CASE WHEN abs(fs) > CAST(0.0001 AS DOUBLE)
        |    THEN round(itt / fs, 6) END AS late
        |FROM f""".stripMargin,

    // one-sample-KS truth: distinct-value CDF in exact integers, the
    // uniform CDF clamped to [0, 1] outside the support (out-of-range
    // mass enters the empirical CDF and is counted, never dropped)
    "q_ks_uniform" ->
      """WITH c AS (SELECT CAST(l_discount AS DECIMAL(18,6)) AS v,
        |    count(*) AS cc
        |  FROM lineitem WHERE l_discount IS NOT NULL
        |  GROUP BY 1),
        |w AS (SELECT v, cc, SUM(cc) OVER (ORDER BY v) AS cum,
        |    SUM(cc) OVER () AS n FROM c),
        |s AS (SELECT CAST(n AS BIGINT) AS n,
        |    CAST(cum AS DOUBLE) / n - least(greatest((CAST(v AS DOUBLE)
        |      - CAST(0.0 AS DOUBLE)) / CAST(0.1 AS DOUBLE), 0.0), 1.0)
        |      AS dp,
        |    least(greatest((CAST(v AS DOUBLE) - CAST(0.0 AS DOUBLE))
        |      / CAST(0.1 AS DOUBLE), 0.0), 1.0)
        |      - CAST(cum - cc AS DOUBLE) / n AS dm,
        |    CASE WHEN v < 0 OR v > 0.1 THEN cc ELSE 0 END AS oor
        |  FROM w),
        |f AS (SELECT first(n) AS n, round(max(dp), 6) AS d_plus,
        |    round(max(dm), 6) AS d_minus,
        |    CAST(sum(oor) AS BIGINT) AS n_out_of_range FROM s)
        |SELECT n, d_plus, d_minus, n_out_of_range,
        |  greatest(d_plus, d_minus) AS d,
        |  round(sqrt(CAST(n AS DOUBLE))
        |    * greatest(d_plus, d_minus), 6) AS sqrt_n_d
        |FROM f""".stripMargin,

    // Friedman truth: complete blocks, doubled within-block midranks
    // (RANGE cumulative count = through-tie count), exact integer
    // statistic with one closing division
    "q_friedman" ->
      """WITH cells0 AS (SELECT user_id AS b, event_type AS t,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events WHERE user_id IS NOT NULL
        |    AND event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT t) AS k FROM cells0),
        |comp AS (SELECT b FROM cells0 GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |cells AS (SELECT c.* FROM cells0 c JOIN comp USING (b)),
        |r AS (SELECT b, t,
        |    count(*) OVER (PARTITION BY b, v) AS tie,
        |    count(*) OVER (PARTITION BY b ORDER BY v) AS maxcum
        |  FROM cells),
        |r2 AS (SELECT b, t, (maxcum - tie) * 2 + tie + 1 AS rr FROM r),
        |pt AS (SELECT t, CAST(SUM(rr) AS BIGINT) AS rsum FROM r2
        |  GROUP BY 1),
        |a AS (SELECT SUM(CAST(rr AS HUGEINT) * rr) AS a4,
        |    CAST(count(*) / (SELECT k FROM kk) AS BIGINT) AS n FROM r2),
        |f AS (SELECT a.n AS n_blocks, (SELECT k FROM kk) AS k, a.a4,
        |    (SELECT SUM(CAST(rsum - a.n * ((SELECT k FROM kk) + 1)
        |        AS HUGEINT) * (rsum - a.n * ((SELECT k FROM kk) + 1)))
        |      FROM pt) AS snum
        |  FROM a)
        |SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
        |  CAST(k AS BIGINT) AS k,
        |  CASE WHEN CAST(a4 - CAST(n_blocks AS HUGEINT) * k * (k + 1)
        |      * (k + 1) AS DOUBLE) > 0
        |    THEN round(CAST(k - 1 AS DOUBLE) * CAST(snum AS DOUBLE)
        |      / CAST(a4 - CAST(n_blocks AS HUGEINT) * k * (k + 1)
        |        * (k + 1) AS DOUBLE), 6) END AS chi2
        |FROM f""".stripMargin,

    // Cochran-Q truth: per-cell any-success flags, exact integer G/L
    // folds, one closing division
    "q_cochran_q" ->
      """WITH cells0 AS (SELECT user_id AS b, event_type AS t,
        |    max(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS y
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT count(DISTINCT t) AS k FROM cells0),
        |comp AS (SELECT b FROM cells0 GROUP BY b
        |  HAVING count(*) = (SELECT k FROM kk)),
        |cells AS (SELECT c.* FROM cells0 c JOIN comp USING (b)),
        |bl AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(l) AS BIGINT) AS sl,
        |    SUM(CAST(l AS HUGEINT) * l) AS sl2
        |  FROM (SELECT b, SUM(y) AS l FROM cells GROUP BY 1)),
        |tr AS (SELECT CAST(SUM(g) AS BIGINT) AS sg,
        |    SUM(CAST(g AS HUGEINT) * g) AS sg2
        |  FROM (SELECT t, SUM(y) AS g FROM cells GROUP BY 1)),
        |f AS (SELECT bl.n_blocks, (SELECT k FROM kk) AS k,
        |    CAST((SELECT k FROM kk) - 1 AS HUGEINT)
        |      * ((SELECT k FROM kk) * tr.sg2
        |        - CAST(tr.sg AS HUGEINT) * tr.sg) AS qnum,
        |    CAST((SELECT k FROM kk) AS HUGEINT) * bl.sl - bl.sl2 AS qden
        |  FROM bl, tr)
        |SELECT n_blocks, CAST(k AS BIGINT) AS k,
        |  CASE WHEN CAST(qden AS DOUBLE) > 0
        |    THEN round(CAST(qnum AS DOUBLE) / CAST(qden AS DOUBLE), 6)
        |  END AS q
        |FROM f""".stripMargin,

    // ESS truth: exact decimal weight sums, two rounded divisions
    "q_ess" ->
      """WITH w AS (SELECT CAST(value AS DECIMAL(18,6)) AS w FROM events
        |  WHERE value IS NOT NULL),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN w <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dropped,
        |    SUM(CASE WHEN w > 0 THEN w END) AS sw,
        |    SUM(CASE WHEN w > 0
        |      THEN CAST(w * w AS DECIMAL(38,12)) END) AS sw2
        |  FROM w)
        |SELECT n, n_dropped,
        |  CASE WHEN n > 0 THEN round(CAST(sw AS DOUBLE)
        |    * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE), 6) END AS ess,
        |  CASE WHEN n > 0 THEN round(CAST(sw AS DOUBLE)
        |    * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE) / n, 6)
        |  END AS ess_ratio
        |FROM a""".stripMargin,

    // ECE truth: same equal-width bins, 6 dp gap terms into an exact
    // decimal sum, one closing division
    "q_ece" ->
      """WITH b AS (SELECT least(CAST(floor(
        |      CAST(l_discount * 10 AS DECIMAL(9,6)) * 10) AS BIGINT),
        |      9) AS bin,
        |    CAST(l_discount * 10 AS DECIMAL(9,6)) AS s,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        |  FROM lineitem
        |  WHERE CAST(l_discount * 10 AS DECIMAL(9,6)) IS NOT NULL),
        |g AS (SELECT bin, count(*) AS n, SUM(y) AS p, SUM(s) AS c
        |  FROM b GROUP BY 1),
        |t AS (SELECT n,
        |    abs(CAST(p AS DOUBLE) / n - CAST(c AS DOUBLE) / n) AS gap
        |  FROM g)
        |SELECT CAST(SUM(n) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_bins_used,
        |  round(CAST(SUM(CAST(round(gap * n, 6) AS DECIMAL(28,6)))
        |    AS DOUBLE) / SUM(n), 6) AS ece,
        |  max(round(gap, 6)) AS mce
        |FROM t""".stripMargin,

    // ICC truth: per-block exact decimal moments, 6 dp between/within
    // terms into exact decimal sums, k0-corrected closing expression
    "q_icc" ->
      """WITH per AS (SELECT l_orderkey AS b,
        |    CAST(count(*) AS BIGINT) AS ni,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS si,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS qi
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_quantity IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(ni) AS BIGINT) AS n_ratings, SUM(si) AS s,
        |    SUM(CAST(ni AS HUGEINT) * ni) AS n2,
        |    SUM(CAST(round(CAST(qi AS DOUBLE)
        |      - CAST(CAST(si * si AS DECIMAL(38,4)) AS DOUBLE) / ni, 6)
        |      AS DECIMAL(28,6))) AS ssw,
        |    SUM(CAST(round(CAST(CAST(si * si AS DECIMAL(38,4))
        |      AS DOUBLE) / ni, 6) AS DECIMAL(28,6))) AS sb
        |  FROM per),
        |f AS (SELECT *,
        |    (CAST(sb AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n_ratings AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS msb,
        |    CAST(ssw AS DOUBLE) / (CAST(n_ratings AS DOUBLE)
        |      - CAST(n_blocks AS DOUBLE)) AS msw,
        |    (CAST(n_ratings AS DOUBLE) - CAST(n2 AS DOUBLE)
        |      / CAST(n_ratings AS DOUBLE))
        |      / (CAST(n_blocks AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS k0
        |  FROM a)
        |SELECT n_blocks, n_ratings,
        |  CASE WHEN n_blocks >= 2 THEN round(msb, 6) END AS msb,
        |  CASE WHEN n_ratings > n_blocks THEN round(msw, 6) END AS msw,
        |  CASE WHEN n_blocks >= 2 AND n_ratings > n_blocks
        |    AND abs(msb + (k0 - CAST(1.0 AS DOUBLE)) * msw) > 0.0
        |    THEN round((msb - msw)
        |      / (msb + (k0 - CAST(1.0 AS DOUBLE)) * msw), 6) END AS icc1
        |FROM f""".stripMargin,

    // runs-test truth: same daily series, lag sign changes, exact
    // integer counts into the closing fixed-order doubles
    "q_runs_test" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        |    count(*) AS c
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |s AS (SELECT d, CASE WHEN c >= 333 THEN 1 ELSE 0 END AS sg,
        |    lag(CASE WHEN c >= 333 THEN 1 ELSE 0 END)
        |      OVER (ORDER BY d) AS pv
        |  FROM d),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(SUM(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(SUM(CASE WHEN pv IS NOT NULL AND pv <> sg THEN 1
        |      ELSE 0 END) + 1 AS BIGINT) AS runs
        |  FROM s),
        |f AS (SELECT *,
        |    CAST(2.0 AS DOUBLE) * n1 * n0 / (CAST(n1 AS DOUBLE) + n0)
        |      + CAST(1.0 AS DOUBLE) AS mu,
        |    CAST(2.0 AS DOUBLE) * n1 * n0 * (CAST(2.0 AS DOUBLE) * n1
        |      * n0 - (CAST(n1 AS DOUBLE) + n0))
        |      / ((CAST(n1 AS DOUBLE) + n0) * (CAST(n1 AS DOUBLE) + n0)
        |        * ((CAST(n1 AS DOUBLE) + n0) - CAST(1.0 AS DOUBLE)))
        |      AS sig2
        |  FROM a)
        |SELECT n1, n0, runs,
        |  CASE WHEN n1 > 0 AND n0 > 0 THEN round(mu, 6) END
        |    AS expected_runs,
        |  CASE WHEN n1 > 0 AND n0 > 0 AND sig2 > 0
        |    THEN round((CAST(runs AS DOUBLE) - mu) / sqrt(sig2), 6)
        |  END AS z
        |FROM f""".stripMargin,

    // median-CI truth: same exact-decimal point ranks, same normal-
    // approximated band ranks, order stats off one cumulative window
    "q_median_ci" ->
      """WITH c AS (SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS v,
        |    count(*) AS cc
        |  FROM customer WHERE c_acctbal IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM c),
        |r AS (SELECT g.n,
        |    greatest(1, least(g.n, CAST(ceil(CAST(0.5 AS DECIMAL(3,2))
        |      * g.n) AS BIGINT))) AS k1,
        |    greatest(1, least(g.n, CAST(floor(CAST(0.5 AS DECIMAL(3,2))
        |      * g.n + 1) AS BIGINT))) AS k2,
        |    greatest(1, CAST(ceil(CAST(0.5 AS DOUBLE) * g.n
        |      - sqrt(g.n * CAST(0.5 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |        - CAST(0.5 AS DOUBLE))) * CAST(1.959964 AS DOUBLE))
        |      AS BIGINT)) AS lo,
        |    least(g.n, CAST(ceil(CAST(0.5 AS DOUBLE) * g.n
        |      + sqrt(g.n * CAST(0.5 AS DOUBLE) * (CAST(1.0 AS DOUBLE)
        |        - CAST(0.5 AS DOUBLE))) * CAST(1.959964 AS DOUBLE))
        |      AS BIGINT)) AS hi
        |  FROM g),
        |w AS (SELECT v, SUM(cc) OVER (ORDER BY v) AS cw FROM c),
        |s AS (SELECT r.n, r.lo, r.hi,
        |    MIN(CASE WHEN cw >= r.k1 THEN v END) AS p1,
        |    MIN(CASE WHEN cw >= r.k2 THEN v END) AS p2,
        |    MIN(CASE WHEN cw >= r.lo THEN v END) AS vlo,
        |    MIN(CASE WHEN cw >= r.hi THEN v END) AS vhi
        |  FROM w, r GROUP BY 1, 2, 3)
        |SELECT n, CAST(0.5 AS DOUBLE) AS q,
        |  round((CAST(p1 AS DOUBLE) + CAST(p2 AS DOUBLE)) / 2.0, 6)
        |    AS point,
        |  lo AS lo_rank, hi AS hi_rank,
        |  CAST(vlo AS DOUBLE) AS ci_lo, CAST(vhi AS DOUBLE) AS ci_hi
        |FROM s""".stripMargin,

    // Jarque–Bera truth: one pass of exact decimal power sums, central
    // moments and the statistic in the same operation order
    "q_jarque_bera" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s1,
        |    SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS s2,
        |    SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6)))
        |      AS s3,
        |    SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      * CAST(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4))
        |      AS DECIMAL(38,8))) AS s4
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |m AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        |  FROM a),
        |cm AS (SELECT n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - CAST(3.0 AS DOUBLE) * mu * r2
        |      + CAST(2.0 AS DOUBLE) * mu * mu * mu AS m3,
        |    r4 - CAST(4.0 AS DOUBLE) * mu * r3
        |      + CAST(6.0 AS DOUBLE) * mu * mu * r2
        |      - CAST(3.0 AS DOUBLE) * mu * mu * mu * mu AS m4
        |  FROM m),
        |f AS (SELECT n, m2, m3 / sqrt(m2 * m2 * m2) AS sk,
        |    m4 / (m2 * m2) - CAST(3.0 AS DOUBLE) AS ku
        |  FROM cm)
        |SELECT n,
        |  CASE WHEN m2 > 0 THEN round(sk, 6) END AS skewness,
        |  CASE WHEN m2 > 0 THEN round(ku, 6) END AS ex_kurtosis,
        |  CASE WHEN m2 > 0 AND n >= 4 THEN
        |    round(CAST(n AS DOUBLE) / CAST(6.0 AS DOUBLE)
        |      * (sk * sk + ku * ku / CAST(4.0 AS DOUBLE)), 6) END AS jb
        |FROM f""".stripMargin,

    // Ljung–Box truth: the acf oracle's r_k rolled up with 9 dp terms
    "q_ljung_box" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(v) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |l AS (SELECT CAST(gs AS BIGINT) AS lag
        |  FROM generate_series(1, 5) AS t2(gs)),
        |pr AS (SELECT l.lag, count(*) AS n_pairs,
        |    CAST(SUM(a.v) AS DOUBLE) AS sa, CAST(SUM(b.v) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) AS pp
        |  FROM d a JOIN l ON true JOIN d b ON b.t = a.t + l.lag
        |  GROUP BY 1),
        |r AS (SELECT lag,
        |    CASE WHEN p - s * s / n > 0.0 THEN
        |      round((pp - s / n * (sa + sb) + n_pairs * (s / n) * (s / n))
        |        / (p - s * s / n), 6)
        |    END AS r
        |  FROM pr, g),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |t AS (SELECT SUM(CAST(round(r * r / (nn.n - lag), 9)
        |      AS DECIMAL(28,9))) AS ts, CAST(count(*) AS BIGINT) AS nr
        |  FROM r, nn WHERE r IS NOT NULL)
        |SELECT nn.n, CAST(5 AS BIGINT) AS max_lag,
        |  CASE WHEN t.nr >= 5 THEN round(CAST(nn.n AS DOUBLE)
        |    * (nn.n + 2) * CAST(t.ts AS DOUBLE), 6) END AS q_stat
        |FROM nn, t""".stripMargin,

    // entropy-rate truth: per-user lead pairs, bounded transition
    // table, 9 dp terms, exp of the rounded rate
    "q_entropy_rate" ->
      """WITH e AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nx
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |p AS (SELECT event_type AS a, nx AS b,
        |    CAST(count(*) AS BIGINT) AS cab
        |  FROM e WHERE nx IS NOT NULL GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM p
        |  GROUP BY 1),
        |tt AS (SELECT CAST(SUM(cab) AS BIGINT) AS tot FROM p),
        |tm AS (SELECT SUM(CAST(round(CAST(cab AS DOUBLE) / tt.tot
        |      * ln(CAST(ca AS DOUBLE) / cab), 9) AS DECIMAL(28,9))) AS s,
        |    CAST(count(*) AS BIGINT) AS n_cells
        |  FROM p JOIN ra USING (a), tt)
        |SELECT tt.tot AS n_transitions, tm.n_cells,
        |  round(CAST(tm.s AS DOUBLE), 6) AS entropy_rate_nats,
        |  round(exp(round(CAST(tm.s AS DOUBLE), 6)), 6) AS perplexity
        |FROM tt, tm""".stripMargin,

    // best-split truth: distinct-value CDF, the same 9 dp weighted-
    // impurity expression, argmin with the smaller-split tie-break
    "q_best_split" ->
      """WITH c AS (SELECT CAST(l_discount AS DOUBLE) AS v,
        |    count(*) AS cc,
        |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pp
        |  FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
        |g AS (SELECT CAST(SUM(cc) AS BIGINT) AS n,
        |    CAST(SUM(pp) AS BIGINT) AS p FROM c),
        |w AS (SELECT v, CAST(SUM(cc) OVER (ORDER BY v) AS BIGINT) AS nl,
        |    CAST(SUM(pp) OVER (ORDER BY v) AS BIGINT) AS pl FROM c),
        |s AS (SELECT v, nl, round(
        |    CAST(nl AS DOUBLE) / g.n * (CAST(1.0 AS DOUBLE)
        |      - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
        |      - (CAST(1.0 AS DOUBLE) - CAST(pl AS DOUBLE) / nl)
        |        * (CAST(1.0 AS DOUBLE) - CAST(pl AS DOUBLE) / nl))
        |    + CAST(g.n - nl AS DOUBLE) / g.n * (CAST(1.0 AS DOUBLE)
        |      - (CAST(g.p - pl AS DOUBLE) / (g.n - nl))
        |        * (CAST(g.p - pl AS DOUBLE) / (g.n - nl))
        |      - (CAST(1.0 AS DOUBLE) - CAST(g.p - pl AS DOUBLE)
        |          / (g.n - nl))
        |        * (CAST(1.0 AS DOUBLE) - CAST(g.p - pl AS DOUBLE)
        |          / (g.n - nl))), 9) AS gini
        |  FROM w, g WHERE nl < g.n),
        |f AS (SELECT v AS split_value, nl AS n_left, gini AS gini_split
        |  FROM s ORDER BY gini, v LIMIT 1),
        |b AS (SELECT n, round(CAST(1.0 AS DOUBLE)
        |    - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
        |    - (CAST(1.0 AS DOUBLE) - CAST(p AS DOUBLE) / n)
        |      * (CAST(1.0 AS DOUBLE) - CAST(p AS DOUBLE) / n), 9)
        |    AS gini_base FROM g)
        |SELECT f.split_value, f.n_left, b.n - f.n_left AS n_right,
        |  f.gini_split, b.gini_base,
        |  round(b.gini_base - f.gini_split, 9) AS gini_gain
        |FROM f, b""".stripMargin,

    // EB-shrinkage truth: 9 dp group rates with exact decimal moments
    // (width-18 operands so the square stays decimal), MoM prior and
    // shrunk rates in the same operation order
    "q_eb_shrinkage" ->
      """WITH g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS pos
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |r AS (SELECT CAST(round(CAST(pos AS DOUBLE) / n, 9)
        |    AS DECIMAL(18,9)) AS r FROM g),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS k, SUM(r) AS sr,
        |    SUM(r * r) AS sr2 FROM r),
        |pr AS (SELECT k,
        |    CAST(sr AS DOUBLE) / CAST(k AS DOUBLE) AS m,
        |    CAST(k * sr2 - sr * sr AS DOUBLE)
        |      / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS v
        |  FROM mom),
        |p2 AS (SELECT k AS n_groups, round(m, 6) AS prior_mean,
        |    CASE WHEN k >= 2 AND v > 0
        |      AND m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE) > 0
        |      THEN round((m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE)) * m, 6) END AS alpha,
        |    CASE WHEN k >= 2 AND v > 0
        |      AND m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE) > 0
        |      THEN round((m * (CAST(1.0 AS DOUBLE) - m) / v
        |        - CAST(1.0 AS DOUBLE))
        |        * (CAST(1.0 AS DOUBLE) - m), 6) END AS beta
        |  FROM pr)
        |SELECT g.grp, g.n, g.pos,
        |  round(CAST(g.pos AS DOUBLE) / g.n, 6) AS raw_rate,
        |  p2.n_groups, p2.prior_mean, p2.alpha, p2.beta,
        |  round((CAST(g.pos AS DOUBLE) + p2.alpha)
        |    / (CAST(g.n AS DOUBLE) + p2.alpha + p2.beta), 6)
        |    AS shrunk_rate
        |FROM g, p2 ORDER BY g.grp""".stripMargin,

    // MH/CMH truth: per-stratum cells, 9 dp term sums, fixed-order
    // closing ratio and chi2
    "q_mantel_haenszel" ->
      """WITH c AS (SELECT CAST(year(CAST(l_shipdate AS TIMESTAMP))
        |      AS BIGINT) AS s,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN l_discount >= 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag = 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN l_discount < 0.05 AND l_returnflag <> 'R'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT *, CAST(a + b + cc + d AS DOUBLE) AS n FROM c
        |  WHERE a + b + cc + d > 1),
        |s2 AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(SUM(a) AS BIGINT) AS sa,
        |    SUM(CAST(round(CAST(a AS DOUBLE) * d / n, 9)
        |      AS DECIMAL(28,9))) AS ad,
        |    SUM(CAST(round(CAST(b AS DOUBLE) * cc / n, 9)
        |      AS DECIMAL(28,9))) AS bc,
        |    SUM(CAST(round(CAST(a + b AS DOUBLE) * (a + cc) / n, 9)
        |      AS DECIMAL(28,9))) AS e,
        |    SUM(CAST(round(CAST(a + b AS DOUBLE) * (cc + d) * (a + cc)
        |      * (b + d) / (n * n * (n - CAST(1.0 AS DOUBLE))), 9)
        |      AS DECIMAL(28,9))) AS v
        |  FROM t)
        |SELECT n_strata,
        |  CASE WHEN CAST(bc AS DOUBLE) > 0 THEN
        |    round(CAST(ad AS DOUBLE) / CAST(bc AS DOUBLE), 6)
        |  END AS or_mh,
        |  CASE WHEN CAST(v AS DOUBLE) > 0 THEN
        |    round((CAST(sa AS DOUBLE) - CAST(e AS DOUBLE))
        |      * (CAST(sa AS DOUBLE) - CAST(e AS DOUBLE))
        |      / CAST(v AS DOUBLE), 6) END AS chi2_cmh
        |FROM s2""".stripMargin,

    // Cochran–Armitage truth: integral dose codes, exact integer
    // sums, same closing contrast
    "q_cochran_armitage" ->
      """WITH g AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT)
        |      AS s,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS r
        |  FROM lineitem WHERE l_discount IS NOT NULL GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS r,
        |    SUM(CAST(s AS HUGEINT) * g.r) AS sr,
        |    SUM(CAST(s AS HUGEINT) * g.n) AS sn,
        |    SUM(CAST(s AS HUGEINT) * s * g.n) AS s2n
        |  FROM g),
        |f AS (SELECT *, CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS pbar
        |  FROM a),
        |z AS (SELECT *,
        |    CAST(sr AS DOUBLE) - pbar * CAST(sn AS DOUBLE) AS t,
        |    pbar * (CAST(1.0 AS DOUBLE) - pbar)
        |      * (CAST(s2n AS DOUBLE) - CAST(sn AS DOUBLE)
        |        * CAST(sn AS DOUBLE) / CAST(n AS DOUBLE)) AS vt
        |  FROM f)
        |SELECT n_groups, n, r, round(pbar, 6) AS p_bar,
        |  CASE WHEN vt > 0 THEN round(t / sqrt(vt), 6) END AS z
        |FROM z""".stripMargin,

    // seasonal-strength truth: the decompose oracle's component chain
    // rolled up with exact decimal moments and Hyndman's Fs/Ft
    "q_seasonal_strength" ->
      """WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        |    CAST(count(*) AS DOUBLE) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |u AS (SELECT t, v,
        |    CAST(CAST(v AS DECIMAL(9,2)) * 100 AS BIGINT) AS uu FROM daily),
        |w AS (SELECT t, v,
        |    SUM(uu) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS wsum,
        |    COUNT(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS wcnt
        |  FROM u),
        |tr AS (SELECT t, v, t % 7 AS slot,
        |    CASE WHEN wcnt = 7
        |      THEN round(CAST(wsum AS DOUBLE) / 700.0, 6) END AS trend
        |  FROM w),
        |det AS (SELECT *, CAST(round(v - trend, 6) AS DECIMAL(18,6)) AS dt
        |  FROM tr),
        |sl AS (SELECT slot, round(CAST(SUM(dt) AS DOUBLE) / COUNT(*), 6)
        |    AS smean
        |  FROM det WHERE trend IS NOT NULL GROUP BY 1),
        |c AS (SELECT round(CAST(SUM(CAST(smean AS DECIMAL(18,6)))
        |    AS DOUBLE) / COUNT(*), 6) AS cc FROM sl),
        |comp AS (SELECT round(smean - cc, 6) AS seasonal, trend,
        |    CASE WHEN trend IS NOT NULL
        |      THEN round(v - trend - round(smean - cc, 6), 6) END AS resid
        |  FROM det LEFT JOIN sl USING (slot) CROSS JOIN c),
        |k AS (SELECT CAST(resid AS DECIMAL(18,6)) AS r,
        |    CAST(seasonal + resid AS DECIMAL(18,6)) AS sr,
        |    CAST(trend + resid AS DECIMAL(18,6)) AS tr2
        |  FROM comp WHERE resid IS NOT NULL),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(r) AS s_r, SUM(CAST(r * r AS DECIMAL(38,12))) AS q_r,
        |    SUM(sr) AS s_s, SUM(CAST(sr * sr AS DECIMAL(38,12))) AS q_s,
        |    SUM(tr2) AS s_t, SUM(CAST(tr2 * tr2 AS DECIMAL(38,12))) AS q_t
        |  FROM k),
        |f AS (SELECT n,
        |    CAST(n * q_r - CAST(s_r * s_r AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vr,
        |    CAST(n * q_s - CAST(s_s * s_s AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vs,
        |    CAST(n * q_t - CAST(s_t * s_t AS DECIMAL(38,12)) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        - CAST(1.0 AS DOUBLE))) AS vt
        |  FROM a)
        |SELECT n, round(vr, 6) AS var_resid,
        |  CASE WHEN n >= 2 AND vs > 0 THEN round(greatest(
        |    CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE) - vr / vs), 6)
        |  END AS f_seasonal,
        |  CASE WHEN n >= 2 AND vt > 0 THEN round(greatest(
        |    CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE) - vr / vt), 6)
        |  END AS f_trend
        |FROM f""".stripMargin,

    // partial-correlation truth: the corr-matrix oracle's three 6 dp
    // coefficients closed with the same fixed-order expression
    "q_partial_corr" ->
      """WITH c0 AS (SELECT CAST(l_quantity AS DECIMAL(19,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(19,2)) AS e,
        |    CAST(l_discount AS DECIMAL(19,2)) AS d
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |  CAST(SUM(q) AS DOUBLE) AS s_q, CAST(SUM(e) AS DOUBLE) AS s_e,
        |  CAST(SUM(d) AS DOUBLE) AS s_d,
        |  CAST(SUM(q * q) AS DOUBLE) AS p_qq,
        |  CAST(SUM(q * e) AS DOUBLE) AS p_qe,
        |  CAST(SUM(q * d) AS DOUBLE) AS p_qd,
        |  CAST(SUM(e * e) AS DOUBLE) AS p_ee,
        |  CAST(SUM(e * d) AS DOUBLE) AS p_ed,
        |  CAST(SUM(d * d) AS DOUBLE) AS p_dd
        |  FROM c0),
        |r AS (SELECT CAST(n AS BIGINT) AS n,
        |  round((n * p_qe - s_q * s_e) / (sqrt(n * p_qq - s_q * s_q)
        |    * sqrt(n * p_ee - s_e * s_e)), 6) AS rxy,
        |  round((n * p_qd - s_q * s_d) / (sqrt(n * p_qq - s_q * s_q)
        |    * sqrt(n * p_dd - s_d * s_d)), 6) AS rxz,
        |  round((n * p_ed - s_e * s_d) / (sqrt(n * p_ee - s_e * s_e)
        |    * sqrt(n * p_dd - s_d * s_d)), 6) AS ryz
        |  FROM m)
        |SELECT n, rxy AS r_xy, rxz AS r_xz, ryz AS r_yz,
        |  CASE WHEN abs(rxz) < 1.0 AND abs(ryz) < 1.0 THEN
        |    round((rxy - rxz * ryz) / sqrt((CAST(1.0 AS DOUBLE)
        |      - rxz * rxz) * (CAST(1.0 AS DOUBLE) - ryz * ryz)), 6)
        |  END AS r_partial
        |FROM r""".stripMargin,

    // Hill truth: the same top-(k+1) multiset, 9 dp log terms into an
    // exact decimal sum
    "q_hill_alpha" ->
      """WITH t AS (SELECT CAST(c_acctbal AS DOUBLE) AS v FROM customer
        |  WHERE c_acctbal IS NOT NULL AND CAST(c_acctbal AS DOUBLE) > 0
        |  ORDER BY v DESC LIMIT 101),
        |k1 AS (SELECT min(v) AS xk1 FROM t),
        |s AS (SELECT SUM(CAST(round(ln(v / (SELECT xk1 FROM k1)), 9)
        |      AS DECIMAL(28,9))) AS ls
        |  FROM (SELECT v FROM t ORDER BY v DESC LIMIT 100))
        |SELECT CAST(100 AS BIGINT) AS k,
        |  (SELECT xk1 FROM k1) AS x_threshold,
        |  CASE WHEN CAST(s.ls AS DOUBLE) > 0 THEN
        |    round(CAST(100.0 AS DOUBLE) / CAST(s.ls AS DOUBLE), 6)
        |  END AS alpha
        |FROM s""".stripMargin,

    // BY truth: the bh_fdr oracle chain with the 9 dp harmonic factor
    "q_by_fdr" ->
      """WITH c AS (SELECT
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR)
        |      AS segment,
        |    CAST(value AS DECIMAL(9,2)) AS v,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
        |    AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |w AS (SELECT segment,
        |    SUM(c1) OVER (PARTITION BY segment ORDER BY v) AS cum1,
        |    SUM(c2) OVER (PARTITION BY segment ORDER BY v) AS cum2,
        |    SUM(c1) OVER (PARTITION BY segment) AS n1,
        |    SUM(c2) OVER (PARTITION BY segment) AS n2
        |  FROM c),
        |m AS (SELECT segment,
        |    MAX(ABS(CAST(cum1 AS HUGEINT) * n2
        |      - CAST(cum2 AS HUGEINT) * n1)) AS dn,
        |    CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2
        |  FROM w GROUP BY 1),
        |dd AS (SELECT segment, n1, n2,
        |    round(CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS d
        |  FROM m WHERE n1 > 0 AND n2 > 0),
        |ks AS (SELECT segment, n1, n2, d,
        |    round(least(1.0, 2.0 * exp(-2.0 * d * d *
        |      (CAST(n1 AS DOUBLE) * n2 / (n1 + n2)))), 6) AS p_approx
        |  FROM dd),
        |pc AS (SELECT p_approx AS p, count(*) AS n FROM ks GROUP BY 1),
        |w2 AS (SELECT p, CAST(SUM(n) OVER (ORDER BY p) AS BIGINT) AS i,
        |    CAST(SUM(n) OVER () AS BIGINT) AS m FROM pc),
        |mm AS (SELECT CAST(MAX(m) AS BIGINT) AS m FROM w2),
        |h AS (SELECT CAST(SUM(CAST(round(CAST(1.0 AS DOUBLE) / gs, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS hm
        |  FROM generate_series(1, 100000) AS g(gs), mm
        |  WHERE gs <= mm.m),
        |rw AS (SELECT p, p * CAST(m AS DOUBLE) * (SELECT hm FROM h) / i
        |    AS raw FROM w2),
        |ad AS (SELECT p, round(least(CAST(1 AS DOUBLE),
        |    MIN(raw) OVER (ORDER BY p DESC)), 6) AS p_adj FROM rw)
        |SELECT ks.segment, ks.n1, ks.n2, ks.d, ks.p_approx, ad.p_adj,
        |  ad.p_adj <= 0.05 AS reject
        |FROM ks JOIN ad ON ks.p_approx = ad.p
        |ORDER BY segment""".stripMargin,

    // Wilcoxon truth: distinct-|d| cells, doubled midranks, exact tie
    // cubes, same closing normal approximation
    "q_wilcoxon_signed" ->
      """WITH pu AS (SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS purchases,
        |    sum(CASE WHEN event_type IN ('click', 'view') THEN 1
        |      ELSE 0 END) AS x
        |  FROM events GROUP BY 1),
        |d AS (SELECT CAST(CAST(purchases AS DECIMAL(18,2))
        |    - CAST(x AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS dd FROM pu),
        |z0 AS (SELECT CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_zero FROM d),
        |c AS (SELECT abs(dd) AS a,
        |    SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS cp,
        |    count(*) AS cc
        |  FROM d WHERE dd <> 0 GROUP BY 1),
        |w AS (SELECT cp, cc, SUM(cc) OVER (ORDER BY a) - cc AS bef
        |  FROM c),
        |a AS (SELECT
        |    SUM(CAST(cp AS HUGEINT) * (2 * bef + cc + 1)) AS w2,
        |    SUM(CAST(cc AS HUGEINT) * cc * cc - cc) AS ties,
        |    CAST(SUM(cc) AS BIGINT) AS n_pairs FROM w),
        |f AS (SELECT n_pairs,
        |    CAST(w2 AS DOUBLE) / CAST(2.0 AS DOUBLE) AS wp,
        |    CAST(n_pairs AS DOUBLE) AS nd,
        |    CAST(ties AS DOUBLE) AS td FROM a),
        |g AS (SELECT *,
        |    nd * (nd + CAST(1.0 AS DOUBLE)) / CAST(4.0 AS DOUBLE) AS mu,
        |    nd * (nd + CAST(1.0 AS DOUBLE)) * (CAST(2.0 AS DOUBLE) * nd
        |      + CAST(1.0 AS DOUBLE)) / CAST(24.0 AS DOUBLE)
        |      - td / CAST(48.0 AS DOUBLE) AS sig2
        |  FROM f)
        |SELECT g.n_pairs, z0.n_zero, round(g.wp, 6) AS w_plus,
        |  CASE WHEN g.n_pairs >= 1 AND g.sig2 > 0
        |    THEN round((g.wp - g.mu) / sqrt(g.sig2), 6) END AS z
        |FROM g, z0""".stripMargin,

    // weighted-kappa truth: bounded cell/margin tables, code-distance
    // weights over the observed span, 9 dp terms, same closing ratio
    "q_weighted_kappa" ->
      """WITH r0 AS (SELECT CAST(round(l_discount * 100, 0) AS BIGINT)
        |      AS i,
        |    CAST(round(l_tax * 100, 0) AS BIGINT) AS j
        |  FROM lineitem
        |  WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |c AS (SELECT i, j, CAST(count(*) AS BIGINT) AS cc
        |  FROM r0 GROUP BY 1, 2),
        |sp AS (SELECT CAST(max(k) - min(k) AS DOUBLE) AS span,
        |    CAST(count(*) AS BIGINT) AS nc
        |  FROM (SELECT i AS k FROM c UNION SELECT j FROM c)),
        |nn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n FROM c),
        |po AS (SELECT CAST(SUM(CAST(round((CAST(1.0 AS DOUBLE)
        |      - CAST(abs(i - j) AS DOUBLE) / sp.span) * cc, 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS po_s FROM c, sp),
        |ri AS (SELECT i, CAST(SUM(cc) AS BIGINT) AS ri FROM c
        |  GROUP BY 1),
        |cj AS (SELECT j, CAST(SUM(cc) AS BIGINT) AS cj FROM c
        |  GROUP BY 1),
        |pe AS (SELECT CAST(SUM(CAST(round((CAST(1.0 AS DOUBLE)
        |      - CAST(abs(ri.i - cj.j) AS DOUBLE) / sp.span)
        |      * (CAST(ri.ri AS DOUBLE) * cj.cj), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS pe_s FROM ri, cj, sp)
        |SELECT nn.n, sp.nc AS k,
        |  round(po.po_s / nn.n, 6) AS po_w,
        |  round(pe.pe_s / (CAST(nn.n AS DOUBLE) * nn.n), 6) AS pe_w,
        |  CASE WHEN pe.pe_s / (CAST(nn.n AS DOUBLE) * nn.n)
        |      < CAST(1.0 AS DOUBLE)
        |    THEN round((po.po_s / nn.n - pe.pe_s
        |        / (CAST(nn.n AS DOUBLE) * nn.n))
        |      / (CAST(1.0 AS DOUBLE) - pe.pe_s
        |        / (CAST(nn.n AS DOUBLE) * nn.n)), 6) END AS kappa_w
        |FROM nn, sp, po, pe""".stripMargin,

    // Gwet-AC1 truth: bounded cell/margin folds, 9 dp chance terms,
    // round-6 po/e before the closing ratio
    "q_gwet_ac1" ->
      """WITH c AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    CAST(count(*) AS BIGINT) AS cc
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |nn AS (SELECT CAST(SUM(cc) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN a = b THEN cc ELSE 0 END) AS BIGINT)
        |      AS agree FROM c),
        |ca AS (SELECT a AS q, CAST(SUM(cc) AS BIGINT) AS m FROM c
        |  GROUP BY 1),
        |cb AS (SELECT b AS q, CAST(SUM(cc) AS BIGINT) AS m FROM c
        |  GROUP BY 1),
        |cats AS (SELECT q, CAST(SUM(m) AS BIGINT) AS mm FROM
        |  (SELECT * FROM ca UNION ALL SELECT * FROM cb) GROUP BY 1),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(round((CAST(mm AS DOUBLE)
        |      / (CAST(2.0 AS DOUBLE) * (SELECT n FROM nn)))
        |      * (CAST(1.0 AS DOUBLE) - CAST(mm AS DOUBLE)
        |        / (CAST(2.0 AS DOUBLE) * (SELECT n FROM nn))), 9)
        |      AS DECIMAL(28,9))) AS DOUBLE) AS esum
        |  FROM cats),
        |f AS (SELECT nn.n, kk.k,
        |    round(CAST(nn.agree AS DOUBLE) / nn.n, 6) AS po,
        |    round(kk.esum / (kk.k - 1), 6) AS e
        |  FROM nn, kk)
        |SELECT n, k, po, e AS pe_gwet,
        |  CASE WHEN e < CAST(1.0 AS DOUBLE) THEN
        |    round((po - e) / (CAST(1.0 AS DOUBLE) - e), 6) END AS ac1
        |FROM f""".stripMargin,

    // G-test truth: same cell/margin construction as the chi2 oracle,
    // 9 dp O*ln(O/E) terms into an exact decimal sum
    "q_g_test" ->
      """WITH r0 AS (SELECT event_type AS a,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS VARCHAR) AS b
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o FROM r0
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS raa FROM c GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS cbb FROM c GROUP BY 1),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
        |dims AS (SELECT CAST(count(DISTINCT a) AS BIGINT) AS r,
        |    CAST(count(DISTINCT b) AS BIGINT) AS cc FROM c),
        |t AS (SELECT CAST(SUM(CAST(round(CAST(o AS DOUBLE)
        |      * ln(CAST(o AS DOUBLE) / (CAST(raa AS DOUBLE) * cbb
        |        / (SELECT n FROM nn))), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS g2
        |  FROM c JOIN ra USING (a) JOIN cb USING (b))
        |SELECT nn.n, (dims.r - 1) * (dims.cc - 1) AS df,
        |  round(CAST(2.0 AS DOUBLE) * t.g2, 6) AS g
        |FROM nn, dims, t""".stripMargin,

    // confusion truth: four exact cells, double multiplies, the same
    // fixed-order closing expressions
    "q_confusion_stats" ->
      """WITH a AS (SELECT
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |      AND CAST(l_discount AS DOUBLE) >= CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R'
        |      AND CAST(l_discount AS DOUBLE) >= CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN l_returnflag = 'R'
        |      AND CAST(l_discount AS DOUBLE) < CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN l_returnflag <> 'R'
        |      AND CAST(l_discount AS DOUBLE) < CAST(0.05 AS DOUBLE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM lineitem WHERE l_discount IS NOT NULL),
        |f AS (SELECT *, CAST(tp AS DOUBLE) AS tpd,
        |    CAST(fp AS DOUBLE) AS fpd, CAST(fn AS DOUBLE) AS fnd,
        |    CAST(tn AS DOUBLE) AS tnd FROM a)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0
        |    THEN round(tpd / (tpd + fpd), 6) END AS precision,
        |  CASE WHEN tp + fn > 0
        |    THEN round(tpd / (tpd + fnd), 6) END AS recall,
        |  CASE WHEN tp * 2 + fp + fn > 0 THEN
        |    round(CAST(2.0 AS DOUBLE) * tpd
        |      / (CAST(2.0 AS DOUBLE) * tpd + fpd + fnd), 6) END AS f1,
        |  CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
        |    round((tpd / (tpd + fnd) + tnd / (tnd + fpd))
        |      / CAST(2.0 AS DOUBLE), 6) END AS balanced_accuracy,
        |  CASE WHEN sqrt((tpd + fpd) * (tpd + fnd) * (tnd + fpd)
        |      * (tnd + fnd)) > 0 THEN
        |    round((tpd * tnd - fpd * fnd) / sqrt((tpd + fpd)
        |      * (tpd + fnd) * (tnd + fpd) * (tnd + fnd)), 6)
        |  END AS mcc
        |FROM f""".stripMargin,

    // missingness truth: the same planted null structure, pattern
    // labels enumerated, share off one window over the pattern table
    "q_null_pattern" ->
      """WITH ev AS (SELECT event_id,
        |    CASE WHEN user_id % 7 = 0 THEN NULL ELSE value END AS value,
        |    CASE WHEN user_id % 5 = 0 THEN NULL ELSE props END AS props
        |  FROM events),
        |p AS (SELECT CASE
        |    WHEN value IS NULL AND props IS NULL THEN 'value,props'
        |    WHEN value IS NULL THEN 'value'
        |    WHEN props IS NULL THEN 'props'
        |    ELSE '(complete)' END AS missing_cols, count(*) AS n
        |  FROM ev GROUP BY 1)
        |SELECT missing_cols, CAST(n AS BIGINT) AS n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS share
        |FROM p ORDER BY missing_cols""".stripMargin,

    // Benford truth: first digit from the same DECIMAL(18,6) rendering,
    // all 9 digits via generate_series, decimal-summed contributions
    "q_benford" ->
      """WITH v AS (SELECT CAST(regexp_extract(
        |      CAST(CAST(l_extendedprice AS DECIMAL(18,6)) AS VARCHAR),
        |      '[1-9]') AS INT) AS digit
        |  FROM lineitem
        |  WHERE TRY_CAST(l_extendedprice AS DECIMAL(18,6)) IS NOT NULL
        |    AND regexp_extract(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |      AS VARCHAR), '[1-9]') <> ''),
        |c AS (SELECT digit, count(*) AS observed FROM v GROUP BY 1),
        |t AS (SELECT SUM(observed) AS n FROM c),
        |s AS (SELECT g.digit,
        |    coalesce(c.observed, CAST(0 AS BIGINT)) AS observed,
        |    round(CAST(n AS DOUBLE)
        |      * log10(1.0 + CAST(1 AS DOUBLE) / g.digit), 6) AS expected
        |  FROM (SELECT CAST(gs AS INT) AS digit
        |      FROM generate_series(1, 9) AS t2(gs)) g
        |    LEFT JOIN c USING (digit), t),
        |sc AS (SELECT *,
        |    CASE WHEN expected > 0.0 THEN
        |      round((observed - expected) * (observed - expected) / expected, 6)
        |    ELSE 0.0 END AS contrib FROM s),
        |st AS (SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE)
        |    AS chi2 FROM sc)
        |SELECT digit, observed, expected, contrib, chi2
        |FROM sc, st ORDER BY digit""".stripMargin,

    // ACF truth: same daily-count series, exact integer sums and cross
    // sums per lag, identical fixed-order double assembly
    "q_acf" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(v) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |l AS (SELECT CAST(gs AS BIGINT) AS lag
        |  FROM generate_series(1, 10) AS t2(gs)),
        |pr AS (SELECT l.lag, count(*) AS n_pairs,
        |    CAST(SUM(a.v) AS DOUBLE) AS sa, CAST(SUM(b.v) AS DOUBLE) AS sb,
        |    CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS DOUBLE) AS pp
        |  FROM d a JOIN l ON true JOIN d b ON b.t = a.t + l.lag
        |  GROUP BY 1)
        |SELECT lag, n_pairs,
        |  CASE WHEN p - s * s / n > 0.0 THEN
        |    round((pp - s / n * (sa + sb) + n_pairs * (s / n) * (s / n))
        |      / (p - s * s / n), 6)
        |  END AS r
        |FROM pr, g ORDER BY lag""".stripMargin,

    // Theil-Sen truth: same pair slopes (one rounded double division of
    // exact integers), same inverted-CDF medians
    "q_theil_sen" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |p AS (SELECT round((CAST(b.v AS DOUBLE) - a.v) / (b.t - a.t), 6) AS s
        |  FROM d a JOIN d b ON b.t > a.t),
        |sc AS (SELECT s, count(*) AS n FROM p GROUP BY 1),
        |sw AS (SELECT s, SUM(n) OVER (ORDER BY s) AS cum,
        |    SUM(n) OVER () AS tot FROM sc),
        |sm AS (SELECT MIN(CASE WHEN CAST(cum AS HUGEINT) * 2 >= tot
        |    THEN s END) AS slope FROM sw),
        |r AS (SELECT round(CAST(v AS DOUBLE) - slope * t, 6) AS i
        |  FROM d, sm),
        |rc AS (SELECT i, count(*) AS n FROM r GROUP BY 1),
        |rw AS (SELECT i, SUM(n) OVER (ORDER BY i) AS cum,
        |    SUM(n) OVER () AS tot FROM rc),
        |im AS (SELECT MIN(CASE WHEN CAST(cum AS HUGEINT) * 2 >= tot
        |    THEN i END) AS intercept FROM rw),
        |t AS (SELECT count(*) AS n,
        |    CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
        |  FROM d)
        |SELECT n, n_pairs, slope, intercept FROM t, sm, im""".stripMargin,

    // two-proportion truth: four exact integers, identical fixed-order
    // double z arithmetic
    "q_prop_test" ->
      """WITH a AS (SELECT
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN event_type = 'click' AND value > 75
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k1,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value > 75
        |      THEN 1 ELSE 0 END) AS BIGINT) AS k2
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL),
        |s AS (SELECT *,
        |    CAST(k1 AS DOUBLE) / n1 AS p1r, CAST(k2 AS DOUBLE) / n2 AS p2r,
        |    CAST(k1 + k2 AS DOUBLE) / (n1 + n2) AS pp FROM a),
        |s2 AS (SELECT *,
        |    pp * (1.0 - pp) * (CAST(1 AS DOUBLE) / n1
        |      + CAST(1 AS DOUBLE) / n2) AS se2 FROM s)
        |SELECT 'click' AS g1, 'purchase' AS g2, n1, k1, n2, k2,
        |  round(p1r, 6) AS p1, round(p2r, 6) AS p2,
        |  CASE WHEN se2 > 0.0
        |    THEN round((p1r - p2r) / sqrt(se2), 6) END AS z
        |FROM s2""".stripMargin,

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

    // Kaplan-Meier truth: same lifetime/censor table, at-risk from the
    // same prefix arithmetic, survival via rounded-ln decimal-sum-exp
    "q_kaplan_meier" ->
      """WITH u AS (SELECT user_id,
        |    min(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS f,
        |    max(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE))) AS l
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |m AS (SELECT max(l) AS md FROM u),
        |lt AS (SELECT l - f AS t,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_events,
        |    CAST(SUM(CASE WHEN l <= md - 5 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_censored
        |  FROM u, m GROUP BY 1),
        |r AS (SELECT t, n_events, n_censored,
        |    CAST(SUM(n_events + n_censored) OVER () AS BIGINT)
        |      - (CAST(SUM(n_events + n_censored) OVER (ORDER BY t) AS BIGINT)
        |        - (n_events + n_censored)) AS n_risk
        |  FROM lt),
        |f2 AS (SELECT *,
        |    round(CAST(n_risk - n_events AS DOUBLE) / n_risk, 6) AS factor
        |  FROM r),
        |s AS (SELECT *,
        |    SUM(CASE WHEN factor > 0.0
        |      THEN CAST(round(ln(factor), 6) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) OVER (ORDER BY t) AS lnsum,
        |    MIN(factor) OVER (ORDER BY t) AS minf FROM f2)
        |SELECT t, n_risk, n_events, n_censored,
        |  CASE WHEN minf = 0.0 THEN 0.0
        |    ELSE round(exp(CAST(lnsum AS DOUBLE)), 6) END AS survival
        |FROM s ORDER BY t""".stripMargin,

    // CUSUM truth: same standardization from exact integer moments,
    // identical decimal prefix sums and running extremes (incl. the
    // empty-prefix zero), decimal threshold compare
    "q_cusum" ->
      """WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t, count(*) AS v
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |g AS (SELECT count(*) AS n, CAST(SUM(CAST(v AS HUGEINT)) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) AS p FROM d),
        |z AS (SELECT t, CAST(v AS DOUBLE) AS value,
        |    round((CAST(v AS DOUBLE) - s / n)
        |      / sqrt((n * p - s * s) / (CAST(n AS DOUBLE) * (n - 1))), 6) AS z
        |  FROM d, g),
        |w AS (SELECT t, value, z,
        |    CAST(SUM(CAST(z AS DECIMAL(18,6)) - CAST(0.5 AS DECIMAL(7,6)))
        |      OVER (ORDER BY t) AS DECIMAL(30,6)) AS pp,
        |    CAST(SUM(CAST(z AS DECIMAL(18,6)) + CAST(0.5 AS DECIMAL(7,6)))
        |      OVER (ORDER BY t) AS DECIMAL(30,6)) AS np
        |  FROM z),
        |x AS (SELECT t, value, z, pp, np,
        |    MIN(pp) OVER (ORDER BY t) AS mn,
        |    MAX(np) OVER (ORDER BY t) AS mx FROM w),
        |f AS (SELECT t, value, z,
        |    pp - (CASE WHEN mn < 0 THEN mn
        |      ELSE CAST(0 AS DECIMAL(30,6)) END) AS sp,
        |    (CASE WHEN mx > 0 THEN mx
        |      ELSE CAST(0 AS DECIMAL(30,6)) END) - np AS sm
        |  FROM x)
        |SELECT t, value, z, CAST(sp AS DOUBLE) AS s_plus,
        |  CAST(sm AS DOUBLE) AS s_minus,
        |  (sp > CAST(4.0 AS DECIMAL(7,6))
        |    OR sm > CAST(4.0 AS DECIMAL(7,6))) AS flag
        |FROM f ORDER BY t""".stripMargin,

    // winsorize truth: same inverted-CDF integer edge selection and clip
    "q_winsorize" ->
      """WITH c AS (SELECT n_chars AS v, count(*) AS n FROM documents
        |  WHERE n_chars IS NOT NULL GROUP BY 1),
        |w AS (SELECT v, SUM(n) OVER (ORDER BY v) AS cum FROM c),
        |t AS (SELECT SUM(n) AS tot FROM c),
        |e AS (SELECT
        |    MIN(CASE WHEN CAST(cum AS HUGEINT) * 10000 >= tot * 100
        |      THEN v END) AS lo,
        |    MIN(CASE WHEN CAST(cum AS HUGEINT) * 10000 >= tot * 9900
        |      THEN v END) AS hi
        |  FROM w, t)
        |SELECT doc_id, CAST(n_chars AS DOUBLE) AS value,
        |  CAST(least(greatest(n_chars, lo), hi) AS DOUBLE) AS winsorized
        |FROM documents, e WHERE n_chars IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // pseudonymize truth: same keyed sha256, hex-lowercase both engines
    "q_pseudonymize" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NOT NULL
        |    THEN sha256(concat('graft-salt', ':', c_name)) END AS c_name,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // k-anonymity truth: same string-keyed group counts and summary
    "q_k_anonymity" ->
      """WITH g AS (SELECT CAST(c_mktsegment AS VARCHAR) AS c_mktsegment,
        |    CAST(c_nationkey AS VARCHAR) AS c_nationkey, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |s AS (SELECT count(*) AS n_groups,
        |    CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk,
        |    min(n) AS anonymity FROM g)
        |SELECT g.c_mktsegment, g.c_nationkey, g.n,
        |  s.n_groups, s.n_violating, s.rows_at_risk, s.anonymity
        |FROM g, s WHERE g.n < 10
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    // l-diversity truth: exact distinct sensitive count per quasi group
    "q_l_diversity" ->
      """WITH g AS (SELECT CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS VARCHAR)
        |      AS ym,
        |    count(*) AS n, count(DISTINCT o_orderstatus) AS diversity
        |  FROM orders GROUP BY 1, 2),
        |s AS (SELECT count(*) AS n_groups,
        |    CAST(SUM(CASE WHEN diversity < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(CASE WHEN diversity < 3 THEN n ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk,
        |    min(diversity) AS min_diversity FROM g)
        |SELECT g.o_orderpriority, g.ym, g.n, g.diversity,
        |  s.n_groups, s.n_violating, s.rows_at_risk, s.min_diversity
        |FROM g, s WHERE g.diversity < 3
        |ORDER BY o_orderpriority, ym""".stripMargin,

    // t-closeness truth: same pair/group/value tables; per-value terms
    // cross-multiplied in HUGEINT (exact), absent-value mass added as
    // n_g * (N - sum of present value totals), ONE double division
    "q_t_closeness" ->
      """WITH base AS (SELECT CAST(o_orderpriority AS VARCHAR) AS o_orderpriority,
        |    CAST(year(o_orderdate) * 100 + month(o_orderdate) AS VARCHAR) AS ym,
        |    CAST(o_orderstatus AS VARCHAR) AS s
        |  FROM orders WHERE o_orderstatus IS NOT NULL),
        |pairs AS (SELECT o_orderpriority, ym, s, COUNT(*) AS cgv
        |  FROM base GROUP BY 1, 2, 3),
        |gt AS (SELECT o_orderpriority, ym, SUM(cgv) AS n FROM pairs GROUP BY 1, 2),
        |vt AS (SELECT s, SUM(cgv) AS cv FROM pairs GROUP BY 1),
        |tot AS (SELECT SUM(cgv) AS nn FROM pairs),
        |g AS (SELECT p.o_orderpriority, p.ym, MAX(gt.n) AS n, MAX(tot.nn) AS nn,
        |    SUM(ABS(CAST(p.cgv AS HUGEINT) * tot.nn
        |      - CAST(vt.cv AS HUGEINT) * gt.n)) AS sumabs,
        |    SUM(CAST(vt.cv AS HUGEINT)) AS sumcv
        |  FROM pairs p JOIN vt USING (s)
        |    JOIN gt USING (o_orderpriority, ym) CROSS JOIN tot
        |  GROUP BY 1, 2),
        |sc AS (SELECT o_orderpriority, ym, CAST(n AS BIGINT) AS n,
        |    round(CAST(sumabs + CAST(n AS HUGEINT) * (nn - sumcv) AS DOUBLE)
        |      / (2.0 * n * nn), 6) AS tvd
        |  FROM g),
        |sm AS (SELECT count(*) AS n_groups,
        |    CAST(SUM(CASE WHEN tvd > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating,
        |    CAST(SUM(CASE WHEN tvd > 0.2 THEN n ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk,
        |    max(tvd) AS max_tvd FROM sc)
        |SELECT sc.o_orderpriority, sc.ym, sc.n, sc.tvd,
        |  sm.n_groups, sm.n_violating, sm.rows_at_risk, sm.max_tvd
        |FROM sc, sm WHERE sc.tvd > 0.2
        |ORDER BY o_orderpriority, ym""".stripMargin,

    // key-skew truth: same count table, rounded entropy contributions
    // decimal-summed (key order cannot move the statistic), same top-20
    "q_key_skew" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
        |t AS (SELECT SUM(cnt) AS tot, count(*) AS k FROM c),
        |e AS (SELECT CAST(SUM(CAST(round(-(CAST(cnt AS DOUBLE) / tot)
        |      * ln(CAST(cnt AS DOUBLE) / tot), 6) AS DECIMAL(18,6))) AS DOUBLE) AS ent
        |  FROM c, t)
        |SELECT key, cnt, round(CAST(cnt AS DOUBLE) / tot, 6) AS share,
        |  k AS n_keys, ent AS entropy,
        |  CASE WHEN k > 1 THEN round(ent / ln(CAST(k AS DOUBLE)), 6) END AS norm_entropy
        |FROM c, t, e ORDER BY cnt DESC, key LIMIT 20""".stripMargin,

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

    // seasonal-baseline truth: exact decimal slot moments, the
    // robustOutliers round-before-z policy, identical slot keying
    "q_seasonal_baseline" ->
      """WITH ev AS (SELECT event_id, event_type,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) % 7 AS INT) AS dow,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS hour, value
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |g AS (SELECT event_type, dow, hour, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(value AS DECIMAL(19,2)) * CAST(value AS DECIMAL(19,2))) AS DOUBLE) AS p
        |  FROM ev GROUP BY 1, 2, 3),
        |st AS (SELECT event_type, dow, hour,
        |    round(s / n, 6) AS slot_mean,
        |    CASE WHEN n > 1 THEN round(sqrt(greatest(
        |      (n * p - s * s) / CAST(n * (n - 1) AS DOUBLE), 0.0)), 6) END AS slot_std
        |  FROM g)
        |SELECT e.event_id, e.event_type, e.dow, e.hour,
        |  CAST(e.value AS DOUBLE) AS value, st.slot_mean, st.slot_std,
        |  CASE WHEN st.slot_std > 0.0
        |    THEN round((CAST(e.value AS DOUBLE) - st.slot_mean) / st.slot_std, 6)
        |  END AS z,
        |  COALESCE(CASE WHEN st.slot_std > 0.0
        |    THEN abs(round((CAST(e.value AS DOUBLE) - st.slot_mean) / st.slot_std, 6)) > 3.0
        |  END, false) AS is_anomaly
        |FROM ev e JOIN st USING (event_type, dow, hour)
        |ORDER BY event_id""".stripMargin,

    // percentile-rank truth: DuckDB's cume_dist over raw rows — a
    // DIFFERENT derivation of the same #{rows ≤ v}/n quantity than the
    // engine's distinct-CDF join, so the gate cross-checks the math
    "q_pct_rank" ->
      """SELECT doc_id, CAST(n_chars AS BIGINT) AS value,
        |  round(cume_dist() OVER (ORDER BY CAST(n_chars AS BIGINT)), 6) AS pct_rank
        |FROM documents WHERE n_chars IS NOT NULL ORDER BY doc_id""".stripMargin,

    // grouped percentile-rank truth: per-language cume_dist — again a
    // different derivation of #{group rows <= v}/|group| than the
    // engine's per-group CDF join
    "q_pct_rank_by" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS value,
        |  round(cume_dist() OVER (PARTITION BY lang
        |    ORDER BY CAST(n_chars AS BIGINT)), 6) AS pct_rank
        |FROM documents WHERE n_chars IS NOT NULL ORDER BY doc_id""".stripMargin,

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
    },

    // LPA planted truth: clique A {0..4} -> community 0, clique B
    // {5..9} -> community 5 (derived by hand from the deterministic
    // closed-neighborhood-mode + min-tie-break update rule)
    "q_lpa" ->
      """SELECT CAST(i AS BIGINT) AS id,
        |  CAST(CASE WHEN i < 5 THEN 0 ELSE 5 END AS BIGINT) AS community
        |FROM (SELECT unnest(range(0, 10)) AS i)
        |ORDER BY id""".stripMargin
  )
}
