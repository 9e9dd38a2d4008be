package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup registry: exact / Jaccard-PPJoin / MinHash-LSH /
  * SimHash / CDC / line / survivorship / containment dedup and the
  * linkage helpers around them.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object DedupRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(

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


    // ---- survivorship dedup: near-dup clusters keep their BEST member
    //      (highest n_chars, tie lowest id) instead of the min-id one;
    //      cluster graph shared with q_dedup_corpus, representative
    //      chosen by one struct-min hash aggregation ----
    "q_survivorship" -> ((s, dir) =>
      Dedup.survivorshipDedup(t(s, dir, "documents"), "text", "doc_id",
          "n_chars", 0.5)
        .orderBy("component")),


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
    })
  )

  def oracles: Map[String, String] = dmap(

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
        |FROM c GROUP BY 1 ORDER BY canonical_url""".stripMargin
  )
}
