package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis registry: tokenization, quality, language
  * ID, LM scoring, extraction/normalization, fingerprints — the
  * `documents`-table curation family.
  * (split out of PipelineRegistry in r17 — entries moved verbatim).
  */
private[graft] object TextRegistry {
  import Tables.t
  import RegistryFixtures._
  import SparkEntry.dmap

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


    // ---- DSIR importance weights: raw corpus scored against the
    //      English-subset target model (hashed-unigram bucket
    //      log-likelihood ratio, add-0.5 smoothing over 1000 buckets) ----
    "q_dsir_weights" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(docs, docs.filter(col("lang") === "en"),
          "text", "doc_id", 1000)
        .orderBy("doc_id")
    }),


    // ---- Gopher-style repetition features (dup token/bigram fractions,
    //      top-bigram character share) ----
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "text", "doc_id")
        .select(col("doc_id"), col("n_tokens").cast("long"),
          col("dup_token_frac"), col("dup_bigram_frac"),
          col("top_bigram"), col("top_bigram_n"), col("top_bigram_frac"))
        .orderBy("doc_id")),


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


    // ---- exact quantile gate: keep docs at/above the median quality ----
    "q_quality_gate" -> ((s, dir) =>
      Sampling.filterTopQuantile(
        TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
          .select(col("doc_id"), col("quality_score")),
        "quality_score", 0.5)
        .orderBy("doc_id")),


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


    // ---- fixed-token-window document chunking with overlap ----
    "q_chunk_docs" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "text", "doc_id", 10, 2)
        .orderBy("doc_id", "chunk_id")),


    // ---- greedy sequence packing manifest (context-length fill) ----
    "q_pack_sequences" -> ((s, dir) =>
      TextAnalysis.packSequences(t(s, dir, "documents"), "text", "doc_id", "lang", 64)
        .orderBy("lang", "doc_id")),


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


    // ---- skip-gram pairs: word2vec-style (center, context) counts ----
    "q_skipgrams" -> ((s, dir) =>
      TextAnalysis.skipGrams(t(s, dir, "documents"), "text", "doc_id",
          window = 3, minCount = 5)
        .orderBy("center", "context")),


    // ---- feature hashing: vocabulary-free sparse featurization ----
    "q_feature_hash" -> ((s, dir) =>
      TextAnalysis.featureHash(t(s, dir, "documents"), "text", "doc_id", 64)
        .orderBy("doc_id", "bucket")),


    // ---- BM25 top-k retrieval: posting lists bounded to the query
    //      terms, broadcast df/corpus stats, TakeOrdered top-k; per-term
    //      scores rounded 6dp then decimal-summed so partitioning can
    //      never move a bit ----
    "q_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(t(s, dir, "documents"), "text", "doc_id",
        Seq("hash", "join", "spark"), 15)),


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


    // ---- interpolated Kneser–Ney bigram table over the corpus:
    //      continuation counts, top 50 bigrams by raw count ----
    "q_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNeyBigram(t(s, dir, "documents"))
        .orderBy(col("c12").desc, col("w1"), col("w2")).limit(50)),


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


    // ---- distinct-1/2/3 corpus diversity (mode-collapse detector) ----
    "q_distinct_n" -> ((s, dir) =>
      TextAnalysis.distinctN(t(s, dir, "documents")).orderBy("n")),


    // ---- term burstiness (Fano factor over per-doc counts, zeros by
    //      moment algebra): topical terms vs glue ----
    "q_burstiness" -> ((s, dir) =>
      TextAnalysis.burstiness(t(s, dir, "documents"))),


    // ---- entropy rate of the event-type Markov chain: how scripted
    //      is the next action given the current one ----
    "q_entropy_rate" -> ((s, dir) =>
      EventAnalytics.entropyRate(Tables.events(s, dir))),


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
      TextAnalysis.tokenFertility(t(s, dir, "documents")))
  )

  def oracles: Map[String, String] = dmap(
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


    "q_quality_classifier" ->
      """SELECT 'classifier_train_accuracy_eq_1' AS check_name, true AS ok""",


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
        |FROM tt, tm""".stripMargin
  )
}
