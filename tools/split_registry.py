#!/usr/bin/env python3
"""One-shot codemod: split registry/PipelineRegistry.scala (10k+ lines)
into per-family registry files seamed through SparkEntry.dmerge.
Pure reorganization — every (name -> entry) pair is moved verbatim;
a name-set equality check guards the move."""
import re, sys, os

SRC = "src/main/scala/graft/registry/PipelineRegistry.scala"
OUT_DIR = "src/main/scala/graft/registry"

FAMILIES = {
    "TextRegistry": """Text-analysis registry: tokenization, quality, language
  * ID, LM scoring, extraction/normalization, fingerprints — the
  * `documents`-table curation family.""",
    "DedupRegistry": """Dedup registry: exact / Jaccard-PPJoin / MinHash-LSH /
  * SimHash / CDC / line / survivorship / containment dedup and the
  * linkage helpers around them.""",
    "SimilarityRegistry": """Similarity/ANN registry: embedding pairs, top-k
  * (brute / LSH / IVF / PQ), semantic diff/join, vector transforms and
  * cluster diagnostics.""",
    "DriftRegistry": """Drift-monitor registry: numeric/categorical/embedding
  * drift, cell localization, cross-snapshot matching and the
  * compression-layer staleness monitors.""",
    "MultimodalRegistry": """Multimodal registry: image/audio/video headers,
  * perceptual hashes, frame planning and joint near-dup.""",
    "EventsRegistry": """Event-stream registry: sessions, funnels, attribution,
  * temporal joins, retention/LTV and time-series smoothing.""",
    "WalksRegistry": """Graph registry: PageRank-class checks, communities,
  * triangles, and the DeepWalk/node2vec walk-corpus family.""",
    "StatsRegistry": """Classical-statistics registry: hypothesis tests,
  * effect sizes, agreement, distribution diagnostics.""",
    "ExperimentRegistry": """Experimentation registry: SRM, A/B readouts,
  * variance reduction, sequential tests and causal estimators.""",
}

FAM_OF = {}
def fam(names, f):
    for n in names.split():
        FAM_OF[n] = f

fam("""q_text_tokens q_text_quality q_text_langid q_text_fingerprint
  q_repetition q_tfidf q_gopher_rules q_collocations q_curation_pipeline
  q_text_normalize q_split_sentences q_url_parse q_html_extract q_pii_redact
  q_decontaminate q_unigram_lm q_bigram_lm q_perplexity_buckets q_chunk_docs
  q_pack_sequences q_vocab_topk q_corpus_stats q_bpe_planted q_skipgrams
  q_feature_hash q_kneser_ney q_mojibake q_script_detect q_distinct_n
  q_burstiness q_entropy_rate q_topic_tags q_token_fertility q_bm25
  q_token_budget q_pack_windows q_naive_bayes q_quality_classifier
  q_quality_gate q_dsir_weights q_luhn_screen""", "TextRegistry")
fam("""q_dedup_exact q_dedup_jaccard q_dedup_minhash q_dedup_corpus
  q_dedup_simhash q_lsh_plan q_planted_minhash q_planted_simhash
  q_golden_record q_line_dedup q_cdc_dedup q_incremental_dedup q_dedup_index
  q_contamination_matrix q_dup_ngrams q_dup_spans q_containment q_fuzzy_match
  q_entity_resolution q_survivorship q_url_dedup q_semantic_dedup""",
    "DedupRegistry")
fam("""q_embed_cosine_pairs q_ann_topk q_hard_negatives q_ann_lsh
  q_planted_ann q_semantic_diff q_semantic_join q_hyperplane_plan
  q_cell_medoids q_planted_ivf q_gram_matrix q_top_component
  q_label_centroids q_kmeans_planted q_pq_planted q_pq_adc q_pq_ivf
  q_ivf_recall q_vec_l2norm q_vec_quant q_vec_standardize q_mmr_diverse
  q_triplet_mining q_rand_project q_embed_outliers q_silhouette
  q_rrf_fuse""", "SimilarityRegistry")
fam("""q_psi_drift q_drift_localize q_column_drift q_cell_mass_drift
  q_cell_matching q_cluster_agreement q_pq_recon_drift q_mmd_drift
  q_centroid_drift q_expectations_drift q_psi""", "DriftRegistry")
fam("""q_multimodal_meta q_multimodal_frames q_video_meta q_frame_timestamps
  q_image_neardup q_image_verified_dedup q_audio_neardup
  q_multimodal_dedup""", "MultimodalRegistry")
fam("""q_events_window q_asof_join q_events_sessions q_rolling_median
  q_hopping_counts q_session_window_builtin q_range_join q_interval_overlap
  q_purchase_attribution q_attribution_outer q_row_changes q_merge_upsert
  q_funnel q_retention q_cohort_ltv q_rfm q_user_paths q_event_transitions
  q_rolling_anomaly q_cum_users q_dwell_time q_incremental_agg q_scd_history
  q_compact_latest q_gap_fill q_interpolate_daily q_ewma q_seasonal_baseline
  q_seasonal_strength q_holt q_changepoint q_basket_pairs q_frequent_triples
  q_bot_score q_domain_budget""", "EventsRegistry")
fam("""q_pagerank_checks q_triangles q_kcore q_hits q_ppr q_lpa
  q_random_walks q_walk_skipgrams q_weighted_walks q_node2vec_walks
  q_degree_cap""", "WalksRegistry")
fam("""q_welch_t q_ks_test q_mutual_info q_ks_by_segment q_qq_table q_bh_fdr
  q_mann_whitney q_cliffs_delta q_hodges_lehmann q_logrank q_isotonic q_tost
  q_nelson_aalen q_paired_t q_odds_ratio q_tukey_hsd q_cronbach q_theil_index
  q_capture_recapture q_mean_excess q_ks_uniform q_friedman q_cochran_q
  q_ess q_ece q_icc q_runs_test q_median_ci q_jarque_bera q_ljung_box
  q_best_split q_eb_shrinkage q_mantel_haenszel q_cochran_armitage
  q_partial_corr q_hill_alpha q_by_fdr q_wilcoxon_signed q_weighted_kappa
  q_gwet_ac1 q_g_test q_confusion_stats q_benford q_acf q_theil_sen
  q_decompose q_prop_test q_spearman q_kendall q_cohens_kappa q_fleiss_kappa
  q_krippendorff q_corr_matrix q_chi2 q_kaplan_meier q_cusum q_winsorize
  q_robust_outliers q_iqr_outliers q_fairness q_pass_at_k
  q_bootstrap_ci""", "StatsRegistry")
fam("""q_srm q_switchback q_cluster_z q_srm_by_segment q_aa_calibration
  q_relative_lift q_ab_proportions q_cuped q_ratio_ci q_jackknife_ci
  q_mcnemar q_mde q_did q_always_valid q_winsorized_effect q_uplift q_qte
  q_post_strat q_bootstrap_delta q_perm_test q_rdd
  q_iv_wald""", "ExperimentRegistry")
# everything else (relational / sketches / sampling / privacy / layout)
# stays in PipelineRegistry

HEADER = """package graft

import graft.functions.{TokenArray, WordShingles}
import graft.operators._
import graft.sources.{FormatSide, MemorySide, ParquetSide}
import graft.types.TypeRender

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
"""

lines = open(SRC).read().split("\n")

def region(start_pat):
    s = next(i for i, l in enumerate(lines) if re.match(start_pat, l))
    e = next(i for i in range(s + 1, len(lines)) if lines[i] == "  )")
    return s, e  # entries live in (s, e) exclusive

def parse(s, e):
    starts = [i for i in range(s + 1, e)
              if re.match(r'^    "q_[a-z0-9_]+" ->', lines[i])]
    ext = []
    prev_end = s + 1
    for st in starts:
        p = st
        while p - 1 >= prev_end and (
                lines[p - 1].strip() == "" or
                lines[p - 1].lstrip().startswith("//")):
            p -= 1
        ext.append(p)
        prev_end = st + 1
    entries = []
    for j, st in enumerate(starts):
        lo = ext[j]
        hi = ext[j + 1] if j + 1 < len(starts) else e
        name = re.match(r'^    "(q_[a-z0-9_]+)"', lines[st]).group(1)
        body = lines[lo:hi]
        while body and body[-1].strip() == "":
            body.pop()
        if body[-1].rstrip().endswith(","):
            body[-1] = body[-1].rstrip()[:-1]
        entries.append((name, "\n".join(body)))
    return entries

qs, qe = region(r"^  def queries")
os_, oe = region(r"^  def oracles")
q_entries = parse(qs, qe)
o_entries = parse(os_, oe)

q_names = [n for n, _ in q_entries]
o_names = [n for n, _ in o_entries]
assert len(set(q_names)) == len(q_names)
assert len(set(o_names)) == len(o_names)
assert set(o_names) <= set(q_names), set(o_names) - set(q_names)

unknown = [n for n in q_names if n not in FAM_OF]
by_fam_q, by_fam_o = {}, {}
for n, t in q_entries:
    by_fam_q.setdefault(FAM_OF.get(n, "PipelineRegistry"), []).append((n, t))
for n, t in o_entries:
    by_fam_o.setdefault(FAM_OF.get(n, "PipelineRegistry"), []).append((n, t))

def emit(obj, doc, qents, oents):
    parts = [HEADER]
    parts.append("/** %s\n  * (split out of PipelineRegistry in r17 — entries moved verbatim).\n  */" % doc)
    parts.append("private[graft] object %s {" % obj)
    parts.append("  import Tables.t")
    parts.append("  import RegistryFixtures._")
    parts.append("  import SparkEntry.dmap\n")
    if qents:
        parts.append("  def queries: Map[String, (SparkSession, String) => DataFrame] = dmap(")
        parts.append(",\n\n".join(t for _, t in qents))
        parts.append("  )\n")
    else:
        parts.append("  def queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty\n")
    if oents:
        parts.append("  def oracles: Map[String, String] = dmap(")
        parts.append(",\n\n".join(t for _, t in oents))
        parts.append("  )")
    else:
        parts.append("  def oracles: Map[String, String] = Map.empty")
    parts.append("}")
    return "\n".join(parts) + "\n"

for obj, doc in FAMILIES.items():
    with open(os.path.join(OUT_DIR, obj + ".scala"), "w") as f:
        f.write(emit(obj, doc, by_fam_q.get(obj, []), by_fam_o.get(obj, [])))

# rewrite PipelineRegistry with the remainder
rem_q = by_fam_q.get("PipelineRegistry", [])
rem_o = by_fam_o.get("PipelineRegistry", [])
doc = """Relational / sketch / sampling / privacy / layout registry — the
  * remainder after the r17 per-family split (pivot/cube/window analytics,
  * approximate sketches, deterministic sampling and splits, anonymity,
  * space-filling-curve layout keys, federation)."""
with open(SRC, "w") as f:
    f.write(emit("PipelineRegistry", doc, rem_q, rem_o))

print("queries:", len(q_names), "oracles:", len(o_names))
print("unknown->PipelineRegistry:", len(unknown))
for obj in list(FAMILIES) + ["PipelineRegistry"]:
    nq = len(by_fam_q.get(obj, []))
    no = len(by_fam_o.get(obj, []))
    print("%-22s q=%3d o=%3d" % (obj, nq, no))
with open("/tmp/names_before.txt", "w") as f:
    f.write("\n".join(sorted(q_names)) + "\n--\n" + "\n".join(sorted(o_names)))
