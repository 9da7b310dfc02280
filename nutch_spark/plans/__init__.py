"""Query plans for the driver's correctness/bench harness.

Importing this package populates REGISTRY with every declared query
(name -> (spark_fn, oracle_sql | None)).
"""

from nutch_spark.plans.driver_queries import REGISTRY

from nutch_spark.plans import coverage_queries  # noqa: E402,F401  (registers a10/d2/d4/d5/d8/f2)
from nutch_spark.plans import datapipe_queries  # noqa: E402,F401  (registers dp_*)
from nutch_spark.plans import graph_queries  # noqa: E402,F401  (registers g/j/w/st_*)
from nutch_spark.plans import scalar_queries  # noqa: E402,F401  (registers f1/d7_*)

# The driver's correctness harness samples a ~50-query prefix of this
# registry each round. Rotate least-recently-certified queries to the front
# so every query gets a driver-green row. Round-9 ordering: brand-new r09
# queries lead (never driver-sampled), then the 4 queries whose newest
# driver-green row is still r04 (they fell past the r08 window), then the
# 13 r06-certified queries, then the r07-certified 50 oldest-first; the
# r08-certified 50 sit last — they are the freshest records.
_CERTIFY_FIRST = [
    # new in round 9 — never driver-sampled
    "p2_wpd_extract", "p2_iwork_extract", "p2_chm_extract", "p2_cab_extract",
    # stale r04 rows — the only pre-r06 driver records left
    "st_session_windows", "j_geoip_range", "dp_exact_dedup",
    "dp_ngram_jaccard",
    # r06-certified
    "p2_metatags", "p2_js_outlinks", "pf_regex_fields", "pf_nb_classify",
    "p2_doc_extract", "dp_dup_components_star", "dp_substring_removal",
    "dp_semantic_dedup", "dp_lm_perplexity", "dp_ivf_recall",
    "dp_bpe_pair_counts", "dp_bpe_apply", "dp_bpe_train",
    # r07-certified (registry order); ~33 of these fit a 50-query window —
    # r10 mops up the tail
    "f2_filter_chain", "f1_url_normalize", "f1_url_parts", "dp_minhash_lsh",
    "dp_simhash", "dp_token_stats", "dp_quality", "dp_langid_stopword",
    "dp_langid", "dp_cosine_topk", "dp_embedding_near_dup", "dp_lsh_topk",
    "dp_ivf_topk", "dp_gopher_repetition", "dp_paragraph_dedup",
    "dp_mix_weighted", "dp_mix_temperature", "dp_dup_components",
    "dp_pii_scrub", "dp_int8_topk", "dp_decontaminate", "dp_seq_packing",
    "mm_binary_metadata", "mm_image_dimensions", "mm_audio_features",
    "dp_split", "dp_cross_corpus_dedup", "dp_lsh_recall", "dp_c4_clean",
    "dp_url_blocklist", "dp_substring_spans", "dp_substring_keepone",
    "dp_pipeline_clean", "dp_winnowing_containment", "mm_frame_samples",
    "dp_shard_balance", "dp_gopher_quality", "dp_bm25_topk",
    "dp_dsir_weights", "g3_linkrank", "j4_score_update", "a9_node_rollup",
    "w3_top_nodes", "g5_linkdumper", "d1_grouped_dedup", "j6_hostdb_agg",
    "st_tumbling_window", "j10_crawldb_merge", "f1_scoped_normalize",
    "d7_text_profile_sig",
]


def _rotate_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _CERTIFY_FIRST if n in REGISTRY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY"]
