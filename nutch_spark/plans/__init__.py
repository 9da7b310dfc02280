"""Query plans for the driver's correctness/bench harness.

Importing this package populates REGISTRY with every declared query
(name -> (spark_fn, oracle_sql | None)).
"""

from nutch_spark.plans.driver_queries import REGISTRY

from nutch_spark.plans import coverage_queries  # noqa: E402,F401  (registers a10/d2/d4/d5/d8/f2)
from nutch_spark.plans import datapipe_queries  # noqa: E402,F401  (registers dp_*)
from nutch_spark.plans import graph_queries  # noqa: E402,F401  (registers g/j/w/st_*)
from nutch_spark.plans import scalar_queries  # noqa: E402,F401  (registers f1/d7_*)

# The driver's correctness harness samples a prefix of this registry each
# round. Rotate least-recently-certified queries to the front so every query
# gets a driver-green row. Round-7 ordering (per the round-6 verdict):
# a9_node_rollup's only driver row ever (r01) was a FAIL, so it leads; then
# the 9 queries last driver-certified in r01-r03; then queries touched by
# this round's code changes (f2 predicate fix); then the rest of the r06
# rotation order.
_CERTIFY_FIRST = [
    # never driver-green: its only sample (r01) predates the r02 fix
    "a9_node_rollup",
    # last driver-certified in r01-r03
    "w3_top_nodes", "g5_linkdumper", "d1_grouped_dedup", "j6_hostdb_agg",
    "st_tumbling_window", "j10_crawldb_merge", "f1_url_normalize",
    "f1_url_parts", "d7_text_profile_sig",
    # code changed this round (url_filter_predicate fast path) — recertify
    "f2_filter_chain",
    # new in round 7 (multimodal stdlib decoders, fetch bench support)
    "mm_image_dimensions", "mm_audio_features",
    # r06-certified, keep cycling in recency order (oldest first)
    "dp_langid_stopword", "dp_gopher_repetition", "dp_paragraph_dedup",
    "dp_mix_weighted", "dp_dup_components", "dp_pii_scrub", "dp_int8_topk",
    "dp_decontaminate", "dp_seq_packing", "mm_binary_metadata", "dp_split",
    "dp_cross_corpus_dedup", "dp_lsh_recall", "dp_c4_clean",
    "dp_url_blocklist", "dp_substring_spans", "f1_scoped_normalize",
    "dp_minhash_lsh", "dp_simhash", "dp_token_stats", "dp_quality",
    "dp_langid", "dp_cosine_topk", "dp_embedding_near_dup", "dp_lsh_topk",
    "dp_ivf_topk", "g3_linkrank", "j4_score_update",
    "dp_gopher_quality", "dp_bm25_topk", "dp_dsir_weights",
    "dp_shard_balance", "mm_frame_samples", "dp_winnowing_containment",
    "dp_pipeline_clean", "dp_mix_temperature", "dp_substring_keepone",
    "dp_substring_removal", "dp_dup_components_star", "dp_bpe_train",
    "dp_bpe_apply", "dp_bpe_pair_counts",
    "pf_regex_fields", "pf_nb_classify", "p2_doc_extract",
    "dp_semantic_dedup", "dp_lm_perplexity", "dp_ivf_recall",
    "p2_metatags", "p2_js_outlinks",
]


def _rotate_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _CERTIFY_FIRST if n in REGISTRY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY"]
