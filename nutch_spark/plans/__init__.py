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
# so every query gets a driver-green row. Round-8 ordering (per the round-7
# verdict): brand-new r08 queries lead (never driver-sampled), then the 49
# queries whose newest driver-green row is r04 — starting with the ones
# whose code changed since r04 (p2_pdf_extract's parser changed in r07),
# then j9_*/w1_* and the rest in r04 registry order. Every other query has
# an r06/r07 driver row; r09 mops up whatever falls past the window.
_CERTIFY_FIRST = [
    # new in round 8 (TIFF/EXIF dims, OpenDocument text, politeness fetch
    # harness under oracle) — never driver-sampled
    "mm_tiff_dimensions", "p2_odt_extract", "p2_epub_extract", "p1_politeness",
    "dp_chunking",
    # code changed since its r04 row (PDF string-entry delimiter fix, r07)
    "p2_pdf_extract",
    # r04-certified, code-adjacent groups first
    "j9_segment_merge", "j9_merge_rule", "j9_dir_merge",
    "w1_generate_topk", "w1_host_limit",
    "p2_html_parse", "p2_feed_entries", "p4_robots_policy",
    "s10_sitemap_parse", "s1_seed_parse",
    # remaining r04-certified, registry order
    "a2_global_topn", "w4_dedup_rank", "w6_latest_wins", "a1_stats_by_flag",
    "a1_quantiles", "a3_group_numeric", "a3_value_counts", "a4_group_count",
    "a5_completion", "a6_json_props", "j1_inject_merge", "j2_state_machine",
    "j2_forced_refetch", "j2_gone_schedule", "j3_multiway_join",
    "j3_index_fields", "j7_broadcast_join", "g1_invert_capped", "a7_degrees",
    "f4_filter_surface", "f5_jexl_expr", "f8_hash_sample", "w5_topk_contribs",
    "d3_opic_share", "d6_adaptive_schedule", "d6_mime_adaptive",
    "u1_union_distinct", "a10_anchor_dedup", "d4_depth_propagation",
    "d8_orphan_mark", "d2_cleaning_targets", "d5_similarity_score",
    "dp_winnowing", "st_hostdb_state", "st_session_windows", "j_geoip_range",
    "dp_exact_dedup", "dp_ngram_jaccard",
    # r07-certified queries touched by round-8 code changes (url predicate
    # lambda autodetect) — recertify if the window allows
    "f2_filter_chain", "f1_url_normalize", "f1_url_parts",
]


def _rotate_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _CERTIFY_FIRST if n in REGISTRY}
    ordered.update((n, v) for n, v in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_rotate_registry()

__all__ = ["REGISTRY"]
