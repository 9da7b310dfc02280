"""Physical-plan audit: assert that headline queries compile to the plans a
100 TB deployment needs — filters pushed to the parquet scan, column-pruned
schemas, broadcast joins for small dims, TakeOrderedAndProject for top-n
(never a global sort), and no accidental cartesian products.

Usage: python tools/explain_audit.py [sf_dir]
Prints PLAN-OK / PLAN-WARN lines + a summary; exit 1 on hard failures.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# query -> (must_contain regexes, must_NOT_contain regexes)
#
# "No shuffle" pins forbid KEYED exchanges (hash/range partitioning) AND
# single-partition collapses (r17, per r16 advice): the r16 fan()
# repartition adds one benign round-robin Exchange that spreads the
# single-row-group bench scans across cores (OPTIMIZATION_r16.md wave 1)
# — it moves no data by key and disappears when inputs arrive wide, so
# the scale claim these pins protect (no data-dependent shuffle) is
# unchanged; round-robin is now the ONLY exempted exchange kind, so a
# regression that collapses a map-only query onto one partition (an
# unpartitioned window, a global sort) is caught again.
CHECKS: dict[str, tuple[list[str], list[str]]] = {
    # filter + projection pushdown reach the scan
    "f4_filter_surface": [[r"PushedFilters: \[.*IsNotNull"], [r"CartesianProduct"]],
    # top-n compiles to TakeOrderedAndProject, not Sort+Limit-after-Exchange
    "a2_global_topn": [[r"TakeOrderedAndProject"], [r"GlobalSort"]],
    "w3_top_nodes": [[r"TakeOrderedAndProject"], []],
    # explicit broadcast of the small dimension
    "j7_broadcast_join": [[r"BroadcastHashJoin"], [r"CartesianProduct"]],
    "g5_linkdumper": [[r"BroadcastHashJoin"], []],
    # multi-way join: dims must broadcast (AQE or static), fact never does
    "j3_multiway_join": [[r"BroadcastHashJoin|SortMergeJoin"], [r"CartesianProduct"]],
    # aggregations: partial (map-side) aggregation present
    "a1_stats_by_flag": [[r"HashAggregate"], [r"CartesianProduct"]],
    "a4_group_count": [[r"HashAggregate"], []],
    # window rank: single shuffle on the partition key
    "w1_generate_topk": [[r"Window|WindowGroupLimit"], [r"CartesianProduct"]],
    # dedup family: shuffles keyed on band/shingle, no cross product
    "dp_minhash_lsh": [[r"HashAggregate"], [r"CartesianProduct"]],
    # the ACTIVE hot-bucket guard: census broadcasts (BroadcastHashJoin),
    # band self-join stays an equi-join — never a cross product even with
    # 11-member (10-copy) planted clusters
    "dp_minhash_flood": [[r"HashAggregate", r"BroadcastHashJoin"],
                         [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # dHash hot-band-key cap ACTIVE: the band census broadcasts, the
    # banded candidate join stays an equi-join on (band, bkey)
    "mm_dhash_flood": [[r"BroadcastHashJoin"],
                       [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # cluster-mode dedup: the member expansion is an equi-join on the
    # representative — members never self-join (no pair blowup, no cross
    # product anywhere in the quotient chain)
    "mm_dhash_clusters": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                          [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    "dp_minhash_clusters": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                            [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # retention chain: ONE component shuffle shared by both windows, no
    # cross product anywhere from clusters through the canonical pick
    "dp_cluster_retention": [[r"Window"],
                             [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # video cluster mode: set-digest groupBy + frame-hash equi-join over
    # representatives; never a cross product
    "mm_video_clusters": [[r"HashAggregate"],
                          [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    "dp_ngram_jaccard": [[r"HashAggregate"], [r"CartesianProduct"]],
    # LM perplexity: model joins broadcast, one groupBy, no cross product
    "dp_lm_perplexity": [[r"BroadcastHashJoin", r"HashAggregate"], [r"CartesianProduct"]],
    # SemDeDup: within-cell equi-join, never a corpus cross product
    "dp_semantic_dedup": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"], [r"CartesianProduct"]],
    # embedding near-dup must be a bucket equi-join, NOT a cross product
    "dp_embedding_near_dup": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                              [r"CartesianProduct"]],
    # brute-force ANN is the one INTENDED broadcast nested loop
    "dp_cosine_topk": [[r"BroadcastNestedLoopJoin"], []],
    # column pruning: token stats reads only doc_id and text
    "dp_token_stats": [[r"ReadSchema: struct<doc_id:bigint,text:string>"], []],
    # bounded inlink cap: windowed pre-cap BEFORE the collect aggregate —
    # no post-agg slice of an unbounded array (VERDICT r1 hazard #2)
    "g1_invert_capped": [[r"dense_rank"], [r"slice"]],
    "w5_topk_contribs": [[r"row_number|WindowGroupLimit"], [r"slice"]],
    # hostdb quota lookup broadcasts; the fetchlist never reshuffles for it
    "w1_host_limit": [[r"BroadcastHashJoin"], [r"CartesianProduct"]],
    # forced-refetch updatedb round: two keyed shuffles, no cross product
    "j2_forced_refetch": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                          [r"CartesianProduct"]],
    # indexing filter chain is a pure projection: no exchange at all
    "j3_index_fields": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"CartesianProduct"]],
    # repetition metrics: explode + partial-aggregated groupBys, no cross
    "dp_gopher_repetition": [[r"HashAggregate"], [r"CartesianProduct"]],
    # paragraph dedup: ONE exchange (on the paragraph hash) feeds the window
    "dp_paragraph_dedup": [[r"Window"], [r"CartesianProduct"]],
    # mixture sampling: weights dim broadcasts; corpus is never exchanged
    "dp_mix_weighted": [[r"BroadcastHashJoin"], [r"Exchange hashpartitioning",
                                                 r"CartesianProduct"]],
    # PII scrub: map-only — no exchange, no join
    "dp_pii_scrub": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    # int8 ANN: the intended broadcast NLJ (queries tiny, corpus streams)
    "dp_int8_topk": [[r"BroadcastNestedLoopJoin"], []],
    # PQ ANN: same intended broadcast NLJ, corpus streams 16-byte codes
    "dp_pq_topk": [[r"BroadcastNestedLoopJoin"], [r"CartesianProduct"]],
    # skew-salted join: hot/cold Union, census broadcasts, no cartesian
    "dp_skew_salted_join": [[r"Union", r"BroadcastHashJoin"],
                            [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # KMV sketch: one partial-aggregated groupBy, no join at all
    "dp_kmv_distinct": [[r"HashAggregate|ObjectHashAggregate|SortAggregate"],
                        [r"CartesianProduct", r"Join"]],
    # count-min: sketch aggregation + BROADCAST lookup join, no cartesian
    "dp_countmin_freq": [[r"HashAggregate", r"BroadcastHashJoin"],
                         [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # RRF fusion: union of bounded top-k lists + hash agg, no cartesian
    # (the one BNLJ inside is brute_force_topk's intended broadcast scan)
    "dp_hybrid_rrf": [[r"HashAggregate", r"Union"], [r"CartesianProduct"]],
    # vocab coverage: one corpus hash-agg, windows over the vocab only
    "dp_vocab_coverage": [[r"HashAggregate", r"Window"], [r"CartesianProduct"]],
    # token spectrum: two hash aggregations, constant-size output
    "dp_token_spectrum": [[r"HashAggregate"], [r"CartesianProduct", r"Join"]],
    # decontamination: benchmark grams BROADCAST against exploded corpus
    "dp_decontaminate": [[r"BroadcastHashJoin"], [r"CartesianProduct"]],
    # sessionization: one exchange on the key feeds the session aggregation
    "st_session_windows": [[r"HashAggregate|SortAggregate"], [r"CartesianProduct"]],
    # gone/retry schedule rides the same two-keyed-shuffle updatedb plan
    "j2_gone_schedule": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                         [r"CartesianProduct"]],
    # multimodal metadata: map-only, payload never leaves the JVM
    "mm_binary_metadata": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join", r"mapInPandas|MapInPandas"]],
    # geoip: bucketed BROADCAST equi-join, not a nested-loop range scan
    "j_geoip_range": [[r"BroadcastHashJoin"], [r"BroadcastNestedLoopJoin",
                                               r"CartesianProduct"]],
    # trained langid: profile table broadcasts; trigram scoring is a keyed
    # aggregate + doc-partitioned window — never a cross product
    "dp_langid": [[r"BroadcastHashJoin", r"HashAggregate"], [r"CartesianProduct"]],
    # C4 cleaning: map-only array lambdas — no exchange, no join
    "dp_c4_clean": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    # URL blocklist: map-only literal chain
    "dp_url_blocklist": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    # mojibake repair: pure JVM translate/encode/decode, map-only, no UDF
    "dp_fix_mojibake": [[], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join", r"MapInPandas|mapInPandas",
                             r"BatchEvalPython"]],
    # PDF round-trip: two chained Python stages, no shuffle between them
    "p2_pdf_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    # legacy .doc round trip: same narrow map-only shape as the PDF path
    "p2_doc_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    # NB classify: vocab joins via broadcast, one groupBy shuffle, no cross
    "pf_nb_classify": [[r"BroadcastHashJoin", r"HashAggregate"], [r"CartesianProduct"]],
    # regex parse filter: pure map, no exchange at all
    "pf_regex_fields": [[r"Project"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition|CartesianProduct"]],
    # ExactSubstr spans: keyed gram aggregate + semi-join + island window —
    # never a cartesian, never a row-amplifying inner join on the gram
    "dp_substring_spans": [[r"LeftSemi", r"Window"], [r"CartesianProduct"]],
    # span removal: the spans side keeps the semi-join; the apply is a
    # doc-keyed join + narrow array filter — no cross product
    "dp_substring_removal": [[r"LeftSemi", r"Window"], [r"CartesianProduct"]],
    # keep-one swaps the semi-join for ONE window on the gram hash
    "dp_substring_keepone": [[r"Window"], [r"CartesianProduct"]],
    # BPE apply: the merge chain is a pure map stage (literal replaces in
    # codegen) — tokenization must never shuffle the corpus
    "dp_bpe_apply": [[r"Project"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"CartesianProduct"]],
    # BPE pair stats: explode + partially-aggregated groupBy over the vocab
    "dp_bpe_pair_counts": [[r"HashAggregate"], [r"CartesianProduct"]],
    # temperature weights: one corpus hash-agg; windows only on the
    # sources-sized aggregate
    "dp_mix_temperature": [[r"HashAggregate"], [r"CartesianProduct"]],
    # composed cleaning pipeline: fingerprint window + broadcast gram join,
    # never a corpus self-join
    # the dedup Window runs inside the scrub checkpoint's sub-plan (plan
    # truncation is the point); the decontamination gram join must still
    # BROADCAST and nothing may degrade to a cross product
    "dp_pipeline_clean": [[r"BroadcastHashJoin"], [r"CartesianProduct"]],
    # containment pairs: inverted fingerprint index equi-join, capped hot
    # keys — never all-pairs
    "dp_winnowing_containment": [[r"HashAggregate"], [r"CartesianProduct"]],
    # sharding balance: one corpus hash-agg; the empty-shard join is
    # against a range() dim, never a corpus re-shuffle
    "dp_shard_balance": [[r"HashAggregate"], [r"CartesianProduct"]],
    # Gopher quality rules: map-only column math — no exchange, no join
    "dp_gopher_quality": [[], [r"Exchange hashpartitioning", r"Join"]],
    # BM25: term-filtered postings aggregate; df + global scalars broadcast;
    # top-k, never a corpus self-join
    "dp_bm25_topk": [[r"HashAggregate", r"BroadcastHashJoin"], [r"CartesianProduct"]],
    # DSIR: bucket ratio table broadcasts into the scoring join; the 1-row
    # gram-total tables ride the intended broadcast nested-loop cross join
    # (r7 rework: NO plan-build count() actions survive)
    "dp_dsir_weights": [[r"BroadcastHashJoin", r"HashAggregate",
                         r"BroadcastNestedLoopJoin"], [r"CartesianProduct"]],
    # multimodal decode certifications: JVM header assembly → ONE Arrow map
    # stage — no shuffle, no join, at any corpus size
    "mm_image_dimensions": [[r"MapInPandas|mapInPandas"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    "mm_tiff_dimensions": [[r"MapInPandas|mapInPandas"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    "mm_audio_features": [[r"MapInPandas|mapInPandas"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join"]],
    # ODT/EPUB round-trips: two chained Python stages, no shuffle between
    "p2_odt_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    "p2_epub_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    "p2_wpd_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    "p2_iwork_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    "p2_chm_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    "p2_cab_extract": [[r"MapInPandas|mapInPandas"], [r"Exchange hashpartitioning"]],
    # chunking: split → sequence → explode → slice, all JVM — no shuffle
    "dp_chunking": [[r"Generate|Explode"], [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join", r"MapInPandas|mapInPandas"]],
    # politeness fetch: ONE host-keyed exchange lays out the fetchlist, the
    # Arrow fetch stage runs per-partition, then a partial-agg rollup —
    # never a second corpus shuffle before the fetch
    "p1_politeness": [[r"MapInPandas|mapInPandas", r"HashAggregate"],
                      [r"CartesianProduct", r"Join"]],
    # round-10 binary byte path: one Arrow fetch stage then pure codegen —
    # no Python decode stage after the harness, no join, no aggregate
    "p1_fetch_binary_pipeline": [[r"MapInPandas|mapInPandas"],
                                 [r"CartesianProduct", r"Join", r"HashAggregate"]],
    # email tail: one Python batch stage, no shuffle
    "p2_eml_extract": [[r"MapInPandas|mapInPandas"],
                       [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # dHash: map-only decode stage
    "mm_image_dhash": [[r"MapInPandas|mapInPandas"],
                       [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # WebP pixels through the system libwebp: same map-only shape
    "mm_webp_dhash": [[r"MapInPandas|mapInPandas"],
                      [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # AVIF/HEIC pixels through the system libavif/libheif: same shape
    "mm_heif_dhash": [[r"MapInPandas|mapInPandas"],
                      [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # PSD / MIDI tails: same map-only shape
    "p2_psd_extract": [[r"MapInPandas|mapInPandas"],
                       [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "p2_midi_extract": [[r"MapInPandas|mapInPandas"],
                        [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "mm_mkv_info": [[r"MapInPandas|mapInPandas"],
                    [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "mm_mp4_info": [[r"MapInPandas|mapInPandas"],
                    [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "p2_font_extract": [[r"MapInPandas|mapInPandas"],
                        [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "mm_exif_meta": [[r"MapInPandas|mapInPandas"],
                     [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # banded Hamming join: equi-joins on band keys, never an all-pairs cross
    "mm_dhash_neardup": [[r"Join"], [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    "p2_7z_extract": [[r"MapInPandas|mapInPandas"],
                      [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    "p2_ical_extract": [[r"MapInPandas|mapInPandas"],
                        [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # script detection: pure JVM regexp_count, map-only
    "dp_script_detect": [[], [r"CartesianProduct", r"Join", r"HashAggregate",
                              r"MapInPandas|mapInPandas", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # audio fingerprint: map-only decode+FFT stage
    "mm_audio_fingerprint": [[r"MapInPandas|mapInPandas"],
                             [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # embedded-media dHash: container unzip + pixel decode, map-only
    "mm_embedded_dhash": [[r"MapInPandas|mapInPandas"],
                          [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # video frame dHash: AVI walk + JPEG decode, map-only
    "mm_video_frame_dhash": [[r"MapInPandas|mapInPandas"],
                             [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # video near-dup: inverted frame-hash index — equi-join candidates
    # with map-side-aggregated pair counts, never an all-pairs cross
    "mm_video_neardup": [[r"Join", r"HashAggregate"],
                         [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # MPEG-1 audio decode + FFT fingerprint, map-only
    "mm_mpeg_fingerprint": [[r"MapInPandas|mapInPandas"],
                            [r"CartesianProduct", r"Join", r"HashAggregate", r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # audio near-dup: banded Hamming equi-joins, never an all-pairs cross
    "mm_audio_neardup": [[r"Join"],
                         [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # quantile sketch: map-side hash-sample filter BEFORE the one
    # exact-percentile aggregation; no join, no window
    "dp_quantile_sketch": [[r"SortAggregate|ObjectHashAggregate|HashAggregate"],
                           [r"Join", r"Window", r"CartesianProduct"]],
    # stratified fixed-n: WindowGroupLimit bounds per-source state
    "dp_stratified_n": [[r"WindowGroupLimit"],
                        [r"Join", r"CartesianProduct"]],
    # co-citation: hot-source guard anti-join + src equi-self-join + one
    # pair aggregation — never an all-pairs cross
    "g_cocitation": [[r"HashAggregate", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                     [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # NFC normalization: map-only Arrow-batched pandas_udf, no shuffle
    "dp_unicode_nfc": [[r"ArrowEvalPython|BatchEvalPython"],
                       [r"Exchange (hash|range)partitioning|Exchange SinglePartition", r"Join", r"CartesianProduct"]],
    # token-budget sample: ONE keyed window cumsum, no join
    "dp_token_budget": [[r"Window"],
                        [r"Join", r"CartesianProduct"]],
    # quality deciles: ONE keyed ntile window, no join
    "dp_quality_bins": [[r"Window"],
                        [r"Join", r"CartesianProduct"]],
    # Bloom frontier: bit_or hash agg to build, BROADCAST probe join
    "dp_bloom_frontier": [[r"HashAggregate", r"BroadcastHashJoin"],
                          [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # stream-stream join's batch twin: an equi+range join, never a cross
    "st_stream_join": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                       [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # MP3 side-info walk: map-only Arrow stage, payload pruned elsewhere
    "mm_mp3_sideinfo": [[r"MapInPandas|mapInPandas"],
                        [r"CartesianProduct", r"Join", r"HashAggregate",
                         r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # left-outer salted join: same hot/cold Union + broadcast census as
    # the inner form — outer mode must not degrade to BNLJ/cartesian
    "dp_skew_left_join": [[r"Union", r"BroadcastHashJoin"],
                          [r"CartesianProduct", r"BroadcastNestedLoopJoin"]],
    # sketch-mode stats: count-min build is a hash agg, the lookup join
    # and the 1-row KMV cross both BROADCAST; corpus never re-shuffles
    "a1_stats_sketch": [[r"HashAggregate", r"BroadcastHashJoin"],
                        [r"CartesianProduct"]],
    # per-host KMV: WindowGroupLimit bounds the per-host sketch BEFORE
    # the exchange — k rows per host per partition, never the full set
    "a3_kmv_hosts": [[r"WindowGroupLimit", r"HashAggregate"],
                     [r"CartesianProduct", r"Join"]],
    # boilerplate lines: df aggregate + equi-join back, no UDF, no cross
    "dp_boilerplate_lines": [[r"HashAggregate", r"Join"],
                             [r"CartesianProduct", r"MapInPandas|mapInPandas",
                              r"BroadcastNestedLoopJoin"]],
    # minhash recall: pair equi-join of two bounded pair sets
    "dp_minhash_recall": [[r"Join"],
                          [r"CartesianProduct", r"MapInPandas|mapInPandas",
                           r"BroadcastNestedLoopJoin"]],
    # dataset card: two partial-aggregated groupBys, sources-sized join
    "dp_dataset_card": [[r"HashAggregate|SortAggregate"],
                        [r"CartesianProduct", r"MapInPandas|mapInPandas"]],
    # Ogg page walk: map-only Arrow stage like the MP3 side-info walk —
    # no join, no aggregate, no exchange anywhere in the plan
    "mm_ogg_identity": [[r"MapInPandas|mapInPandas"],
                        [r"CartesianProduct", r"Join", r"HashAggregate",
                         r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
    # cluster-canonical retention: rank + member-count windows share ONE
    # component shuffle; the signals join is an equi-join, never a cross
    "dp_cluster_canonical": [[r"Window", r"Join"],
                             [r"CartesianProduct",
                              r"BroadcastNestedLoopJoin"]],
    # feature-hashing embeddings: two partial-aggregated hash aggs and
    # the zero-token left join — no window, no Python stage, no cross
    "dp_text_embed": [[r"HashAggregate"],
                      [r"CartesianProduct", r"Window",
                       r"MapInPandas|mapInPandas",
                       r"BroadcastNestedLoopJoin"]],
    # text → embed → near-dup chain: candidates from the sign-bucket
    # equi-join, never a cross product or nested loop
    "dp_text_embed_neardup": [[r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
                              [r"CartesianProduct",
                               r"BroadcastNestedLoopJoin"]],
    # audio tags: map-only Arrow stage like the other media-identity rows
    "mm_audio_tags": [[r"MapInPandas|mapInPandas"],
                      [r"CartesianProduct", r"Join", r"HashAggregate",
                       r"Exchange (hash|range)partitioning|Exchange SinglePartition"]],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from nutch_spark.plans import REGISTRY
    from nutch_spark.session import get_spark

    spark = get_spark("explain_audit")
    spark.sparkContext.setLogLevel("ERROR")

    failures = 0
    for name, (must, must_not) in CHECKS.items():
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        problems = []
        for pat in must:
            if not re.search(pat, plan):
                problems.append(f"missing /{pat}/")
        for pat in must_not:
            if re.search(pat, plan):
                problems.append(f"forbidden /{pat}/ present")
        if problems:
            failures += 1
            print(f"PLAN-FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PLAN-OK   {name}")
    print(f"\n{len(CHECKS) - failures} ok, {failures} failed")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
