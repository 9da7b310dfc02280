"""Scoring-filter surface (§2.11) — the pluggable score hooks as Columns.

The reference routes scoring through a ScoringFilter chain with five hooks
(injectedScore / initialScore / generatorSortValue / distributeScoreToOutlinks
/ indexerScore). Those hooks already live inside the operators they affect
— inject (score_injected), generate (sort_score), emit_parse_rows (OPIC
share + urlmeta/datum metadata propagation), indexing_join (boost_expr).
This module collects the per-plugin EXPRESSIONS a deployment composes into
them, so switching scoring plugins is a parameter choice, not an operator
rewrite:

- scoring-opic   (OPICScoringFilter.java) — the default wiring
- scoring-link   (scoring-link/.../LinkAnalysisScoringFilter.java)
- scoring-depth  (operators/depth.py, D4)
- scoring-orphan (operators/orphan.py, D8)
- scoring-similarity (operators/orphan.py similarity part, D5)
- scoring-metadata (scoring-metadata/.../MetadataScoringFilter.java) —
  datum_meta_keys on emit_parse_rows (crawldb metadata → outlink targets);
  the urlmeta plugin's parse-meta variant is urlmeta_keys there
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def opic_indexer_boost(score: Column | str = "score") -> Column:
    """OPICScoringFilter.indexerScore (:178-187): pow(score, scorePower)
    with the default indexer.score.power = 0.5."""
    c = F.col(score) if isinstance(score, str) else score
    return F.pow(F.coalesce(c, F.lit(0.0)), 0.5)


def link_indexer_boost(
    score: Column | str = "score", *, normalized_score: float = 1.0
) -> Column:
    """LinkAnalysisScoringFilter.indexerScore (:52-59): the LinkRank score
    from the crawldb scaled by link.analyze.normalize.score — no square
    root, the webgraph already normalized it."""
    c = F.col(score) if isinstance(score, str) else score
    return F.lit(float(normalized_score)) * F.coalesce(c, F.lit(0.0))


def link_generator_sort(
    score: Column | str = "score", *, init_sort: float = 1.0
) -> Column:
    """LinkAnalysisScoringFilter.generatorSortValue (:45-49):
    datum.score * initSort — pass as ``generate(sort_score=...)``."""
    c = F.col(score) if isinstance(score, str) else score
    return F.coalesce(c, F.lit(0.0)) * F.lit(float(init_sort))


def link_initial_score() -> Column:
    """LinkAnalysisScoringFilter.initialScore (:61-65): newly discovered
    pages start at 0.0 — the webgraph assigns real mass later."""
    return F.lit(0.0)
