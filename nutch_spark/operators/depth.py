"""Depth scoring — crawl-frontier depth limiting (SURVEY.md §2.10 D4).

Reference: /root/reference/src/plugin/scoring-depth/.../DepthScoringFilter.java
:44-76 — every row carries ``_depth_`` (hops from a seed) and ``_maxdepth_``
metadata; outlink targets get depth = parent depth + 1 and are dropped when
they exceed the max. Pure column arithmetic over the metadata map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH_KEY = "_depth_"
MAX_DEPTH_KEY = "_maxdepth_"


def seed_depth(seeds: DataFrame, *, max_depth: int = 3) -> DataFrame:
    """Initialize depth metadata on seed rows (depth 0; per-seed max override
    via a pre-existing ``_maxdepth_`` entry wins)."""
    meta = F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>"))
    withmax = F.when(
        F.array_contains(F.map_keys(meta), MAX_DEPTH_KEY), meta
    ).otherwise(F.map_concat(meta, F.create_map(F.lit(MAX_DEPTH_KEY), F.lit(str(max_depth)))))
    return seeds.withColumn(
        "metadata",
        F.map_concat(
            F.map_filter(withmax, lambda k, _: k != DEPTH_KEY),
            F.create_map(F.lit(DEPTH_KEY), F.lit("0")),
        ),
    )


def propagate_depth(
    outlinks: DataFrame,
    parents: DataFrame,
    *,
    src: str = "from_url",
    default_max_depth: int = 3,
) -> DataFrame:
    """Assign child depth = parent depth + 1; DROP targets beyond max depth
    (DepthScoringFilter.java:44-76 — the frontier stops expanding there).

    ``outlinks`` rows carry ``src`` (the parent url); ``parents`` is the
    crawldb slice (url, metadata). Children inherit the parent's max."""
    p = parents.select(
        F.col("url").alias(src),
        F.coalesce(F.element_at("metadata", DEPTH_KEY).cast("int"), F.lit(0)).alias(
            "_parent_depth"
        ),
        F.coalesce(
            F.element_at("metadata", MAX_DEPTH_KEY).cast("int"),
            F.lit(default_max_depth),
        ).alias("_max_depth"),
    )
    joined = outlinks.join(p, src, "left").withColumn(
        "_child_depth", F.coalesce(F.col("_parent_depth"), F.lit(0)) + 1
    )
    kept = joined.filter(
        F.col("_child_depth") <= F.coalesce(F.col("_max_depth"), F.lit(default_max_depth))
    )
    return kept.withColumn(
        "metadata",
        F.create_map(
            F.lit(DEPTH_KEY), F.col("_child_depth").cast("string"),
            F.lit(MAX_DEPTH_KEY),
            F.coalesce(F.col("_max_depth"), F.lit(default_max_depth)).cast("string"),
        ),
    ).drop("_parent_depth", "_max_depth", "_child_depth")
