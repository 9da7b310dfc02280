"""LinkDb — link inversion (SURVEY.md §2.9 G1) and anchor handling.

Reference: /root/reference/src/java/org/apache/nutch/crawl/LinkDb.java:80-181
(mapper: explode outlinks, drop internal links when
linkdb.ignore.internal.links, truncate anchors at linkdb.max.anchor.length),
merge with existing db capped at linkdb.max.inlinks
(crawl/LinkDbMerger.java:95-110).

Spark: explode + filter + groupBy/collect_set — one shuffle on to_url. The
anchor-set semantics of Inlinks (crawl/Inlinks.java:33-120) are set-dedup on
(from_url, anchor).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.functions.urls import url_host


def invert_links(
    parse_data: DataFrame,
    *,
    cfg: NutchConfig = DEFAULT,
) -> DataFrame:
    """parse_data(url, outlinks[]) → linkdb(to_url, inlinks[])."""
    edges = parse_data.select(
        F.col("url").alias("from_url"),
        F.explode("outlinks").alias("o"),
    ).select(
        "from_url",
        F.col("o.to_url").alias("to_url"),
        F.substring(F.coalesce(F.col("o.anchor"), F.lit("")), 1, cfg.linkdb_max_anchor_length).alias(
            "anchor"
        ),
    )
    if cfg.linkdb_ignore_internal_links:  # LinkDb.java:147-152
        edges = edges.filter(url_host("from_url") != url_host("to_url"))
    elif cfg.linkdb_ignore_external_links:
        edges = edges.filter(url_host("from_url") == url_host("to_url"))
    return invert_edges(
        edges, src="from_url", dst="to_url", payload=["anchor"], cap=cfg.linkdb_max_inlinks
    )


def invert_edges(
    edges: DataFrame,
    *,
    src: str,
    dst: str,
    payload: list[str] | None = None,
    cap: int | None = None,
    out_key: str = "to_url",
    out_col: str = "inlinks",
) -> DataFrame:
    """Generic inversion: group edges by destination, collect a dedup'd,
    sorted, optionally capped set of (src, payload...) structs.

    Sorting before the cap makes the kept subset deterministic (the reference
    keeps encounter order, which is nondeterministic across Hadoop runs —
    this is a strict improvement, documented divergence).

    Scale: the cap is applied BEFORE any array is materialized — a
    dense_rank window on the same shuffle key (dst) drops rows past the cap,
    so a viral URL with 10^7 inlinks never builds a 10^7-element aggregation
    buffer (the window sort is an external, spillable sort). This mirrors the
    bounded priority queue of crawl/LinkDbMerger.java:95-110. dense_rank (not
    row_number) so duplicate structs don't consume cap slots before
    collect_set dedups them; the collect_set buffer is therefore ≤ cap.
    The groupBy reuses the window's hash partitioning on ``dst`` — one
    exchange total.
    """
    from pyspark.sql import Window

    fields = [F.col(src).alias("from_url")] + [F.col(p) for p in (payload or [])]
    proj = edges.select(F.col(dst).alias(out_key), F.struct(*fields).alias("_s"))
    if cap:
        w = Window.partitionBy(out_key).orderBy(F.asc("_s"))
        proj = (
            proj.withColumn("_rk", F.dense_rank().over(w))
            .filter(F.col("_rk") <= cap)
            .drop("_rk")
        )
    return proj.groupBy(out_key).agg(
        F.array_sort(F.collect_set("_s")).alias(out_col)
    )


def anchors_per_target(linkdb: DataFrame, *, cfg: NutchConfig = DEFAULT) -> DataFrame:
    """Inlinks.getAnchors() (crawl/Inlinks.java:88-120, feeds index-anchor
    A10): empty anchors skipped; "only a single anchor with a given text is
    permitted from a given domain" — the dedup key is (source host, anchor),
    so the SAME text arriving from two hosts legitimately appears twice.
    The reference returns encounter order (nondeterministic under Hadoop);
    we sort — documented deterministic divergence."""
    exploded = linkdb.select("to_url", F.explode("inlinks").alias("l")).select(
        "to_url",
        F.col("l.from_url").alias("from_url"),
        F.col("l.anchor").alias("anchor"),
    )
    per_domain = (
        exploded.filter(F.col("anchor") != "")
        .withColumn("_host", url_host("from_url"))
        .dropDuplicates(["to_url", "_host", "anchor"])
    )
    return per_domain.groupBy("to_url").agg(
        F.array_sort(F.collect_list("anchor")).alias("anchors")
    )
