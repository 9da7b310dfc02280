"""Mergers — SegmentMerger (J9), CrawlDbMerger (J10), LinkDbMerger (J11).

Reference:
- /root/reference/src/java/org/apache/nutch/segment/SegmentMerger.java:104-112
  (doc) — n-way union of segments cogrouped by URL, latest-segment-wins per
  sub-table (lexicographic segment name = timestamp).
- /root/reference/src/java/org/apache/nutch/crawl/CrawlDbMerger.java:69-117 —
  newest row by fetch time wins, metadata merged with newest precedence.
- /root/reference/src/java/org/apache/nutch/crawl/LinkDbMerger.java:95-110 —
  inlink sets concatenated, capped at linkdb.max.inlinks (10000).

Spark: unionByName + one ranking window (single shuffle). At 100 TB, the
window's shuffle on url is unavoidable (the reference pays the same shuffle);
AQE coalesces the output partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig


def latest_version_wins(
    dfs: list[DataFrame],
    key: str,
    version: Column | str,
    *,
    tie_break: list[Column] | None = None,
) -> DataFrame:
    """Union inputs, keep the row with the greatest ``version`` per key
    (W6 latest-version-wins / J9 segment merge)."""
    v = F.col(version) if isinstance(version, str) else version
    union = dfs[0]
    for d in dfs[1:]:
        union = union.unionByName(d, allowMissingColumns=True)
    order = [v.desc()] + (tie_break or [])
    w = Window.partitionBy(key).orderBy(*order)
    return union.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def merge_crawldbs(dbs: list[DataFrame], *, cfg: NutchConfig = DEFAULT) -> DataFrame:
    """CrawlDbMerger: newest fetch_time wins; metadata merged newest-first
    (CrawlDbMerger.java:105-117 putAllMetaData semantics)."""
    union = dbs[0]
    for d in dbs[1:]:
        union = union.unionByName(d, allowMissingColumns=True)
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("score"), F.asc("status")
    )
    ranked = union.withColumn("_rn", F.row_number().over(w))
    # newest row's fields win; metadata = union with newest precedence
    merged_meta = (
        union.groupBy("url")
        .agg(
            F.aggregate(
                F.reverse(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("fetch_time").alias("t"), F.col("metadata").alias("m"))
                        ),
                        lambda a, b: F.when(a["t"] < b["t"], -1).when(a["t"] > b["t"], 1).otherwise(0),
                    )
                ),
                F.create_map().cast("map<string,string>"),
                # later (older) entries must not overwrite newer keys
                lambda acc, s: F.map_concat(
                    acc,
                    F.map_filter(
                        F.coalesce(s["m"], F.create_map().cast("map<string,string>")),
                        lambda k, _: ~F.coalesce(F.array_contains(F.map_keys(acc), k), F.lit(False)),
                    ),
                ),
            ).alias("metadata_merged")
        )
    )
    return (
        ranked.filter(F.col("_rn") == 1)
        .drop("_rn", "metadata")
        .join(merged_meta, "url")
        .withColumnRenamed("metadata_merged", "metadata")
    )


def merge_linkdbs(
    linkdbs: list[DataFrame],
    *,
    cfg: NutchConfig = DEFAULT,
) -> DataFrame:
    """LinkDbMerger: concat inlink sets, dedup, cap at linkdb.max.inlinks."""
    union = linkdbs[0]
    for d in linkdbs[1:]:
        union = union.unionByName(d, allowMissingColumns=True)
    return union.groupBy("to_url").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("inlinks")))),
            1,
            cfg.linkdb_max_inlinks,
        ).alias("inlinks")
    )


# the six segment part names (SegmentMerger.java:657-668)
SEGMENT_PARTS = (
    "content",
    "crawl_generate",
    "crawl_fetch",
    "crawl_parse",
    "parse_data",
    "parse_text",
)


def merge_segment_dirs(
    segments: list[dict[str, DataFrame]],
    *,
    key: str = "url",
    segment: str = "segment",
    merge_filter=None,
) -> dict[str, DataFrame]:
    """Full SegmentMerger job surface over segment *directories*: each input
    segment is a dict part-name → DataFrame (the Spark analogue of a segment
    directory with crawl_generate/crawl_fetch/.../parse_text subdirs).

    Two reference behaviors beyond per-part latest-wins:

    - **Lowest-common-set pruning** (SegmentMerger.java:646-676 and the
      class doc:82-91): only parts present in EVERY input segment are
      merged; all other data is skipped entirely — if one segment is
      unfetched, the merge falls back to just fetchlists. Pruning happens
      BEFORE any plan is built, so skipped parts cost zero I/O (their scans
      never enter a plan — the Spark twin of never adding the input path).
    - **SegmentMergeFilter hook** (SegmentMergeFilters.java:64-91,
      SegmentMergeFilter.java:41-53): ``merge_filter`` receives one
      DataFrame with the url key plus one STRUCT column per merged part
      (null when that url has no row in the part — the reducer's null
      arguments) and returns a boolean Column; urls where it is false are
      dropped from every output part, like the reducer skipping the key.

    Scale shape: every part merges with one url-key window; the filter is
    url-key joins throughout (co-partitioned by AQE), and the keep-set
    semi-join prunes each part in the same shuffle family. No collect, no
    global ordering.
    """
    if not segments:
        return {}
    common = set(segments[0])
    for s in segments[1:]:
        common &= set(s)
    merged: dict[str, DataFrame] = {}
    for part in [p for p in SEGMENT_PARTS if p in common]:
        parts = [s[part] for s in segments]
        if part == "crawl_fetch":
            merged[part] = merge_segments(parts, key=key, segment=segment)
        else:
            merged[part] = latest_version_wins(parts, key, segment)
    if merge_filter is None:
        return merged
    combined = None
    for part, df in merged.items():
        packed = df.select(
            key, F.struct(*[c for c in df.columns if c != key]).alias(part)
        )
        combined = (
            packed if combined is None else combined.join(packed, key, "full_outer")
        )
    keep = combined.filter(merge_filter(combined)).select(key)
    return {part: df.join(keep, key, "left_semi") for part, df in merged.items()}


_REAL_FETCH_STATUSES = (
    "fetch_success",
    "fetch_gone",
    "fetch_redir_temp",
    "fetch_redir_perm",
)


def merge_segments(
    parts: list[DataFrame],
    *,
    key: str = "url",
    segment: str = "segment",
) -> DataFrame:
    """SegmentMerger fetch-part selection (SegmentMerger.java:478-494,
    NUTCH-1113/NUTCH-1520): only REAL fetch statuses are candidates —
    ``linked``, ``fetch_retry`` and ``fetch_notmodified`` rows from a newer
    segment must never clobber an older real status (the classic
    "disappearing records" bug). Among candidates the newest segment wins;
    within one segment ``fetch_success`` outranks other statuses
    (deterministic stand-in for the reference's arbitrary first-seen).
    URLs with no candidate anywhere keep their newest row (the reference
    emits the latest segment's linked entries).

    One window over one shuffle on the url key — same cost as plain
    latest-version-wins at any scale.
    """
    union = parts[0]
    for d in parts[1:]:
        union = union.unionByName(d, allowMissingColumns=True)
    eligible = F.col("status").isin(*_REAL_FETCH_STATUSES).cast("int")
    w = Window.partitionBy(key).orderBy(
        F.desc(eligible), F.desc(segment), F.desc("status")
    )
    return (
        union.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def slice_segments(
    df: DataFrame, slice_size: int, *, key: str = "url"
) -> DataFrame:
    """SegmentMerger ``-slice`` option (SegmentMerger.java:128,227-258): the
    merged segment splits into chunks of ``slice_size`` records, each chunk
    written as its own segment. The reference slices with a per-reducer
    running counter; the deterministic distributed analogue assigns
    ``slice = pmod(xxhash64(key), ceil(rows / slice_size))`` — slices are
    hash-balanced to ~slice_size without any global ordering or sequential
    counter (which would serialize the write at scale). Downstream writes
    partition by the ``slice`` column (``.write.partitionBy("slice")``).
    """
    total = df.count()  # export-time op: one count job is the slice planner
    n_slices = max(1, -(-total // slice_size))
    return df.withColumn(
        "slice", F.pmod(F.xxhash64(F.col(key)), F.lit(n_slices)).cast("int")
    )
