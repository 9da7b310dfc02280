"""HostDb — per-host aggregate table (SURVEY.md §2.3 J6, §2.4 A3).

Reference: /root/reference/src/java/org/apache/nutch/hostdb/
UpdateHostDbReducer.java:176-439 — per host: status histogram, failure
counters, and for configured numeric metadata fields min/max/avg +
percentiles (t-digest; hostdb.percentiles=50,75,95,99,
conf/nutch-default.xml:2957-2974); for string fields, value counts.

Spark: one groupBy(host) with conditional-count aggregates (count_if), plus
optional numeric/string field profiles. Single shuffle; partial aggregation
is automatic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.functions.urls import url_host

_STATUS_COUNTERS = {
    "unfetched": "db_unfetched",
    "fetched": "db_fetched",
    "not_modified": "db_notmodified",
    "redir_temp": "db_redir_temp",
    "redir_perm": "db_redir_perm",
    "gone": "db_gone",
}


def update_hostdb(
    crawldb: DataFrame,
    hostdb: DataFrame | None = None,
    *,
    cfg: NutchConfig = DEFAULT,
) -> DataFrame:
    """Re-aggregate the crawldb per host; full-outer merge into the existing
    hostdb keeping its operational columns (failure counters, last_check)."""
    aggs = [
        F.count_if(F.col("status") == s).alias(name) for name, s in _STATUS_COUNTERS.items()
    ]
    aggs.append(F.avg("score").cast("float").alias("score"))
    # numeric metadata field profiles (UpdateHostDbReducer.java:230-330)
    for field in cfg.hostdb_numeric_fields:
        col = F.element_at("metadata", field).cast("double")
        aggs += [
            F.min(col).alias(f"min.{field}"),
            F.max(col).alias(f"max.{field}"),
            F.avg(col).alias(f"avg.{field}"),
        ]
        for p in cfg.hostdb_percentiles:
            aggs.append(
                F.percentile_approx(col, p / 100.0, 10_000).alias(f"pct{p}.{field}")
            )
    fresh = crawldb.groupBy(url_host("url").alias("host")).agg(*aggs)

    if hostdb is None:
        return fresh
    keep = [
        c
        for c in hostdb.columns
        if c not in fresh.columns and c != "host"
    ]
    return fresh.join(hostdb.select("host", *keep), "host", "full_outer")


def hostdb_distinct_urls(
    crawldb: DataFrame,
    *,
    k: int = 64,
    url: str = "url",
) -> DataFrame:
    """A3 sketch mode: distinct-URL cardinality estimate PER HOST via the
    engine-portable KMV sketch (``datapipe.sketches.kmv_distinct``,
    Bar-Yossef et al. 2002) — ``(host, n_distinct_est, n_sketch)``.

    The exact per-host distinct count is a full shuffle keyed on (host,
    url); the sketch crosses the shuffle as ≤ k doubles per host
    (WindowGroupLimit keeps k rows per host per partition before the
    exchange). Exact below k distinct, (k-1)/h_(k) above — and because
    the sketch is md5 arithmetic, a DuckDB/Trino twin reproduces every
    estimate bit-for-bit, unlike approx_count_distinct's engine-private
    HLL++ binary. Reference parity: UpdateHostDbReducer.java:176-439
    counts per-host URL volume exactly; this is the variant that
    survives 100 TB."""
    from nutch_spark.datapipe.sketches import kmv_distinct

    hosted = crawldb.select(
        url_host(F.col(url)).alias("host"), F.col(url)
    )
    return kmv_distinct(hosted, url, group_by=["host"], k=k)


def string_field_counts(
    crawldb: DataFrame, field: str, *, cfg: NutchConfig = DEFAULT
) -> DataFrame:
    """Value counts of a string metadata field per host
    (UpdateHostDbReducer.java:340-370)."""
    val = F.element_at("metadata", field)
    return (
        crawldb.filter(val.isNotNull())
        .groupBy(url_host("url").alias("host"), val.alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
    )
