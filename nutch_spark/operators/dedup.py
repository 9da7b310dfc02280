"""DeduplicationJob — signature-group best-row selection (SURVEY.md §2.10 D1,
§2.5 W4, §2.3 J8).

Reference: /root/reference/src/java/org/apache/nutch/crawl/DeduplicationJob.java
:160-247 — within each signature group (optionally signature+host or
signature+domain, ``deduplication.group.mode``) keep one row by a
lexicographic policy chain and mark the rest ``db_duplicate``:

  compareOrder default score,fetchTime,urlLength (+ httpsOverHttp):
    higher score wins; later fetchTime wins; https preferred over http;
    shorter *decoded* URL wins (DeduplicationJob.java:224-235 URL-decodes
    before measuring).

Spark: a single ranking window over the group key — one shuffle, map-side
pre-aggregation not needed since row_number is streaming per partition.
J8 (merge duplicate marks back into the db) is a left join + coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.functions.urls import url_domain, url_host


def dedup_rank_columns(
    *,
    score: str = "score",
    fetch_time: str = "fetch_time",
    url: str = "url",
    compare_order: tuple[str, ...] = DEFAULT.dedup_compare_order,
) -> list[Column]:
    """The policy-chain ordering (DeduplicationJob.java:175-223)."""
    order: list[Column] = []
    for policy in compare_order:
        if policy == "score":
            order.append(F.desc(score))
        elif policy == "fetchTime":
            order.append(F.desc(fetch_time))
        elif policy == "httpsOverHttp":
            order.append(F.when(F.col(url).startswith("https://"), 0).otherwise(1).asc())
        elif policy == "urlLength":
            # DeduplicationJob.java:224-235 catches the decode exception and
            # falls back to the encoded URL; try_url_decode returns NULL on
            # malformed %-sequences, so coalesce to the raw length.
            order.append(
                F.coalesce(
                    F.length(F.try_url_decode(F.col(url))), F.length(F.col(url))
                ).asc()
            )
        else:
            raise ValueError(f"unknown dedup policy {policy!r}")
    order.append(F.asc(url))  # deterministic final tie-break
    return order


def mark_duplicates(
    df: DataFrame,
    signature: Column | str = "signature",
    *,
    group_mode: str = "none",
    group_extra: list[Column] | None = None,
    url: str = "url",
    order_by: list[Column] | None = None,
    dup_flag: str = "is_duplicate",
) -> DataFrame:
    """Rank rows within signature groups; rank>1 rows are duplicates.

    Generic: ``signature`` may be any expression (e.g. a hash of columns),
    ``order_by`` any policy chain, and ``group_extra`` any additional
    partition expressions (the generalization of group_mode for tables whose
    grouping key is not a URL host/domain), so the same operator answers the
    driver's dedup-rank family over TPC-H tables.
    """
    sig = F.col(signature) if isinstance(signature, str) else signature
    keys = [sig]
    if group_mode == "host":
        keys.append(url_host(url))
    elif group_mode == "domain":
        keys.append(url_domain(url))
    keys.extend(group_extra or [])
    order = order_by if order_by is not None else dedup_rank_columns(url=url)
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(dup_flag, F.row_number().over(w) > 1)


def deduplicate(crawldb: DataFrame, *, cfg: NutchConfig = DEFAULT) -> DataFrame:
    """Full DeduplicationJob: fetched rows with equal signatures → keep best,
    mark others db_duplicate, merge marks back (J8)."""
    # DeduplicationJob.java:89-90 admits both FETCHED and NOTMODIFIED rows.
    fetched = crawldb.filter(
        F.col("status").isin("db_fetched", "db_notmodified")
        & F.col("signature").isNotNull()
    )
    marked = mark_duplicates(
        fetched,
        "signature",
        group_mode=cfg.dedup_group_mode,
        order_by=dedup_rank_columns(compare_order=cfg.dedup_compare_order),
    )
    dups = marked.filter(F.col("is_duplicate")).select("url")
    # J8: duplicate status wins (DeduplicationJob.java:250-285)
    return (
        crawldb.alias("db")
        .join(dups.withColumn("_dup", F.lit(True)).alias("dup"), on="url", how="left")
        .withColumn(
            "status",
            F.when(F.col("_dup").isNotNull(), F.lit("db_duplicate")).otherwise(F.col("status")),
        )
        .drop("_dup")
    )
