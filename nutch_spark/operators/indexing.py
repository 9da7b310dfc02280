"""Indexing — the 5-way reporting join (SURVEY.md §2.3 J3, §2.11) and
CleaningJob (D2).

Reference: /root/reference/src/java/org/apache/nutch/indexer/
IndexerMapReduce.java:309-512 — cogroup of crawldb ⟗ linkdb ⟗ segment
(crawl_fetch, parse_data, parse_text [, content]) on URL, producing an ADD
document or a DELETE action per URL:

  delete rules: robots-noindex (:342-355), parse-failed (:366-373),
  gone/redirect (:374-391), duplicate (:397-402); notmodified skipped (:404-408).

The document-field chain mirrors the indexing-filter plugins (§2.11):
index-basic (BasicIndexingFilter.java:70-135: host, url, content, title
truncated, tstamp), index-more (MoreIndexingFilter.java:109-305: date,
contentLength, type), index-anchor (A10 anchors). OPIC boost =
pow(score, 0.5) (OPICScoringFilter.java:178-187).

Spark: multi-way left joins rooted at parse_data + one CASE WHEN action
column + a withColumns field chain. All joins are on url: Catalyst reuses
one exchange across them (all sort-merge on the same key), and AQE
broadcasts small sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.functions.dates import parse_http_date
from nutch_spark.functions.urls import url_host


def indexing_join(
    crawldb: DataFrame,
    fetch_log: DataFrame,
    parse_data: DataFrame,
    parse_text: DataFrame,
    linkdb: DataFrame | None = None,
    *,
    cfg: NutchConfig = DEFAULT,
    title_max_length: int = 100,
    boost_expr: Column | None = None,
) -> DataFrame:
    """Assemble index documents with an `action` column (ADD/DELETE/SKIP).

    ``boost_expr`` overrides the document boost — the indexerScore hook of
    the scoring-filter chain. Default is OPIC's ``pow(score, 0.5)``
    (OPICScoringFilter.java:178-187); pass
    :func:`nutch_spark.operators.scoring.link_indexer_boost` for
    scoring-link's ``normalizedScore * dbDatum.score``
    (LinkAnalysisScoringFilter.java:52-59)."""
    pd = parse_data.select(
        "url", "title", "content_meta", "parse_meta", F.col("segment_id")
    )
    pt = parse_text.select("url", "text")
    fl_cols = [
        "url",
        F.col("status").alias("fetch_status"),
        F.col("fetch_time").alias("fetched_at"),
        F.col("signature").alias("fetch_signature"),
    ]
    if cfg.indexer_add_binary_content and "content" in fetch_log.columns:
        fl_cols.append(F.col("content").alias("_raw_content"))
    fl = fetch_log.select(*fl_cols)
    db = crawldb.select(
        "url", F.col("status").alias("db_status"), "score", "signature"
    )

    doc = (
        pd.join(pt, "url", "left")
        .join(fl, "url", "left")
        .join(db, "url", "left")
    )
    if linkdb is not None:
        doc = doc.join(linkdb.withColumnRenamed("to_url", "url"), "url", "left")

    robots = F.lower(F.coalesce(F.element_at("parse_meta", "robots"), F.lit("")))
    action = (
        F.when(robots.contains("noindex"), "DELETE")  # :342-355
        .when(F.col("db_status") == "db_parse_failed", "DELETE")  # :366-373
        .when(
            F.col("db_status").isin("db_gone", "db_redir_temp", "db_redir_perm"), "DELETE"
        )  # :374-391
        .when(F.col("db_status") == "db_duplicate", "DELETE")  # :397-402
        .when(F.col("fetch_status") == "fetch_notmodified", "SKIP")  # :404-408
        .otherwise("ADD")
    )

    # field chain (index-basic + index-more) + OPIC boost
    out = doc.withColumns(
        {
            "action": action,
            "host": url_host("url"),
            "title_indexed": F.substring(F.coalesce("title", F.lit("")), 1, title_max_length),
            "content_length": F.coalesce(
                F.element_at("content_meta", "Content-Length").cast("long"),
                F.length("text").cast("long"),
            ),
            "content_type": F.element_at("content_meta", "Content-Type"),
            "last_modified": parse_http_date(F.element_at("content_meta", "Last-Modified")),
            "boost": (
                boost_expr
                if boost_expr is not None
                else F.pow(F.coalesce(F.col("score"), F.lit(0.0)), 0.5)
            ),
            "digest": F.hex(F.coalesce("signature", "fetch_signature")),
        }
    )
    # indexer.add.binary.content (IndexerMapReduce.java:66-75 + the
    # TestIndexerMapReduce.testBinaryContentBase64 contract): ship the raw
    # fetched content on the document, base64-encoded when
    # indexer.binary.base64 is set
    if cfg.indexer_add_binary_content and "_raw_content" in out.columns:
        raw = F.col("_raw_content").cast("binary")
        out = out.withColumn(
            "binary_content",
            F.base64(raw) if cfg.indexer_binary_base64 else F.col("_raw_content"),
        ).drop("_raw_content")
    return out


def cleaning_targets(crawldb: DataFrame) -> DataFrame:
    """CleaningJob (indexer/CleaningJob.java:46-120): URLs whose index entry
    must be deleted. The sink adapter issues the deletes per partition."""
    return crawldb.filter(F.col("status").isin("db_gone", "db_duplicate")).select("url")


def mimetype_filter_predicate(
    mime: Column | str,
    *,
    allow: tuple[str, ...] = (),
    deny: tuple[str, ...] = (),
) -> Column:
    """mimetype-filter plugin: keep documents whose mime type passes the
    white/blacklist (prefix semantics: 'text' matches 'text/html'). An
    allow list, when present, wins over everything not on it."""
    c = F.col(mime) if isinstance(mime, str) else mime
    if allow:  # a whitelist, when present, is the whole policy
        allowed = F.lit(False)
        for a in allow:
            allowed = allowed | c.startswith(a)
        return allowed
    pred = F.lit(True)
    for d in deny:
        pred = pred & ~c.startswith(d)
    return pred
