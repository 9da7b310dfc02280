"""Table schemas for the engine's persistent stores.

Maps the reference's Writable row types onto columnar StructTypes
(SURVEY.md §1.5).  The reference stores are row-oriented MapFiles only
because Hadoop was; every reference scan is a full-table column-subset scan,
so columnar Parquet is strictly better.

Reference row types:
- CrawlDatum        /root/reference/src/java/org/apache/nutch/crawl/CrawlDatum.java:144-151
- Inlinks/Inlink    /root/reference/src/java/org/apache/nutch/crawl/Inlinks.java:33-120
- HostDatum         /root/reference/src/java/org/apache/nutch/hostdb/HostDatum.java:161-201
- LinkDatum         /root/reference/src/java/org/apache/nutch/scoring/webgraph/LinkDatum.java:25-95
- Node              /root/reference/src/java/org/apache/nutch/scoring/webgraph/Node.java:30-105
- ParseData/Outlink /root/reference/src/java/org/apache/nutch/parse/ParseData.java, Outlink.java
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Status vocabulary — CrawlDatum.java:62-132. The reference packs these into a
# byte with three namespaces; we keep readable strings plus the namespace
# helpers hasDbStatus/hasFetchStatus (CrawlDatum.java:154-161) as prefixes.
# ---------------------------------------------------------------------------
DB_STATUSES = (
    "db_unfetched",
    "db_fetched",
    "db_gone",
    "db_redir_temp",
    "db_redir_perm",
    "db_notmodified",
    "db_duplicate",
    "db_orphan",
    "db_parse_failed",
)
FETCH_STATUSES = (
    "fetch_success",
    "fetch_retry",
    "fetch_redir_temp",
    "fetch_redir_perm",
    "fetch_gone",
    "fetch_notmodified",
)
TRANSIENT_STATUSES = ("signature", "injected", "linked", "parse_metadata", "parse_failed")

METADATA = T.MapType(T.StringType(), T.StringType())

# CrawlDb — crawl/CrawlDb.java:55-76 (key=url, value=CrawlDatum)
CRAWLDB = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("retries", T.IntegerType(), True),
        T.StructField("fetch_interval", T.IntegerType(), True),  # seconds
        T.StructField("score", T.FloatType(), True),
        T.StructField("signature", T.BinaryType(), True),  # <=256B, CrawlDatum.java:264-269
        T.StructField("modified_time", T.TimestampType(), True),
        T.StructField("metadata", METADATA, True),
    ]
)

# Seed input after parsing (sources/seeds.py) — Injector.java:62-84
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("metadata", METADATA, True),
    ]
)

# LinkDb — crawl/LinkDb.java:60-81; inlinks are a dedup set of (from_url, anchor)
INLINK = T.StructType(
    [
        T.StructField("from_url", T.StringType(), False),
        T.StructField("anchor", T.StringType(), True),
    ]
)
LINKDB = T.StructType(
    [
        T.StructField("to_url", T.StringType(), False),
        T.StructField("inlinks", T.ArrayType(INLINK), True),
    ]
)

# HostDb — hostdb/HostDatum.java; column list printed by ReadHostDb.java:86-89
HOSTDB = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("unfetched", T.LongType(), True),
        T.StructField("fetched", T.LongType(), True),
        T.StructField("not_modified", T.LongType(), True),
        T.StructField("redir_temp", T.LongType(), True),
        T.StructField("redir_perm", T.LongType(), True),
        T.StructField("gone", T.LongType(), True),
        T.StructField("dns_failures", T.LongType(), True),
        T.StructField("connection_failures", T.LongType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("last_check", T.TimestampType(), True),
        T.StructField("homepage_url", T.StringType(), True),
        T.StructField("metadata", METADATA, True),
    ]
)

# Segment sub-tables (SURVEY.md §1.1). One `segments` table per stage with a
# segment_id column replaces the reference's timestamp-named directories.
FETCH_LOG = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("segment_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("signature", T.BinaryType(), True),
        T.StructField("metadata", METADATA, True),
    ]
)

OUTLINK = T.StructType(
    [
        T.StructField("to_url", T.StringType(), False),
        T.StructField("anchor", T.StringType(), True),
    ]
)
PARSE_DATA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("segment_id", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("outlinks", T.ArrayType(OUTLINK), True),
        T.StructField("content_meta", METADATA, True),
        T.StructField("parse_meta", METADATA, True),
    ]
)
PARSE_TEXT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("segment_id", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)
CONTENT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("segment_id", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("headers", METADATA, True),
    ]
)

# crawl_parse rows emitted by the parser (ParseOutputFormat.java:230-356):
# typed union keyed by url — 'linked' score contributions, 'signature',
# 'parse_metadata', 'parse_failed' carrier rows.
PARSE_EMITS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("score", T.FloatType(), True),
        T.StructField("signature", T.BinaryType(), True),
        T.StructField("metadata", METADATA, True),
    ]
)

# WebGraph — scoring/webgraph/WebGraph.java:99-102 (edges), Node.java:30-105
EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("anchor", T.StringType(), True),
        T.StructField("score", T.FloatType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)
NODES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("num_inlinks", T.LongType(), True),
        T.StructField("num_outlinks", T.LongType(), True),
        T.StructField("inlink_score", T.FloatType(), True),
    ]
)
