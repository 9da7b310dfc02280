"""Export formats (SURVEY.md §2.1 S7 WARC, S8 CommonCrawl) and the sitemap
source (S10).

Reference:
- tools/warc/WARCExporter.java (570 LoC): segments → WARC archives.
- tools/CommonCrawlDataDumper.java (790 LoC): segments → CommonCrawl JSON.
- util/SitemapProcessor.java:71-92 (608 LoC): fetch+parse sitemap XML, merge
  URLs into the CrawlDb with declared changefreq/priority.

Spark-first shape: WARC records are rendered as one text column per record
(pure string expressions — stays in codegen) and written with the text
writer, one file per partition = one WARC chunk; CommonCrawl dump is a
column-mapped df.write.json; sitemap XML parsing is regexp extraction (the
reference uses a SAX parser — the fields pulled are identical), feeding the
standard inject merge (J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def warc_records(fetch_log: DataFrame) -> DataFrame:
    """S7: render fetch rows as WARC/1.0 'response' records (one row per
    record; concatenate a partition's rows for a .warc chunk).

    Follows the WARC-Record layout WARCExporter.java emits: version line,
    WARC-Type/Target-URI/Date headers, Content-Length, blank line, block.

    BINARY ``content`` (FETCH_SCHEMA — raw fetch bytes) yields a BINARY
    ``value``: the record block is the exact payload bytes, so a PDF or
    gzip member round-trips byte-for-byte (the reference archives raw
    ``Content.content``). STRING content keeps the legacy text record."""
    from pyspark.sql import types as T

    is_binary = isinstance(fetch_log.schema["content"].dataType, T.BinaryType)
    empty = F.lit(b"" if is_binary else "")
    content = F.coalesce(F.col("content"), empty)
    header = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(CRLF),
        F.lit("WARC-Date: "),
        F.date_format("fetch_time", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(CRLF),
        F.lit("WARC-Payload-Digest: md5:"), F.md5(content), F.lit(CRLF),
        F.lit("Content-Type: application/http;msgtype=response" + CRLF),
        F.lit("Content-Length: "),  # WARC mandates BYTES, not characters
        F.octet_length(content).cast("string"),
        F.lit(CRLF + CRLF),
    )
    if is_binary:
        value = F.concat(F.encode(header, "UTF-8"), content, F.encode(F.lit(CRLF + CRLF), "UTF-8"))
    else:
        value = F.concat(header, content, F.lit(CRLF + CRLF))
    return fetch_log.filter(F.col("status") == "fetch_success").select(
        value.alias("value")
    )


def write_warc(fetch_log: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """Write WARC chunks (one file per partition).

    String records go through the text writer (legacy path). Binary
    records are written bytes-exact: one ``part-NNNNN.warc`` per
    partition via foreachPartition — Spark has no binary file WRITER, so
    each task streams its records to the target directory directly (on a
    cluster this path is a shared filesystem / fuse mount; the 100 TB
    deployment would swap in a Hadoop-FS OutputStream in the same loop —
    the per-partition streaming shape is already right)."""
    from pyspark.sql import types as T

    recs = warc_records(fetch_log)
    if not isinstance(recs.schema["value"].dataType, T.BinaryType):
        recs.write.mode(mode).text(path)
        return
    import os
    import shutil

    if mode == "overwrite" and os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    def dump(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = None
        try:
            for row in rows:
                if out is None:  # open lazily: empty partitions write nothing
                    out = open(os.path.join(path, f"part-{pid:05d}.warc"), "wb")
                out.write(bytes(row.value))
        finally:
            if out is not None:
                out.close()

    recs.foreachPartition(dump)


def commoncrawl_dump(fetch_log: DataFrame, parse_data: DataFrame) -> DataFrame:
    """S8: CommonCrawl-style JSON rows (CommonCrawlDataDumper.java field
    mapping: url, timestamp, mime, digest, text/html payload)."""
    from pyspark.sql import types as T

    pd = parse_data.select("url", "title", "parse_text")
    empty = F.lit(
        b""
        if isinstance(fetch_log.schema["content"].dataType, T.BinaryType)
        else ""
    )
    return (
        fetch_log.filter(F.col("status") == "fetch_success")
        .join(pd, "url", "left")
        .select(
            F.col("url"),
            F.date_format("fetch_time", "yyyyMMddHHmmss").alias("timestamp"),
            F.coalesce("content_type", F.lit("text/html")).alias("mime"),
            F.md5(F.coalesce(F.col("content"), empty)).alias("digest"),
            F.col("title"),
            F.col("parse_text").alias("text"),
        )
    )


def write_commoncrawl_json(
    fetch_log: DataFrame, parse_data: DataFrame, path: str, *, mode: str = "overwrite"
) -> None:
    commoncrawl_dump(fetch_log, parse_data).write.mode(mode).json(path)


# ---------------------------------------------------------------------------
# S10 — sitemap source
# ---------------------------------------------------------------------------


def parse_sitemap(sitemap_content: DataFrame, *, content: str = "content") -> DataFrame:
    """S10: sitemap XML → (url, metadata{changefreq, priority}).

    Extracts <url><loc>/<changefreq>/<priority> entries with regexp pulls
    (util/SitemapProcessor.java:71-92 extracts the same three fields via
    crawler-commons). Feed the result to operators.inject.inject — the merge
    policy is the standard J1 full-outer merge."""
    entry = F.explode(
        F.regexp_extract_all(content, F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1))
    ).alias("entry")
    rows = sitemap_content.select(entry)
    loc = F.regexp_extract("entry", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    changefreq = F.regexp_extract("entry", r"<changefreq>\s*([^<\s]+)\s*</changefreq>", 1)
    priority = F.regexp_extract("entry", r"<priority>\s*([^<\s]+)\s*</priority>", 1)
    return (
        rows.select(
            loc.alias("url"),
            F.map_filter(
                F.create_map(
                    F.lit("sitemap.changefreq"), changefreq,
                    F.lit("sitemap.priority"), priority,
                ),
                lambda _, v: v != "",
            ).alias("metadata"),
        )
        .filter(F.col("url") != "")
    )


def expand_sitemap_index(
    sitemap_content: DataFrame, *, content: str = "content"
) -> DataFrame:
    """Sitemap INDEX files → child sitemap URLs
    (SitemapProcessor.java:356-360 SiteMapIndex.getSitemaps): every
    <sitemap><loc> entry, to be fetched and fed back through
    ``parse_sitemap`` next round."""
    entry = F.explode(
        F.regexp_extract_all(
            content, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), F.lit(1)
        )
    ).alias("entry")
    loc = F.regexp_extract("entry", r"<loc>\s*([^<\s]+)\s*</loc>", 1)
    return (
        sitemap_content.select(entry)
        .select(loc.alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )
