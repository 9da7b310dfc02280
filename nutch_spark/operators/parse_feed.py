"""Feed parsing (src/plugin/feed FeedParser.java): RSS <item> / Atom
<entry> documents expand to one parse row per feed entry — each entry is
its own indexable document with url/title/text/published, exactly the
fan-out the reference's feed plugin performs with ROME.

Pure regexp-column extraction (codegen'd, no UDF); a feed document is one
row in, N entry rows out via explode — a narrow map + explode, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.functions.dates import parse_http_date


def _first(entry: Column, pattern: str) -> Column:
    return F.regexp_extract(entry, pattern, 1)


def parse_feed(
    feeds: DataFrame, *, url: str = "url", content: str = "content"
) -> DataFrame:
    """(feed url, xml content) → one row per entry:
    (feed_url, url, title, text, published).

    RSS: <item><title>/<link>/<description>/<pubDate>;
    Atom: <entry><title>/<link href=>/<summary>/<updated>. Entries missing
    a link are dropped (the reference indexes entries by their own URL).
    """
    items = F.regexp_extract_all(content, F.lit(r"(?s)<item[\s>](.*?)</item>"), F.lit(1))
    entries = F.regexp_extract_all(
        content, F.lit(r"(?s)<entry[\s>](.*?)</entry>"), F.lit(1)
    )
    exploded = feeds.select(
        F.col(url).alias("feed_url"),
        F.explode(F.concat(items, entries)).alias("e"),
    )
    link = F.when(
        _first(F.col("e"), r"<link>\s*([^<\s]+)\s*</link>") != "",
        _first(F.col("e"), r"<link>\s*([^<\s]+)\s*</link>"),
    ).otherwise(_first(F.col("e"), r"<link[^>]*href\s*=\s*[\"']([^\"']+)[\"']"))
    title = _first(F.col("e"), r"(?s)<title[^>]*>\s*(.*?)\s*</title>")
    body = F.when(
        _first(F.col("e"), r"(?s)<description>\s*(.*?)\s*</description>") != "",
        _first(F.col("e"), r"(?s)<description>\s*(.*?)\s*</description>"),
    ).otherwise(_first(F.col("e"), r"(?s)<summary[^>]*>\s*(.*?)\s*</summary>"))
    pub = F.when(
        _first(F.col("e"), r"<pubDate>\s*([^<]+?)\s*</pubDate>") != "",
        _first(F.col("e"), r"<pubDate>\s*([^<]+?)\s*</pubDate>"),
    ).otherwise(_first(F.col("e"), r"<updated>\s*([^<]+?)\s*</updated>"))
    return (
        exploded.select(
            "feed_url",
            link.alias("url"),
            title.alias("title"),
            # strip residual tags/CDATA from the body text
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(body, r"(?s)<!\[CDATA\[(.*?)\]\]>", r"$1"),
                    r"<[^>]*>",
                    " ",
                )
            ).alias("text"),
            F.coalesce(
                parse_http_date(pub), F.try_to_timestamp(pub)
            ).alias("published"),
        )
        .filter(F.col("url") != "")
    )
