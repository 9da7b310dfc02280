"""parse-js — heuristic link extraction from JavaScript (two-pass regex).

Reference: src/plugin/parse-js/src/java/org/apache/nutch/parse/js/
JSParseFilter.java (the Heritrix-style two-pass matcher: quoted string
literals first, then a loose URI shape test), applied two ways:

- as a PARSER for fetched ``.js`` files (``parse_js`` DataFrame op —
  getParse:172-190: text = the script source, title = its first line capped
  at 80 chars, outlinks = extracted links)
- as an HTML parse FILTER (filter:96-160): ``<script>`` bodies, ``on*``
  event-handler attributes and ``javascript:`` hrefs are scanned for links;
  wired into operators/parse_html.py behind ``cfg.parse_js_filter`` (the
  plugin is not in the reference's default plugin.includes, so it is
  opt-in here too).

Spark shape: like the other parsers this is an Arrow-batched ``mapInPandas``
over (url, content) — a pure per-row map, no shuffle, payload column pruned
everywhere else.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAX_TITLE_LEN = 80  # JSParseFilter.MAX_TITLE_LEN

# JSParseFilter.java:193-199 — the same two patterns
_STRING_PATTERN = re.compile(r"(\\*(?:\"|'))([^\s\"']+?)(?:\1)", re.I | re.M)
_URI_PATTERN = re.compile(r"(^|\s*?)/?\S+?[/.]\S+($|\s*)", re.I | re.M)


def extract_js_links(plain_text: str, base: str) -> list[str]:
    """getJSLinks(:208-266): every quoted string literal that looks like a
    URI becomes an outlink — ``www.``-prefixed strings gain ``http://``,
    relative candidates resolve against ``base``, unresolvable ones are
    dropped, ``&amp;`` unescapes."""
    out: list[str] = []
    for m in _STRING_PATTERN.finditer(plain_text or ""):
        url = m.group(2)
        if not _URI_PATTERN.fullmatch(url):
            continue
        if url.startswith("www."):
            url = "http://" + url
        else:
            try:
                url = urljoin(base, url)
            except ValueError:
                continue
            if not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", url):
                continue  # base itself unusable -> candidate stays relative
        out.append(url.replace("&amp;", "&"))
    return out


def parse_js_file(url: str, script: str) -> dict:
    """One ``.js`` file → {title, text, outlinks} (getParse:172-190)."""
    idx = script.find("\n")
    if idx == -1:
        idx = len(script)
    title = script[: min(idx, _MAX_TITLE_LEN)]
    return {
        "title": title,
        "text": script,
        "outlinks": extract_js_links(script, url),
    }


PARSE_JS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("parse_text", T.StringType(), True),
        T.StructField("outlinks", T.ArrayType(T.StringType()), True),
    ]
)


def parse_js(fetch_log: DataFrame, *, url: str = "url", content: str = "content") -> DataFrame:
    """P2 parser slot for JavaScript content: (url, content) →
    (url, title, parse_text, outlinks). ``content`` may be BINARY or STRING
    (the reference decodes UTF-8, getParse:173)."""
    import pandas as pd

    src = fetch_log.select(F.col(url).alias("url"), F.col(content).alias("content"))

    def gen(batches):
        for pdf in batches:
            rows = []
            for u, c in zip(pdf["url"], pdf["content"]):
                if c is None:
                    continue
                script = (
                    bytes(c).decode("utf-8", errors="replace")
                    if isinstance(c, (bytes, bytearray, memoryview))
                    else str(c)
                )
                parsed = parse_js_file(u, script)
                rows.append(
                    {
                        "url": u,
                        "title": parsed["title"],
                        "parse_text": parsed["text"],
                        "outlinks": parsed["outlinks"],
                    }
                )
            yield pd.DataFrame(rows, columns=["url", "title", "parse_text", "outlinks"])

    return src.mapInPandas(gen, PARSE_JS_SCHEMA)
