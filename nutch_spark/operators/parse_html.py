"""P2 fidelity: real HTML parsing + charset detection (SURVEY.md §2.8).

Reference:
- parse/ParseSegment.java:87-276 + src/plugin/parse-html
  (HtmlParser.java): DOM parse → title, text, outlinks (base-href resolved,
  NUTCH-2478), meta tags.
- util/EncodingDetector.java: charset resolution order BOM → Content-Type
  header → <meta> sniff in the head bytes → detector fallback.

Spark shape: the fetch log streams through ``mapInPandas`` in Arrow batches;
each batch is parsed with the stdlib ``html.parser`` (tolerant of malformed
markup — unclosed tags, bad nesting, entity soup). The declarative regex
parser in ``operators/fetcher.parse`` stays as the vectorized fast path for
well-formed synthetic corpora; this module is the drop-in slot it documents.
No shuffle is introduced: parsing is a narrow map over whatever partitioning
the fetch log already has.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nutch_spark.config import DEFAULT, NutchConfig

# --------------------------------------------------------------------------
# charset detection (util/EncodingDetector.java order of precedence)
# --------------------------------------------------------------------------

_CHARSET_IN_TYPE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
_CHARSET_IN_META = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I
)


def detect_charset(data: bytes, content_type: str | None = None) -> str:
    """BOM → Content-Type header → <meta> sniff (first 8 KiB) → UTF-8
    validity check → windows-1252 fallback (EncodingDetector.java:157-229)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if data.startswith(b"\xff\xfe\x00\x00") or data.startswith(b"\x00\x00\xfe\xff"):
        return "utf-32"
    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        return "utf-16"
    if content_type:
        m = _CHARSET_IN_TYPE.search(content_type)
        if m:
            claimed = m.group(1).lower()
            # servers lie (TestEncodingDetector.java:75-83 — with
            # autodetection on, statistically-valid UTF-8 beats a wrong
            # header clue): when the claimed charset is not a UTF family
            # but the bytes decode STRICTLY as UTF-8 with at least one
            # multibyte sequence, trust the bytes. Pure-ASCII content
            # keeps the claimed charset (identical decode either way).
            if not claimed.startswith(("utf-8", "utf8")):
                try:
                    data.decode("utf-8")
                    if any(b >= 0x80 for b in data[:8192]):
                        return "utf-8"
                except UnicodeDecodeError:
                    pass
            return claimed
    m = _CHARSET_IN_META.search(data[:8192])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_content(data: bytes, content_type: str | None = None) -> tuple[str, str]:
    """(text, charset). utf-8-sig / utf-16 codecs strip BOMs; undecodable
    bytes are replaced, never raised (a crawl must not die on one page)."""
    charset = detect_charset(data, content_type)
    codec = {"utf-8": "utf-8-sig", "utf-16": "utf-16", "utf-32": "utf-32"}.get(
        charset, charset
    )
    try:
        return data.decode(codec, errors="replace"), charset
    except LookupError:  # unknown label from a malformed meta tag
        return data.decode("utf-8", errors="replace"), "utf-8"


# --------------------------------------------------------------------------
# tolerant DOM-less extraction (parse-html HtmlParser + DOMContentUtils)
# --------------------------------------------------------------------------

_SKIP_TEXT = {"script", "style"}


class _Extractor(HTMLParser):
    """Collect title, text, outlinks (+anchor text), meta map, base href."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self.meta: dict[str, str] = {}
        # parse-metatags (MetaTagsParser.java): EVERY occurrence, in order,
        # keyed by lowercase name — multi-valued (DC.creator can repeat)
        self.metatags: dict[str, list[str]] = {}
        self.base_href: str | None = None
        self.outlinks: list[tuple[str, list[str]]] = []  # (href, anchor parts)
        self.headings: dict[str, list[str]] = {}  # h1/h2 → texts (headings plugin)
        # parse-js (JSParseFilter.walk): script bodies, on* handler attrs
        # and javascript: hrefs collected for the optional JS link filter
        self.js_fragments: list[str] = []
        self._in_title = False
        self._in_script = False
        self._in_heading: str | None = None
        self._skip_depth = 0
        self._open_links: list[int] = []  # indexes into outlinks

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        # JSParseFilter.walk:137-152 — every on* event handler attribute and
        # javascript: href is a JS fragment candidate
        for name, value in attrs:
            if value and (
                name.startswith("on")
                or (name == "href" and "javascript:" in value.lower())
            ):
                self.js_fragments.append(value)
        if tag == "title":
            self._in_title = True
        elif tag == "html" and a.get("lang"):
            # HTMLLanguageParser (language-identifier): <html lang="..">
            # lands in parse meta as the detected language
            self.meta.setdefault("lang", a["lang"].strip().lower())
        elif tag in _SKIP_TEXT:
            self._skip_depth += 1
            if tag == "script":
                self._in_script = True
                self.js_fragments.append("")  # open a script buffer
        elif tag == "base" and a.get("href") and self.base_href is None:
            self.base_href = a["href"]
        elif tag == "meta":
            name = a.get("name") or a.get("http-equiv")
            if name and a.get("content") is not None:
                self.meta.setdefault(name.lower(), a["content"])
                self.metatags.setdefault(name.lower(), []).append(a["content"])
        elif tag in ("h1", "h2"):
            self._in_heading = tag
            self.headings.setdefault(tag, []).append("")
        elif tag == "a":
            href = a.get("href")
            if href:
                self._open_links.append(len(self.outlinks))
                self.outlinks.append((href, []))

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag in ("h1", "h2") and self._in_heading == tag:
            self._in_heading = None
        elif tag in _SKIP_TEXT and self._skip_depth:
            self._skip_depth -= 1
            if tag == "script":
                self._in_script = False
        elif tag == "a" and self._open_links:
            self._open_links.pop()

    def handle_data(self, data):
        if self._skip_depth:
            if self._in_script and self.js_fragments:
                self.js_fragments[-1] += data  # script body text
            return
        if self._in_title:
            self.title_parts.append(data)
        elif data.strip():
            if self._in_heading and self.headings[self._in_heading]:
                self.headings[self._in_heading][-1] += data
            self.text_parts.append(data)
            for idx in self._open_links:
                self.outlinks[idx][1].append(data)


class _Reserializer(HTMLParser):
    """Event-stream re-serializer for parsefilter-debug: emits normalized
    markup (lowercased tags, double-quoted escaped attributes, entity-escaped
    text) from whatever tag soup came in."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []

    @staticmethod
    def _esc(s: str) -> str:
        return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def _fmt(self, tag: str, attrs) -> str:
        parts = [tag]
        for k, v in attrs:
            parts.append(
                f'{k}="{(v or "").replace("&", "&amp;").replace(chr(34), "&quot;")}"'
            )
        return " ".join(parts)

    def handle_starttag(self, tag, attrs):  # noqa: D102
        self.out.append(f"<{self._fmt(tag, attrs)}>")

    def handle_startendtag(self, tag, attrs):  # noqa: D102
        self.out.append(f"<{self._fmt(tag, attrs)}/>")

    def handle_endtag(self, tag):  # noqa: D102
        self.out.append(f"</{tag}>")

    def handle_data(self, data):  # noqa: D102
        self.out.append(self._esc(data))

    def handle_comment(self, data):  # noqa: D102
        self.out.append(f"<!--{data}-->")

    def handle_decl(self, decl):  # noqa: D102
        self.out.append(f"<!{decl}>")


def _reserialize_markup(content: str) -> str:
    r = _Reserializer()
    try:
        r.feed(content)
        r.close()
    except Exception:  # noqa: BLE001 — emit what was seen
        pass
    return "".join(r.out)


def _ws_norm(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def parse_html_page(
    url: str, content: str, *, cfg: NutchConfig = DEFAULT
) -> dict:
    """One page → {title, text, outlinks[(to_url, anchor)], meta}.

    Outlinks resolve against <base href> (itself resolved against the fetch
    URL — protocol-relative bases work, NUTCH-2478), are capped at
    db.max.outlinks.per.page and db.max.outlink.length
    (ParseOutputFormat.java:150-362).
    """
    ex = _Extractor()
    try:
        ex.feed(content)
        ex.close()
    except Exception:  # noqa: BLE001 — a broken page yields what was seen
        pass
    base = urljoin(url, ex.base_href) if ex.base_href else url
    links: list[tuple[str, str]] = []
    seen: set[str] = set()
    # robots meta nofollow: discard the page's outlinks entirely
    # (parse-html HtmlParser.java:165-177 / HTMLMetaProcessor directives)
    robots = ex.meta.get("robots", "").lower()
    outlink_src = [(h, a) for h, a in ex.outlinks]
    # parse-js filter (opt-in, like the reference's plugin.includes): links
    # harvested from script bodies / on* handlers / javascript: hrefs join
    # the outlink stream with empty anchors (JSParseFilter.filter:96-160)
    if cfg.parse_js_filter and "nofollow" not in robots:
        from nutch_spark.operators.parse_js import extract_js_links

        for frag in ex.js_fragments:
            for js_url in extract_js_links(frag, base):
                outlink_src.append((js_url, []))
    if "nofollow" in robots:
        outlink_src = []
    max_links = _outlink_limit(cfg)
    for href, anchor_parts in outlink_src:
        if len(links) >= max_links:
            break
        href = href.strip()
        if not href or href.startswith(("javascript:", "mailto:", "#")):
            continue
        try:
            to_url = urljoin(base, href)
        except ValueError:
            continue
        if len(to_url) > cfg.max_outlink_length or to_url in seen:
            continue
        seen.add(to_url)
        links.append((to_url, _ws_norm(" ".join(anchor_parts))))
    meta = dict(ex.meta)
    # headings plugin (HeadingsParseFilter): first h1/h2 land in parse meta
    for h, texts in ex.headings.items():
        vals = [_ws_norm(t) for t in texts if _ws_norm(t)]
        if vals and h not in meta:
            meta[h] = vals[0]
    # parse-metatags (MetaTagsParser.java:67-78, filter:96-125): every meta
    # name/http-equiv tag lands in parse meta under 'metatag.<lowercase>',
    # restricted by metatags.names ('*' = all, matched ignoring case).
    # Multi-valued tags (Metadata.add appends) join on '\t' — the map column
    # is string-valued; index-metadata splits on the same separator.
    wanted = {n.lower() for n in cfg.metatags_names}
    for name, values in ex.metatags.items():
        if "*" in wanted or name in wanted:
            meta["metatag." + name] = "\t".join(values)
    # parsefilter-debug (DebugParseFilter.java:45-52): serialize the parsed
    # markup into parse meta "DOM". The reference saves the DOM tree via
    # DomUtil.saveDom; our parser is event-based, so the stored form is the
    # normalized re-emission of the event stream (balanced as received).
    if cfg.parse_debug_dom:
        meta["DOM"] = _reserialize_markup(content)
    return {
        "title": _ws_norm("".join(ex.title_parts)),
        "text": _ws_norm(" ".join(ex.text_parts)),
        "outlinks": links,
        "meta": meta,
    }


PARSE_HTML_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField(
            "outlinks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("to_url", T.StringType(), True),
                        T.StructField("anchor", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("parse_text", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("charset", T.StringType(), True),
        T.StructField("signature", T.BinaryType(), True),
    ]
)


def _outlink_limit(cfg: NutchConfig) -> int:
    """Effective db.max.outlinks.per.page: negative = unlimited
    (ParseOutputFormat.java:150: maxOutlinks < 0 → Integer.MAX_VALUE)."""
    cap = cfg.max_outlinks_per_page
    return cap if cap >= 0 else (1 << 31) - 1


def _parse_nonhtml_row(row, raw: bytes, ctype: str | None, base: str, url_re, cfg) -> dict:
    """One non-HTML fetch row → parse-row dict (the parse-text /
    parse-tika slots of ParserFactory routing). Declared ``text/*`` goes
    through decode_content with the FULL Content-Type (EncodingDetector:
    BOM → header charset= param → sniff → windows-1252 fallback, so
    non-UTF-8 text keeps its content); everything else through the binary
    dispatch — and when that yields nothing for magic-less undeclared
    bytes, the text fallback decodes them like the parse-text path would.
    Outlinks come from the OutlinkExtractor activation regex over the
    extracted text (OutlinkExtractor.java:95), capped at
    db.max.outlinks.per.page (negative = unlimited). CHM documents surface
    their #SYSTEM metadata (title/generator/default topic) the way Tika's
    ChmParser does."""
    title = ""
    meta: dict[str, str] = {}
    charset = None
    if base.startswith("text/"):
        btext, charset = decode_content(raw, ctype)
        meta["Content-Type"] = base
    else:
        from nutch_spark.operators.parse_binary import extract_text

        mime, btext = extract_text(raw)
        if mime == "application/octet-stream" and not btext and not base:
            # no magic, no declared type, not UTF-8 — the pre-routing
            # behavior decoded it as text (charset detection + cp1252
            # fallback); keep that for undeclared non-UTF-8 text pages
            btext, charset = decode_content(raw, ctype)
            mime = "text/plain" if btext.strip() else mime
        meta["Content-Type"] = mime
        from nutch_spark.operators.parse_tail import CHM_MIME

        if mime == CHM_MIME:
            from nutch_spark.operators.parse_tail import parse_chm_system

            # second pass is the PMGL directory walk only (no LZX work)
            info = parse_chm_system(raw)
            title = info.get("title", "")
            for k in ("default_topic", "generator"):
                if info.get(k):
                    meta[f"chm.{k}"] = info[k]
    cap = _outlink_limit(cfg)
    links: list[dict] = []
    seen: set[str] = set()
    for m in url_re.finditer(btext or ""):
        if len(links) >= cap:
            break
        u = m.group(0)
        if u in seen:
            continue
        seen.add(u)
        links.append({"to_url": u, "anchor": ""})
    return {
        "url": row.url,
        "title": title,
        "outlinks": links,
        "parse_text": btext,
        "meta": meta,
        "charset": charset,
        "signature": getattr(row, "signature", None),
    }


def parse_html(
    fetch_log: DataFrame,
    *,
    cfg: NutchConfig = DEFAULT,
) -> DataFrame:
    """Fetch log → parse_data, same shape as the regex fast path plus
    ``meta``/``charset``. ``content`` may be BINARY (raw fetch bytes — the
    charset is detected per EncodingDetector) or STRING (already decoded).

    Narrow map — Arrow batches through mapInPandas, no shuffle, no
    per-row Python UDF calls (one Python invocation per batch).
    """
    content_is_binary = isinstance(
        fetch_log.schema["content"].dataType, T.BinaryType
    )
    has_type = "content_type" in fetch_log.columns
    has_sig = "signature" in fetch_log.columns
    ok = fetch_log.filter(
        (F.col("status") == "fetch_success") & F.col("content").isNotNull()
    )
    # the content_type COLUMN is the stripped base type; live fetches carry
    # the FULL Content-Type header (charset= param included) in metadata —
    # prefer it so EncodingDetector's header-charset step sees the param
    # (http_fetch_fn stores it; EncodingDetector.java:157-229 reads the
    # header before sniffing)
    type_col = None
    if "metadata" in fetch_log.columns and has_type:
        type_col = F.coalesce(
            F.element_at("metadata", "Content-Type"), F.col("content_type")
        ).alias("content_type")
    elif has_type:
        type_col = F.col("content_type")
    cols = ["url", "content"] + ([type_col] if type_col is not None else []) + (
        ["signature"] if has_sig else []
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re as _re

        from nutch_spark.operators.fetcher import TEXT_URL_PATTERN

        url_re = _re.compile(TEXT_URL_PATTERN)
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                ctype = getattr(row, "content_type", None)
                if content_is_binary:
                    raw = bytes(row.content)
                    # ParserFactory routing (parse/ParserFactory.java:96-142
                    # via parse-plugins.xml): text/html|xhtml and sniffed
                    # markup → parse-html; declared text/* → the parse-text
                    # path (EncodingDetector charset handling + the
                    # OutlinkExtractor activation regex); everything else →
                    # the binary dispatch (the parse-tika slot). The
                    # undeclared-mime sniff decodes through decode_content
                    # first so BOM-prefixed / UTF-16 markup routes right.
                    base = (ctype or "").split(";")[0].strip().lower()
                    markup = base in ("text/html", "application/xhtml+xml")
                    if not base:
                        preview, _ = decode_content(raw[:1024], ctype)
                        markup = preview.lstrip()[:1].startswith("<")
                    if not markup:
                        out.append(
                            _parse_nonhtml_row(row, raw, ctype, base, url_re, cfg)
                        )
                        continue
                    text, charset = decode_content(raw, ctype)
                else:
                    text, charset = row.content, None
                parsed = parse_html_page(row.url, text, cfg=cfg)
                out.append(
                    {
                        "url": row.url,
                        "title": parsed["title"],
                        "outlinks": [
                            {"to_url": u, "anchor": a}
                            for u, a in parsed["outlinks"]
                        ],
                        "parse_text": parsed["text"],
                        "meta": parsed["meta"],
                        "charset": charset,
                        "signature": getattr(row, "signature", None),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in PARSE_HTML_SCHEMA.fields]
            )

    return ok.select(*cols).mapInPandas(run, PARSE_HTML_SCHEMA)


def regex_parse_filter(
    parse_data: DataFrame,
    rules: dict[str, tuple[str, str]],
    *,
    html_col: str = "content",
    text_col: str = "parse_text",
) -> DataFrame:
    """parsefilter-regex (RegexParseFilter.java:56-143): for every rule
    ``field -> (source, regex)`` with source ``html`` or ``text``, set parse
    metadata ``field`` to 'true'/'false' by whether the regex matches.
    Pure rlike columns — codegen'd, no UDF."""
    out = parse_data
    for field, (source, regex) in sorted(rules.items()):
        if source not in ("html", "text"):  # RegexParseFilter rejects these
            raise ValueError(f"unknown parsefilter source {source!r} for {field!r}")
        col = html_col if source == "html" else text_col
        out = out.withColumn(
            f"pf_{field}",
            F.when(F.col(col).rlike(regex), "true").otherwise("false"),
        )
    return out
