"""Indexing-filter chain breadth (SURVEY.md §2.11) — the reference's plugin
filters re-expressed as composable ``doc -> doc`` column transforms chained
with ``DataFrame.transform``.

Reference plugins covered:
- index-more  (MoreIndexingFilter.java:109-305): date precedence
  lastModified → modifiedTime → fetchTime; trimmed Content-Length; mime
  type + primary/sub parts; Content-Disposition filename as fallback title.
- index-links (LinksIndexingFilter.java:60-160): outlink/inlink URL (or
  host-only) fields, optional same-host suppression.
- index-static (StaticFieldIndexer.java): constant fields.
- index-metadata (MetadataIndexer.java:60-104): copy-through of chosen
  db/parse/content metadata keys.

Everything is pure column expressions (whole-stage codegen, no UDFs, no
shuffles — each filter is a narrow projection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.functions.dates import parse_http_date
from nutch_spark.functions.mime import clean_content_type, detect_mime
from nutch_spark.functions.urls import url_host

# Content-Disposition filename patterns, MoreIndexingFilter.java:270-283
# (ordered: quoted first, then bare token)
_FN_QUOTED = r"""filename=['"]([^"']+)"""
_FN_BARE = r"filename=(\S+)\b"


def more_indexing_fields(
    doc: DataFrame,
    *,
    content_meta: str = "content_meta",
    modified_time: str = "modified_time",
    fetched_at: str = "fetched_at",
    title: str = "title",
) -> DataFrame:
    """index-more: date, contentLength, type/primaryType/subType, title
    fallback from Content-Disposition."""
    last_mod_raw = F.element_at(content_meta, "Last-Modified")
    last_modified = parse_http_date(last_mod_raw)
    # date precedence (addTime:125-148): lastModified, else CrawlDatum
    # modifiedTime (when set), else fetch time
    date = F.coalesce(last_modified, F.col(modified_time), F.col(fetched_at))

    # NUTCH-1010: Content-Length arrives untrimmed; empty after trim → absent
    clen = F.trim(F.element_at(content_meta, "Content-Length"))
    content_length = F.when(clen != "", clen.cast("long"))

    # addType:199-262: fetch-datum Content-Type outranks parse meta; fall
    # back to URL-based detection (tika.detect(url)); split into parts
    ctype_header = F.element_at(content_meta, "Content-Type")
    mime = F.when(
        ctype_header.isNotNull(), clean_content_type(ctype_header)
    ).otherwise(detect_mime(F.col("url")))
    parts = F.split(mime, "/")

    # resetTitle:285-299: only when no title was extracted
    cdisp = F.element_at(content_meta, "Content-Disposition")
    fn = F.coalesce(
        F.nullif(F.regexp_extract(cdisp, _FN_QUOTED, 1), F.lit("")),
        F.nullif(F.regexp_extract(cdisp, _FN_BARE, 1), F.lit("")),
    )
    title_out = F.coalesce(F.nullif(F.col(title), F.lit("")), fn)

    return doc.withColumns(
        {
            "last_modified": last_modified,
            "date": date,
            "content_length": content_length,
            "type": mime,
            "primary_type": F.element_at(parts, 1),
            "sub_type": F.element_at(parts, 2),
            title: title_out,
        }
    )


def _link_targets(
    links: Column,
    url_field: str,
    page_host: Column,
    *,
    hosts_only: bool,
    ignore_same_host: bool,
) -> Column:
    """Array of link URLs (or distinct hosts), same-host optionally dropped,
    malformed-URL entries (null host) skipped like the reference's caught
    MalformedURLException."""
    with_host = F.transform(
        links,
        lambda l: F.struct(
            l[url_field].alias("u"), F.lower(url_host(l[url_field])).alias("h")
        ),
    )
    valid = F.filter(with_host, lambda s: s["h"].isNotNull())
    if ignore_same_host:
        valid = F.filter(valid, lambda s: s["h"] != page_host)
    if hosts_only:
        return F.array_sort(F.array_distinct(F.transform(valid, lambda s: s["h"])))
    return F.transform(valid, lambda s: s["u"])


def links_indexing_fields(
    doc: DataFrame,
    *,
    outlinks: str = "outlinks",
    inlinks: str | None = "inlinks",
    hosts_only: bool = False,
    ignore_outlinks_same_host: bool = False,
    ignore_inlinks_same_host: bool = False,
) -> DataFrame:
    """index-links: ``outlink_urls`` / ``inlink_urls`` array fields."""
    page_host = F.lower(url_host("url"))
    out = doc.withColumn(
        "outlink_urls",
        _link_targets(
            F.col(outlinks),
            "to_url",
            page_host,
            hosts_only=hosts_only,
            ignore_same_host=ignore_outlinks_same_host,
        ),
    )
    if inlinks and inlinks in doc.columns:
        out = out.withColumn(
            "inlink_urls",
            _link_targets(
                F.col(inlinks),
                "from_url",
                page_host,
                hosts_only=hosts_only,
                ignore_same_host=ignore_inlinks_same_host,
            ),
        )
    return out


def language_field(
    doc: DataFrame,
    *,
    text: str = "text",
    key: str = "url",
    content_meta: str = "content_meta",
    parse_meta: str = "parse_meta",
    out_col: str = "lang",
) -> DataFrame:
    """language-identifier plugin (language-identifier/.../
    LanguageIndexingFilter.java + HTMLLanguageParser): the indexed ``lang``
    field, resolved in the reference's precedence order —

      1. parse-detected language (HTMLLanguageParser writes parse-meta
         'lang' from <html lang>/meta tags)
      2. the Content-Language HTTP header (content metadata)
      3. statistical identification over the document text (the plugin's
         Tika LanguageIdentifier ≙ our trained trigram classifier,
         datapipe/textstats.langid_trained)

    Only rows where 1-2 miss pay the classification (the classifier runs on
    the full frame but its result is coalesced last, and the trigram
    explode is prefix-bounded, so the added cost is two bounded shuffles).
    """
    from nutch_spark.datapipe.textstats import langid_trained

    classified = langid_trained(doc, text=text, out_col="_lang_stat", key=key)
    detected = F.coalesce(
        F.element_at(parse_meta, "lang") if parse_meta in doc.columns else F.lit(None),
        F.element_at(parse_meta, "metatag.content-language")
        if parse_meta in doc.columns
        else F.lit(None),
        F.lower(
            F.trim(
                F.split_part(
                    F.element_at(content_meta, "Content-Language"),
                    F.lit(","),
                    F.lit(1),
                )
            )
        )
        if content_meta in doc.columns
        else F.lit(None),
        F.col("_lang_stat"),
    )
    return classified.withColumn(out_col, detected).drop("_lang_stat")


def static_fields(doc: DataFrame, fields: dict[str, str]) -> DataFrame:
    """index-static: constant fields (index.static 'f1:v1,f2:v2' parsed by
    the caller into a dict)."""
    return doc.withColumns({k: F.lit(v) for k, v in fields.items()})


def metadata_fields(
    doc: DataFrame,
    *,
    db_keys: tuple[str, ...] = (),
    parse_keys: tuple[str, ...] = (),
    content_keys: tuple[str, ...] = (),
    db_meta: str = "metadata",
    parse_meta: str = "parse_meta",
    content_meta: str = "content_meta",
    separator: str | None = None,
    mv_fields: tuple[str, ...] = (),
) -> DataFrame:
    """index-metadata: copy chosen metadata entries into doc fields, column
    name prefixed by source the way the plugin namespaces conflicts.

    ``separator`` + ``mv_fields`` mirror MetadataIndexer.add
    (index.metadata.separator / index.metadata.multivalued.fields,
    MetadataIndexer.java:93-108): a key listed in ``mv_fields`` whose value
    contains the separator becomes an ARRAY column of trimmed non-empty
    parts; all other values are trimmed, empty → NULL. parse-metatags
    values arrive '\\t'-joined, so ``separator="\\t"`` re-expands them."""

    def shaped(key: str, raw: Column) -> Column:
        if separator is not None and key in mv_fields:
            # the reference splits on a LITERAL separator string
            # (MetadataIndexer.java value.split is regex too, but the conf
            # contract is a literal like '|' or '\t') — F.split takes a
            # Java regex, so escape metacharacters ('|' would otherwise
            # split at every position and keep the separators as values)
            import re as _re

            parts = F.split(raw, F.lit(_re.escape(separator)), -1)
            # single-arg lambda: transform would otherwise feed the element
            # INDEX into trim's optional trim-character parameter
            arr = F.filter(
                F.transform(parts, lambda v: F.trim(v)), lambda v: v != ""
            )
            return F.when(F.size(arr) > 0, arr)
        trimmed = F.trim(raw)
        return F.when(trimmed != "", trimmed)

    def colname(src: str, key: str) -> str:
        return f"meta_{src}_" + "".join(
            c if c.isalnum() else "_" for c in key.lower()
        )

    cols: dict[str, Column] = {}
    for key in db_keys:
        cols[colname("db", key)] = shaped(key, F.element_at(db_meta, key))
    for key in parse_keys:
        cols[colname("parse", key)] = shaped(key, F.element_at(parse_meta, key))
    for key in content_keys:
        cols[colname("content", key)] = shaped(key, F.element_at(content_meta, key))
    return doc.withColumns(cols)


def anchor_fields(
    doc: DataFrame,
    linkdb: DataFrame,
    *,
    url: str = "url",
    max_anchors: int = 100,
) -> DataFrame:
    """index-anchor (AnchorIndexingFilter.java): attach the page's deduped
    inlink anchor texts as an ``anchors`` array field, capped. The linkdb
    side is already keyed on the target url — one equi-join, no new
    shuffle when both sides share the url bucketing."""
    anchors = linkdb.select(
        F.col(url),
        F.slice(F.array_distinct(F.col("anchors")), 1, max_anchors).alias("anchors"),
    )
    return doc.join(anchors, url, "left").withColumn(
        "anchors", F.coalesce("anchors", F.array().cast("array<string>"))
    )


def replace_fields(
    doc: DataFrame, rules: list[tuple[str, str, str]]
) -> DataFrame:
    """index-replace (ReplaceIndexer.java): ordered sed-style rewrites
    ``(field, pattern, replacement)`` applied in sequence — later rules see
    earlier rules' output, exactly like the plugin's ordered property list."""
    out = doc
    for field, pattern, replacement in rules:
        out = out.withColumn(field, F.regexp_replace(field, pattern, replacement))
    return out


def jexl_doc_filter(doc: DataFrame, expr: str) -> DataFrame:
    """index-jexl-filter: keep documents whose fields satisfy the JEXL
    expression (translated to a SQL predicate by functions.jexl)."""
    from nutch_spark.functions.jexl import jexl_to_sql

    return doc.filter(F.expr(jexl_to_sql(expr)))


def subcollection_field(
    doc: DataFrame,
    collections: dict[str, tuple[str, ...]],
    *,
    url: str = "url",
) -> DataFrame:
    """subcollection plugin: tag each doc with every collection whose URL
    whitelist prefixes match (Subcollection.java filter semantics). Output
    column ``subcollections`` is the sorted matching set."""
    def _any_prefix(prefixes: tuple[str, ...]) -> Column:
        cond = F.lit(False)
        for p in prefixes:
            cond = cond | F.col(url).startswith(p)
        return cond

    tags = [
        F.when(_any_prefix(prefixes), F.lit(name))
        for name, prefixes in sorted(collections.items())
    ]
    arr = F.array_sort(
        F.filter(F.array(*tags), lambda x: x.isNotNull())
    )
    return doc.withColumn("subcollections", arr)


def tld_field(doc: DataFrame, *, url: str = "url") -> DataFrame:
    """tld plugin: index the url's top-level domain as a field."""
    from nutch_spark.functions.urls import url_tld

    return doc.withColumn("tld", url_tld(F.col(url)))


def _ip_to_long(ip: Column) -> Column:
    # malformed/short IPs degrade to NULL (try_* forms — a bad address must
    # never kill the job, same policy as url_host), and anything that is not
    # exactly four octets is rejected outright
    o = F.split(ip, r"\.")
    octet = lambda i: F.try_element_at(o, F.lit(i)).try_cast("long")  # noqa: E731
    raw = (
        octet(1) * 16777216 + octet(2) * 65536 + octet(3) * 256 + octet(4)
    )
    return F.when(F.size(o) == 4, raw)


def geoip_fields(
    doc: DataFrame,
    ranges: list[tuple[str, str, str]],
    *,
    ip: str = "ip",
) -> DataFrame:
    """index-geoip analog: map an IP column to a country via IP-range
    lookup. The container has no GeoIP database, so ``ranges`` is the
    caller-supplied (start_ip, end_ip, country) table — the real MaxMind
    file drops in as the same three columns.

    Scale shape: a naive range join is a broadcast nested loop over every
    (row x range). Instead each range EXPLODES into the /16 prefix buckets
    it covers and the lookup becomes a broadcast EQUI-join on the bucket
    plus a residual range filter — O(rows) work, the standard interval-
    bucketing rewrite for range joins at scale.
    """
    from pyspark.sql import SparkSession

    def to_int(s: str) -> int:
        a, b, c, d = (int(x) for x in s.split("."))
        return a * 16777216 + b * 65536 + c * 256 + d

    spark = SparkSession.getActiveSession()
    rows = [(to_int(s), to_int(e), country) for s, e, country in ranges]
    rdf = spark.createDataFrame(rows, "r_start long, r_end long, country string")
    buckets = rdf.withColumn(
        "bucket",
        F.explode(
            F.sequence(F.floor(F.col("r_start") / 65536), F.floor(F.col("r_end") / 65536))
        ),
    )
    ip_long = _ip_to_long(F.col(ip))
    with_bucket = doc.withColumn("_ipl", ip_long).withColumn(
        "_bucket", F.floor(F.col("_ipl") / 65536)
    )
    joined = with_bucket.join(
        F.broadcast(buckets),
        (F.col("_bucket") == F.col("bucket"))
        & F.col("_ipl").between(F.col("r_start"), F.col("r_end")),
        "left",
    )
    return joined.drop("_ipl", "_bucket", "bucket", "r_start", "r_end")


# --- microformats-reltag + creativecommons (niche parse/index plugins) ------

_ANCHOR_RE = "<[aA][^>]*>"
_HREF_RE = "href\\s*=\\s*\"([^\"]*)\""


def rel_tag_field(content: Column | str) -> Column:
    """microformats-reltag (RelTagParser.java:85-136): the distinct set of
    folksonomy tags from anchors carrying ``rel="tag"`` — the tag is the
    url-DECODED last path segment of the href. Pure regexp/array columns
    (codegen'd); order-insensitive distinct set like the reference's Set."""
    c = F.col(content) if isinstance(content, str) else content
    anchors = F.regexp_extract_all(c, F.lit(_ANCHOR_RE), F.lit(0))
    tagged = F.filter(
        anchors, lambda a: a.rlike("rel\\s*=\\s*\"?tag\"?") & a.rlike(_HREF_RE)
    )
    hrefs = F.transform(tagged, lambda a: F.regexp_extract(a, _HREF_RE, 1))
    tags = F.transform(
        hrefs,
        lambda h: F.try_url_decode(
            F.substring_index(F.substring_index(F.substring_index(h, "#", 1), "?", 1), "/", -1)
        ),
    )
    return F.array_distinct(
        F.filter(tags, lambda t: t.isNotNull() & (t != ""))
    )


_CC_PREFIX = "http://creativecommons.org/licenses/"


def cc_license_fields(content: Column | str) -> list[Column]:
    """creativecommons CCParseFilter (CCParseFilter.java:80-140): identify
    the CC license of a page and where it was found, priority exactly the
    reference's — (1) RDF in comments, (2) anchor with rel="license"
    pointing into creativecommons.org/licenses/, (3) any anchor href into
    the license namespace. Returns [license_url, license_location] columns
    ('rdf' | 'rel' | 'a' | NULL)."""
    c = F.col(content) if isinstance(content, str) else content
    rdf = F.regexp_extract(
        c, "license\\s+rdf:resource\\s*=\\s*\"([^\"]*)\"", 1
    )
    anchors = F.regexp_extract_all(c, F.lit(_ANCHOR_RE), F.lit(0))
    rel_anchors = F.filter(
        anchors,
        lambda a: a.rlike("rel\\s*=\\s*\"?license\"?")
        & F.regexp_extract(a, _HREF_RE, 1).startswith(_CC_PREFIX),
    )
    cc_anchors = F.filter(
        anchors, lambda a: F.regexp_extract(a, _HREF_RE, 1).startswith(_CC_PREFIX)
    )
    first_href = lambda arr: F.regexp_extract(F.element_at(arr, 1), _HREF_RE, 1)  # noqa: E731
    url = (
        F.when(rdf != "", rdf)
        .when(F.size(rel_anchors) > 0, first_href(rel_anchors))
        .when(F.size(cc_anchors) > 0, first_href(cc_anchors))
    )
    location = (
        F.when(rdf != "", "rdf")
        .when(F.size(rel_anchors) > 0, "rel")
        .when(F.size(cc_anchors) > 0, "a")
    )
    return [url.alias("license_url"), location.alias("license_location")]


def mimetype_filter_predicate(mime, rules_text: str):
    """mimetype-filter (MimeTypeIndexingFilter.java): the rules file's first
    ``+``/``-`` line sets the default (``+`` accept-unless-listed, ``-``
    deny-unless-listed); the remaining lines are mime-type PREFIXES matched
    the way the reference's TrieStringMatcher does (``image`` matches
    ``image/png``). Returns TRUE when the document stays in the index.
    Pure startswith chain — codegen, no UDF."""
    c = F.col(mime) if isinstance(mime, str) else mime
    accept_default = True
    prefixes: list[str] = []
    for raw in rules_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line == "+":
            accept_default = True
        elif line == "-":
            accept_default = False
        else:
            prefixes.append(line)
    listed = F.lit(False)
    for p in prefixes:
        listed = listed | F.lower(c).startswith(p.lower())
    return ~listed if accept_default else listed


def parse_replace_rules(
    property_text: str,
) -> list[tuple[str, str, list[tuple[str, str, str, str]]]]:
    """The ``index.replace.regexp`` property format (ReplaceIndexer.java):
    lines of ``field[:target]=/pattern/replacement/[flags]``, optionally
    scoped by preceding ``hostmatch=<regex>`` / ``urlmatch=<regex>`` lines.
    Returns ordered groups ``(scope_kind, scope_regex, rules)`` where
    scope_kind is ``"global"``/``"host"``/``"url"`` and each rule is
    ``(field, target, pattern, replacement)``. Java Pattern flag integers
    map to inline flags (2→(?i), 8→(?m), 32→(?s)). Invalid lines are
    SKIPPED silently, exactly like the reference (TestIndexReplace.
    testInvalidPatterns: a broken pattern must not fail the filter or
    touch its field)."""
    import re as _re

    groups: list[tuple[str, str, list]] = []
    current = ("global", "", [])
    groups.append(current)
    for raw in property_text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("hostmatch="):
            current = ("host", line.split("=", 1)[1].strip(), [])
            groups.append(current)
            continue
        if line.startswith("urlmatch="):
            current = ("url", line.split("=", 1)[1].strip(), [])
            groups.append(current)
            continue
        m = _re.match(r"^([\w.]+)(?::([\w.]+))?=/(.+)/(.*)/(\d*)$", line)
        if not m:
            continue  # incomplete property — skipped like the reference
        field, target, pattern, replacement, flags = m.groups()
        try:
            _re.compile(pattern)
        except _re.error:
            continue  # invalid pattern — skipped
        if flags:
            inline = "".join(
                ch
                for bit, ch in ((2, "i"), (8, "m"), (32, "s"))
                if int(flags) & bit
            )
            if inline:
                pattern = f"(?{inline}){pattern}"
        current[2].append((field, target or field, pattern, replacement))
    return [g for g in groups if g[2]]


def replace_fields_scoped(
    doc: DataFrame,
    groups: list[tuple[str, str, list[tuple[str, str, str, str]]]],
    *,
    url: str = "url",
) -> DataFrame:
    """Apply :func:`parse_replace_rules` groups in order: global groups
    rewrite every row; host/url-scoped groups rewrite only rows whose
    host/url matches the scope regex (ReplaceIndexer's hostmatch/urlmatch
    sections). Conditional regexp_replace chain — map-only, codegen."""
    from nutch_spark.functions.urls import url_host

    def col(name: str):  # dotted field names (metatag.author) need backticks
        return F.col(f"`{name}`") if "." in name else F.col(name)

    out = doc
    for scope_kind, scope_rx, rules in groups:
        if scope_kind == "host":
            cond = url_host(F.col(url)).rlike(scope_rx)
        elif scope_kind == "url":
            cond = F.col(url).rlike(scope_rx)
        else:
            cond = F.lit(True)
        for field, target, pattern, replacement in rules:
            if field not in out.columns:
                continue
            base = col(target) if target in out.columns else col(field)
            out = out.withColumn(
                target,
                F.when(cond, F.regexp_replace(col(field), pattern, replacement))
                .otherwise(base),
            )
    return out


def arbitrary_fields(doc: DataFrame, adds: list[dict]) -> DataFrame:
    """index-arbitrary (ArbitraryIndexingFilter.java:153-260): user-defined
    per-document field values. The reference reflection-loads
    ``index.arbitrary.function.N.class``/``.method`` and sets (overwrite) or
    adds (append → multi-valued) the returned value; the Spark-first
    equivalent takes the user's logic as a Column expression, a SQL string,
    or a callable(DataFrame) -> Column over the document's fields — the
    same power as the reference's allFieldsAccess constructor, minus the
    JVM classloading. Each spec: {"field": name, "expr": Column|str|callable,
    "overwrite": bool (default False, like the reference)}. With
    overwrite=False and an existing column, the new value is appended and
    the field becomes multi-valued (NutchDocument.add semantics)."""
    from pyspark.sql import types as T

    for spec in adds:
        name = spec["field"]
        expr = spec["expr"]
        if isinstance(expr, str):
            expr = F.expr(expr)
        elif callable(expr) and not isinstance(expr, Column):
            expr = expr(doc)
        if spec.get("overwrite", False) or name not in doc.columns:
            doc = doc.withColumn(name, expr)
        elif isinstance(doc.schema[name].dataType, T.ArrayType):
            doc = doc.withColumn(name, F.concat(F.col(name), F.array(expr)))
        else:
            doc = doc.withColumn(name, F.array(F.col(name), expr))
    return doc
