"""URL part extraction, normalization and filtering as column expressions.

Reference behaviour:
- host/domain/page/protocol: /root/reference/src/java/org/apache/nutch/util/URLUtil.java
  (getHost, getDomainName, getDomainSuffix, getPage), used by e.g.
  crawl/Generator.java:564-567 and util/DomainStatistics.java.
- normalization chain: src/plugin/urlnormalizer-basic/.../BasicURLNormalizer.java:44-63,169-230
  (lowercase scheme+host, strip default ports, remove trailing '#...' refs,
  resolve /./ and /../, collapse duplicate slashes, drop session ids).
- filters: src/plugin/urlfilter-{regex,prefix,suffix,domain}/ — regex
  allow/deny chains, prefix tries, domain lists.

Everything is built-in-function based (parse_url / regexp_replace / lower) so
Catalyst keeps it inside whole-stage codegen; no Python UDFs.

eTLD+1: the reference embeds a public-suffix table (conf/domain-suffixes.xml).
We ship a compact set of multi-label public suffixes; ``url_domain`` computes
registrable domain = one label left of the longest matching public suffix.
For full parity with the live PSL, pass a custom ``suffixes`` list (it becomes
a literal IN set — effectively a broadcast lookup, never a shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Common multi-label public suffixes (subset of the PSL / the reference's
# conf/domain-suffixes.xml). Single-label TLDs need no table: eTLD+1 is then
# just the last two labels.
_MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "co.nz", "net.nz", "org.nz",
    "co.za", "org.za", "web.za",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk", "com.my",
    "co.kr", "or.kr", "go.kr",
    "uk.com", "us.com", "eu.com",  # domain-suffixes.xml private registries
)


def url_protocol(url: Column | str) -> Column:
    """Scheme of the URL, lowercased (URLUtil.java getProtocol)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))


def url_host(url: Column | str) -> Column:
    """Hostname, lowercased, port stripped (URLUtil.getHost).

    try_parse_url, not parse_url: Spark 4's parse_url THROWS on malformed
    input, and crawl corpora are full of malformed URLs — one bad outlink
    must degrade to a NULL host (the reference catches MalformedURLException
    the same way, e.g. Inlinks.java:104-106), never kill the job.
    """
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_page(url: Column | str) -> Column:
    """Path component ("page", URLUtil.getPage); NULL on malformed input."""
    url = F.col(url) if isinstance(url, str) else url
    return F.try_parse_url(url, F.lit("PATH"))


def url_tld(url: Column | str) -> Column:
    """Last label of the host (util/DomainStatistics MODE_TLD)."""
    host = url_host(url)
    return F.element_at(F.split(host, r"\."), -1)


def url_domain(url: Column | str, suffixes: tuple[str, ...] = _MULTI_SUFFIXES) -> Column:
    """Registrable domain (eTLD+1), URLUtil.getDomainName semantics.

    host = a.b.example.co.uk -> example.co.uk; a.b.example.com -> example.com.
    The multi-label suffix set is a literal lookup (no shuffle, no UDF).
    """
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1))
    suffix_set = [F.lit(s) for s in suffixes]
    return (
        F.when(host.rlike(r"^[0-9.]+$"), host)  # IP literal: whole address
        .when(n <= 2, host)
        .when(last2.isin(*suffix_set), F.when(n >= 3, last3).otherwise(host))
        .otherwise(last2)
    )


def url_sld(url: Column | str) -> Column:
    """Second-level grouping used by DomainStatistics MODE_DOMAIN."""
    return url_domain(url)


# ---------------------------------------------------------------------------
# Normalization — BasicURLNormalizer.java:44-63,66-95,169-230
# ---------------------------------------------------------------------------

def normalize_url(url: Column | str, *, strip_session_ids: bool = True) -> Column:
    """Chain of the basic + querystring normalizer rules as one expression.

    Steps (each cites the reference rule it mirrors):
    1. trim whitespace
    2. lowercase scheme and host                (BasicURLNormalizer.java:169-190)
    3. drop default ports :80/:443              (:191-199)
    4. remove fragment '#...'                   (:200-204)
    5. collapse /./ and resolve /../ segments   (:66-95)
    6. collapse duplicate slashes in path       (regex rule set)
    7. drop well-known session-id query params  (urlnormalizer-querystring)
    8. empty path -> '/'
    """
    c = F.col(url) if isinstance(url, str) else url
    c = F.trim(c)
    # lowercase scheme
    c = F.regexp_replace(c, r"^([A-Za-z][A-Za-z0-9+.-]*):", r"$1:")
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    # split host[:port] / path?query#frag
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 20))
    host = F.lower(F.regexp_replace(hostport, r":\d+$", ""))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "ftp") & (port == "21"))
    )
    host_norm = F.when(keep_port, F.concat(host, F.lit(":"), port)).otherwise(host)
    # strip trailing dot on host
    host_norm = F.regexp_replace(host_norm, r"\.$", "")
    # fragment off
    tail = F.regexp_replace(tail, r"#.*$", "")
    # resolve /./ then /seg/../ (applied repeatedly via nested replace passes)
    for _ in range(4):
        tail = F.regexp_replace(tail, r"/\./", "/")
        tail = F.regexp_replace(tail, r"/[^/]+/\.\./", "/")
    tail = F.regexp_replace(tail, r"/{2,}", "/")
    if strip_session_ids:
        # urlnormalizer-querystring / regex-normalize.xml default rules
        sess = r"(?i)(phpsessid|jsessionid|sessionid|sid|cfid|cftoken)=[^&]*&?"
        tail = F.regexp_replace(tail, r"\?" + sess, "?")
        tail = F.regexp_replace(tail, r"&" + sess, "&")
        tail = F.regexp_replace(tail, r"[?&]$", "")
    path = F.when(tail == "", F.lit("/")).otherwise(tail)
    normalized = F.concat(scheme, F.lit("://"), host_norm, path)
    # non-hierarchical or schemeless URLs pass through trimmed
    return F.when(F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://", 0) == "", c).otherwise(
        normalized
    )


# ---------------------------------------------------------------------------
# Scoped normalizers — net/URLNormalizers.java runs a per-scope plugin chain
# (default, inject, outlink, fetcher, indexer, ...). The plugin rules below
# are column expressions; ``normalize_url_scoped`` composes them in the
# reference's chain order.
# ---------------------------------------------------------------------------

AJAX_PART = "#!"
ESCAPED_PART = "_escaped_fragment_="


def ajax_normalize(url: Column | str, *, scope: str = "default") -> Column:
    """urlnormalizer-ajax (AjaxURLNormalizer.java:62-170): crawler scopes
    rewrite ``#!fragment`` to ``?_escaped_fragment_=...`` (escaped); the
    ``indexer`` scope reverses an escaped-fragment query back to ``#!``."""
    c = F.col(url) if isinstance(url, str) else url

    if scope == "indexer":
        # _escaped_fragment_ back to #! (:111-170): the k/v pair after the
        # FIRST '&' (or the whole query) is the escaped fragment
        base = F.substring_index(c, "?", 1)
        query = F.regexp_extract(c, r"\?(.*)$", 1)
        has_amp = query.contains("&")
        kv = F.when(has_amp, F.regexp_extract(query, "&(.*)$", 1)).otherwise(query)
        rem = F.when(has_amp, F.substring_index(query, "&", 1)).otherwise(F.lit(""))
        frag = F.coalesce(
            F.try_url_decode(F.replace(kv, F.lit(ESCAPED_PART), F.lit(""))),
            F.replace(kv, F.lit(ESCAPED_PART), F.lit("")),
        )
        rebuilt = F.concat(
            base,
            F.when(rem != "", F.concat(F.lit("?"), rem)).otherwise(F.lit("")),
            F.lit(AJAX_PART),
            frag,
        )
        return F.when(c.contains(ESCAPED_PART), rebuilt).otherwise(
            ajax_normalize(c, scope="default")
        )

    # #! to _escaped_fragment_ (:81-109)
    prefix = F.substring_index(c, AJAX_PART, 1)
    frag = F.regexp_extract(c, r"#!(.*)$", 1)
    sep = F.when(prefix.contains("?"), F.lit("&")).otherwise(F.lit("?"))
    rebuilt = F.concat(prefix, sep, F.lit(ESCAPED_PART), F.url_encode(frag))
    return F.when(c.contains(AJAX_PART), rebuilt).otherwise(c)


def host_normalize(url: Column | str, host_map: dict[str, str]) -> Column:
    """urlnormalizer-host (HostURLNormalizer.java): rewrite configured
    hostnames (e.g. www.example.org -> example.org). The map compiles to a
    literal CASE chain — broadcast-lookup behavior, no shuffle."""
    c = F.col(url) if isinstance(url, str) else url
    if not host_map:
        return c
    host = url_host(c)
    mapped: Column | None = None
    for src, dst in host_map.items():
        cond = host == src.lower()
        mapped = F.when(cond, dst) if mapped is None else mapped.when(cond, dst)
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+(.*)$", 1)
    scheme = url_protocol(c)
    return F.when(
        mapped.isNotNull() & (host != F.lower(mapped)),
        F.concat(scheme, F.lit("://"), mapped, rest),
    ).otherwise(c)


def protocol_normalize(
    url: Column | str,
    host_protocols: dict[str, str] | None = None,
    domain_protocols: dict[str, str] | None = None,
) -> Column:
    """urlnormalizer-protocol (ProtocolURLNormalizer.java): force the
    configured scheme for listed hosts (exact) or domain suffixes (host
    endswith), e.g. http://nutch.apache.org/ -> https://nutch.apache.org/."""
    c = F.col(url) if isinstance(url, str) else url
    if not host_protocols and not domain_protocols:
        return c
    host = url_host(c)
    mapped: Column | None = None
    for h, proto in (host_protocols or {}).items():
        cond = host == h.lower()
        mapped = F.when(cond, proto) if mapped is None else mapped.when(cond, proto)
    for d, proto in (domain_protocols or {}).items():
        cond = (host == d.lower()) | host.endswith("." + d.lower())
        mapped = F.when(cond, proto) if mapped is None else mapped.when(cond, proto)
    scheme = url_protocol(c)
    rest = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*:(.*)$", 1)
    return F.when(
        mapped.isNotNull() & (mapped != scheme), F.concat(mapped, F.lit(":"), rest)
    ).otherwise(c)


def idn_normalize(url: Column | str) -> Column:
    """IDN host → punycode ASCII (java.net.IDN.toASCII, applied by the
    reference's URL handling). ASCII-host URLs short-circuit entirely
    JVM-side; only rows with a non-ASCII host pay the Arrow-batched UDF."""
    from pyspark.sql.functions import pandas_udf

    c = F.col(url) if isinstance(url, str) else url

    @pandas_udf("string")
    def _punycode(urls):  # type: ignore[no-untyped-def]
        import pandas as pd
        import re as _re

        def conv(u):
            if u is None:
                return None
            m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://)([^/?#]+)(.*)$", u, _re.S)
            if not m:
                return u
            scheme, hostport, rest = m.groups()
            host, sep, port = hostport.partition(":")
            try:
                ascii_host = host.encode("idna").decode("ascii")
            except (UnicodeError, UnicodeDecodeError):
                return u
            return f"{scheme}{ascii_host}{sep}{port}{rest}"

        return pd.Series([conv(u) for u in urls])

    is_ascii = c.rlike(r"^[\x00-\x7F]*$")
    return F.when(is_ascii, c).otherwise(_punycode(c))


def normalize_url_scoped(
    url: Column | str,
    *,
    scope: str = "default",
    strip_session_ids: bool = True,
    host_map: dict[str, str] | None = None,
    host_protocols: dict[str, str] | None = None,
    domain_protocols: dict[str, str] | None = None,
    idn: bool = False,
) -> Column:
    """The per-scope normalizer chain (net/URLNormalizers.java): ajax →
    basic+querystring → host map → protocol map [→ IDN]. Scope changes both
    plugin behavior and order: crawler scopes run ajax BEFORE basic (so the
    ``#!`` fragment is captured before basic's fragment strip); the
    ``indexer`` scope runs basic first, then the ajax reverse rewrite (so
    the reconstructed ``#!`` survives)."""
    c = F.col(url) if isinstance(url, str) else url
    if scope == "indexer":
        c = normalize_url(c, strip_session_ids=strip_session_ids)
        c = ajax_normalize(c, scope=scope)
    else:
        c = ajax_normalize(c, scope=scope)
        c = normalize_url(c, strip_session_ids=strip_session_ids)
    if host_map:
        c = host_normalize(c, host_map)
    if host_protocols or domain_protocols:
        c = protocol_normalize(c, host_protocols, domain_protocols)
    if idn:
        c = idn_normalize(c)
    return c


# ---------------------------------------------------------------------------
# Filters — net/URLFilters.java chain semantics: a URL survives only if no
# deny rule rejects it and (if allow rules exist) some allow rule accepts it.
# ---------------------------------------------------------------------------

def url_filter_predicate(
    url: Column | str,
    *,
    allow_regex: list[str] | None = None,
    deny_regex: list[str] | None = None,
    allow_prefixes: list[str] | None = None,
    deny_suffixes: list[str] | None = None,
    deny_domains: list[str] | None = None,
) -> Column:
    """Composite boolean predicate mirroring the urlfilter-* plugin chain.

    - regex allow/deny: urlfilter-regex (conf/regex-urlfilter.txt semantics)
    - prefix allow:     urlfilter-prefix  (startswith trie -> OR of startswith)
    - suffix deny:      urlfilter-suffix  (file-extension blocking)
    - domain deny:      urlfilter-domaindenylist (literal IN set on eTLD+1)

    All literal lists compile to IN / startswith expressions — at scale these
    behave like broadcast lookups. For very large deny lists (>100k), join
    against a broadcast DataFrame instead.
    """
    c = F.col(url) if isinstance(url, str) else url
    pred = F.lit(True)
    for rx in deny_regex or []:
        pred = pred & ~c.rlike(rx)
    if allow_regex:
        allow = F.lit(False)
        for rx in allow_regex:
            allow = allow | c.rlike(rx)
        pred = pred & allow
    if allow_prefixes:
        allow = F.lit(False)
        for p in allow_prefixes:
            allow = allow | c.startswith(p)
        pred = pred & allow
    for s in deny_suffixes or []:
        pred = pred & ~F.lower(c).endswith(s.lower())
    if deny_domains:
        pred = pred & ~url_domain(c).isin(*[F.lit(d.lower()) for d in deny_domains])
    return pred


def url_valid(url: Column | str) -> Column:
    """urlfilter-validator (UrlValidator.java, commons-validator derived):
    legal-ASCII only, http/https/ftp scheme, dotted alnum host with an
    alphabetic TLD (or IPv4), optional numeric port, no whitespace. One
    rlike — stays in codegen."""
    c = F.col(url) if isinstance(url, str) else url
    host = r"(?:[A-Za-z0-9][A-Za-z0-9-]*\.)+[A-Za-z]{2,}"
    ipv4 = r"(?:\d{1,3}\.){3}\d{1,3}"
    pattern = (
        r"^(?:https?|ftp)://(?:" + host + r"|" + ipv4 + r")(?::\d+)?"
        r"(?:/[\x21-\x7e]*)?$"
    )
    return c.rlike(pattern) & ~c.rlike(r"\s")


def fast_url_filter_predicate(
    url: Column | str,
    *,
    host_rules: dict[str, list[str]] | None = None,
    domain_rules: dict[str, list[str]] | None = None,
) -> Column:
    """urlfilter-fast (FastURLFilter.java:51-98): per-host and per-domain
    DenyPath regex rules. Host rules need the exact hostname; domain rules
    match the host or any subdomain; the first matching rule rejects.
    Returns TRUE when the URL survives. Literal rule maps compile to a CASE
    chain — broadcast-lookup behavior, no shuffle; for >100k rules join a
    broadcast rules DataFrame instead."""
    c = F.col(url) if isinstance(url, str) else url
    host = url_host(c)
    path = F.coalesce(
        F.regexp_extract(c, r"^[a-zA-Z+.-]+://[^/?#]+([^#]*)", 1), F.lit("/")
    )
    rejected = F.lit(False)
    for h, patterns in (host_rules or {}).items():
        for rx in patterns:
            rejected = rejected | ((host == h.lower()) & path.rlike(rx))
    for d, patterns in (domain_rules or {}).items():
        dom = d.lower()
        in_domain = (host == dom) | host.endswith("." + dom)
        for rx in patterns:
            rejected = rejected | (in_domain & path.rlike(rx))
    return ~rejected
