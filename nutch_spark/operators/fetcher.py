"""Fetcher + Parse (SURVEY.md §2.8 P1-P3) — the imperative edge of the engine.

Reference:
- /root/reference/src/java/org/apache/nutch/fetcher/Fetcher.java:67-102
  (per-host queues, politeness delay, threads-per-queue=1),
  FetchItemQueues.java (queue state), Fetcher.java:114-131 (no-split inputs
  so a fetchlist stays with its task).
- /root/reference/src/java/org/apache/nutch/parse/ParseSegment.java:87-276
  (content → text/title/outlinks), ParseOutputFormat.java:150-362 (outlink
  emission: cap db.max.outlinks.per.page=100, length <= 4096, OPIC share =
  score/validCount).

Politeness is anti-relational by nature (SURVEY.md §4 hard-part 4), so it is
ISOLATED here: the fetchlist is repartitioned by host (all of one host's URLs
land in one partition — Spark's analogue of the no-split fetch list), and a
``mapInPandas`` loop enforces the per-host delay imperatively inside each
partition. Everything downstream (parse, outlink emission) is declarative.

The default ``fetch_fn`` is a DETERMINISTIC SYNTHETIC fetcher (tests need no
network): status and content derive from md5(url). The real HTTP fetcher is
``http_fetch_fn`` — stdlib urllib, redirects-as-status, reference-exact code
mapping — passed as ``fetch_fn=http_fetch_fn``; the harness (partitioning,
politeness, schema) is identical either way and is tested end-to-end against
an in-process http.server (tests/test_http_fetch.py), the way the reference
tests FetcherThread against Jetty (TestFetcher.java).
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nutch_spark.config import DEFAULT, NutchConfig
from nutch_spark.functions.urls import url_host

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("signature", T.BinaryType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def synthetic_fetch_fn(url: str) -> tuple[str, str | None]:
    """Deterministic fake fetch: (status, html) derived from md5(url).

    ~80% fetch_success with a small synthetic page whose outlinks are other
    synthetic URLs on a few hosts; the rest split across retry/gone/redirect
    so the updatedb state machine sees every branch.
    """
    h = hashlib.md5(url.encode()).hexdigest()
    bucket = int(h[:2], 16) % 10
    if bucket < 8:
        links = "".join(
            f'<a href="http://host{int(h[i], 16) % 8}.example.com/p{h[i:i + 4]}">l{i}</a>'
            for i in range(2, 8, 2)
        )
        return "fetch_success", f"<html><head><title>t-{h[:6]}</title></head><body>{links}</body></html>"
    if bucket == 8:
        return "fetch_retry", None
    return "fetch_gone", None


def _parse_auth_challenge(header: str) -> tuple[str, dict[str, str]]:
    """(scheme, params) of a WWW-Authenticate header value. Params handle
    both quoted-string and token forms (RFC 7235 §2.1)."""
    import re

    scheme, _, rest = header.strip().partition(" ")
    params = {
        m.group(1).lower(): m.group(2) if m.group(2) is not None else m.group(3)
        for m in re.finditer(r'([A-Za-z0-9_-]+)\s*=\s*(?:"([^"]*)"|([^\s,]+))', rest)
    }
    return scheme.lower(), params


def _digest_auth_header(
    method: str,
    url: str,
    challenge: dict[str, str],
    user: str,
    password: str,
    *,
    cnonce: str | None = None,
) -> str | None:
    """RFC 7616 / 2617 Digest Authorization header for one request, or None
    when the challenge is unusable (unknown algorithm / qop).

    Parity target: protocol-httpclient's HttpAuthenticationFactory +
    commons HttpClient DigestScheme (Http.java:258-340 resolves host-scoped
    credentials; the challenge/response math is the public RFC). Supports
    MD5, MD5-sess, SHA-256, SHA-256-sess and qop=auth (or no qop).
    """
    import hashlib
    import os
    import urllib.parse

    algorithm = challenge.get("algorithm", "MD5").upper()
    base_alg = algorithm[:-5] if algorithm.endswith("-SESS") else algorithm
    hashers = {"MD5": hashlib.md5, "SHA-256": hashlib.sha256}
    if base_alg not in hashers:
        return None
    qop_offered = [q.strip() for q in challenge.get("qop", "").split(",") if q.strip()]
    if qop_offered and "auth" not in qop_offered:
        return None  # auth-int needs the body hash; not offered by crawlers
    realm = challenge.get("realm", "")
    nonce = challenge.get("nonce", "")

    def h(s: str) -> str:
        return hashers[base_alg](s.encode()).hexdigest()

    split = urllib.parse.urlsplit(url)
    uri = (split.path or "/") + (f"?{split.query}" if split.query else "")
    cnonce = cnonce or os.urandom(8).hex()
    ha1 = h(f"{user}:{realm}:{password}")
    if algorithm.endswith("-SESS"):
        ha1 = h(f"{ha1}:{nonce}:{cnonce}")
    ha2 = h(f"{method}:{uri}")
    parts = [
        f'username="{user}"',
        f'realm="{realm}"',
        f'nonce="{nonce}"',
        f'uri="{uri}"',
        f"algorithm={algorithm}",
    ]
    if qop_offered:
        nc = "00000001"
        response = h(f"{ha1}:{nonce}:{nc}:{cnonce}:auth:{ha2}")
        parts += [f'response="{response}"', "qop=auth", f"nc={nc}", f'cnonce="{cnonce}"']
    else:
        parts.append(f'response="{h(f"{ha1}:{nonce}:{ha2}")}"')
        if algorithm.endswith("-SESS"):
            # -SESS mixes the cnonce into HA1; without qop the cnonce param
            # only travels in the qop branch, so emit it here too or the
            # server can never recompute HA1 (RFC 7616 §3.4.2).
            parts.append(f'cnonce="{cnonce}"')
    if "opaque" in challenge:
        parts.append(f'opaque="{challenge["opaque"]}"')
    return "Digest " + ", ".join(parts)


def parse_host_cookies(text: str) -> dict[str, str]:
    """cookies.txt (HttpBase.java:299-325, http.agent.host.cookie.file):
    ``host<TAB>cookie-header-value`` lines, '#' lines skipped, malformed
    lines ignored. The values are RAW Cookie header strings — pass the
    result as ``http_fetch_fn(cookies=...)`` (string jars are sent
    verbatim)."""
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.strip()
        if not line or "#" in line:
            continue
        parts = line.split("\t")
        if len(parts) == 2:
            out[parts[0]] = parts[1]
    return out


def parse_agent_names(text: str) -> list[str]:
    """agents.txt (HttpBase.java:259-283, http.agent.rotate.file): one user
    agent per line; an empty list disables rotation like the reference."""
    return [ln.strip() for ln in text.splitlines() if ln.strip()]


def http_fetch_fn(
    url: str,
    *,
    timeout_s: float = 10.0,
    user_agent: str | list[str] | tuple[str, ...] = "nutch-spark/1.0",
    max_bytes: int = 1 << 20,
    auth: dict[str, tuple[str, str]] | None = None,
    cookies: dict[str, dict[str, str]] | None = None,
    headers: dict[str, str] | None = None,
    if_modified_since: float | None = None,
    cookie: str | None = None,
    accept: str = "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
    accept_language: str = "en-us,en-gb,en;q=0.7,*;q=0.3",
    accept_charset: str = "utf-8,iso-8859-1;q=0.7,*;q=0.7",
    proxy: str | None = None,
    proxy_exceptions: set[str] | frozenset[str] | None = None,
) -> dict:
    """Real HTTP(S) fetch over stdlib urllib — redirects are NOT followed,
    they come back as status, exactly like the reference protocol layer.

    Status mapping mirrors lib-http HttpBase.java:382-434 composed with
    FetcherThread.java:440-515 (ProtocolStatus → CrawlDatum):

      200                    → fetch_success (content + real Content-Type)
      300/301/305/other 3xx  → fetch_redir_perm   (MOVED)
      302/303/307            → fetch_redir_temp   (TEMP_MOVED)
      304                    → fetch_notmodified
      400/401/404/410        → fetch_gone  (GONE/ACCESS_DENIED/NOTFOUND)
      any other code         → fetch_retry (EXCEPTION)
      network error/timeout  → fetch_retry (EXCEPTION)

    metadata carries ``nutch.protocol.code`` (Nutch.java:44), the resolved
    absolute ``Location`` for redirects (HttpBase.java:386-392 resolves
    relative Locations against the request URL), and ``_exception_`` for
    transport failures. At most ``max_bytes`` of body are read
    (http.content.limit — the harness re-checks and tags _truncated_).

    Politeness, per-host queueing, threading and kill-switches live in the
    ``fetch`` harness — this function is ONE blocking request. Use
    ``functools.partial`` to bind timeouts/agent before passing as
    ``fetch_fn`` (the partial pickles into the Arrow worker cleanly).
    """
    import urllib.error
    import urllib.parse
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
            return None  # surface 3xx as HTTPError instead of following

    # protocol-httpclient surface (Http.java:258-340 http.auth.file scopes,
    # HttpResponse cookie pass-through): HOST-SCOPED credentials and cookie
    # jars — both keyed host -> value ('*' = any host; never send a site's
    # session cookie to a third-party domain the crawl discovers). Basic is
    # sent preemptively; a 401 Digest challenge is answered ONCE with the
    # same scoped credentials (HttpAuthenticationFactory challenge path).
    # Bind with functools.partial before passing as fetch_fn; NTLM stays
    # deployment-supplied.
    # HttpBase sends Accept-Encoding and decompresses with GZIPUtils.
    # unzipBestEffort (HttpBase.java:632-670) — truncated-by-content-limit
    # gzip streams still yield their decodable prefix instead of garbage
    if isinstance(user_agent, (list, tuple)):
        # http.agent.rotate: a random agent from the list per request
        # (HttpBase.getUserAgent uses ThreadLocalRandom the same way)
        import random

        user_agent = random.choice(user_agent) if user_agent else "nutch-spark/1.0"
    hdrs = {"User-Agent": user_agent, "Accept-Encoding": "gzip, deflate"}
    # HttpBase.java:108-114,235-238: Accept / Accept-Language /
    # Accept-Charset with the reference's defaults; a value that trims to
    # empty (the documented "space character" convention) omits the header
    for hname, hval in (
        ("Accept", accept),
        ("Accept-Language", accept_language),
        ("Accept-Charset", accept_charset),
    ):
        if (hval or "").strip():
            hdrs[hname] = hval.strip()
    if if_modified_since is not None and if_modified_since > 0:
        # protocol-http HttpResponse.java:242-245: If-Modified-Since from
        # datum.getModifiedTime() via HttpDateFormat (RFC 1123 GMT);
        # email.utils.formatdate(usegmt=True) is the stdlib twin
        from email.utils import formatdate

        hdrs["If-Modified-Since"] = formatdate(if_modified_since, usegmt=True)
    if headers:
        hdrs.update(headers)
    host = urllib.parse.urlsplit(url).hostname or ""
    cred = (auth.get(host) or auth.get("*")) if auth else None
    if cookies:
        jar = cookies.get(host) or cookies.get("*")
        if isinstance(jar, str):  # raw header value from cookies.txt
            hdrs["Cookie"] = jar
        elif jar:
            hdrs["Cookie"] = "; ".join(f"{k}={v}" for k, v in sorted(jar.items()))
    if cookie is not None:
        # protocol-http HttpResponse.java:224-240: the DATUM's Cookie
        # metadata outranks the host cookie file (http.agent.host.cookie)
        hdrs["Cookie"] = cookie
    if cred:
        import base64

        token = base64.b64encode(f"{cred[0]}:{cred[1]}".encode()).decode()
        hdrs["Authorization"] = f"Basic {token}"
    handlers: list = [_NoRedirect]
    if proxy and host not in (proxy_exceptions or ()):
        # HttpBase.java:76-89,454-466 (http.proxy.host/port +
        # http.proxy.exception.list): route through the HTTP proxy except
        # for exception-listed hosts. "host:port" or a full proxy URL.
        purl = proxy if "://" in proxy else f"http://{proxy}"
        handlers.append(
            urllib.request.ProxyHandler({"http": purl, "https": purl})
        )
    opener = urllib.request.build_opener(*handlers)
    try:
        try:
            req = urllib.request.Request(url, headers=hdrs)
            with opener.open(req, timeout=timeout_s) as resp:
                code = resp.status
                ctype = resp.headers.get("Content-Type")
                cenc = (resp.headers.get("Content-Encoding") or "").lower()
                body = resp.read(max_bytes)
        except urllib.error.HTTPError as e:
            # digest challenge/response: answer a 401 once when scoped
            # credentials exist and the server asked for Digest
            www = (e.headers.get("WWW-Authenticate") or "") if e.headers else ""
            if e.code == 401 and cred and www.upper().startswith("NTLM"):
                # NTLMv2 3-leg handshake on ONE kept-alive connection
                # (HttpAuthenticationFactory.java:79 → NTLMScheme; the
                # connection-bound legs can't ride urllib's pooling)
                from nutch_spark.functions.ntlm import ntlm_fetch

                code, rhdrs, body = ntlm_fetch(
                    url, cred[0], cred[1], headers=hdrs,
                    timeout_s=timeout_s, max_bytes=max_bytes,
                )
                if code != 200:
                    raise
                # fall through to the shared 200 handling below so a
                # gzip/deflate Content-Encoding on the authenticated
                # response is decompressed exactly like the normal path
                # (we advertised Accept-Encoding on every leg)
                lhdrs = {k.lower(): v for k, v in rhdrs.items()}
                ctype = lhdrs.get("content-type")
                cenc = (lhdrs.get("content-encoding") or "").lower()
            elif e.code == 401 and cred and www.lower().startswith("digest"):
                scheme, challenge = _parse_auth_challenge(www)
                digest_hdr = _digest_auth_header(
                    "GET", url, challenge, cred[0], cred[1]
                )
                if digest_hdr is None:
                    raise
                retry_hdrs = dict(hdrs)
                retry_hdrs["Authorization"] = digest_hdr
                req = urllib.request.Request(url, headers=retry_hdrs)
                with opener.open(req, timeout=timeout_s) as resp:
                    code = resp.status
                    ctype = resp.headers.get("Content-Type")
                    cenc = (resp.headers.get("Content-Encoding") or "").lower()
                    body = resp.read(max_bytes)
            else:
                raise
    except urllib.error.HTTPError as e:
        code = e.code
        ctype = e.headers.get("Content-Type") if e.headers else None
        try:
            body = e.read(max_bytes)
        except Exception:
            body = b""
        location = (e.headers.get("Location") or e.headers.get("location")) if e.headers else None
        meta = {"nutch.protocol.code": str(code)}
        if 300 <= code < 400:
            if code == 304:
                # Not a redirect: the reference records Location only for
                # actual redirects, never for Not-Modified responses.
                return {"status": "fetch_notmodified", "content": None, "metadata": meta}
            # HttpBase.java:392 `new URL(u, location)` — resolve vs request URL
            meta["Location"] = urllib.parse.urljoin(url, location or "")
            if code in (302, 303, 307):
                return {"status": "fetch_redir_temp", "content": None, "metadata": meta}
            return {"status": "fetch_redir_perm", "content": None, "metadata": meta}
        if code in (400, 401, 404, 410):
            return {"status": "fetch_gone", "content": None, "metadata": meta}
        return {"status": "fetch_retry", "content": None, "metadata": meta}
    except Exception as e:  # DNS failure, refused, timeout → EXCEPTION → retry
        from nutch_spark.functions.textutil import categorize_error

        return {
            "status": "fetch_retry",
            "content": None,
            "metadata": {
                "_exception_": type(e).__name__,
                # ErrorTracker.categorize (metrics/ErrorTracker.java:285) —
                # bounded taxonomy for job counters / stats rollups
                "_error_category_": categorize_error(e),
            },
        }
    meta = {"nutch.protocol.code": str(code)}
    if code == 200:
        if cenc in ("gzip", "x-gzip") or (cenc == "deflate"):
            from nutch_spark.functions.textutil import (
                inflate_best_effort,
                unzip_best_effort,
            )

            plain = (
                unzip_best_effort(body, max_bytes)
                if cenc != "deflate"
                else inflate_best_effort(body, max_bytes)
            )
            if plain is None:
                meta["_undecodable_encoding_"] = cenc
            else:
                body = plain
        # Content.content stays byte[] end-to-end (the reference's
        # protocol layer never decodes; EncodingDetector runs at PARSE
        # time) — the FULL Content-Type header (charset param included)
        # rides metadata so parse_html.decode_content sees it
        if ctype:
            meta["Content-Type"] = ctype
        return {
            "status": "fetch_success",
            "content": body,
            "content_type": (ctype or "").split(";")[0].strip() or None,
            "metadata": meta,
        }
    # non-error status outside the mapped set (e.g. 204, 2xx) — HttpBase's
    # final else: ProtocolStatus.EXCEPTION → fetch_retry
    return {"status": "fetch_retry", "content": None, "metadata": meta}


def _dir_listing_html(path: str, names: list[str]) -> str:
    """Minimal directory-listing page shared by the file:// and ftp://
    protocols (getDirAsHttpResponse shape): sorted names, entity-escaped
    (the reference escapes via its HTML pipeline) so <, " or & in
    filenames can't break markup."""
    import html as html_mod
    import urllib.parse

    rows = "".join(
        f'<a href="{urllib.parse.quote(n)}">{html_mod.escape(n)}</a>\n'
        for n in sorted(names)
    )
    esc = html_mod.escape(path)
    return (
        f"<html><head><title>Index of {esc}</title></head>"
        f"<body><h1>Index of {esc}</h1><pre>{rows}</pre></body></html>"
    )


def _sniff_html(body: bytes) -> str:
    """text/html when the body starts like an HTML document, else
    text/plain — the local-protocol content-type heuristic."""
    return (
        "text/html"
        if body[:100].lstrip()[:14].lower().startswith((b"<!doctype html", b"<html"))
        else "text/plain"
    )


def ftp_fetch_fn(
    url: str,
    *,
    timeout_s: float = 30.0,
    user_name: str = "anonymous",
    password: str = "anonymous@example.com",
    max_bytes: int = 1 << 20,
) -> dict:
    """FTP fetch over stdlib ftplib (protocol-ftp, Ftp.java:143-188 +
    FtpResponse.java): anonymous login by default, binary transfers, the
    same ProtocolStatus → CrawlDatum mapping as ``http_fetch_fn``:

      file retrieved         → fetch_success (200)
      path is a directory    → without trailing '/': 300 redirect to
                               path + '/' (FtpResponse:391-414 semantics);
                               with trailing '/': LIST rendered as the
                               same HTML listing shape as file_fetch_fn
      login rejected         → fetch_gone (401 ACCESS_DENIED,
                               FtpResponse.java:190)
      no such file (550)     → fetch_gone (404, FtpResponse.java:391)
      connect/transport err  → fetch_retry (500 + _exception_)

    Drop-in ``fetch_fn`` for the polite-fetch harness — per-host queues,
    delays and kill-switches stay in ``fetch``; this is ONE blocking
    retrieval. Bind credentials/timeouts with ``functools.partial``.
    """
    import ftplib
    import urllib.parse

    parsed = urllib.parse.urlparse(url)
    if parsed.scheme != "ftp":
        return {"status": "fetch_retry", "content": None,
                "metadata": {"_exception_": "NotAnFtpUrl"}}
    path = urllib.parse.unquote(parsed.path or "/")
    try:
        ftp = ftplib.FTP()
        ftp.connect(parsed.hostname, parsed.port or 21, timeout=timeout_s)
        try:
            try:
                ftp.login(parsed.username or user_name,
                          parsed.password or password)
            except ftplib.error_perm:
                return {"status": "fetch_gone", "content": None,
                        "metadata": {"nutch.protocol.code": "401"}}

            if path.endswith("/"):
                # directory listing → minimal HTML, sorted names (the
                # reference renders LIST output as an HTML page too)
                names: list[str] = []
                ftp.cwd(path or "/")
                ftp.retrlines("NLST", names.append)
                return {
                    "status": "fetch_success",
                    "content": _dir_listing_html(
                        path, [n for n in names if n not in (".", "..")]
                    ).encode("utf-8"),
                    "content_type": "text/html",
                    "metadata": {"nutch.protocol.code": "200"},
                }

            buf = bytearray()
            truncated = False

            class _CapReached(Exception):
                pass

            def sink(chunk: bytes) -> None:
                buf.extend(chunk[: max_bytes - len(buf)])
                if len(buf) >= max_bytes:
                    # ABORT the transfer — without this a multi-GB file is
                    # received in full just to keep its first max_bytes,
                    # stalling the per-host fetch queue for the whole
                    # download (http_fetch_fn reads only max_bytes)
                    raise _CapReached()

            try:
                ftp.voidcmd("TYPE I")  # binary, FtpResponse.java:196
                try:
                    ftp.retrbinary(f"RETR {path}", sink)
                except _CapReached:
                    truncated = True  # data conn dropped; quit() falls
                    # back to close() in the finally below
            except ftplib.error_perm:
                # 550: missing file OR a directory fetched without '/' —
                # cwd distinguishes (FtpResponse.java:391-414)
                try:
                    ftp.cwd(path)
                except ftplib.error_perm:
                    return {"status": "fetch_gone", "content": None,
                            "metadata": {"nutch.protocol.code": "404"}}
                loc = urllib.parse.urlunparse(parsed._replace(path=parsed.path + "/"))
                return {
                    "status": "fetch_redir_perm",
                    "content": None,
                    "metadata": {"nutch.protocol.code": "300", "Location": loc},
                }
            body = bytes(buf)
            meta = {"nutch.protocol.code": "200"}
            if truncated:
                meta["_truncated_"] = "1"
            return {
                "status": "fetch_success",
                "content": body,
                "content_type": _sniff_html(body),
                "metadata": meta,
            }
        finally:
            try:
                ftp.quit()
            except Exception:  # noqa: BLE001 — best-effort close
                ftp.close()
    except Exception as e:  # noqa: BLE001 — transport errors retry
        return {"status": "fetch_retry", "content": None,
                "metadata": {"nutch.protocol.code": "500",
                             "_exception_": type(e).__name__}}


def file_fetch_fn(
    url: str,
    *,
    max_bytes: int = 1 << 20,
) -> dict:
    """file:// protocol fetch (src/plugin/protocol-file FileResponse.java:
    112-183 — "mimics file replies as http response"), composed with the
    same ProtocolStatus → CrawlDatum mapping as ``http_fetch_fn``:

      readable file        → fetch_success (content + sniffed type)
      missing (404)        → fetch_gone
      unreadable (401)     → fetch_gone   (ACCESS_DENIED)
      symlink (300 + Location to the canonical path) → fetch_redir_perm
      directory            → fetch_success with an HTML listing
                             (FileResponse.getDirAsHttpResponse)
      other error          → fetch_retry

    Drop-in ``fetch_fn`` for the polite-fetch harness — local corpora and
    tests fetch through the identical pipeline as HTTP."""
    import os
    import urllib.parse

    parsed = urllib.parse.urlparse(url)
    if parsed.scheme != "file":
        return {"status": "fetch_retry", "content": None,
                "metadata": {"_exception_": "NotAFileUrl"}}
    path = urllib.parse.unquote(parsed.path or "/")
    try:
        if not os.path.exists(path):
            return {"status": "fetch_gone", "content": None,
                    "metadata": {"nutch.protocol.code": "404"}}
        if not os.access(path, os.R_OK):
            return {"status": "fetch_gone", "content": None,
                    "metadata": {"nutch.protocol.code": "401"}}
        real = os.path.realpath(path)
        if real != os.path.normpath(os.path.abspath(path)):
            # FileResponse.java:147-160: symlink → 300 + canonical Location
            return {
                "status": "fetch_redir_perm",
                "content": None,
                "metadata": {
                    "nutch.protocol.code": "300",
                    "Location": "file://" + urllib.parse.quote(real),
                },
            }
        if os.path.isdir(path):
            # getDirAsHttpResponse: shared listing page (see
            # _dir_listing_html — escaped names, sorted)
            return {
                "status": "fetch_success",
                "content": _dir_listing_html(path, os.listdir(path)).encode("utf-8"),
                "content_type": "text/html",
                "metadata": {"nutch.protocol.code": "200"},
            }
        with open(path, "rb") as f:
            body = f.read(max_bytes)
        return {
            "status": "fetch_success",
            "content": body,
            "content_type": _sniff_html(body),
            "metadata": {"nutch.protocol.code": "200"},
        }
    except Exception as e:
        return {"status": "fetch_retry", "content": None,
                "metadata": {"_exception_": type(e).__name__}}


def fetch(
    fetchlist: DataFrame,
    *,
    cfg: NutchConfig = DEFAULT,
    fetch_fn: Callable[[str], tuple[str, str | None]] = synthetic_fetch_fn,
    crawl_delay_s: float = 0.0,
    num_lists: int | None = None,
    threads: int = 1,
    threads_per_queue: int = 1,
    min_crawl_delay_s: float = 0.0,
    time_limit_s: float | None = None,
    max_redirects: int = 0,
) -> DataFrame:
    """P1: polite parallel fetch → fetch_log rows (FETCH_SCHEMA).

    ``crawl_delay_s`` is the per-host politeness delay
    (fetcher.server.delay, 5s in production — 0 in tests). One host's URLs
    are co-partitioned, so the delay serializes that host only. Within a
    partition, URLs are organized into per-host FIFO queues and drained
    earliest-ready-first (FetchItemQueues / Fetcher.java:67-102 semantics):
    distinct hosts co-resident in a partition proceed concurrently — a
    partition with hosts A and B finishes in ~max(time_A, time_B), not the
    sum — while each host still honors its own delay.

    If the fetchlist carries a ``metadata`` column, a per-host
    ``_variableFetchDelay_`` entry (ms, written by generate's hostdb JEXL
    path, Generator.java:529-545) overrides ``crawl_delay_s`` for that host.

    ``threads`` > 1 runs that many fetch threads per partition
    (fetcher.threads.fetch; by default fetcher.threads.per.queue=1
    semantics: a host never has more than one request in flight — a busy
    host is simply not eligible for the next dispatch). I/O-bound fetches
    overlap across hosts; the politeness clock for a host starts when its
    request COMPLETES, like the reference's FetchItemQueue.finishFetchItem.

    ``threads_per_queue`` > 1 (fetcher.threads.per.queue,
    FetchItemQueue.java:124 ``inProgress >= maxThreads``) allows that many
    CONCURRENT requests to one host, and the per-completion politeness gap
    switches from ``crawl_delay_s`` to ``min_crawl_delay_s``
    (fetcher.server.min.delay — FetchItemQueue.setEndTime:171 uses
    minCrawlDelay exactly when maxThreads > 1, and the variable per-host
    delay is likewise bypassed). Impolite by design — the reference
    documents it for servers you own.

    ``time_limit_s`` (fetcher.timelimit.mins, Fetcher.java:188-210) bounds
    each partition's fetch loop: once the deadline passes, every still-queued
    URL is emitted as ``fetch_retry`` with metadata _timelimit_=1 — the
    reference's queue purge that hands leftovers back to the next round
    instead of hanging the job on slow hosts. Defaults to
    ``cfg.fetcher_time_limit_s`` (off when negative).

    Fetched content longer than ``cfg.http_content_limit`` is truncated and
    tagged metadata _truncated_=1 (http.content.limit, 1 MB default).

    ``max_redirects`` (http.redirect.max, FetcherThread.java:236,453 +
    handleRedirect:570-640) follows redirects IN-BAND: the redirect row is
    still emitted (updatedb needs the repr-URL transition), and the
    Location target joins the per-host queues of the SAME task — politeness
    applies to the target's host like any queued URL, and a cross-host
    redirect simply opens a new local queue (the reference fetches it in
    the same map task too). A target equal to its source, already fetched
    in this partition, or beyond the depth budget is skipped; the
    redirect-count-exceeded row is tagged ``_maxRedirectsExceeded_``
    (http.redirect.max.exceeded.skip semantics). Default 0 = reference
    default behavior of surfacing redirects as statuses only.

    The throughput kill-switch (fetcher.throughput.threshold.*,
    Fetcher.java:279-356) is checked once per second inside each partition:
    after ``cfg.throughput_threshold_retries`` consecutive seconds below
    ``cfg.throughput_threshold_pages`` pages/s, the partition aborts —
    remaining queued URLs come back as fetch_retry with _throughput_=1.
    (The reference's check is job-global; per-partition is the Spark
    analogue — each partition IS an independent fetch task.)
    """
    # Fetcher.java checkConfiguration (TestFetcher.testAgentNameCheck): an
    # empty http.agent.name refuses to fetch — a crawler must identify itself
    if not (cfg.http_agent_name or "").strip():
        raise ValueError("Fetcher: No agents listed in 'http.agent.name' property.")
    if time_limit_s is None:
        time_limit_s = cfg.fetcher_time_limit_s
    content_limit = cfg.http_content_limit
    tp_pages = cfg.throughput_threshold_pages
    tp_retries = cfg.throughput_threshold_retries
    parts = num_lists or fetchlist.sparkSession.sparkContext.defaultParallelism
    laid_out = fetchlist.repartition(parts, url_host("url")).sortWithinPartitions(
        F.xxhash64("url")
    )
    has_meta = "metadata" in fetchlist.columns
    # conditional re-fetch (HttpBase.java:187 enableIfModifiedsinceHeader,
    # default true; protocol-http HttpResponse.java:242): when the
    # fetchlist carries the datum's modified_time AND the bound fetch_fn
    # accepts if_modified_since (http_fetch_fn does; synthetic/custom fns
    # need not), each request goes out conditional and a 304 maps to
    # fetch_notmodified for the D6 re-fetch schedules
    import inspect

    def _accepts(kw: str) -> bool:
        try:
            target = fetch_fn.func if hasattr(fetch_fn, "func") else fetch_fn
            params = inspect.signature(target).parameters
            return kw in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
            )
        except (TypeError, ValueError):
            return False

    ims_capable = (
        cfg.http_if_modified_since
        and "modified_time" in fetchlist.columns
        and _accepts("if_modified_since")
    )
    # per-datum Cookie header (protocol-http HttpResponse.java:224-240,
    # http.enable.cookie.header default true): a "Cookie" key in the
    # fetchlist row's metadata rides the request, outranking any host jar
    cookie_capable = (
        cfg.http_enable_cookie_header and has_meta and _accepts("cookie")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import deque

        NEVER = float("-inf")
        last_hit: dict[str, float] = {}  # persists across batches

        ims_ts: dict[str, float] = {}  # url -> modified_time epoch seconds
        datum_cookie: dict[str, str] = {}  # url -> Cookie header value

        def fetch_one(url: str) -> dict:
            _t0 = time.monotonic()
            kw = {}
            # pop (not get): each URL is fetched once per partition, so
            # keeping its entry after the kwargs are built would grow
            # executor memory without bound on large fetchlists
            ims = ims_ts.pop(url, None)
            if ims_capable and ims:
                kw["if_modified_since"] = ims
            cookie = datum_cookie.pop(url, None)
            if cookie_capable and cookie is not None:
                kw["cookie"] = cookie
            res = fetch_fn(url, **kw) if kw else fetch_fn(url)
            _latency_ms = int((time.monotonic() - _t0) * 1000)
            if isinstance(res, dict):  # rich protocol result (http_fetch_fn)
                status, content = res["status"], res.get("content")
                ctype, meta = res.get("content_type"), dict(res.get("metadata") or {})
            else:  # legacy (status, content) tuple
                status, content = res
                ctype, meta = None, {}
            # per-fetch latency (NutchMetrics LatencyTracker,
            # TestFetcherReducer.java — percentile counters over fetch
            # times); rides metadata so stats.fetch_latency_stats can
            # aggregate without a new column in FETCH_SCHEMA
            meta["_latency_ms_"] = str(_latency_ms)
            if cfg.http_store_responsetime:
                # HttpBase.java:61,370 http.store.responsetime (default
                # true): elapsed fetch ms under the reference's "_rs_" key,
                # so downstream consumers of the reference's datum metadata
                # read the same field here
                meta["_rs_"] = str(_latency_ms)
            if isinstance(content, str):
                # legacy/synthetic fetch_fns return decoded text; the log
                # stores raw bytes (Content.content is byte[]) — utf-8 is
                # the round-trip-exact encoding for text they produce
                content = content.encode("utf-8")
            if content is not None and content_limit >= 0:
                # http.content.limit is a BYTE cap over the raw protocol
                # bytes (HttpBase.java truncates the stream, multibyte
                # sequences split and all — the parser's charset decode
                # replaces the dangling tail)
                if len(content) > content_limit:
                    content = content[:content_limit]
                    meta["_truncated_"] = "1"
            # MD5Signature digests the raw content bytes (MD5Signature.java)
            sig = hashlib.md5(content).digest() if content is not None else None
            return {
                "url": url,
                "status": status,
                "fetch_time": pd.Timestamp.utcnow().tz_localize(None),
                "content": content,
                "content_type": ctype or ("text/html" if content else None),
                "signature": sig,
                "metadata": meta,
            }

        def retry_row(url: str, reason: str = "_timelimit_") -> dict:
            return {
                "url": url,
                "status": "fetch_retry",
                "fetch_time": pd.Timestamp.utcnow().tz_localize(None),
                "content": None,
                "content_type": None,
                "signature": None,
                "metadata": {reason: "1"},
            }

        deadline = (
            time.monotonic() + time_limit_s if time_limit_s >= 0 else float("inf")
        )

        for pdf in batches:
            queues: dict[str, deque] = {}
            delays: dict[str, float] = {}
            depth: dict[str, int] = {}
            seen: set[str] = set()
            metas = pdf["metadata"] if has_meta else None
            mods = pdf["modified_time"] if ims_capable else None
            for i, url in enumerate(pdf["url"]):
                if url in seen:
                    # duplicate fetchlist rows collapse to one request
                    # (FetchItemQueues keys by URL); this also makes the
                    # pop() in fetch_one provably safe — each enqueued URL
                    # is fetched at most once per batch
                    continue
                host = url.split("/")[2] if "://" in url else url
                queues.setdefault(host, deque()).append(url)
                seen.add(url)
                if mods is not None and pd.notna(mods.iloc[i]):
                    ims_ts[url] = mods.iloc[i].timestamp()
                if cookie_capable and metas is not None:
                    md = metas.iloc[i]
                    if md and md.get("Cookie"):
                        datum_cookie[url] = md["Cookie"]
                if metas is not None:
                    md = metas.iloc[i]
                    if md and "_variableFetchDelay_" in md:
                        delays[host] = int(md["_variableFetchDelay_"]) / 1000.0

            def follow_redirect(row: dict) -> None:
                # FetcherThread.handleRedirect: enqueue the Location target
                # into this task's queues; politeness finds it like any URL
                if max_redirects <= 0 or not row["status"].startswith("fetch_redir"):
                    return
                target = (row["metadata"] or {}).get("Location")
                src_url = row["url"]
                d = depth.get(src_url, 0)
                if not target:
                    return
                if "://" not in target:
                    # a custom fetch_fn may pass the raw (relative) Location
                    # header through — resolve against the request URL like
                    # HttpBase.java:392 before it becomes a queue key
                    from urllib.parse import urljoin

                    target = urljoin(src_url, target)
                if target == src_url or target in seen:
                    return
                if d >= max_redirects:
                    row["metadata"]["_maxRedirectsExceeded_"] = "1"
                    return
                seen.add(target)
                depth[target] = d + 1
                t_host = target.split("/")[2] if "://" in target else target
                queues.setdefault(t_host, deque()).append(target)

            def ready_at(host: str) -> float:
                if threads_per_queue > 1:  # FetchItemQueue.setEndTime:171
                    return last_hit.get(host, NEVER) + min_crawl_delay_s
                return last_hit.get(host, NEVER) + delays.get(host, crawl_delay_s)

            tp = {"t0": time.monotonic(), "n": 0, "low": 0, "dead": False}

            def note_fetched() -> None:
                tp["n"] += 1

            def throughput_dead() -> bool:
                # one check per elapsed second, Fetcher.java:279-356 semantics
                if tp_pages < 0 or tp["dead"]:
                    return tp["dead"]
                now = time.monotonic()
                elapsed = now - tp["t0"]
                if elapsed >= 1.0:
                    rate = tp["n"] / elapsed
                    tp["low"] = tp["low"] + 1 if rate < tp_pages else 0
                    tp["t0"], tp["n"] = now, 0
                    if tp["low"] >= tp_retries:
                        tp["dead"] = True
                return tp["dead"]

            def drain_expired() -> bool:
                expired = time.monotonic() > deadline
                dead = throughput_dead()
                if not (expired or dead):
                    return False
                reason = "_timelimit_" if expired else "_throughput_"
                for q_host in list(queues):
                    for u in queues.pop(q_host):
                        # drained URLs are never fetched, so drop their
                        # header entries here — fetch_one's pop() only
                        # covers URLs that actually go out on the wire
                        ims_ts.pop(u, None)
                        datum_cookie.pop(u, None)
                        out.append(retry_row(u, reason))
                return True

            out = []
            if threads <= 1:
                while queues:
                    if drain_expired():
                        break
                    host = min(queues, key=ready_at)  # earliest-ready first
                    wait = ready_at(host) - time.monotonic()
                    if wait > 0:
                        time.sleep(min(wait, max(0.0, deadline - time.monotonic())))
                        if drain_expired():
                            break
                    row = fetch_one(queues[host].popleft())
                    follow_redirect(row)
                    out.append(row)
                    note_fetched()
                    last_hit[host] = time.monotonic()
                    if host in queues and not queues[host]:
                        del queues[host]
            else:
                import concurrent.futures as cf

                with cf.ThreadPoolExecutor(max_workers=threads) as ex:
                    in_flight: dict[str, list[cf.Future]] = {}
                    while queues or in_flight:
                        drain_expired()
                        for host in list(in_flight):
                            done = [f for f in in_flight[host] if f.done()]
                            for f in done:
                                in_flight[host].remove(f)
                                row = f.result()
                                follow_redirect(row)
                                out.append(row)
                                note_fetched()
                                last_hit[host] = time.monotonic()
                            if not in_flight[host]:
                                del in_flight[host]
                        dispatched = False
                        n_flight = sum(len(v) for v in in_flight.values())
                        if n_flight < threads:
                            # a host is eligible while its in-progress count
                            # is under maxThreads (FetchItemQueue.java:124)
                            avail = [
                                h for h in queues
                                if len(in_flight.get(h, ())) < threads_per_queue
                            ]
                            if avail:
                                host = min(avail, key=ready_at)
                                if ready_at(host) <= time.monotonic():
                                    url = queues[host].popleft()
                                    if not queues[host]:
                                        del queues[host]
                                    in_flight.setdefault(host, []).append(
                                        ex.submit(fetch_one, url)
                                    )
                                    dispatched = True
                        if not dispatched:
                            if in_flight:
                                cf.wait(
                                    [f for v in in_flight.values() for f in v],
                                    timeout=0.005,
                                    return_when=cf.FIRST_COMPLETED,
                                )
                            elif queues:  # everything idle but not yet due
                                nxt = min(ready_at(h) for h in queues)
                                # never sleep past the time-limit deadline
                                wake = min(nxt, deadline)
                                time.sleep(max(0.0, wake - time.monotonic()))
            yield pd.DataFrame(out, columns=[f.name for f in FETCH_SCHEMA.fields])

    cols = ["url"] + (["metadata"] if has_meta else []) + (
        ["modified_time"] if ims_capable else []
    )
    return laid_out.select(*cols).mapInPandas(run, FETCH_SCHEMA)


# ---------------------------------------------------------------------------
# P2: parse — DECLARATIVE html field extraction (regexp built-ins, no UDF)
# ---------------------------------------------------------------------------


def is_truncated(
    metadata: Column | str = "metadata", content: Column | str = "content"
) -> Column:
    """ParseSegment.isTruncated (TestParseSegment.java:47-84): the explicit
    truncation flag wins in EITHER direction when present; otherwise compare
    the declared Content-Length against the actual byte count. Truncated
    pages parse to broken trees, so parser.skip.truncated drops them."""
    m = F.col(metadata) if isinstance(metadata, str) else metadata
    c = F.col(content) if isinstance(content, str) else content
    flag = F.coalesce(
        F.element_at(m, "_truncated_"), F.element_at(m, "Truncated-Content")
    )
    declared = F.element_at(m, "Content-Length").cast("long")
    return F.when(flag.isNotNull(), flag.isin("1", "true")).otherwise(
        declared.isNotNull() & (declared > F.octet_length(c))
    )


def parse(
    fetch_log: DataFrame, *, cfg: NutchConfig = DEFAULT, skip_truncated: bool = False
) -> DataFrame:
    """content → parse_data(url, title, outlinks[], parse_text).

    The reference delegates to plugin parsers (parse-html/tika); for the
    engine's relational surface an href/title regex pulled through JVM
    ``regexp_extract(_all)`` covers the synthetic corpus and keeps parsing
    inside whole-stage codegen. A tika-quality parser would slot in as a
    pandas UDF without touching the plan shape (ParseSegment.java:87-276).
    ``skip_truncated`` is parser.skip.truncated (ParseSegment.java:108-118):
    pages cut by http.content.limit are excluded from parsing.
    """
    ok = fetch_log.filter(
        (F.col("status") == "fetch_success") & F.col("content").isNotNull()
    )
    if skip_truncated:
        ok = ok.filter(~is_truncated())
    from nutch_spark.operators.parse_html import _outlink_limit

    # content is raw bytes (FETCH_SCHEMA) — decode JVM-side for the regex
    # pulls; legacy string-content logs pass through unchanged. Malformed
    # sequences replace, never raise — set codingErrorAction on the ACTIVE
    # session (a driver-built vanilla session lacks our factory configs;
    # it is a runtime SQL conf, so setting it here is effective).
    if isinstance(fetch_log.schema["content"].dataType, T.BinaryType):
        fetch_log.sparkSession.conf.set(
            "spark.sql.legacy.codingErrorAction", "true"
        )
        html = F.decode(F.col("content"), "UTF-8")
    else:
        html = F.col("content")
    outlinks = F.transform(
        F.slice(
            F.regexp_extract_all(html, F.lit('href="([^"]{1,4096})"'), F.lit(1)),
            1,
            _outlink_limit(cfg),  # negative cap = unlimited, and slice()
        ),  # rejects negative lengths at runtime
        lambda u: F.struct(u.alias("to_url"), F.lit("").alias("anchor")),
    )
    text = F.trim(F.regexp_replace(html, "<[^>]*>", " "))
    return ok.select(
        "url",
        F.regexp_extract(html, "<title>([^<]*)</title>", 1).alias("title"),
        outlinks.alias("outlinks"),
        text.alias("parse_text"),
        "signature",
    )


def emit_parse_rows(
    parse_data: DataFrame,
    crawldb_scores: DataFrame | None = None,
    *,
    cfg: NutchConfig = DEFAULT,
    urlmeta_keys: tuple[str, ...] = (),
    datum_meta_keys: tuple[str, ...] = (),
    normalize: bool = True,
    filter_predicate=None,
    exempt_predicate=None,
) -> DataFrame:
    """P3: per parsed page emit linked/signature carrier rows
    (ParseOutputFormat.java:150-362): one ``linked`` row per outlink target
    carrying the OPIC share = parent_score/valid_outlink_count (D3), plus
    one ``signature`` row for the source page.

    Outlink hygiene per ParseOutputFormat.java:204-217: every target is
    NORMALIZED (``normalize``, parse.normalize.urls default true) and may be
    filtered (``filter_predicate``: url Column → boolean Column); both run
    on the outlink ARRAY before the share is computed, so the OPIC share
    divides by the reference's validCount — the number of outlinks that
    actually survive — with no extra shuffle.

    ``urlmeta_keys`` (urlmeta plugin, URLMetaScoringFilter.
    distributeScoreToOutlinks): the listed parse-meta tags propagate from
    the parent page onto every linked row as a ``metadata`` map, so frontier
    URLs inherit their discoverer's tags. ``datum_meta_keys``
    (scoring-metadata plugin, MetadataScoringFilter: the CRAWLDB datum's
    metadata rides through content/parse onto outlink targets) does the
    same for keys of the parent's crawldb ``metadata`` map (requires
    ``crawldb_scores`` to carry a ``metadata`` column); when a key exists
    in both, the parse-meta (urlmeta) value wins — it is fresher.

    External/internal outlink ignoring (ParseOutputFormat.java:156-287):
    ``cfg.ignore_external_links`` drops outlinks leaving the source's host
    (or registrable domain with ``cfg.ignore_external_links_mode =
    'byDomain'``); ``cfg.ignore_internal_links`` drops the ones staying.
    ``exempt_predicate`` (urlfilter-ignoreexempt, ExemptionUrlFilter.java:
    62-75: regex rules in regex-urlfilter format) re-admits matching
    EXTERNAL targets — static-asset CDNs etc. — despite the external ban;
    it never overrides the internal ban, like the reference (the exemption
    hook only fires on the ignoreExternal branch)."""
    from nutch_spark.functions.urls import (
        normalize_url,
        url_domain,
        url_domain_inline,
        url_host,
    )

    links_arr: Column = F.col("outlinks")
    if normalize:
        links_arr = F.filter(
            F.transform(
                links_arr,
                lambda o: F.struct(
                    normalize_url(o["to_url"]).alias("to_url"),
                    o["anchor"].alias("anchor"),
                ),
            ),
            lambda o: o["to_url"].isNotNull()
            # schemeless/relative/mailto survivors = ParseOutputFormat's
            # toUrl == null drop (normalize passes unparseable through)
            & o["to_url"].rlike("^[A-Za-z][A-Za-z0-9+.-]*://"),
        )
    if filter_predicate is not None:
        links_arr = F.filter(links_arr, lambda o: filter_predicate(o["to_url"]))
    if cfg.ignore_external_links or cfg.ignore_internal_links:
        by_domain = cfg.ignore_external_links_mode.lower() == "bydomain"
        origin = (url_domain if by_domain else url_host)(F.col("url"))
        # inside the array-filter lambda the SQL-function form of
        # url_domain can't bind the lambda variable — use the inline build
        elem_fn = url_domain_inline if by_domain else url_host

        def _same(o):  # same host/domain as the source page
            return elem_fn(o["to_url"]) == origin

        # the two checks apply INDEPENDENTLY (ParseOutputFormat tests each
        # flag on every outlink): with both set, internal links always drop
        # and external links survive only through the exemption filter
        if cfg.ignore_external_links:
            if exempt_predicate is not None:
                links_arr = F.filter(
                    links_arr, lambda o: _same(o) | exempt_predicate(o["to_url"])
                )
            else:
                links_arr = F.filter(links_arr, _same)
        if cfg.ignore_internal_links:
            links_arr = F.filter(links_arr, lambda o: ~_same(o))
    parse_data = parse_data.withColumn("outlinks", links_arr)
    scored = parse_data
    if crawldb_scores is not None:
        db_cols = ["url", F.col("score").alias("_parent_score")]
        if datum_meta_keys and "metadata" in crawldb_scores.columns:
            db_cols.append(F.col("metadata").alias("_parent_meta"))
        scored = parse_data.join(crawldb_scores.select(*db_cols), "url", "left")
    else:
        scored = scored.withColumn("_parent_score", F.lit(1.0))
    share = F.coalesce(F.col("_parent_score"), F.lit(0.0)) / F.greatest(
        F.size("outlinks"), F.lit(1)
    )

    # metadata each linked row inherits: key → source column expression.
    # scoring-metadata keys come from the parent's crawldb datum, urlmeta
    # keys from its parse meta; a key on both lists takes the parse value.
    prop: dict[str, Column] = {}
    if datum_meta_keys and "_parent_meta" in scored.columns:
        prop.update({k: F.element_at("_parent_meta", k) for k in datum_meta_keys})
    if urlmeta_keys and "meta" in scored.columns:
        prop.update({k: F.element_at("meta", k) for k in urlmeta_keys})

    carry = [c for c in ("meta", "_parent_meta") if c in scored.columns and prop]
    linked = scored.select(
        F.explode("outlinks").alias("o"), share.cast("float").alias("score"),
        *[F.col(c) for c in carry],
    ).select(
        F.col("o.to_url").alias("url"),
        F.lit("linked").alias("status"),
        "score",
        F.lit(None).cast("binary").alias("signature"),
        *(
            [
                F.map_filter(
                    F.map_from_arrays(
                        F.array(*[F.lit(k) for k in prop]),
                        F.array(*prop.values()),
                    ),
                    lambda _, v: v.isNotNull(),
                ).alias("metadata")
            ]
            if prop
            else []
        ),
    )
    sigs = parse_data.select(
        "url",
        F.lit("signature").alias("status"),
        F.lit(None).cast("float").alias("score"),
        F.col("signature"),
    )
    if "metadata" in linked.columns:
        sigs = sigs.withColumn(
            "metadata", F.lit(None).cast("map<string,string>")
        )
    return linked.unionByName(sigs)


# OutlinkExtractor.java:55-61 URL_PATTERN, RE2-safe (non-capturing groups)
TEXT_URL_PATTERN = (
    "[A-Za-z][A-Za-z0-9+.-]{1,120}:[A-Za-z0-9/]"
    "(?:[A-Za-z0-9$_.+!*,;/?:@&~=-]|%[A-Fa-f0-9]{2}){1,333}"
    "(?:#[a-zA-Z0-9][a-zA-Z0-9$_.+!*,;/?:@&~=%-]{0,1000})?"
)


def extract_text_outlinks(
    text: Column | str, *, cfg: NutchConfig = DEFAULT
) -> Column:
    """Outlinks from PLAIN TEXT (parse-text path, OutlinkExtractor.java:95):
    every absolute URL matched by the reference's activation regex, deduped
    in order, capped at db.max.outlinks.per.page. Pure regexp column —
    codegen'd, no UDF."""
    t = F.col(text) if isinstance(text, str) else text
    from nutch_spark.operators.parse_html import _outlink_limit

    urls = F.regexp_extract_all(t, F.lit(TEXT_URL_PATTERN), F.lit(0))
    deduped = F.array_distinct(urls)
    return F.slice(
        deduped, 1, F.least(F.size(deduped), F.lit(_outlink_limit(cfg)))
    )
