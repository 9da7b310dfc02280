"""MIME type detection (util/MimeUtil.java, which delegates to Tika's
three-signal resolver: content magic, the server's Content-Type header, and
the URL extension).

Re-expressed as a pure column expression — a CASE chain over magic-byte
prefixes, then the cleaned header, then the extension map — so detection runs
inside whole-stage codegen on the JVM with zero Python. Magic outranks the
header (servers lie: MimeUtil.autoResolveContentType), the header outranks
the extension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-byte prefixes, checked against the first bytes of the content
# (hex for binary magics so the same expression serves BINARY columns)
_MAGIC_HEX = [
    ("255044462D", "application/pdf"),     # %PDF-
    ("89504E47", "image/png"),
    ("47494638", "image/gif"),             # GIF8
    ("FFD8FF", "image/jpeg"),
    ("504B0304", "application/zip"),
    ("1F8B", "application/gzip"),
    ("425A68", "application/x-bzip2"),     # BZh
    ("4D5A", "application/x-msdownload"),  # MZ
    ("00000018667479", "video/mp4"),
    ("494433", "audio/mpeg"),              # ID3
    ("52494646", "audio/x-wav"),           # RIFF (wav/avi family)
]

_EXT = {
    "html": "text/html",
    "htm": "text/html",
    "xhtml": "application/xhtml+xml",
    "xml": "application/xml",
    "txt": "text/plain",
    "css": "text/css",
    "js": "application/javascript",
    "json": "application/json",
    "pdf": "application/pdf",
    "png": "image/png",
    "gif": "image/gif",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "svg": "image/svg+xml",
    "ico": "image/x-icon",
    "zip": "application/zip",
    "gz": "application/gzip",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "rss": "application/rss+xml",
    "atom": "application/atom+xml",
}


def clean_content_type(header: Column) -> Column:
    """'text/HTML; charset=utf-8' → 'text/html' (MimeUtil.cleanMimeType)."""
    return F.lower(F.trim(F.split_part(header, F.lit(";"), F.lit(1))))


def url_extension(url: Column | str) -> Column:
    """Lower-cased extension of the URL path ('' when none)."""
    u = F.col(url) if isinstance(url, str) else url
    path = F.regexp_extract(u, r"^[a-zA-Z+.-]+://[^/?#]+([^?#]*)", 1)
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z0-9]{1,8})$", 1))


def detect_mime(
    url: Column | str,
    content: Column | str | None = None,
    content_type: Column | str | None = None,
) -> Column:
    """Best-effort MIME type: magic bytes → Content-Type header → extension
    → application/octet-stream. ``content`` may be a BINARY or STRING column."""
    expr: Column | None = None

    def chain(c: Column, nxt: Column) -> Column:
        return F.coalesce(c, nxt) if c is not None else nxt

    if content is not None:
        c = F.col(content) if isinstance(content, str) else content
        head_hex = F.upper(F.hex(F.substring(c.cast("binary"), 1, 16)))
        magic = None
        for prefix, mime in _MAGIC_HEX:
            cond = head_hex.startswith(prefix)
            magic = F.when(cond, mime) if magic is None else magic.when(cond, mime)
        # textual magics on the string view
        s = F.ltrim(F.lower(c.cast("string")))
        magic = magic.when(
            s.startswith("<!doctype html") | s.startswith("<html"), "text/html"
        ).when(s.startswith("<?xml"), "application/xml")
        expr = chain(expr, magic)

    if content_type is not None:
        h = F.col(content_type) if isinstance(content_type, str) else content_type
        cleaned = clean_content_type(h)
        expr = chain(expr, F.when(cleaned != "", cleaned))

    ext = url_extension(url)
    by_ext = None
    for e, mime in _EXT.items():
        cond = ext == e
        by_ext = F.when(cond, mime) if by_ext is None else by_ext.when(cond, mime)
    expr = chain(expr, by_ext)
    return F.coalesce(expr, F.lit("application/octet-stream"))
