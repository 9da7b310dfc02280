"""P2 binary-document text extraction: PDF and Office-Open-XML parsers.

Reference: the parse-tika plugin routes every non-HTML mime through Tika and
emits ParseText (/root/reference/src/plugin/parse-tika/src/java/org/apache/
nutch/parse/tika/TikaParser.java:63-160). Tika itself is a large external
library; this module re-implements the two families a crawl actually meets —
PDF text operators and OOXML (docx/xlsx/pptx) — with the stdlib only
(zlib for FlateDecode, zipfile + ElementTree for OOXML), and plugs into the
same mapInPandas parse slot as parse_html. Formats beyond that (legacy OLE
.doc/.xls, encrypted PDFs) degrade to empty text with the mime still
detected, mirroring Tika's empty-parse on unsupported input.

Scale shape: extraction is a narrow Arrow-batched map over (url, content) —
no shuffle, payload column pruned everywhere else. The extractors are
per-document pure functions, so the stage parallelizes perfectly and a
failed document costs only its own row (never the task).
"""

from __future__ import annotations

import re
import zipfile
import zlib
from collections.abc import Iterator
from io import BytesIO
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# PDF: FlateDecode streams -> BT/ET text operators (Tj, TJ, ', ")
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
# literal string (no nested-paren handling needed after escape removal pass)
_TJ_RE = re.compile(rb"\((?:\\.|[^()\\])*\)\s*(?:Tj|')|\((?:\\.|[^()\\])*\)\s*\"")
_TJ_ARRAY_RE = re.compile(rb"\[((?:\((?:\\.|[^()\\])*\)|[^\]])*)\]\s*TJ")
_LITERAL_RE = re.compile(rb"\((?:\\.|[^()\\])*\)")
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    """Literal-string unescape per PDF 32000-1 §7.3.4.2 (without octals >255)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # up to 3 octal digits
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _PDF_ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _pdf_strings(chunk: bytes) -> list[bytes]:
    """Shown strings from one content-stream chunk, in order."""
    found: list[tuple[int, bytes]] = []
    for m in _TJ_RE.finditer(chunk):
        lit = _LITERAL_RE.search(m.group(0))
        if lit:
            found.append((m.start(), _unescape_pdf_string(lit.group(0)[1:-1])))
    for m in _TJ_ARRAY_RE.finditer(chunk):
        parts = [
            _unescape_pdf_string(s.group(0)[1:-1])
            for s in _LITERAL_RE.finditer(m.group(1))
        ]
        found.append((m.start(), b"".join(parts)))
    return [s for _, s in sorted(found, key=lambda t: t[0])]


def extract_pdf_text(data: bytes) -> str:
    """Text of an unencrypted PDF: every BT..ET text block's shown strings,
    FlateDecode-decompressed where needed, newline-joined in stream order.
    Encrypted PDFs (an /Encrypt trailer entry) return '' — string operands
    are ciphertext without the RC4/AES key schedule, which is out of scope
    (TikaParser also needs a password hook there)."""
    if b"/Encrypt" in data:
        return ""
    blocks: list[bytes] = []
    for m in _STREAM_RE.finditer(data):
        params, body = m.group(1), m.group(2)
        # /Length is authoritative when it's a DIRECT value: compressed data
        # may legitimately END in EOL bytes, so stripping heuristically can
        # eat real data (a Flate stream ending in 0x0d did exactly that).
        # An INDIRECT reference ('/Length 8 0 R' — what most PDF writers
        # emit) must NOT match: its object number would truncate the body.
        length = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", params)
        if length and int(length.group(1)) <= len(body):
            body = body[: int(length.group(1))]
        elif body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"/FlateDecode" in params:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        elif b"/Filter" in params:
            continue  # DCT/LZW/ASCII85... — image or unsupported filter
        for bt in _BT_ET_RE.finditer(body):
            strings = _pdf_strings(bt.group(1))
            if strings:
                blocks.append(b" ".join(strings))
    out = b"\n".join(blocks)
    return out.decode("latin-1", errors="replace").strip()


# ---------------------------------------------------------------------------
# OOXML: docx / xlsx / pptx via zipfile + ElementTree
# ---------------------------------------------------------------------------


def _xml_texts(xml_bytes: bytes, localname: str) -> list[str]:
    """All text of elements with the given localname, any namespace."""
    try:
        root = ElementTree.fromstring(xml_bytes)
    except ElementTree.ParseError:
        return []
    return [
        el.text
        for el in root.iter()
        if el.tag.rpartition("}")[2] == localname and el.text
    ]


def extract_docx_text(data: bytes) -> str:
    """word/document.xml <w:t> runs, paragraph-joined (ECMA-376 WordprocessingML)."""
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError):
        return ""
    # join runs inside a paragraph with '', paragraphs with '\n'
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return ""
    paras = []
    for p in root.iter():
        if p.tag.rpartition("}")[2] != "p":
            continue
        runs = [
            el.text
            for el in p.iter()
            if el.tag.rpartition("}")[2] == "t" and el.text
        ]
        if runs:
            paras.append("".join(runs))
    return "\n".join(paras).strip()


def extract_xlsx_text(data: bytes) -> str:
    """Shared strings + inline strings of every sheet (SpreadsheetML)."""
    parts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            names = set(z.namelist())
            if "xl/sharedStrings.xml" in names:
                parts += _xml_texts(z.read("xl/sharedStrings.xml"), "t")
            for n in sorted(names):
                if n.startswith("xl/worksheets/") and n.endswith(".xml"):
                    parts += _xml_texts(z.read(n), "t")  # inline strings
    except (zipfile.BadZipFile, KeyError):
        return ""
    return "\n".join(parts).strip()


def extract_pptx_text(data: bytes) -> str:
    """<a:t> runs of every slide in deck order (DrawingML)."""
    parts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            slides = sorted(
                n
                for n in z.namelist()
                if n.startswith("ppt/slides/slide") and n.endswith(".xml")
            )
            for n in slides:
                parts += _xml_texts(z.read(n), "t")
    except (zipfile.BadZipFile, KeyError):
        return ""
    return "\n".join(parts).strip()


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_OOXML_MARKERS = {
    "word/": ("application/vnd.openxmlformats-officedocument.wordprocessingml.document", extract_docx_text),
    "xl/": ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", extract_xlsx_text),
    "ppt/": ("application/vnd.openxmlformats-officedocument.presentationml.presentation", extract_pptx_text),
}


# parse-zip bounds: entries parsed per archive and bytes read per entry
# (a crawler must never let one hostile archive own an executor)
_ZIP_MAX_ENTRIES = 100
_ZIP_MAX_ENTRY_BYTES = 1 << 20


def _extract_zip_members(data: bytes, depth: int) -> str:
    """parse-zip (src/plugin/parse-zip ZipTextExtractor.java): each archive
    entry routes through the same mime-dispatched extraction; texts join in
    entry order. Depth-capped so zip bombs of nested archives terminate."""
    texts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            for info in z.infolist()[:_ZIP_MAX_ENTRIES]:
                if info.is_dir() or info.file_size > _ZIP_MAX_ENTRY_BYTES:
                    continue
                try:
                    member = z.read(info.filename)
                except Exception:  # corrupt entry — skip it, keep the rest
                    continue
                _, text = _extract_text(member, depth + 1)
                if text:
                    texts.append(text)
    except zipfile.BadZipFile:
        return ""
    return "\n".join(texts)


def extract_text(data: bytes) -> tuple[str, str]:
    """(mime, text) for one binary document, dispatched on magic bytes —
    the runtime twin of functions.mime.detect_mime's magic branch."""
    return _extract_text(data, 0)


def _extract_text(data: bytes, depth: int) -> tuple[str, str]:
    if data[:5] == b"%PDF-":
        return "application/pdf", extract_pdf_text(data)
    if data[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(BytesIO(data)) as z:
                names = z.namelist()
        except zipfile.BadZipFile:
            return "application/zip", ""
        for prefix, (mime, fn) in _OOXML_MARKERS.items():
            if any(n.startswith(prefix) for n in names):
                return mime, fn(data)
        if depth >= 2:  # nested-archive cutoff
            return "application/zip", ""
        return "application/zip", _extract_zip_members(data, depth)
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":  # legacy OLE .doc/.xls
        return "application/x-ole-storage", ""
    # fall back to plain text for decodable bytes
    try:
        return "text/plain", data.decode("utf-8").strip()
    except UnicodeDecodeError:
        return "application/octet-stream", ""


PARSE_BINARY_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("parse_text", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def parse_binary(
    fetch_log: DataFrame, *, url: str = "url", content: str = "content"
) -> DataFrame:
    """Binary fetch rows → (url, mime, parse_text, n_chars): the parse-tika
    slot next to parse_html. Input ``content`` must be BINARY; rows with
    NULL content are dropped (nothing to parse), extraction failures yield
    mime + empty text rather than failing the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, payload in zip(pdf[url], pdf[content]):
                data = bytes(payload)
                try:
                    mime, text = extract_text(data)
                except Exception:
                    mime, text = "application/octet-stream", ""
                rows.append(
                    {"url": u, "mime": mime, "parse_text": text, "n_chars": len(text)}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PARSE_BINARY_SCHEMA.fields]
            )

    src = fetch_log.filter(F.col(content).isNotNull()).select(url, content)
    return src.mapInPandas(run, PARSE_BINARY_SCHEMA)
