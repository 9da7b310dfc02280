"""S9 — ARC file import (legacy Internet Archive format).

Reference: tools/arc/ArcSegmentCreator.java + tools/arc/ArcRecordReader.java:
an ARC v1 file is a version block followed by records, each introduced by a
one-line header ``<url> <ip> <yyyyMMddHHmmss> <mime-type> <length>`` and
``length`` bytes of payload.

Spark shape: ``spark.read.format("binaryFile")`` lists and reads the files
distributed (one task per file — ARC files are not splittable without a
record index, same constraint the reference's ArcRecordReader works under);
record splitting happens in ``mapInPandas``. Gzip-compressed ARCs (the
common .arc.gz form) are decompressed per file; multi-member gzip (one
member per record) is handled by ``gzip.decompress``-per-member fallback.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)


def _decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        out = io.BytesIO()
        buf = io.BytesIO(data)
        # concatenated gzip members (per-record compression) stream through
        while True:
            start = buf.tell()
            if start >= len(data):
                break
            try:
                with gzip.GzipFile(fileobj=buf) as gz:
                    out.write(gz.read())
            except (OSError, EOFError):
                break
            if buf.tell() == start:  # no progress — corrupt tail
                break
        return out.getvalue()
    return data


# plausible starts of an ARC record header line, used to RESYNC after
# malformed bytes (the reference's reader scans for the next gzip magic the
# same way: ArcRecordReader.java:229-262 false-positive recovery loop)
_RESYNC_MARKERS = (b"\nhttp://", b"\nhttps://", b"\nfiledesc://", b"\ndns:")


def _decode_header(raw: bytes) -> str:
    """ARC headers are usually ASCII but legacy crawls carry latin-1 URLs;
    try strict utf-8 first, fall back to latin-1 (lossless for any byte)."""
    try:
        return raw.decode("utf-8").strip()
    except UnicodeDecodeError:
        return raw.decode("latin-1").strip()


def parse_arc_bytes(data: bytes, source: str) -> list[dict]:
    """Split one ARC file's bytes into records (ArcRecordReader.java:140-239
    semantics: header line, exact-length payload, record separator).

    Tolerates the legacy zoo: ARC v1 (5-field header
    ``url ip date mime length``) and v2 (10-field, same first-four + trailing
    length: ArcSegmentCreator-era files), latin-1 bytes in header lines,
    truncated final records (emitted with the bytes present), and garbage
    between records — a malformed header RESYNCS to the next plausible
    record start instead of abandoning the rest of the file, mirroring the
    reference reader's gzip-magic recovery scan."""
    data = _decompress(data)
    records: list[dict] = []
    pos = 0
    first = True
    n = len(data)

    def resync(p: int) -> int:
        nxt = [i for m in _RESYNC_MARKERS if (i := data.find(m, p)) != -1]
        return min(nxt) + 1 if nxt else n

    while pos < n:
        # skip blank separator lines
        while pos < n and data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        if pos >= n:
            break
        eol = data.find(b"\n", pos)
        if eol == -1:
            break
        header = _decode_header(data[pos:eol])
        body_at = eol + 1
        parts = header.split(" ")
        # v1 = 5 fields, v2 = 10; length is ALWAYS the last field
        try:
            length = int(parts[-1]) if len(parts) in (5, 10) else None
        except ValueError:
            length = None
        url_ish = "://" in parts[0] or parts[0].startswith("dns:")
        if length is None or length < 0 or not url_ish:
            pos = resync(pos)  # garbage — scan to next plausible record
            continue
        payload = data[body_at : body_at + length]
        pos = body_at + length
        if first and parts[0].startswith("filedesc://"):
            # the version block describes the file itself; skip it
            first = False
            continue
        first = False
        url, ip, date14, mime = parts[0], parts[1], parts[2], parts[3]
        try:
            ts = pd.to_datetime(date14, format="%Y%m%d%H%M%S")
        except ValueError:
            ts = None
        records.append(
            {
                "url": url,
                "ip": ip,
                "fetch_time": ts,
                "content_type": mime,
                "content": payload,  # may be short if the file was truncated
                "source_file": source,
            }
        )
    return records


def _read_records(spark: SparkSession, path: str, parser, schema) -> DataFrame:
    """Shared import scaffold: binaryFile scan (one task per file) →
    mapInPandas exploding each file's records with ``parser``."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                out.extend(parser(bytes(row.content), row.path))
            yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(run, schema)


def read_arc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed ARC import: one task per file, records exploded in
    Arrow batches. Returns ARC_SCHEMA rows ready for the parse/updatedb
    pipeline (ArcSegmentCreator.java's output shape)."""
    return _read_records(spark, path, parse_arc_bytes, ARC_SCHEMA)


WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)


def parse_warc_bytes(data: bytes, source: str, *, binary: bool = False) -> list[dict]:
    """Split a WARC/1.0 file (plain or gzip) into records.

    ``binary=True`` keeps each record block as raw bytes (the mirror of a
    binary-content ``write_warc`` — byte-exact round trip for non-text
    payloads); default decodes utf-8 replace for the legacy text shape.

    Header block = lines until the blank line; the payload is
    Content-Length bytes. Truncated/garbled records are skipped, never
    fatal (an import must survive a bad chunk)."""
    data = _decompress(data)  # shared gzip path (multi-member, EOF-safe)
    out: list[dict] = []
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:  # missing/garbled/negative: skip record, keep moving
            pos = head_end + 4
            continue
        body = data[head_end + 4 : head_end + 4 + length]
        ts = None
        raw_date = headers.get("warc-date", "")
        if raw_date:
            try:
                from datetime import datetime

                ts = datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = None
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "warc_type": headers.get("warc-type"),
                "fetch_time": ts,
                "content": body if binary else body.decode("utf-8", errors="replace"),
                "source_file": source,
            }
        )
        # always advance strictly past this header block — a lying
        # Content-Length must never re-find the same record (no hangs)
        pos = max(head_end + 4 + length, head_end + 4)
    return out


WARC_BINARY_SCHEMA = T.StructType(
    [f if f.name != "content" else T.StructField("content", T.BinaryType(), True)
     for f in WARC_SCHEMA.fields]
)


def read_warc(spark: SparkSession, path: str, *, binary: bool = False) -> DataFrame:
    """Distributed WARC import (the CommonCrawl input format): one task per
    file via binaryFile, records exploded in Arrow batches — the mirror of
    ``sources.exports.write_warc`` and the same shape ``read_arc`` emits.
    ``binary=True`` returns ``content`` as BINARY (raw record block bytes,
    FETCH_SCHEMA-compatible) instead of utf-8-replace text."""
    if binary:
        import functools

        return _read_records(
            spark, path,
            functools.partial(parse_warc_bytes, binary=True),
            WARC_BINARY_SCHEMA,
        )
    return _read_records(spark, path, parse_warc_bytes, WARC_SCHEMA)
