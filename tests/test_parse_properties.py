"""Property-based tests (hypothesis) for the pure-Python parse layers added
in round 4 — PDF string handling, ARC record splitting, langid profiles.
These run hundreds of adversarial examples cheaply because no JVM round-trip
is involved (the invariants file explains why Spark operators get batch-style
invariant tests instead).
"""

from __future__ import annotations

import zlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nutch_spark.operators.parse_binary import (
    _unescape_pdf_string,
    extract_pdf_text,
)
from nutch_spark.sources.arc import parse_arc_bytes


def _escape_pdf(s: bytes) -> bytes:
    return (
        s.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")
    )


@given(st.binary(min_size=0, max_size=200))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200, deadline=None)
def test_pdf_escape_unescape_roundtrip(payload):
    assert _unescape_pdf_string(_escape_pdf(payload)) == payload


@given(st.text(alphabet=st.characters(codec="latin-1"), max_size=120))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100, deadline=None)
def test_pdf_text_roundtrip_any_latin1(s):
    # any latin-1 string survives: escape -> wrap in a Flate stream -> extract
    raw = s.encode("latin-1")
    stream = b"BT (" + _escape_pdf(raw) + b") Tj ET"
    body = zlib.compress(stream)
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == s.strip()


def _wrap_stream(stream: bytes) -> bytes:
    body = zlib.compress(stream)
    return (
        b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode()
        + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n%%EOF\n"
    )


def test_pdf_operator_tokens_inside_literals():
    # 'ET'/'BT'/'Tj' byte-pairs inside a shown string must not terminate the
    # BT..ET block (the old BT(.*?)ET regex truncated at the first 'ET')
    for s in ["ET", "BT", "(ET)", "xETy", "hello ET world", "Tj Tj", "a ] TJ b"]:
        raw = s.encode("latin-1")
        stream = b"BT (" + _escape_pdf(raw) + b") Tj ET"
        assert extract_pdf_text(_wrap_stream(stream)) == s.strip(), s


def test_pdf_nested_unescaped_parens():
    # balanced unescaped parens are legal inside literals (PDF 32000-1
    # §7.3.4.2) — the scanner must keep them and not split the string
    stream = b"BT (outer (inner (deep ET)) tail) Tj ET"
    assert extract_pdf_text(_wrap_stream(stream)) == "outer (inner (deep ET)) tail"


def test_pdf_multiblock_with_comments_and_hex():
    stream = (
        b"% comment mentioning ET BT Tj\n"
        b"BT (first) Tj ET\n"
        b"q 1 0 0 1 10 10 cm Q\n"
        b"BT [(a) -20 (b)] TJ ET\n"
        b"BT <4554> Tj (after hex) Tj ET"
    )
    # hex-string Tj operands are skipped (not extracted), literals kept
    assert extract_pdf_text(_wrap_stream(stream)) == "first\nab\nafter hex"


def test_pdf_unterminated_literal_does_not_hang():
    stream = b"BT (never closed Tj ET"
    assert isinstance(extract_pdf_text(_wrap_stream(stream)), str)


_URL = st.from_regex(r"http://[a-z]{1,10}\.com/[a-z0-9]{0,10}", fullmatch=True)
_PAYLOAD = st.binary(min_size=0, max_size=300)


@given(st.lists(st.tuples(_URL, _PAYLOAD), min_size=0, max_size=8))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100, deadline=None)
def test_arc_roundtrip_arbitrary_payloads(records):
    # payloads may contain newlines, header-lookalikes, gzip magic — the
    # length-prefixed format must recover every record exactly
    blob = b""
    for url, payload in records:
        blob += f"{url} 1.2.3.4 20260101000000 text/html {len(payload)}\n".encode()
        blob += payload + b"\n"
    out = parse_arc_bytes(blob, "f")
    assert [(r["url"], bytes(r["content"])) for r in out] == records


@given(st.binary(min_size=0, max_size=500))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200, deadline=None)
def test_arc_never_crashes_on_garbage(junk):
    # arbitrary bytes: the parser may salvage records but must never raise
    out = parse_arc_bytes(junk, "f")
    assert isinstance(out, list)


def test_langid_profile_build_is_pure():
    from nutch_spark.datapipe.langid_profiles import build_profiles, profiles_values_sql

    a = profiles_values_sql()
    b = profiles_values_sql()
    assert a == b
    profiles, miss = build_profiles()
    # every score used by the SQL VALUES is a plain int (exact cross-engine)
    assert all(
        isinstance(v, int) for prof in profiles.values() for v in prof.values()
    )
    assert all(isinstance(v, int) for v in miss.values())
