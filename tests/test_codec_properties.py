"""Property-based tests (hypothesis) over the pure wire/byte codecs added in
round 8 — no Spark session needed, so hundreds of examples run in seconds.
Each property is a round-trip or a cross-check against an independent
reference implementation written from the same public spec."""

from __future__ import annotations

import gzip

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nutch_spark.datapipe.mediacodec import byte_histogram
from nutch_spark.functions.textutil import (
    mask,
    reverse_url,
    unreverse_url,
    unzip_best_effort,
)
from nutch_spark.sources.amqp_wire import decode_table, encode_table
from nutch_spark.sources.kafka_wire import (
    crc32c,
    decode_record_batch,
    decode_varint,
    encode_record_batch,
    encode_varint,
)

# ---------------------------------------------------------------------------
# kafka wire
# ---------------------------------------------------------------------------

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
def test_varint_round_trip_any_int64(n):
    buf = encode_varint(n)
    val, pos = decode_varint(buf, 0)
    assert (val, pos) == (n, len(buf))


@given(st.lists(INT64, min_size=2, max_size=20))
def test_varint_concatenation_parses_in_sequence(ns):
    blob = b"".join(encode_varint(n) for n in ns)
    pos, out = 0, []
    while pos < len(blob):
        v, pos = decode_varint(blob, pos)
        out.append(v)
    assert out == ns


_RECORD = st.tuples(
    st.one_of(st.none(), st.binary(max_size=64)),
    st.one_of(st.none(), st.binary(max_size=256)),
)


@given(st.lists(_RECORD, min_size=1, max_size=25), st.integers(0, 2**40))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=50)
def test_record_batch_round_trip_any_records(records, ts):
    assert decode_record_batch(encode_record_batch(records, ts)) == records


def _crc32c_bitwise(data: bytes) -> int:
    """Independent bit-at-a-time CRC-32C from the Castagnoli polynomial —
    cross-checks the table-driven implementation."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


@given(st.binary(max_size=128))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100)
def test_crc32c_matches_bitwise_reference(data):
    assert crc32c(data) == _crc32c_bitwise(data)


# ---------------------------------------------------------------------------
# amqp wire
# ---------------------------------------------------------------------------

_KEY = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=20
)
_VALUE = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(max_size=40),
)


@given(st.dictionaries(_KEY, _VALUE, max_size=8))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100)
def test_amqp_table_round_trip(table):
    blob = encode_table(table)
    got, end = decode_table(blob)
    assert got == table and end == len(blob)


# ---------------------------------------------------------------------------
# textutil
# ---------------------------------------------------------------------------

_HOST_LABEL = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8)


@given(
    st.sampled_from(["http", "https", "ftp"]),
    st.lists(_HOST_LABEL, min_size=1, max_size=4),
    st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    st.lists(_HOST_LABEL, max_size=3),
)
def test_reverse_unreverse_url_round_trip(scheme, labels, port, path_segs):
    host = ".".join(labels)
    port_part = f":{port}" if port else ""
    path = "/" + "/".join(path_segs) if path_segs else "/"
    url = f"{scheme}://{host}{port_part}{path}"
    assert unreverse_url(reverse_url(url)) == url
    # the reversed key groups by domain: same-host urls share the key prefix
    assert reverse_url(url).startswith(".".join(reversed(labels)) + ":")


@given(st.binary(min_size=0, max_size=4096))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=50)
def test_unzip_best_effort_inverts_gzip(data):
    assert unzip_best_effort(gzip.compress(data)) == data


@given(st.binary(min_size=1, max_size=2048), st.integers(min_value=1, max_value=32))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100)
def test_byte_histogram_properties(payload, bins):
    h = byte_histogram(payload, bins)
    assert len(h) == bins
    assert abs(sum(h) - 1.0) < 1e-3  # rounding of per-bin fractions
    assert all(0.0 <= v <= 1.0 for v in h)


@given(st.text(max_size=100))
def test_mask_full_is_length_preserving_and_opaque(s):
    m = mask(s)
    assert len(m) == len(s) and set(m) <= {"*"}


# ---------------------------------------------------------------------------
# fuzz: hostile bytes must yield None/valid results, never exceptions —
# one malformed blob in a 100 TB corpus must not kill an executor
# ---------------------------------------------------------------------------

_SNIFF_PREFIXES = [
    b"", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8\xff",
    b"II*\x00", b"MM\x00*", b"RIFF", b"RIFFxxxxWEBP", b"fLaC", b"ID3",
    b"\x00\x00\x01\x00", b"<svg ", b"<?xml ", b"\x00\x00\x00\x14ftyp",
    b"AMQP", b"NTLMSSP\x00",
]


@given(st.sampled_from(_SNIFF_PREFIXES), st.binary(max_size=256))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=300)
def test_media_sniffers_never_raise_on_hostile_bytes(prefix, junk):
    from nutch_spark.datapipe.mediacodec import (
        effective_dimensions,
        exif_orientation,
        parse_flac_streaminfo,
        parse_mp3_info,
        parse_wav,
        sniff_image_dimensions,
        sniff_isobmff,
    )

    payload = prefix + junk
    for fn in (
        sniff_image_dimensions,
        effective_dimensions,
        exif_orientation,
        parse_wav,
        parse_flac_streaminfo,
        parse_mp3_info,
        sniff_isobmff,
    ):
        result = fn(payload)  # must not raise
        if fn is sniff_image_dimensions and result is not None:
            fmt, w, h = result
            assert isinstance(fmt, str) and w >= 1 and h >= 1


@given(st.binary(max_size=200))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200, deadline=None)
def test_document_extractors_never_raise_on_hostile_bytes(junk):
    from nutch_spark.operators.parse_binary import extract_text

    for prefix in (b"", b"PK\x03\x04", b"%PDF-", b"{\\rtf", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        mime, text = extract_text(prefix + junk)  # must not raise
        assert isinstance(mime, str) and isinstance(text, str)


@given(st.binary(max_size=128))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100)
def test_record_batch_decoder_never_hangs_on_junk(blob):
    import pytest as _pytest

    from nutch_spark.sources.kafka_wire import decode_record_batch

    if len(blob) < 21:
        with _pytest.raises(Exception):
            decode_record_batch(blob)
    else:
        try:
            decode_record_batch(blob)
        except (ValueError, IndexError, struct.error):
            pass  # rejection is fine; hanging or segfaulting is not


import struct  # noqa: E402  (used by the junk-batch property above)


# ---------------------------------------------------------------------------
# round-9 codecs: LZX, snappy, WordPerfect, CAB, CHM
# ---------------------------------------------------------------------------


@given(st.binary(min_size=1, max_size=4000))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=60, deadline=None)
def test_lzx_verbatim_round_trip_any_bytes(payload):
    from nutch_spark.functions.lzx import LzxDecoder, lzx_compress_block

    comp = lzx_compress_block(payload, 16)
    assert LzxDecoder(16).decompress(comp, len(payload)) == payload


@given(st.binary(min_size=1, max_size=4000))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=60, deadline=None)
def test_lzx_uncompressed_round_trip_any_bytes(payload):
    from nutch_spark.functions.lzx import (
        LzxDecoder,
        lzx_compress_uncompressed_block,
    )

    comp = lzx_compress_uncompressed_block(payload)
    assert LzxDecoder(16).decompress(comp, len(payload)) == payload


@given(st.binary(max_size=4000))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100, deadline=None)
def test_snappy_round_trip_any_bytes(payload):
    from nutch_spark.operators.parse_tail import (
        snappy_compress_literal,
        snappy_decompress,
    )

    assert snappy_decompress(snappy_compress_literal(payload)) == payload


@given(
    st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        max_size=300,
    ).map(lambda s: s.strip()),
    st.sampled_from([5, 6]),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=100, deadline=None)
def test_wpd_round_trip_any_printable_text(text, version):
    from nutch_spark.operators.parse_tail import build_wpd_bytes, extract_wpd_text

    assert extract_wpd_text(build_wpd_bytes(text, version=version))[1] == text


@given(
    st.text(
        # r16: every character the appendix charset tables map (plus
        # ASCII) must round-trip build -> extract bit-exactly
        alphabet=st.sampled_from(
            "ABC xyz ßÀàÁáÂâÃãÄäÅåÆæÇçÈèÉéÊêËëÌìÍíÎîÏïÑñÒòÓóÔôÕõÖö"
            "ÙùÚúÛûÜüÝýŸÿ●○■¶§¡¿«»£¥½¼¢®©‘’“”–—™€"
            "ΑαΒβΓγΔδΕεΖζΗηΘθΙιΚκΛλΜμΝνΞξΟοΠπΡρΣσΤτΥυΦφΧχΨψΩω"
            "АаБбВвГгДдЕеЁёЖжЗзИиЙйКкЛлМмНнОоПпРрСсТтУуФфХхЦцЧчШшЩщ"
            "ЪъЫыЬьЭэЮюЯя"
        ),
        max_size=200,
    ).map(lambda s: s.strip()),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=60, deadline=None)
def test_wpd_round_trip_extended_charsets(text):
    from nutch_spark.operators.parse_tail import build_wpd_bytes, extract_wpd_text

    assert extract_wpd_text(build_wpd_bytes(text))[1] == text


def test_wpd_extended_charset_vectors():
    """Spot vectors pinning the appendix (charset, index) assignments —
    a table regression flips these even though round-trip stays green."""
    from nutch_spark.operators.parse_tail import extract_wpd_text

    def wpd(*codes: tuple[int, int]) -> bytes:
        import struct as _s

        body = b"".join(bytes([0xC0, idx, cs, 0xC0]) for cs, idx in codes)
        return (
            b"\xffWPC" + _s.pack("<I", 16) + bytes([1, 0x0A, 2, 0])
            + _s.pack("<H", 0) + _s.pack("<H", 0) + body
        )

    # Multinational 1: 23=ss-sharp, pairs from 24; Greek/Cyrillic pairs
    assert extract_wpd_text(wpd((1, 23), (1, 24), (1, 25), (1, 38), (1, 39)))[1] == "ßÀàÇç"
    assert extract_wpd_text(wpd((8, 0), (8, 1), (8, 46), (8, 47)))[1] == "ΑαΩω"
    assert extract_wpd_text(wpd((10, 0), (10, 12), (10, 13)))[1] == "АЁё"
    assert extract_wpd_text(wpd((4, 23), (4, 34), (4, 72)))[1] == "©—€"
    # unmapped (charset, index) degrades to '?', never raises
    assert extract_wpd_text(wpd((9, 5), (4, 200), (55, 1)))[1] == "???"


@given(
    st.dictionaries(
        st.from_regex(r"[A-Za-z][A-Za-z0-9_.]{0,20}", fullmatch=True),
        st.binary(min_size=0, max_size=500),
        min_size=1,
        max_size=5,
    ),
    st.sampled_from(["none", "mszip", "lzx"]),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=60, deadline=None)
def test_cab_member_round_trip_any_contents(files, compression):
    from nutch_spark.operators.parse_tail import build_cab_bytes, parse_cab

    cab = build_cab_bytes(files, compression=compression)
    assert dict(parse_cab(cab)) == files


@given(st.binary(max_size=300))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150, deadline=None)
def test_round9_parsers_never_raise_on_hostile_bytes(junk):
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import (
        parse_cab,
        parse_chm_directory,
    )

    for prefix in (b"", b"\xffWPC", b"ITSF", b"MSCF", b"\x1f\x8b", b"BZh9",
                   b"\xfd7zXZ\x00"):
        mime, text = extract_text(prefix + junk)  # must not raise
        assert isinstance(mime, str) and isinstance(text, str)
    parse_cab(b"MSCF" + junk)
    parse_chm_directory(b"ITSF" + junk)


@given(st.binary(max_size=512))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_jpeg_pixel_decode_never_raises_on_hostile_bytes(junk):
    """decode_jpeg_pixels sits in the dHash path where arbitrary crawl
    bytes reach it: any byte salad behind the JPEG magic must decode to
    None or a well-formed (w, h, rows), never raise or hang."""
    from nutch_spark.datapipe.mediacodec import decode_jpeg_pixels

    for payload in (junk, b"\xff\xd8\xff" + junk):
        out = decode_jpeg_pixels(payload)
        if out is not None:
            w, h, rows = out
            assert len(rows) == h and all(len(r) == w for r in rows)
            assert all(0 <= v <= 255 for r in rows for v in r)


# ---------------------------------------------------------------------------
# email / vCard / iCalendar extractors under hostile structured input
# (these sit in the crawl parse dispatch, where arbitrary web bytes reach
# them — random-byte fuzz rarely forms MIME boundaries, so build semi-valid
# messages and then break them: truncation, corrupt base64, RFC 2047 edge
# encodings, folded/garbled iCal lines)
# ---------------------------------------------------------------------------

_RFC2047_TOKENS = st.sampled_from([
    "=?utf-8?B?Zm9vYmFy?=",            # valid base64 word
    "=?utf-8?Q?a_b=C3=A9?=",           # valid quoted-printable word
    "=?utf-8?B?###not-base64###?=",    # corrupt payload
    "=?bogus-charset?B?Zm9v?=",        # unknown charset
    "=?utf-8?X?unknown-encoding?=",    # bad encoding letter
    "=?utf-8?Q?truncated",             # unterminated encoded word
    "=?utf-8?B??=",                    # empty payload
    "plain subject",
])

_BODY_ENCODINGS = st.sampled_from([
    ("base64", "Zm9vIGJhciBiYXo="),     # valid
    ("base64", "!!!corrupt!!!"),        # broken base64
    ("base64", "Zm9vIGJhciBiYX"),       # bad padding
    ("quoted-printable", "caf=C3=A9 line=\nfolded"),
    ("quoted-printable", "bad =Z escape ="),
    ("7bit", "plain text body"),
])


@given(
    _RFC2047_TOKENS,
    st.lists(_BODY_ENCODINGS, min_size=1, max_size=3),
    st.integers(min_value=0, max_value=100),  # truncation percentage
    st.booleans(),                            # break the closing boundary
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_eml_extract_survives_hostile_mime(subject, parts, cut_pct, break_end):
    from nutch_spark.operators.parse_tail import (
        extract_eml_text,
        extract_mbox_text,
    )

    bnd = "==bnd42=="
    body = []
    for enc, payload in parts:
        body.append(
            f"--{bnd}\r\nContent-Type: text/plain; charset=utf-8\r\n"
            f"Content-Transfer-Encoding: {enc}\r\n\r\n{payload}\r\n"
        )
    if not break_end:
        body.append(f"--{bnd}--\r\n")
    raw = (
        f"Subject: {subject}\r\nFrom: a@example.com\r\nTo: b@example.com\r\n"
        f"MIME-Version: 1.0\r\n"
        f'Content-Type: multipart/alternative; boundary="{bnd}"\r\n\r\n'
        + "".join(body)
    ).encode("utf-8", errors="replace")
    raw = raw[: max(1, len(raw) * cut_pct // 100)]  # truncated multipart
    mime, text = extract_eml_text(raw)
    assert mime == "message/rfc822" and isinstance(text, str)
    # the same bytes as an mbox message (and with a corrupted separator)
    mb_mime, mb_text = extract_mbox_text(b"From hostile@x Mon Jan 1\n" + raw)
    assert mb_mime == "application/mbox" and isinstance(mb_text, str)


_ICAL_LINES = st.sampled_from([
    "SUMMARY:plain event",
    "SUMMARY;LANGUAGE=en:escaped \\n \\, \\; text",
    " folded continuation without a preceding property",
    "\tfolded-tab continuation",
    "DESCRIPTION;ENCODING=QUOTED-PRINTABLE:caf=C3=A9=\n soft break",
    "PHOTO;ENCODING=BASE64:!!!corrupt-base64!!!",
    "NO-COLON-LINE",
    ":empty-name",
    "ATTENDEE;CN=\"Quoted, Name\";ROLE=REQ:mailto:x@y",
    "X-GARBAGE;===;;;:value",
    "BEGIN:VEVENT",
    "END:VEVENT",
])


@given(
    st.booleans(),                               # calendar vs card wrapper
    st.lists(_ICAL_LINES, min_size=1, max_size=8),
    st.integers(min_value=1, max_value=100),     # truncation percentage
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_vcal_extract_survives_hostile_lines(is_cal, lines, cut_pct):
    from nutch_spark.operators.parse_tail import extract_vcal_text

    kind = "VCALENDAR" if is_cal else "VCARD"
    raw = "\r\n".join([f"BEGIN:{kind}", *lines, f"END:{kind}"]).encode()
    raw = raw[: max(1, len(raw) * cut_pct // 100)]
    mime, text = extract_vcal_text(raw)
    assert isinstance(text, str)
    assert mime in ("text/calendar", "text/vcard")


@given(st.sampled_from([b"II*\x00", b"MM\x00*"]), st.binary(max_size=400))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_tiff_pixel_decode_never_raises_on_hostile_bytes(magic, junk):
    from nutch_spark.datapipe.mediacodec import decode_tiff_pixels

    out = decode_tiff_pixels(magic + junk)
    if out is not None:
        w, h, rows = out
        assert len(rows) == h and all(len(r) == w for r in rows)
        assert all(0 <= v <= 255 for r in rows for v in r)


# ---------------------------------------------------------------------------
# Round 12: AVI container walk + the newest decoders (progressive JPEG,
# FLAC) under hostile structured input — these sit in the crawl media path
# where arbitrary web bytes reach them, so fuzz VALID fixtures broken by
# truncation / byte-flips / lying headers, not just random salad
# ---------------------------------------------------------------------------


def _valid_avi(doc_id: int = 2) -> bytes:
    from nutch_spark.plans.datapipe_queries import _planted_avi

    return _planted_avi(doc_id)


@given(st.binary(max_size=512))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_avi_walker_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import extract_avi_mjpeg_frames

    for payload in (junk, b"RIFF" + junk, b"RIFF\x00\x01\x00\x00AVI " + junk):
        out = extract_avi_mjpeg_frames(payload)
        if out is not None:
            assert isinstance(out["frames"], list)
            assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


@given(
    st.integers(min_value=0, max_value=100),   # truncation percentage
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),                       # (offset, new byte) flips
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_avi_walker_survives_mutated_valid_container(cut_pct, flips):
    """Truncations and byte-flips of a VALID planted AVI (lying chunk
    sizes, corrupted LIST types, cut mid-frame) must never raise — and
    whatever frames survive must still be SOI-prefixed byte runs."""
    from nutch_spark.datapipe.mediacodec import extract_avi_mjpeg_frames

    buf = bytearray(_valid_avi())
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: len(buf) * cut_pct // 100])
    out = extract_avi_mjpeg_frames(payload)
    if out is not None:
        assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


def test_avi_walker_bounds_hostile_nesting_and_frame_count():
    """A LIST-recursion bomb (deeply nested LIST chunks) and a frame
    flood must hit the depth / max_frames caps, not recurse or collect
    unboundedly."""
    import struct

    from nutch_spark.datapipe.mediacodec import extract_avi_mjpeg_frames

    bomb = b"\xff\xd8\xff fake-frame"
    for _ in range(64):
        bomb = b"LIST" + struct.pack("<I", len(bomb) + 4) + b"rec " + bomb
    out = extract_avi_mjpeg_frames(b"RIFF" + struct.pack("<I", len(bomb) + 4) + b"AVI " + bomb)
    assert out is not None and out["frames"] == []  # depth cap cut the walk

    frame = b"\xff\xd8\xff\xe0abc"
    chunk = b"00dc" + struct.pack("<I", len(frame)) + frame + b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + 1000 * len(chunk)) + b"movi" + chunk * 1000
    out = extract_avi_mjpeg_frames(
        b"RIFF" + struct.pack("<I", len(movi) + 4) + b"AVI " + movi, max_frames=16
    )
    assert out is not None and len(out["frames"]) == 16


def _valid_progressive_jpeg() -> bytes:
    from nutch_spark.plans.datapipe_queries import _planted_grid, _planted_jpeg

    return _planted_jpeg(_planted_grid(7), progressive=True)


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=6),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_progressive_jpeg_survives_mutation(cut_pct, flips):
    """Truncations / byte-flips of a VALID progressive JPEG — lying
    Huffman tables, cut scans, corrupted markers — must decode to None
    or a well-formed raster, never raise or hang (the random-salad fuzz
    above rarely reaches the progressive scan machinery)."""
    from nutch_spark.datapipe.mediacodec import decode_jpeg_pixels

    buf = bytearray(_valid_progressive_jpeg())
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: max(3, len(buf) * cut_pct // 100)])
    out = decode_jpeg_pixels(payload)
    if out is not None:
        w, h, rows = out
        assert len(rows) == h and all(len(r) == w for r in rows)
        assert all(0 <= v <= 255 for r in rows for v in r)


def _valid_flac(total: int = 64) -> bytes:
    import math
    import struct

    samples = [int(12000 * math.sin(0.3 * i)) for i in range(total)]
    si = (
        struct.pack(">HH", total, total)
        + b"\x00\x00\x10" * 2
        + ((8000 << 44) | (15 << 36) | total).to_bytes(8, "big")
        + b"\x00" * 16
    )
    return (
        b"fLaC\x80" + len(si).to_bytes(3, "big") + si
        + bytes([0xFF, 0xF8, 0x70, 0x08, 0x00])
        + struct.pack(">H", total - 1) + b"\x00\x02"
        + b"".join(struct.pack(">h", s) for s in samples)
        + b"\x00\x00"
    )


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=6),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_flac_decode_survives_mutation(cut_pct, flips):
    """Truncations / byte-flips of a VALID FLAC stream — lying blocksize
    codes, corrupted subframe headers, bad Rice parameters land here —
    must decode to None or a well-formed sample dict, never raise."""
    from nutch_spark.datapipe.mediacodec import decode_flac_samples

    buf = bytearray(_valid_flac())
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: max(4, len(buf) * cut_pct // 100)])
    out = decode_flac_samples(payload)
    if out is not None:
        assert out["n_samples"] >= 0
        assert len(out["samples"]) == out["n_samples"] * out["n_channels"]


def test_flac_oversized_blocksize_is_bounded():
    """A STREAMINFO lying that the stream holds 2^36 samples (or a frame
    header claiming a 65535 blocksize with no data behind it) must return
    None / partial output without allocating the claimed size."""
    import struct

    from nutch_spark.datapipe.mediacodec import decode_flac_samples

    huge = (8000 << 44) | (15 << 36) | ((1 << 36) - 1)
    si = (
        struct.pack(">HH", 65535, 65535)
        + b"\x00\x00\x10" * 2
        + huge.to_bytes(8, "big")
        + b"\x00" * 16
    )
    payload = b"fLaC\x80" + len(si).to_bytes(3, "big") + si + bytes(
        [0xFF, 0xF8, 0x70, 0x08, 0x00]
    )
    assert decode_flac_samples(payload) is None  # sample-count cap

    ok = _valid_flac()
    # blocksize code 0b0111 = "get 16-bit blocksize-1 from header": claim
    # 65535 samples, supply none — the residual/verbatim readers must stop
    # at EOF, not allocate 65535 entries of garbage
    cut = bytearray(ok)
    idx = ok.index(bytes([0xFF, 0xF8, 0x70, 0x08, 0x00]))
    cut[idx + 5 : idx + 7] = struct.pack(">H", 65534)
    out = decode_flac_samples(bytes(cut[: idx + 9]))
    assert out is None or out["n_samples"] <= 65535


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=6),
    st.booleans(),  # Layer I vs Layer II fixture
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_mpeg1_decode_survives_mutation(cut_pct, flips, layer2):
    """Truncations / byte-flips of VALID MPEG-1 Layer I/II streams —
    lying bitrate indices, corrupted allocations, cut frames — must
    decode to None or a well-formed sample dict, never raise or hang."""
    from nutch_spark.datapipe.mediacodec import decode_mpeg_audio_samples
    from nutch_spark.plans.datapipe_queries import _planted_mpeg_payload

    buf = bytearray(_planted_mpeg_payload(3 if layer2 else 2))
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: max(0, len(buf) * cut_pct // 100)])
    out = decode_mpeg_audio_samples(payload)
    if out is not None:
        assert out["n_samples"] > 0
        assert len(out["samples"]) == out["n_samples"] * out["n_channels"]


@given(st.binary(max_size=512))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_mpeg1_decode_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import decode_mpeg_audio_samples

    for payload in (junk, b"\xff\xff" + junk, b"\xff\xfd" + junk,
                    b"ID3\x04\x00\x00\x00\x00\x00\x04" + junk):
        out = decode_mpeg_audio_samples(payload)
        if out is not None:
            assert out["n_samples"] > 0


@given(st.binary(min_size=0, max_size=400))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_gif_frame_walker_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import extract_gif_frames

    for payload in (junk, b"GIF89a" + junk, b"GIF87a" + junk):
        out = extract_gif_frames(payload)
        if out is not None:
            assert out["n_frames"] >= 2
            assert all(f[:2] == b"BM" for f in out["frames"])


@given(
    st.integers(min_value=0, max_value=100),   # truncation percentage
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),                       # (offset, new byte) flips
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_gif_frame_walker_survives_mutated_valid_animation(cut_pct, flips):
    """Truncations and byte-flips of a VALID planted animated GIF (lying
    sub-block sizes, corrupted GCEs, cut mid-LZW) must never raise — and
    surviving frames must still be well-formed BMP canvases."""
    from nutch_spark.datapipe.mediacodec import extract_gif_frames
    from nutch_spark.plans.datapipe_queries import _planted_animated_gif

    buf = bytearray(_planted_animated_gif(14))  # 3 frames
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: len(buf) * cut_pct // 100])
    out = extract_gif_frames(payload)
    if out is not None:
        assert all(f[:2] == b"BM" for f in out["frames"])


def test_gif_frame_walker_bounds_frame_flood():
    """A frame flood (thousands of tiny image descriptors) stops at
    max_frames; a canvas larger than _MAX_PIXELS is rejected outright."""
    import struct

    from nutch_spark.datapipe.mediacodec import extract_gif_frames

    gif = bytearray(b"GIF89a") + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0)
    gif += bytes([0, 0, 0, 255, 255, 255])  # 2-entry global table
    # one literal-coded 2x1 image: min_code 2, codes CLEAR(4) 0 1 END(5)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0) + bytes([2])
    acc = bits = 0
    lzw = bytearray()
    for c in (4, 0, 1, 5):
        acc |= c << bits
        bits += 3
        while bits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        lzw.append(acc & 0xFF)
    img += bytes([len(lzw)]) + bytes(lzw) + b"\x00"
    flood = bytes(gif) + img * 2000 + b"\x3b"
    out = extract_gif_frames(flood, max_frames=16)
    assert out is not None and out["n_frames"] == 16

    huge = bytearray(b"GIF89a") + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0)
    assert extract_gif_frames(bytes(huge) + b"\x3b") is None


@given(st.binary(min_size=0, max_size=400))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_mov_walker_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import extract_mov_mjpeg_frames

    for payload in (junk, b"\x00\x00\x00\x10ftypqt  " + junk,
                    b"\x00\x00\x01\x00moov" + junk):
        out = extract_mov_mjpeg_frames(payload)
        if out is not None:
            assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_mov_walker_survives_mutated_valid_container(cut_pct, flips):
    """Truncations and byte-flips of a VALID planted MOV (lying box sizes,
    corrupted sample tables, offsets past the buffer) must never raise."""
    from nutch_spark.datapipe.mediacodec import extract_mov_mjpeg_frames
    from nutch_spark.plans.datapipe_queries import _planted_mov

    buf = bytearray(_planted_mov(14))
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: len(buf) * cut_pct // 100])
    out = extract_mov_mjpeg_frames(payload)
    if out is not None:
        assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


@given(st.binary(min_size=0, max_size=300))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_aiff_parser_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import parse_aiff

    for payload in (junk, b"FORM" + junk,
                    b"FORM\x00\x00\x01\x00AIFF" + junk,
                    b"FORM\x00\x00\x01\x00AIFC" + junk):
        out = parse_aiff(payload)
        if out is not None:
            assert out["n_samples"] >= 0 and out["sample_rate"] >= 1


def test_gif_walker_bounds_total_composited_pixels():
    """GIF is a decompression amplifier: a large canvas must cap the
    FRAME COUNT so total composited pixels stay under the budget (one
    crafted 4000x4000 animation must not build gigabytes of canvases)."""
    import struct

    from nutch_spark.datapipe.mediacodec import (
        _GIF_PIXEL_BUDGET,
        extract_gif_frames,
    )

    w = h = 2000  # 4 Mpx canvas -> budget allows only 4 frames
    gif = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    gif += bytes([0, 0, 0, 255, 255, 255])
    # one tiny 2x1 sub-rect image per "frame" (cheap to decode, but each
    # frame snapshot is the FULL canvas)
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0) + bytes([2])
    acc = bits = 0
    lzw = bytearray()
    for c in (4, 0, 1, 5):
        acc |= c << bits
        bits += 3
        while bits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        lzw.append(acc & 0xFF)
    img += bytes([len(lzw)]) + bytes(lzw) + b"\x00"
    payload = bytes(gif) + img * 40 + b"\x3b"
    out = extract_gif_frames(payload, max_frames=64)
    assert out is not None
    assert out["n_frames"] == _GIF_PIXEL_BUDGET // (w * h)
    assert sum(len(f) for f in out["frames"]) < 2 * _GIF_PIXEL_BUDGET


def test_gif_walker_rejects_budget_busting_canvas():
    """A canvas whose 2-frame minimum exceeds the pixel budget is
    rejected outright — no max(budget, 2) floor quietly snapshotting two
    64-Mpx canvases from one hostile payload."""
    import struct

    from nutch_spark.datapipe.mediacodec import extract_gif_frames

    huge = bytearray(b"GIF89a") + struct.pack("<HHBBB", 8000, 8000, 0, 0, 0)
    assert extract_gif_frames(bytes(huge) + b"\x3b") is None


# ---------------------------------------------------------------------------
# Round 13: the MOV atom walk and the GIF frame compositor take the same
# hostile web bytes AVI was fuzzed with in r12 — mutation + nesting bombs,
# bounded memory asserted
# ---------------------------------------------------------------------------


def _valid_mov(doc_id: int = 5) -> bytes:
    from nutch_spark.plans.datapipe_queries import _planted_mov

    return _planted_mov(doc_id)


@given(st.binary(max_size=512))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_mov_walker_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import extract_mov_mjpeg_frames

    for payload in (
        junk,
        b"\x00\x00\x00\x14ftyp" + junk,
        b"\x00\x00\x01\x00moov" + junk,
    ):
        out = extract_mov_mjpeg_frames(payload)
        if out is not None:
            assert isinstance(out["frames"], list)
            assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


@given(
    st.integers(min_value=0, max_value=100),   # truncation percentage
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),                       # (offset, new byte) flips
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_mov_walker_survives_mutated_valid_container(cut_pct, flips):
    """Truncations and byte-flips of a VALID planted MOV — lying box
    sizes, corrupted sample tables, offsets past the buffer — must never
    raise, and surviving frames must still be SOI-prefixed slices."""
    from nutch_spark.datapipe.mediacodec import extract_mov_mjpeg_frames

    buf = bytearray(_valid_mov())
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: len(buf) * cut_pct // 100])
    out = extract_mov_mjpeg_frames(payload)
    if out is not None:
        assert all(f[:3] == b"\xff\xd8\xff" for f in out["frames"])


def test_mov_walker_bounds_hostile_floods():
    """A trak flood, an stsz sample-count lie, and a box-nesting bomb must
    hit the walker's caps (64 traks, 100k samples, buffer-clamped offsets)
    — bounded output, no hang, no MemoryError-scale allocation."""
    import struct

    from nutch_spark.datapipe.mediacodec import extract_mov_mjpeg_frames

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    # 200 empty traks: the walker must stop at its trak cap, return None
    # (no JPEG track) rather than walking all of them
    trak = box(b"trak", box(b"tkhd", b"\x00" * 8))
    moov = box(b"moov", trak * 200)
    assert extract_mov_mjpeg_frames(moov + box(b"mdat", b"")) is None

    # stsz CLAIMS 2^31 samples but carries none: count clamps to the
    # actual table bytes, never a [fixed]*2**31 allocation
    base = _valid_mov(5)
    lie = base.replace(
        struct.pack(">III", 0, 0, 2), struct.pack(">III", 0, 0, 0x7FFFFFFF), 1
    )
    out = extract_mov_mjpeg_frames(lie)
    if out is not None:
        assert len(out["frames"]) <= 64

    # nesting bomb: 64 levels of self-titled boxes inside moov
    bomb = b"\x00" * 8
    for _ in range(64):
        bomb = box(b"mdia", bomb)
    deep = box(b"moov", box(b"trak", bomb))
    assert extract_mov_mjpeg_frames(deep + box(b"mdat", b"")) is None

    # max_frames cap holds on a valid container
    out = extract_mov_mjpeg_frames(_valid_mov(8), max_frames=1)
    assert out is not None and len(out["frames"]) <= 1


def _valid_anim_gif(doc_id: int = 13) -> bytes:
    from nutch_spark.plans.datapipe_queries import _planted_animated_gif

    return _planted_animated_gif(doc_id)


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_gif_compositor_survives_mutated_valid_animation(cut_pct, flips):
    """Truncations and byte-flips of a VALID animated GIF — corrupted
    GCE disposal bits, lying local-palette sizes, cut LZW sub-blocks —
    must never raise; surviving frames must be well-formed gray BMPs of
    the declared canvas."""
    from nutch_spark.datapipe.mediacodec import (
        decode_gray_pixels,
        extract_gif_frames,
    )

    buf = bytearray(_valid_anim_gif())
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: max(6, len(buf) * cut_pct // 100)])
    out = extract_gif_frames(payload)
    if out is not None:
        assert len(out["frames"]) <= 64
        for f in out["frames"]:
            dec = decode_gray_pixels(f)
            assert dec is not None
            w, h, _rows = dec
            assert (w, h) == (out["width"], out["height"])


def _gce_gif(frames_spec, *, screen=(2, 1), bg=1):
    """Minimal GIF89a builder for disposal-edge cases: 4-gray global
    table (palette c = gray 60*c), 2-bit LZW literals. frames_spec is
    [(ix, iy, w, h, pixel_indices, gce_or_None)] with gce = (disposal,
    transparent_idx_or_None, delay_cs)."""
    import struct

    sw, sh = screen
    gif = bytearray(b"GIF89a") + struct.pack("<HHBBB", sw, sh, 0x80 | 1, bg, 0)
    for c in range(4):
        gif += bytes([60 * c] * 3)
    for ix, iy, w, h, pixels, gce in frames_spec:
        if gce is not None:
            disp, trans, delay = gce
            gflags = (disp & 7) << 2 | (1 if trans is not None else 0)
            gif += b"\x21\xf9\x04" + bytes([gflags]) + struct.pack("<H", delay)
            gif += bytes([trans if trans is not None else 0, 0])
        gif += b"\x2c" + struct.pack("<HHHHB", ix, iy, w, h, 0)
        # min_code_size 2: clear=4, end=5, codes are 3 bits wide
        codes = [4] + list(pixels) + [5]
        acc = bits = 0
        lzw = bytearray()
        for c in codes:
            acc |= c << bits
            bits += 3
            while bits >= 8:
                lzw.append(acc & 0xFF)
                acc >>= 8
                bits -= 8
        if bits:
            lzw.append(acc & 0xFF)
        gif += bytes([2, len(lzw)]) + bytes(lzw) + b"\x00"
    gif += b"\x3b"
    return bytes(gif)


def test_gif_disposal_edge_cases():
    """Disposal-method corners the r12 compositing test didn't pin:
    disposal 3 on the FIRST frame (no previous to restore — spec-silent,
    must not crash and must keep compositing), disposal values 4-7
    (reserved — treated as leave-in-place), a transparent index pointing
    OUTSIDE the palette, and a sub-rect overflowing the canvas edge
    (clipped, not wrapped)."""
    from nutch_spark.datapipe.mediacodec import (
        decode_gray_pixels,
        extract_gif_frames,
    )

    # disposal 3 on frame 0, then a patch: restore-previous with no
    # previous falls back to the pre-frame canvas (background)
    p = _gce_gif(
        [
            ((0), 0, 2, 1, [2, 2], (3, None, 1)),
            ((0), 0, 1, 1, [3], (1, None, 1)),
        ]
    )
    out = extract_gif_frames(p)
    assert out is not None and out["n_frames"] == 2
    c = [decode_gray_pixels(f)[2] for f in out["frames"]]
    assert c[0] == [[120, 120]]  # frame 0 painted idx 2 = gray 120
    # frame 1: canvas was restored to pre-frame-0 state (bg idx 1 = 60),
    # then the 1x1 patch idx 3 = 180 painted at x=0
    assert c[1] == [[180, 60]]

    # reserved disposal 5: must behave like leave-in-place, not raise
    p = _gce_gif(
        [
            ((0), 0, 2, 1, [2, 3], (5, None, 1)),
            ((0), 0, 1, 1, [0], (1, None, 1)),
        ]
    )
    out = extract_gif_frames(p)
    assert out is not None
    c = [decode_gray_pixels(f)[2] for f in out["frames"]]
    assert c[1] == [[0, 180]]  # frame 0's right pixel survived

    # transparent index beyond the 4-entry palette: nothing matches it,
    # every pixel paints
    p = _gce_gif(
        [
            ((0), 0, 2, 1, [2, 2], (1, 200, 1)),
            ((0), 0, 2, 1, [3, 3], (1, 200, 1)),
        ]
    )
    out = extract_gif_frames(p)
    assert out is not None
    c = [decode_gray_pixels(f)[2] for f in out["frames"]]
    assert c[1] == [[180, 180]]

    # sub-rect hanging off the canvas right edge: the in-canvas part
    # paints, the overflow clips (no wraparound to the next row)
    p = _gce_gif(
        [
            ((0), 0, 2, 1, [2, 2], (1, None, 1)),
            ((1), 0, 2, 1, [3, 3], (1, None, 1)),
        ]
    )
    out = extract_gif_frames(p)
    if out is not None:  # a walker may also reject the lying rect outright
        c = [decode_gray_pixels(f)[2] for f in out["frames"]]
        assert c[1][0][1] == 180 and c[1][0][0] == 120


# ---------------------------------------------------------------------------
# MPEG-1 Layer III side-information walk (round 13): field-exact round-trip
# against the planted generator + the same hostile-bytes posture as the
# Layer I/II decoder
# ---------------------------------------------------------------------------


def test_mp3_sideinfo_field_roundtrip():
    """Every §2.4.1.7 field the generator packs must come back exactly —
    all 16 classes (mono/stereo, CBR/VBR, CRC, ID3, both window modes),
    every frame, granule, and channel."""
    from nutch_spark.datapipe.mediacodec import parse_mp3_sideinfo
    from nutch_spark.plans.datapipe_queries import _planted_mp3_l3

    for k in range(16):
        payload, exp = _planted_mp3_l3(k)
        info = parse_mp3_sideinfo(payload)
        if exp is None:
            assert info is None
            continue
        assert info is not None, k
        assert info["n_frames"] == exp["n_frames"]
        assert info["sample_rate"] == exp["sample_rate"]
        assert info["n_channels"] == exp["n_channels"]
        assert info["vbr"] == exp["vbr"]
        nch = exp["n_channels"]
        for f, fr in enumerate(info["frames"]):
            assert fr["main_data_begin"] == 0
            assert fr["scfsi"] == [[0, 0, 0, 0]] * nch
            gi = 0
            for gr in range(2):
                for ch in range(nch):
                    g = fr["granules"][gi]
                    gi += 1
                    assert g["part2_3_length"] == (100 + 7 * f + 13 * gr + 29 * ch + k) % 4096
                    assert g["big_values"] == (k + 3 * f + gr + ch) % 289
                    assert g["global_gain"] == (k * 11 + f) % 256
                    assert g["scalefac_compress"] == (k + gr) % 16
                    wsf = 1 if (k + f + gr + ch) % 3 == 0 else 0
                    assert g["window_switching"] == wsf
                    if wsf:
                        assert g["block_type"] == 1 + (k + gr) % 3
                        assert g["mixed_block"] == (k + ch) % 2
                        assert g["table_select"] == [(k + i) % 32 for i in range(2)]
                        assert g["subblock_gain"] == [(f + i) % 8 for i in range(3)]
                    else:
                        assert g["block_type"] == 0
                        assert g["table_select"] == [(k + i) % 32 for i in range(3)]
                        assert g["region0_count"] == k % 16
                        assert g["region1_count"] == (f + gr) % 8
                    assert g["preflag"] == (k + f) % 2
                    assert g["scalefac_scale"] == (gr + ch) % 2
                    assert g["count1table_select"] == (k + gr + ch) % 2


def test_mp3_sideinfo_sig_ignores_tags_and_trailing_junk():
    """The stream signature is the ENCODED STREAM's identity: the same
    frames with a different ID3 tag, extra trailing junk, or CRC words
    stripped... the CRC case changes the header's protection bit so sigs
    legitimately differ — but tag/junk variants must collide."""
    from nutch_spark.datapipe.mediacodec import parse_mp3_sideinfo
    from nutch_spark.plans.datapipe_queries import _planted_mp3_l3

    payload, _ = _planted_mp3_l3(3)  # no ID3, no CRC class
    base = parse_mp3_sideinfo(payload)["stream_sig"]
    tagged = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"\x00" * 10 + payload
    assert parse_mp3_sideinfo(tagged)["stream_sig"] == base
    junked = payload + b"TAGgarbage" * 3
    assert parse_mp3_sideinfo(junked)["stream_sig"] == base


def test_mp3_sideinfo_rejects_arbitrary_blobs():
    """The two-consecutive-header gate: sync-looking garbage must not
    produce a frame census (same posture as decode_mpeg_audio_samples)."""
    from nutch_spark.datapipe.mediacodec import parse_mp3_sideinfo

    assert parse_mp3_sideinfo(b"") is None
    assert parse_mp3_sideinfo(b"\xff\xfb" + b"\x55" * 800) is None
    assert parse_mp3_sideinfo(b"I" + b"\xff" * 64) is None
    assert parse_mp3_sideinfo(b"RIFFxxxxWAVE" + b"\x00" * 64) is None


@given(
    st.integers(min_value=0, max_value=100),
    st.lists(st.tuples(st.integers(min_value=0), st.integers(0, 255)),
             max_size=8),
)
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=150,
          deadline=None)
def test_mp3_sideinfo_survives_mutation(cut_pct, flips):
    """Truncations / byte-flips of a valid Layer III stream — lying
    frame lengths, corrupted side info, forbidden block types — must
    return None or a well-formed census, never raise."""
    from nutch_spark.datapipe.mediacodec import parse_mp3_sideinfo
    from nutch_spark.plans.datapipe_queries import _planted_mp3_l3

    buf = bytearray(_planted_mp3_l3(5)[0])
    for off, b in flips:
        buf[off % len(buf)] = b
    payload = bytes(buf[: len(buf) * cut_pct // 100])
    info = parse_mp3_sideinfo(payload)
    if info is not None:
        assert 1 <= info["n_frames"] <= 4096
        assert all(len(f["granules"]) == 2 * info["n_channels"] for f in info["frames"])


@given(st.binary(max_size=400))
@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=200,
          deadline=None)
def test_mp3_sideinfo_never_raises_on_hostile_bytes(junk):
    from nutch_spark.datapipe.mediacodec import parse_mp3_sideinfo

    for payload in (junk, b"\xff\xfb" + junk, b"ID3\x04\x00\x00\x00\x00\x00\x04abcd" + junk):
        info = parse_mp3_sideinfo(payload)
        if info is not None:
            assert info["n_frames"] >= 1
