"""Legacy OLE/RTF extraction: CFB container round-trips, [MS-DOC] piece
table, BIFF8 SST (incl. CONTINUE re-flagging), PPT text atoms, RTF tokens."""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nutch_spark.operators.ole import (
    CfbFile,
    build_cfb,
    build_doc_bytes,
    extract_doc_text,
    extract_ole_text,
    extract_ppt_text,
    extract_rtf_text,
    extract_xls_text,
)

# ---------------------------------------------------------------------------
# CFB container
# ---------------------------------------------------------------------------


def test_cfb_round_trip_mini_and_regular_streams():
    streams = {
        "Small": b"tiny payload",  # < 4096 -> mini stream
        "Medium": b"m" * 100,  # several mini sectors
        "Big": b"x" * 5000,  # >= 4096 -> regular sectors
    }
    cfb = CfbFile(build_cfb(streams))
    assert set(cfb.stream_names()) == set(streams)
    for name, v in streams.items():
        assert cfb.read(name) == v
    assert cfb.read("WordDocument") is None


@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=25, deadline=None)
@given(
    small=st.binary(min_size=0, max_size=300),
    seed=st.binary(min_size=1, max_size=64),
    extra=st.integers(min_value=0, max_value=600),
)
def test_cfb_round_trip_any_bytes(small, seed, extra):
    big = (seed * (4096 // len(seed) + 2))[: 4096 + extra]  # >= cutoff
    cfb = CfbFile(build_cfb({"A": small, "B": big}))
    assert cfb.read("a") == small  # case-insensitive lookup
    assert cfb.read("B") == big


def test_cfb_rejects_garbage():
    for bad in (b"", b"not an ole file", b"\xd0\xcf\x11\xe0 short"):
        try:
            CfbFile(bad)
            raised = False
        except ValueError:
            raised = True
        assert raised


def test_cfb_cycle_guard():
    # corrupt the FAT so a chain loops; read must terminate
    data = bytearray(build_cfb({"S": b"y" * 5000}))
    cfb = CfbFile(bytes(data))
    # find the FAT sector and point the stream's chain at itself
    # (sector 0 is the first FAT sector; entries start right after header)
    struct.pack_into("<I", data, 512 + 4 * 10, 10)
    looped = CfbFile(bytes(data))
    looped.read("S")  # must not hang


# ---------------------------------------------------------------------------
# .doc piece table
# ---------------------------------------------------------------------------


def test_doc_two_piece_text():
    doc = build_doc_bytes("hello legacy word format, pieces join here")
    mime, text = extract_ole_text(doc)
    assert mime == "application/msword"
    assert text == "hello legacy word format, pieces join here"


def test_doc_unicode_piece():
    doc = build_doc_bytes("ascii part then unicode café — end", unicode_pieces=True)
    assert extract_doc_text(CfbFile(doc)) == "ascii part then unicode café — end"


def test_doc_control_chars_normalize():
    # \r (paragraph) -> newline; field instruction dropped, result kept
    raw = "line one\rline two \x13 HYPERLINK x \x14shown\x15 tail"
    doc = build_doc_bytes(raw)
    assert extract_doc_text(CfbFile(doc)) == "line one\nline two shown tail"


def test_doc_encrypted_returns_empty():
    doc = bytearray(build_doc_bytes("secret"))
    # set fEncrypted in the FIB inside the WordDocument stream: find it via
    # the reader, flip the bit, rebuild
    cfb = CfbFile(bytes(doc))
    wd = bytearray(cfb.read("WordDocument"))
    struct.pack_into("<H", wd, 0x0A, 0x0200 | 0x0100)
    enc = build_cfb({"WordDocument": bytes(wd), "1Table": cfb.read("1Table")})
    assert extract_doc_text(CfbFile(enc)) == ""


@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=25, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0xFFFD,
                                      blacklist_categories=("Cs",)),
               min_size=0, max_size=400))
def test_doc_roundtrip_any_text(s):
    # printable text survives the piece table bit-for-bit (strip at the edges)
    got = extract_doc_text(CfbFile(build_doc_bytes(s, unicode_pieces=True)))
    # cp1252 first half with '?' replacement mirrors the builder's encoding
    half = len(s) // 2
    expect = (
        s[:half].encode("cp1252", errors="replace").decode("cp1252") + s[half:]
    )
    assert got == expect.strip()


# ---------------------------------------------------------------------------
# .xls BIFF8
# ---------------------------------------------------------------------------


def _biff_record(rec: int, data: bytes) -> bytes:
    return struct.pack("<HH", rec, len(data)) + data


def _sst(strings: list[str], *, split_at: int | None = None) -> bytes:
    """SST record (+ optional CONTINUE splitting the character data of the
    string at index split_at mid-way, with re-flagging)."""
    body = bytearray(struct.pack("<II", len(strings), len(strings)))
    chunks: list[bytearray] = []
    sink = body
    for idx, s in enumerate(strings):
        high = any(ord(c) > 0xFF for c in s)
        flags = 0x01 if high else 0x00
        hdr = struct.pack("<HB", len(s), flags)
        raw = s.encode("utf-16-le" if high else "cp1252")
        if idx == split_at:
            # first half in the current record, rest (and every following
            # string) behind a fresh flags byte in the CONTINUE record
            width = 2 if high else 1
            cut = (len(s) // 2) * width
            sink += hdr + raw[:cut]
            cont = bytearray(bytes([flags]) + raw[cut:])
            chunks.append(cont)
            sink = cont
        else:
            sink += hdr + raw
    out = _biff_record(0x00FC, bytes(body))
    for c in chunks:
        out += _biff_record(0x003C, bytes(c))
    return out


def _bound_sheet(name: str) -> bytes:
    raw = name.encode("cp1252")
    return _biff_record(
        0x0085, struct.pack("<IHBB", 0, 0, len(name), 0) + raw
    )


def test_xls_sst_and_sheet_names():
    wb = _bound_sheet("Sheet1") + _sst(["alpha", "beta row", "café"])
    xls = build_cfb({"Workbook": wb})
    mime, text = extract_ole_text(xls)
    assert mime == "application/vnd.ms-excel"
    assert text.splitlines() == ["Sheet1", "alpha", "beta row", "café"]


def test_xls_sst_continue_split():
    wb = _sst(["first string", "split right here", "tail"], split_at=1)
    text = extract_xls_text(CfbFile(build_cfb({"Workbook": wb})))
    assert text.splitlines() == ["first string", "split right here", "tail"]


def test_xls_unicode_string_and_rich_runs():
    # rich-text string: 2 format runs appended after the chars; must be
    # skipped so the following string parses
    s = "styled"
    body = struct.pack("<II", 2, 2)
    body += struct.pack("<HB", len(s), 0x08) + struct.pack("<H", 2)
    body += s.encode("cp1252") + b"\x00" * 8  # 2 runs * 4 bytes
    body += struct.pack("<HB", 4, 0x01) + "über".encode("utf-16-le")
    wb = _biff_record(0x00FC, body)
    text = extract_xls_text(CfbFile(build_cfb({"Workbook": wb})))
    assert text.splitlines() == ["styled", "über"]


def test_xls_encrypted_returns_empty():
    wb = _biff_record(0x002F, b"\x01\x00") + _sst(["hidden"])
    assert extract_xls_text(CfbFile(build_cfb({"Workbook": wb}))) == ""


# ---------------------------------------------------------------------------
# .ppt text atoms
# ---------------------------------------------------------------------------


def _ppt_atom(rtype: int, payload: bytes, ver: int = 0) -> bytes:
    return struct.pack("<HHI", ver, rtype, len(payload)) + payload


def test_ppt_text_atoms():
    slide = _ppt_atom(0x0FA0, "title chars".encode("utf-16-le"))
    slide += _ppt_atom(0x0FA8, b"body bytes\rsecond line")
    container = _ppt_atom(0x03EE, slide, ver=0x0F)  # slide container
    ppt = build_cfb({"PowerPoint Document": container})
    mime, text = extract_ole_text(ppt)
    assert mime == "application/vnd.ms-powerpoint"
    assert text.splitlines() == ["title chars", "body bytes", "second line"]


def test_unknown_ole_storage():
    blob = build_cfb({"SomethingElse": b"opaque"})
    assert extract_ole_text(blob) == ("application/x-ole-storage", "")


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------


def test_rtf_basic_text_and_escapes():
    rtf = (
        rb"{\rtf1\ansi{\fonttbl{\f0 Calibri;}}"
        rb"{\colortbl;\red0\green0\blue0;}"
        rb"\f0\fs22 Hello \'e9t\'e9 " + rb"\u8212? dash\par second line\tab x}"
    )
    text = extract_rtf_text(rtf)
    assert text.splitlines()[0] == "Hello été — dash"
    assert text.splitlines()[1] == "second line\tx"


def test_rtf_skips_destinations_and_handles_uc():
    rtf = (
        rb"{\rtf1{\*\generator Acme 1.0;}{\info{\title secret}}"
        rb"\uc2" + rb"\u1055??visible}"
    )
    text = extract_rtf_text(rtf)
    assert "Acme" not in text and "secret" not in text
    assert text == "Пvisible"


def test_rtf_field_instruction_hidden():
    rtf = (
        rb"{\rtf1 before {\field{\*\fldinst HYPERLINK http://x}"
        rb"{\fldrslt shown}} after}"
    )
    assert extract_rtf_text(rtf) == "before shown after"


# ---------------------------------------------------------------------------
# magic dispatch via parse_binary.extract_text
# ---------------------------------------------------------------------------


def test_dispatch_doc_and_rtf():
    from nutch_spark.operators.parse_binary import extract_text

    assert extract_text(build_doc_bytes("legacy doc body")) == (
        "application/msword",
        "legacy doc body",
    )
    assert extract_text(rb"{\rtf1 rtf body\par}") == (
        "application/rtf",
        "rtf body",
    )


def test_cfb_v4_4096_byte_sectors():
    # v4: sector #n begins at (n+1)*4096 — the header occupies a FULL
    # first sector ([MS-CFB] 2.2); regression for the 512-offset bug
    streams = {"Mini": b"small", "Huge": b"z" * 9000}
    data = build_cfb(streams, v4=True)
    cfb = CfbFile(data)
    assert cfb.sector_size == 4096
    assert cfb.read("Mini") == b"small"
    assert cfb.read("Huge") == streams["Huge"]


# ---------------------------------------------------------------------------
# hostile-input fuzz: a crawler's parser must never raise, whatever the bytes
# ---------------------------------------------------------------------------


@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=60, deadline=None)
@given(
    prefix=st.sampled_from(
        [b"", b"%PDF-", b"PK\x03\x04",
         b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", b"{\\rtf1 "]
    ),
    data=st.binary(max_size=2048),
)
def test_extract_text_never_raises_on_fuzz(prefix, data):
    from nutch_spark.operators.parse_binary import extract_text

    mime, text = extract_text(prefix + data)
    assert isinstance(mime, str) and isinstance(text, str)


@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=40, deadline=None)
@given(
    name=st.sampled_from(["WordDocument", "Workbook", "PowerPoint Document"]),
    data=st.binary(max_size=2048),
    extra=st.binary(max_size=200),
)
def test_ole_stream_fuzz_never_raises(name, data, extra):
    streams = {name: data}
    if name == "WordDocument":
        streams["1Table"] = extra
    mime, text = extract_ole_text(build_cfb(streams))
    assert isinstance(mime, str) and isinstance(text, str)


@settings(suppress_health_check=[HealthCheck.too_slow], max_examples=40, deadline=None)
@given(fib=st.binary(max_size=1024), table=st.binary(max_size=512))
def test_doc_fuzzed_fib_never_raises(fib, table):
    # wIdent valid, every other FIB field (flags, fcClx/lcbClx, ccpText)
    # attacker-controlled, piece table pointing into fuzzed bytes
    wd = b"\xec\xa5" + fib
    wd = wd + b"\x00" * max(0, 0x200 - len(wd))
    mime, text = extract_ole_text(
        build_cfb({"WordDocument": wd, "1Table": table, "0Table": table})
    )
    assert isinstance(text, str)
