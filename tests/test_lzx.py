"""LZX decoder (functions/lzx.py) against spec-conformant fixture streams:
literal round trips, uncompressed blocks, a hand-rolled verbatim block
exercising the match / repeated-offset / length-tree paths, E8 undo, and
the CHM MSCompressed wiring across reset blocks. The format is the public
[MS-PATCH]/cabinet-SDK LZX that Tika's ChmParser decompresses."""

from __future__ import annotations

import struct

import pytest

from nutch_spark.functions.lzx import (
    _BLOCK_VERBATIM,
    _BitWriter,
    _position_slots,
    _write_zero_lengths,
    LzxDecoder,
    lzx_compress_block,
    lzx_compress_uncompressed_block,
)


@pytest.mark.parametrize(
    "payload",
    [
        b"hello lzx world " * 10,
        bytes(range(256)) * 4,
        b"a",
        b"\x00" * 1000,
    ],
)
def test_verbatim_literal_round_trip(payload):
    comp = lzx_compress_block(payload, 16)
    assert LzxDecoder(16).decompress(comp, len(payload)) == payload


def test_uncompressed_block_round_trip():
    for payload in (b"raw block bytes", b"odd"):
        comp = lzx_compress_uncompressed_block(payload)
        dec = LzxDecoder(16)
        assert dec.decompress(comp, len(payload)) == payload
        assert dec.R == [1, 1, 1]  # R0-R2 read from the 12-byte prefix


def test_multi_frame_stream_realigns_at_32k():
    payload = bytes((i * 37 + 11) & 0xFF for i in range(0x8000))  # one frame
    comp = lzx_compress_block(payload, 16)
    assert LzxDecoder(16).decompress(comp, len(payload)) == payload


def _write_tree(bw, lens, prev_len):
    """Emit a real pretree + delta-coded path lengths for a fixture tree."""
    import math

    deltas = [(prev_len[i] - lens[i]) % 17 for i in range(len(lens))]
    used = sorted(set(deltas))
    bits = max(1, math.ceil(math.log2(len(used)))) if len(used) > 1 else 1
    pre_lens = [0] * 20
    for s in used:
        pre_lens[s] = bits
    codes = {}
    c = 0
    for ln in range(1, 17):
        c <<= 1
        for sym in range(20):
            if pre_lens[sym] == ln:
                codes[sym] = (ln, c)
                c += 1
    for s in range(20):
        bw.write(pre_lens[s], 4)
    for d in deltas:
        ln, cv = codes[d]
        bw.write(cv, ln)


def test_match_and_repeated_offset_path():
    """Hand-rolled verbatim block: literals at 9 bits, match symbols 256/257
    at 2 bits (Kraft-exact). Symbol 256 = slot 0 (R0, initialized 1) with
    length header 0 → copy 2 bytes from offset 1."""
    expect = b"abbb"
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(_BLOCK_VERBATIM, 3)
    bw.write(len(expect) >> 8, 16)
    bw.write(len(expect) & 0xFF, 8)
    _write_tree(bw, [9] * 256, [0] * 256)
    n2 = 8 * _position_slots(16)
    _write_tree(bw, [2, 2] + [0] * (n2 - 2), [0] * n2)
    _write_zero_lengths(bw, 249)
    for ch in b"ab":  # canonical: len-2 syms get 00/01, literals (10<<7)+b
        bw.write((0b10 << 7) + ch, 9)
    bw.write(0b00, 2)  # match symbol 256
    assert LzxDecoder(16).decompress(bw.bytes(), 4) == expect


def test_e8_translation_undo():
    # encoder-side translated call: E8 at output offset 2, absolute target
    # 0x1000 -> decoder rewrites to rel = 0x1000 - 2
    raw = b"\x90\x90\xe8" + struct.pack("<i", 0x1000) + b"\x90" * 8
    comp = lzx_compress_block(raw, 16, intel_filesize=0x20000)
    out = LzxDecoder(16).decompress(comp, len(raw))
    assert out[:3] == b"\x90\x90\xe8"
    assert struct.unpack_from("<i", out, 3)[0] == 0x1000 - 2
    # out-of-range absolute value is left alone
    raw2 = b"\xe8" + struct.pack("<i", 0x30000) + b"\x90" * 10
    comp2 = lzx_compress_block(raw2, 16, intel_filesize=0x20000)
    assert LzxDecoder(16).decompress(comp2, len(raw2)) == raw2


def test_garbage_and_bounds():
    with pytest.raises(ValueError):
        LzxDecoder(9)
    dec = LzxDecoder(16)
    with pytest.raises(ValueError):
        # type-0 block is invalid
        bw = _BitWriter()
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 16)
        bw.write(4, 8)
        dec.decompress(bw.bytes(), 4)


def test_chm_compressed_section_end_to_end():
    """CHM wiring: LZXC ControlData + ResetTable + Content decompress across
    reset blocks; section-1 HTML and text entries extract like section-0."""
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import build_chm_bytes

    para = "<p>compressed help paragraph %d with enough text to matter</p>"
    big_html = (
        "<html><body>" + "".join(para % i for i in range(900)) + "</body></html>"
    )
    chm = build_chm_bytes(
        {"/intro.txt": b"stored intro text"},
        compressed_files={
            "/main.html": big_html.encode(),
            "/notes.txt": b"compressed plain notes",
        },
    )
    mime, text = extract_text(chm)
    assert mime == "application/vnd.ms-htmlhelp"
    assert "stored intro text" in text
    assert "compressed help paragraph 0" in text
    assert "compressed help paragraph 899" in text  # spans reset block 2
    assert "compressed plain notes" in text


def test_chm_corrupt_compressed_section_degrades():
    from nutch_spark.operators.parse_tail import build_chm_bytes, extract_chm_text

    chm = bytearray(
        build_chm_bytes({}, compressed_files={"/a.txt": b"some text here"})
    )
    # zap the Content blob (tail of the container)
    chm[-40:] = b"\x00" * 40
    mime, text = extract_chm_text(bytes(chm))
    assert mime == "application/vnd.ms-htmlhelp" and text == ""


def test_aligned_offset_block_path():
    """Hand-rolled aligned-offset block: slot-8 match (3 extra bits) takes
    the 0 verbatim + 3 aligned-tree bits split; aligned tree is 8 exact
    3-bit codes. Offset = base[8] + aligned_sym - 2 = 16 → copies 'efg'."""
    import math

    from nutch_spark.functions.lzx import (
        _BLOCK_ALIGNED,
        _EXTRA_BITS,
        _POSITION_BASE,
    )

    assert _EXTRA_BITS[8] == 3 and _POSITION_BASE[8] == 16
    lits = b"abcdefghijklmnopqrst"
    expect = lits + b"efg"
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(_BLOCK_ALIGNED, 3)
    bw.write(len(expect) >> 8, 16)
    bw.write(len(expect) & 0xFF, 8)
    for _ in range(8):
        bw.write(3, 3)  # aligned tree: all length 3
    n_main = 256 + 8 * _position_slots(16)
    main = [9] * 256 + [0] * (n_main - 256)
    main[256] = 2
    main[321] = 2  # slot 8, length header 1 -> match length 3
    _write_tree(bw, main[:256], [0] * 256)
    _write_tree(bw, main[256:], [0] * (n_main - 256))
    _write_zero_lengths(bw, 249)
    for ch in lits:
        bw.write((0b10 << 7) + ch, 9)
    bw.write(0b01, 2)  # canonical len-2 codes: sym 256 -> 00, sym 321 -> 01
    bw.write(2, 3)  # aligned symbol 2
    assert LzxDecoder(16).decompress(bw.bytes(), len(expect)) == expect
