"""Ogg container identity (RFC 3533 page walk) — pure-byte tests, no Spark.

The CRC is anchored to a PUBLIC known-answer value (the catalogued
CRC-32/POSIX check value shares Ogg's generator/direction/init and differs
only by the final XOR), cross-checked against a direct bit-by-bit polynomial
division written independently from the spec, and the parser is exercised on
hand-built pages: every codec mapping, packets spanning pages, repagination
invariance of the stream signature, and hostile-bytes fuzz.
"""

from __future__ import annotations

import hashlib
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nutch_spark.datapipe.mediacodec import (
    _ogg_crc_raw,
    ogg_page_crc,
    parse_ogg_info,
)

# ---------------------------------------------------------------------------
# page builder (test-local, independent of the query fixtures)
# ---------------------------------------------------------------------------


def mk_page(serial, seq, granule, chunks, *, bos=False, eos=False, cont=False,
            bad_crc=False):
    """One Ogg page. ``chunks`` is [(bytes, terminated)] — an unterminated
    chunk (packet continues on the next page) must be a 255-multiple so its
    lacing run is all-255 per RFC 3533 §6."""
    lacing: list[int] = []
    body = b""
    for data, term in chunks:
        body += data
        q, r = divmod(len(data), 255)
        lacing += [255] * q
        if term:
            lacing.append(r)
        else:
            assert r == 0, "unterminated chunk must be a 255-multiple"
    htype = (1 if cont else 0) | (2 if bos else 0) | (4 if eos else 0)
    hdr = (
        b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
        + struct.pack("<I", serial) + struct.pack("<I", seq)
        + b"\x00" * 4 + bytes([len(lacing)]) + bytes(lacing)
    )
    page = hdr + body
    crc = ogg_page_crc(page) ^ (1 if bad_crc else 0)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def vorbis_id(nch, rate):
    return (b"\x01vorbis" + struct.pack("<I", 0) + bytes([nch])
            + struct.pack("<I", rate) + b"\x00" * 9)


def opus_id(nch, pre_skip):
    return (b"OpusHead" + bytes([1, nch]) + struct.pack("<H", pre_skip)
            + struct.pack("<I", 48000) + b"\x00" * 3)


def packet_sig(packets):
    sig = hashlib.md5()
    for pkt in packets:
        sig.update(len(pkt).to_bytes(8, "little"))
        sig.update(pkt)
    return int(sig.hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# CRC: public known-answer + independent bitwise division
# ---------------------------------------------------------------------------


def test_crc_known_answer_posix():
    # CRC catalogue: CRC-32/POSIX check('123456789') = 0x765E7680 with
    # poly 0x04C11DB7, init 0, refin/refout false, xorout 0xFFFFFFFF.
    # Ogg's page CRC is the same machine without the final XOR.
    assert _ogg_crc_raw(0, b"123456789") == 0x765E7680 ^ 0xFFFFFFFF


def _bitwise_crc(data: bytes) -> int:
    """Direct per-bit polynomial division from RFC 3533 §6 (no table)."""
    crc = 0
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000 else crc << 1) & 0xFFFFFFFF
    return crc


@given(st.binary(max_size=300))
@settings(max_examples=100)
def test_crc_table_matches_bitwise_division(data):
    assert _ogg_crc_raw(0, data) == _bitwise_crc(data)


# ---------------------------------------------------------------------------
# field round-trips per codec
# ---------------------------------------------------------------------------


def test_vorbis_census_and_duration():
    idp = vorbis_id(1, 44100)
    p1, p2, p3 = b"A" * 300, b"B" * 40, b"C" * 20
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 88200, [(p1, True), (p2, True)])
        + mk_page(7, 2, 132300, [(p3, True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "vorbis"
    assert info["sample_rate"] == 44100 and info["n_channels"] == 1
    assert info["n_pages"] == 3 and info["n_packets"] == 4
    assert info["n_streams"] == 1
    assert info["duration_ms"] == 3000  # 132300 samples @ 44100
    assert info["stream_sig"] == packet_sig([idp, p1, p2, p3])
    assert info["crc_ok"] is True and info["eos"] is True


def test_opus_preskip_duration():
    idp = opus_id(2, 312)
    pages = (
        mk_page(9, 0, 0, [(idp, True)], bos=True)
        + mk_page(9, 1, 48312, [(b"opusdata", True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000 and info["n_channels"] == 2
    # granule ticks at 48 kHz and includes pre_skip (RFC 7845 §4)
    assert info["duration_ms"] == (48312 - 312) * 1000 // 48000 == 1000


def test_ogg_flac_reads_streaminfo():
    # Ogg-FLAC mapping: 0x7F 'FLAC' 1.0, n_headers, then raw fLaC stream
    streaminfo = (
        b"fLaC" + bytes([0x80]) + b"\x00\x00\x22"
        + b"\x00" * 10
        + int((22050 << 44) | (0 << 41) | (15 << 36) | 44100).to_bytes(8, "big")
        + b"\x00" * 16
    )
    idp = b"\x7fFLAC" + bytes([1, 0]) + struct.pack(">H", 1) + streaminfo
    pages = (
        mk_page(3, 0, 0, [(idp, True)], bos=True)
        + mk_page(3, 1, 44100, [(b"flacframe", True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "flac"
    assert info["sample_rate"] == 22050 and info["n_channels"] == 1
    assert info["duration_ms"] == 2000


def test_speex_header_facts():
    idp = (b"Speex   " + b"v" * 20 + struct.pack("<I", 1)
           + struct.pack("<I", 80) + struct.pack("<I", 16000)
           + struct.pack("<I", 1) + struct.pack("<I", 4)
           + struct.pack("<I", 2) + b"\x00" * 8)
    pages = (
        mk_page(5, 0, 0, [(idp, True)], bos=True)
        + mk_page(5, 1, 8000, [(b"spx", True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "speex"
    assert info["sample_rate"] == 16000 and info["n_channels"] == 2
    assert info["duration_ms"] == 500


def test_theora_video_no_audio_facts():
    # short/truncated id header: codec recognized, no frame-clock facts
    idp = b"\x80theora" + b"\x03\x02\x01" + b"\x00" * 27
    pages = (
        mk_page(4, 0, 0, [(idp, True)], bos=True)
        + mk_page(4, 1, 100, [(b"frame", True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "theora"
    assert info["sample_rate"] is None and info["n_channels"] is None
    assert info["duration_ms"] is None  # no parseable FRN/FRD/KFGSHIFT


def test_theora_duration_from_kfgshift_granule():
    # full 42-byte id header: FRN=25/FRD=1, KFGSHIFT=4; granule
    # (7<<4)|3 = 10 frames at 25 fps → 400 ms (Theora I §5.1)
    idp = (b"\x80theora" + bytes([3, 2, 1])
           + struct.pack(">HH", 40, 30)
           + b"\x00\x02\x80" + b"\x00\x01\xe0" + bytes([0, 0])
           + struct.pack(">II", 25, 1)
           + b"\x00" * 6 + bytes([0]) + b"\x00" * 3
           + struct.pack(">H", 4 << 5))
    pages = (
        mk_page(4, 0, 0, [(idp, True)], bos=True)
        + mk_page(4, 1, (7 << 4) | 3, [(b"frame", True)], eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["codec"] == "theora"
    assert info["duration_ms"] == 400
    assert info["sample_rate"] is None and info["n_channels"] is None


def test_multi_stream_primary_is_first_audio():
    sk = mk_page(1, 0, 0, [(b"fishead\x00" + b"\x00" * 20, True)], bos=True)
    op = (
        mk_page(9, 0, 0, [(opus_id(1, 0), True)], bos=True)
        + mk_page(9, 1, 96000, [(b"x", True)], eos=True)
    )
    info = parse_ogg_info(sk + op)
    assert info["n_streams"] == 2
    assert info["codec"] == "opus"  # first RECOGNIZED AUDIO wins
    assert info["n_packets"] == 2   # census follows the primary stream


# ---------------------------------------------------------------------------
# signature invariances
# ---------------------------------------------------------------------------


def test_repagination_keeps_stream_sig():
    idp = vorbis_id(2, 48000)
    p1, p2 = b"D" * 510, b"E" * 33
    one = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 96000, [(p1, True), (p2, True)], eos=True)
    )
    # same packets, p1 split across two pages (255-lacing continuation)
    two = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, -1, [(p1[:255], False)])
        + mk_page(7, 2, 96000, [(p1[255:], True), (p2, True)], cont=True, eos=True)
    )
    a, b = parse_ogg_info(one), parse_ogg_info(two)
    assert a["stream_sig"] == b["stream_sig"] == packet_sig([idp, p1, p2])
    assert (a["n_pages"], b["n_pages"]) == (2, 3)
    assert a["n_packets"] == b["n_packets"] == 3
    assert a["duration_ms"] == b["duration_ms"] == 2000


def test_trailing_junk_ignored():
    idp = vorbis_id(1, 32000)
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 32000, [(b"z", True)], eos=True)
    )
    clean = parse_ogg_info(pages)
    dirty = parse_ogg_info(pages + b"\xde\xad\xbe\xef" * 16)
    assert dirty == clean


def test_interleaved_streams_sign_independently():
    # two audio streams with interleaved pages: primary (first BOS) census
    # is unaffected by the other stream's pages between its own
    v_id, o_id = vorbis_id(1, 44100), opus_id(1, 0)
    vp, op = b"V" * 99, b"O" * 77
    inter = (
        mk_page(7, 0, 0, [(v_id, True)], bos=True)
        + mk_page(9, 0, 0, [(o_id, True)], bos=True)
        + mk_page(9, 1, 48000, [(op, True)], eos=True)
        + mk_page(7, 1, 44100, [(vp, True)], eos=True)
    )
    info = parse_ogg_info(inter)
    assert info["codec"] == "vorbis" and info["n_streams"] == 2
    assert info["stream_sig"] == packet_sig([v_id, vp])


# ---------------------------------------------------------------------------
# hostile bytes
# ---------------------------------------------------------------------------


def test_bad_crc_keeps_consistent_prefix():
    idp = vorbis_id(1, 44100)
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"q", True)], bad_crc=True)
    )
    info = parse_ogg_info(pages)
    assert info["n_pages"] == 1 and info["crc_ok"] is False
    assert info["eos"] is False and info["duration_ms"] == 0


def test_bad_first_page_is_none():
    idp = vorbis_id(1, 44100)
    assert parse_ogg_info(mk_page(7, 0, 0, [(idp, True)], bos=True,
                                  bad_crc=True)) is None
    # 'OggS' appearing in junk fails the page-0 CRC gate
    assert parse_ogg_info(b"OggS" + b"\x00" * 60) is None
    assert parse_ogg_info(b"junk" * 20) is None
    assert parse_ogg_info(b"") is None


def test_truncation_keeps_prefix():
    idp = vorbis_id(1, 44100)
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"W" * 200, True)], eos=True)
    )
    info = parse_ogg_info(pages[:-10])
    assert info["n_pages"] == 1 and info["eos"] is False
    assert info["crc_ok"] is True  # truncation is not corruption


def test_orphan_continued_fragment_dropped():
    idp = vorbis_id(1, 44100)
    # page 1 claims continuation but page 0 ended at a packet boundary:
    # the orphan run (through its terminator) is dropped, the rest kept
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"orphan", True), (b"kept", True)],
                  cont=True, eos=True)
    )
    info = parse_ogg_info(pages)
    assert info["n_packets"] == 2  # id packet + 'kept'
    assert info["stream_sig"] == packet_sig([idp, b"kept"])


def test_unterminated_final_packet_not_counted():
    idp = vorbis_id(1, 44100)
    pages = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, -1, [(b"x" * 255, False)])  # never terminated
    )
    info = parse_ogg_info(pages)
    assert info["n_packets"] == 1
    assert info["stream_sig"] == packet_sig([idp])


def test_max_pages_cap():
    idp = vorbis_id(1, 44100)
    pages = mk_page(7, 0, 0, [(idp, True)], bos=True)
    for i in range(1, 40):
        pages += mk_page(7, i, i * 100, [(b"d", True)])
    info = parse_ogg_info(pages, max_pages=10)
    assert info["n_pages"] == 10


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_arbitrary_bytes_never_crash(data):
    info = parse_ogg_info(data)
    assert info is None or info["n_pages"] >= 1


@given(st.integers(0, 2**32 - 1), st.integers(0, 120), st.binary(max_size=8))
@settings(max_examples=120, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_mutated_valid_stream_never_crash(seed, flip_at, junk):
    idp = vorbis_id(1 + seed % 2, 44100)
    pages = bytearray(
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"P" * (seed % 300), True)], eos=True)
        + junk
    )
    pages[flip_at % len(pages)] ^= 1 + seed % 255
    info = parse_ogg_info(bytes(pages))
    assert info is None or (info["n_pages"] >= 1 and info["n_packets"] >= 0)


def test_planted_fixture_classes_match_parser():
    """Every mm_ogg_identity fixture class: the parser's output equals the
    generator's CLOSED-FORM expectations (the oracle's CASE literals) —
    the pytest-speed twin of the driver's cross-engine row."""
    from nutch_spark.plans.datapipe_queries import _planted_ogg

    for k in range(12):
        payload, expected = _planted_ogg(k)
        info = parse_ogg_info(payload)
        if expected is None:
            assert info is None, k
            continue
        got = {
            "codec": info["codec"], "n_streams": info["n_streams"],
            "n_pages": info["n_pages"], "n_packets": info["n_packets"],
            "sample_rate": info["sample_rate"],
            "n_channels": info["n_channels"],
            "duration_ms": info["duration_ms"],
            "stream_sig": info["stream_sig"],
            "crc_ok": info["crc_ok"], "eos": info["eos"],
        }
        assert got == expected, k


def test_headless_midstream_capture_rejected():
    # a CRC-valid NON-BOS first page (mid-stream capture) must return None
    # even when a later chained stream begins properly — otherwise the row
    # would mix the headless stream's page count with the chain's identity
    idp = vorbis_id(1, 44100)
    headless = mk_page(3, 9, 44100, [(b"mid-stream data", True)])
    chained = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"x", True)], eos=True)
    )
    assert parse_ogg_info(headless + chained) is None
    assert parse_ogg_info(chained) is not None  # sanity


def test_theora_pre321_granule_is_frame_index():
    # bitstream 3.2.0: the granule encodes the LAST FRAME'S INDEX, so the
    # frame count is one higher than 3.2.1's reading (libtheora
    # th_granule_frame version branch)
    def theora_id(vrev):
        return (b"\x80theora" + bytes([3, 2, vrev])
                + struct.pack(">HH", 40, 30)
                + b"\x00\x02\x80" + b"\x00\x01\xe0" + bytes([0, 0])
                + struct.pack(">II", 25, 1)
                + b"\x00" * 6 + bytes([0]) + b"\x00" * 3
                + struct.pack(">H", 4 << 5))

    def dur(vrev):
        pages = (
            mk_page(4, 0, 0, [(theora_id(vrev), True)], bos=True)
            + mk_page(4, 1, (7 << 4) | 3, [(b"frame", True)], eos=True)
        )
        return parse_ogg_info(pages)["duration_ms"]

    assert dur(1) == 400   # 3.2.1: granule == frame count (10 @ 25 fps)
    assert dur(0) == 440   # 3.2.0: granule == last index (11 frames)


def test_stale_fragment_discarded_without_continued_flag():
    """Round-14 ADVICE fix: page 1 ends mid-packet; page 2 does NOT set the
    continued flag, so the pending fragment can never complete — it must be
    DISCARDED (RFC 3533 packet-boundary rules), never glued onto page 2's
    unrelated packet (which would skew n_packets and stream_sig)."""
    idp = vorbis_id(2, 44100)
    frag = b"\xaa" * 255  # unterminated 255-multiple lacing run
    solo = b"standalone"
    raw = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, -1, [(frag, False)])
        + mk_page(7, 2, 44100, [(solo, True)], eos=True)  # cont NOT set
    )
    info = parse_ogg_info(raw)
    assert info["n_packets"] == 2
    assert info["stream_sig"] == packet_sig([idp, solo])


def test_page_sequence_gap_ends_census():
    """Round-14 ADVICE fix: a page_sequence_no gap (RFC 3533 §6 loss
    detection) ends the census at the consistent prefix, like a bad CRC —
    packets past lost pages have unknowable identity."""
    idp = vorbis_id(2, 44100)
    raw = (
        mk_page(7, 0, 0, [(idp, True)], bos=True)
        + mk_page(7, 1, 44100, [(b"pkt1", True)])
        + mk_page(7, 3, 88200, [(b"pkt2", True)], eos=True)  # seq 2 lost
    )
    info = parse_ogg_info(raw)
    assert info["n_pages"] == 2 and info["crc_ok"] is False
    assert info["n_packets"] == 2 and info["eos"] is False
    assert info["stream_sig"] == packet_sig([idp, b"pkt1"])
