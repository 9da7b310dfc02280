"""Audio metadata tags (mediacodec.parse_audio_tags) — pure-byte tests:
every tag system round-trips, encodings decode per the declared byte,
hostile bytes never crash, and the planted query fixtures match the
parser (the pytest-speed twin of the mm_audio_tags oracle row).
"""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nutch_spark.datapipe.mediacodec import parse_audio_tags


def _id3(ver: int, frames: bytes) -> bytes:
    sz = len(frames)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3" + bytes([ver, 0, 0]) + ss + frames


def _v3_frame(fid: str, text: str, enc: int = 0) -> bytes:
    body = (
        bytes([0]) + text.encode("latin-1") if enc == 0 else
        bytes([1]) + text.encode("utf-16") if enc == 1 else
        bytes([2]) + text.encode("utf-16-be") if enc == 2 else
        bytes([3]) + text.encode("utf-8")
    )
    return fid.encode() + struct.pack(">I", len(body)) + b"\x00\x00" + body


def test_id3v23_all_encodings():
    for enc, title in ((0, "Plain"), (1, "BÖM-16"), (2, "BE-16"), (3, "ütf8")):
        t = parse_audio_tags(_id3(3, _v3_frame("TIT2", title, enc)))
        assert t["container"] == "id3" and t["title"] == title, enc


def test_id3v23_first_frame_wins_and_counts():
    frames = (_v3_frame("TIT2", "First") + _v3_frame("TIT2", "Second")
              + _v3_frame("TXXX", "custom"))
    t = parse_audio_tags(_id3(3, frames))
    assert t["title"] == "First" and t["n_tags"] == 3


def test_id3v24_syncsafe_frame_size():
    # a 200-byte body: v2.4 syncsafe (0x01 0x48) != v2.3 plain BE
    body = bytes([3]) + b"x" * 200
    ln = len(body)
    ss = bytes([(ln >> 21) & 0x7F, (ln >> 14) & 0x7F, (ln >> 7) & 0x7F, ln & 0x7F])
    frame = b"TIT2" + ss + b"\x00\x00" + body
    t = parse_audio_tags(_id3(4, frame))
    assert t["title"] == "x" * 200


def test_id3_null_terminator_strips():
    t = parse_audio_tags(_id3(3, _v3_frame("TIT2", "Cut\x00padding")))
    assert t["title"] == "Cut"


def test_id3_header_with_no_frames_is_none():
    assert parse_audio_tags(_id3(3, b"")) is None
    assert parse_audio_tags(_id3(3, b"\x00" * 20)) is None


def test_flac_comment_block_and_absence():
    def vc(vendor, tags):
        out = struct.pack("<I", len(vendor)) + vendor.encode()
        out += struct.pack("<I", len(tags))
        for kv in tags:
            b = kv.encode()
            out += struct.pack("<I", len(b)) + b
        return out

    streaminfo = b"\x00" + b"\x00\x00\x22" + b"\x00" * 34
    block = vc("v", ["TITLE=T", "ARTIST=A", "DATE=2020"])
    pay = b"fLaC" + streaminfo + bytes([0x84]) + len(block).to_bytes(3, "big") + block
    t = parse_audio_tags(pay)
    assert (t["container"], t["title"], t["artist"], t["n_tags"]) == ("flac", "T", "A", 3)
    # last-block STREAMINFO, no comment block → None
    assert parse_audio_tags(b"fLaC" + b"\x80" + b"\x00\x00\x22" + b"\x00" * 34) is None


def test_non_audio_is_none():
    assert parse_audio_tags(b"") is None
    assert parse_audio_tags(b"plain text payload " * 4) is None
    assert parse_audio_tags(b"\x89PNG\r\n\x1a\n" + b"\x00" * 30) is None


def test_planted_fixture_classes_match_parser():
    from nutch_spark.plans.datapipe_queries import _planted_audio_tags

    for k in range(8):
        payload, expected = _planted_audio_tags(k)
        info = parse_audio_tags(payload)
        if expected is None:
            assert info is None, k
            continue
        got = {f: info[f] for f in
               ("container", "title", "artist", "album", "n_tags", "vendor")}
        assert got == expected, k


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=150, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_arbitrary_bytes_never_crash(data):
    parse_audio_tags(data)


@given(st.integers(0, 2**32 - 1), st.integers(0, 80))
@settings(max_examples=120, suppress_health_check=[HealthCheck.too_slow])
def test_fuzz_mutated_id3_never_crash(seed, flip_at):
    pay = bytearray(_id3(3, _v3_frame("TIT2", "t" * (seed % 40 + 1), seed % 2)))
    pay[flip_at % len(pay)] ^= 1 + seed % 255
    info = parse_audio_tags(bytes(pay))
    assert info is None or info["n_tags"] >= 1


def _id3f(ver: int, flags: int, frames: bytes) -> bytes:
    """Like _id3 but with header flags (unsync 0x80 / extended header 0x40)."""
    sz = len(frames)
    ss = bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F])
    return b"ID3" + bytes([ver, 0, flags]) + ss + frames


def _v4_frame(fid: str, body: bytes, flags2: int = 0) -> bytes:
    n = len(body)
    ss = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    return fid.encode() + ss + bytes([0, flags2]) + body


def test_id3v23_extended_header_skipped():
    # ID3v2.3 §3.2: ext size EXCLUDES the 4 size bytes (6 = flags + padding)
    ext = struct.pack(">I", 6) + b"\x00" * 6
    t = parse_audio_tags(_id3f(3, 0x40, ext + _v3_frame("TIT2", "After Ext")))
    assert t is not None and t["title"] == "After Ext" and t["n_tags"] == 1


def test_id3v24_extended_header_skipped():
    # ID3v2.4 §3.2: syncsafe size INCLUDES the whole ext header (min 6)
    ext = bytes([0, 0, 0, 6, 1, 0])
    frame = _v4_frame("TIT2", b"\x03" + "After Ext4".encode())
    t = parse_audio_tags(_id3f(4, 0x40, ext + frame))
    assert t is not None and t["title"] == "After Ext4"


def test_id3v23_whole_tag_unsynchronisation():
    # §5: FF bytes store as FF 00 across the whole v2.3 tag; the UTF-16
    # BOM's FF makes the stored frame differ from the logical one
    plain = _v3_frame("Hi Title", "Hi")[:0] + _v3_frame("TIT2", "Hi", enc=1)
    stored = plain.replace(b"\xff", b"\xff\x00")
    assert stored != plain
    t = parse_audio_tags(_id3f(3, 0x80, stored))
    assert t is not None and t["title"] == "Hi"


def test_id3v24_per_frame_unsync_and_data_length_indicator():
    # v2.4 frame-format flags: 0x02 unsynchronised body, 0x01 leading
    # 4-byte data-length indicator
    body = b"\x01" + "Hé".encode("utf-16")
    stored = body.replace(b"\xff", b"\xff\x00")
    f_unsync = _v4_frame("TIT2", stored, flags2=0x02)
    n = len(b"\x03Artist")
    dli = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])
    f_dli = _v4_frame("TPE1", dli + b"\x03Artist", flags2=0x01)
    t = parse_audio_tags(_id3f(4, 0, f_unsync + f_dli))
    assert t is not None and t["title"] == "Hé" and t["artist"] == "Artist"


def test_id3v24_header_only_unsync_flag():
    # Common real-world v2.4 taggers set ONLY the header unsync bit
    # (0x80) without per-frame 0x02 flags; ID3v2.4 §3.1 says the header
    # bit means all frames are unsynchronised — the stored FF 00 pairs
    # must still decode away
    body = b"\x01" + "Hé".encode("utf-16")
    stored = body.replace(b"\xff", b"\xff\x00")
    assert stored != body
    t = parse_audio_tags(_id3f(4, 0x80, _v4_frame("TIT2", stored)))
    assert t is not None and t["title"] == "Hé"


def test_id3v24_header_unsync_plus_frame_flag_not_double_applied():
    # A spec-compliant writer sets BOTH the header bit and the per-frame
    # flag; de-unsync must run exactly once (OR, not twice)
    body = b"\x01" + "Hé".encode("utf-16")
    stored = body.replace(b"\xff", b"\xff\x00")
    t = parse_audio_tags(_id3f(4, 0x80, _v4_frame("TIT2", stored, flags2=0x02)))
    assert t is not None and t["title"] == "Hé"


def test_id3_extended_header_oversized_is_none():
    # ext size past the tag end: malformed — None, never an exception
    ext = struct.pack(">I", 10_000) + b"\x00" * 2
    assert parse_audio_tags(_id3f(3, 0x40, ext)) is None
