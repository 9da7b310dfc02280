"""WebP pixel decode through the system libwebp (round 14 — the first
codec-library decode wired through the media seams).

Verification strategy: libwebp is the authoritative public implementation,
so correctness is pinned by (a) LOSSLESS round-trips — encode a planted
raster, decode it, require bit-identical pixels; (b) agreement between the
pure-struct container header parse (sniff_image_dimensions) and the
library's own dimensions; (c) the planted-gradient closed-form dHash,
computed from arithmetic alone; (d) loud — never silently wrong — behavior
for corrupt payloads (None) and a missing library (NotImplementedError).
"""

from __future__ import annotations

import pytest

from nutch_spark.datapipe import mediacodec as mc
from nutch_spark.datapipe.mediacodec import (
    decode_gray_pixels,
    decode_webp_gray_pixels,
    decode_webp_rgba,
    dhash64,
    encode_webp_lossless_rgba,
    sniff_image_dimensions,
)

MX, MY, MK, MOD = 50, 59, 44, 47  # the planted-gradient constants


def _grid(k: int, w: int = 9, h: int = 8):
    return [[(x * MX + y * MY + k * MK) % MOD for x in range(w)] for y in range(h)]


def _rgba(grid) -> bytes:
    return bytes(c for row in grid for g in row for c in (g, g, g, 255))


def _webp(k: int, w: int = 9, h: int = 8) -> bytes:
    return encode_webp_lossless_rgba(w, h, _rgba(_grid(k, w, h)))


def _dhash_closed_form(k: int) -> int:
    bits = 0
    for y in range(8):
        for x in range(8):
            a = (x * MX + y * MY + k * MK) % MOD
            b = ((x + 1) * MX + y * MY + k * MK) % MOD
            bits = (bits << 1) | (1 if a > b else 0)
    return bits


def test_lossless_round_trip_bit_identical():
    grid = _grid(5)
    blob = encode_webp_lossless_rgba(9, 8, _rgba(grid))
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    w, h, rgba = decode_webp_rgba(blob)
    assert (w, h) == (9, 8)
    assert rgba == _rgba(grid)  # lossless: pixels ARE the planted raster


def test_struct_header_parse_agrees_with_library():
    # the pure-struct sniff (no codec) must agree with libwebp's own dims
    for w, h in [(9, 8), (1, 1), (64, 3), (17, 200)]:
        blob = _webp(2, w, h)
        assert sniff_image_dimensions(blob) == ("webp", w, h)
        lw, lh, _ = decode_webp_rgba(blob)
        assert (lw, lh) == (w, h)


def test_gray_pixels_itu601_luma():
    grid = _grid(7)
    w, h, gray = decode_webp_gray_pixels(_webp(7))
    # r=g=b=g ⇒ (299g+587g+114g)//1000 == g exactly
    assert (w, h) == (9, 8) and gray.tolist() == grid


def test_decode_gray_pixels_dispatches_webp():
    grid = _grid(11)
    out = decode_gray_pixels(_webp(11))
    assert out is not None
    w, h, rows = out
    assert rows == grid  # list form (as_array=False)
    import numpy as np

    w, h, arr = decode_gray_pixels(_webp(11), as_array=True)
    assert isinstance(arr, np.ndarray) and arr.tolist() == grid


def test_dhash_matches_closed_form_and_other_containers():
    # the strongest cross-format check: the SAME gradient through WebP and
    # through the from-spec BMP path must produce the SAME dHash, equal to
    # the arithmetic closed form
    from nutch_spark.plans.datapipe_queries import _planted_bmp, _planted_grid

    for k in (0, 3, 9, 15):
        want = _dhash_closed_form(k)
        assert dhash64(_webp(k)) == want
        assert dhash64(_planted_bmp(_planted_grid(k))) == want


def test_corrupt_webp_is_none_never_raises():
    assert decode_webp_rgba(b"RIFFxxxxWEBPVP8 corrupt-keyframe-bitstream") is None
    assert decode_webp_gray_pixels(b"RIFF\x00\x00\x00\x00WEBPVP8L\x00\x00\x00\x00junkjunkjunkjunk") is None
    assert decode_gray_pixels(b"RIFFxxxxWEBPVP8 corrupt") is None
    assert dhash64(b"RIFFxxxxWEBPVP8 corrupt") is None


def test_missing_libwebp_raises_not_implemented(monkeypatch):
    # a missing codec must be LOUD (NotImplementedError -> NULL columns in
    # the row loops), never a silent None that reads as "corrupt input"
    monkeypatch.setitem(mc._CODEC_CACHE, "webp", None)
    blob_header = b"RIFF\x28\x00\x00\x00WEBPVP8L\x1c\x00\x00\x00\x2f" + b"\x00" * 20
    with pytest.raises(NotImplementedError):
        decode_webp_rgba(blob_header)
    with pytest.raises(NotImplementedError):
        encode_webp_lossless_rgba(1, 1, b"\x00\x00\x00\xff")


def test_planted_webp_rows_match_oracle_classes():
    # the mm_webp_dhash fixture builder: every non-corrupt row's dhash is
    # the closed form of its class; the corrupt row (id % 32 == 21) is NULL
    import pandas as pd

    from nutch_spark.plans.datapipe_queries import _planted_webp_rows

    pdf = pd.DataFrame({"doc_id": list(range(40))})
    rows = _planted_webp_rows(pdf)
    assert len(rows) == 40
    for r in rows:
        k = r["media_id"] % 16
        if r["media_id"] % 32 == 21:
            assert dhash64(r["payload"]) is None
        else:
            assert dhash64(r["payload"]) == _dhash_closed_form(k)


def test_pixel_bomb_guard():
    # a real (tiny) encode decodes fine under the cap; the same payload
    # with a max_pixels below its raster is refused as None
    blob = _webp(1)
    assert decode_webp_rgba(blob) is not None
    assert decode_webp_rgba(blob, max_pixels=16) is None
