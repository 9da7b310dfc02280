"""AVIF/HEIC pixel decode through the system libavif/libheif (round 15 —
the libwebp ctypes precedent applied to the two formats a modern crawl
sees most after JPEG/PNG/WebP).

Verification strategy mirrors test_webp: (a) LOSSLESS MONOCHROME
round-trips — encode a planted raster through libheif (AV1 via aom for
AVIF, HEVC via x265 for HEIC), decode through BOTH libraries, require
bit-identical pixels (mono + lossless means no YUV matrix touches the
samples); (b) agreement between our pure-struct ispe parse and the
libraries' dimensions; (c) the planted-gradient closed-form dHash from
arithmetic alone; (d) loud — never silently wrong — behavior: corrupt
payloads → None, missing libraries → NotImplementedError, forged
dimension bombs → refused before any codec allocates.
"""

from __future__ import annotations

import pytest

from nutch_spark.datapipe import mediacodec as mc
from nutch_spark.datapipe.mediacodec import (
    decode_avif_rgba,
    decode_gray_pixels,
    decode_heif_gray_pixels,
    decode_heif_rgba,
    dhash64,
    encode_heif_lossless_mono,
    sniff_isobmff,
)

MX, MY, MK, MOD = 50, 59, 44, 47  # the planted-gradient constants


def _grid(k: int):
    return [[(x * MX + y * MY + k * MK) % MOD for x in range(9)] for y in range(8)]


def _big(grid):
    # each grid cell as a flat 8x8 block (72x64): the 9x8 box resample
    # averages each block back to the exact grid value
    return [[grid[y // 8][x // 8] for x in range(72)] for y in range(64)]


def _blob(k: int, codec: str) -> bytes:
    return encode_heif_lossless_mono(72, 64, _big(_grid(k)), codec=codec)


def _dhash_closed_form(k: int) -> int:
    bits = 0
    for y in range(8):
        for x in range(8):
            a = (x * MX + y * MY + k * MK) % MOD
            b = ((x + 1) * MX + y * MY + k * MK) % MOD
            bits = (bits << 1) | (1 if a > b else 0)
    return bits


def test_lossless_mono_round_trip_bit_identical_both_codecs():
    big = _big(_grid(5))
    for codec, brand, dec in (
        ("avif", b"avif", decode_avif_rgba),
        ("heic", b"heic", decode_heif_rgba),
    ):
        blob = encode_heif_lossless_mono(72, 64, big, codec=codec)
        assert blob[4:8] == b"ftyp" and blob[8:12] == brand
        w, h, rgba = dec(blob)
        assert (w, h) == (72, 64)
        for y in range(64):
            for x in range(72):
                g = big[y][x]
                off = 4 * (y * 72 + x)
                assert rgba[off] == rgba[off + 1] == rgba[off + 2] == g


def test_avif_decodes_through_libheif_fallback_too():
    # the same AVIF bytes must decode identically via libheif's AV1 path
    # (the fallback when libavif is absent or of unknown version)
    blob = _blob(3, "avif")
    via_avif = decode_avif_rgba(blob)
    via_heif = decode_heif_rgba(blob)
    assert via_avif is not None and via_heif is not None
    assert via_avif[:2] == via_heif[:2]
    a, b = via_avif[2], via_heif[2]
    # compare RGB only (alpha convention may differ for mono sources)
    assert all(
        a[i] == b[i] for i in range(len(a)) if i % 4 != 3
    )


def test_struct_ispe_parse_agrees_with_libraries():
    for codec in ("avif", "heic"):
        blob = _blob(2, codec)
        info = sniff_isobmff(blob)
        assert info and (info["width"], info["height"]) == (72, 64)


def test_gray_pixels_and_dispatch():
    for codec in ("avif", "heic"):
        blob = _blob(7, codec)
        w, h, gray = decode_heif_gray_pixels(blob)
        assert (w, h) == (72, 64)
        big = _big(_grid(7))
        assert all(
            int(gray[y][x]) == big[y][x] for y in range(64) for x in range(72)
        )
        # magic dispatch routes ftyp image brands here
        got = decode_gray_pixels(blob)
        assert got is not None and (got[0], got[1]) == (72, 64)


def test_dhash_matches_closed_form_all_classes():
    for k in range(16):
        assert dhash64(_blob(k, "avif")) == _dhash_closed_form(k)
        assert dhash64(_blob(k, "heic")) == _dhash_closed_form(k)


def test_corrupt_payloads_are_none_never_raise():
    good = _blob(0, "avif")
    # valid shell (ftyp/meta/ispe pass the gate), mdat replaced by bytes
    # with the OBU forbidden bit set — deterministically undecodable
    i = good.find(b"mdat") + 4
    n = len(good) - i
    corrupt = good[:i] + (b"\xde\xad" * (n // 2 + 1))[:n]
    assert decode_avif_rgba(corrupt) is None
    assert decode_heif_rgba(_heic_corrupt()) is None
    assert dhash64(corrupt) is None
    # truncated container / no ispe
    assert decode_avif_rgba(b"\x00\x00\x00\x18ftypavif" + b"junk" * 10) is None
    assert decode_heif_rgba(b"\x00\x00\x00\x18ftypheic" + b"junk" * 10) is None


def test_video_brands_do_not_route_to_image_decode():
    # MP4/MOV also start with ftyp; only still-picture brands dispatch
    assert decode_gray_pixels(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64) is None
    assert decode_gray_pixels(b"\x00\x00\x00\x18ftypqt  " + b"\x00" * 64) is None


def test_missing_libraries_raise_not_implemented(monkeypatch):
    # a missing codec must be LOUD (NotImplementedError -> NULL columns in
    # the row loops), never a silent None that reads as "corrupt input"
    blob = _blob(1, "heic")
    monkeypatch.setitem(mc._CODEC_CACHE, "heif", None)
    with pytest.raises(NotImplementedError):
        decode_heif_rgba(blob)
    with pytest.raises(NotImplementedError):
        encode_heif_lossless_mono(8, 8, [[0] * 8] * 8)
    # AVIF falls back to libheif when libavif is gone...
    monkeypatch.setitem(mc._CODEC_CACHE, "avif", None)
    with pytest.raises(NotImplementedError):
        decode_avif_rgba(_encoded_avif_cached())


def _heic_corrupt() -> bytes:
    good = _blob(0, "heic")
    i = good.find(b"mdat") + 4
    n = len(good) - i
    return good[:i] + (b"\xde\xad" * (n // 2 + 1))[:n]


_AVIF_CACHE = []


def _encoded_avif_cached():
    if not _AVIF_CACHE:
        _AVIF_CACHE.append(_blob(1, "avif"))
    return _AVIF_CACHE[0]


def test_avif_falls_back_to_libheif_when_libavif_absent(monkeypatch):
    blob = _encoded_avif_cached()
    expect = decode_avif_rgba(blob)[:2]
    monkeypatch.setitem(mc._CODEC_CACHE, "avif", None)
    got = decode_avif_rgba(blob)  # silently served by libheif
    assert got is not None and got[:2] == expect


def test_pixel_bomb_guard_refuses_before_decode():
    blob = _blob(1, "avif")
    assert decode_avif_rgba(blob) is not None
    assert decode_avif_rgba(blob, max_pixels=16) is None
    assert decode_heif_rgba(_blob(1, "heic"), max_pixels=16) is None


def test_module_functions_pickle_after_driver_side_decode():
    # REGRESSION (round 15): the nutch_spark package ships to executor
    # workers BY VALUE (cloudpickle), which serializes referenced module
    # globals — a driver-side decode used to poison every later
    # mapInPandas stage with unpicklable CDLL handles. The codec cache
    # now unpickles EMPTY, so a round-tripped function re-dlopens lazily.
    import cloudpickle

    mc._load_libwebp()
    mc._load_libheif()
    mc._load_libavif()
    assert cloudpickle.loads(cloudpickle.dumps(mc._CODEC_CACHE)) == {}
    fn = cloudpickle.loads(cloudpickle.dumps(mc.dhash64))
    assert fn(_blob(4, "avif")) == _dhash_closed_form(4)


def test_planted_heif_rows_match_oracle_classes():
    # the mm_heif_dhash fixture builder: every non-corrupt row's dhash is
    # the closed form of its class; the corrupt row (id % 32 == 21) is NULL
    import pandas as pd

    from nutch_spark.plans.datapipe_queries import _planted_heif_rows

    pdf = pd.DataFrame({"doc_id": list(range(40))})
    rows = _planted_heif_rows(pdf)
    assert len(rows) == 40
    for r in rows:
        k = r["media_id"] % 16
        if r["media_id"] % 32 == 21:
            assert dhash64(r["payload"]) is None
        else:
            assert dhash64(r["payload"]) == _dhash_closed_form(k)


def test_ico_decodes_largest_entry_via_bmp_and_png():
    # ICO routing is pure reuse of the BMP/PNG decoders; the DIB height
    # doubling (XOR + AND mask) must be halved before the BMP path
    import struct

    from nutch_spark.datapipe.mediacodec import (
        decode_gray_pixels,
        decode_ico_pixels,
    )

    # 4x2 24-bit DIB entry: rows bottom-up, gray values per pixel
    w, h = 4, 2
    px = [[10, 20, 30, 40], [50, 60, 70, 80]]
    raster = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = b"".join(bytes([g, g, g]) for g in px[y])
        raster += row + b"\x00" * ((4 - len(row) % 4) % 4)
    and_mask = b"\x00" * (4 * h)  # 1bpp mask rows padded to 4 bytes
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0, len(raster), 0, 0, 0, 0
    ) + raster + and_mask
    ico = (
        b"\x00\x00\x01\x00\x01\x00"
        + bytes([w, h, 0, 0]) + struct.pack("<HHII", 1, 24, len(dib), 22)
        + dib
    )
    got = decode_ico_pixels(ico)
    assert got is not None
    gw, gh, rows = got
    assert (gw, gh) == (w, h) and [list(r) for r in rows] == px
    # the magic dispatch routes ICO too (and dhash-ability follows)
    assert decode_gray_pixels(ico) is not None
    # hostile: truncated directory / lying offsets yield None
    assert decode_ico_pixels(ico[:10]) is None
    bad = bytearray(ico)
    struct.pack_into("<I", bad, 18, 9999)  # offset past the payload
    assert decode_ico_pixels(bytes(bad)) is None
