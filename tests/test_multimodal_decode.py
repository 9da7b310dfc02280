"""Image-decode plumbing certificate (round-4 item 8).

The container has no PIL, so production decode stays stubbed — but the
injection point must be proven: a custom decoder passed to
``extract_image_features`` must travel through the mapInPandas closure to the
Arrow workers and see the REAL payload bytes. The fake decoder here parses
the PNG IHDR chunk (width/height are big-endian uint32 at bytes 16-24), so a
correct result certifies end-to-end byte fidelity through the Arrow batch
path, exactly what a PIL-backed decoder would need.
"""

from __future__ import annotations

import struct
import zlib

from nutch_spark.datapipe.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
)


def _png(width: int, height: int) -> bytes:
    """Minimal valid PNG: signature + IHDR + IDAT (1 junk scanline) + IEND."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00" * (width + 1))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_injected_decoder_sees_real_bytes(spark):
    # Defined INSIDE the test so cloudpickle ships it by value — a top-level
    # function in a test module would pickle by reference and fail to import
    # on the Arrow workers (exactly what a user's custom decoder looks like).
    def png_header_decoder(payload: bytes):
        import struct as _s

        assert payload[:8] == b"\x89PNG\r\n\x1a\n", "payload corrupted in transit"
        w, h = _s.unpack(">II", payload[16:24])
        return int(w), int(h), [float(w), float(h)]

    dims = [(120, 40), (7, 300), (256, 256)]
    media = spark.createDataFrame(
        [(i, bytearray(_png(w, h)), "image", {}) for i, (w, h) in enumerate(dims)],
        MEDIA_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in extract_image_features(
            media, batch_partitions=2, decoder=png_header_decoder
        ).collect()
    }
    assert len(out) == 3
    for i, (w, h) in enumerate(dims):
        row = out[i]
        assert (row["width"], row["height"]) == (w, h)
        assert row["feature"] == [float(w), float(h)]
        assert row["n_bytes"] == len(_png(w, h))


def test_default_stub_still_deterministic(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"payload-a"), "image", {})], MEDIA_SCHEMA
    )
    a = extract_image_features(media).collect()[0]
    b = extract_image_features(media).collect()[0]
    assert a == b
    assert 64 <= a["width"] < 256 and 64 <= a["height"] < 256
    assert len(a["feature"]) == 8
