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


def _media(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary, "
        "meta map<string,string>"
    )


def test_resize_images_plumbing_and_injection(spark):
    from nutch_spark.datapipe.multimodal import resize_images

    media = _media(
        spark,
        [
            (1, "image", b"\xff\xd8\xffjpegbytes", {}),
            (2, "audio", b"wavbytes", {}),  # filtered out
        ],
    )
    out = resize_images(media, 224, 224).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (224, 224)
    assert r["resized"].startswith(b"resized:224x224:")
    assert r["src_width"] >= 64  # from the decode stub

    # injectable real resizer slots in without plan/schema changes
    def fake_resizer(payload, w, h):
        return 640, 480, b"REAL" + payload[:4]

    out2 = resize_images(media, 32, 32, resizer=fake_resizer).collect()[0]
    assert (out2["src_width"], out2["src_height"]) == (640, 480)
    assert out2["resized"] == b"REAL\xff\xd8\xffj"


def test_extract_audio_features_deterministic(spark):
    from nutch_spark.datapipe.multimodal import extract_audio_features

    media = _media(
        spark,
        [
            (1, "audio", b"first clip", {}),
            (2, "audio", b"second clip", {}),
            (3, "image", b"not audio", {}),
        ],
    )
    a = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert set(a) == {1, 2}
    assert a[1]["sample_rate"] in (8000, 16000, 22050, 44100)
    assert len(a[1]["mfcc"]) == 13
    assert a[1]["duration_s"] > 0
    # determinism: same bytes, same features
    b = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert a[1]["mfcc"] == b[1]["mfcc"]

    def fake_decoder(payload):
        return 48000, 1.5, [0.0] * 13

    c = extract_audio_features(media, decoder=fake_decoder).collect()[0]
    assert c["sample_rate"] == 48000 and c["duration_s"] == 1.5


def test_null_payload_yields_null_features(spark):
    """Missing media must yield NULL feature columns — never fabricated
    values from decoding b''."""
    from nutch_spark.datapipe.multimodal import (
        extract_audio_features,
        extract_image_features,
        resize_images,
    )

    media = _media(
        spark,
        [(1, "image", None, {}), (2, "audio", None, {}), (3, "image", b"x", {})],
    )
    img = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert img[1]["feature"] is None and img[1]["sha1"] is None
    assert img[3]["feature"] is not None

    rs = {r["media_id"]: r for r in resize_images(media, 64, 64).collect()}
    assert rs[1]["resized"] is None and rs[3]["resized"] is not None

    au = extract_audio_features(media).collect()[0]
    assert au["mfcc"] is None and au["sample_rate"] is None
