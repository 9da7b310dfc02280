"""Stdlib-only media header codecs: image dimensions from PNG/GIF/BMP/JPEG
headers (pure struct reads — no PIL/libvips) and PCM WAV parsing with
numpy-computed signal statistics.

These are the default decoders behind datapipe/multimodal.py. They read
container HEADERS, not pixel/sample payload decode chains, so they cover the
"what are this blob's dimensions / rate / duration" layer a crawl pipeline
needs for filtering and bucketing; full pixel decoding still goes through the
injectable decoder seam (reference: parse-tika delegates image metadata to
Tika's ImageParser, which likewise reads headers for dims/EXIF).
"""

from __future__ import annotations

import struct


def sniff_image_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the container header, or None when the
    format is not one of png/gif/bmp/jpeg (or the header is truncated).

    - PNG:  IHDR width/height, big-endian uint32 at bytes 16-24
    - GIF:  87a/89a logical screen descriptor, little-endian uint16 at 6-10
    - BMP:  BITMAPINFOHEADER (and the V4/V5 variants) int32 at 18-26;
            the ancient BITMAPCOREHEADER (size 12) uint16 at 18-22
    - JPEG: first SOFn frame header (height then width, big-endian uint16),
            skipping non-frame segments by their declared lengths
    """
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", payload[16:24])
        return "png", int(w), int(h)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", int(w), int(h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        (dib_size,) = struct.unpack("<I", payload[14:18])
        if dib_size == 12:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return "bmp", int(w), int(h)
        if dib_size >= 40:  # BITMAPINFOHEADER / V4 / V5
            w, h = struct.unpack("<ii", payload[18:26])
            return "bmp", int(w), abs(int(h))  # negative h = top-down DIB
        return None
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            if marker == 0xD9:  # EOI before any frame header
                return None
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if seg_len < 2:
                return None
            # SOF0-SOF15 are frame headers, except DHT/JPG/DAC share the range
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", int(w), int(h)
            i += 2 + seg_len
        return None
    return None


def parse_wav(payload: bytes) -> dict | None:
    """Parse a RIFF/WAVE container with integer PCM samples.

    Returns {format, sample_rate, n_channels, bits, n_samples, duration_s,
    samples} (samples: numpy int array, interleaved) or None for non-WAV /
    non-PCM / truncated input. Sample math is numpy (vectorized); nothing
    outside the stdlib + numpy is touched.
    """
    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits not in (8, 16, 32) or channels < 1 or rate < 1:
        return None  # only integer PCM here — compressed WAVs need a codec
    bytes_per_sample = bits // 8
    if block_align != bytes_per_sample * channels or block_align == 0:
        return None
    n_frames = len(data) // block_align
    usable = data[: n_frames * block_align]
    dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    samples = np.frombuffer(usable, dtype=dtype)
    if bits == 8:  # 8-bit WAV is unsigned, center it
        samples = samples.astype(np.int16) - 128
    return {
        "format": "wav",
        "sample_rate": int(rate),
        "n_channels": int(channels),
        "bits": int(bits),
        "n_samples": int(n_frames),
        "duration_s": n_frames / rate,
        "samples": samples,
    }


def byte_histogram(payload: bytes, bins: int = 8) -> list[float]:
    """Normalized byte-value histogram — a real, decode-free content feature
    for opaque payloads (constant-width bins over 0..255)."""
    if not payload:
        return [0.0] * bins
    import numpy as np

    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> (8 - bins.bit_length() + 1),
        minlength=bins,
    )[:bins]
    return [round(float(c) / len(payload), 6) for c in counts]


def spectral_envelope(samples, sample_rate: int, n_bins: int = 13) -> list[float]:
    """First ``n_bins`` rFFT magnitude bins of the signal, L2-normalized —
    a deterministic, numpy-only stand-in for an MFCC front end (the real
    mel-filterbank stage belongs to an injected librosa decoder)."""
    import numpy as np

    if len(samples) == 0:
        return [0.0] * n_bins
    mags = np.abs(np.fft.rfft(samples.astype(np.float64)))[:n_bins]
    if len(mags) < n_bins:
        mags = np.pad(mags, (0, n_bins - len(mags)))
    norm = float(np.linalg.norm(mags))
    if norm == 0.0:
        return [0.0] * n_bins
    return [round(float(m) / norm, 6) for m in mags]
