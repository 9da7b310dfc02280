"""Stdlib-only media header codecs: image dimensions from PNG/GIF/BMP/JPEG/
TIFF headers plus JPEG/TIFF EXIF orientation (pure struct reads — no
PIL/libvips) and PCM WAV parsing with numpy-computed signal statistics.

These are the default decoders behind datapipe/multimodal.py. They read
container HEADERS, not pixel/sample payload decode chains, so they cover the
"what are this blob's dimensions / rate / duration" layer a crawl pipeline
needs for filtering and bucketing; full pixel decoding still goes through the
injectable decoder seam (reference: parse-tika delegates image metadata to
Tika's ImageParser, which likewise reads headers for dims/EXIF).
"""

from __future__ import annotations

import struct


def _tiff_ifd_entries(payload: bytes, ifd_off: int, endian: str) -> dict[int, int]:
    """tag → scalar value for the SHORT(3)/LONG(4) count-1 entries of one
    TIFF IFD (the fields that carry dims/orientation). Other types/counts
    are skipped — callers only need the scalar tags."""
    out: dict[int, int] = {}
    if ifd_off + 2 > len(payload):
        return out
    (n_entries,) = struct.unpack(f"{endian}H", payload[ifd_off : ifd_off + 2])
    for k in range(min(n_entries, 512)):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(payload):
            break
        tag, typ, count = struct.unpack(f"{endian}HHI", payload[e : e + 8])
        if count != 1:
            continue
        if typ == 3:  # SHORT lives in the first 2 bytes of the value field
            (out[tag],) = struct.unpack(f"{endian}H", payload[e + 8 : e + 10])
        elif typ == 4:  # LONG fills the value field
            (out[tag],) = struct.unpack(f"{endian}I", payload[e + 8 : e + 12])
    return out


def _tiff_endian(payload: bytes) -> str | None:
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        return "<"
    if payload[:4] == b"MM\x00*":
        return ">"
    return None


def sniff_image_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the container header, or None when the
    format is not one of png/gif/bmp/jpeg/tiff (or the header is truncated).

    - PNG:  IHDR width/height, big-endian uint32 at bytes 16-24
    - GIF:  87a/89a logical screen descriptor, little-endian uint16 at 6-10
    - BMP:  BITMAPINFOHEADER (and the V4/V5 variants) int32 at 18-26;
            the ancient BITMAPCOREHEADER (size 12) uint16 at 18-22
    - JPEG: first SOFn frame header (height then width, big-endian uint16),
            skipping non-frame segments by their declared lengths
    - TIFF: IFD0 ImageWidth(256)/ImageLength(257), both byte orders,
            SHORT or LONG entries (TIFF 6.0 §2; Tika's TiffParser reads
            the same two tags for metadata-only dimension extraction)
    """
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", int(w), int(h)) if w and h else None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", int(w), int(h)) if w and h else None
    if len(payload) >= 26 and payload[:2] == b"BM":
        (dib_size,) = struct.unpack("<I", payload[14:18])
        if dib_size == 12:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return ("bmp", int(w), int(h)) if w and h else None
        if dib_size >= 40:  # BITMAPINFOHEADER / V4 / V5
            w, h = struct.unpack("<ii", payload[18:26])
            # spec: width strictly positive; height may be negative
            # (top-down DIB) but never 0 or INT32_MIN (abs() overflow)
            if w <= 0 or h == 0 or h == -(1 << 31):
                return None
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
                return ("jpeg", int(w), int(h)) if w and h else None
            i += 2 + seg_len
        return None
    endian = _tiff_endian(payload)
    if endian is not None:
        (ifd_off,) = struct.unpack(f"{endian}I", payload[4:8])
        tags = _tiff_ifd_entries(payload, ifd_off, endian)
        if 256 in tags and 257 in tags and tags[256] > 0 and tags[257] > 0:
            return "tiff", int(tags[256]), int(tags[257])
        return None
    if (
        len(payload) >= 25  # RIFF hdr 12 + chunk hdr 8 + 5-byte VP8L minimum
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    ):
        # WebP container spec: first chunk decides the flavor
        chunk = payload[12:16]
        body = payload[20:]
        if chunk == b"VP8X" and len(body) >= 10:
            # canvas dims, 24-bit little-endian minus-one
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return "webp", w, h
        if chunk == b"VP8 " and len(body) >= 10:
            # lossy: keyframe start code 9D 01 2A, then 14-bit LE dims
            if body[3:6] != b"\x9d\x01\x2a":
                return None
            w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            return ("webp", w, h) if w and h else None
        if chunk == b"VP8L" and len(body) >= 5:
            # lossless: signature 0x2F, then two packed 14-bit minus-one dims
            if body[0] != 0x2F:
                return None
            bits = int.from_bytes(body[1:5], "little")
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return "webp", w, h
        return None
    if len(payload) >= 16 and payload[4:8] == b"ftyp":
        info = sniff_isobmff(payload)
        if info and "width" in info:
            brand = info["brand"].lower()
            fmt = "avif" if brand.startswith("avi") else (
                "heic" if brand.startswith(("hei", "mif", "msf")) else "isobmff"
            )
            return fmt, info["width"], info["height"]
        return None
    if len(payload) >= 8 and payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        # ICO/CUR directory: report the LARGEST image entry (0 byte = 256)
        (count,) = struct.unpack("<H", payload[4:6])
        best = None
        for k in range(min(count, 64)):
            e = 6 + 16 * k
            if e + 2 > len(payload):
                break
            w = payload[e] or 256
            h = payload[e + 1] or 256
            if best is None or w * h > best[0] * best[1]:
                best = (w, h)
        return ("ico", best[0], best[1]) if best else None
    head = payload[:1024].lstrip(b"\xef\xbb\xbf \t\r\n")
    if head.startswith(b"<?xml") or head.startswith(b"<svg"):
        svg = _svg_dimensions(payload)
        if svg is not None:
            return svg
        return None
    return None


def _svg_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """width/height attributes of the root <svg> (unitless or px), else the
    viewBox extent — text inspection only, bounded to the first 4 KiB."""
    import re

    text = payload[:4096].decode("utf-8", errors="replace")
    m = re.search(r"<svg\b[^>]*>", text, re.DOTALL)
    if m is None:
        return None
    tag = m.group(0)

    def attr(name: str) -> float | None:
        am = re.search(rf'{name}\s*=\s*"([0-9.]+)(?:px)?"', tag)
        return float(am.group(1)) if am else None

    w, h = attr("width"), attr("height")
    if w and h:
        return "svg", int(round(w)), int(round(h))
    vb = re.search(r'viewBox\s*=\s*"\s*[-0-9.]+[ ,]+[-0-9.]+[ ,]+([0-9.]+)[ ,]+([0-9.]+)', tag)
    if vb:
        return "svg", int(round(float(vb.group(1)))), int(round(float(vb.group(2))))
    return None


def _iter_boxes(buf: bytes, start: int, end: int):
    """(type, body_start, body_end) for each ISO-BMFF box in buf[start:end]
    (ISO/IEC 14496-12 §4.2; 64-bit largesize handled, depth left to caller)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        btype = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize follows
            if i + 16 > end:
                return
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            body = i + 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < 8 or i + size > end:
            return
        yield btype, body, i + size
        i += size


def _find_box(buf: bytes, path: list[bytes], start: int, end: int) -> tuple[int, int] | None:
    """(body_start, body_end) of the first box at the given nesting path.
    FullBox headers (version+flags) inside container boxes on the path are
    the caller's concern — ``meta`` is the one full-box container here."""
    for btype, b0, b1 in _iter_boxes(buf, start, end):
        if btype != path[0]:
            continue
        if btype == b"meta":  # FullBox: skip version+flags
            b0 += 4
        if len(path) == 1:
            return b0, b1
        return _find_box(buf, path[1:], b0, b1)
    return None


def sniff_isobmff(payload: bytes) -> dict | None:
    """Header-only facts from an ISO-BMFF container (AVIF/HEIC/MP4/MOV):
    ``{brand}`` always; ``width``/``height`` from the ``ispe`` property box
    (AVIF/HEIC — Tika reads the same box); ``duration_s``/``timescale``
    from ``mvhd`` (MP4/MOV) for the frame-sampling plan. None when the
    payload is not ISO-BMFF."""
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None
    out: dict = {"brand": payload[8:12].decode("latin-1").strip()}
    ispe = _find_box(payload, [b"meta", b"iprp", b"ipco", b"ispe"], 0, n)
    if ispe is not None:
        b0, b1 = ispe
        if b1 - b0 >= 12:  # version/flags + two uint32 dims
            w, h = struct.unpack(">II", payload[b0 + 4 : b0 + 12])
            if w > 0 and h > 0:
                out["width"], out["height"] = int(w), int(h)
    mvhd = _find_box(payload, [b"moov", b"mvhd"], 0, n)
    if mvhd is not None:
        b0, b1 = mvhd
        version = payload[b0]
        if version == 1 and b1 - b0 >= 32:
            timescale, duration = struct.unpack(">IQ", payload[b0 + 20 : b0 + 32])
        elif version == 0 and b1 - b0 >= 24:
            timescale, duration = struct.unpack(">II", payload[b0 + 12 : b0 + 20])
        else:
            timescale = 0
        if timescale:
            out["timescale"] = int(timescale)
            out["duration_s"] = duration / timescale
    return out


_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def parse_mp3_info(payload: bytes) -> dict | None:
    """Header-only MP3 facts: sample rate, channel mode, bitrate of the
    first Layer-III frame and a CBR duration estimate (audio_bytes × 8 /
    bitrate — the honest no-decode answer; VBR files need a frame walk).
    Skips a leading ID3v2 tag (syncsafe size). None for non-MPEG data."""
    n = len(payload)
    i = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        i = 10 + size
    # find the first frame sync within a bounded window
    limit = min(n - 4, i + 4096)
    while i <= limit:
        if payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = payload[i + 1], payload[i + 2], payload[i + 3]
            version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0x3  # 1 = Layer III
            bitrate_idx = (b2 >> 4) & 0xF
            rate_idx = (b2 >> 2) & 0x3
            if (
                version != 1
                and layer == 1
                and 0 < bitrate_idx < 15
                and rate_idx < 3
            ):
                table = _MP3_BITRATES_V1L3 if version == 3 else _MP3_BITRATES_V2L3
                bitrate_kbps = table[bitrate_idx]
                sample_rate = _MP3_RATES[version][rate_idx]
                mode = (b3 >> 6) & 0x3
                audio_bytes = n - i
                return {
                    "format": "mp3",
                    "sample_rate": sample_rate,
                    "bitrate_kbps": bitrate_kbps,
                    "n_channels": 1 if mode == 3 else 2,
                    "duration_s": audio_bytes * 8 / (bitrate_kbps * 1000),
                }
            i += 1
        else:
            i += 1
    return None


def parse_mp3_sideinfo(payload: bytes, *, max_frames: int = 4096) -> dict | None:
    """MPEG-1 Layer III (MP3) frame walk + side-information parse
    (ISO/IEC 11172-3 §2.4.1.7). Every field here is a FIXED-WIDTH bit
    field fully specified by the section's syntax table — unlike the
    sample reconstruction, whose Huffman / requantization tables are
    normative numeric data and stay scoped out (see
    ``decode_mpeg_audio_samples``) — so .mp3 payloads get an exact frame
    census and a STREAM-LEVEL content signature without any table risk.

    Returns None for non-MPEG-1-Layer-III input, else::

        {"format": "mp3", "sample_rate", "n_channels", "n_frames",
         "duration_s",            # exact: n_frames * 1152 / rate
         "vbr",                   # True when frame bitrates differ
         "bitrate_kbps",          # first frame's
         "stream_sig",            # 60-bit md5 of every frame's
                                  # header+side-info bytes (CRC words
                                  # excluded) — identical encoded
                                  # streams match even when ID3 tags or
                                  # trailing junk differ, so MP3s join
                                  # EXACT stream dedup without decode
         "frames"}                # per-frame parsed side-info dicts

    Each ``frames`` entry: main_data_begin, scfsi (per channel), and per
    (granule, channel): part2_3_length, big_values, global_gain,
    scalefac_compress, window_switching, block_type, mixed_block,
    table_select, subblock_gain, region0_count, region1_count, preflag,
    scalefac_scale, count1table_select. Hostile-input posture: the same
    two-consecutive-header confirmation as ``decode_mpeg_audio_samples``
    before accepting a sync, forbidden field combinations (window
    switching with block_type 0, big_values > 288) stop the walk, frame
    count caps at ``max_frames``, and a mid-stream rate/channel change
    ends the census at the consistent prefix."""
    import hashlib

    n = len(payload)
    pos = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size

    def _hdr(p: int):
        """Parsed MPEG-1 Layer III header at p, or None."""
        if p + 4 > n or payload[p] != 0xFF:
            return None
        b1, b2, b3 = payload[p + 1], payload[p + 2], payload[p + 3]
        if (b1 & 0xF8) != 0xF8 or (b1 >> 1) & 0x3 != 1:  # MPEG-1, Layer III
            return None
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            return None
        kbps = _MP3_BITRATES_V1L3[br_idx]
        rate = _MPEG1_RATES[sr_idx]
        mode = (b3 >> 6) & 0x3
        return {
            "kbps": kbps,
            "rate": rate,
            "sr_idx": sr_idx,
            "pad": (b2 >> 1) & 0x1,
            "crc": b1 & 1 == 0,  # protection_bit 0 = CRC present
            "nch": 1 if mode == 3 else 2,
            "flen": 144 * kbps * 1000 // rate + ((b2 >> 1) & 0x1),
        }

    # bounded sync scan, accepted only with a second consistent header
    # (or sync at stream start for single-frame payloads)
    scan_start = pos
    limit = min(n - 4, pos + 4096)
    first = None
    while pos <= limit:
        h = _hdr(pos)
        if h is not None:
            nxt = pos + h["flen"]
            h2 = _hdr(nxt) if nxt + 4 <= n else None
            if h2 is not None and h2["sr_idx"] == h["sr_idx"]:
                first = pos
                break
            if nxt + 4 > n and pos == scan_start:
                first = pos
                break
        pos += 1
    if first is None:
        return None

    frames: list[dict] = []
    sig = hashlib.md5()
    rate = nch = None
    vbr = False
    kbps0 = None
    pos = first
    while pos + 4 <= n and len(frames) < max_frames:
        h = _hdr(pos)
        if h is None:
            break
        if rate is None:
            rate, nch, kbps0 = h["rate"], h["nch"], h["kbps"]
        elif h["rate"] != rate or h["nch"] != nch:
            break  # parameter change mid-stream: keep the consistent prefix
        if h["kbps"] != kbps0:
            vbr = True
        off = pos + 4
        if h["crc"]:
            off += 2  # CRC word rides OUTSIDE the signature
        si_len = 17 if nch == 1 else 32
        if off + si_len > n:
            break
        si = payload[off : off + si_len]
        br = _FlacBits(si, 0)
        fr: dict = {"main_data_begin": br.read(9)}
        br.read(5 if nch == 1 else 3)  # private_bits
        fr["scfsi"] = [[br.read(1) for _ in range(4)] for _ in range(nch)]
        ok = True
        grs = []
        for _gr in range(2):
            for _ch in range(nch):
                g = {
                    "part2_3_length": br.read(12),
                    "big_values": br.read(9),
                    "global_gain": br.read(8),
                    "scalefac_compress": br.read(4),
                    "window_switching": br.read(1),
                }
                if g["big_values"] is None or g["big_values"] > 288:
                    ok = False
                    break
                if g["window_switching"]:
                    g["block_type"] = br.read(2)
                    g["mixed_block"] = br.read(1)
                    g["table_select"] = [br.read(5) for _ in range(2)]
                    g["subblock_gain"] = [br.read(3) for _ in range(3)]
                    g["region0_count"] = None
                    g["region1_count"] = None
                    if g["block_type"] == 0:  # forbidden (§2.4.1.7)
                        ok = False
                        break
                else:
                    g["block_type"] = 0
                    g["mixed_block"] = 0
                    g["table_select"] = [br.read(5) for _ in range(3)]
                    g["region0_count"] = br.read(4)
                    g["region1_count"] = br.read(3)
                    g["subblock_gain"] = [0, 0, 0]
                g["preflag"] = br.read(1)
                g["scalefac_scale"] = br.read(1)
                g["count1table_select"] = br.read(1)
                if g["count1table_select"] is None:
                    ok = False
                    break
                grs.append(g)
            if not ok:
                break
        if not ok:
            break
        fr["granules"] = grs
        frames.append(fr)
        sig.update(payload[pos : pos + 4])
        sig.update(si)
        pos += h["flen"]
    if not frames:
        return None
    n_samples = 1152 * len(frames)
    return {
        "format": "mp3",
        "sample_rate": int(rate),
        "n_channels": int(nch),
        "n_frames": len(frames),
        "duration_s": n_samples / rate,
        "vbr": vbr,
        "bitrate_kbps": int(kbps0),
        "stream_sig": int(sig.hexdigest()[:15], 16),
        "frames": frames,
    }


_ID3_TEXT_ENCODINGS = ("latin-1", "utf-16", "utf-16-be", "utf-8")

# frame-id → output field, v2.3/2.4 four-char ids and v2.2 three-char ids
_ID3_FIELDS = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TT2": "title", "TP1": "artist", "TAL": "album",
}


def _id3_text(body: bytes) -> str | None:
    """One ID3v2 text frame body: encoding byte + text (ID3v2.4 §4.2)."""
    if not body:
        return None
    enc = _ID3_TEXT_ENCODINGS[body[0]] if body[0] < 4 else "latin-1"
    return body[1:].decode(enc, errors="replace").split("\x00", 1)[0]


def _vorbis_comments(block: bytes) -> dict | None:
    """A VorbisComment block (Vorbis I §5 — also Opus's OpusTags payload
    and FLAC's VORBIS_COMMENT metadata block): vendor length/string, then
    length-prefixed UTF-8 ``KEY=value`` pairs, all lengths u32 LE."""
    if len(block) < 8:
        return None
    (vlen,) = struct.unpack("<I", block[:4])
    pos = 4 + vlen
    if pos + 4 > len(block):
        return None
    vendor = block[4:pos].decode("utf-8", errors="replace")
    (n,) = struct.unpack("<I", block[pos : pos + 4])
    pos += 4
    out = {"vendor": vendor, "n_tags": 0}
    for _ in range(min(n, 4096)):
        if pos + 4 > len(block):
            break
        (ln,) = struct.unpack("<I", block[pos : pos + 4])
        pos += 4
        if pos + ln > len(block):
            break
        kv = block[pos : pos + ln].decode("utf-8", errors="replace")
        pos += ln
        out["n_tags"] += 1
        k, _, v = kv.partition("=")
        k = k.lower()
        if k in ("title", "artist", "album") and k not in out:
            out[k] = v
    return out


def parse_audio_tags(payload: bytes, *, max_frames: int = 4096) -> dict | None:
    """Audio metadata tags — the audio analogue of ``exif_orientation``:
    title/artist/album from the three tag systems the web's audio actually
    carries, all fully specified containers (no codec tables):

    - **ID3v2** (leading ``ID3`` — MP3 and friends): v2.2 3-byte frame
      ids/sizes, v2.3 plain-BE 4-byte sizes, v2.4 syncsafe sizes; text
      frames carry an encoding byte (latin-1 / UTF-16 BOM / UTF-16BE /
      UTF-8, ID3v2.4 §4.2). The header's extended-header flag (0x40) is
      honored — v2.3 counts its plain-u32 size EXCLUDING the 4 size
      bytes (ID3v2.3 §3.2), v2.4's syncsafe size INCLUDES the whole
      extended header (ID3v2.4 §3.2) — and so is unsynchronisation
      (0x80): v2.2/v2.3 de-unsynchronise the whole tag before the frame
      walk (§5: ``FF 00`` → ``FF``); v2.4 applies it per frame via the
      frame-format flag 0x02, honoring the data-length indicator (0x01)
      when present.
    - **VorbisComment** in Ogg (Vorbis packet 2 ``\\x03vorbis``, Opus
      packet 2 ``OpusTags`` — found via the RFC 3533 page walk).
    - **FLAC** native VORBIS_COMMENT metadata block (type 4).

    Returns ``{"container": "id3"|"ogg"|"flac", "title", "artist",
    "album", "n_tags", "vendor"}`` (absent fields None; vendor None for
    ID3) or None when no tag system is present. Reference parity:
    parse-tika surfaces the same fields via Tika's Mp3Parser /
    VorbisParser (TikaParser.java:63-160). Hostile posture: every
    length is bounds-checked, frame count caps at ``max_frames``, text
    decodes with replace semantics — junk yields junk strings, never an
    exception."""
    n = len(payload)
    if payload[:3] == b"ID3" and n >= 10:
        ver = payload[3]
        hflags = payload[5]
        size = (
            (payload[6] & 0x7F) << 21 | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7 | (payload[9] & 0x7F)
        )
        data = payload[10 : min(10 + size, n)]
        if hflags & 0x80 and ver <= 3:
            # v2.2/v2.3 unsynchronisation applies to the WHOLE tag (§5);
            # frame sizes are valid on the de-unsynchronised data
            data = data.replace(b"\xff\x00", b"\xff")
        pos = 0
        end = len(data)
        if hflags & 0x40 and ver >= 3:
            # extended header precedes the first frame: v2.3's plain-u32
            # size EXCLUDES the 4 size bytes; v2.4's syncsafe size
            # INCLUDES the whole extended header
            if end < 4:
                return None
            raw = data[0:4]
            if ver >= 4:
                ext = (
                    (raw[0] & 0x7F) << 21 | (raw[1] & 0x7F) << 14
                    | (raw[2] & 0x7F) << 7 | (raw[3] & 0x7F)
                )
            else:
                ext = 4 + int.from_bytes(raw, "big")
            if ext <= 0 or ext > end:
                return None
            pos = ext
        out = {
            "container": "id3", "title": None, "artist": None,
            "album": None, "n_tags": 0, "vendor": None,
        }
        frames = 0
        while frames < max_frames:
            fflags2 = 0
            if ver == 2:  # ID3v2.2: id(3) size(3)
                if pos + 6 > end or data[pos] == 0:
                    break
                fid = data[pos : pos + 3].decode("latin-1", errors="replace")
                fsz = int.from_bytes(data[pos + 3 : pos + 6], "big")
                hdr = 6
            else:  # v2.3 (plain BE size) / v2.4 (syncsafe size)
                if pos + 10 > end or data[pos] == 0:
                    break
                fid = data[pos : pos + 4].decode("latin-1", errors="replace")
                raw = data[pos + 4 : pos + 8]
                if ver >= 4:
                    fsz = (
                        (raw[0] & 0x7F) << 21 | (raw[1] & 0x7F) << 14
                        | (raw[2] & 0x7F) << 7 | (raw[3] & 0x7F)
                    )
                else:
                    fsz = int.from_bytes(raw, "big")
                fflags2 = data[pos + 9]  # frame FORMAT flags (v2.4 §4.1.2)
                if ver >= 4 and hflags & 0x80:
                    # v2.4 moved unsync per-frame, but common real-world
                    # taggers set ONLY the header bit (0x80) without the
                    # per-frame 0x02 flags; the header bit means "all
                    # frames unsynchronised" (ID3v2.4 §3.1), so OR it in
                    fflags2 |= 0x02
                hdr = 10
            if fsz <= 0 or pos + hdr + fsz > end:
                break
            body = data[pos + hdr : pos + hdr + fsz]
            pos += hdr + fsz
            frames += 1
            out["n_tags"] += 1
            if ver >= 4:
                if fflags2 & 0x01:  # data-length indicator: 4 syncsafe bytes
                    body = body[4:]
                if fflags2 & 0x02:  # per-frame unsynchronisation
                    body = body.replace(b"\xff\x00", b"\xff")
            field = _ID3_FIELDS.get(fid)
            if field is not None and out[field] is None:
                out[field] = _id3_text(body)
        if frames == 0:
            return None
        return out

    ogg = parse_ogg_info(payload)
    if ogg is not None:
        # the comment header is the PRIMARY stream's second packet:
        # \x03vorbis + block (Vorbis I §5), or OpusTags + block (RFC 7845)
        block = None
        for pkt in ogg["head_packets"]:
            if pkt[:7] == b"\x03vorbis":
                block = pkt[7:]
                break
            if pkt[:8] == b"OpusTags":
                block = pkt[8:]
                break
        vc = _vorbis_comments(block) if block is not None else None
        if vc is None:
            return None
        return {
            "container": "ogg",
            "title": vc.get("title"), "artist": vc.get("artist"),
            "album": vc.get("album"), "n_tags": vc["n_tags"],
            "vendor": vc["vendor"],
        }

    if payload[:4] == b"fLaC":
        pos = 4
        for _ in range(max_frames):
            if pos + 4 > n:
                break
            btype = payload[pos] & 0x7F
            last = payload[pos] & 0x80
            (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
            body_end = pos + 4 + blen
            if body_end > n:
                break
            if btype == 4:  # VORBIS_COMMENT
                vc = _vorbis_comments(payload[pos + 4 : body_end])
                if vc is None:
                    return None
                return {
                    "container": "flac",
                    "title": vc.get("title"), "artist": vc.get("artist"),
                    "album": vc.get("album"), "n_tags": vc["n_tags"],
                    "vendor": vc["vendor"],
                }
            pos = body_end
            if last:
                break
        return None
    return None


def parse_flac_streaminfo(payload: bytes) -> dict | None:
    """FLAC STREAMINFO header parse (format spec §9.1 — the first metadata
    block is mandatory and always STREAMINFO): sample rate (20 bits),
    channels (3 bits + 1), bits-per-sample (5 bits + 1), total samples
    (36 bits) → duration. Header-only — compressed frames need a codec."""
    if len(payload) < 4 + 4 + 34 or payload[:4] != b"fLaC":
        return None
    block_type = payload[4] & 0x7F
    (block_len,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if block_type != 0 or block_len < 34:
        return None
    si = payload[8 : 8 + 34]
    packed = int.from_bytes(si[10:18], "big")  # rate|chan|bps|total, 64 bits
    sample_rate = packed >> 44
    n_channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total_samples = packed & 0xFFFFFFFFF
    if sample_rate == 0:
        return None
    return {
        "format": "flac",
        "sample_rate": int(sample_rate),
        "n_channels": int(n_channels),
        "bits": int(bits),
        "n_samples": int(total_samples),
        "duration_s": total_samples / sample_rate,
    }


_OGG_CRC_TABLE: list[int] | None = None


def ogg_page_crc(page: bytes) -> int:
    """The Ogg page CRC-32 (RFC 3533 §6: generator 0x04c11db7, NON-reflected,
    init 0, no final XOR — deliberately NOT the zlib/IEEE reflected variant)
    over the whole page with the 4 CRC bytes (offset 22-25) taken as zero.
    Table-driven; tests/test_codec_properties.py checks the table against a
    direct bit-by-bit polynomial division, so a table typo cannot hide."""
    crc = _ogg_crc_raw(0, page[:22])
    crc = _ogg_crc_raw(crc, b"\x00\x00\x00\x00")
    return _ogg_crc_raw(crc, page[26:])


def _ogg_crc_raw(crc: int, data: bytes) -> int:
    """The raw (init/xorout-free) CRC update ``ogg_page_crc`` is built on.
    Known-answer anchor (tests): this CRC of b"123456789" equals
    0x765E7680 ^ 0xFFFFFFFF — the catalogued CRC-32/POSIX check value
    minus its final XOR (same generator, same non-reflected direction)."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        tab = []
        for b in range(256):
            r = b << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
            tab.append(r)
        _OGG_CRC_TABLE = tab
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ byte]
    return crc


# BOS-packet magic → codec name (the Ogg mapping specs: Vorbis I §A.2,
# RFC 7845 §5.1 (Opus), Theora I §6.2, Ogg-FLAC mapping §2, Speex manual)
_OGG_CODEC_MAGIC = (
    (b"\x01vorbis", "vorbis"),
    (b"OpusHead", "opus"),
    (b"\x80theora", "theora"),
    (b"\x7fFLAC", "flac"),
    (b"Speex   ", "speex"),
)

_OGG_AUDIO_CODECS = frozenset({"vorbis", "opus", "flac", "speex"})


def _ogg_id_facts(codec: str, pkt: bytes) -> dict:
    """(sample_rate, n_channels, pre_skip, fps_num, fps_den, kfgshift)
    facts from a recognized BOS packet, per each codec's
    identification-header mapping. Granule-position units: Vorbis/FLAC/
    Speex count samples at the stream rate; Opus granules always tick at
    48 kHz and include ``pre_skip`` (RFC 7845 §4/§5.1); Theora granules
    split into keyframe/delta counts at ``kfgshift`` (Theora I §5.1) and
    the frame clock is FRN/FRD from the id header."""
    rate = nch = None
    pre_skip = 0
    fps_num = fps_den = kfgshift = None
    granule_off = 0
    if codec == "vorbis" and len(pkt) >= 16:
        # \x01vorbis(7) version u32=0, channels u8, rate u32 LE
        (version,) = struct.unpack("<I", pkt[7:11])
        if version == 0:
            nch = pkt[11]
            (rate,) = struct.unpack("<I", pkt[12:16])
    elif codec == "opus" and len(pkt) >= 19:
        # OpusHead(8) version u8, channels u8, pre_skip u16, input rate u32
        if pkt[8] in (0, 1):
            nch = pkt[9]
            (pre_skip,) = struct.unpack("<H", pkt[10:12])
            rate = 48000  # granule clock, not the (informational) input rate
    elif codec == "flac":
        # 0x7F FLAC(4) major u8, minor u8, n_headers u16 BE, then the raw
        # fLaC STREAMINFO the native parser already reads
        si = parse_flac_streaminfo(pkt[9:])
        if si is not None:
            rate, nch = si["sample_rate"], si["n_channels"]
    elif codec == "speex" and len(pkt) >= 52:
        # speex_string(8) version(20) version_id(4) header_size(4) rate(4)
        # mode(4) mode_bitstream_version(4) nb_channels(4)
        (rate,) = struct.unpack("<I", pkt[36:40])
        (nch,) = struct.unpack("<I", pkt[48:52])
    elif codec == "theora" and len(pkt) >= 42:
        # \x80theora(7) VMAJ VMIN VREV, FMBW/FMBH u16, PICW/PICH u24,
        # PICX/PICY u8, FRN/FRD u32 BE (frame clock), PARN/PARD u24,
        # CS u8, NOMBR u24, then 16 bits QUAL(6)|KFGSHIFT(5)|PF(2)|Res(3)
        (frn,) = struct.unpack(">I", pkt[22:26])
        (frd,) = struct.unpack(">I", pkt[26:30])
        (tail,) = struct.unpack(">H", pkt[40:42])
        if 0 < frn and 0 < frd:
            fps_num, fps_den = frn, frd
            kfgshift = (tail >> 5) & 0x1F
            # granule-position quirk: before bitstream 3.2.1 the granule
            # encodes the LAST FRAME'S INDEX (count-1), from 3.2.1 on the
            # count itself (libtheora th_granule_frame's version branch)
            version = (pkt[7], pkt[8], pkt[9])
            granule_off = 0 if version >= (3, 2, 1) else 1
    if rate is not None and not (0 < rate <= 1_000_000):
        rate = None
    if nch is not None and not (0 < nch <= 255):
        nch = None
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "pre_skip": pre_skip,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "kfgshift": kfgshift,
        "granule_off": granule_off,
    }


def parse_ogg_info(payload: bytes, *, max_pages: int = 8192) -> dict | None:
    """Ogg container identity (RFC 3533 page walk) — the remaining major
    web audio family (Vorbis/Opus/Theora/Ogg-FLAC/Speex) joins the same
    stream-level identity space as MP3 (``parse_mp3_sideinfo``): codec
    payload decode stays honestly scoped out (Vorbis/Opus reconstruction
    needs normative codebooks this sandbox cannot verify), but the page
    layer is fully specified bit-for-bit, so .ogg/.opus/.oga payloads get
    an exact page/packet census, codec + rate/channel facts from the
    identification header, true duration from the final granule position,
    and a PACKET-level content signature.

    Returns None unless the payload starts with a CRC-valid BOS page;
    otherwise::

        {"format": "ogg", "codec",       # primary stream's codec (first
                                         # recognized audio BOS, else first
                                         # recognized BOS, else "unknown")
         "n_streams",                    # BOS serials seen
         "n_pages",                      # CRC-valid pages consumed
         "n_packets",                    # COMPLETED packets, primary stream
         "sample_rate", "n_channels",    # from the codec id header
         "pre_skip",                     # Opus pre-skip, else 0
         "duration_ms",                  # from the last granule position:
                                         # Vorbis/FLAC/Speex granule/rate,
                                         # Opus (granule-pre_skip)/48000
         "stream_sig",                   # 60-bit md5 over the primary
                                         # stream's packet bytes (each
                                         # length-delimited) — invariant
                                         # under REPAGINATION: the same
                                         # packets split across different
                                         # page boundaries (a remux) sign
                                         # identically, and trailing junk
                                         # after the EOS page is ignored
         "crc_ok",                       # page stream consistent: no bad
                                         # CRC and no page_sequence_no gap
                                         # (RFC 3533 §6 loss detection)
         "eos"}                          # primary stream's EOS page seen

    Hostile-input posture: page 0 must be a CRC-valid BOS page — both
    checked: an 'OggS' that happens to appear in junk fails the CRC, and
    a mid-stream capture (headless icecast dump) fails the BOS-flag gate
    rather than mixing a later chained stream's identity into a row
    about bytes that are mostly something else; a later bad-CRC or
    truncated page ends the census at the
    consistent prefix (``crc_ok`` False for corruption, ``eos`` False for
    truncation); a continued-packet flag with nothing pending drops the
    orphan fragment per RFC 3533 §6, and a pending fragment whose
    stream's next page does NOT set the continued flag is discarded as
    stale (the packet can never complete — never glued onto an unrelated
    packet); a page_sequence_no gap ends the census like a bad CRC
    (pages were lost, so packet identity past the gap is unknowable);
    the page count caps at ``max_pages`` and every length is
    bounds-checked before the read."""
    import hashlib

    n = len(payload)
    if n < 27 or payload[:4] != b"OggS" or payload[4] != 0:
        return None
    if not payload[5] & 0x02:  # page 0 must carry the BOS flag
        return None
    pos = 0
    n_pages = 0
    crc_ok = True
    bos_order: list[int] = []            # serials in BOS order
    first_pkt: dict[int, bytes] = {}     # serial → first completed packet
    pending: dict[int, bytearray | None] = {}  # serial → partial packet
    next_seq: dict[int, int] = {}        # serial → expected page sequence no
    packets: dict[int, list[bytes]] = {}  # serial → completed packets
    last_granule: dict[int, int] = {}
    eos_serials: set[int] = set()
    while pos + 27 <= n and n_pages < max_pages:
        if payload[pos : pos + 4] != b"OggS" or payload[pos + 4] != 0:
            break
        htype = payload[pos + 5]
        granule = int.from_bytes(payload[pos + 6 : pos + 14], "little", signed=True)
        (serial,) = struct.unpack("<I", payload[pos + 14 : pos + 18])
        (page_seq,) = struct.unpack("<I", payload[pos + 18 : pos + 22])
        n_segs = payload[pos + 26]
        seg_end = pos + 27 + n_segs
        if seg_end > n:
            break  # truncated segment table
        segs = payload[pos + 27 : seg_end]
        body_len = sum(segs)
        page_end = seg_end + body_len
        if page_end > n:
            break  # truncated body
        (want_crc,) = struct.unpack("<I", payload[pos + 22 : pos + 26])
        if ogg_page_crc(payload[pos:page_end]) != want_crc:
            if n_pages == 0:
                return None
            crc_ok = False
            break
        n_pages += 1
        if htype & 0x02 and serial not in packets:  # BOS
            bos_order.append(serial)
            packets[serial] = []
            pending[serial] = None
        if serial not in packets:  # data page for a stream with no BOS
            packets[serial] = []
            pending[serial] = None
        # page-sequence continuity (RFC 3533 §6: page_sequence_no lets a
        # decoder detect page loss): a gap means packets are missing —
        # end the census at the consistent prefix, like a bad CRC.
        # crc_ok therefore reads as "page stream consistent".
        expected = next_seq.get(serial)
        if expected is not None and page_seq != expected:
            crc_ok = False
            n_pages -= 1  # the gapped page is NOT part of the census
            break
        next_seq[serial] = (page_seq + 1) & 0xFFFFFFFF
        buf = pending[serial]
        if not (htype & 0x01) and buf is not None:
            # previous page ended mid-packet but this page does NOT set
            # the continued flag: the fragment can never complete (RFC
            # 3533 packet-boundary rules) — discard it rather than
            # concatenating it into an unrelated packet
            buf = None
        if htype & 0x01 and buf is None:
            # continued-packet data with nothing pending: drop the orphan
            # fragment (consume lacing values through its terminator)
            i = 0
            off = seg_end
            while i < n_segs:
                off += segs[i]
                i += 1
                if segs[i - 1] < 255:
                    break
            body_off, seg_i = off, i
        else:
            body_off, seg_i = seg_end, 0
        while seg_i < n_segs:
            run_start = body_off
            while seg_i < n_segs and segs[seg_i] == 255:
                body_off += 255
                seg_i += 1
            if seg_i < n_segs:  # terminating lacing value < 255
                body_off += segs[seg_i]
                seg_i += 1
                chunk = payload[run_start:body_off]
                pkt = bytes(buf) + chunk if buf else chunk
                buf = None
                packets[serial].append(pkt)
                if serial not in first_pkt:
                    first_pkt[serial] = pkt
            else:  # packet continues on the stream's next page
                chunk = payload[run_start:body_off]
                buf = bytearray(chunk) if buf is None else buf + chunk
        pending[serial] = buf  # bytearray mid-packet, None at a boundary
        if granule != -1:
            last_granule[serial] = granule
        if htype & 0x04:
            eos_serials.add(serial)
        pos = page_end
    if n_pages == 0:
        return None

    def codec_of(serial: int) -> str:
        pkt = first_pkt.get(serial, b"")
        for magic, name in _OGG_CODEC_MAGIC:
            if pkt[: len(magic)] == magic:
                return name
        return "unknown"

    primary = None
    for serial in bos_order:
        if codec_of(serial) in _OGG_AUDIO_CODECS:
            primary = serial
            break
    if primary is None:
        for serial in bos_order:
            if codec_of(serial) != "unknown":
                primary = serial
                break
    if primary is None:
        primary = bos_order[0] if bos_order else None
    if primary is None:
        return None
    codec = codec_of(primary)
    facts = _ogg_id_facts(codec, first_pkt.get(primary, b""))
    duration_ms = None
    g = last_granule.get(primary)
    rate = facts["sample_rate"]
    if g is not None and g >= 0 and rate and codec in _OGG_AUDIO_CODECS:
        samples = max(0, g - facts["pre_skip"]) if codec == "opus" else g
        duration_ms = samples * 1000 // rate
    elif (
        g is not None and g >= 0 and codec == "theora"
        and facts["fps_num"] and facts["kfgshift"] is not None
    ):
        # Theora I §5.1: granule = keyframe_count << kfgshift | delta_count;
        # total frames decoded so far is their sum, clocked at FRN/FRD
        frames = (
            (g >> facts["kfgshift"])
            + (g & ((1 << facts["kfgshift"]) - 1))
            + facts["granule_off"]
        )
        duration_ms = frames * 1000 * facts["fps_den"] // facts["fps_num"]
    sig = hashlib.md5()
    for pkt in packets[primary]:
        sig.update(len(pkt).to_bytes(8, "little"))
        sig.update(pkt)
    return {
        "format": "ogg",
        "codec": codec,
        "n_streams": len(bos_order),
        "n_pages": n_pages,
        "n_packets": len(packets[primary]),
        # the primary stream's leading packets — the id/comment headers
        # every mapping spec puts first (parse_audio_tags reads packet 2)
        "head_packets": packets[primary][:4],
        "sample_rate": facts["sample_rate"],
        "n_channels": facts["n_channels"],
        "pre_skip": facts["pre_skip"],
        "duration_ms": duration_ms,
        "stream_sig": int(sig.hexdigest()[:15], 16),
        "crc_ok": crc_ok,
        "eos": primary in eos_serials,
    }


def exif_orientation(payload: bytes) -> int | None:
    """EXIF Orientation (tag 274, 1..8) from a JPEG APP1 ``Exif\\0\\0``
    segment or a bare TIFF header, or None when absent. Values 5-8 mean the
    display dimensions are the stored dimensions swapped — the piece of EXIF
    a filtering/bucketing pipeline actually needs (Tika exposes the same tag
    as ``tiff:Orientation``)."""
    endian = _tiff_endian(payload)
    if endian is not None:
        (ifd_off,) = struct.unpack(f"{endian}I", payload[4:8])
        val = _tiff_ifd_entries(payload, ifd_off, endian).get(274)
        return val if val is not None and 1 <= val <= 8 else None
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / start of scan: no more metadata
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seg_len < 2:
            return None
        if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            return exif_orientation(payload[i + 10 : i + 2 + seg_len])
        i += 2 + seg_len
    return None


def effective_dimensions(payload: bytes) -> tuple[str, int, int] | None:
    """``sniff_image_dimensions`` with EXIF orientation applied: for
    orientation 5-8 (transpose/transverse/90° rotations) width and height
    swap, matching what a viewer renders."""
    dims = sniff_image_dimensions(payload)
    if dims is None:
        return None
    fmt, w, h = dims
    o = exif_orientation(payload)
    if o is not None and o >= 5:
        w, h = h, w
    return fmt, w, h


_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_adpcm_step(nibble: int, state: list) -> int:
    """One IMA ADPCM nibble → 16-bit sample; state = [predictor, index]."""
    step = _IMA_STEP_TABLE[state[1]]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    if nibble & 8:
        diff = -diff
    pred = state[0] + diff
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    state[0] = pred
    idx = state[1] + _IMA_INDEX_TABLE[nibble]
    state[1] = 0 if idx < 0 else (88 if idx > 88 else idx)
    return pred


def _ima_adpcm_decode(data: bytes, channels: int, block_align: int):
    """IMA/DVI ADPCM 'data' chunk → interleaved 16-bit samples (numpy).
    Blocks carry a 4-byte header per channel (predictor + step index),
    then nibble data in 4-byte per-channel interleave (IMA WAV layout)."""
    import numpy as np

    if block_align < 4 * channels or channels > 8:
        return None
    out: list[int] = []
    for base in range(0, len(data) - 4 * channels + 1, block_align):
        block = data[base : base + block_align]
        states = []
        for c in range(channels):
            pred = int.from_bytes(
                block[4 * c : 4 * c + 2], "little", signed=True
            )
            idx = block[4 * c + 2]
            if idx > 88:
                return None
            states.append([pred, idx])
        # the header predictor IS the block's first sample per channel
        out.extend(st[0] for st in states)
        body = block[4 * channels :]
        # 4-byte (8-nibble) chunks per channel, channels round-robin
        chunk_samples: list[list[int]] = [[] for _ in range(channels)]
        for off in range(0, len(body) - 3, 4):
            c = (off // 4) % channels
            st = states[c]
            for b in body[off : off + 4]:
                chunk_samples[c].append(_ima_adpcm_step(b & 0xF, st))
                chunk_samples[c].append(_ima_adpcm_step(b >> 4, st))
        n = min(len(ch) for ch in chunk_samples) if channels > 1 else len(
            chunk_samples[0]
        )
        for i in range(n):
            for c in range(channels):
                out.append(chunk_samples[c][i])
    if not out:
        return None
    return np.array(out, dtype=np.int64)


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
    if channels < 1 or rate < 1:
        return None
    if audio_format == 0x11 and bits == 4:  # IMA ADPCM (from the public
        # Microsoft/IMA spec): decode blocks to 16-bit PCM
        samples = _ima_adpcm_decode(data, channels, block_align)
        if samples is None:
            return None
        n_frames = len(samples) // channels
        return {
            "format": "wav",
            "sample_rate": int(rate),
            "n_channels": int(channels),
            "bits": 16,  # decoded width
            "n_samples": n_frames,
            "duration_s": n_frames / rate,
            "samples": samples,
        }
    if audio_format in (6, 7) and bits == 8:  # G.711 A-law / µ-law
        import numpy as np

        table = np.asarray(
            _G711_ALAW if audio_format == 6 else _G711_ULAW, dtype=np.int16
        )
        codes = np.frombuffer(data[: len(data) - len(data) % channels],
                              dtype=np.uint8)
        samples = table[codes]
        n_frames = len(samples) // channels
        return {
            "format": "wav",
            "sample_rate": int(rate),
            "n_channels": int(channels),
            "bits": 16,  # decoded width
            "n_samples": n_frames,
            "duration_s": n_frames / rate,
            "samples": samples,
        }
    if audio_format != 1 or bits not in (8, 16, 32):
        return None  # other compressed WAVs (MP3-in-WAV, ...) need a codec
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

    # value * bins // 256 gives `bins` equal-width buckets for ANY bin
    # count (a pure right-shift only works for powers of two — with e.g.
    # bins=10 the top buckets would always be empty).
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8).astype(np.int32) * bins // 256,
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


# ---------------------------------------------------------------------------
# Pixel decode (stdlib-only): uncompressed 24-bit BMP and non-interlaced
# 8-bit PNG. PNG's IDAT is zlib (stdlib) and the five scanline filters are
# defined in the public spec (RFC 2083 §6 / PNG spec §9) — so FULL pixel
# decode needs no codec library for these two formats, which is exactly
# enough to run real perceptual hashing (dHash) over crawl images.
# ---------------------------------------------------------------------------

_MAX_PIXELS = 64_000_000  # 8k x 8k ceiling — bomb guard for forged headers


def _bmp_rle_decode(data: bytes, off: int, w: int, h: int, rle4: bool):
    """BI_RLE8 / BI_RLE4 → bottom-up grid of palette indexes (BMP spec:
    encoded runs, absolute runs word-padded, EOL / EOB / delta escapes;
    delta-skipped pixels stay 0)."""
    grid = [[0] * w for _ in range(h)]
    x = y = 0
    i = off
    n = len(data)
    while i + 1 < n and y < h:
        c, v = data[i], data[i + 1]
        i += 2
        if c:  # encoded run (RLE4 alternates the two nibbles)
            if rle4:
                hi, lo = v >> 4, v & 15
                for k in range(c):
                    if x < w:
                        grid[y][x] = hi if k % 2 == 0 else lo
                    x += 1
            else:
                for _ in range(c):
                    if x < w:
                        grid[y][x] = v
                    x += 1
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if i + 1 >= n:
                return None
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute run of v indexes, padded to a word boundary
            nbytes = (v + 1) // 2 if rle4 else v
            if i + nbytes > n:
                return None
            for k in range(v):
                if rle4:
                    byte = data[i + k // 2]
                    val = (byte >> 4) if k % 2 == 0 else (byte & 15)
                else:
                    val = data[i + k]
                if x < w and y < h:
                    grid[y][x] = val
                x += 1
            i += nbytes + (nbytes & 1)
    return grid


def decode_bmp_pixels(payload: bytes):
    """BMP → (width, height, list of gray rows, top-down), from the DIB
    spec: uncompressed 24/32-bit BGR(A/X), paletted 1/4/8-bit, and
    BI_RLE8 / BI_RLE4 run-length compression. Gray = integer
    (r*299 + g*587 + b*114) // 1000 (the classic ITU-R 601 luma
    weights). Returns None for bitfields/16-bit/forged-header files."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    try:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:
            return None  # BITMAPCOREHEADER: 16-bit dims, no bpp promise
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        clr_used = (
            struct.unpack_from("<I", payload, 46)[0] if len(payload) >= 50 else 0
        )
    except struct.error:
        return None
    top_down = h < 0
    h = abs(h)
    if not (0 < w and 0 < h and w * h <= _MAX_PIXELS) or planes != 1:
        return None

    def luma(b, g, r):
        return (r * 299 + g * 587 + b * 114) // 1000

    if bpp in (1, 4, 8):
        n_colors = clr_used or (1 << bpp)
        if n_colors > 256:
            return None
        pal_off = 14 + hdr_size
        if pal_off + 4 * n_colors > len(payload):
            return None
        pal = [
            luma(*payload[pal_off + 4 * i : pal_off + 4 * i + 3])
            for i in range(n_colors)
        ]

        def to_gray(idx_grid, bottom_up=True):
            rows = []
            for y in range(h):
                src = idx_grid[h - 1 - y] if bottom_up else idx_grid[y]
                rows.append([pal[v] if v < len(pal) else 0 for v in src])
            return w, h, rows

        if compression == 0:
            row_bytes = ((w * bpp + 31) // 32) * 4
            if data_off + row_bytes * h > len(payload):
                return None
            maxv = (1 << bpp) - 1
            grid = []
            for sy in range(h):
                base = data_off + sy * row_bytes
                line = []
                for x in range(w):
                    bit = x * bpp
                    line.append(
                        (payload[base + (bit >> 3)] >> (8 - bpp - (bit & 7)))
                        & maxv
                    )
                grid.append(line)
            return to_gray(grid, bottom_up=not top_down)
        if (compression, bpp) in ((1, 8), (2, 4)):
            # RLE coordinates are always bottom-up per spec
            grid = _bmp_rle_decode(payload, data_off, w, h, rle4=bpp == 4)
            if grid is None:
                return None
            return to_gray(grid, bottom_up=True)
        return None
    if bpp not in (24, 32) or compression != 0:
        return None
    step = bpp // 8
    row_bytes = (w * step + 3) & ~3  # rows pad to 4 bytes
    if data_off + row_bytes * h > len(payload):
        return None
    rows = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        off = data_off + src_y * row_bytes
        rows.append(
            [luma(*payload[off + step * x : off + step * x + 3]) for x in range(w)]
        )
    return w, h, rows


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # gray, rgb, palette, gray+a, rgba


_PNG_DEPTHS = {  # legal bit depths per color type (PNG spec §11.2.2)
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass geometry: (x_start, y_start, x_step, y_step), spec §8.2
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(line: bytearray, prev: bytes, ftype: int, bpp: int) -> bool:
    """In-place scanline unfilter (the five PNG §9 filters); False on an
    unknown filter type."""
    n = len(line)
    if ftype == 0:
        return True
    if ftype == 1:  # Sub
        for i in range(bpp, n):
            line[i] = (line[i] + line[i - bpp]) & 0xFF
    elif ftype == 2:  # Up
        for i in range(n):
            line[i] = (line[i] + prev[i]) & 0xFF
    elif ftype == 3:  # Average
        for i in range(n):
            left = line[i - bpp] if i >= bpp else 0
            line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
    elif ftype == 4:  # Paeth
        for i in range(n):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[i] = (line[i] + pred) & 0xFF
    else:
        return False
    return True


def _png_line_gray(line, pw: int, depth: int, ctype: int, plte):
    """One unfiltered scanline → ``pw`` gray values (0-255). 16-bit samples
    keep their high byte; sub-8-bit gray scales to full range; palette
    indexes map through the PLTE luma table."""
    if depth >= 8:
        ch = _PNG_CHANNELS[ctype]
        step = ch * (depth // 8)
        if ctype in (0, 4):
            return [line[i] for i in range(0, pw * step, step)]
        if ctype == 3:
            return [
                plte[line[i]] if line[i] < len(plte) else 0 for i in range(pw)
            ]
        g = depth // 8  # byte gap between color samples
        return [
            (line[i] * 299 + line[i + g] * 587 + line[i + 2 * g] * 114) // 1000
            for i in range(0, pw * step, step)
        ]
    maxv = (1 << depth) - 1
    out = []
    for i in range(pw):
        bit = i * depth
        v = (line[bit >> 3] >> (8 - depth - (bit & 7))) & maxv
        if ctype == 3:
            out.append(plte[v] if v < len(plte) else 0)
        else:
            out.append(v * 255 // maxv)
    return out


def decode_png_pixels(payload: bytes):
    """PNG → (width, height, gray rows top-down), from the public spec:
    all five scanline filters (§9), every legal color-type/bit-depth combo
    (gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8 via PLTE, gray+alpha and
    RGBA 8/16 — alpha ignored for luma), and Adam7 interlacing (§8.2).
    Returns None for malformed files."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w = 8, None
    idat = bytearray()
    plte_rgb = None
    try:
        while pos + 8 <= len(payload):
            length, tag = struct.unpack_from(">I4s", payload, pos)
            body = payload[pos + 8 : pos + 8 + length]
            if tag == b"IHDR":
                w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body[:13]
                )
                if (
                    depth not in _PNG_DEPTHS.get(ctype, ())
                    or interlace > 1
                    or not (0 < w and 0 < h and w * h <= _MAX_PIXELS)
                ):
                    return None
            elif tag == b"PLTE":
                plte_rgb = body
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + length
        if w is None or not idat:
            return None
        if ctype == 3:
            if plte_rgb is None or len(plte_rgb) % 3:
                return None
            plte = [
                (plte_rgb[i] * 299 + plte_rgb[i + 1] * 587 + plte_rgb[i + 2] * 114)
                // 1000
                for i in range(0, len(plte_rgb), 3)
            ]
        else:
            plte = ()
        ch = _PNG_CHANNELS[ctype]
        bits_pp = ch * depth
        bpp = max(1, bits_pp // 8)  # filter byte offset (spec §9)
        if interlace:  # Adam7: per-pass sub-image geometry
            passes = []
            for x0, y0, dx, dy in _PNG_ADAM7:
                pw = (w - x0 + dx - 1) // dx
                ph = (h - y0 + dy - 1) // dy
                if pw > 0 and ph > 0:
                    passes.append((x0, y0, dx, dy, pw, ph))
        else:
            passes = [(0, 0, 1, 1, w, h)]
        # Cap the inflate at the declared raster size: a forged IDAT with a
        # ~1000:1 zlib ratio must not allocate beyond the raster bytes.
        want = sum(
            ph * (1 + (pw * bits_pp + 7) // 8) for _, _, _, _, pw, ph in passes
        )
        dec = zlib.decompressobj()
        # want+1 so a stream that ends exactly at `want` drains its trailer;
        # any byte past `want` means the IDAT lies about the raster size.
        raw = dec.decompress(bytes(idat), want + 1)
        if len(raw) != want:
            return None
    except (struct.error, zlib.error, ValueError):
        return None
    rows = [[0] * w for _ in range(h)]
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        stride = (pw * bits_pp + 7) // 8
        prev = bytearray(stride)
        for j in range(ph):
            ftype = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            off += 1 + stride
            if not _png_unfilter(line, prev, ftype, bpp):
                return None
            prev = line
            y = y0 + j * dy
            row = rows[y]
            for i, g in enumerate(_png_line_gray(line, pw, depth, ctype, plte)):
                row[x0 + i * dx] = g
    return w, h, rows


# ---------------------------------------------------------------------------
# WebP: pure-struct header dimensions + REAL pixel decode through the
# system libwebp (round 14 — the one authoritative codec implementation
# present in this sandbox; ctypes binding, no from-memory tables)
# ---------------------------------------------------------------------------

class _ProcessLocalCache(dict):
    """Codec library handles (ctypes CDLLs and generated Structure
    classes) are process-local and UNPICKLABLE — and the functions in
    this module ship to executor Python workers BY VALUE (the package is
    cloudpickle-registered), which serializes every referenced module
    global. This cache therefore unpickles EMPTY: a driver that decoded
    something (tests, REPL) never poisons the serialized closure, and
    each worker re-dlopens lazily on its first decode (one dlopen per
    process — noise next to the Arrow batch it is about to chew)."""

    def __reduce__(self):
        return (self.__class__, ())


_CODEC_CACHE = _ProcessLocalCache()


import contextlib as _contextlib


@_contextlib.contextmanager
def _quiet_native_stderr():
    """Point fd 2 at /dev/null for the duration of a native codec call.

    libaom/dav1d (under libavif/libheif) print parse diagnostics like
    "Error parsing OBU data" straight to the C stderr when fed a hostile
    bitstream — by design we feed them hostile bitstreams (corrupt-input
    oracles, fuzz rows), which pollutes bench/driver artifact tails. The
    redirect is fd-level (C writes bypass sys.stderr), two dup2 syscalls
    per decode, and restored in finally. Executor Python workers run one
    task at a time so the process-global swap cannot clobber concurrent
    output; on any OS error the decode proceeds unsilenced."""
    import os as _os

    try:
        saved = _os.dup(2)
    except OSError:
        yield
        return
    try:
        devnull = _os.open(_os.devnull, _os.O_WRONLY)
    except OSError:
        _os.close(saved)
        yield
        return
    try:
        _os.dup2(devnull, 2)
        yield
    finally:
        _os.dup2(saved, 2)
        _os.close(saved)
        _os.close(devnull)


def _load_libwebp():
    """The system libwebp via ctypes, or None when absent. Cached; the
    soname is tried first (no dev symlink needed), then find_library."""
    if "webp" in _CODEC_CACHE:
        return _CODEC_CACHE["webp"]
    import ctypes
    import ctypes.util

    lib = None
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.dylib"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        found = ctypes.util.find_library("webp")
        if found:
            try:
                lib = ctypes.CDLL(found)
            except OSError:
                lib = None
    if lib is not None:
        import ctypes as ct

        lib.WebPGetInfo.restype = ct.c_int
        lib.WebPGetInfo.argtypes = [
            ct.c_char_p, ct.c_size_t, ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ct.POINTER(ct.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ct.c_char_p, ct.c_size_t, ct.POINTER(ct.c_int), ct.POINTER(ct.c_int),
        ]
        lib.WebPEncodeLosslessRGBA.restype = ct.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ct.c_char_p, ct.c_int, ct.c_int, ct.c_int,
            ct.POINTER(ct.POINTER(ct.c_uint8)),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ct.c_void_p]
    _CODEC_CACHE["webp"] = lib
    return lib


def decode_webp_rgba(
    payload: bytes, *, max_pixels: int = 1 << 26
) -> tuple[int, int, bytes] | None:
    """(width, height, RGBA bytes) via the system libwebp, or None when
    the payload is not decodable WebP. Raises NotImplementedError when no
    libwebp is present (the seam convention: loud, never silently wrong;
    callers' row loops convert it into NULL columns).

    Hostile posture: WebPGetInfo (header-only) gates the pixel decode so
    a forged 16383x16383 header can't make the library allocate a 1 GiB
    raster inside an executor — payloads over ``max_pixels`` (default
    64 Mpx ≈ 256 MiB RGBA) return None like any other undecodable blob."""
    import ctypes

    lib = _load_libwebp()
    if lib is None:
        raise NotImplementedError(
            "WebP pixel decode needs libwebp — not found on this system"
        )
    if len(payload) < 30 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    if not lib.WebPGetInfo(payload, len(payload), ctypes.byref(w), ctypes.byref(h)):
        return None
    if w.value <= 0 or h.value <= 0 or w.value * h.value > max_pixels:
        return None
    ptr = lib.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    if not ptr:
        return None
    try:
        return w.value, h.value, ctypes.string_at(ptr, w.value * h.value * 4)
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))


def encode_webp_lossless_rgba(w: int, h: int, rgba: bytes) -> bytes | None:
    """Lossless WebP bytes for an RGBA raster via the system libwebp (the
    test/fixture inverse of :func:`decode_webp_rgba` — round-tripping
    through the authoritative codec is what makes planted WebP oracles
    closed-form: lossless means the decoded pixels ARE the planted grid).
    None on encode failure; NotImplementedError without libwebp."""
    import ctypes

    lib = _load_libwebp()
    if lib is None:
        raise NotImplementedError(
            "WebP encode needs libwebp — not found on this system"
        )
    if len(rgba) != w * h * 4:
        raise ValueError(f"rgba length {len(rgba)} != {w}x{h}x4")
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    if not size or not out:
        return None
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))


def decode_webp_gray_pixels(payload: bytes):
    """WebP → (w, h, 2-D int64 gray array) through libwebp, using the same
    ITU-R 601 integer luma as every other decoder here ((r·299 + g·587 +
    b·114) // 1000, alpha ignored). None for undecodable payloads;
    NotImplementedError without libwebp."""
    decoded = decode_webp_rgba(payload)
    if decoded is None:
        return None
    import numpy as np

    w, h, rgba = decoded
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4).astype(np.int64)
    gray = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return w, h, gray


# ---------------------------------------------------------------------------
# AVIF / HEIC: REAL pixel decode through the system libheif / libavif
# (round 15 — the libwebp ctypes precedent applied to the two formats a
# modern web crawl sees most after JPEG/PNG/WebP; the authoritative public
# implementations are present in this environment, no from-memory tables)
# ---------------------------------------------------------------------------

# still-picture brands only: MP4/MOV video brands must NOT route here
_HEIF_IMAGE_BRANDS = frozenset(
    ("avif", "avis", "heic", "heix", "heim", "heis",
     "hevc", "hevx", "mif1", "msf1")
)

_HEIF_COLORSPACE_RGB = 1
_HEIF_COLORSPACE_MONO = 2
_HEIF_CHROMA_MONO = 0
_HEIF_CHROMA_RGBA = 11
_HEIF_CHANNEL_Y = 0
_HEIF_CHANNEL_INTERLEAVED = 10
_HEIF_COMPRESSION = {"heic": 1, "avif": 4}  # heif_compression_format

def _load_libheif():
    """The system libheif via ctypes, or None when absent. Cached (in the
    process-local codec cache — see _ProcessLocalCache). All of libheif's
    public API is opaque pointers + accessor functions — the only
    by-value struct is the 16-byte heif_error (int, int, char*), stable
    since 1.0 — so unlike libavif there is no version-dependent struct
    layout to get wrong."""
    if "heif" in _CODEC_CACHE:
        return _CODEC_CACHE["heif"]
    import ctypes as ct
    import ctypes.util

    lib = None
    for name in ("libheif.so.1", "libheif.so", "libheif.dylib"):
        try:
            lib = ct.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library("heif")
        if found:
            try:
                lib = ct.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        _CODEC_CACHE["heif"] = None
        return None

    class HeifError(ct.Structure):
        _fields_ = [
            ("code", ct.c_int),
            ("subcode", ct.c_int),
            ("message", ct.c_char_p),
        ]

    vp = ct.c_void_p
    lib.heif_context_alloc.restype = vp
    lib.heif_context_free.argtypes = [vp]
    lib.heif_context_read_from_memory_without_copy.restype = HeifError
    lib.heif_context_read_from_memory_without_copy.argtypes = [
        vp, ct.c_char_p, ct.c_size_t, vp,
    ]
    lib.heif_context_get_primary_image_handle.restype = HeifError
    lib.heif_context_get_primary_image_handle.argtypes = [vp, ct.POINTER(vp)]
    lib.heif_image_handle_get_width.restype = ct.c_int
    lib.heif_image_handle_get_width.argtypes = [vp]
    lib.heif_image_handle_get_height.restype = ct.c_int
    lib.heif_image_handle_get_height.argtypes = [vp]
    lib.heif_image_handle_release.argtypes = [vp]
    lib.heif_decode_image.restype = HeifError
    lib.heif_decode_image.argtypes = [vp, ct.POINTER(vp), ct.c_int, ct.c_int, vp]
    lib.heif_image_get_plane_readonly.restype = ct.POINTER(ct.c_uint8)
    lib.heif_image_get_plane_readonly.argtypes = [vp, ct.c_int, ct.POINTER(ct.c_int)]
    lib.heif_image_release.argtypes = [vp]
    # encode side (the fixture/test inverse)
    lib.heif_context_get_encoder_for_format.restype = HeifError
    lib.heif_context_get_encoder_for_format.argtypes = [vp, ct.c_int, ct.POINTER(vp)]
    lib.heif_encoder_set_lossless.restype = HeifError
    lib.heif_encoder_set_lossless.argtypes = [vp, ct.c_int]
    lib.heif_encoder_release.argtypes = [vp]
    lib.heif_image_create.restype = HeifError
    lib.heif_image_create.argtypes = [ct.c_int, ct.c_int, ct.c_int, ct.c_int, ct.POINTER(vp)]
    lib.heif_image_add_plane.restype = HeifError
    lib.heif_image_add_plane.argtypes = [vp, ct.c_int, ct.c_int, ct.c_int, ct.c_int]
    lib.heif_image_get_plane.restype = ct.POINTER(ct.c_uint8)
    lib.heif_image_get_plane.argtypes = [vp, ct.c_int, ct.POINTER(ct.c_int)]
    lib.heif_context_encode_image.restype = HeifError
    lib.heif_context_encode_image.argtypes = [vp, vp, vp, vp, ct.POINTER(vp)]
    lib.heif_context_write_to_file.restype = HeifError
    lib.heif_context_write_to_file.argtypes = [vp, ct.c_char_p]
    _CODEC_CACHE["heif"] = lib
    return lib


def _isobmff_pixel_gate(payload: bytes, max_pixels: int) -> bool:
    """Pre-decode bomb gate from our own pure-struct ISO-BMFF walk: the
    ispe box states the coded dimensions, so a forged 65535x65535 header
    is rejected BEFORE any codec allocates a raster. Files without ispe
    (malformed for coded AVIF/HEIC items, which require it) fail the
    gate."""
    info = sniff_isobmff(payload)
    if not info or "width" not in info:
        return False
    return 0 < info["width"] * info["height"] <= max_pixels


def decode_heif_rgba(
    payload: bytes, *, max_pixels: int = 1 << 26
) -> tuple[int, int, bytes] | None:
    """(width, height, RGBA bytes) for a HEIC/AVIF payload via the system
    libheif (primary item, with the container's irot/imir orientation
    transforms applied by the library), or None when not decodable.
    Raises NotImplementedError when no libheif is present (the seam
    convention: loud, never silently wrong; callers' row loops convert it
    into NULL columns).

    Hostile posture: our own ispe header walk gates the pixel decode (see
    _isobmff_pixel_gate), the decoded handle dimensions are re-checked,
    and every libheif error returns None — junk yields NULL, never an
    exception or an oversized allocation."""
    import ctypes as ct

    lib = _load_libheif()
    if lib is None:
        raise NotImplementedError(
            "HEIC/AVIF pixel decode needs libheif — not found on this system"
        )
    if (
        len(payload) < 16
        or payload[4:8] != b"ftyp"
        or payload[8:12].decode("latin-1").strip() not in _HEIF_IMAGE_BRANDS
    ):
        return None
    if not _isobmff_pixel_gate(payload, max_pixels):
        return None
    ctx = lib.heif_context_alloc()
    if not ctx:
        return None
    handle = ct.c_void_p()
    img = ct.c_void_p()
    try:
        # without_copy: libheif reads straight from the payload bytes,
        # which stay referenced for the whole context lifetime
        with _quiet_native_stderr():
            err = lib.heif_context_read_from_memory_without_copy(
                ctx, payload, len(payload), None
            )
        if err.code:
            return None
        err = lib.heif_context_get_primary_image_handle(ctx, ct.byref(handle))
        if err.code or not handle:
            return None
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if w <= 0 or h <= 0 or w * h > max_pixels:
            return None
        with _quiet_native_stderr():
            err = lib.heif_decode_image(
                handle,
                ct.byref(img),
                _HEIF_COLORSPACE_RGB,
                _HEIF_CHROMA_RGBA,
                None,
            )
        if err.code or not img:
            return None
        stride = ct.c_int(0)
        plane = lib.heif_image_get_plane_readonly(
            img, _HEIF_CHANNEL_INTERLEAVED, ct.byref(stride)
        )
        if not plane or stride.value < w * 4:
            return None
        base = ct.addressof(plane.contents)
        out = b"".join(
            ct.string_at(base + y * stride.value, w * 4) for y in range(h)
        )
        return w, h, out
    finally:
        if img:
            lib.heif_image_release(img)
        if handle:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def _load_libavif():
    """The system libavif via ctypes, or None when absent OR when its
    version's avifRGBImage struct layout is unknown to us (0.11.x and
    1.x are supported; anything else falls back to the libheif path,
    which decodes AVIF through the same dav1d). Unlike libheif, libavif's
    API hands the caller a real struct to fill, so the layout IS
    version-dependent: 1.0 inserted ``maxThreads`` before ``pixels``. A
    trailing pad absorbs any future growth, and decode_avif_rgba
    validates the layout by round-tripping dimensions through
    avifRGBImageSetDefaults before trusting the pixel pointer."""
    if "avif" in _CODEC_CACHE:
        return _CODEC_CACHE["avif"]
    import ctypes as ct
    import ctypes.util

    lib = None
    for name in ("libavif.so.15", "libavif.so.16", "libavif.so", "libavif.dylib"):
        try:
            lib = ct.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        found = ctypes.util.find_library("avif")
        if found:
            try:
                lib = ct.CDLL(found)
            except OSError:
                lib = None
    if lib is None:
        _CODEC_CACHE["avif"] = None
        return None
    lib.avifVersion.restype = ct.c_char_p
    ver = lib.avifVersion().decode("latin-1", errors="replace")
    head = [
        ("width", ct.c_uint32), ("height", ct.c_uint32), ("depth", ct.c_uint32),
        ("format", ct.c_int), ("chromaUpsampling", ct.c_int),
        ("chromaDownsampling", ct.c_int), ("avoidLibYUV", ct.c_int),
        ("ignoreAlpha", ct.c_int), ("alphaPremultiplied", ct.c_int),
        ("isFloat", ct.c_int),
    ]
    if ver.startswith("1."):
        head.append(("maxThreads", ct.c_int))  # added in 1.0
    elif not ver.startswith("0.11"):
        _CODEC_CACHE["avif"] = None
        return None  # unknown layout: let the libheif path handle AVIF
    tail = [
        ("pixels", ct.POINTER(ct.c_uint8)),
        ("rowBytes", ct.c_uint32),
        ("_pad", ct.c_uint8 * 256),  # absorbs future field growth
    ]

    class AvifRGBImage(ct.Structure):
        _fields_ = head + tail

    vp = ct.c_void_p
    lib.avifDecoderCreate.restype = vp
    lib.avifDecoderDestroy.argtypes = [vp]
    lib.avifImageCreateEmpty.restype = vp
    lib.avifImageDestroy.argtypes = [vp]
    lib.avifDecoderReadMemory.restype = ct.c_int
    lib.avifDecoderReadMemory.argtypes = [vp, vp, ct.c_char_p, ct.c_size_t]
    lib.avifRGBImageSetDefaults.restype = None
    lib.avifRGBImageSetDefaults.argtypes = [ct.POINTER(AvifRGBImage), vp]
    # returns avifResult in >=1.0, void in 0.11 — treated as unreliable;
    # success is judged by rgb.pixels being non-NULL
    lib.avifRGBImageAllocatePixels.restype = ct.c_int
    lib.avifRGBImageAllocatePixels.argtypes = [ct.POINTER(AvifRGBImage)]
    lib.avifRGBImageFreePixels.restype = None
    lib.avifRGBImageFreePixels.argtypes = [ct.POINTER(AvifRGBImage)]
    lib.avifImageYUVToRGB.restype = ct.c_int
    lib.avifImageYUVToRGB.argtypes = [vp, ct.POINTER(AvifRGBImage)]
    _CODEC_CACHE["avif_rgb"] = AvifRGBImage
    _CODEC_CACHE["avif"] = lib
    return lib


def decode_avif_rgba(
    payload: bytes, *, max_pixels: int = 1 << 26
) -> tuple[int, int, bytes] | None:
    """(width, height, RGBA bytes) for an AVIF payload, preferring the
    system libavif (the format's reference library) and falling back to
    libheif's AV1 path when libavif is absent or of an unknown version.
    NotImplementedError only when NEITHER library is present. Same
    hostile posture as decode_heif_rgba: our own ispe walk gates the
    decode, libavif errors return None, and the avifRGBImage layout is
    validated by checking SetDefaults round-trips the decoded dimensions
    before the pixel pointer is trusted."""
    import ctypes as ct

    lib = _load_libavif()
    if lib is None:
        return decode_heif_rgba(payload, max_pixels=max_pixels)
    if (
        len(payload) < 16
        or payload[4:8] != b"ftyp"
        or payload[8:12].decode("latin-1").strip() not in ("avif", "avis")
    ):
        return None
    if not _isobmff_pixel_gate(payload, max_pixels):
        return None
    dec = lib.avifDecoderCreate()
    img = lib.avifImageCreateEmpty()
    if not dec or not img:
        return None
    rgb = None
    try:
        with _quiet_native_stderr():
            rc = lib.avifDecoderReadMemory(dec, img, payload, len(payload))
        if rc:
            return None
        dims = ct.cast(img, ct.POINTER(ct.c_uint32))  # width, height lead
        w, h = int(dims[0]), int(dims[1])  # the avifImage struct in every version
        if w <= 0 or h <= 0 or w * h > max_pixels:
            return None
        rgb = _CODEC_CACHE["avif_rgb"]()
        lib.avifRGBImageSetDefaults(ct.byref(rgb), img)
        if rgb.width != w or rgb.height != h:
            return None  # layout mismatch: never touch the pixel pointer
        rgb.format = 1  # AVIF_RGB_FORMAT_RGBA
        rgb.depth = 8
        lib.avifRGBImageAllocatePixels(ct.byref(rgb))
        if not rgb.pixels or rgb.rowBytes < w * 4:
            # leave rgb bound so the finally block frees any allocated pixels
            return None
        if lib.avifImageYUVToRGB(img, ct.byref(rgb)):
            return None
        base = ct.addressof(rgb.pixels.contents)
        out = b"".join(
            ct.string_at(base + y * rgb.rowBytes, w * 4) for y in range(h)
        )
        return w, h, out
    finally:
        if rgb is not None and rgb.pixels:
            lib.avifRGBImageFreePixels(ct.byref(rgb))
        lib.avifImageDestroy(img)
        lib.avifDecoderDestroy(dec)


def encode_heif_lossless_mono(
    w: int, h: int, gray_rows, *, codec: str = "heic"
) -> bytes | None:
    """Losslessly-coded monochrome HEIC (``codec="heic"``, HEVC via x265)
    or AVIF (``codec="avif"``, AV1 via aom) bytes for an 8-bit gray
    raster, via the system libheif — the test/fixture inverse of
    decode_heif_rgba/decode_avif_rgba. Monochrome + lossless means the
    decoded RGBA has R=G=B=exactly the planted gray (no YUV matrix
    touches the samples), so planted oracles stay closed-form like
    mm_webp_dhash's. None on encode failure; NotImplementedError without
    libheif."""
    import ctypes as ct
    import os
    import tempfile

    lib = _load_libheif()
    if lib is None:
        raise NotImplementedError(
            "HEIC/AVIF encode needs libheif — not found on this system"
        )
    ctx = lib.heif_context_alloc()
    img = ct.c_void_p()
    enc = ct.c_void_p()
    handle = ct.c_void_p()
    try:
        err = lib.heif_image_create(
            w, h, _HEIF_COLORSPACE_MONO, _HEIF_CHROMA_MONO, ct.byref(img)
        )
        if err.code or not img:
            return None
        if lib.heif_image_add_plane(img, _HEIF_CHANNEL_Y, w, h, 8).code:
            return None
        stride = ct.c_int(0)
        plane = lib.heif_image_get_plane(img, _HEIF_CHANNEL_Y, ct.byref(stride))
        if not plane:
            return None
        base = ct.addressof(plane.contents)
        for y in range(h):
            ct.memmove(base + y * stride.value, bytes(gray_rows[y][:w]), w)
        err = lib.heif_context_get_encoder_for_format(
            ctx, _HEIF_COMPRESSION[codec], ct.byref(enc)
        )
        if err.code or not enc:
            return None
        if lib.heif_encoder_set_lossless(enc, 1).code:
            return None
        if lib.heif_context_encode_image(ctx, img, enc, None, ct.byref(handle)).code:
            return None
        fd, fn = tempfile.mkstemp(suffix=".heif")
        os.close(fd)
        try:
            if lib.heif_context_write_to_file(ctx, fn.encode()).code:
                return None
            with open(fn, "rb") as f:
                return f.read()
        finally:
            os.unlink(fn)
    finally:
        if handle:
            lib.heif_image_handle_release(handle)
        if enc:
            lib.heif_encoder_release(enc)
        if img:
            lib.heif_image_release(img)
        lib.heif_context_free(ctx)


def decode_heif_gray_pixels(payload: bytes):
    """AVIF/HEIC → (w, h, 2-D int64 gray array), routing avif/avis brands
    through libavif and the HEIC family through libheif, with the same
    ITU-R 601 integer luma as every other decoder here ((r·299 + g·587 +
    b·114) // 1000, alpha ignored — exact for monochrome sources since
    299+587+114=1000). None for undecodable payloads; NotImplementedError
    when the needed library is missing."""
    brand = payload[8:12].decode("latin-1").strip() if len(payload) >= 12 else ""
    if brand in ("avif", "avis"):
        decoded = decode_avif_rgba(payload)
    else:
        decoded = decode_heif_rgba(payload)
    if decoded is None:
        return None
    import numpy as np

    w, h, rgba = decoded
    px = np.frombuffer(rgba, dtype=np.uint8).reshape(h, w, 4).astype(np.int64)
    gray = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return w, h, gray


def decode_ico_pixels(payload: bytes):
    """(w, h, gray rows) of the LARGEST entry in an ICO/CUR container —
    pure reuse: an entry's payload is either a PNG file (Vista+ icons,
    routed to decode_png_pixels) or a headerless BMP DIB whose biHeight
    doubles the real height (XOR raster + AND transparency mask stacked
    bottom-up). The DIB gains a synthesized BITMAPFILEHEADER with the
    height patched back to the XOR half — the mask rows sit above the
    halved height in bottom-up order, so decode_bmp_pixels never reads
    them. Hostile posture: entry offsets/sizes bounds-checked, malformed
    entries skipped, anything undecodable yields None."""
    import struct as _s

    if len(payload) < 22 or payload[:4] not in (
        b"\x00\x00\x01\x00", b"\x00\x00\x02\x00",
    ):
        return None
    (count,) = _s.unpack("<H", payload[4:6])
    best = None
    for k in range(min(count, 64)):
        e = 6 + 16 * k
        if e + 16 > len(payload):
            break
        w = payload[e] or 256
        h = payload[e + 1] or 256
        size, off = _s.unpack("<II", payload[e + 8 : e + 16])
        if 0 < off < len(payload) and (
            best is None or w * h > best[0] * best[1]
        ):
            best = (w, h, off, min(size, len(payload) - off))
    if best is None:
        return None
    w, h, off, size = best
    blob = payload[off : off + size]
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png_pixels(blob)
    if len(blob) < 40:
        return None
    bisize, = _s.unpack("<I", blob[0:4])
    if bisize < 40 or bisize > len(blob):
        return None
    bpp, = _s.unpack("<H", blob[14:16])
    comp, = _s.unpack("<I", blob[16:20])
    clr_used, = _s.unpack("<I", blob[32:36])
    dib = bytearray(blob)
    _s.pack_into("<i", dib, 8, h)  # biHeight back to the XOR half
    ncolors = clr_used or ((1 << bpp) if bpp <= 8 else 0)
    off_bits = 14 + bisize + 4 * ncolors + (12 if comp == 3 else 0)
    bmp = b"BM" + _s.pack("<IHHI", 14 + len(dib), 0, 0, off_bits) + bytes(dib)
    return decode_bmp_pixels(bmp)


def decode_gray_pixels(payload: bytes, *, as_array: bool = False):
    """Magic-dispatching pixel decode: BMP, PNG, GIF, JPEG (baseline +
    progressive), baseline TIFF (from-spec pure Python), ICO/CUR (largest
    entry, via the PNG/BMP decoders), WebP (REAL decode through the
    system libwebp), or AVIF/HEIC (REAL decode through the system
    libavif/libheif, round 15) → (w, h, gray rows). Codec-library formats
    raise NotImplementedError when their library is missing, so an absent
    codec is loud, never a silent miss; None when the format has no
    decoder here.

    ``as_array=True`` returns the raster as a 2-D int64 numpy array with
    identical values — the dHash hot path uses it so ``_box_resample``'s
    summed-area-table branch triggers instead of the Python list path
    (JPEG skips its tolist entirely; the other decoders' rasters convert
    once, C-level)."""
    if payload[:2] == b"BM":
        out = decode_bmp_pixels(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        out = decode_png_pixels(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        out = decode_gif_pixels(payload)
    elif payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg_pixels(payload, as_array=as_array)
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        out = decode_tiff_pixels(payload)
    elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        decoded = decode_webp_gray_pixels(payload)  # already an int64 array
        if decoded is None or as_array:
            return decoded
        w, h, gray = decoded
        return w, h, gray.tolist()
    elif (
        len(payload) >= 16
        and payload[4:8] == b"ftyp"
        and payload[8:12].decode("latin-1").strip() in _HEIF_IMAGE_BRANDS
    ):
        decoded = decode_heif_gray_pixels(payload)  # already an int64 array
        if decoded is None or as_array:
            return decoded
        w, h, gray = decoded
        return w, h, gray.tolist()
    elif payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00"):
        out = decode_ico_pixels(payload)  # ICO/CUR: largest entry
    else:
        return None
    if out is None or not as_array:
        return out
    import numpy as np

    w, h, rows = out
    return w, h, np.asarray(rows, dtype=np.int64)


def _box_resample(rows, w: int, h: int, out_w: int, out_h: int):
    """Integer box resample to (out_w, out_h) — floor-mean of each source
    box. Deterministic (pure integer arithmetic), no codec dependency.

    Two exact-identical paths: an int64 summed-area table when ``rows``
    is already a numpy array, and C-level builtin ``sum`` over row
    slices for the decoders' list-of-lists rasters (converting a
    megapixel nested list to numpy costs more than the resample itself —
    the per-pixel Python loop this replaces dominated dHash once
    JPEG/TIFF started decoding full-resolution rasters)."""
    import numpy as np

    xs = [
        (ox * w // out_w, max((ox + 1) * w // out_w, ox * w // out_w + 1))
        for ox in range(out_w)
    ]
    ys = [
        (oy * h // out_h, max((oy + 1) * h // out_h, oy * h // out_h + 1))
        for oy in range(out_h)
    ]
    if isinstance(rows, np.ndarray):
        px = rows.astype(np.int64, copy=False)
        sat = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(px, axis=0), axis=1, out=sat[1:, 1:])
        y0 = np.array([y[0] for y in ys])
        y1 = np.array([y[1] for y in ys])
        x0 = np.array([x[0] for x in xs])
        x1 = np.array([x[1] for x in xs])
        sums = (
            sat[np.ix_(y1, x1)]
            - sat[np.ix_(y0, x1)]
            - sat[np.ix_(y1, x0)]
            + sat[np.ix_(y0, x0)]
        )
        return (sums // np.outer(y1 - y0, x1 - x0)).tolist()
    out = []
    for y0, y1 in ys:
        band = rows[y0:y1]
        out.append(
            [
                sum(sum(r[x0:x1]) for r in band) // ((y1 - y0) * (x1 - x0))
                for x0, x1 in xs
            ]
        )
    return out


def _orient_rows(rows, orientation: int):
    """Apply an EXIF orientation (tag 274, values 2-8) to row-major pixel
    rows so the result is upright — the same transforms PIL's
    exif_transpose applies (flips, 90/180/270 rotations, transpose /
    transverse). A numpy raster stays numpy (views, no copy) so the
    summed-area resample path survives orientation."""
    import numpy as np

    if isinstance(rows, np.ndarray):
        if orientation == 2:
            return rows[:, ::-1]
        if orientation == 3:
            return rows[::-1, ::-1]
        if orientation == 4:
            return rows[::-1, :]
        if orientation == 5:
            return rows.T
        if orientation == 6:
            return rows[::-1, :].T
        if orientation == 7:
            return rows[::-1, ::-1].T
        if orientation == 8:
            return rows.T[::-1, :]
        return rows
    if orientation == 2:  # mirror horizontal
        return [list(reversed(r)) for r in rows]
    if orientation == 3:  # rotate 180
        return [list(reversed(r)) for r in reversed(rows)]
    if orientation == 4:  # mirror vertical
        return [list(r) for r in reversed(rows)]
    if orientation == 5:  # transpose (main diagonal)
        return [list(c) for c in zip(*rows)]
    if orientation == 6:  # stored needs 90° CW to display upright
        return [list(c) for c in zip(*reversed(rows))]
    if orientation == 7:  # transverse (anti-diagonal)
        return [list(c) for c in zip(*[list(reversed(r)) for r in reversed(rows)])]
    if orientation == 8:  # stored needs 90° CCW to display upright
        return [list(c) for c in zip(*rows)][::-1]
    return rows


def dhash64(payload: bytes) -> int | None:
    """64-bit difference hash (the standard perceptual near-dup hash):
    grayscale → EXIF-orientation normalization (a rotated/flipped copy of
    an image hashes identically to the upright original) → 9x8 box
    resample → bit = left pixel > right neighbor, row-major, MSB first.
    None when pixels can't be decoded without a codec library."""
    decoded = decode_gray_pixels(payload, as_array=True)
    if decoded is None:
        return None
    w, h, rows = decoded
    if payload[:3] == b"\xff\xd8\xff" or payload[:4] in (b"II*\x00", b"MM\x00*"):
        o = exif_orientation(payload)
        if o and o != 1:
            rows = _orient_rows(rows, o)
            h, w = len(rows), len(rows[0])
    if w < 2 or h < 1:
        return None
    grid = _box_resample(rows, w, h, 9, 8)
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if grid[y][x] > grid[y][x + 1] else 0)
    return bits


def audio_fingerprint(payload: bytes, *, frames: int = 8, bands: int = 8) -> int | None:
    """64-bit spectral-peak fingerprint over real PCM WAV audio: the signal
    splits into ``frames`` equal time frames; each frame's rFFT energy is
    summed into ``bands`` equal-width frequency bands (0 .. Nyquist), and
    bit (f, b) is set when band b carries more than 1/4 of frame f's total
    spectral energy — a dominant-band one-hot per frame, robust to FFT
    leakage (leakage never approaches the 25% cut). The same shape as the
    image dHash (8x8 bits), so ``dhash_near_dup``'s banded Hamming join
    pairs near-identical audio the same way. Accepts PCM / G.711
    µ-law+A-law / IMA-ADPCM WAV, FLAC, big- and little-endian AIFF
    (all from-spec; the lossless paths fingerprint identically to the
    same audio's PCM, and G.711's broadband quantization noise never
    approaches the 25% cut), and MPEG-1 audio Layer I/II (from-spec
    bitstream decode — lossy broadcast audio joins the same dedup
    space; Layer III is scoped out, see
    ``decode_mpeg_audio_samples``). None for other payloads."""
    import numpy as np

    info = parse_wav(payload)
    if info is None and payload[:4] == b"fLaC":
        info = decode_flac_samples(payload)
    if info is None and payload[:4] == b"FORM":
        info = parse_aiff(payload)
    if info is None and payload[:1] in (b"\xff", b"I"):
        # MPEG-1 Layer I/II sync (0xFF) or a leading ID3v2 tag ('ID3')
        info = decode_mpeg_audio_samples(payload)
    if info is None or info["n_samples"] == 0:
        return None
    samples = info["samples"]
    if info["n_channels"] > 1:  # mixdown: mean over interleaved channels
        ch = info["n_channels"]
        usable = len(samples) - len(samples) % ch
        samples = samples[:usable].reshape(-1, ch).mean(axis=1)
    n = len(samples)
    if n < frames:
        return None
    bits = 0
    frame_len = n // frames
    for f in range(frames):
        seg = np.asarray(
            samples[f * frame_len : (f + 1) * frame_len], dtype=np.float64
        )
        energy = np.abs(np.fft.rfft(seg)) ** 2
        # drop the DC bin (a constant offset is not spectral content)
        energy = energy[1:]
        if len(energy) < bands:
            return None
        total = float(energy.sum())
        cut = len(energy) // bands
        for b in range(bands):
            seg_e = float(energy[b * cut : (b + 1) * cut].sum())
            bit = 1 if total > 0 and seg_e > total / 4 else 0
            bits = (bits << 1) | bit
    return bits


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF's variable-width LZW (GIF89a spec appendix F): codes start at
    min_code_size+1 bits, dictionary grows to 12 bits, CLEAR resets.
    Returns the index stream (list of palette indices) or None."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    prev: bytes | None = None
    acc = bits = 0
    pos = 0
    while pos < len(data) or bits >= code_size:
        while bits < code_size and pos < len(data):
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        if bits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        if len(out) > max_pixels:
            return None
        prev = entry
    return out


def decode_gif_pixels(payload: bytes):
    """GIF87a/89a first frame → (width, height, gray rows): logical-screen
    walk, global/local color tables, interlace reorder, from-spec LZW.
    Animated GIFs contribute their first image (the thumbnail/near-dup
    semantics Tika-based pipelines use). None for malformed streams."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    try:
        sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        global_table = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            global_table = payload[pos : pos + 3 * n]
            pos += 3 * n
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x21:  # extension: label + sub-blocks
                pos += 1
                while pos < len(payload) and payload[pos]:
                    pos += payload[pos] + 1
                pos += 1
            elif block == 0x2C:  # image descriptor
                _ix, _iy, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
                pos += 9
                table = global_table
                if iflags & 0x80:
                    n = 2 << (iflags & 7)
                    table = payload[pos : pos + 3 * n]
                    pos += 3 * n
                if table is None or not (0 < w and 0 < h and w * h <= _MAX_PIXELS):
                    return None
                min_code = payload[pos]
                pos += 1
                lzw = bytearray()
                while pos < len(payload) and payload[pos]:
                    size = payload[pos]
                    lzw += payload[pos + 1 : pos + 1 + size]
                    pos += size + 1
                if not (2 <= min_code <= 11):
                    return None
                idx = _gif_lzw_decode(bytes(lzw), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return None
                n_colors = len(table) // 3
                gray = [0] * n_colors
                for c in range(n_colors):
                    r, g, b = table[3 * c : 3 * c + 3]
                    gray[c] = (r * 299 + g * 587 + b * 114) // 1000
                rows = [[0] * w for _ in range(h)]
                if iflags & 0x40:  # interlaced: 4 passes
                    order = (
                        list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2))
                    )
                else:
                    order = list(range(h))
                i = 0
                for y in order:
                    for x in range(w):
                        ci = idx[i]
                        i += 1
                        rows[y][x] = gray[ci] if ci < n_colors else 0
                return w, h, rows
            elif block == 0x3B:  # trailer
                return None
            else:
                return None
    except (struct.error, IndexError):
        return None
    return None


def _gray_bmp_bytes(w: int, h: int, rows) -> bytes:
    """Encode a gray raster as an 8-bit paletted BMP (256-gray palette,
    bottom-up, rows padded to 4) — a LOSSLESS byte container for composited
    GIF canvases, so animated-GIF frames flow through the same
    ``dhash64``/``decode_gray_pixels`` path as every other image format
    (the gray palette makes decode's ITU-R 601 luma the identity)."""
    import struct

    data = bytearray()
    for y in range(h - 1, -1, -1):
        data += bytes(rows[y])
        data += b"\x00" * ((-w) % 4)
    pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
    off = 14 + 40 + len(pal)
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0, 256, 0)
        + pal
        + bytes(data)
    )


_GIF_PIXEL_BUDGET = 16_000_000  # total composited pixels per animation


def extract_gif_frames(payload: bytes, *, max_frames: int = 64):
    """Animated-GIF frame extraction (GIF89a spec): walks every image
    descriptor, composites each onto the logical-screen canvas honoring
    the Graphic Control Extension's transparency index and disposal
    method (1 = leave, 2 = restore background, 3 = restore previous),
    local/global color tables, per-image interlacing, and sub-screen
    image rects at their (left, top) offsets. Returns
    ``{"width", "height", "n_frames", "delays_cs", "frames"}`` where
    frames are LOSSLESS 8-bit gray BMP bytes of the composited canvas —
    the same per-frame contract as ``extract_avi_mjpeg_frames``, so the
    two feed ``video_frame_dhash`` interchangeably. None when the payload
    isn't GIF, is malformed, or holds fewer than 2 frames (stills stay on
    the image path). Bounded work on hostile bytes: frames cap at
    ``max_frames``, and — unlike the AVI/MOV walkers, whose frames are
    SLICES of the payload — GIF is a decompression AMPLIFIER (LZW
    inflate + BMP re-encode per frame), so TOTAL composited pixels
    across emitted frames cap at _GIF_PIXEL_BUDGET (a 64 Mpx canvas x
    64 frames would otherwise build ~4 GB of canvases from one crafted
    payload)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    try:
        sw, sh, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", payload, 6)
        # an animation needs >= 2 frames; a canvas whose 2-frame minimum
        # already exceeds the pixel budget can't be walked within bounds
        # (a max(budget, 2) floor here would quietly allow 2x_MAX_PIXELS)
        if not (0 < sw and 0 < sh and 2 * sw * sh <= _GIF_PIXEL_BUDGET):
            return None
        pos = 13
        global_table = None
        if flags & 0x80:
            n = 2 << (flags & 7)
            global_table = payload[pos : pos + 3 * n]
            pos += 3 * n
        bg_gray = 0
        if global_table is not None and 3 * bg_idx + 3 <= len(global_table):
            r, g, b = global_table[3 * bg_idx : 3 * bg_idx + 3]
            bg_gray = (r * 299 + g * 587 + b * 114) // 1000
        canvas = [[bg_gray] * sw for _ in range(sh)]
        frames: list[bytes] = []
        delays: list[int] = []
        budget = _GIF_PIXEL_BUDGET // (sw * sh)  # >= 2 by the check above
        # pending GCE state for the NEXT image (spec: GCE modifies exactly
        # one following rendering block)
        disposal, transparent, delay_cs = 0, None, 0
        while pos < len(payload) and len(frames) < min(max_frames, budget):
            block = payload[pos]
            pos += 1
            if block == 0x21:  # extension
                if pos >= len(payload):
                    return None
                label = payload[pos]
                pos += 1
                if label == 0xF9 and pos + 5 <= len(payload) and payload[pos] == 4:
                    gflags = payload[pos + 1]
                    delay_cs = struct.unpack_from("<H", payload, pos + 2)[0]
                    disposal = (gflags >> 2) & 7
                    transparent = payload[pos + 4] if gflags & 1 else None
                while pos < len(payload) and payload[pos]:
                    pos += payload[pos] + 1
                pos += 1
            elif block == 0x2C:  # image descriptor
                ix, iy, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
                pos += 9
                table = global_table
                if iflags & 0x80:
                    n = 2 << (iflags & 7)
                    table = payload[pos : pos + 3 * n]
                    pos += 3 * n
                if table is None or not (0 < w and 0 < h and w * h <= _MAX_PIXELS):
                    return None
                min_code = payload[pos]
                pos += 1
                lzw = bytearray()
                while pos < len(payload) and payload[pos]:
                    size = payload[pos]
                    lzw += payload[pos + 1 : pos + 1 + size]
                    pos += size + 1
                pos += 1  # block terminator
                if not (2 <= min_code <= 11):
                    return None
                idx = _gif_lzw_decode(bytes(lzw), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return None
                n_colors = len(table) // 3
                gray = [
                    (table[3 * c] * 299 + table[3 * c + 1] * 587
                     + table[3 * c + 2] * 114) // 1000
                    for c in range(n_colors)
                ]
                if iflags & 0x40:  # interlaced: 4 passes
                    order = (
                        list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2))
                    )
                else:
                    order = list(range(h))
                prev = [row[:] for row in canvas] if disposal == 3 else None
                i = 0
                for y in order:
                    cy = iy + y
                    row = canvas[cy] if 0 <= cy < sh else None
                    for x in range(w):
                        ci = idx[i]
                        i += 1
                        if ci == transparent or row is None:
                            continue
                        cx = ix + x
                        if 0 <= cx < sw:
                            row[cx] = gray[ci] if ci < n_colors else 0
                frames.append(_gray_bmp_bytes(sw, sh, canvas))
                delays.append(delay_cs)
                if disposal == 2:  # restore the image rect to background
                    for y in range(iy, min(iy + h, sh)):
                        for x in range(ix, min(ix + w, sw)):
                            canvas[y][x] = bg_gray
                elif disposal == 3 and prev is not None:
                    canvas = prev
                disposal, transparent, delay_cs = 0, None, 0
            elif block == 0x3B:  # trailer
                break
            else:
                return None
    except (struct.error, IndexError):
        return None
    if len(frames) < 2:
        return None
    return {
        "width": sw,
        "height": sh,
        "n_frames": len(frames),
        "delays_cs": delays,
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# Baseline-sequential JPEG pixel decode (ITU-T T.81 §F, from the public spec)
# ---------------------------------------------------------------------------

# zigzag position -> natural (row-major, row = vertical frequency) index
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_JPEG_IDCT_MAT = None  # lazy 8x8 DCT-basis matrix (needs numpy)


def _jpeg_idct_mat(np):
    """A[u, x] = c(u)/2 * cos((2x+1) u pi / 16) — the orthonormal 8-point
    DCT basis, so a 2-D block inverts as f = A.T @ F @ A (T.81 A.3.3)."""
    global _JPEG_IDCT_MAT
    if _JPEG_IDCT_MAT is None:
        import math

        a = np.zeros((8, 8))
        for u in range(8):
            cu = (0.5 / math.sqrt(2.0)) if u == 0 else 0.5
            for x in range(8):
                a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16.0)
        _JPEG_IDCT_MAT = a
    return _JPEG_IDCT_MAT


def _jpeg_huff_table(bits, vals):
    """Canonical JPEG Huffman table (T.81 Annex C code assignment):
    {(code_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                return None
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over an entropy-coded segment: un-stuffs
    0xFF 0x00, stops (sets .eof) at any real marker, and byte-aligns
    across RSTn restart markers."""

    __slots__ = ("data", "pos", "acc", "n", "eof")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.eof = False

    def bit(self) -> int:
        if self.n == 0:
            d = self.data
            p = self.pos
            if p >= len(d):
                self.eof = True
                return 0
            b = d[p]
            if b == 0xFF:
                nxt = d[p + 1] if p + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos = p + 2
                else:  # a real marker terminates this entropy segment
                    self.eof = True
                    return 0
            else:
                self.pos = p + 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> bool:
        """Discard pad bits, consume one RSTn marker; False when absent."""
        self.n = 0
        d = self.data
        p = self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1  # fill bytes before the marker
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
            self.eof = False
            return True
        return False


def _jpeg_decode_sym(br: _JpegBits, table) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: an s-bit magnitude whose top bit is 0 encodes
    a negative value offset by 2^s - 1."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


_MAX_PROGRESSIVE_PIXELS = 16_000_000  # 4k x 4k: coef buffer = 1 int / pixel


def _jpeg_parse_dqt(seg: bytes, qt: dict) -> bool:
    """DQT segment → 8-bit quant tables (zigzag order), possibly several."""
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 15
        if pq != 0 or i + 65 > len(seg):
            return False  # 16-bit tables imply 12-bit precision
        qt[tq] = list(seg[i + 1 : i + 65])
        i += 65
    return True


def _jpeg_parse_dht(seg: bytes, hdc: dict, hac: dict) -> bool:
    """DHT segment → canonical Huffman tables, possibly several."""
    i = 0
    while i + 17 <= len(seg):
        tc, th = seg[i] >> 4, seg[i] & 15
        bits = list(seg[i + 1 : i + 17])
        nv = sum(bits)
        if i + 17 + nv > len(seg) or tc > 1:
            return False
        tab = _jpeg_huff_table(bits, list(seg[i + 17 : i + 17 + nv]))
        if tab is None:
            return False
        (hdc if tc == 0 else hac)[th] = tab
        i += 17 + nv
    return True


def decode_jpeg_pixels(payload: bytes, *, as_array: bool = False):
    """Baseline-sequential JPEG (ITU-T T.81 §F) → (width, height, gray rows),
    luma only: the interleaved scan forces entropy-decoding EVERY component
    to stay bit-synchronized, but only the first (Y) component is
    dequantized + IDCT'd — chroma coefficients are decoded and dropped, so
    grayscale output costs no IDCT on Cb/Cr. Handles SOF0/SOF1 Huffman
    frames, arbitrary sampling factors (the luma plane nearest-upsamples if
    Y itself is subsampled), restart intervals, and single-component
    non-interleaved scans — plus progressive (SOF2) frames via
    _jpeg_decode_progressive (T.81 Annex G: spectral selection +
    successive approximation, Huffman). None for arithmetic,
    hierarchical, lossless, 12-bit, or malformed streams. Reference parity:
    parse-tika's image handling (TikaParser.java:63-160) obtains pixels via
    javax.imageio's JPEG reader."""
    import numpy as np

    if payload[:3] != b"\xff\xd8\xff":
        return None
    qt: dict[int, list[int]] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    frame = None  # (w, h, [(cid, hs, vs, tq), ...])
    progressive = False
    ri = 0
    pos = 2
    n = len(payload)
    try:
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone
                pos += 2
                continue
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            if seglen < 2 or pos + 2 + seglen > n:
                return None
            seg = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT — one or more tables, zigzag order
                if not _jpeg_parse_dqt(seg, qt):
                    return None
            elif marker == 0xC4:  # DHT — one or more tables
                if not _jpeg_parse_dht(seg, hdc, hac):
                    return None
            elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq, SOF2 progressive
                prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8 or not (0 < fw and 0 < fh) or fw * fh > _MAX_PIXELS:
                    return None
                if marker == 0xC2 and fw * fh > _MAX_PROGRESSIVE_PIXELS:
                    return None  # coefficient buffer = one int per pixel
                if nc == 0 or len(seg) < 6 + 3 * nc:
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    hs, vs = hv >> 4, hv & 15
                    if not (1 <= hs <= 4 and 1 <= vs <= 4):
                        return None
                    comps.append((cid, hs, vs, tq))
                frame = (fw, fh, comps)
                progressive = marker == 0xC2
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # lossless / arithmetic / hierarchical
            elif marker == 0xDD:  # DRI
                (ri,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS — entropy data follows the header
                if frame is None:
                    return None
                if progressive:
                    return _jpeg_decode_progressive(
                        np, payload, pos, frame, qt, hdc, hac, ri,
                        as_array=as_array,
                    )
                ns = seg[0]
                if len(seg) < 1 + 2 * ns + 3:
                    return None
                scomps = [
                    (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                return _jpeg_decode_scan(
                    np, payload, pos + 2 + seglen, frame, scomps,
                    qt, hdc, hac, ri, as_array=as_array,
                )
            pos += 2 + seglen
    except (struct.error, IndexError, ValueError):
        return None
    return None


def _jpeg_decode_scan(
    np, payload, pos, frame, scomps, qt, hdc, hac, ri, *, as_array=False
):
    fw, fh, comps = frame
    if len(scomps) != len(comps):
        return None  # multi-scan sequential: out of baseline scope
    byid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    if len(comps) == 1:
        # non-interleaved scan: one 8x8 data unit per MCU, sampling
        # factors do not expand the MCU (T.81 A.2.2)
        hmax = vmax = 1
        geom = {comps[0][0]: (1, 1)}
    else:
        hmax = max(hs for _, hs, _, _ in comps)
        vmax = max(vs for _, _, vs, _ in comps)
        geom = {cid: (hs, vs) for cid, hs, vs, _ in comps}
    plan = []  # (is_luma, hs, vs, quant ndarray, dc table, ac table)
    for i, (cs, td, ta) in enumerate(scomps):
        if cs not in byid:
            return None
        _, _, tq = byid[cs]
        hs, vs = geom[cs]
        if tq not in qt or td not in hdc or ta not in hac:
            return None
        q = np.array(qt[tq], dtype=np.float64)
        plan.append((cs == comps[0][0], hs, vs, q, hdc[td], hac[ta]))
    hs0, vs0 = geom[comps[0][0]]
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    lw, lh = mcux * hs0 * 8, mcuy * vs0 * 8
    luma = np.zeros((lh, lw), dtype=np.float64)
    a = _jpeg_idct_mat(np)
    at = a.T
    zz = _JPEG_ZIGZAG
    br = _JpegBits(payload, pos)
    pred = [0] * len(plan)
    coef = np.zeros(64, dtype=np.float64)
    for my in range(mcuy):
        for mx in range(mcux):
            m_index = my * mcux + mx
            if ri and m_index and m_index % ri == 0:
                if not br.align_restart():
                    return None
                pred = [0] * len(plan)
            for ci, (is_l, chs, cvs, q, dtab, atab) in enumerate(plan):
                for by in range(cvs):
                    for bx in range(chs):
                        s = _jpeg_decode_sym(br, dtab)
                        if s is None or s > 11:
                            return None
                        diff = _jpeg_extend(br.bits(s), s) if s else 0
                        pred[ci] += diff
                        if is_l:
                            coef[:] = 0.0
                            coef[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_sym(br, atab)
                            if rs is None:
                                return None
                            r, ssz = rs >> 4, rs & 15
                            if ssz == 0:
                                if r != 15:
                                    break  # EOB
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                return None
                            v = _jpeg_extend(br.bits(ssz), ssz)
                            if is_l:
                                # quant tables are stored zigzag-ordered,
                                # so q[k] pairs with zigzag position k
                                coef[zz[k]] = v * q[k]
                            k += 1
                        if is_l:
                            blk = at @ coef.reshape(8, 8) @ a
                            y0 = (my * cvs + by) * 8
                            x0 = (mx * chs + bx) * 8
                            luma[y0 : y0 + 8, x0 : x0 + 8] = blk
    # crop the padded plane to the component raster, then nearest-upsample
    # to frame dims when Y itself is subsampled (rare but legal)
    cw = -(-fw * hs0 // hmax)
    ch = -(-fh * vs0 // vmax)
    out = np.clip(np.rint(luma[:ch, :cw]) + 128, 0, 255).astype(np.int64)
    if (cw, ch) != (fw, fh):
        xs = np.minimum(np.arange(fw) * hs0 // hmax, cw - 1)
        ys = np.minimum(np.arange(fh) * vs0 // vmax, ch - 1)
        out = out[np.ix_(ys, xs)]
    if as_array:  # hot path (dHash): keep the raster numpy so the
        return fw, fh, out  # summed-area resample triggers — tolist on a
    # megapixel raster costs more than the resample itself
    return fw, fh, [[int(v) for v in row] for row in out]



def _jpeg_entropy_end(payload: bytes, pos: int) -> int:
    """Position of the next REAL marker after an entropy-coded segment
    (skips 0xFF00 byte stuffing and RSTn restart markers)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] == 0xFF:
            b = payload[pos + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _jpeg_ac_first(br, atab, blk, zz, ss, se, al, eobrun):
    """Progressive AC initial scan for one block (T.81 G.1.2.2): run-length
    coefficients shifted by the point transform, with EOB-run coding.
    Returns the new eobrun, or None on a malformed stream."""
    if eobrun > 0:
        return eobrun - 1  # this block's band is entirely zero
    k = ss
    while k <= se:
        rs = _jpeg_decode_sym(br, atab)
        if rs is None:
            return None
        r, sz = rs >> 4, rs & 15
        if sz == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.bits(r)
            return eobrun - 1
        k += r
        if k > se:
            return None
        blk[zz[k]] = _jpeg_extend(br.bits(sz), sz) << al
        k += 1
    return 0


def _jpeg_ac_refine(br, atab, blk, zz, ss, se, al, eobrun):
    """Progressive AC refinement scan for one block (T.81 G.1.2.3):
    correction bits for coefficients already nonzero, ±1<<al for newly
    significant ones, zero-history run lengths, EOB runs. Returns the new
    eobrun, or None on a malformed stream."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_decode_sym(br, atab)
            if rs is None:
                return None
            r, sz = rs >> 4, rs & 15
            val = 0
            if sz == 0:
                if r != 15:  # EOB run (includes this block)
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: pass over 16 zero-history coefficients
            else:
                if sz != 1:
                    return None  # spec: refinement appends only ±1
                val = p1 if br.bit() else m1
            while k <= se:
                z = zz[k]
                if blk[z]:
                    if br.bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[zz[k]] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # correction bits for the rest of the band
            z = zz[k]
            if blk[z]:
                if br.bit() and (blk[z] & p1) == 0:
                    blk[z] += p1 if blk[z] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_decode_progressive(
    np, payload, pos, frame, qt, hdc, hac, ri, *, as_array=False
):
    """Progressive JPEG (SOF2, T.81 Annex G, Huffman): accumulates Y
    coefficients across DC/AC spectral-selection and successive-
    approximation scans, entropy-decoding interleaved DC scans fully (the
    bitstream interleaves all components) while skipping single-component
    chroma scans outright (their entropy segments are self-contained), then
    dequantizes + IDCTs the luma plane once at EOI."""
    fw, fh, comps = frame
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    y_cid, y_hs, y_vs, y_tq = comps[0]
    if len(comps) == 1:
        y_hs = y_vs = hmax = vmax = 1
        mcux, mcuy = -(-fw // 8), -(-fh // 8)
    ybw, ybh = mcux * y_hs, mcuy * y_vs  # padded (interleaved) block grid
    y_cw = -(-fw * y_hs // hmax)
    y_ch = -(-fh * y_vs // vmax)
    nbw, nbh = -(-y_cw // 8), -(-y_ch // 8)  # non-interleaved scan grid
    coef = [[0] * 64 for _ in range(ybw * ybh)]
    zz = _JPEG_ZIGZAG
    n = len(payload)
    byid = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI: reconstruct
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            return None
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xC4:
            if not _jpeg_parse_dht(seg, hdc, hac):
                return None
        elif marker == 0xDB:
            if not _jpeg_parse_dqt(seg, qt):
                return None
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                return None
            scomps = [
                (seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                for c in range(ns)
            ]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if se > 63 or ss > se or al > 13:
                return None
            data = pos + 2 + seglen
            if ns == 1 and scomps[0][0] != y_cid:
                # single-component chroma scan: the entropy segment is
                # self-contained — skip without decoding
                pos = _jpeg_entropy_end(payload, data)
                continue
            if any(cs not in byid for cs, _, _ in scomps):
                return None
            br = _JpegBits(payload, data)
            if ss == 0:  # DC scan (interleaved or single-component)
                if se != 0:
                    return None
                dtabs = {}
                for cs, td, _ta in scomps:
                    if ah == 0 and td not in hdc:
                        return None
                    dtabs[cs] = hdc.get(td)
                pred = {cs: 0 for cs, _, _ in scomps}
                if ns > 1:
                    if len(scomps) != len(comps):
                        return None
                    units = []  # (cid, is_y, mcu-relative block coords)
                    for cid, chs, cvs, _tq in comps:
                        for by in range(cvs):
                            for bx in range(chs):
                                units.append((cid, cid == y_cid, bx, by))
                    total_mcus = mcux * mcuy
                    for m in range(total_mcus):
                        if ri and m and m % ri == 0:
                            if not br.align_restart():
                                return None
                            pred = {cs: 0 for cs, _, _ in scomps}
                        my, mx = divmod(m, mcux)
                        for cid, is_y, bx, by in units:
                            if ah == 0:
                                sym = _jpeg_decode_sym(br, dtabs[cid])
                                if sym is None or sym > 11:
                                    return None
                                diff = (
                                    _jpeg_extend(br.bits(sym), sym) if sym else 0
                                )
                                pred[cid] += diff
                                if is_y:
                                    idx = (my * y_vs + by) * ybw + mx * y_hs + bx
                                    coef[idx][0] = pred[cid] << al
                            else:
                                bit = br.bit()
                                if is_y:
                                    idx = (my * y_vs + by) * ybw + mx * y_hs + bx
                                    coef[idx][0] |= bit << al
                else:  # single-component Y DC scan
                    for b in range(nbw * nbh):
                        if ri and b and b % ri == 0:
                            if not br.align_restart():
                                return None
                            pred[y_cid] = 0
                        by, bx = divmod(b, nbw)
                        idx = by * ybw + bx
                        if ah == 0:
                            sym = _jpeg_decode_sym(br, dtabs[y_cid])
                            if sym is None or sym > 11:
                                return None
                            diff = _jpeg_extend(br.bits(sym), sym) if sym else 0
                            pred[y_cid] += diff
                            coef[idx][0] = pred[y_cid] << al
                        else:
                            coef[idx][0] |= br.bit() << al
            else:  # AC scan: always single-component (T.81 G.1.1.1.1)
                if ns != 1:
                    return None
                ta = scomps[0][2]
                if ta not in hac:
                    return None
                atab = hac[ta]
                step = _jpeg_ac_refine if ah else _jpeg_ac_first
                eobrun = 0
                for b in range(nbw * nbh):
                    if ri and b and b % ri == 0:
                        if not br.align_restart():
                            return None
                        eobrun = 0
                    by, bx = divmod(b, nbw)
                    eobrun = step(
                        br, atab, coef[by * ybw + bx], zz, ss, se, al, eobrun
                    )
                    if eobrun is None:
                        return None
            pos = _jpeg_entropy_end(payload, br.pos)
            continue
        pos += 2 + seglen
    if y_tq not in qt:
        return None
    qnat = [0] * 64
    for k in range(64):
        qnat[zz[k]] = qt[y_tq][k]  # quant tables are stored zigzag-ordered
    qv = np.array(qnat, dtype=np.float64)
    a = _jpeg_idct_mat(np)
    at = a.T
    luma = np.zeros((ybh * 8, ybw * 8), dtype=np.float64)
    for by in range(ybh):
        for bx in range(ybw):
            fq = np.array(coef[by * ybw + bx], dtype=np.float64) * qv
            luma[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                at @ fq.reshape(8, 8) @ a
            )
    out = np.clip(np.rint(luma[:y_ch, :y_cw]) + 128, 0, 255).astype(np.int64)
    if (y_cw, y_ch) != (fw, fh):
        xs = np.minimum(np.arange(fw) * y_hs // hmax, y_cw - 1)
        ys = np.minimum(np.arange(fh) * y_vs // vmax, y_ch - 1)
        out = out[np.ix_(ys, xs)]
    if as_array:
        return fw, fh, out
    return fw, fh, [[int(v) for v in row] for row in out]


# ---------------------------------------------------------------------------
# FLAC frame decode (RFC 9639 / xiph format spec, from the public spec)
# ---------------------------------------------------------------------------

_FLAC_RATES = (0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
               32000, 44100, 48000, 96000)
_FLAC_BPS = (0, 8, 12, 0, 16, 20, 24, 32)
_MAX_AUDIO_SAMPLES = 64_000_000  # same spirit as _MAX_PIXELS
# MPEG-1 decode is CPU-bound, not just memory-bound: a pure-Python
# bit-reader at ~100k samples/s would burn ~10 min under the 64M cap, so
# its own bound is 2M samples (~40 s of 48 kHz — far more than the
# 8-frame fingerprint needs)
_MAX_MPEG_SAMPLES = 2_000_000


class _FlacBits:
    """MSB-first bit reader for FLAC frames."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes, byte_pos: int):
        self.data = data
        self.bitpos = byte_pos * 8
        self.nbits = len(data) * 8

    def read(self, n: int) -> int | None:
        p = self.bitpos
        if p + n > self.nbits:
            return None
        self.bitpos = p + n
        # gather the covering bytes, then slice the bit window
        start, end = p >> 3, (p + n + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        return (chunk >> ((end << 3) - p - n)) & ((1 << n) - 1)

    def signed(self, n: int) -> int | None:
        v = self.read(n)
        if v is None:
            return None
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int | None:
        q = 0
        while True:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
            if q > self.nbits:  # pathological stream: bail, don't spin
                return None

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _flac_utf8_number(br: _FlacBits) -> int | None:
    """The UTF-8-style coded frame/sample number (up to 7 bytes)."""
    b0 = br.read(8)
    if b0 is None:
        return None
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        return None
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        v = (v << 6) | (b & 0x3F)
    return v


_FLAC_FIXED_COEFS = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))


def _flac_residuals(br: _FlacBits, blocksize: int, order: int):
    """Rice/Rice2-coded residual section of one subframe (spec §9.2.7)."""
    method = br.read(2)
    if method is None or method > 1:
        return None
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if po is None:
        return None
    nparts = 1 << po
    if blocksize % nparts:
        return None  # spec: block must split evenly into partitions
    out = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            return None
        param = br.read(pbits)
        if param is None:
            return None
        if param == escape:  # raw n-bit residuals
            rawbits = br.read(5)
            if rawbits is None:
                return None
            for _ in range(count):
                v = br.signed(rawbits) if rawbits else 0
                if v is None:
                    return None
                out.append(v)
        else:
            for _ in range(count):
                q = br.unary()
                if q is None:
                    return None
                r = br.read(param) if param else 0
                if r is None:
                    return None
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _flac_subframe(br: _FlacBits, blocksize: int, bps: int):
    """One subframe → list of ``blocksize`` ints (spec §9.2.5-9.2.8)."""
    if br.read(1) != 0:  # mandatory zero pad bit
        return None
    stype = br.read(6)
    wflag = br.read(1)
    if stype is None or wflag is None:
        return None
    wasted = 0
    if wflag:
        k = br.unary()
        if k is None:
            return None
        wasted = k + 1
    eff = bps - wasted
    if eff <= 0 or eff > 33:
        return None
    if stype == 0:  # CONSTANT
        v = br.signed(eff)
        if v is None:
            return None
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = []
        for _ in range(blocksize):
            v = br.signed(eff)
            if v is None:
                return None
            samples.append(v)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            return None
        samples = []
        for _ in range(order):
            v = br.signed(eff)
            if v is None:
                return None
            samples.append(v)
        res = _flac_residuals(br, blocksize, order)
        if res is None or len(res) != blocksize - order:
            return None
        coefs = _FLAC_FIXED_COEFS[order]
        for r in res:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[-1 - j]
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        if order > blocksize:
            return None
        samples = []
        for _ in range(order):
            v = br.signed(eff)
            if v is None:
                return None
            samples.append(v)
        prec = br.read(4)
        if prec is None or prec == 15:
            return None
        prec += 1
        shift = br.signed(5)
        if shift is None or shift < 0:
            return None
        coefs = []
        for _ in range(order):
            c = br.signed(prec)
            if c is None:
                return None
            coefs.append(c)
        res = _flac_residuals(br, blocksize, order)
        if res is None or len(res) != blocksize - order:
            return None
        for r in res:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * samples[-1 - j]
            samples.append(r + (acc >> shift))
    else:
        return None  # reserved subframe type
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_samples(payload: bytes) -> dict | None:
    """From-spec FLAC decode (RFC 9639): CONSTANT / VERBATIM / FIXED /
    LPC subframes, Rice + Rice2 residuals with escape partitions, all
    four channel assignments (independent, left/side, right/side,
    mid/side), wasted bits, and UTF-8-coded frame numbers. Returns the
    ``parse_wav`` dict shape (interleaved int samples, numpy array) so
    ``audio_fingerprint`` and the spectral features run unchanged on
    lossless-compressed audio. CRC-8/CRC-16 are parsed but not verified
    (best-effort crawl decode). None for malformed/non-FLAC streams."""
    import numpy as np

    info = parse_flac_streaminfo(payload)
    if info is None:
        return None
    if info["n_samples"] > _MAX_AUDIO_SAMPLES:
        return None
    # walk metadata blocks to the first audio frame
    pos = 4
    n = len(payload)
    while pos + 4 <= n:
        hdr = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        pos += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    if pos >= n:
        return None
    nch = info["n_channels"]
    channels: list[list[int]] = [[] for _ in range(nch)]
    total = info["n_samples"]
    br = _FlacBits(payload, pos)
    while br.bitpos + 40 <= br.nbits:
        if total and len(channels[0]) >= total:
            break
        if br.read(14) != 0x3FFE:
            break  # lost sync / EOF padding: stop at what we have
        if br.read(1) != 0:
            return None
        br.read(1)  # blocking strategy (fixed vs variable) — number below
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_asgn = br.read(4)
        ss_code = br.read(3)
        if None in (bs_code, sr_code, ch_asgn, ss_code) or br.read(1) != 0:
            return None
        if _flac_utf8_number(br) is None:
            return None
        # block size (§9.1.1): 1=192, 2-5=576<<(n-2), 6/7=coded at end,
        # 8-15=256<<(n-8)
        if bs_code == 0:
            return None
        if bs_code == 1:
            blocksize = 192
        elif bs_code <= 5:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 6:
            b = br.read(8)
            if b is None:
                return None
            blocksize = b + 1
        elif bs_code == 7:
            b = br.read(16)
            if b is None:
                return None
            blocksize = b + 1
        else:
            blocksize = 256 << (bs_code - 8)
        if sr_code == 12:
            if br.read(8) is None:
                return None
        elif sr_code in (13, 14):
            if br.read(16) is None:
                return None
        elif sr_code == 15:
            return None
        if br.read(8) is None:  # CRC-8 (not verified)
            return None
        if ch_asgn <= 7:
            frame_nch = ch_asgn + 1
        elif ch_asgn <= 10:
            frame_nch = 2
        else:
            return None
        if frame_nch != nch:
            return None
        bps = _FLAC_BPS[ss_code] or info["bits"]
        if bps == 0:
            return None
        if len(channels[0]) + blocksize > _MAX_AUDIO_SAMPLES:
            return None
        subs = []
        for ci in range(frame_nch):
            extra = 1 if (
                (ch_asgn == 8 and ci == 1)      # left/side: side has +1 bit
                or (ch_asgn == 9 and ci == 0)   # right(!)/side stores side first
                or (ch_asgn == 10 and ci == 1)  # mid/side
            ) else 0
            s = _flac_subframe(br, blocksize, bps + extra)
            if s is None:
                return None
            subs.append(s)
        br.align()
        if br.read(16) is None:  # CRC-16 (not verified)
            return None
        if ch_asgn == 8:  # left/side → right = left - side
            subs = [subs[0], [l - s for l, s in zip(subs[0], subs[1])]]
        elif ch_asgn == 9:  # side/right → left = right + side
            subs = [[r + s for s, r in zip(subs[0], subs[1])], subs[1]]
        elif ch_asgn == 10:  # mid/side (mid stored floor-halved)
            left, right = [], []
            for m, s in zip(subs[0], subs[1]):
                mm = (m << 1) | (s & 1)
                left.append((mm + s) >> 1)
                right.append((mm - s) >> 1)
            subs = [left, right]
        for ci in range(nch):
            channels[ci].extend(subs[ci])
    got = len(channels[0])
    if got == 0:
        return None
    if total:
        got = min(got, total)
    interleaved = np.empty(got * nch, dtype=np.int64)
    for ci in range(nch):
        interleaved[ci::nch] = channels[ci][:got]
    return {
        "format": "flac",
        "sample_rate": info["sample_rate"],
        "n_channels": nch,
        "bits": info["bits"],
        "n_samples": got,
        "duration_s": got / info["sample_rate"],
        "samples": interleaved,
    }


# ---------------------------------------------------------------------------
# TIFF pixel decode (TIFF 6.0 spec: strips, PackBits, LZW, Deflate)
# ---------------------------------------------------------------------------

def _tiff_full_ifd(payload: bytes, ifd_off: int, endian: str):
    """All IFD0 entries → {tag: list_of_values} for BYTE/SHORT/LONG types,
    following value offsets when the data doesn't fit inline."""
    if ifd_off + 2 > len(payload):
        return None
    (n_entries,) = struct.unpack_from(f"{endian}H", payload, ifd_off)
    out: dict[int, list[int]] = {}
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "B", 3: "H", 4: "I"}
    for k in range(min(n_entries, 512)):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(payload):
            return None
        tag, typ, count = struct.unpack_from(f"{endian}HHI", payload, e)
        if typ not in sizes or count == 0 or count > 1 << 20:
            continue
        total = sizes[typ] * count
        off = e + 8
        if total > 4:
            (off,) = struct.unpack_from(f"{endian}I", payload, e + 8)
        if off + total > len(payload):
            continue
        out[tag] = list(
            struct.unpack_from(f"{endian}{count}{fmts[typ]}", payload, off)
        )
    return out


def _packbits_decode(data: bytes, want: int):
    """TIFF PackBits RLE (spec §9)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < want:
        b = data[i]
        i += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if i >= n:
                break
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128 = noop
    return bytes(out[:want])


def _tiff_lzw_decode(data: bytes, want: int):
    """TIFF LZW (spec §13): MSB-first variable-width codes 9-12 bits,
    Clear=256, EOI=257, with the early-change width bump (the code width
    grows one code EARLIER than GIF's LZW)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out[:want])
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                    table.append(prev + entry[:1])
                elif code == len(table):
                    entry = prev + prev[:1]
                    table.append(entry)
                else:
                    return None
                # early change: width grows when the NEXT code would not fit
                if len(table) + 1 >= (1 << width) and width < 12:
                    width += 1
            out += entry
            prev = entry
            if len(out) >= want:
                return bytes(out[:want])
    return bytes(out[:want])


def decode_tiff_pixels(payload: bytes):
    """Baseline TIFF 6.0 → (width, height, gray rows): 8-bit grayscale
    (both photometric polarities), RGB(A), and palette-color images in
    strips, with Compression 1 (none), 5 (LZW incl. early change),
    8/32946 (Deflate), or 32773 (PackBits), and horizontal-differencing
    Predictor 2. Tiled, sub-8-bit, and CCITT fax TIFFs return None (the
    injectable decoder seam covers them). Reference parity: Tika's
    TiffParser delegates to the same TIFF 6.0 baseline feature set."""
    import zlib

    endian = _tiff_endian(payload)
    if endian is None:
        return None
    try:
        (ifd_off,) = struct.unpack(f"{endian}I", payload[4:8])
        tags = _tiff_full_ifd(payload, ifd_off, endian)
        if not tags:
            return None
        if 322 in tags or 324 in tags:
            return None  # tiled layout
        w = tags.get(256, [0])[0]
        h = tags.get(257, [0])[0]
        if not (0 < w and 0 < h and w * h <= _MAX_PIXELS):
            return None
        comp = tags.get(259, [1])[0]
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        bps = tags.get(258, [8] * spp)
        if any(b != 8 for b in bps) or len(bps) < spp or spp > 8:
            return None
        if photo not in (0, 1, 2, 3) or (photo == 2 and spp < 3):
            return None
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            return None
        rows_per_strip = tags.get(278, [h])[0] or h
        predictor = tags.get(317, [1])[0]
        if predictor not in (1, 2):
            return None
        cmap = None
        if photo == 3:
            cm = tags.get(320)
            if not cm or len(cm) < 3 * 256:
                return None
            # 16-bit palette entries; luma from the high bytes
            cmap = [
                (
                    (cm[i] >> 8) * 299
                    + (cm[256 + i] >> 8) * 587
                    + (cm[512 + i] >> 8) * 114
                )
                // 1000
                for i in range(256)
            ]
        stride = w * spp
        raster = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            if nrows <= 0:
                break
            want = stride * nrows
            chunk = payload[off : off + cnt]
            if len(chunk) < cnt:
                return None
            if comp == 1:
                data = chunk[:want]
            elif comp == 32773:
                data = _packbits_decode(chunk, want)
            elif comp == 5:
                data = _tiff_lzw_decode(chunk, want)
            elif comp in (8, 32946):
                dec = zlib.decompressobj()
                data = dec.decompress(chunk, want)
            else:
                return None  # CCITT fax & friends need a codec library
            if data is None or len(data) < want:
                return None
            data = bytearray(data)
            if predictor == 2:  # horizontal differencing per channel
                for r in range(nrows):
                    base = r * stride
                    for i in range(spp, stride):
                        data[base + i] = (
                            data[base + i] + data[base + i - spp]
                        ) & 0xFF
            raster += data
        if len(raster) < stride * h:
            return None
        rows = []
        for y in range(h):
            base = y * stride
            if photo == 2:  # RGB(A)
                rows.append(
                    [
                        (
                            raster[base + x * spp] * 299
                            + raster[base + x * spp + 1] * 587
                            + raster[base + x * spp + 2] * 114
                        )
                        // 1000
                        for x in range(w)
                    ]
                )
            elif photo == 3:  # palette
                rows.append([cmap[raster[base + x * spp]] for x in range(w)])
            elif photo == 0:  # WhiteIsZero
                rows.append([255 - raster[base + x * spp] for x in range(w)])
            else:  # BlackIsZero grayscale
                rows.append([raster[base + x * spp] for x in range(w)])
        return w, h, rows
    except (struct.error, IndexError, ValueError, zlib.error):
        return None


# ---------------------------------------------------------------------------
# RIFF/AVI container walk: MJPEG frame extraction (video joins perceptual
# dedup through the already-certified JPEG pixel decoder)
# ---------------------------------------------------------------------------


def _riff_chunks(buf: bytes, start: int, end: int):
    """Iterate (fourcc, data_start, data_end) over a RIFF chunk run.
    Chunks are fourcc + u32-LE size + data, padded to even offsets; a
    truncated final chunk is clamped to the buffer (web-crawled AVIs cut
    mid-download are the norm, not the exception)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        data_start = pos + 8
        data_end = min(data_start + size, end)
        yield fourcc, data_start, data_end
        pos = data_start + size + (size & 1)


def extract_avi_mjpeg_frames(payload: bytes, *, max_frames: int = 64):
    """RIFF/AVI container walk (Microsoft AVI 1.0 / OpenDML public
    layout): returns {"frames": [jpeg_bytes, ...], "fps": float | None,
    "width": int | None, "height": int | None, "n_chunks": int} for an
    AVI whose video stream is Motion-JPEG, else None.

    The walk recurses RIFF LIST nesting (``hdrl``/``strl`` for the
    stream headers, ``movi`` — possibly via ``rec `` groups — for the
    payload chunks) and collects video chunks (``##dc``/``##db``) whose
    bytes start with a JPEG SOI marker; each frame then decodes through
    :func:`decode_jpeg_pixels`, the same T.81 path certified for
    standalone images. fps comes from the ``vids`` ``strh``'s
    dwRate/dwScale; frame dimensions from the ``strf``
    BITMAPINFOHEADER. Hostile-input posture: bounded recursion depth,
    bounded chunk count, ``max_frames`` cap, truncation-clamped sizes —
    arbitrary web bytes reach this in the crawl media path.

    Reference parity: Tika routes video/x-msvideo through its MP4/RIFF
    metadata parsers (metadata only); this adds the pixel surface the
    dedup pipeline needs."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    riff_size = int.from_bytes(payload[4:8], "little")
    end = min(len(payload), 12 + riff_size) if riff_size else len(payload)
    out = {"frames": [], "fps": None, "width": None, "height": None, "n_chunks": 0}
    in_video_strl = [False]  # strf applies to the preceding vids strh

    def walk(start: int, stop: int, depth: int) -> None:
        if depth > 8:  # hostile nesting guard
            return
        for fourcc, ds, de in _riff_chunks(payload, start, stop):
            out["n_chunks"] += 1
            if out["n_chunks"] > 100_000 or len(out["frames"]) >= max_frames:
                return
            if fourcc == b"LIST" and de - ds >= 4:
                walk(ds + 4, de, depth + 1)
            elif fourcc == b"strh" and de - ds >= 32:
                in_video_strl[0] = payload[ds : ds + 4] == b"vids"
                if in_video_strl[0]:
                    scale = int.from_bytes(payload[ds + 20 : ds + 24], "little")
                    rate = int.from_bytes(payload[ds + 24 : ds + 28], "little")
                    if scale and rate:
                        out["fps"] = rate / scale
            elif fourcc == b"strf" and in_video_strl[0] and de - ds >= 24:
                out["width"] = int.from_bytes(
                    payload[ds + 4 : ds + 8], "little", signed=True
                )
                out["height"] = abs(
                    int.from_bytes(payload[ds + 8 : ds + 12], "little", signed=True)
                )
            elif (
                fourcc[2:4] in (b"dc", b"db")
                and fourcc[:2].isdigit()
                and payload[ds : ds + 3] == b"\xff\xd8\xff"
            ):
                out["frames"].append(payload[ds:de])

    walk(12, end, 0)
    return out


# ---------------------------------------------------------------------------
# MPEG-1 audio (ISO/IEC 11172-3) Layer I / Layer II decode — lossy audio
# joins fingerprint dedup. Layer III is deliberately scoped OUT (see
# decode_mpeg_audio_samples's docstring).
# ---------------------------------------------------------------------------

_MPEG1_RATES = (44100, 48000, 32000)
_MPEG1_KBPS_L1 = (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
_MPEG1_KBPS_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

# Layer I/II scalefactors (11172-3 Table 3-B.1): sf[i] = 2.0 * 2^(-i/3),
# 63 valid indices — the table IS this closed form, stated in the spec.
_MPEG1_SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))

# Layer II quantization classes (Table 3-B.4): steps -> (bits per coded
# value, grouped?, C, D). For 2^k-1 steps C = 2^k/(2^k-1), D = 2^(1-k);
# the grouped 3/5/9-step classes pack 3 samples into one 5/7/10-bit code.
_L2_CLASSES = {
    3: (2, True, 4 / 3, 0.5),
    5: (3, True, 8 / 5, 0.5),
    7: (3, False, 8 / 7, 0.25),
    9: (4, True, 16 / 9, 0.5),
    15: (4, False, 16 / 15, 0.125),
    31: (5, False, 32 / 31, 0.0625),
    63: (6, False, 64 / 63, 0.03125),
    127: (7, False, 128 / 127, 0.015625),
    255: (8, False, 256 / 255, 0.0078125),
    511: (9, False, 512 / 511, 0.00390625),
    1023: (10, False, 1024 / 1023, 0.001953125),
    2047: (11, False, 2048 / 2047, 0.0009765625),
    4095: (12, False, 4096 / 4095, 0.00048828125),
    8191: (13, False, 8192 / 8191, 0.000244140625),
    16383: (14, False, 16384 / 16383, 0.0001220703125),
    32767: (15, False, 32768 / 32767, 0.00006103515625),
    65535: (16, False, 65536 / 65535, 0.000030517578125),
}

# Layer II bit-allocation table 3-B.2a (48 kHz, and 44.1/32 kHz at high
# bitrates; sblimit 27): per subband, the allowed quantization steps by
# allocation index (index 0 = not allocated). The lower tables (B.2b-d)
# differ only in sblimit and which rows get the wide classes; this
# implementation routes every MPEG-1 Layer II stream through B.2a — an
# allocation index outside the row is treated as the row's widest class,
# which can only mis-scale exotic low-bitrate streams, never crash.
_L2_ALLOC_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 16383, 32767, 65535)
_L2_ALLOC_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191, 65535)
_L2_ALLOC_HIGH = (3, 5, 7, 9, 15, 31, 65535)
_L2_ALLOC_TOP = (3, 5, 65535)


def _l2_row(sb: int) -> tuple[int, tuple[int, ...]]:
    """(nbal, allowed steps) for subband ``sb`` under Table 3-B.2a."""
    if sb < 3:
        return 4, _L2_ALLOC_LOW
    if sb < 11:
        return 4, _L2_ALLOC_MID
    if sb < 23:
        return 3, _L2_ALLOC_HIGH
    return 2, _L2_ALLOC_TOP


_L2_SBLIMIT = 27


def _mpeg_requant(code: int, bits: int, c: float, d: float) -> float:
    """11172-3 dequantization (Layer I 2.4.3.1 / Layer II 2.4.3.2): invert
    the MSB to form a two's-complement fraction in [-1, 1), add the class
    offset D, scale by the class gain C."""
    frac = 0.0 if (code >> (bits - 1)) & 1 else -1.0
    frac += (code & ((1 << (bits - 1)) - 1)) / (1 << (bits - 1))
    return (frac + d) * c


def _mpeg_synthesize(np, sb_frames: list, nch: int, rate: int):
    """Subband → PCM synthesis by cosine modulation with GLOBAL phase:
    pcm[m] = sum_s sb[m // 32][s] * cos(pi * (2s+1) * (m + 16) / 64).

    This is the matrixing kernel of the normative filterbank WITHOUT the
    512-tap prototype window of Table 3-B.3 — that window exists only as
    a numeric table (not derivable from the spec text), and inventing
    its values would decode real audio subtly wrong. The global-phase
    modulation keeps each subband's content exactly at its band center
    with adjacent-band leakage bounded by the subband transitions, which
    is what the band-energy fingerprint consumes; it is NOT a
    listening-quality synthesis. sb_frames: list of (n_granules, 32)
    float arrays per channel, concatenated over frames."""
    # cos table is periodic in m with period 128: precompute 128 x 32
    phases = np.cos(
        np.pi
        * (2 * np.arange(32)[None, :] + 1)
        * (np.arange(128)[:, None] + 16)
        / 64.0
    )
    out = []
    chunk = 1 << 17  # bound the (M, 32) intermediate to ~32 MB per slice
    for ch in range(nch):
        sb = np.concatenate(sb_frames[ch], axis=0)  # (T, 32)
        t_total = sb.shape[0]
        pcm = np.empty(t_total * 32)
        for lo in range(0, t_total * 32, chunk):
            m = np.arange(lo, min(lo + chunk, t_total * 32))
            pcm[lo : lo + len(m)] = (phases[m % 128, :] * sb[m // 32, :]).sum(axis=1)
        out.append(pcm)
    mixed = np.stack(out, axis=1).reshape(-1)  # interleave channels
    return np.clip(np.rint(mixed * 32767.0), -32768, 32767).astype(np.int64)


def decode_mpeg_audio_samples(payload: bytes) -> dict | None:
    """From-spec MPEG-1 audio Layer I / Layer II decode (ISO/IEC 11172-3):
    frame-sync walk (ID3v2 skip), header parse, bit allocation (Layer I
    direct; Layer II Table 3-B.2a with grouped 3/5/9-step classes and
    scfsi scalefactor sharing), Table 3-B.1 scalefactors, MSB-inversion
    requantization with the Table 3-B.4 C/D constants, intensity-stereo
    bound handling, and cosine-modulation synthesis (see
    ``_mpeg_synthesize`` for the honest scoping of the normative
    prototype window). Returns the ``parse_wav`` dict shape so
    ``audio_fingerprint`` and the spectral features run unchanged on
    lossy broadcast audio. None for non-MPEG-1 / Layer III input.

    Layer III is deliberately scoped OUT: its Huffman code tables,
    requantization power tables, and IMDCT window constants are
    normative numeric tables spanning dozens of pages — a reconstruction
    from memory would decode real MP3s silently wrong, which is worse
    than the header-only ``parse_mp3_info`` fallback. Re-checked round
    14: no verifiable copy of those tables (libmad/ffmpeg source, a
    conformance-vector set) is present in this sandbox, so the Layer III
    scoping stands. WebP is DIFFERENT as of round 14: the system
    libwebp.so IS present, so WebP pixels decode for real through
    :func:`decode_webp_rgba` (ctypes against the authoritative
    implementation — no from-memory tables involved); the injectable
    seams remain for everything else."""
    import numpy as np

    n = len(payload)
    pos = 0
    if payload[:3] == b"ID3" and n >= 10:
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
    # bounded sync scan for the first Layer I/II MPEG-1 frame. An 11-bit
    # sync word inside arbitrary binary is cheap to hit by chance, so a
    # candidate is accepted ONLY when the header's own frame length lands
    # on a SECOND consistent header (same layer + sample rate, valid
    # bitrate) — or, for payloads too short to hold two frames, when the
    # sync sits exactly at the stream start (offset 0 / right after the
    # ID3v2 tag). This keeps junk-prefix tolerance for real broadcast
    # streams while keeping garbage blobs out of the fingerprint space.
    scan_start = pos
    limit = min(n - 4, pos + 4096)
    first = None
    while pos <= limit:
        if (
            payload[pos] == 0xFF
            and (payload[pos + 1] & 0xF8) == 0xF8  # sync + ID=1 (MPEG-1)
            and ((payload[pos + 1] >> 1) & 0x3) in (3, 2)  # Layer I / II
            and ((payload[pos + 2] >> 4) & 0xF) not in (0, 15)
            and ((payload[pos + 2] >> 2) & 0x3) < 3
        ):
            c_layer = (payload[pos + 1] >> 1) & 0x3
            c_br = (payload[pos + 2] >> 4) & 0xF
            c_sr = (payload[pos + 2] >> 2) & 0x3
            c_pad = (payload[pos + 2] >> 1) & 0x1
            c_rate = _MPEG1_RATES[c_sr]
            c_kbps = (_MPEG1_KBPS_L1 if c_layer == 3 else _MPEG1_KBPS_L2)[c_br]
            if c_layer == 3:
                c_len = (12 * c_kbps * 1000 // c_rate + c_pad) * 4
            else:
                c_len = 144 * c_kbps * 1000 // c_rate + c_pad
            nxt = pos + c_len
            if nxt + 4 <= n:
                if (
                    payload[nxt] == 0xFF
                    and (payload[nxt + 1] & 0xF8) == 0xF8
                    and ((payload[nxt + 1] >> 1) & 0x3) == c_layer
                    and ((payload[nxt + 2] >> 4) & 0xF) not in (0, 15)
                    and ((payload[nxt + 2] >> 2) & 0x3) == c_sr
                ):
                    first = pos
                    break
            elif pos == scan_start:
                first = pos  # single-frame payload: sync at stream start
                break
        pos += 1
    if first is None:
        return None

    sb_frames: list[list] = []
    nch = rate = None
    total_granules = 0
    pos = first
    while pos + 4 <= n and total_granules * 32 < _MAX_MPEG_SAMPLES:
        if not (
            payload[pos] == 0xFF and (payload[pos + 1] & 0xF8) == 0xF8
        ):
            break
        layer = (payload[pos + 1] >> 1) & 0x3  # 3 = Layer I, 2 = Layer II
        if layer not in (3, 2):
            break
        protection = payload[pos + 1] & 1
        br_idx = (payload[pos + 2] >> 4) & 0xF
        sr_idx = (payload[pos + 2] >> 2) & 0x3
        padding = (payload[pos + 2] >> 1) & 0x1
        mode = (payload[pos + 3] >> 6) & 0x3
        mode_ext = (payload[pos + 3] >> 4) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            break
        frame_rate = _MPEG1_RATES[sr_idx]
        frame_nch = 1 if mode == 3 else 2
        if rate is None:
            rate, nch = frame_rate, frame_nch
            sb_frames = [[] for _ in range(nch)]
        elif frame_rate != rate or frame_nch != nch:
            break  # parameter change mid-stream: stop at what we have
        kbps = (_MPEG1_KBPS_L1 if layer == 3 else _MPEG1_KBPS_L2)[br_idx]
        if layer == 3:  # Layer I: slots are 4 bytes
            frame_len = (12 * kbps * 1000 // rate + padding) * 4
        else:
            frame_len = 144 * kbps * 1000 // rate + padding
        # intensity-stereo bound: subbands >= bound share one sample run
        bound = (mode_ext + 1) * 4 if mode == 1 else 32
        br = _FlacBits(payload, pos + 4)
        if protection == 0:
            br.read(16)  # CRC (parsed, not verified — best-effort crawl)
        ok = (
            _mpeg_decode_layer1(br, nch, bound, sb_frames)
            if layer == 3
            else _mpeg_decode_layer2(br, nch, min(bound, _L2_SBLIMIT), sb_frames)
        )
        if not ok:
            break
        total_granules += 12 if layer == 3 else 36
        pos += frame_len
    if rate is None or total_granules == 0:
        return None
    samples = _mpeg_synthesize(np, sb_frames, nch, rate)
    n_samples = total_granules * 32
    return {
        "format": "mpeg1",
        "sample_rate": int(rate),
        "n_channels": int(nch),
        "bits": 16,
        "n_samples": int(n_samples),
        "duration_s": n_samples / rate,
        "samples": samples,
    }


def _mpeg_decode_layer1(br: _FlacBits, nch: int, bound: int, sb_frames) -> bool:
    """One Layer I frame (2.4.1.5): 4-bit allocations, 6-bit scalefactors,
    12 granules x 1 sample per allocated subband; nb = allocation + 1
    bits, requantized per 2.4.3.1 then scaled by Table 3-B.1."""
    import numpy as np

    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        chans = range(nch) if sb < bound else range(1)
        for ch in chans:
            a = br.read(4)
            if a is None or a == 15:
                return False
            alloc[ch][sb] = a
        if sb >= bound:  # intensity: one allocation for both channels
            for ch in range(1, nch):
                alloc[ch][sb] = alloc[0][sb]
    sf = [[0.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                idx = br.read(6)
                if idx is None or idx >= 63:
                    return False
                sf[ch][sb] = _MPEG1_SCALEFACTORS[idx]
    frames = [np.zeros((12, 32)) for _ in range(nch)]
    for t in range(12):
        for sb in range(32):
            chans = range(nch) if sb < bound else range(1)
            vals = []
            for ch in chans:
                a = alloc[ch][sb]
                if not a:
                    vals.append(None)
                    continue
                nb = a + 1
                code = br.read(nb)
                if code is None:
                    return False
                vals.append(
                    _mpeg_requant(code, nb, (1 << nb) / ((1 << nb) - 1), 1.0 / (1 << (nb - 1)))
                )
            for ch in range(nch):
                v = vals[ch if sb < bound else 0]
                if v is not None:
                    frames[ch][t, sb] = v * sf[ch][sb]
    for ch in range(nch):
        sb_frames[ch].append(frames[ch])
    return True


def _mpeg_decode_layer2(br: _FlacBits, nch: int, bound: int, sb_frames) -> bool:
    """One Layer II frame (2.4.1.6/2.4.2.2): Table 3-B.2a allocation,
    scfsi scalefactor sharing across the three 12-granule parts, grouped
    3/5/9-step triplet codes, Table 3-B.4 requantization."""
    import numpy as np

    alloc = [[0] * _L2_SBLIMIT for _ in range(nch)]
    for sb in range(_L2_SBLIMIT):
        nbal, steps_row = _l2_row(sb)
        chans = range(nch) if sb < bound else range(1)
        for ch in chans:
            a = br.read(nbal)
            if a is None:
                return False
            alloc[ch][sb] = min(a, len(steps_row))
        if sb >= bound:
            for ch in range(1, nch):
                alloc[ch][sb] = alloc[0][sb]
    scfsi = [[0] * _L2_SBLIMIT for _ in range(nch)]
    for sb in range(_L2_SBLIMIT):
        for ch in range(nch):
            if alloc[ch][sb]:
                s = br.read(2)
                if s is None:
                    return False
                scfsi[ch][sb] = s
    # scalefactors per 12-granule part, shared per scfsi (2.4.2.2)
    sf = [[(0.0, 0.0, 0.0)] * _L2_SBLIMIT for _ in range(nch)]
    for sb in range(_L2_SBLIMIT):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            mode = scfsi[ch][sb]
            count = {0: 3, 1: 2, 2: 1, 3: 2}[mode]
            idxs = []
            for _ in range(count):
                i = br.read(6)
                if i is None or i >= 63:
                    return False
                idxs.append(_MPEG1_SCALEFACTORS[i])
            if mode == 0:
                sf[ch][sb] = (idxs[0], idxs[1], idxs[2])
            elif mode == 1:
                sf[ch][sb] = (idxs[0], idxs[0], idxs[1])
            elif mode == 2:
                sf[ch][sb] = (idxs[0], idxs[0], idxs[0])
            else:
                sf[ch][sb] = (idxs[0], idxs[1], idxs[1])
    frames = [np.zeros((36, 32)) for _ in range(nch)]
    for gr in range(12):  # 12 granules of 3 samples
        for sb in range(_L2_SBLIMIT):
            _nbal, steps_row = _l2_row(sb)
            chans = range(nch) if sb < bound else range(1)
            triplets = []
            for ch in chans:
                a = alloc[ch][sb]
                if not a:
                    triplets.append(None)
                    continue
                steps = steps_row[a - 1]
                bits, grouped, c, d = _L2_CLASSES[steps]
                if grouped:
                    nbits = {3: 5, 5: 7, 9: 10}[steps]
                    code = br.read(nbits)
                    if code is None:
                        return False
                    tri = []
                    for _ in range(3):
                        v = code % steps
                        code //= steps
                        tri.append(_mpeg_requant(v, bits, c, d))
                else:
                    tri = []
                    for _ in range(3):
                        v = br.read(bits)
                        if v is None:
                            return False
                        tri.append(_mpeg_requant(v, bits, c, d))
                triplets.append(tri)
            for ch in range(nch):
                tri = triplets[ch if sb < bound else 0]
                if tri is None:
                    continue
                part = gr // 4
                scale = sf[ch][sb][part]
                for k in range(3):
                    frames[ch][gr * 3 + k, sb] = tri[k] * scale
    for ch in range(nch):
        sb_frames[ch].append(frames[ch])
    return True


_MOV_JPEG_CODECS = (b"jpeg", b"mjpa", b"mjpb", b"AVDJ", b"dmb1")


def extract_mov_mjpeg_frames(payload: bytes, *, max_frames: int = 64):
    """QuickTime/MP4 (ISO-BMFF + Apple QTFF) container walk for
    Motion-JPEG video tracks — the photo-camera-era ``.mov`` sibling of
    :func:`extract_avi_mjpeg_frames`, same return contract:
    ``{"frames": [jpeg_bytes, ...], "fps", "width", "height",
    "n_chunks"}`` or None when the payload isn't ISO-BMFF or has no
    JPEG-coded video track.

    The sample tables do the work (ISO/IEC 14496-12 §8.5-8.7): ``stsd``
    names the codec (``jpeg``/``mjpa``/``mjpb``/``AVDJ``/``dmb1`` — the
    QTFF Motion-JPEG identifiers) and carries the pixel dims, ``stsz``
    the per-sample byte sizes, ``stsc`` the samples-per-chunk runs,
    ``stco``/``co64`` the absolute chunk offsets into ``mdat``, and
    ``mdhd``+``stts`` give fps as timescale/sample_delta. Samples are
    resolved to absolute byte ranges and kept only when SOI-prefixed,
    exactly like the AVI walker. Classic QuickTime files without an
    ``ftyp`` (moov/mdat first) are accepted. Hostile-input posture:
    bounded trak/entry counts, offsets clamped to the buffer,
    ``max_frames`` cap."""
    n = len(payload)
    if n < 16:
        return None
    head = payload[4:8]
    if head not in (b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot"):
        return None
    moov = _find_box(payload, [b"moov"], 0, n)
    if moov is None:
        return None
    out = {"frames": [], "fps": None, "width": None, "height": None, "n_chunks": 0}
    n_trak = 0
    for btype, t0, t1 in _iter_boxes(payload, moov[0], moov[1]):
        if btype != b"trak":
            continue
        n_trak += 1
        if n_trak > 64:  # hostile trak flood
            break
        stbl = _find_box(payload, [b"mdia", b"minf", b"stbl"], t0, t1)
        if stbl is None:
            continue
        s0, s1 = stbl
        stsd = _find_box(payload, [b"stsd"], s0, s1)
        if stsd is None or stsd[1] - stsd[0] < 24:
            continue
        # stsd: version/flags(4) entry_count(4), then sample descriptions
        e0 = stsd[0] + 8
        fmt = payload[e0 + 4 : e0 + 8]
        if fmt not in _MOV_JPEG_CODECS:
            continue
        # video sample description: width/height at entry offsets 32/34
        if stsd[1] - e0 >= 36:
            w, h = struct.unpack(">HH", payload[e0 + 32 : e0 + 36])
            if w and h:
                out["width"], out["height"] = int(w), int(h)
        # fps = mdhd timescale / first stts sample_delta
        mdhd = _find_box(payload, [b"mdia", b"mdhd"], t0, t1)
        stts = _find_box(payload, [b"stts"], s0, s1)
        if mdhd is not None and stts is not None:
            m0, m1 = mdhd
            ver = payload[m0]
            ts = 0
            if ver == 1 and m1 - m0 >= 28:
                (ts,) = struct.unpack(">I", payload[m0 + 20 : m0 + 24])
            elif ver == 0 and m1 - m0 >= 20:
                (ts,) = struct.unpack(">I", payload[m0 + 12 : m0 + 16])
            x0, x1 = stts
            if ts and x1 - x0 >= 16:
                (delta,) = struct.unpack(">I", payload[x0 + 12 : x0 + 16])
                if delta:
                    out["fps"] = ts / delta
        # sample sizes (stsz)
        stsz = _find_box(payload, [b"stsz"], s0, s1)
        if stsz is None or stsz[1] - stsz[0] < 12:
            continue
        z0, z1 = stsz
        fixed, count = struct.unpack(">II", payload[z0 + 4 : z0 + 12])
        count = min(count, 100_000)  # hostile count guard
        if fixed:
            sizes = [fixed] * count
        else:
            if z1 - z0 < 12 + 4 * count:
                count = max(0, (z1 - z0 - 12) // 4)
            sizes = list(
                struct.unpack(f">{count}I", payload[z0 + 12 : z0 + 12 + 4 * count])
            )
        # chunk offsets (stco 32-bit / co64 64-bit)
        stco = _find_box(payload, [b"stco"], s0, s1)
        co64 = _find_box(payload, [b"co64"], s0, s1)
        offsets: list[int] = []
        if stco is not None and stco[1] - stco[0] >= 8:
            c0, c1 = stco
            (nc,) = struct.unpack(">I", payload[c0 + 4 : c0 + 8])
            nc = min(nc, (c1 - c0 - 8) // 4, 100_000)
            offsets = list(
                struct.unpack(f">{nc}I", payload[c0 + 8 : c0 + 8 + 4 * nc])
            )
        elif co64 is not None and co64[1] - co64[0] >= 8:
            c0, c1 = co64
            (nc,) = struct.unpack(">I", payload[c0 + 4 : c0 + 8])
            nc = min(nc, (c1 - c0 - 8) // 8, 100_000)
            offsets = list(
                struct.unpack(f">{nc}Q", payload[c0 + 8 : c0 + 8 + 8 * nc])
            )
        if not offsets or not sizes:
            continue
        # samples-per-chunk runs (stsc); default: 1 sample per chunk
        runs: list[tuple[int, int]] = []
        stsc = _find_box(payload, [b"stsc"], s0, s1)
        if stsc is not None and stsc[1] - stsc[0] >= 8:
            c0, c1 = stsc
            (ne,) = struct.unpack(">I", payload[c0 + 4 : c0 + 8])
            ne = min(ne, (c1 - c0 - 8) // 12, 10_000)
            for e in range(ne):
                first, per, _desc = struct.unpack(
                    ">III", payload[c0 + 8 + 12 * e : c0 + 20 + 12 * e]
                )
                runs.append((first, per))
        if not runs:
            runs = [(1, 1)]
        # walk chunks, assigning consecutive samples per the stsc runs
        si = 0
        for ci, off in enumerate(offsets, start=1):
            per = 1
            for first, p in runs:
                if first <= ci:
                    per = p
                else:
                    break
            pos = off
            for _ in range(per):
                if si >= len(sizes) or len(out["frames"]) >= max_frames:
                    break
                size = sizes[si]
                si += 1
                out["n_chunks"] += 1
                if 0 <= pos and pos + size <= n and size >= 3:
                    blob = payload[pos : pos + size]
                    if blob[:3] == b"\xff\xd8\xff":
                        out["frames"].append(blob)
                pos += size
            if si >= len(sizes) or len(out["frames"]) >= max_frames:
                break
        if out["frames"]:
            return out
    return out if out["frames"] else None


def _g711_tables():
    """(ulaw, alaw) 256-entry decode tables from the ITU-T G.711 reference
    expansion formulas (the CCITT reference code's ulaw2linear/
    alaw2linear): µ-law complements the code then expands mantissa+segment
    around a bias of 0x84; A-law XORs 0x55 then expands with the segment-0
    special case. Built once at first audio decode."""
    ulaw = []
    for code in range(256):
        u = ~code & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        ulaw.append((0x84 - t) if (u & 0x80) else (t - 0x84))
    alaw = []
    for code in range(256):
        a = code ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        else:
            t = (t + 0x108) << (seg - 1)
        alaw.append(t if (a & 0x80) else -t)
    return ulaw, alaw


_G711_ULAW, _G711_ALAW = _g711_tables()


def _read_extended80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (the AIFF COMM sample-rate field):
    sign(1) exponent(15) integer-bit+fraction(64)."""
    if len(b) < 10:
        return 0.0
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if not (16383 - 96 <= exp <= 16383 + 62):
        # hostile/absurd exponents, incl. the 0x7FFF Inf/NaN encoding:
        # 2.0 ** huge raises OverflowError, and no real sample rate lives
        # outside this window - treat as malformed (callers reject rate < 1)
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def parse_aiff(payload: bytes) -> dict | None:
    """Parse an AIFF / AIFF-C container (Apple's big-endian PCM sibling of
    WAV — EA IFF 85 chunks): COMM gives channels / frame count / bit
    depth / an 80-bit-extended sample rate, SSND holds the samples after
    an offset+blocksize prefix. AIFF-C is accepted for the uncompressed
    codecs only ('NONE' big-endian, 'sowt' little-endian — the two
    byte-order variants); compressed AIFF-C needs a codec and returns
    None. Same return contract as :func:`parse_wav`."""
    import numpy as np

    n = len(payload)
    if n < 12 or payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        return None
    is_aifc = payload[8:12] == b"AIFC"
    comm = None
    ssnd = None
    compression = b"NONE"
    i = 12
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack(">I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"COMM" and len(body) >= 18:
            channels, n_frames, bits = struct.unpack(">hIh", body[:8])
            rate = _read_extended80(body[8:18])
            comm = (channels, n_frames, bits, rate)
            if is_aifc and len(body) >= 22:
                compression = body[18:22]
        elif cid == b"SSND" and len(body) >= 8:
            (offset,) = struct.unpack(">I", body[:4])
            ssnd = body[8 + offset :]
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        return None
    channels, n_frames, bits, rate = comm
    if channels < 1 or rate < 1 or bits not in (8, 16, 32):
        return None
    if compression not in (b"NONE", b"sowt"):
        return None  # compressed AIFF-C (ima4, ulaw, ...) needs a codec
    bps = bits // 8
    usable = len(ssnd) - len(ssnd) % (bps * channels)
    order = "<" if compression == b"sowt" else ">"
    dtype = {8: np.int8, 16: np.dtype(f"{order}i2"), 32: np.dtype(f"{order}i4")}[bits]
    samples = np.frombuffer(ssnd[:usable], dtype=dtype)
    got = len(samples) // channels
    return {
        "format": "aiff",
        "sample_rate": int(rate),
        "n_channels": int(channels),
        "bits": int(bits),
        "n_samples": got,
        "duration_s": got / rate,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# Matroska / WebM — EBML container walk (RFC 8794 EBML + the public
# Matroska element registry). Header-level identity only, like
# sniff_isobmff: docType, duration via TimestampScale, per-track codec
# ids and video dims. No codec payload is decoded.
# ---------------------------------------------------------------------------

# containers whose payloads we descend into (master elements)
_EBML_MASTERS = frozenset((
    0x1A45DFA3,  # EBML header
    0x18538067,  # Segment
    0x1549A966,  # Info
    0x1654AE6B,  # Tracks
    0xAE,        # TrackEntry
    0xE0,        # Video
    0xE1,        # Audio
))


def _ebml_vint(data: bytes, pos: int, *, keep_marker: bool) -> tuple[int | None, int]:
    """EBML variable-size integer at ``pos`` → (value, new_pos). IDs keep
    the length-marker bit (the registry lists them that way); sizes strip
    it. An all-ones size (unknown length, RFC 8794 §7) returns None."""
    if pos >= len(data):
        return None, pos
    first = data[pos]
    if first == 0:
        return None, pos + 1
    ln = 9 - first.bit_length()  # leading zeros + 1 = total length
    if pos + ln > len(data):
        return None, len(data)
    raw = int.from_bytes(data[pos : pos + ln], "big")
    if not keep_marker:
        raw -= 1 << (7 * ln)  # strip the marker bit
        if raw == (1 << (7 * ln)) - 1:
            return None, pos + ln  # unknown size
    return raw, pos + ln


def parse_matroska(data: bytes, *, max_elements: int = 10_000) -> dict | None:
    """Header facts of a Matroska/WebM payload, or None when the payload
    is not EBML. Output: doctype ('webm'/'matroska'), duration_ms
    (Duration float x TimestampScale, default scale 1,000,000 ns),
    n_tracks, width/height (first video track's PixelWidth/PixelHeight),
    video_codec / audio_codec (first of each kind, e.g. 'V_VP9',
    'A_OPUS'). Hostile posture: every length bounds-checked, walk capped
    at ``max_elements``, unknown-size elements extend to the parent end
    (the streaming-Segment convention), junk yields what was parsed so
    far — never an exception."""
    import struct as _s

    if len(data) < 8 or data[:4] != b"\x1aE\xdf\xa3":
        return None
    out: dict = {
        "doctype": None, "duration_ms": None, "n_tracks": 0,
        "width": None, "height": None,
        "video_codec": None, "audio_codec": None,
    }
    scale = 1_000_000  # ns per tick, Matroska default
    duration_ticks = None
    budget = [max_elements]
    track_type = [0]

    def walk(pos: int, end: int, depth: int) -> None:
        nonlocal scale, duration_ticks
        while pos < end and budget[0] > 0 and depth < 8:
            budget[0] -= 1
            eid, pos = _ebml_vint(data, pos, keep_marker=True)
            if eid is None:
                return
            size, pos = _ebml_vint(data, pos, keep_marker=False)
            body_end = end if size is None else min(pos + size, end)
            if eid in _EBML_MASTERS:
                if eid == 0xAE:
                    out["n_tracks"] += 1
                    track_type[0] = 0
                walk(pos, body_end, depth + 1)
            elif eid == 0x4282:  # DocType (in the EBML header)
                out["doctype"] = data[pos:body_end].decode(
                    "latin-1", "replace"
                ) or None
            elif eid == 0x2AD7B1 and body_end > pos:  # TimestampScale
                scale = int.from_bytes(data[pos:body_end], "big") or scale
            elif eid == 0x4489 and body_end - pos in (4, 8):  # Duration
                fmt = ">f" if body_end - pos == 4 else ">d"
                duration_ticks = _s.unpack(fmt, data[pos:body_end])[0]
            elif eid == 0x83 and body_end > pos:  # TrackType
                track_type[0] = data[pos]
            elif eid == 0x86:  # CodecID
                cid = data[pos:body_end].decode("latin-1", "replace")
                if track_type[0] == 1 and out["video_codec"] is None:
                    out["video_codec"] = cid
                elif track_type[0] == 2 and out["audio_codec"] is None:
                    out["audio_codec"] = cid
            elif eid == 0xB0 and body_end > pos and out["width"] is None:
                out["width"] = int.from_bytes(data[pos:body_end], "big")
            elif eid == 0xBA and body_end > pos and out["height"] is None:
                out["height"] = int.from_bytes(data[pos:body_end], "big")
            if size is None:
                # unknown-size master consumed the rest of the parent
                return
            pos = body_end

    walk(0, len(data), 0)
    if duration_ticks is not None and duration_ticks >= 0:
        out["duration_ms"] = int(duration_ticks * scale / 1_000_000)
    return out


def _ebml_elem(eid: int, body: bytes) -> bytes:
    """One EBML element with a minimal-length size field."""
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    n = len(body)
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            break
    size = (n | (1 << (7 * ln))).to_bytes(ln, "big")
    return idb + size + body


def build_matroska_bytes(
    *,
    doctype: str = "webm",
    duration_ms: int | None = 4000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "V_VP9",
    audio_codec: str = "A_OPUS",
) -> bytes:
    """A REAL minimal Matroska/WebM header: EBML header with DocType,
    Segment with Info (TimestampScale + float64 Duration) and Tracks
    (one video TrackEntry with dims + codec, one audio TrackEntry). The
    fixture inverse of parse_matroska — no clusters/frames, exactly the
    part of the container identity work reads."""
    import struct as _s

    ebml = _ebml_elem(0x1A45DFA3, b"".join((
        _ebml_elem(0x4286, b"\x01"),          # EBMLVersion
        _ebml_elem(0x42F7, b"\x01"),          # EBMLReadVersion
        _ebml_elem(0x4282, doctype.encode()),  # DocType
        _ebml_elem(0x4287, b"\x04"),          # DocTypeVersion
    )))
    info = b"".join((
        _ebml_elem(0x2AD7B1, (1_000_000).to_bytes(3, "big")),
        b"" if duration_ms is None
        else _ebml_elem(0x4489, _s.pack(">d", float(duration_ms))),
    ))
    vtrack = _ebml_elem(0xAE, b"".join((
        _ebml_elem(0xD7, b"\x01"),            # TrackNumber
        _ebml_elem(0x83, b"\x01"),            # TrackType video
        _ebml_elem(0x86, video_codec.encode()),
        _ebml_elem(0xE0, b"".join((
            _ebml_elem(0xB0, width.to_bytes(2, "big")),
            _ebml_elem(0xBA, height.to_bytes(2, "big")),
        ))),
    )))
    atrack = _ebml_elem(0xAE, b"".join((
        _ebml_elem(0xD7, b"\x02"),
        _ebml_elem(0x83, b"\x02"),            # TrackType audio
        _ebml_elem(0x86, audio_codec.encode()),
        _ebml_elem(0xE1, _ebml_elem(0xB5, _s.pack(">f", 48000.0))),
    )))
    segment = _ebml_elem(0x18538067, b"".join((
        _ebml_elem(0x1549A966, info),
        _ebml_elem(0x1654AE6B, vtrack + atrack),
    )))
    return ebml + segment


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4/MOV) track-level identity — the moov/trak twin of the
# Matroska EBML walk above, so the two dominant video containers expose
# symmetric columns (ISO/IEC 14496-12: mvhd for duration, hdlr for the
# track handler, stsd sample entries for codec fourcc + coded dims).
# ---------------------------------------------------------------------------


def parse_mp4_info(payload: bytes, *, max_traks: int = 64) -> dict | None:
    """Track-level MP4/MOV container identity without decoding a frame:
    ``{brand, duration_ms, n_tracks, width, height, video_codec,
    audio_codec}`` — brand from ftyp (None for classic moov-first
    QuickTime), duration from mvhd (v0 and v1), per-trak handler from
    hdlr and codec fourcc from the first stsd sample entry; the first
    video trak also contributes the VisualSampleEntry coded dims.
    Hostile posture: every offset bounds-checked by the shared box
    iterator, trak census capped, None for non-ISO-BMFF payloads."""
    n = len(payload)
    if n < 16:
        return None
    head = payload[4:8]
    if head not in (b"ftyp", b"moov", b"mdat", b"wide", b"free", b"skip", b"pnot"):
        return None
    moov = _find_box(payload, [b"moov"], 0, n)
    if moov is None:
        return None
    out: dict = {
        "brand": payload[8:12].decode("latin-1").strip()
        if head == b"ftyp"
        else None,
        "duration_ms": None,
        "n_tracks": 0,
        "width": None,
        "height": None,
        "video_codec": None,
        "audio_codec": None,
    }
    mvhd = _find_box(payload, [b"mvhd"], moov[0], moov[1])
    if mvhd is not None:
        b0, b1 = mvhd
        version = payload[b0]
        timescale = duration = 0
        if version == 1 and b1 - b0 >= 32:
            timescale, duration = struct.unpack(">IQ", payload[b0 + 20 : b0 + 32])
        elif version == 0 and b1 - b0 >= 24:
            timescale, duration = struct.unpack(">II", payload[b0 + 12 : b0 + 20])
        if timescale:
            out["duration_ms"] = round(duration * 1000 / timescale)
    for btype, t0, t1 in _iter_boxes(payload, moov[0], moov[1]):
        if btype != b"trak":
            continue
        out["n_tracks"] += 1
        if out["n_tracks"] > max_traks:  # hostile trak flood
            break
        mdia = _find_box(payload, [b"mdia"], t0, t1)
        if mdia is None:
            continue
        hdlr = _find_box(payload, [b"hdlr"], mdia[0], mdia[1])
        stsd = _find_box(
            payload, [b"minf", b"stbl", b"stsd"], mdia[0], mdia[1]
        )
        if hdlr is None or stsd is None:
            continue
        h0, h1 = hdlr
        if h1 - h0 < 12:
            continue
        handler = payload[h0 + 8 : h0 + 12]  # FullBox(4) + pre_defined(4)
        s0, s1 = stsd
        if s1 - s0 < 16:  # FullBox(4) + entry_count(4) + entry header(8)
            continue
        e0 = s0 + 8  # first sample entry (box header: size + format)
        fmt = payload[e0 + 4 : e0 + 8].decode("latin-1").strip("\x00").strip()
        if handler == b"vide" and out["video_codec"] is None:
            out["video_codec"] = fmt or None
            # VisualSampleEntry coded dims: 8 (entry header) + 6 reserved
            # + 2 data_ref_index + 16 pre_defined/reserved -> u16 w, h
            if e0 + 36 <= s1:
                w, h = struct.unpack(">HH", payload[e0 + 32 : e0 + 36])
                if w > 0 and h > 0:
                    out["width"], out["height"] = int(w), int(h)
        elif handler == b"soun" and out["audio_codec"] is None:
            out["audio_codec"] = fmt or None
    return out


def _bmff_box(btype: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4_bytes(
    *,
    brand: str = "isom",
    duration_ms: int | None = 4000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "avc1",
    audio_codec: str = "mp4a",
    mvhd_version: int = 0,
) -> bytes:
    """A REAL minimal MP4/MOV header: ftyp, moov with a spec-sized mvhd
    (v0 or v1, timescale 1000 so duration_ms is exact) and one video +
    one audio trak, each carrying hdlr and a correctly-laid-out stsd
    sample entry (VisualSampleEntry dims at offset 32). The fixture
    inverse of parse_mp4_info for oracles and tests."""
    import struct as _s

    ftyp = _bmff_box(
        b"ftyp", brand.encode().ljust(4), b"\x00" * 4, brand.encode().ljust(4)
    )
    if mvhd_version == 1:
        mvhd_body = (
            b"\x01\x00\x00\x00"  # version 1 + flags
            + b"\x00" * 16  # creation/modification u64
            + _s.pack(">I", 1000)
            + _s.pack(">Q", duration_ms or 0)
            + b"\x00" * 80  # rate..next_track_ID
        )
    else:
        mvhd_body = (
            b"\x00" * 4  # version 0 + flags
            + b"\x00" * 8  # creation/modification u32
            + _s.pack(">I", 1000)
            + _s.pack(">I", duration_ms or 0)
            + b"\x00" * 80
        )
    mvhd = _bmff_box(b"mvhd", mvhd_body)

    def hdlr(handler: bytes) -> bytes:
        return _bmff_box(
            b"hdlr", b"\x00" * 4, b"\x00" * 4, handler, b"\x00" * 12, b"\x00"
        )

    def trak(handler: bytes, entry: bytes) -> bytes:
        stsd = _bmff_box(b"stsd", b"\x00" * 4, _s.pack(">I", 1), entry)
        stbl = _bmff_box(b"stbl", stsd)
        minf = _bmff_box(b"minf", stbl)
        mdia = _bmff_box(b"mdia", hdlr(handler), minf)
        return _bmff_box(b"trak", mdia)

    ventry = _bmff_box(
        video_codec.encode().ljust(4),
        b"\x00" * 6,
        _s.pack(">H", 1),  # data_reference_index
        b"\x00" * 16,  # pre_defined / reserved
        _s.pack(">HH", width, height),
        _s.pack(">II", 0x00480000, 0x00480000),  # 72 dpi
        b"\x00" * 4,
        _s.pack(">H", 1),  # frame_count
        b"\x00" * 32,  # compressorname
        _s.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    aentry = _bmff_box(
        audio_codec.encode().ljust(4),
        b"\x00" * 6,
        _s.pack(">H", 1),
        b"\x00" * 8,  # reserved
        _s.pack(">HH", 2, 16),  # channels, sample size
        b"\x00" * 4,
        _s.pack(">I", 48000 << 16),  # sample rate 16.16
    )
    moov = _bmff_box(
        b"moov", mvhd, trak(b"vide", ventry), trak(b"soun", aentry)
    )
    return ftyp + moov + _bmff_box(b"mdat", b"\x00" * 8)


# ---------------------------------------------------------------------------
# EXIF metadata beyond Orientation — the Tika image-metadata surface
# (tiff:Make/Model, exif:DateTimeOriginal, geo:lat/long). TIFF 6.0 +
# EXIF 2.3 public specs: IFD walks with ASCII and RATIONAL value areas,
# the EXIF (0x8769) and GPS (0x8825) sub-IFD pointers.
# ---------------------------------------------------------------------------


def _tiff_ifd_full(payload: bytes, ifd_off: int, endian: str) -> dict:
    """tag → decoded value for one IFD: SHORT/LONG scalars, ASCII strings
    (inline or via offset, NUL-stripped), and RATIONAL lists as
    (num, den) tuples. Unknown types are skipped; every offset is
    bounds-checked."""
    out: dict = {}
    if ifd_off < 0 or ifd_off + 2 > len(payload):
        return out
    (n_entries,) = struct.unpack(f"{endian}H", payload[ifd_off : ifd_off + 2])
    for k in range(min(n_entries, 512)):
        e = ifd_off + 2 + 12 * k
        if e + 12 > len(payload):
            break
        tag, typ, count = struct.unpack(f"{endian}HHI", payload[e : e + 8])
        val = payload[e + 8 : e + 12]
        if typ == 3 and count == 1:
            (out[tag],) = struct.unpack(f"{endian}H", val[:2])
        elif typ == 4 and count == 1:
            (out[tag],) = struct.unpack(f"{endian}I", val)
        elif typ == 2 and count > 0:  # ASCII
            if count <= 4:
                raw = val[:count]
            else:
                (off,) = struct.unpack(f"{endian}I", val)
                if off + count > len(payload):
                    continue
                raw = payload[off : off + count]
            out[tag] = raw.split(b"\x00", 1)[0].decode("latin-1", "replace")
        elif typ == 5 and 1 <= count <= 16:  # RATIONAL(s), always via offset
            (off,) = struct.unpack(f"{endian}I", val)
            if off + 8 * count > len(payload):
                continue
            rats = []
            for j in range(count):
                num, den = struct.unpack(
                    f"{endian}II", payload[off + 8 * j : off + 8 * j + 8]
                )
                rats.append((num, den))
            out[tag] = rats if count > 1 else rats[0]
    return out


def _exif_tiff_body(payload: bytes) -> bytes | None:
    """The TIFF-structured EXIF body: the payload itself for bare TIFF, or
    the APP1 ``Exif\\0\\0`` segment of a JPEG."""
    if _tiff_endian(payload) is not None:
        return payload
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if seg_len < 2:
            return None
        if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            return payload[i + 10 : i + 2 + seg_len]
        i += 2 + seg_len
    return None


def _gps_degrees(rats, ref: str | None, neg_ref: str) -> float | None:
    """(deg, min, sec) RATIONALs + hemisphere ref → signed decimal degrees
    (deg + min/60 + sec/3600, left-to-right IEEE — the same expression the
    cross-engine oracle states)."""
    if not isinstance(rats, list) or len(rats) != 3:
        return None
    try:
        d = rats[0][0] / rats[0][1]
        m = rats[1][0] / rats[1][1]
        s = rats[2][0] / rats[2][1]
    except ZeroDivisionError:
        return None
    v = d + m / 60 + s / 3600
    return -v if (ref or "").upper().startswith(neg_ref) else v


def parse_exif(payload: bytes) -> dict | None:
    """EXIF facts from a JPEG APP1 segment or bare TIFF: orientation
    (1..8), make, model, datetime (DateTimeOriginal 0x9003 from the EXIF
    sub-IFD, falling back to IFD0 DateTime 0x0132), gps_lat / gps_lon
    (decimal degrees, southern/western negative). None when the payload has
    no EXIF structure. Reference parity: Tika's image parsers surface the
    same fields (tiff:Make, tiff:Model, exif:DateTimeOriginal,
    geo:lat/long); hostile posture: every offset bounds-checked, junk
    yields missing fields, never an exception."""
    body = _exif_tiff_body(payload)
    if body is None:
        return None
    endian = _tiff_endian(body)
    if endian is None:
        return None
    (ifd_off,) = struct.unpack(f"{endian}I", body[4:8])
    ifd0 = _tiff_ifd_full(body, ifd_off, endian)
    if not ifd0:
        return None
    out = {
        "orientation": None, "make": None, "model": None,
        "datetime": None, "gps_lat": None, "gps_lon": None,
    }
    o = ifd0.get(0x0112)
    if isinstance(o, int) and 1 <= o <= 8:
        out["orientation"] = o
    if isinstance(ifd0.get(0x010F), str):
        out["make"] = ifd0[0x010F]
    if isinstance(ifd0.get(0x0110), str):
        out["model"] = ifd0[0x0110]
    if isinstance(ifd0.get(0x0132), str):
        out["datetime"] = ifd0[0x0132]
    exif_ptr = ifd0.get(0x8769)
    if isinstance(exif_ptr, int):
        sub = _tiff_ifd_full(body, exif_ptr, endian)
        if isinstance(sub.get(0x9003), str):
            out["datetime"] = sub[0x9003]
    gps_ptr = ifd0.get(0x8825)
    if isinstance(gps_ptr, int):
        gps = _tiff_ifd_full(body, gps_ptr, endian)
        out["gps_lat"] = _gps_degrees(gps.get(2), gps.get(1), "S")
        out["gps_lon"] = _gps_degrees(gps.get(4), gps.get(3), "W")
    return out


def build_exif_jpeg(
    *,
    orientation: int = 1,
    make: str = "",
    model: str = "",
    datetime_original: str = "",
    lat_dms: tuple[int, int, int] | None = None,
    lon_dms: tuple[int, int, int] | None = None,
    lat_ref: str = "N",
    lon_ref: str = "E",
) -> bytes:
    """A REAL minimal JPEG carrying an APP1 EXIF block (little-endian
    TIFF): IFD0 with Orientation/Make/Model + EXIF and GPS sub-IFD
    pointers, DateTimeOriginal in the EXIF IFD, (deg, min, sec·100/100)
    RATIONALs + hemisphere refs in the GPS IFD. The fixture inverse of
    parse_exif. ``lat_dms``/``lon_dms`` take integer (deg, min,
    sec_hundredths)."""
    data = bytearray()  # deferred value area, offsets patched at the end
    deferred: list[tuple[int, bytes]] = []  # (entry value-slot offset, blob)

    def entry(tag: int, typ: int, count: int, inline: bytes | None,
              blob: bytes | None, at: bytearray) -> None:
        at += struct.pack("<HHI", tag, typ, count)
        if inline is not None:
            at += inline.ljust(4, b"\x00")[:4]
        else:
            deferred.append((len(at) + base_of[id(at)], blob))
            at += b"\x00\x00\x00\x00"

    # three IFDs laid out back-to-back after the 8-byte header
    ifd0 = bytearray()
    exif_ifd = bytearray()
    gps_ifd = bytearray()
    n0 = 3 + (1 if make else 0) + (1 if model else 0)
    ne = 1 if datetime_original else 0
    ng = 4 if lat_dms and lon_dms else 0
    off0 = 8
    offe = off0 + 2 + 12 * n0 + 4
    offg = offe + (2 + 12 * ne + 4 if ne else 0)
    data_off = offg + (2 + 12 * ng + 4 if ng else 0)
    base_of = {}

    def ifd(at: bytearray, n: int) -> None:
        at += struct.pack("<H", n)

    ifd(ifd0, n0)
    base_of[id(ifd0)] = off0 + 0  # offsets inside `at` are absolute below
    base_of[id(exif_ifd)] = offe
    base_of[id(gps_ifd)] = offg

    def ascii_entry(tag: int, s: str, at: bytearray) -> None:
        raw = s.encode("latin-1", "replace") + b"\x00"
        if len(raw) <= 4:
            entry(tag, 2, len(raw), raw, None, at)
        else:
            entry(tag, 2, len(raw), None, raw, at)

    if make:
        ascii_entry(0x010F, make, ifd0)
    if model:
        ascii_entry(0x0110, model, ifd0)
    entry(0x0112, 3, 1, struct.pack("<H", orientation), None, ifd0)
    entry(0x8769, 4, 1, struct.pack("<I", offe), None, ifd0)
    entry(0x8825, 4, 1, struct.pack("<I", offg), None, ifd0)
    ifd0 += b"\x00\x00\x00\x00"  # next-IFD = none

    if ne:
        ifd(exif_ifd, ne)
        ascii_entry(0x9003, datetime_original, exif_ifd)
        exif_ifd += b"\x00\x00\x00\x00"
    if ng:
        ifd(gps_ifd, ng)

        def rats(dms):
            d, m, s100 = dms
            return struct.pack("<IIIIII", d, 1, m, 1, s100, 100)

        entry(1, 2, 2, lat_ref.encode() + b"\x00", None, gps_ifd)
        entry(2, 5, 3, None, rats(lat_dms), gps_ifd)
        entry(3, 2, 2, lon_ref.encode() + b"\x00", None, gps_ifd)
        entry(4, 5, 3, None, rats(lon_dms), gps_ifd)
        gps_ifd += b"\x00\x00\x00\x00"

    # assemble + patch deferred value offsets
    tiff = bytearray(b"II*\x00" + struct.pack("<I", off0))
    tiff += ifd0 + exif_ifd + gps_ifd
    pos = data_off
    for slot, blob in deferred:
        struct.pack_into("<I", tiff, slot, pos)
        tiff += blob
        pos += len(blob)
    app1 = b"Exif\x00\x00" + bytes(tiff)
    return (
        b"\xff\xd8"
        + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
        + b"\xff\xd9"
    )
