"""Long-tail formats (operators/parse_tail.py): legacy/modern iWork
packages, WordPerfect 5/6 best-effort text, CHM container directory +
section-0 extraction — the slices of parse-tika's Tika delegation
(TikaParser.java:63-160) beyond the office/PDF mass."""

from __future__ import annotations

import gzip
import io
import struct
import zipfile

from nutch_spark.operators.parse_binary import extract_text
from nutch_spark.operators.parse_tail import (
    CHM_MIME,
    IWORK_KEYNOTE,
    IWORK_NUMBERS,
    IWORK_PAGES,
    WPD_MIME,
    build_chm_bytes,
    build_wpd_bytes,
    extract_chm_text,
    extract_wpd_text,
    iwork13_mime,
    parse_chm_directory,
)

_SL = "http://developer.apple.com/namespaces/sl"
_LS = "http://developer.apple.com/namespaces/ls"
_KEY = "http://developer.apple.com/namespaces/keynote2"
_SF = "http://developer.apple.com/namespaces/sf"


def _iwork_zip(entry: str, xml: str, gz: bool = False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(entry, gzip.compress(xml.encode()) if gz else xml)
        z.writestr("QuickLook/Thumbnail.jpg", b"\xff\xd8\xff")
    return buf.getvalue()


def _doc_xml(root_ns: str, root: str = "document") -> str:
    return (
        f'<sl:{root} xmlns:sl="{root_ns}" xmlns:sf="{_SF}">'
        "<sf:text-storage><sf:text-body>"
        "<sf:p>First paragraph</sf:p>"
        "<sf:p>Second <sf:span>styled</sf:span> para</sf:p>"
        f"</sf:text-body></sf:text-storage></sl:{root}>"
    )


def test_iwork_legacy_pages_gzipped_index():
    mime, text = extract_text(_iwork_zip("index.xml.gz", _doc_xml(_SL), gz=True))
    assert mime == IWORK_PAGES
    assert text == "First paragraph\nSecond styled para"


def test_iwork_legacy_numbers_and_keynote():
    mime, text = extract_text(_iwork_zip("index.xml", _doc_xml(_LS)))
    assert mime == IWORK_NUMBERS and "First paragraph" in text
    mime, text = extract_text(_iwork_zip("index.apxl", _doc_xml(_KEY, "presentation")))
    assert mime == IWORK_KEYNOTE and "styled para" in text


def test_iwork13_bundle_typing():
    # typed from distinguishing entries, like Tika's IWork13PackageParser
    assert iwork13_mime(["Index/Slide-1.iwa", "Index/Document.iwa"]) == IWORK_KEYNOTE
    assert (
        iwork13_mime(["Index/CalculationEngine.iwa", "Index/Document.iwa"])
        == IWORK_NUMBERS
    )
    assert iwork13_mime(["Index/Document.iwa"]) == IWORK_PAGES
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("Index/Document.iwa", b"\x00\x12\x00\x00")
        z.writestr("Metadata/Properties.plist", b"")
    mime, text = extract_text(buf.getvalue())
    assert mime == IWORK_PAGES and text == ""  # IWA decode: documented seam


def test_wpd_round_trip_wp6_and_wp5():
    body = "Hello WordPerfect world\nsecond line"
    assert extract_text(build_wpd_bytes(body)) == (WPD_MIME, body)
    assert extract_text(build_wpd_bytes(body, version=5)) == (WPD_MIME, body)


def test_wpd_extended_char_and_unknown_function_codes():
    # extended char in charset 0 passes through; mapped charsets decode
    # through the r16 appendix tables; unmapped charsets become '?'
    data = build_wpd_bytes("caf") + bytes([0xC0, ord("e"), 0x00, 0xC0])
    assert extract_wpd_text(data)[1].endswith("cafe")
    data = build_wpd_bytes("nai") + bytes([0xC0, 0x24, 0x01, 0xC0])
    assert extract_wpd_text(data)[1].endswith("naiÆ")  # Multinational 1, 36
    data = build_wpd_bytes("heb") + bytes([0xC0, 0x05, 0x09, 0xC0])
    assert extract_wpd_text(data)[1].endswith("heb?")  # Hebrew: unmapped
    # a variable-length group with a bogus size falls back to the
    # closing-code-byte scan instead of swallowing the document
    bogus = build_wpd_bytes("before") + bytes([0xD3, 0x05, 0xFF, 0xFF, 0xD3]) + b"after"
    assert extract_wpd_text(bogus)[1] == "beforeafter"


def test_wpd_encrypted_degrades_to_mime_only():
    data = bytearray(build_wpd_bytes("secret text"))
    struct.pack_into("<H", data, 12, 0xBEEF)  # non-zero encryption key
    assert extract_text(bytes(data)) == (WPD_MIME, "")


def test_wpd_truncated_and_garbage_safe():
    assert extract_wpd_text(b"\xffWPC")[1] == ""
    assert extract_wpd_text(b"\xffWPC" + b"\x00" * 12)[1] == ""
    junk = b"\xffWPC" + struct.pack("<I", 16) + b"\x01\x0a\x02\x00" + b"\x00\x00" + b"\x00\x00" + bytes(range(0xC1, 0xD0))
    mime, _ = extract_wpd_text(junk)  # must terminate, not loop
    assert mime == WPD_MIME


def test_chm_directory_and_section0_text():
    chm = build_chm_bytes(
        {
            "/page.html": b"<html><body><p>Help page body text</p></body></html>",
            "/readme.txt": b"plain readme",
            "::DataSpace/Storage/MSCompressed/Content": b"\x00" * 8,
        },
        language_id=0x407,
    )
    d = parse_chm_directory(chm)
    assert d["version"] == 3 and d["language_id"] == 0x407
    names = [e[0] for e in d["entries"]]
    assert "/page.html" in names and "/readme.txt" in names
    mime, text = extract_text(chm)
    assert mime == CHM_MIME
    # HTML entry flows through the HTML text path, txt through plain text;
    # the ::DataSpace system entry is skipped
    assert "Help page body text" in text and "plain readme" in text


def test_chm_garbage_safe():
    assert parse_chm_directory(b"ITSF" + b"\x00" * 10) == {}
    assert extract_chm_text(b"ITSF" + b"\x00" * 200)[0] == CHM_MIME


def test_detect_mime_magic_for_new_formats(spark):
    from pyspark.sql import functions as F

    from nutch_spark.functions.mime import detect_mime

    df = spark.createDataFrame(
        [
            ("http://a.com/doc.wpd", bytearray(build_wpd_bytes("x")), None),
            ("http://a.com/help.chm", bytearray(build_chm_bytes({"/a.txt": b"t"})), None),
        ],
        "url string, content binary, ctype string",
    )
    got = {
        r["url"]: r["mime"]
        for r in df.select(
            "url", detect_mime("url", "content", "ctype").alias("mime")
        ).collect()
    }
    assert got["http://a.com/doc.wpd"] == WPD_MIME
    assert got["http://a.com/help.chm"] == CHM_MIME


def test_compressor_dispatch_gz_bz2_xz():
    """Single-file compressors (Tika CompressorParser slot): bounded
    decompress then re-dispatch on the inner magic; HTML payloads flow
    through the HTML text extractor; bombs and corrupt members degrade to
    mime-only."""
    import bz2
    import gzip
    import lzma

    html = b"<html><body><p>inner page text</p></body></html>"
    assert extract_text(gzip.compress(html)) == ("application/gzip", "inner page text")
    assert extract_text(bz2.compress(b"plain inner text")) == (
        "application/x-bzip2",
        "plain inner text",
    )
    assert extract_text(lzma.compress(html, format=lzma.FORMAT_XZ)) == (
        "application/x-xz",
        "inner page text",
    )
    # a compressed WordPerfect document re-dispatches into the WPD path
    assert extract_text(gzip.compress(build_wpd_bytes("zipped wpd body"))) == (
        "application/gzip",
        "zipped wpd body",
    )
    # depth guard: double-wrapped still extracts (2 levels allowed)
    assert extract_text(gzip.compress(gzip.compress(b"deep text")))[1] == "deep text"
    # decompression bomb and corrupt stream: mime only, no text, no error
    assert extract_text(gzip.compress(b"\x00" * (10 << 20))) == ("application/gzip", "")
    assert extract_text(b"\x1f\x8b\x08garbage") == ("application/gzip", "")


def test_cab_all_codecs_round_trip():
    """[MS-CAB] cabinets: stored, MSZIP (deflate with history carry) and
    LZX folders all extract; members route through the recursive dispatch
    (HTML member -> HTML text path). Multi-frame folders (> 32 KiB) prove
    the MSZIP zdict carry and the LZX cross-CFDATA tree-delta stream."""
    from nutch_spark.operators.parse_tail import (
        CAB_MIME,
        build_cab_bytes,
        parse_cab,
    )

    files = {
        "readme.txt": b"cab readme text",
        "page.html": b"<html><body><p>cab html body</p></body></html>",
    }
    for comp in ("none", "mszip", "lzx"):
        cab = build_cab_bytes(files, compression=comp)
        assert dict(parse_cab(cab)) == files
        mime, text = extract_text(cab)
        assert mime == CAB_MIME
        assert "readme.txt cab readme text" in text
        assert "cab html body" in text and "<p>" not in text
    big = {"big.txt": b"repetitive cab content line\n" * 2500}
    for comp in ("mszip", "lzx"):
        cab = build_cab_bytes(big, compression=comp)
        assert dict(parse_cab(cab)) == big


def test_cab_garbage_safe():
    from nutch_spark.operators.parse_tail import parse_cab

    assert parse_cab(b"MSCF" + b"\x00" * 8) == []
    assert parse_cab(b"not a cab at all") == []
    # corrupt folder drops its files without raising
    from nutch_spark.operators.parse_tail import build_cab_bytes

    cab = bytearray(build_cab_bytes({"/a.txt": b"text body here"}, compression="mszip"))
    cab[-10:] = b"\x00" * 10
    assert parse_cab(bytes(cab)) == []


def test_snappy_round_trip_and_copy_tags():
    from nutch_spark.operators.parse_tail import (
        snappy_compress_literal,
        snappy_decompress,
    )

    for payload in (b"short", b"x" * 500, bytes(range(256))):
        assert snappy_decompress(snappy_compress_literal(payload)) == payload
    # hand-rolled 1-byte-offset copy: "abcd" + copy(off=4, len=4)
    blk = bytes([8, (4 - 1) << 2]) + b"abcd" + bytes([1, 4])
    assert snappy_decompress(blk) == b"abcdabcd"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snappy_decompress(bytes([8, 1, 4]))  # copy before stream start


def test_iwork13_iwa_text_sweep():
    """'13+ bundle: .iwa chunks (snappy-framed protobuf) decode and the
    wire-format walk surfaces prose string fields — more than Tika's
    IWork13PackageParser (type-only) manages."""
    from nutch_spark.operators.parse_tail import snappy_compress_literal

    def pb_string(field, s):
        b = s.encode()
        return bytes([(field << 3) | 2, len(b)]) + b

    inner = (
        pb_string(3, "Hello from Pages thirteen.")
        + bytes([(1 << 3) | 0, 5])  # a varint field between the strings
        + pb_string(7, "Second paragraph of text")
    )
    outer = (
        bytes([(2 << 3) | 2, len(inner)])
        + inner
        + bytes([(4 << 3) | 5])
        + b"\x01\x02\x03\x04"  # fixed32 noise
    )
    snapped = snappy_compress_literal(outer)
    iwa = b"\x00" + len(snapped).to_bytes(3, "little") + snapped
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("Index/Document.iwa", iwa)
        z.writestr("Metadata/Properties.plist", b"")
    mime, text = extract_text(buf.getvalue())
    assert mime == IWORK_PAGES
    assert text == "Hello from Pages thirteen.\nSecond paragraph of text"


def test_tar_member_extraction():
    """tar archives (Tika PackageParser slot): members route through the
    recursive dispatch, '.tar.gz' flows compressor -> tar."""
    import gzip
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, blob in (
            ("docs/readme.txt", b"tar member text"),
            ("docs/page.html", b"<html><body><p>tar html body</p></body></html>"),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    tar = buf.getvalue()
    assert extract_text(tar) == (
        "application/x-tar",
        "docs/readme.txt tar member text\ndocs/page.html tar html body",
    )
    mime, text = extract_text(gzip.compress(tar))
    assert mime == "application/gzip" and "tar member text" in text


def test_hostile_container_headers_terminate_quickly():
    """Forged counts/sizes must neither loop for minutes nor allocate
    unbounded output: CHM with a huge num_blocks / zero block_len, a CAB
    whose header points past the buffer, a ResetTable promising 2^40
    uncompressed bytes, a snappy preamble promising 1 GiB."""
    import time

    from nutch_spark.operators.parse_tail import (
        build_chm_bytes,
        extract_chm_text,
        parse_cab,
        parse_chm_directory,
        snappy_decompress,
    )

    t0 = time.monotonic()
    # CHM: forge num_blocks (dir_off+0x2C) and block_len (dir_off+0x10)
    chm = bytearray(build_chm_bytes({"/a.txt": b"x"}))
    dir_off = 0x60 + 0x18
    struct.pack_into("<I", chm, dir_off + 0x2C, 0xFFFFFFF0)
    assert parse_chm_directory(bytes(chm))["entries"] is not None
    struct.pack_into("<I", chm, dir_off + 0x10, 0)
    assert parse_chm_directory(bytes(chm))["entries"] == []
    # CHM: forge the ResetTable's uncompressed length into a bomb
    chm2 = bytearray(build_chm_bytes({}, compressed_files={"/a.txt": b"tiny"}))
    rt = bytes(chm2).index(struct.pack("<IIII", 2, 1, 8, 0x28))
    assert extract_chm_text(bytes(chm2))[1] == "tiny"  # sane before forgery
    chm2[rt + 0x10 : rt + 0x18] = struct.pack("<Q", 1 << 40)  # unc_len
    assert extract_chm_text(bytes(chm2))[1] == ""
    # CAB: file table offset beyond the buffer
    cab = bytearray(b"MSCF" + b"\x00" * 32)
    struct.pack_into("<I", cab, 16, 0xFFFFFF)
    struct.pack_into("<HH", cab, 26, 1, 5)
    assert parse_cab(bytes(cab)) == []
    # snappy preamble bomb
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snappy_decompress(b"\x80\x80\x80\x80\x04" + b"\x00" * 10)
    assert time.monotonic() - t0 < 5.0


def test_review_regressions_round9():
    """Regressions for the round-9 self-review findings: non-Apple
    index.xml falls back to zip-member extraction; truncated snappy copy
    tags raise ValueError and a corrupt .iwa chunk doesn't kill the
    bundle; a 0x58-byte ITSF v3 header degrades cleanly; a chained
    (prev-cabinet) CAB still yields this volume's members."""
    import pytest as _pytest

    from nutch_spark.operators.parse_tail import (
        build_cab_bytes,
        extract_chm_text,
        parse_cab,
        snappy_compress_literal,
        snappy_decompress,
    )

    # 1. plain zip with a non-Apple index.xml: other members survive
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("index.xml", "<site><p>hello</p></site>")
        z.writestr("readme.txt", "other member text")
    mime, text = extract_text(buf.getvalue())
    assert mime == "application/zip"
    assert "other member text" in text
    # 2. truncated 1-byte-offset copy tag: ValueError, not IndexError
    with _pytest.raises(ValueError):
        snappy_decompress(bytes([4, 0b01010101]))
    # ...and one corrupt chunk doesn't lose the rest of the bundle
    good = snappy_compress_literal(bytes([(3 << 3) | 2, 12]) + b"good text ok")
    iwa = (
        b"\x00" + (2).to_bytes(3, "little") + bytes([4, 0b01010101])
        + b"\x00" + len(good).to_bytes(3, "little") + good
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("Index/Document.iwa", iwa)
    mime, text = extract_text(buf.getvalue())
    assert mime == IWORK_PAGES and text == "good text ok"
    # 3. ITSF v3 header truncated to exactly 0x58 bytes: degrade contract
    hdr = bytearray(build_chm_bytes({"/a.txt": b"x"})[:0x58])
    assert extract_chm_text(bytes(hdr)) == (CHM_MIME, "")
    # 4. multi-volume CAB: prev-cabinet strings skipped, members parse
    cab = build_cab_bytes(
        {"vol2.txt": b"second volume text"},
        compression="mszip",
        prev_cabinet=("part1.cab", "disk one"),
    )
    assert dict(parse_cab(cab)) == {"vol2.txt": b"second volume text"}


def test_second_review_regressions_round9():
    """Second self-review pass: CAB output-bomb guard, oversubscribed LZX
    tree rejection, cab-in-cab depth cutoff, corrupt .iwa member skip,
    unambiguous-iWork corrupt-index typing."""
    import time

    import pytest as _pytest

    from nutch_spark.functions.lzx import LzxDecoder, _BitWriter
    from nutch_spark.operators.parse_tail import (
        build_cab_bytes,
        parse_cab,
        snappy_compress_literal,
    )

    t0 = time.monotonic()
    # 1. a folder claiming ~80 MiB of output from ~15 KiB of input trips
    # the bomb guard BEFORE decompression: its files drop, and a healthy
    # sibling folder in the same cabinet still extracts
    n_frames = 1300  # 1300 x 0xFFFF ≈ 81 MiB claimed
    cfdata = b"".join(
        struct.pack("<IHH", 0, 2, 0xFFFF) + b"CK" for _ in range(n_frames)
    )
    coff_files = 36 + 8
    name = b"bomb.bin\x00"
    cffile = struct.pack("<IIHHHH", 0xFFFF, 0, 0, 0, 0, 0x20) + name
    coff_data = coff_files + len(cffile)
    header = (
        b"MSCF" + struct.pack("<I", 0)
        + struct.pack("<I", coff_data + len(cfdata))
        + struct.pack("<I", 0) + struct.pack("<I", coff_files)
        + struct.pack("<I", 0) + bytes([3, 1])
        + struct.pack("<HHHHH", 1, 1, 0, 0, 0)
    )
    cffolder = struct.pack("<IHH", coff_data, n_frames, 1)  # MSZIP
    bomb = header + cffolder + cffile + cfdata
    assert parse_cab(bomb) == []  # guard fired, nothing materialized
    # 2. oversubscribed Huffman tree fails loudly (no silent list growth)
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(1, 3)  # verbatim
    bw.write(0, 16)
    bw.write(8, 8)
    # pretree: symbol 16 at 1 bit -> every length delta decodes to 1;
    # 256 length-1 literals is a massively oversubscribed code space
    for sym in range(20):
        bw.write(1 if sym == 16 else 0, 4)
    for _ in range(256):
        bw.write(0, 1)
    with _pytest.raises(ValueError):
        LzxDecoder(16).decompress(bw.bytes(), 8)
    # 3. cab-in-cab extracts leaf members (same 2-container allowance as
    # zips); a third container level hits the cutoff cleanly
    inner = build_cab_bytes({"leaf.txt": b"leaf text"}, compression="none")
    outer = build_cab_bytes({"inner.cab": inner}, compression="none")
    mime, text = extract_text(outer)
    assert mime == "application/vnd.ms-cab-compressed"
    assert "leaf text" in text
    deep = outer
    for _ in range(4):
        deep = build_cab_bytes({"d.cab": deep}, compression="none")
    mime, text = extract_text(deep)  # must terminate promptly, no error
    assert mime == "application/vnd.ms-cab-compressed"
    assert "leaf text" not in text  # beyond the nesting cutoff
    # 4. one corrupt .iwa member doesn't lose the bundle
    good = snappy_compress_literal(bytes([(3 << 3) | 2, 7]) + b"kept ok")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("Index/Broken.iwa", b"\x00\xff\xff\xff")  # huge chunk len
        z.writestr(
            "Index/Document.iwa",
            b"\x00" + len(good).to_bytes(3, "little") + good,
        )
    mime, text = extract_text(buf.getvalue())
    assert mime == IWORK_PAGES and text == "kept ok"
    # 5. corrupt gzipped index keeps the iWork mime; corrupt apxl -> keynote
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("index.xml.gz", b"\x1f\x8b\x08truncated")
    assert extract_text(buf.getvalue()) == (IWORK_PAGES, "")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("index.apxl", b"<not-xml")
    assert extract_text(buf.getvalue()) == (IWORK_KEYNOTE, "")
    assert time.monotonic() - t0 < 20.0


def test_chm_system_metadata_and_tar_false_positive():
    """CHM /#SYSTEM record stream surfaces title/topic/generator (the
    fields Tika's ChmParser exposes); a text file that happens to carry
    'ustar' at offset 257 keeps its text instead of parsing as tar."""
    from nutch_spark.operators.parse_tail import parse_chm_system

    system = struct.pack("<I", 3)
    for code, val in ((3, b"My Help Title"), (2, b"index.html"), (9, b"HHA 4.74")):
        system += struct.pack("<HH", code, len(val) + 1) + val + b"\x00"
    chm = build_chm_bytes({"/#SYSTEM": system, "/a.txt": b"body"})
    info = parse_chm_system(chm)
    assert info["title"] == "My Help Title"
    assert info["default_topic"] == "index.html"
    assert info["generator"] == "HHA 4.74" and info["version"] == 3
    assert parse_chm_system(b"ITSF" + b"\x00" * 64) == {}
    txt = (b"x" * 257 + b"ustar plain text after the magic").ljust(600, b"y")
    mime, text = extract_text(txt)
    assert mime == "text/plain" and "ustar" in text


# ---------------------------------------------------------------------------
# Email: RFC 822 / mbox (Tika RFC822Parser / MboxParser slot)
# ---------------------------------------------------------------------------


def _mk_eml(subject="café report", body="hello café plain", html="hello <b>html</b>"):
    import base64

    return (
        b"Return-Path: <a@example.com>\r\n"
        b"From: Alice <a@example.com>\r\n"
        b"To: b@example.com\r\n"
        b"Subject: =?utf-8?q?" + subject.replace(" ", "_").encode() + b"?=\r\n"
        b"MIME-Version: 1.0\r\n"
        b"Content-Type: multipart/alternative; boundary=BB\r\n\r\n"
        b"--BB\r\nContent-Type: text/plain; charset=utf-8\r\n"
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        + base64.b64encode(body.encode()) + b"\r\n"
        b"--BB\r\nContent-Type: text/html\r\n\r\n<html><body>"
        + html.encode() + b"</body></html>\r\n--BB--\r\n"
    )


def test_eml_rfc2047_subject_base64_body_alternative_preference():
    from nutch_spark.operators.parse_tail import extract_eml_text

    mime, text = extract_eml_text(_mk_eml())
    assert mime == "message/rfc822"
    lines = text.split("\n")
    assert lines[0] == "café report"        # RFC 2047 decoded
    assert "hello café plain" in text        # base64 part decoded
    assert "html" not in text                     # alternative: plain wins


def test_eml_html_only_and_quoted_printable():
    from nutch_spark.operators.parse_tail import extract_eml_text

    eml = (
        b"From: x@example.com\r\nTo: y@example.com\r\n"
        b"Subject: qp\r\nMIME-Version: 1.0\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
        b"<html><body>caf=C3=A9 <i>markup</i> stripped</body></html>\r\n"
    )
    mime, text = extract_eml_text(eml)
    assert mime == "message/rfc822"
    assert "café markup stripped" in text    # qp decoded, tags stripped


def test_eml_attachment_contributes_filename_only():
    from nutch_spark.operators.parse_tail import extract_eml_text

    eml = (
        b"From: x@example.com\r\nSubject: att\r\nMIME-Version: 1.0\r\n"
        b"Content-Type: multipart/mixed; boundary=MM\r\n\r\n"
        b"--MM\r\nContent-Type: text/plain\r\n\r\nbody here\r\n"
        b"--MM\r\nContent-Type: application/octet-stream\r\n"
        b'Content-Disposition: attachment; filename="report.bin"\r\n'
        b"Content-Transfer-Encoding: base64\r\n\r\nAAAA\r\n--MM--\r\n"
    )
    _, text = extract_eml_text(eml)
    assert "body here" in text
    assert "report.bin" in text and "AAAA" not in text


def test_mbox_splits_messages_and_dispatch_routes():
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import extract_mbox_text

    one = _mk_eml().replace(b"\r\n", b"\n")
    two = b"From: Bob <b@x.com>\nSubject: second\n\nbody two\n"
    mbox = (
        b"From a@example.com Thu Jan  1 00:00:00 2026\n" + one +
        b"\nFrom b@x.com Thu Jan  1 00:00:01 2026\n" + two
    )
    mime, text = extract_mbox_text(mbox)
    assert mime == "application/mbox"
    assert "hello café plain" in text and "body two" in text

    # the binary dispatcher routes both shapes
    assert extract_text(mbox)[0] == "application/mbox"
    assert extract_text(_mk_eml())[0] == "message/rfc822"
    # and header-less plain text does NOT misroute as mail
    assert extract_text(b"just some plain text\nwith lines\n")[0] == "text/plain"


def test_eml_hostile_bytes_never_raise():
    from nutch_spark.operators.parse_tail import extract_eml_text, extract_mbox_text

    for blob in (b"", b"From: \xff\xfe\x00", b"From \n\x00" * 50,
                 b"Subject: x\r\nContent-Type: multipart/mixed\r\n\r\n--"):
        m1, _ = extract_eml_text(blob)
        m2, _ = extract_mbox_text(blob)
        assert m1 == "message/rfc822" and m2 == "application/mbox"


def test_vcal_ical_extraction():
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import extract_vcal_text

    ics = (
        b"BEGIN:VCALENDAR\r\nVERSION:2.0\r\nPRODID:-//t//x//EN\r\n"
        b"BEGIN:VEVENT\r\nSUMMARY:Team sync\\, weekly\r\n"
        b"DESCRIPTION:Line one\\nfolded continua\r\n tion here\r\n"
        b"LOCATION:Room 12\r\n"
        b"ATTENDEE;CN=Alice Example;ROLE=CHAIR:mailto:a@x.com\r\n"
        b'ORGANIZER;CN="Bob B.":mailto:b@x.com\r\n'
        b"DTSTART:20260815T120000Z\r\nEND:VEVENT\r\nEND:VCALENDAR\r\n"
    )
    mime, text = extract_vcal_text(ics)
    assert mime == "text/calendar"
    assert "Team sync, weekly" in text          # escaped comma decoded
    assert "folded continuation here" in text    # line unfolding
    assert "Alice Example" in text and "Bob B." in text  # CN params
    assert "mailto:" not in text                  # raw cal-address excluded
    assert extract_text(ics)[0] == "text/calendar"  # dispatch routes


def test_vcard_21_quoted_printable_and_base64_photo():
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import extract_vcal_text

    vcf = (
        b"BEGIN:VCARD\r\nVERSION:2.1\r\n"
        b"FN;ENCODING=QUOTED-PRINTABLE;CHARSET=UTF-8:Caf=C3=A9 Person\r\n"
        b"N:Person;Caf\xc3\xa9;;;\r\nORG:ACME;R&D\r\nEMAIL:c@x.com\r\n"
        b"PHOTO;ENCODING=BASE64;TYPE=JPEG:AAAAAAAA\r\nEND:VCARD\r\n"
    )
    mime, text = extract_vcal_text(vcf)
    assert mime == "text/vcard"
    assert "Café Person" in text                 # vCard 2.1 qp decoded
    assert "ACME R&D" in text and "c@x.com" in text
    assert "AAAAAAAA" not in text                 # binary photo excluded
    assert extract_text(vcf)[0] == "text/vcard"
    # hostile bytes never raise
    extract_vcal_text(b"BEGIN:VCARD\r\n\xff\xfe\x00:::\r\n")


# ---------------------------------------------------------------------------
# 7z archives
# ---------------------------------------------------------------------------


def test_7z_round_trip_copy_and_lzma2():
    from nutch_spark.operators.parse_binary import extract_text
    from nutch_spark.operators.parse_tail import build_7z_bytes, parse_7z

    files = {
        "a.txt": b"hello seven zip",
        "docs/page.html": b"<html><title>inner</title>seven zip body</html>",
        "big.txt": b"abcdefgh" * 2000,
    }
    for comp in ("copy", "lzma2"):
        blob = build_7z_bytes(files, compression=comp)
        assert dict(parse_7z(blob)) == files, comp
        mime, text = extract_text(blob)
        assert mime == "application/x-7z-compressed"
        assert "hello seven zip" in text and "seven zip body" in text


def test_7z_encoded_header():
    """kEncodedHeader (0x17): real 7z tools LZMA-compress the header; the
    reader must unpack it through the folder machinery, then re-parse."""
    import lzma
    import struct
    import zlib

    from nutch_spark.operators.parse_tail import build_7z_bytes, parse_7z

    files = {"x.txt": b"payload under an encoded header"}
    plain = build_7z_bytes(files, compression="lzma2")
    nh_off, nh_size = struct.unpack("<QQ", plain[12:28])
    pack_area = plain[32 : 32 + nh_off]
    hdr = plain[32 + nh_off : 32 + nh_off + nh_size]
    chdr = lzma.compress(
        hdr, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )

    def num(v):
        assert v < 0x80
        return bytes([v])

    enc = bytearray()
    enc += b"\x17"  # kEncodedHeader = StreamsInfo of the header folder
    enc += b"\x06" + num(len(pack_area)) + num(1)  # PackInfo at header pos
    enc += b"\x09" + num(len(chdr)) + b"\x00"
    enc += b"\x07\x0b" + num(1) + b"\x00"
    enc += num(1) + bytes([0x21 | 0x20, 0x21]) + num(1) + b"\x18"
    enc += b"\x0c" + num(len(hdr)) + b"\x00\x00"
    blob = (
        plain[:32] + pack_area + bytes(chdr) + bytes(enc)
    )
    start = struct.pack("<QQI", len(pack_area) + len(chdr), len(enc),
                        zlib.crc32(bytes(enc)))
    blob = (plain[:8] + struct.pack("<I", zlib.crc32(start)) + start
            + pack_area + bytes(chdr) + bytes(enc))
    assert dict(parse_7z(blob)) == files


def test_7z_guards_and_hostile_bytes():
    import struct

    from nutch_spark.operators.parse_tail import (
        _7Z_MAGIC,
        build_7z_bytes,
        extract_7z_text,
        parse_7z,
    )

    # forged unpack size over the bomb cap -> member None, no allocation
    blob = bytearray(build_7z_bytes({"a.txt": b"x" * 64}, compression="lzma2"))
    nh_off, nh_size = struct.unpack("<QQ", bytes(blob[12:28]))
    hdr = bytearray(blob[32 + nh_off : 32 + nh_off + nh_size])
    i = hdr.find(b"\x0c") + 1  # kCodersUnpackSize value
    hdr[i : i + 1] = bytes([0xC0, 0, 0, 0, 0, 0, 0x40])  # huge number
    # (re-assembled blob has a lying header; parse must degrade, not die)
    forged = bytes(blob[: 32 + nh_off]) + bytes(hdr) + b"\x00" * 8
    try:
        members = parse_7z(forged[: 32 + nh_off + len(hdr)])
        assert all(v in (None, b"") or len(v) <= 64 for _n, v in members)
    except ValueError:
        pass  # rejecting outright is fine too
    # hostile/truncated bytes never raise out of the extractor
    import random

    rng = random.Random(9)
    base = build_7z_bytes({"a.txt": b"hello"}, compression="copy")
    for _ in range(200):
        b = bytearray(base)
        for _k in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(6, len(b))
        mime, _txt = extract_7z_text(bytes(b[:cut]) if cut < len(b) else bytes(b))
        assert mime == "application/x-7z-compressed"


def test_psd_header_and_captions():
    from nutch_spark.operators.parse_tail import (
        build_psd_bytes,
        extract_psd_text,
        parse_psd,
    )

    blob = build_psd_bytes(
        "IPTC caption here", width=640, height=480, mode=3, channels=4,
        depth=16, dpi=300, with_xmp=True,
    )
    info = parse_psd(blob)
    assert info["version"] == 1 and info["color_mode"] == "rgb"
    assert (info["width"], info["height"]) == (640, 480)
    assert (info["channels"], info["depth"]) == (4, 16)
    assert info["dpi"] == 300 and info["has_xmp"]
    assert info["caption"] == "IPTC caption here"
    assert info["n_resources"] == 3  # IPTC + resolution + XMP
    assert extract_psd_text(blob) == (
        "image/vnd.adobe.photoshop", "IPTC caption here"
    )
    # the 0x03F0 Pascal caption outranks IPTC 2:120 when both are present
    both = build_psd_bytes("iptc text", pascal_caption="pascal wins")
    assert parse_psd(both)["caption"] == "pascal wins"
    # grayscale / CMYK mode names
    assert parse_psd(build_psd_bytes("x", mode=1, channels=1))["color_mode"] == "grayscale"
    assert parse_psd(build_psd_bytes("x", mode=4, channels=4))["color_mode"] == "cmyk"


def test_psd_hostile_bytes_never_raise():
    import random

    from nutch_spark.operators.parse_tail import build_psd_bytes, parse_psd
    from nutch_spark.operators.parse_binary import extract_text

    # spec sanity bounds: zero dims / bad channel counts / wrong reserved
    assert parse_psd(build_psd_bytes("x", width=0)) is None
    assert parse_psd(build_psd_bytes("x", channels=0)) is None
    assert parse_psd(build_psd_bytes("x", channels=57)) is None
    assert parse_psd(b"8BPS" + b"\x00" * 10) is None
    assert parse_psd(b"not a psd at all") is None
    # lying section lengths / truncation / bit flips: degrade, never die
    rng = random.Random(15)
    base = build_psd_bytes("caption body text", dpi=72, with_xmp=True)
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(4, len(b) + 1)
        info = parse_psd(bytes(b[:cut]))
        assert info is None or info["width"] >= 1
        mime, text = extract_text(bytes(b[:cut]))
        assert isinstance(mime, str) and isinstance(text, str)


def test_midi_header_tempo_map_and_text():
    from nutch_spark.operators.parse_tail import build_midi_bytes, parse_midi

    b = build_midi_bytes(
        "hello midi world", track_name="Track A", notes=4, division=480
    )
    info = parse_midi(b)
    assert info["format"] == 0 and info["n_tracks"] == 1
    assert info["division"] == 480 and info["n_notes"] == 4
    assert info["duration_ms"] == 2000  # 4 quarters @ default 500ms
    assert info["text"] == "Track A\nhello\nmidi\nworld"
    # tempo map honored: 8 quarters at 1s each
    assert parse_midi(build_midi_bytes("", notes=8, tempo_us=1_000_000))[
        "duration_ms"
    ] == 8000
    # long single word chunks at 127 bytes per lyric event, lossless
    word = "x" * 300
    assert parse_midi(build_midi_bytes(word))["text"] == (
        word[:127] + "\n" + word[127:254] + "\n" + word[254:]
    )


def test_midi_hostile_bytes_never_raise():
    import random

    from nutch_spark.operators.parse_tail import (
        build_midi_bytes,
        extract_midi_text,
        parse_midi,
    )

    assert parse_midi(b"MThd\x00\x00") is None
    assert parse_midi(b"not midi") is None
    assert extract_midi_text(b"MThd\x00\x00") == (
        "application/octet-stream", "",
    )
    rng = random.Random(21)
    base = build_midi_bytes("guard text here", track_name="T", notes=3)
    for _ in range(300):
        b = bytearray(base)
        for _k in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        cut = rng.randrange(4, len(b) + 1)
        info = parse_midi(bytes(b[:cut]))
        assert info is None or isinstance(info["text"], str)


def test_font_meta_all_flavors_and_hostile():
    """r16 font tail (Tika TrueTypeParser slot): naming metadata
    round-trips through every container flavor; coincidental prefixes
    and bit-flipped/truncated payloads degrade, never raise."""
    import random

    from nutch_spark.operators.parse_tail import (
        build_font_bytes,
        extract_font_meta,
    )

    want = {
        "ttf": ("font/ttf", "Guard Sans; Bold; Guard Sans Bold"),
        "otf": ("font/otf", "Guard Sans; Bold; Guard Sans Bold"),
        "ttc": ("font/collection", "Guard Sans; Bold; Guard Sans Bold"),
        "woff": ("font/woff", "Guard Sans; Bold; Guard Sans Bold"),
        "eot": (
            "application/vnd.ms-fontobject",
            "Guard Sans; Bold; Version 1.0; Guard Sans Bold",
        ),
    }
    for flavor, expected in want.items():
        got = extract_font_meta(build_font_bytes("Guard Sans", "Bold", flavor=flavor))
        assert got == expected, (flavor, got)
    # non-ASCII family names survive the UTF-16 paths
    got = extract_font_meta(build_font_bytes("Füñt Família", "Regular"))
    assert got[1].startswith("Füñt Família; Regular")
    # WOFF2 types honestly with no text (no stdlib Brotli)
    assert extract_font_meta(b"wOF2" + b"\x00" * 44) == ("font/woff2", "")
    # coincidental prefixes are rejected (fall through in the dispatcher)
    assert extract_font_meta(b"true story, this is text") is None
    assert extract_font_meta(b"\x00\x01\x00\x00" + b"\xfe\xff" * 24) is None
    rng = random.Random(36)
    for flavor in want:
        base = build_font_bytes("Fuzz", "Regular", flavor=flavor)
        for _ in range(200):
            h = bytearray(base)
            for _k in range(rng.randrange(1, 5)):
                h[rng.randrange(len(h))] = rng.randrange(256)
            out = extract_font_meta(bytes(h[: rng.randrange(1, len(h) + 1)]))
            assert out is None or isinstance(out, tuple)
