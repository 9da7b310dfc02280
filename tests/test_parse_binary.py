"""PDF/OOXML text extraction (P2 binary formats, round-4 item 4).

Fixtures are built in-test: a real Flate-compressed PDF (content stream
with Tj/TJ/escape/octal cases), real OOXML zips (docx runs-in-paragraphs,
xlsx shared+inline strings, pptx slides). Reference surface:
parse-tika TikaParser.java — mime-routed text extraction into ParseText.
"""

from __future__ import annotations


import zipfile
import zlib
from io import BytesIO

from nutch_spark.operators.parse_binary import (
    extract_docx_text,
    extract_pdf_text,
    extract_pptx_text,
    extract_text,
    extract_xlsx_text,
    parse_binary,
)

# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------


def _pdf(content_stream: bytes, *, compress: bool = True, encrypted: bool = False) -> bytes:
    body = zlib.compress(content_stream) if compress else content_stream
    filt = b"/Filter /FlateDecode " if compress else b""
    enc = b"/Encrypt 9 0 R " if encrypted else b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt +
        b"/Length " + str(len(body)).encode() + b" >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R " + enc + b">>\n%%EOF\n"
    )


def _docx(paragraphs: list[list[str]]) -> bytes:
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    paras = "".join(
        "<w:p>" + "".join(f"<w:r><w:t>{r}</w:t></w:r>" for r in runs) + "</w:p>"
        for runs in paragraphs
    )
    doc = f'<?xml version="1.0"?><w:document xmlns:w="{w}"><w:body>{paras}</w:body></w:document>'
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def _xlsx(shared: list[str], inline: list[str]) -> bytes:
    s = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sst = (
        f'<?xml version="1.0"?><sst xmlns="{s}">'
        + "".join(f"<si><t>{t}</t></si>" for t in shared)
        + "</sst>"
    )
    cells = "".join(f'<c t="s"><v>{i}</v></c>' for i in range(len(shared)))
    cells += "".join(f'<c t="inlineStr"><is><t>{t}</t></is></c>' for t in inline)
    sheet = (
        f'<?xml version="1.0"?><worksheet xmlns="{s}"><sheetData><row>'
        + cells
        + "</row></sheetData></worksheet>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def _pptx(slides: list[list[str]]) -> bytes:
    a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i, texts in enumerate(slides, 1):
            xml = (
                f'<?xml version="1.0"?><p:sld xmlns:a="{a}" '
                'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">'
                + "".join(f"<a:t>{t}</a:t>" for t in texts)
                + "</p:sld>"
            )
            z.writestr(f"ppt/slides/slide{i}.xml", xml)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------


def test_pdf_tj_and_tj_array():
    stream = (
        b"BT /F1 12 Tf 72 700 Td (Hello World) Tj ET\n"
        b"BT [(frag) -250 (mented)] TJ ET\n"
    )
    text = extract_pdf_text(_pdf(stream))
    assert "Hello World" in text
    assert "fragmented" in text  # TJ array parts concatenated, kerning ignored


def test_pdf_escapes_and_octal():
    stream = rb"BT (paren \( close \) back\\slash oct\101) Tj ET"
    text = extract_pdf_text(_pdf(stream))
    assert "paren ( close )" in text
    assert "back\\slash" in text
    assert "octA" in text  # \101 -> 'A'


def test_pdf_uncompressed_stream():
    text = extract_pdf_text(_pdf(b"BT (plain stream) Tj ET", compress=False))
    assert text == "plain stream"


def test_pdf_encrypted_returns_empty():
    assert extract_pdf_text(_pdf(b"BT (secret) Tj ET", encrypted=True)) == ""


def test_pdf_quote_operators():
    stream = b"BT (line one) Tj (line two) ' ET"
    text = extract_pdf_text(_pdf(stream))
    assert "line one" in text and "line two" in text


# ---------------------------------------------------------------------------
# OOXML
# ---------------------------------------------------------------------------


def test_docx_runs_join_within_paragraph():
    data = _docx([["Hel", "lo"], ["second paragraph"]])
    assert extract_docx_text(data) == "Hello\nsecond paragraph"


def test_xlsx_shared_and_inline():
    data = _xlsx(["alpha", "beta"], ["inline1"])
    text = extract_xlsx_text(data)
    assert text.splitlines() == ["alpha", "beta", "inline1"]


def test_pptx_slides_in_order():
    data = _pptx([["slide one"], ["slide two"]])
    assert extract_pptx_text(data).splitlines() == ["slide one", "slide two"]


# ---------------------------------------------------------------------------
# dispatch + Spark stage
# ---------------------------------------------------------------------------


def test_extract_text_dispatch():
    assert extract_text(_pdf(b"BT (x) Tj ET"))[0] == "application/pdf"
    assert extract_text(_docx([["d"]]))[0].endswith("wordprocessingml.document")
    assert extract_text(_xlsx(["s"], []))[0].endswith("spreadsheetml.sheet")
    assert extract_text(_pptx([["p"]]))[0].endswith("presentationml.presentation")
    mime, text = extract_text(b"just plain text")
    assert (mime, text) == ("text/plain", "just plain text")
    assert extract_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1rest") == (
        "application/x-ole-storage",
        "",
    )


def test_parse_binary_stage(spark):
    rows = [
        ("http://a.com/doc.pdf", bytearray(_pdf(b"BT (pdf body text) Tj ET"))),
        ("http://a.com/r.docx", bytearray(_docx([["word text"]]))),
        ("http://a.com/s.xlsx", bytearray(_xlsx(["cell text"], []))),
        ("http://a.com/junk.bin", bytearray(b"\x00\x01\x02\xff")),
        ("http://a.com/none", None),
    ]
    df = spark.createDataFrame(rows, "url string, content binary")
    out = {r["url"]: r for r in parse_binary(df).collect()}
    assert len(out) == 4  # NULL content dropped
    assert out["http://a.com/doc.pdf"]["mime"] == "application/pdf"
    assert out["http://a.com/doc.pdf"]["parse_text"] == "pdf body text"
    assert out["http://a.com/r.docx"]["parse_text"] == "word text"
    assert out["http://a.com/s.xlsx"]["parse_text"] == "cell text"
    junk = out["http://a.com/junk.bin"]
    assert junk["mime"] == "application/octet-stream" and junk["n_chars"] == 0


def test_zip_member_extraction():
    # parse-zip: entries route through the same dispatch (txt + pdf member)
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a/readme.txt", "plain member text")
        z.writestr("b/doc.pdf", _pdf(b"BT (pdf member text) Tj ET"))
        z.writestr("junk.bin", b"\x00\x01\xff")
    mime, text = extract_text(buf.getvalue())
    assert mime == "application/zip"
    # entry names prefix each member's text (ZipTextExtractor.java:105)
    assert text.splitlines() == [
        "a/readme.txt plain member text",
        "b/doc.pdf pdf member text",
    ]


def test_zip_nesting_depth_capped():
    inner = BytesIO()
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("deep.txt", "level two text")
    mid = BytesIO()
    with zipfile.ZipFile(mid, "w") as z:
        z.writestr("inner.zip", inner.getvalue())
        z.writestr("mid.txt", "level one text")
    outer = BytesIO()
    with zipfile.ZipFile(outer, "w") as z:
        z.writestr("mid.zip", mid.getvalue())
        z.writestr("top.txt", "level zero text")
    mime, text = extract_text(outer.getvalue())
    assert mime == "application/zip"
    # depth 0 (top) + depth 1 (mid) extract; depth-2 archives cut off
    assert "level zero text" in text and "level one text" in text
    assert "level two text" not in text


def test_pdf_indirect_length_reference_not_truncated():
    # review regression: '/Length 8 0 R' is an indirect object reference —
    # matching the '8' would truncate the stream to 8 bytes and lose the text
    stream = zlib.compress(b"BT (indirect length works) Tj ET")
    pdf = (
        b"%PDF-1.4\n4 0 obj << /Filter /FlateDecode /Length 8 0 R >>\nstream\n"
        + stream
        + b"\nendstream\nendobj\n"
        b"8 0 obj " + str(len(stream)).encode() + b" endobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == "indirect length works"


# ---------------------------------------------------------------------------
# encrypted PDFs: standard security handler, RC4, empty user password
# ---------------------------------------------------------------------------


def _encrypted_pdf(text: bytes, *, revision: int = 3, owner_pw: bytes = b"owner",
                   mangle_u: bool = False) -> bytes:
    """Spec-correct RC4-encrypted PDF (PDF 32000-1 §7.6.3 Algorithms 2/3/4/5)
    with an empty user password — the fixture side of what
    _pdf_encryption_key verifies."""
    import hashlib
    import struct
    import zlib

    from nutch_spark.operators.parse_binary import _PDF_PAD, _rc4, _object_key

    def pad(pw: bytes) -> bytes:
        return (pw + _PDF_PAD)[:32]

    p_val = -44
    nbytes = 5 if revision == 2 else 16
    id0 = bytes(range(16))
    # Algorithm 3: the /O entry
    okey = hashlib.md5(pad(owner_pw)).digest()
    if revision >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey[:nbytes]).digest()
    okey = okey[:nbytes]
    o_entry = _rc4(okey, pad(b""))  # user password is empty
    if revision >= 3:
        for i in range(1, 20):
            o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)
    # Algorithm 2: file key for the empty user password
    h = hashlib.md5()
    h.update(pad(b""))
    h.update(o_entry)
    h.update(struct.pack("<i", p_val))
    h.update(id0)
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    key = key[:nbytes]
    # Algorithms 4/5: the /U entry
    if revision == 2:
        u_entry = _rc4(key, _PDF_PAD)
    else:
        u_entry = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
        for i in range(1, 20):
            u_entry = _rc4(bytes(b ^ i for b in key), u_entry)
        u_entry += b"\x00" * 16  # arbitrary 16-byte padding per spec
    if mangle_u:
        u_entry = bytes(b ^ 0xFF for b in u_entry)
    # content stream: compress THEN encrypt with the per-object key (obj 4 0)
    stream = b"BT (" + text.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") + b") Tj ET"
    body = _rc4(_object_key(key, 4, 0), zlib.compress(stream))
    enc_extra = b"" if revision == 2 else b" /Length 128"
    return (
        b"%PDF-1.4\n"
        b"4 0 obj << /Filter /FlateDecode /Length " + str(len(body)).encode()
        + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"5 0 obj << /Filter /Standard /V " + str(1 if revision == 2 else 2).encode()
        + b" /R " + str(revision).encode() + enc_extra
        + b" /P " + str(p_val).encode()
        + b" /O <" + o_entry.hex().encode() + b"> /U <" + u_entry.hex().encode()
        + b"> >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<" + id0.hex().encode()
        + b"> <" + id0.hex().encode() + b">] >>\n%%EOF\n"
    )


def test_encrypted_pdf_r3_round_trip():
    data = _encrypted_pdf(b"rc4 encrypted body text", revision=3)
    mime, text = extract_text(data)
    assert mime == "application/pdf"
    assert text == "rc4 encrypted body text"


def test_encrypted_pdf_r2_round_trip():
    data = _encrypted_pdf(b"forty-bit rc4 (ET) BT guard", revision=2)
    assert extract_text(data)[1] == "forty-bit rc4 (ET) BT guard"


def test_encrypted_pdf_real_user_password_refused():
    # a mangled /U means the empty user password does not verify -> ''
    data = _encrypted_pdf(b"secret", revision=3, mangle_u=True)
    assert extract_text(data) == ("application/pdf", "")


def test_encrypted_pdf_malformed_v4_dict_refused():
    # a /V 4 dict with /R 3 and NO /CFM crypt filter is malformed — the
    # handler must bail to '' rather than guess a cipher (AESV2 proper is
    # round-tripped below in test_encrypted_pdf_aesv2_round_trip)
    data = _encrypted_pdf(b"secret", revision=3)
    data = data.replace(b"/V 2", b"/V 4")
    assert extract_text(data) == ("application/pdf", "")


def test_encrypted_pdf_decrypted_stream_ending_in_newline():
    """Regression: the decrypt path must NOT re-apply the EOL trim to the
    exact-length decrypted body — a Flate stream whose ciphertext-decrypt
    ends in 0x0A (~1/256 of streams) lost its last byte and the whole text."""
    import zlib

    from nutch_spark.operators.parse_binary import _object_key, _rc4

    # construct a payload whose COMPRESSED bytes end in 0x0A: zlib output
    # ends with the adler32 whose LAST byte is (1 + sum(bytes)) % 65521
    # % 256 — solve for a padding count of 'a's that lands it on 0x0A
    base = b"newline tail hunt"
    stream_sum = sum(b"BT (" + base + b") Tj ET")
    k = ((0x0A - 1 - stream_sum) * pow(97, -1, 256)) % 256
    text = base + b"a" * k
    assert zlib.compress(b"BT (" + text + b") Tj ET").endswith(b"\n")
    data = _encrypted_pdf(text, revision=3)
    assert extract_text(data)[1] == text.decode()


# ---------------------------------------------------------------------------
# encrypted PDFs: AES — AESV2 (/V 4 /R 4) and AESV3 (/V 5 /R 5-6)
# ---------------------------------------------------------------------------


def _pkcs7(data: bytes) -> bytes:
    pad = 16 - len(data) % 16
    return data + bytes([pad]) * pad


def _aes_stream_obj(num: int, obj_key: bytes, text: bytes) -> bytes:
    """One FlateDecode stream object, AES-CBC encrypted per §7.6.2 (random
    IV prefix replaced by a fixed one — determinism beats entropy in tests)."""
    import zlib

    from nutch_spark.functions.aes import cbc_encrypt

    stream = b"BT (" + text.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") + b") Tj ET"
    iv = bytes(range(16))
    body = iv + cbc_encrypt(obj_key, iv, _pkcs7(zlib.compress(stream)))
    return (
        str(num).encode() + b" 0 obj << /Filter /FlateDecode /Length "
        + str(len(body)).encode() + b" >>\nstream\n" + body
        + b"\nendstream\nendobj\n"
    )


def _aesv2_encrypted_pdf(text: bytes, *, encrypt_metadata: bool = True) -> bytes:
    """Spec-correct AES-128 /V 4 /R 4 /CFM /AESV2 PDF, empty user password
    (PDF 32000-1 §7.6.3 Algorithm 2 + §7.6.2 AES object keys)."""
    import hashlib
    import struct

    from nutch_spark.operators.parse_binary import _PDF_PAD, _rc4, _object_key

    def pad(pw: bytes) -> bytes:
        return (pw + _PDF_PAD)[:32]

    p_val = -44
    nbytes = 16
    id0 = bytes(range(16))
    okey = hashlib.md5(pad(b"owner")).digest()
    for _ in range(50):
        okey = hashlib.md5(okey[:nbytes]).digest()
    okey = okey[:nbytes]
    o_entry = _rc4(okey, pad(b""))
    for i in range(1, 20):
        o_entry = _rc4(bytes(b ^ i for b in okey), o_entry)
    h = hashlib.md5()
    h.update(pad(b""))
    h.update(o_entry)
    h.update(struct.pack("<i", p_val))
    h.update(id0)
    if not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:nbytes]).digest()
    key = key[:nbytes]
    u_entry = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
    for i in range(1, 20):
        u_entry = _rc4(bytes(b ^ i for b in key), u_entry)
    u_entry += b"\x00" * 16
    meta = b" /EncryptMetadata false" if not encrypt_metadata else b""
    return (
        b"%PDF-1.6\n"
        + _aes_stream_obj(4, _object_key(key, 4, 0, "aesv2"), text)
        + b"5 0 obj << /Filter /Standard /V 4 /R 4 /Length 128"
        + meta
        + b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        + b" /P " + str(p_val).encode()
        + b" /O <" + o_entry.hex().encode() + b"> /U <" + u_entry.hex().encode()
        + b"> >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<" + id0.hex().encode()
        + b"> <" + id0.hex().encode() + b">] >>\n%%EOF\n"
    )


def _aesv3_encrypted_pdf(text: bytes, *, revision: int = 6, ue_first: bool = False) -> bytes:
    """AES-256 /V 5 PDF with an empty user password — /R 5 (deprecated
    Adobe extension, plain SHA-256) or /R 6 (ISO 32000-2 Algorithm 2.B).
    ``ue_first`` serializes /UE and /OE BEFORE /U and /O — PDF dicts are
    unordered, and key-prefix matching (/U hitting /UE) is a real parser
    bug this fixture pins down."""
    import hashlib

    from nutch_spark.functions.aes import cbc_encrypt
    from nutch_spark.operators.parse_binary import _hash_2b

    file_key = bytes(range(100, 132))  # 32-byte content key
    vsalt, ksalt = bytes(range(8)), bytes(range(8, 16))
    if revision == 5:
        u_hash = hashlib.sha256(b"" + vsalt).digest()
        ikey = hashlib.sha256(b"" + ksalt).digest()
    else:
        u_hash = _hash_2b(b"", vsalt)
        ikey = _hash_2b(b"", ksalt)
    u_entry = u_hash + vsalt + ksalt
    ue_entry = cbc_encrypt(ikey, b"\x00" * 16, file_key)
    # /O and /OE are only checked for the owner-password path — any
    # well-formed 48/32-byte strings satisfy the user-password fixture
    o_entry, oe_entry = bytes(48), bytes(32)
    if ue_first:
        entries = (
            b" /UE <" + ue_entry.hex().encode() + b"> /OE <" + oe_entry.hex().encode()
            + b"> /U <" + u_entry.hex().encode() + b"> /O <" + o_entry.hex().encode() + b">"
        )
    else:
        entries = (
            b" /O <" + o_entry.hex().encode() + b"> /U <" + u_entry.hex().encode()
            + b"> /OE <" + oe_entry.hex().encode() + b"> /UE <" + ue_entry.hex().encode() + b">"
        )
    return (
        b"%PDF-2.0\n"
        + _aes_stream_obj(4, file_key, text)  # AESV3: object key == file key
        + b"5 0 obj << /Filter /Standard /V 5 /R " + str(revision).encode()
        + b" /Length 256 /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF"
        + entries
        + b" /P -4 >>\nendobj\n"
        b"trailer << /Root 1 0 R /Encrypt 5 0 R >>\n%%EOF\n"
    )


def test_encrypted_pdf_aesv2_round_trip():
    data = _aesv2_encrypted_pdf(b"aes-128 cbc body text")
    assert extract_text(data) == ("application/pdf", "aes-128 cbc body text")


def test_encrypted_pdf_aesv2_encrypt_metadata_false():
    # /EncryptMetadata false changes the Algorithm 2 key derivation
    # (ffffffff suffix) — both sides must agree or the /U check fails
    data = _aesv2_encrypted_pdf(b"metadata stays clear", encrypt_metadata=False)
    assert extract_text(data) == ("application/pdf", "metadata stays clear")


def test_encrypted_pdf_aesv3_r5_round_trip():
    data = _aesv3_encrypted_pdf(b"aes-256 r5 body", revision=5)
    assert extract_text(data) == ("application/pdf", "aes-256 r5 body")


def test_encrypted_pdf_aesv3_r6_round_trip():
    data = _aesv3_encrypted_pdf(b"aes-256 r6 hash-2b body", revision=6)
    assert extract_text(data) == ("application/pdf", "aes-256 r6 hash-2b body")


def test_encrypted_pdf_aesv3_ue_before_u_key_order():
    # regression: /U must not prefix-match at /UE when /UE precedes it in
    # the (unordered) Encrypt dict — parse_binary._pdf_string_entry requires
    # a non-name-char delimiter after the key
    data = _aesv3_encrypted_pdf(b"dict order is a writer choice", revision=6, ue_first=True)
    assert extract_text(data) == ("application/pdf", "dict order is a writer choice")


def test_encrypted_pdf_aesv3_wrong_user_password_refused():
    data = _aesv3_encrypted_pdf(b"secret", revision=6)
    # corrupt the validation hash: empty-user-password check must fail -> ''
    import re as _re

    m = _re.search(rb"/U <([0-9a-f]{96})>", data)
    u = bytes.fromhex(m.group(1).decode())
    bad = bytes(b ^ 0xFF for b in u[:32]) + u[32:]
    data = data.replace(m.group(1), bad.hex().encode())
    assert extract_text(data) == ("application/pdf", "")


# ---------------------------------------------------------------------------
# OpenDocument (ODF 1.2): mimetype routing + text-namespace paragraph walk
# ---------------------------------------------------------------------------

_ODF_NS = (
    '<office:document-content '
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
)


def _odf(body_xml: str, mime: str = "application/vnd.oasis.opendocument.text"):
    content = (
        '<?xml version="1.0"?>' + _ODF_NS + "<office:body><office:text>"
        + body_xml + "</office:text></office:body></office:document-content>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("mimetype", mime)
        z.writestr("content.xml", content)
    return buf.getvalue()


def test_odt_headings_paragraphs_and_whitespace_elements():
    from nutch_spark.operators.parse_binary import extract_odf_text

    data = _odf(
        "<text:h>Title</text:h>"
        '<text:p>a<text:s text:c="3"/>b<text:tab/>c<text:line-break/>d</text:p>'
        "<text:p><text:span>styled </text:span>run tail</text:p>"
        "<text:p/>"  # empty paragraph contributes nothing
    )
    mime, text = extract_odf_text(data)
    assert mime == "application/vnd.oasis.opendocument.text"
    assert text == "Title\na   b\tc\nd\nstyled run tail"


def test_ods_cell_paragraphs_and_dispatch():
    # spreadsheet cells hold ordinary text:p elements — same walk applies,
    # and extract_text must route on the mimetype entry, not the extension
    data = _odf(
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>c1</text:p></table:table-cell>"
        "<table:table-cell><text:p>c2</text:p></table:table-cell>"
        "</table:table-row></table:table>",
        mime="application/vnd.oasis.opendocument.spreadsheet",
    )
    mime, text = extract_text(data)
    assert mime == "application/vnd.oasis.opendocument.spreadsheet"
    assert text == "c1\nc2"


def test_odf_xml_escapes_round_trip():
    from nutch_spark.operators.parse_binary import extract_odf_text

    data = _odf("<text:p>a &amp; b &lt; c &gt; d</text:p>")
    assert extract_odf_text(data)[1] == "a & b < c > d"


def test_odf_malformed_content_xml_is_empty_not_fatal():
    from nutch_spark.operators.parse_binary import extract_odf_text

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", "<broken")
    mime, text = extract_odf_text(buf.getvalue())
    assert mime == "application/vnd.oasis.opendocument.text"
    assert text == ""


def test_plain_zip_with_mimetype_member_not_misrouted():
    # a generic archive that happens to contain a file named "mimetype"
    # (non-ODF content) must still go through the zip member extractor
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "text/weird")
        z.writestr("readme.txt", "hello zip")
    mime, text = extract_text(buf.getvalue())
    assert mime == "application/zip"
    assert "hello zip" in text


# ---------------------------------------------------------------------------
# EPUB (OCF/OPF): container → rootfile → spine reading order
# ---------------------------------------------------------------------------


def _epub(chapters, *, broken_manifest=False):
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("mimetype", "application/epub+zip")
        if not broken_manifest:
            z.writestr(
                "META-INF/container.xml",
                '<?xml version="1.0"?>'
                '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OEBPS/content.opf" '
                'media-type="application/oebps-package+xml"/></rootfiles></container>',
            )
            items = "".join(
                f'<item id="c{i}" href="ch{i}.xhtml" media-type="application/xhtml+xml"/>'
                for i in range(len(chapters))
            )
            # spine deliberately reverses manifest order to prove spine wins
            refs = "".join(
                f'<itemref idref="c{i}"/>' for i in reversed(range(len(chapters)))
            )
            z.writestr(
                "OEBPS/content.opf",
                '<?xml version="1.0"?>'
                '<package xmlns="http://www.idpf.org/2007/opf">'
                f"<manifest>{items}</manifest><spine>{refs}</spine></package>",
            )
        for i, text in enumerate(chapters):
            z.writestr(
                f"OEBPS/ch{i}.xhtml",
                '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
                f"<title>skip</title></head><body><p>{text}</p></body></html>",
            )
    return buf.getvalue()


def test_epub_spine_reading_order():
    from nutch_spark.operators.parse_binary import extract_epub_text

    mime, text = extract_epub_text(_epub(["first chapter", "second chapter"]))
    assert mime == "application/epub+zip"
    # spine order (reversed in the fixture) wins over zip entry order,
    # and <head> content is excluded
    assert text == "second chapter\nfirst chapter"
    assert "skip" not in text


def test_epub_dispatch_and_broken_manifest_fallback():
    data = _epub(["alpha", "beta"], broken_manifest=True)
    mime, text = extract_text(data)
    assert mime == "application/epub+zip"
    assert text == "alpha\nbeta"  # name-order fallback


def test_epub_html_soup_chapter_survives():
    from nutch_spark.operators.parse_binary import extract_epub_text

    buf = BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr("ch1.html", "<html><body><p>unclosed soup<br>text</body>")
    _, text = extract_epub_text(buf.getvalue())
    assert "unclosed soup" in text and "text" in text
