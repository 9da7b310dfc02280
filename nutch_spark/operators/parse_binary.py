"""P2 binary-document text extraction: PDF and Office-Open-XML parsers.

Reference: the parse-tika plugin routes every non-HTML mime through Tika and
emits ParseText (/root/reference/src/plugin/parse-tika/src/java/org/apache/
nutch/parse/tika/TikaParser.java:63-160). Tika itself is a large external
library; this module re-implements the two families a crawl actually meets —
PDF text operators and OOXML (docx/xlsx/pptx) — with the stdlib only
(zlib for FlateDecode, zipfile + ElementTree for OOXML), and plugs into the
same mapInPandas parse slot as parse_html. Legacy OLE formats (.doc/.xls/
.ppt via a pure-stdlib [MS-CFB] reader) and RTF live in operators/ole.py and
dispatch from here; encrypted documents degrade to empty text with the mime
still detected, mirroring Tika's empty-parse on password-protected input.

Scale shape: extraction is a narrow Arrow-batched map over (url, content) —
no shuffle, payload column pruned everywhere else. The extractors are
per-document pure functions, so the stage parallelizes perfectly and a
failed document costs only its own row (never the task).
"""

from __future__ import annotations

import re
import zipfile
import zlib
from collections.abc import Iterator
from io import BytesIO
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# PDF: FlateDecode streams -> BT/ET text operators (Tj, TJ, ', ")
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_SHOW_OP_RE = re.compile(rb"\s*(?:Tj|'|\")")
_TJ_CLOSE_RE = re.compile(rb"\s*TJ")
# PDF token delimiters (32000-1 §7.2.2): whitespace + ()<>[]{}/%
_DELIM_BYTES = frozenset(b"\x00\t\n\x0c\r ()<>[]{}/%")

_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    """Literal-string unescape per PDF 32000-1 §7.3.4.2 (without octals >255)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # up to 3 octal digits
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _PDF_ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _is_token_at(body: bytes, i: int, length: int) -> bool:
    """True when body[i:i+length] is a standalone token: bounded on both
    sides by a PDF delimiter byte or the stream edge."""
    if i > 0 and body[i - 1] not in _DELIM_BYTES:
        return False
    j = i + length
    return j >= len(body) or body[j] in _DELIM_BYTES


def _bt_et_blocks(body: bytes) -> list[bytes]:
    """Content between each standalone BT..ET operator pair.

    A naive ``BT(.*?)ET`` regex ends the block at the first 'ET' byte-pair
    even inside a string literal (shown text '(ET) Tj' truncated the whole
    block — hypothesis found it). This scanner walks the content stream
    skipping ( ) literals (with backslash escapes and balanced nesting,
    §7.3.4.2), <...> hex strings, << >> dict delimiters, and % comments,
    so BT/ET only match as real operators."""
    blocks: list[bytes] = []
    i, n = 0, len(body)
    start = -1
    while i < n:
        c = body[i]
        if c == 0x28:  # '(' literal string
            depth = 1
            i += 1
            while i < n and depth:
                b = body[i]
                if b == 0x5C:  # backslash escape: skip next byte
                    i += 2
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                i += 1
            continue
        if c == 0x3C:  # '<' — '<<' dict open or hex string
            if body[i : i + 2] == b"<<":
                i += 2
                continue
            j = body.find(b">", i + 1)
            i = n if j < 0 else j + 1
            continue
        if c == 0x25:  # '%' comment to end of line
            j = body.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == 0x42 and body[i : i + 2] == b"BT" and _is_token_at(body, i, 2):
            start = i + 2
            i += 2
            continue
        if c == 0x45 and body[i : i + 2] == b"ET" and _is_token_at(body, i, 2):
            if start >= 0:
                blocks.append(body[start:i])
                start = -1
            i += 2
            continue
        i += 1
    return blocks


def _scan_literal(chunk: bytes, i: int) -> tuple[bytes, int]:
    """Raw content of the ( ) literal starting at chunk[i] (balanced
    unescaped parens allowed per §7.3.4.2) and the index after it.
    Escapes are left in place for _unescape_pdf_string."""
    n = len(chunk)
    depth = 1
    j = i + 1
    start = j
    while j < n:
        b = chunk[j]
        if b == 0x5C:
            j += 2
            continue
        if b == 0x28:
            depth += 1
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return chunk[start:j], j + 1
        j += 1
    return chunk[start:j], j


_TEXT_MOVE_OPS = (b"Td", b"TD", b"T*", b"TL", b"Tm")


def _pdf_strings(chunk: bytes) -> list[bytes]:
    """Shown text RUNS from one content-stream chunk, in order: ( ) literals
    followed by a Tj / ' / " operator, and [ ... ] TJ array elements.
    Literal strings are scanned (not regex-matched) so balanced nested
    parens and operator lookalikes inside literals are handled.

    Run semantics (the r8 real-file fix — parse-tika/sample/pdftest.pdf
    shows 'A VERY SMALL PDF FIL' and 'E' as two Tj ops with only Tc/Tw
    between them): consecutive shown strings CONCATENATE into one run
    unless a text-positioning operator (Td/TD/T*/TL/Tm, or the
    newline-implying ' / " show forms) intervenes — PDFBox's glyph-position
    heuristic reduced to the operator stream. Callers join runs with a
    space, so position moves become word/line breaks."""
    found: list[bytes] = []
    pending_break = True
    i, n = 0, len(chunk)

    def emit(s: bytes, *, breaking: bool) -> None:
        nonlocal pending_break
        if found and not (pending_break or breaking):
            found[-1] += s
        else:
            found.append(s)
        pending_break = False

    while i < n:
        c = chunk[i]
        if c == 0x28:  # '(' literal — shown only when Tj / ' / " follows
            raw, i = _scan_literal(chunk, i)
            m = _SHOW_OP_RE.match(chunk, i)
            if m:
                # ' and " move to the next line before showing
                op_breaks = m.group(0).lstrip()[:1] in (b"'", b'"')
                emit(_unescape_pdf_string(raw), breaking=op_breaks)
                i = m.end()
            continue
        if c == 0x5B:  # '[' — TJ array of strings and kerning numbers
            parts: list[bytes] = []
            j = i + 1
            closed = False
            while j < n:
                b = chunk[j]
                if b == 0x28:
                    raw, j = _scan_literal(chunk, j)
                    parts.append(_unescape_pdf_string(raw))
                    continue
                if b == 0x5D:  # ']'
                    m = _TJ_CLOSE_RE.match(chunk, j + 1)
                    if m:
                        emit(b"".join(parts), breaking=False)
                        j = m.end()
                        closed = True
                    else:
                        j += 1
                    break
                j += 1
            i = j if closed else i + 1
            continue
        if c == 0x54 and chunk[i : i + 2] in _TEXT_MOVE_OPS and _is_token_at(
            chunk, i, 2
        ):
            pending_break = True
            i += 2
            continue
        if c == 0x3C:  # '<<' dict or hex string (hex-Tj not extracted)
            if chunk[i : i + 2] == b"<<":
                i += 2
                continue
            k = chunk.find(b">", i + 1)
            i = n if k < 0 else k + 1
            continue
        if c == 0x25:  # comment
            k = chunk.find(b"\n", i)
            i = n if k < 0 else k + 1
            continue
        i += 1
    return found


def _stream_text_blocks(
    params: bytes, body: bytes, *, pre_trimmed: bool = False
) -> list[bytes]:
    """Shown-string blocks of one stream: /Length trim, FlateDecode,
    BT..ET walk. ``pre_trimmed`` skips the trim for callers that already
    cut the body to its exact length (the decrypt path — re-applying the
    EOL heuristic there would eat a real trailing 0x0A of decrypted data,
    ~1/256 of Flate streams)."""
    # /Length is authoritative when it's a DIRECT value: compressed data
    # may legitimately END in EOL bytes, so stripping heuristically can
    # eat real data (a Flate stream ending in 0x0d did exactly that).
    # An INDIRECT reference ('/Length 8 0 R' — what most PDF writers
    # emit) must NOT match: its object number would truncate the body.
    length = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", params)
    if pre_trimmed:
        pass
    elif length and int(length.group(1)) <= len(body):
        body = body[: int(length.group(1))]
    elif body.endswith(b"\r\n"):
        body = body[:-2]
    elif body.endswith(b"\n"):
        body = body[:-1]
    if b"/FlateDecode" in params:
        try:
            body = zlib.decompress(body)
        except zlib.error:
            return []
    elif b"/Filter" in params:
        return []  # DCT/LZW/ASCII85... — image or unsupported filter
    blocks = []
    for block in _bt_et_blocks(body):
        strings = _pdf_strings(block)
        if strings:
            blocks.append(b" ".join(strings))
    return blocks


# ---------------------------------------------------------------------------
# Standard security handler (PDF 32000-1 §7.6.3 + ISO 32000-2 §7.6.4):
# RC4 /V 1-2, AES-128 /V 4 (/CFM /AESV2) and AES-256 /V 5 /R 5-6 with the
# EMPTY user password — the owner-locked PDFs a crawler meets. Real user
# passwords stay out of scope (a password hook would go here, like
# TikaParser's PasswordProvider).
# ---------------------------------------------------------------------------

# §7.6.3.3 Algorithm 2 padding string
_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.DOTALL)


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out.append(c ^ s[(s[i] + s[j]) & 0xFF])
    return bytes(out)


def _pdf_string_entry(d: bytes, name: bytes) -> bytes | None:
    """Value of a /Name ( literal ) or /Name <hex> dictionary entry.

    The key match requires a non-name-character delimiter: ``/U`` must not
    match at ``/UE`` (PDF dicts are unordered, so ``/UE`` may precede ``/U``
    in AES-256 /V 5 Encrypt dicts). Scans every occurrence until one is
    followed by a string value — ``/Name`` tokens also appear as VALUES of
    other keys (e.g. ``/Filter /Standard``), which must not shadow the key.
    """
    for m in re.finditer(re.escape(name) + rb"(?![A-Za-z0-9#])\s*", d):
        i = m.end()
        if i < len(d) and d[i] == 0x28:  # '(' literal
            raw, _ = _scan_literal(d, i)
            return _unescape_pdf_string(raw)
        if i < len(d) and d[i] == 0x3C and not d.startswith(b"<<", i):  # '<hex>'
            j = d.find(b">", i + 1)
            if j < 0:
                return None
            hx = re.sub(rb"\s", b"", d[i + 1 : j])
            try:
                return bytes.fromhex(hx.decode("ascii"))
            except ValueError:
                return None
    return None


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (the /R 6 password hash): iterated
    SHA-256/384/512 keyed by an AES-128-CBC pass over 64 repetitions."""
    import hashlib

    from nutch_spark.functions.aes import cbc_encrypt

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def _pdf_encryption_key(data: bytes) -> tuple[bytes, str] | None:
    """(file key, cipher) for the empty user password, or None when the
    handler is unsupported / the password is actually required. Cipher is
    'rc4' (V 1-2 R 2-3, or V 4 with /CFM /V2), 'aesv2' (V 4 /CFM /AESV2) or
    'aesv3' (V 5 R 5-6, AES-256).

    Implements §7.6.3.3 Algorithm 2 (key derivation) + Algorithms 4/5 (user
    password verification), and ISO 32000-2 §7.6.4.3.3/.4 (Algorithms 2.A/
    2.B) for V 5; AES blocks come from functions/aes.py (FIPS-197)."""
    import hashlib
    import struct

    m = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data)
    if m:
        om = re.search(
            rb"(?<!\d)" + m.group(1) + rb"\s+" + m.group(2) + rb"\s+obj\b(.*?)endobj",
            data,
            re.DOTALL,
        )
        enc = om.group(1) if om else b""
    else:
        m = re.search(rb"/Encrypt\s*<<(.*?)>>", data, re.DOTALL)
        enc = m.group(1) if m else b""
    if not enc or b"/Standard" not in enc:
        return None
    v_m = re.search(rb"/V\s+(\d+)", enc)
    r_m = re.search(rb"/R\s+(\d+)", enc)
    p_m = re.search(rb"/P\s+(-?\d+)", enc)
    v = int(v_m.group(1)) if v_m else 0
    r = int(r_m.group(1)) if r_m else 0
    o_entry = _pdf_string_entry(enc, b"/O")
    u_entry = _pdf_string_entry(enc, b"/U")
    if not o_entry or not u_entry:
        return None

    if v == 5 and r in (5, 6):
        # AES-256: /U = hash(32) + validation salt(8) + key salt(8); the
        # file key is AES-256-CBC(no pad, zero IV) decrypted from /UE.
        from nutch_spark.functions.aes import cbc_decrypt

        ue_entry = _pdf_string_entry(enc, b"/UE")
        if len(u_entry) < 48 or not ue_entry or len(ue_entry) < 32:
            return None
        vsalt, ksalt = u_entry[32:40], u_entry[40:48]
        if r == 5:
            if hashlib.sha256(b"" + vsalt).digest() != u_entry[:32]:
                return None
            ikey = hashlib.sha256(b"" + ksalt).digest()
        else:
            if _hash_2b(b"", vsalt) != u_entry[:32]:
                return None
            ikey = _hash_2b(b"", ksalt)
        return cbc_decrypt(ikey, b"\x00" * 16, ue_entry[:32]), "aesv3"

    if v == 4 and r == 4:
        cfm = re.search(rb"/CFM\s*/(\w+)", enc)
        if not cfm or cfm.group(1) not in (b"AESV2", b"V2"):
            return None  # /CFM /None or an exotic crypt filter
        cipher = "aesv2" if cfm.group(1) == b"AESV2" else "rc4"
        length_m = re.search(rb"/Length\s+(\d+)", enc)
        nbytes = (int(length_m.group(1)) // 8) if length_m else 16
        nbytes = nbytes if nbytes in range(5, 17) else 16
    elif v in (1, 2) and r in (2, 3):
        cipher = "rc4"
        length_m = re.search(rb"/Length\s+(\d+)", enc)
        nbytes = (int(length_m.group(1)) // 8) if (length_m and v == 2) else 5
    else:
        return None  # exotic version/revision combination
    if not p_m:
        return None
    id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    id0 = (
        bytes.fromhex(re.sub(rb"\s", b"", id_m.group(1)).decode("ascii"))
        if id_m
        else b""
    )
    # Algorithm 2 with the empty user password. /P is a SIGNED 32-bit value
    # but several producers serialize it unsigned (4294967252 for -44) —
    # mask to 32 bits like every tolerant parser does.
    h = hashlib.md5()
    h.update(_PDF_PAD)  # pad(empty password)
    h.update(o_entry[:32])
    h.update(struct.pack("<I", int(p_m.group(1)) & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and re.search(rb"/EncryptMetadata\s+false", enc):
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    key = key[:nbytes]
    # verify the user password actually is empty (Algorithms 4/5)
    if r == 2:
        ok = _rc4(key, _PDF_PAD) == u_entry[:32]
    else:
        x = _rc4(key, hashlib.md5(_PDF_PAD + id0).digest())
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == u_entry[:16]
    return (key, cipher) if ok else None


def _object_key(file_key: bytes, num: int, gen: int, cipher: str = "rc4") -> bytes:
    """§7.6.2 Algorithm 1: per-object key. AESV2 appends the 'sAlT' marker
    bytes to the md5 input; AESV3 uses the file key for every object."""
    import hashlib
    import struct

    if cipher == "aesv3":
        return file_key
    suffix = b"sAlT" if cipher == "aesv2" else b""
    h = hashlib.md5(
        file_key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2] + suffix
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _decrypt_pdf_bytes(cipher: str, obj_key: bytes, raw: bytes) -> bytes:
    """Decrypt one encrypted string/stream body: RC4 directly; AES-CBC with
    the 16-byte IV prefix and PKCS#7 padding per §7.6.2."""
    if cipher == "rc4":
        return _rc4(obj_key, raw)
    from nutch_spark.functions.aes import cbc_decrypt

    if len(raw) < 32:
        return b""
    pt = cbc_decrypt(obj_key, raw[:16], raw[16:])
    pad = pt[-1] if pt else 0
    if 1 <= pad <= 16 and pt.endswith(bytes([pad]) * pad):
        pt = pt[:-pad]
    return pt


def extract_pdf_text(data: bytes) -> str:
    """Text of a PDF: every BT..ET text block's shown strings, FlateDecode-
    decompressed where needed, newline-joined in stream order.

    Encrypted files (an /Encrypt trailer entry) are decrypted when the
    standard security handler with an EMPTY user password applies — RC4
    /V 1-2 /R 2-3 (the ubiquitous owner-locked case), AES-128 /V 4 /CFM
    /AESV2, and AES-256 /V 5 /R 5-6 /CFM /AESV3; a real user password
    yields '' (a password hook would slot in like TikaParser's
    PasswordProvider)."""
    blocks: list[bytes] = []
    if b"/Encrypt" in data:
        kc = _pdf_encryption_key(data)
        if kc is None:
            return ""
        key, cipher = kc
        for om in _OBJ_RE.finditer(data):
            num, gen, body = int(om.group(1)), int(om.group(2)), om.group(3)
            sm = _STREAM_RE.search(body)
            if not sm:
                continue
            obj_key = _object_key(key, num, gen, cipher)
            params, raw = sm.group(1), sm.group(2)
            length = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", params)
            if length and int(length.group(1)) <= len(raw):
                raw = raw[: int(length.group(1))]
            elif raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
            blocks += _stream_text_blocks(
                params, _decrypt_pdf_bytes(cipher, obj_key, raw), pre_trimmed=True
            )
    else:
        for m in _STREAM_RE.finditer(data):
            blocks += _stream_text_blocks(m.group(1), m.group(2))
    out = b"\n".join(blocks)
    return out.decode("latin-1", errors="replace").strip()


# ---------------------------------------------------------------------------
# OOXML: docx / xlsx / pptx via zipfile + ElementTree
# ---------------------------------------------------------------------------


def _xml_texts(xml_bytes: bytes, localname: str) -> list[str]:
    """All text of elements with the given localname, any namespace."""
    try:
        root = ElementTree.fromstring(xml_bytes)
    except ElementTree.ParseError:
        return []
    return [
        el.text
        for el in root.iter()
        if el.tag.rpartition("}")[2] == localname and el.text
    ]


def extract_docx_text(data: bytes) -> str:
    """word/document.xml <w:t> runs, paragraph-joined (ECMA-376 WordprocessingML)."""
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError):
        return ""
    # join runs inside a paragraph with '', paragraphs with '\n'
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return ""
    paras = []
    for p in root.iter():
        if p.tag.rpartition("}")[2] != "p":
            continue
        runs = [
            el.text
            for el in p.iter()
            if el.tag.rpartition("}")[2] == "t" and el.text
        ]
        if runs:
            paras.append("".join(runs))
    return "\n".join(paras).strip()


def extract_xlsx_text(data: bytes) -> str:
    """Cell values of every sheet in cell order (SpreadsheetML): shared-
    string cells (``t="s"``) resolve their index into sharedStrings.xml,
    inline strings (``t="inlineStr"``) concatenate their runs, and direct
    values (``t="str"`` formula results, numbers) emit their ``<v>`` text —
    the same cell walk Tika's XSSF extractor performs (the r8 real-file
    check: parse-tika/sample/test.xlsx stores everything as ``t="str"``
    cells, which a sharedStrings-only read misses entirely)."""
    parts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            names = set(z.namelist())
            shared: list[str] = []
            if "xl/sharedStrings.xml" in names:
                try:
                    sst = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
                    shared = [
                        "".join(
                            t.text
                            for t in si.iter()
                            if t.tag.rpartition("}")[2] == "t" and t.text
                        )
                        for si in sst
                    ]
                except ElementTree.ParseError:
                    pass
            for n in sorted(names):
                if not (n.startswith("xl/worksheets/") and n.endswith(".xml")):
                    continue
                try:
                    sheet = ElementTree.fromstring(z.read(n))
                except ElementTree.ParseError:
                    continue
                for c in sheet.iter():
                    if c.tag.rpartition("}")[2] != "c":
                        continue
                    ctype = c.get("t", "")
                    if ctype == "inlineStr":
                        runs = "".join(
                            t.text
                            for t in c.iter()
                            if t.tag.rpartition("}")[2] == "t" and t.text
                        )
                        if runs:
                            parts.append(runs)
                        continue
                    v = next(
                        (
                            el.text
                            for el in c.iter()
                            if el.tag.rpartition("}")[2] == "v" and el.text
                        ),
                        None,
                    )
                    if v is None:
                        continue
                    if ctype == "s":
                        try:
                            parts.append(shared[int(v)])
                        except (ValueError, IndexError):
                            continue
                    else:  # "str" formula results and plain numeric cells
                        parts.append(v)
    except (zipfile.BadZipFile, KeyError):
        return ""
    return "\n".join(p for p in parts if p).strip()


# OASIS OpenDocument and its StarOffice/OpenOffice-1.x predecessor (.sxw,
# mimetype application/vnd.sun.xml.*) share the same text model under
# different namespaces — Tika's OpenDocumentParser handles both.
_ODF_TEXT_NSES = (
    "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
    "http://openoffice.org/2000/text",
)
_ODF_TEXT_NS = _ODF_TEXT_NSES[0]


def _odf_para_text(el) -> str:
    """Serialize one ODF <text:p>/<text:h> subtree: <text:s text:c=N> is N
    spaces (default 1), <text:tab>/<text:tab-stop> a tab, <text:line-break>
    a newline; other descendants contribute text + tail in document order
    (ODF 1.2 §6.1; the sun.xml dialect names the tab element tab-stop)."""
    parts: list[str] = []

    def walk(node) -> None:
        local = node.tag.rpartition("}")[2]
        if local == "s":
            count = "1"
            for ns in _ODF_TEXT_NSES:
                count = node.get(f"{{{ns}}}c") or count
            parts.append(" " * int(count or "1"))
        elif local in ("tab", "tab-stop"):
            parts.append("\t")
        elif local == "line-break":
            parts.append("\n")
        else:
            if node.text:
                parts.append(node.text)
            for child in node:
                walk(child)
                if child.tail:
                    parts.append(child.tail)

    if el.text:
        parts.append(el.text)
    for child in el:
        walk(child)
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def extract_odf_text(data: bytes) -> tuple[str, str]:
    """(mime, text) for an OpenDocument package (odt/ods/odp): the mime comes
    from the mandatory ``mimetype`` zip entry, the text from ``content.xml``
    <text:p>/<text:h> paragraphs (newline-joined). The same extraction covers
    writer, calc (cell paragraphs) and impress (frame paragraphs) — ODF uses
    the text namespace for all of them. Reference: parse-tika delegates ODF
    to Tika's OpenDocumentParser, which reads the same two package parts."""
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            names = set(z.namelist())
            mime = (
                z.read("mimetype").decode("ascii", "replace").strip()
                if "mimetype" in names
                else "application/vnd.oasis.opendocument"
            )
            xml = z.read("content.xml") if "content.xml" in names else b""
    except (zipfile.BadZipFile, KeyError, OSError):
        return "application/vnd.oasis.opendocument", ""
    if not xml:
        return mime, ""
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError:
        return mime, ""
    paras = []
    for el in root.iter():
        if el.tag.rpartition("}")[2] in ("p", "h") and any(
            el.tag.startswith(f"{{{ns}}}") for ns in _ODF_TEXT_NSES
        ):
            txt = _odf_para_text(el)
            if txt:
                paras.append(txt)
    return mime, "\n".join(paras).strip()


def _xhtml_body_text(xml: bytes) -> str:
    """Visible text of one (X)HTML spine document: body subtree text joined
    in document order, whitespace-collapsed. Falls back to a tag-strip regex
    when the entry is HTML soup rather than well-formed XML."""
    import re as _re

    try:
        root = ElementTree.fromstring(xml)
        body = next(
            (el for el in root.iter() if el.tag.rpartition("}")[2] == "body"), root
        )
        text = " ".join(t.strip() for t in body.itertext() if t.strip())
    except ElementTree.ParseError:
        stripped = _re.sub(rb"<[^>]*>", b" ", xml)
        text = " ".join(stripped.decode("utf-8", "replace").split())
    return text


def extract_epub_text(data: bytes) -> tuple[str, str]:
    """(mime, text) for an EPUB package: spine documents in reading order
    via META-INF/container.xml → OPF manifest/spine (EPUB OCF/OPF specs);
    falls back to all (x)html members in name order when the manifest is
    broken. Reference: parse-tika delegates EPUB to Tika's EpubParser,
    which walks the same container → rootfile → spine chain."""
    mime = "application/epub+zip"
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            names = z.namelist()

            def read(name: str) -> bytes | None:
                try:
                    return z.read(name)
                except KeyError:
                    return None

            spine_docs: list[str] = []
            container = read("META-INF/container.xml")
            if container is not None:
                try:
                    croot = ElementTree.fromstring(container)
                    opf_path = next(
                        (
                            el.get("full-path")
                            for el in croot.iter()
                            if el.tag.rpartition("}")[2] == "rootfile"
                            and el.get("full-path")
                        ),
                        None,
                    )
                except ElementTree.ParseError:
                    opf_path = None
                opf = read(opf_path) if opf_path else None
                if opf is not None:
                    try:
                        oroot = ElementTree.fromstring(opf)
                        hrefs = {
                            el.get("id"): el.get("href")
                            for el in oroot.iter()
                            if el.tag.rpartition("}")[2] == "item"
                        }
                        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
                        for el in oroot.iter():
                            if el.tag.rpartition("}")[2] == "itemref":
                                href = hrefs.get(el.get("idref"))
                                if href:
                                    spine_docs.append(base + href)
                    except ElementTree.ParseError:
                        pass
            if not spine_docs:  # broken/missing manifest: all markup members
                spine_docs = sorted(
                    n for n in names if n.lower().endswith((".xhtml", ".html", ".htm"))
                )
            parts = []
            for name in spine_docs[:_ZIP_MAX_ENTRIES]:
                xml = read(name)
                if xml is None or len(xml) > _ZIP_MAX_ENTRY_BYTES:
                    continue
                text = _xhtml_body_text(xml)
                if text:
                    parts.append(text)
    except (zipfile.BadZipFile, OSError):
        return mime, ""
    return mime, "\n".join(parts).strip()


def extract_pptx_text(data: bytes) -> str:
    """<a:t> runs of every slide in deck order (DrawingML)."""
    parts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            slides = sorted(
                n
                for n in z.namelist()
                if n.startswith("ppt/slides/slide") and n.endswith(".xml")
            )
            for n in slides:
                parts += _xml_texts(z.read(n), "t")
    except (zipfile.BadZipFile, KeyError):
        return ""
    return "\n".join(parts).strip()


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

_OOXML_MARKERS = {
    "word/": ("application/vnd.openxmlformats-officedocument.wordprocessingml.document", extract_docx_text),
    "xl/": ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", extract_xlsx_text),
    "ppt/": ("application/vnd.openxmlformats-officedocument.presentationml.presentation", extract_pptx_text),
}


# parse-zip bounds: entries parsed per archive and bytes read per entry
# (a crawler must never let one hostile archive own an executor)
_ZIP_MAX_ENTRIES = 100
_ZIP_MAX_ENTRY_BYTES = 1 << 20
# single-file compressor (gz/bz2/xz) decompressed-payload cap
_COMPRESSOR_MAX_BYTES = 4 << 20


def _extract_zip_members(data: bytes, depth: int) -> str:
    """parse-zip (src/plugin/parse-zip ZipTextExtractor.java): each archive
    entry routes through the same mime-dispatched extraction; texts join in
    entry order. Depth-capped so zip bombs of nested archives terminate."""
    texts: list[str] = []
    try:
        with zipfile.ZipFile(BytesIO(data)) as z:
            for info in z.infolist()[:_ZIP_MAX_ENTRIES]:
                if info.is_dir() or info.file_size > _ZIP_MAX_ENTRY_BYTES:
                    continue
                try:
                    member = z.read(info.filename)
                    _, text = _extract_text(member, depth + 1)
                except Exception:  # corrupt entry — skip it, keep the rest
                    continue
                if text:
                    # ZipTextExtractor.java:105: 'entryname text' per entry
                    texts.append(f"{info.filename} {text}")
    except zipfile.BadZipFile:
        return ""
    return "\n".join(texts)


def extract_text(data: bytes) -> tuple[str, str]:
    """(mime, text) for one binary document, dispatched on magic bytes —
    the runtime twin of functions.mime.detect_mime's magic branch."""
    return _extract_text(data, 0)


def _extract_text(data: bytes, depth: int) -> tuple[str, str]:
    if data[:5] == b"%PDF-":
        return "application/pdf", extract_pdf_text(data)
    if data[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(BytesIO(data)) as z:
                names = z.namelist()
                odf_mime = (
                    z.read("mimetype").decode("ascii", "replace").strip()
                    if "mimetype" in names
                    else ""
                )
        except (zipfile.BadZipFile, KeyError):
            return "application/zip", ""
        # OpenDocument/EPUB packages declare themselves via the mandatory
        # ``mimetype`` entry (first, stored) — check before OOXML markers
        if odf_mime.startswith(
            ("application/vnd.oasis.opendocument", "application/vnd.sun.xml")
        ):
            return extract_odf_text(data)
        if odf_mime == "application/epub+zip":
            return extract_epub_text(data)
        for prefix, (mime, fn) in _OOXML_MARKERS.items():
            if any(n.startswith(prefix) for n in names):
                return mime, fn(data)
        from nutch_spark.operators.parse_tail import (
            extract_iwork_text,
            is_iwork13,
            iwork_index_entry,
        )

        if iwork_index_entry(names) or is_iwork13(names):
            iwork = extract_iwork_text(data)
            if iwork is not None:  # None: not actually iWork → zip path
                return iwork
        if depth >= 2:  # nested-archive cutoff
            return "application/zip", ""
        return "application/zip", _extract_zip_members(data, depth)
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":  # legacy OLE container
        from nutch_spark.operators.ole import extract_ole_text

        return extract_ole_text(data)  # .doc/.xls/.ppt via [MS-CFB] reader
    if data[:5] == b"{\\rtf":
        from nutch_spark.operators.ole import extract_rtf_text

        return "application/rtf", extract_rtf_text(data)
    if data[:4] == b"\xffWPC":
        from nutch_spark.operators.parse_tail import extract_wpd_text

        return extract_wpd_text(data)
    if data[:4] == b"ITSF":
        from nutch_spark.operators.parse_tail import extract_chm_text

        if depth >= 2:  # nested-archive cutoff, like the zip path
            return "application/vnd.ms-htmlhelp", ""
        return extract_chm_text(data, depth)
    if data[:6] == b"7z\xbc\xaf\x27\x1c":
        from nutch_spark.operators.parse_tail import extract_7z_text

        if depth >= 2:
            return "application/x-7z-compressed", ""
        return extract_7z_text(data, depth)
    if data[:4] == b"MSCF":
        from nutch_spark.operators.parse_tail import extract_cab_text

        if depth >= 2:
            return "application/vnd.ms-cab-compressed", ""
        return extract_cab_text(data, depth)
    if data[:4] == b"8BPS":
        from nutch_spark.operators.parse_tail import extract_psd_text

        return extract_psd_text(data)
    if data[:4] == b"MThd":
        from nutch_spark.operators.parse_tail import extract_midi_text

        return extract_midi_text(data)
    # fonts (Tika TrueTypeParser slot): sfnt/TTC/WOFF by leading tag, EOT
    # by its offset-34 magic + version dword; extract_font_meta validates
    # further and returns None for coincidental prefixes (falls through)
    if (
        data[:4] in (b"\x00\x01\x00\x00", b"OTTO", b"true", b"ttcf", b"wOFF", b"wOF2")
        or (len(data) >= 88 and data[34:36] == b"LP")
    ):
        from nutch_spark.operators.parse_tail import extract_font_meta

        got = extract_font_meta(data)
        if got is not None:
            return got
    if data[257:262] == b"ustar":  # POSIX/GNU tar member header magic
        import tarfile

        try:
            tf = tarfile.open(fileobj=BytesIO(data))
        except (tarfile.TarError, OSError):
            tf = None  # "ustar" at 257 by coincidence (e.g. plain text):
            # fall through to the text/binary fallback below
        if tf is not None and depth >= 2:  # nested-archive cutoff — but
            tf.close()  # only for REAL tars; false positives still fall
            return "application/x-tar", ""  # through at any depth
        if tf is not None:
            texts = []
            try:
                with tf:
                    for member in tf.getmembers()[:_ZIP_MAX_ENTRIES]:
                        if (
                            not member.isfile()
                            or member.size > _ZIP_MAX_ENTRY_BYTES
                        ):
                            continue
                        fh = tf.extractfile(member)
                        if fh is None:
                            continue
                        try:
                            _, txt = _extract_text(fh.read(), depth + 1)
                        except Exception:  # noqa: BLE001 — skip bad member
                            continue
                        if txt:
                            texts.append(f"{member.name} {txt}")
            except (tarfile.TarError, OSError):
                pass  # truncated archive: keep what extracted
            return "application/x-tar", "\n".join(texts)
    # single-file compressors (Tika's CompressorParser slot): bounded
    # decompress, then re-dispatch on the inner payload's magic. The
    # depth guard caps compressor nesting like the zip path; the size cap
    # stops decompression bombs from owning an executor.
    comp_mime = None
    if data[:2] == b"\x1f\x8b":
        comp_mime = "application/gzip"
    elif data[:3] == b"BZh" and len(data) > 4 and data[3:4].isdigit():
        comp_mime = "application/x-bzip2"
    elif data[:6] == b"\xfd7zXZ\x00":
        comp_mime = "application/x-xz"
    if comp_mime and depth < 2:
        inner = None
        try:
            if comp_mime == "application/gzip":
                import gzip as _gzip

                with _gzip.GzipFile(fileobj=BytesIO(data)) as gz:
                    inner = gz.read(_COMPRESSOR_MAX_BYTES + 1)
            elif comp_mime == "application/x-bzip2":
                import bz2 as _bz2

                inner = _bz2.BZ2Decompressor().decompress(
                    data, _COMPRESSOR_MAX_BYTES + 1
                )
            else:
                import lzma as _lzma

                inner = _lzma.LZMADecompressor(format=_lzma.FORMAT_XZ).decompress(
                    data, _COMPRESSOR_MAX_BYTES + 1
                )
        except Exception:  # noqa: BLE001 — corrupt member → mime only
            inner = None
        if inner is not None and 0 < len(inner) <= _COMPRESSOR_MAX_BYTES:
            _, text = _extract_text(inner, depth + 1)
            return comp_mime, text
        return comp_mime, ""
    # email (Tika RFC822Parser/MboxParser slot): mbox archives open with
    # the classic "From " separator; bare RFC 822 messages are detected by
    # header shape — both before the generic text fallback so a mail body
    # surfaces decoded (RFC 2047 subjects, base64/qp transfer encodings)
    # rather than as raw MIME source
    if data[:5] == b"From ":
        from nutch_spark.operators.parse_tail import extract_mbox_text

        return extract_mbox_text(data)
    from nutch_spark.operators.parse_tail import extract_vcal_text, looks_like_vcal

    if looks_like_vcal(data):
        # vCard / iCalendar (Tika VCardParser/ICalParser slot)
        return extract_vcal_text(data)
    from nutch_spark.operators.parse_tail import extract_eml_text, looks_like_rfc822

    if looks_like_rfc822(data):
        return extract_eml_text(data)
    # fall back to plain text for decodable bytes; clearly-HTML payloads
    # (inside compressors/archives — standalone HTML never reaches this
    # dispatcher) go through the HTML text extractor instead
    try:
        decoded = data.decode("utf-8").strip()
    except UnicodeDecodeError:
        return "application/octet-stream", ""
    sniff = decoded[:256].lstrip().lower()
    if sniff.startswith(("<!doctype html", "<html")):
        from nutch_spark.operators.parse_html import parse_html_page

        return "text/html", parse_html_page("container:member", decoded)["text"]
    return "text/plain", decoded


PARSE_BINARY_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("parse_text", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def parse_binary(
    fetch_log: DataFrame, *, url: str = "url", content: str = "content"
) -> DataFrame:
    """Binary fetch rows → (url, mime, parse_text, n_chars): the parse-tika
    slot next to parse_html. Input ``content`` must be BINARY; rows with
    NULL content are dropped (nothing to parse), extraction failures yield
    mime + empty text rather than failing the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, payload in zip(pdf[url], pdf[content]):
                data = bytes(payload)
                try:
                    mime, text = extract_text(data)
                except Exception:
                    mime, text = "application/octet-stream", ""
                rows.append(
                    {"url": u, "mime": mime, "parse_text": text, "n_chars": len(text)}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PARSE_BINARY_SCHEMA.fields]
            )

    src = fetch_log.filter(F.col(content).isNotNull()).select(url, content)
    return src.mapInPandas(run, PARSE_BINARY_SCHEMA)


# ---------------------------------------------------------------------------
# Embedded raster images (Tika's EmbeddedDocumentExtractor surface)
# ---------------------------------------------------------------------------

_IMAGE_MAGICS = (
    b"\x89PNG\r\n\x1a\n", b"GIF87a", b"GIF89a", b"BM", b"\xff\xd8\xff",
    b"II*\x00", b"MM\x00*",
)
_IMAGE_EXTS = ("png", "jpg", "jpeg", "gif", "bmp", "tif", "tiff")


def _looks_image(blob: bytes) -> bool:
    return any(blob.startswith(m) for m in _IMAGE_MAGICS)


def extract_embedded_images(
    data: bytes, *, max_images: int = 64, max_bytes: int = 1 << 24
) -> list[bytes]:
    """The raster images embedded in a container document, as standalone
    image files (reference parity: parse-tika's EmbeddedDocumentExtractor
    recursion, TikaParser.java routing):

    - PDF: image XObjects whose filter is DCTDecode — the stream bytes ARE
      a JPEG file (PDF 32000-1 §7.4.8); Flate/JPX-coded images need the
      raster re-wrapped and are skipped.
    - Zip-packaged documents (OOXML word|ppt|xl/media/, ODF Pictures/,
      EPUB images/...): members with image extensions whose bytes carry a
      known raster magic.
    - RFC 822 email: image/* MIME parts (decoded payloads).

    Bounded at ``max_images`` blobs of ``max_bytes`` each so a hostile
    container can't balloon the row. Feeds ``image_dhash`` so embedded
    media joins the perceptual near-dup space alongside fetched images."""
    out: list[bytes] = []
    if data[:5] == b"%PDF-":
        for m in _STREAM_RE.finditer(data):
            params, raw = m.group(1), m.group(2)
            if b"/Image" not in params or b"/DCTDecode" not in params:
                continue
            length = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", params)
            if length and int(length.group(1)) <= len(raw):
                raw = raw[: int(length.group(1))]
            elif raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n"):
                raw = raw[:-1]
            if raw[:3] == b"\xff\xd8\xff" and len(raw) <= max_bytes:
                out.append(bytes(raw))
                if len(out) >= max_images:
                    break
        return out
    if data[:2] == b"PK":
        try:
            with zipfile.ZipFile(BytesIO(data)) as z:
                for info in z.infolist():
                    ext = info.filename.lower().rsplit(".", 1)[-1]
                    if ext not in _IMAGE_EXTS or info.file_size > max_bytes:
                        continue
                    try:
                        blob = z.read(info)
                    except Exception:  # noqa: BLE001 — one bad member
                        continue
                    if _looks_image(blob):
                        out.append(blob)
                        if len(out) >= max_images:
                            break
        except (zipfile.BadZipFile, OSError, EOFError):
            pass
        return out
    from nutch_spark.operators.parse_tail import looks_like_rfc822

    if looks_like_rfc822(data):
        import email
        from email import policy

        try:
            msg = email.message_from_bytes(data, policy=policy.default)
            for part in msg.walk():
                if part.get_content_maintype() != "image":
                    continue
                try:
                    blob = part.get_payload(decode=True)
                except Exception:  # noqa: BLE001 — broken transfer encoding
                    continue
                if blob and len(blob) <= max_bytes and _looks_image(blob):
                    out.append(blob)
                    if len(out) >= max_images:
                        break
        except Exception:  # noqa: BLE001 — malformed MIME yields no images
            pass
    return out
