"""Legacy Microsoft binary formats: OLE CFB container, .doc/.xls/.ppt, RTF.

Reference: the parse-tika plugin hands these mimes to Apache Tika/POI
(/root/reference/src/plugin/parse-tika/src/java/org/apache/nutch/parse/tika/
TikaParser.java:63-160); this module implements the text-bearing subset with
the stdlib only, from the published format specs:

- [MS-CFB]  Compound File Binary (the OLE container): header, FAT, DIFAT,
  directory tree, miniFAT/mini stream.
- [MS-DOC]  WordBinary: FIB → Clx piece table in the Table stream → text
  pieces (cp1252-compressed or UTF-16) from the WordDocument stream.
- [MS-XLS]  BIFF8: SST shared strings (with CONTINUE re-flagging) and
  BoundSheet8 sheet names from the Workbook stream.
- [MS-PPT]  PowerPoint binary: TextCharsAtom / TextBytesAtom record scan.
- RTF 1.x   control-word tokenizer (destinations skipped, \\'hh and \\uN
  escapes decoded).

Extraction fidelity is "all human-readable text in document order", the same
contract parse_binary.py's PDF/OOXML extractors meet; formatting, fields and
embedded objects are dropped. Encrypted documents return empty text.

Everything here is a per-document pure function called from the parse_binary
mapInPandas stage — no Spark dependency, no shuffle implications.
"""

from __future__ import annotations

import struct

__all__ = [
    "CfbFile",
    "build_cfb",
    "build_doc_bytes",
    "extract_doc_text",
    "extract_ole_text",
    "extract_ppt_text",
    "extract_rtf_text",
    "extract_xls_text",
]

OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


class CfbFile:
    """Read-only [MS-CFB] compound file: ``CfbFile(data).read('WordDocument')``.

    Supports v3 (512 B sectors) and v4 (4096 B), header-DIFAT plus chained
    DIFAT sectors, and the miniFAT/mini-stream path for streams under the
    cutoff. Chains are cycle-guarded (a hostile file cannot loop an
    executor). Raises ValueError on a malformed container."""

    def __init__(self, data: bytes):
        if data[:8] != OLE_MAGIC or len(data) < 512:
            raise ValueError("not a compound file")
        self._data = data
        self.sector_size = 1 << _u16(data, 30)
        self.mini_size = 1 << _u16(data, 32)
        self.mini_cutoff = _u32(data, 56)
        n_fat = _u32(data, 44)
        first_dir = _u32(data, 48)
        first_minifat = _u32(data, 60)
        n_minifat = _u32(data, 64)
        first_difat = _u32(data, 68)
        n_difat = _u32(data, 72)

        max_sect = max(0, (len(data) - self.sector_size) // self.sector_size)
        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = [_u32(data, 76 + 4 * i) for i in range(109)]
        s = first_difat
        for _ in range(n_difat):
            if s >= _DIFSECT or s > max_sect:
                break
            sec = self._sector(s)
            per = self.sector_size // 4 - 1
            difat += [_u32(sec, 4 * i) for i in range(per)]
            s = _u32(sec, self.sector_size - 4)
        fat_sectors = [s for s in difat[: max(n_fat, 0)] if s < _DIFSECT]
        fat: list[int] = []
        for s in fat_sectors:
            sec = self._sector(s)
            fat += [_u32(sec, 4 * i) for i in range(self.sector_size // 4)]
        self._fat = fat
        # directory entries from the directory chain
        dir_bytes = self._read_chain(first_dir, None)
        self.entries = []
        for off in range(0, len(dir_bytes) - 127, 128):
            e = dir_bytes[off : off + 128]
            name_len = _u16(e, 64)
            otype = e[66]
            if otype == 0 or name_len < 2 or name_len > 64:
                continue
            name = e[: name_len - 2].decode("utf-16-le", errors="replace")
            start = _u32(e, 116)
            size = struct.unpack_from("<Q", e, 120)[0]
            if self.sector_size == 512:
                size &= 0xFFFFFFFF  # v3: only the low 32 bits are valid
            self.entries.append((name, otype, start, size))
        # root entry (type 5) holds the mini stream
        root = next((e for e in self.entries if e[1] == 5), None)
        self._mini_stream = (
            self._read_chain(root[2], root[3]) if root else b""
        )
        minifat_bytes = self._read_chain(first_minifat, None) if n_minifat else b""
        self._minifat = [
            _u32(minifat_bytes, 4 * i) for i in range(len(minifat_bytes) // 4)
        ]

    def _sector(self, n: int) -> bytes:
        # [MS-CFB] 2.2: sector #n begins at (n+1)*sector_size — for v4
        # (4096 B sectors) the header block occupies a FULL first sector,
        # not just its 512 header bytes
        off = (n + 1) * self.sector_size
        return self._data[off : off + self.sector_size]

    def _read_chain(self, start: int, size: int | None) -> bytes:
        out = []
        s = start
        seen = 0
        limit = len(self._fat) + 2
        while s < _DIFSECT and seen < limit:
            out.append(self._sector(s))
            seen += 1
            s = self._fat[s] if s < len(self._fat) else _ENDOFCHAIN
        blob = b"".join(out)
        return blob if size is None else blob[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = []
        s = start
        seen = 0
        limit = len(self._minifat) + 2
        while s < _DIFSECT and seen < limit:
            off = s * self.mini_size
            out.append(self._mini_stream[off : off + self.mini_size])
            seen += 1
            s = self._minifat[s] if s < len(self._minifat) else _ENDOFCHAIN
        return b"".join(out)[:size]

    def read(self, name: str) -> bytes | None:
        """Stream content by name (case-insensitive), or None if absent."""
        for ename, otype, start, size in self.entries:
            if otype == 2 and ename.lower() == name.lower():
                if size < self.mini_cutoff:
                    return self._read_mini_chain(start, size)
                return self._read_chain(start, size)
        return None

    def stream_names(self) -> list[str]:
        return [e[0] for e in self.entries if e[1] == 2]


# ---------------------------------------------------------------------------
# [MS-DOC] WordBinary text: FIB -> Clx piece table -> pieces
# ---------------------------------------------------------------------------


def _doc_pieces(clx: bytes) -> list[tuple[int, int, int, bool]]:
    """Pcdt piece descriptors from a Clx: (cp_start, cp_end, fc, compressed).

    Clx = zero or more Prc (clxt=1, skipped) then one Pcdt (clxt=2) holding
    a PlcPcd: n+1 character positions + n 8-byte PCDs whose fc encodes the
    file offset and the fCompressed (cp1252 one-byte) flag ([MS-DOC] 2.9.38,
    2.9.177)."""
    i = 0
    while i < len(clx):
        t = clx[i]
        if t == 1:  # Prc: u16 cbGrpprl + payload
            if i + 3 > len(clx):
                return []
            i += 3 + _u16(clx, i + 1)
            continue
        if t == 2:  # Pcdt
            if i + 5 > len(clx):
                return []
            lcb = _u32(clx, i + 1)
            plc = clx[i + 5 : i + 5 + lcb]
            if lcb < 4 or (lcb - 4) % 12 != 0:
                return []
            n = (lcb - 4) // 12
            cps = [_u32(plc, 4 * k) for k in range(n + 1)]
            pieces = []
            for k in range(n):
                pcd = plc[4 * (n + 1) + 8 * k : 4 * (n + 1) + 8 * k + 8]
                fc = _u32(pcd, 2)
                compressed = bool(fc & 0x40000000)
                fc &= 0x3FFFFFFF
                if compressed:
                    fc //= 2
                pieces.append((cps[k], cps[k + 1], fc, compressed))
            return pieces
        return []
    return []


def _doc_normalize(text: str) -> str:
    """Word control characters → plain text: paragraph/cell/line marks to
    newlines, field instructions (0x13..0x14) dropped, field results kept,
    object markers removed ([MS-DOC] 2.8.24 special characters)."""
    out: list[str] = []
    in_field_instr = False
    for ch in text:
        o = ord(ch)
        if o == 0x13:  # field begin: skip instruction text
            in_field_instr = True
            continue
        if o == 0x14:  # field separator: result text follows
            in_field_instr = False
            continue
        if o == 0x15:  # field end
            in_field_instr = False
            continue
        if in_field_instr:
            continue
        if o in (0x0D, 0x0B, 0x0C, 0x07):  # para / line / page / cell marks
            out.append("\n")
        elif o == 0x1E:  # non-breaking hyphen
            out.append("-")
        elif o in (0x1F, 0x01, 0x02, 0x05, 0x08):  # soft hyphen, markers
            continue
        else:
            out.append(ch)
    return "".join(out)


def extract_doc_text(cfb: CfbFile) -> str:
    """Main-document text of a Word 97-2003 .doc ([MS-DOC] 2.3.1: FIB at
    WordDocument offset 0, fWhichTblStm selects 0Table/1Table, fcClx/lcbClx
    at FIB 0x1A2/0x1A6 locate the piece table, ccpText at 0x4C bounds the
    main-document character range). Encrypted files return ''."""
    wd = cfb.read("WordDocument")
    if not wd or len(wd) < 0x200 or _u16(wd, 0) != 0xA5EC:
        return ""
    flags = _u16(wd, 0x0A)
    if flags & 0x0100:  # fEncrypted
        return ""
    table = cfb.read("1Table" if flags & 0x0200 else "0Table")
    if table is None:
        table = cfb.read("1Table") or cfb.read("0Table") or b""
    fc_clx, lcb_clx = _u32(wd, 0x01A2), _u32(wd, 0x01A6)
    ccp_text = _u32(wd, 0x4C)
    chars: list[str] = []
    for cp_start, cp_end, fc, compressed in _doc_pieces(
        table[fc_clx : fc_clx + lcb_clx]
    ):
        n = cp_end - cp_start
        if n <= 0:
            continue
        if compressed:
            chars.append(wd[fc : fc + n].decode("cp1252", errors="replace"))
        else:
            chars.append(
                wd[fc : fc + 2 * n].decode("utf-16-le", errors="replace")
            )
    text = "".join(chars)
    if not text:
        # pre-piece-table fallback (Word 6/95 non-complex): [fcMin, fcMac)
        fc_min, fc_mac = _u32(wd, 0x18), _u32(wd, 0x1C)
        if 0 < fc_min < fc_mac <= len(wd):
            text = wd[fc_min:fc_mac].decode("cp1252", errors="replace")
    if ccp_text:
        text = text[:ccp_text]  # drop footnote/header ranges appended after
    return _doc_normalize(text).strip()


# ---------------------------------------------------------------------------
# [MS-XLS] BIFF8 text: SST shared strings + BoundSheet8 names
# ---------------------------------------------------------------------------


class _SstReader:
    """Byte reader over the SST record plus its CONTINUE records that knows
    chunk boundaries: when a string's CHARACTER data crosses into a CONTINUE
    record, the continuation starts with a fresh option-flags byte and the
    encoding may switch width mid-string ([MS-XLS] 2.5.293)."""

    def __init__(self, chunks: list[bytes]):
        self.chunks = chunks
        self.ci = 0
        self.off = 0

    def _remaining_in_chunk(self) -> int:
        return len(self.chunks[self.ci]) - self.off

    def eof(self) -> bool:
        while self.ci < len(self.chunks) and self._remaining_in_chunk() == 0:
            self.ci += 1
            self.off = 0
        return self.ci >= len(self.chunks)

    def read(self, n: int) -> bytes:
        """n bytes spanning chunk boundaries (numeric fields / skip data)."""
        out = bytearray()
        while n > 0 and not self.eof():
            take = min(n, self._remaining_in_chunk())
            out += self.chunks[self.ci][self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        """cch characters honoring re-flagging at each CONTINUE boundary:
        whenever character data resumes at the start of a new chunk, a fresh
        option-flags byte precedes it and may switch the encoding width."""
        parts: list[str] = []
        last_ci = self.ci
        while cch > 0 and not self.eof():
            if self.ci != last_ci and self.off == 0:
                high = bool(self.read(1)[0] & 0x01)
                last_ci = self.ci
                continue
            last_ci = self.ci
            avail = self._remaining_in_chunk()
            width = 2 if high else 1
            take = min(cch, avail // width)
            if take == 0:  # odd leftover byte — skip to the next chunk
                self.ci += 1
                self.off = 0
                continue
            raw = self.read(take * width)
            parts.append(
                raw.decode("utf-16-le" if high else "cp1252", errors="replace")
            )
            cch -= take
        return "".join(parts)


def _xl_unicode_string(r: _SstReader) -> str:
    """XLUnicodeRichExtendedString ([MS-XLS] 2.5.293): cch, flags, optional
    rich-run count / ext size, character data, then run + ext payloads."""
    hdr = r.read(3)
    if len(hdr) < 3:
        return ""
    cch = hdr[0] | (hdr[1] << 8)
    flags = hdr[2]
    c_run = 0
    cb_ext = 0
    if flags & 0x08:  # fRichSt
        c_run = _u16(r.read(2), 0)
    if flags & 0x04:  # fExtSt
        cb_ext = _u32(r.read(4), 0)
    s = r.read_chars(cch, bool(flags & 0x01))
    r.read(4 * c_run)
    r.read(cb_ext)
    return s


def extract_xls_text(cfb: CfbFile) -> str:
    """Sheet names + shared strings of a BIFF8 workbook, newline-joined in
    file order. SST ([MS-XLS] 2.4.265) carries every LABELSST cell text
    exactly once; BoundSheet8 (2.4.28) names the sheets. FilePass (0x002F,
    encryption) aborts to ''."""
    wb = cfb.read("Workbook") or cfb.read("Book")
    if not wb:
        return ""
    parts: list[str] = []
    i = 0
    n = len(wb)
    while i + 4 <= n:
        rec, ln = _u16(wb, i), _u16(wb, i + 2)
        data = wb[i + 4 : i + 4 + ln]
        i += 4 + ln
        if rec == 0x002F:  # FilePass — encrypted workbook
            return ""
        if rec == 0x0085 and len(data) >= 8:  # BoundSheet8
            cch = data[6]
            high = bool(data[7] & 0x01)
            raw = data[8 : 8 + cch * (2 if high else 1)]
            parts.append(
                raw.decode("utf-16-le" if high else "cp1252", errors="replace")
            )
        elif rec == 0x00FC:  # SST + following CONTINUEs
            chunks = [data[8:]]
            while i + 4 <= n and _u16(wb, i) == 0x003C:
                cln = _u16(wb, i + 2)
                chunks.append(wb[i + 4 : i + 4 + cln])
                i += 4 + cln
            cst_unique = _u32(data, 4)
            r = _SstReader(chunks)
            for _ in range(cst_unique):
                if r.eof():
                    break
                s = _xl_unicode_string(r)
                if s:
                    parts.append(s)
    return "\n".join(p for p in parts if p.strip()).strip()


# ---------------------------------------------------------------------------
# [MS-PPT] binary PowerPoint text: TextCharsAtom / TextBytesAtom scan
# ---------------------------------------------------------------------------

_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8
_PPT_CSTRING = 0x0FBA


def _ppt_records(data: bytes, depth: int = 0):
    """Flattened (type, payload) walk of PPT record tree ([MS-PPT] 2.3.1:
    recVer 0xF marks a container of nested records)."""
    i, n = 0, len(data)
    while i + 8 <= n:
        ver_inst = _u16(data, i)
        rtype = _u16(data, i + 2)
        rlen = _u32(data, i + 4)
        payload = data[i + 8 : i + 8 + rlen]
        if (ver_inst & 0x0F) == 0x0F and depth < 16:
            yield from _ppt_records(payload, depth + 1)
        else:
            yield rtype, payload
        i += 8 + rlen


def extract_ppt_text(cfb: CfbFile) -> str:
    """All text atoms of the 'PowerPoint Document' stream in record order:
    TextCharsAtom (UTF-16), TextBytesAtom (cp1252), CString titles."""
    doc = cfb.read("PowerPoint Document")
    if not doc:
        return ""
    parts: list[str] = []
    for rtype, payload in _ppt_records(doc):
        if rtype in (_PPT_TEXT_CHARS, _PPT_CSTRING):
            parts.append(payload.decode("utf-16-le", errors="replace"))
        elif rtype == _PPT_TEXT_BYTES:
            parts.append(payload.decode("cp1252", errors="replace"))
    text = "\n".join(p.replace("\r", "\n").strip() for p in parts if p.strip())
    return text.strip()


def extract_ole_text(data: bytes) -> tuple[str, str]:
    """(mime, text) for an OLE compound document, dispatched on the streams
    present — the Tika-slot router for legacy Office formats."""
    try:
        cfb = CfbFile(data)
    except (ValueError, struct.error, IndexError):
        return "application/x-ole-storage", ""
    names = {s.lower() for s in cfb.stream_names()}
    try:
        if "worddocument" in names:
            return "application/msword", extract_doc_text(cfb)
        if "workbook" in names or "book" in names:
            return "application/vnd.ms-excel", extract_xls_text(cfb)
        if "powerpoint document" in names:
            return "application/vnd.ms-powerpoint", extract_ppt_text(cfb)
    except (struct.error, IndexError):
        return "application/x-ole-storage", ""
    return "application/x-ole-storage", ""


# ---------------------------------------------------------------------------
# RTF 1.x: control-word tokenizer
# ---------------------------------------------------------------------------

# destinations whose content is data, not document text
_RTF_SKIP_DESTS = {
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf", "footerl",
    "footerr", "footerf", "footnote", "annotation", "xe", "tc",
    "fldinst", "themedata", "colorschememapping", "datastore",
    "generator", "listtable", "listoverridetable", "revtbl", "filetbl",
}
_RTF_NEWLINE_WORDS = {"par", "line", "sect", "page", "row"}
_RTF_SYMBOLS = {"~": " ", "-": "", "_": "-", "{": "{", "}": "}", "\\": "\\"}


def extract_rtf_text(data: bytes) -> str:
    """Plain text of an RTF document: groups tracked, non-text destinations
    (font/color tables, pict, headers, field instructions...) skipped,
    ``\\'hh`` cp1252 and ``\\uN`` Unicode escapes (with ``\\ucN`` skip
    counts) decoded, ``\\par``/``\\line``/``\\tab`` mapped to whitespace."""
    try:
        s = data.decode("cp1252", errors="replace")
    except Exception:  # noqa: BLE001
        return ""
    out: list[str] = []
    # group state: (skipping, uc_skip_count)
    stack: list[tuple[bool, int]] = []
    skipping = False
    uc = 1
    i, n = 0, len(s)
    pending_uc_skip = 0
    while i < n:
        c = s[i]
        if c == "{":
            stack.append((skipping, uc))
            i += 1
            # {\*\dest ...}: unknown starred destinations are skippable
            if s[i : i + 2] == "\\*":
                skipping = True
                i += 2
            continue
        if c == "}":
            if stack:
                skipping, uc = stack.pop()
            i += 1
            continue
        if c == "\\":
            if i + 1 < n and not s[i + 1].isalpha():
                sym = s[i + 1]
                if sym == "'":
                    hex_code = s[i + 2 : i + 4]
                    i += 4
                    if pending_uc_skip > 0:
                        pending_uc_skip -= 1
                    elif not skipping:
                        try:
                            out.append(
                                bytes([int(hex_code, 16)]).decode("cp1252")
                            )
                        except ValueError:
                            pass
                    continue
                if not skipping and sym in _RTF_SYMBOLS:
                    out.append(_RTF_SYMBOLS[sym])
                i += 2
                continue
            j = i + 1
            while j < n and s[j].isalpha():
                j += 1
            word = s[i + 1 : j]
            param_start = j
            if j < n and (s[j] == "-" or s[j].isdigit()):
                j += 1
                while j < n and s[j].isdigit():
                    j += 1
            param = s[param_start:j]
            if j < n and s[j] == " ":  # the delimiting space is consumed
                j += 1
            i = j
            if word in _RTF_SKIP_DESTS:
                skipping = True
            elif word == "uc":
                uc = int(param) if param else 1
            elif word == "u" and not skipping:
                try:
                    cp = int(param)
                except ValueError:
                    cp = 0
                if cp < 0:
                    cp += 65536
                out.append(chr(cp))
                pending_uc_skip = uc
            elif not skipping:
                if word in _RTF_NEWLINE_WORDS:
                    out.append("\n")
                elif word == "tab":
                    out.append("\t")
                elif word in ("emdash", "endash"):
                    out.append("-")
                elif word in ("lquote", "rquote"):
                    out.append("'")
                elif word in ("ldblquote", "rdblquote"):
                    out.append('"')
            continue
        i += 1
        if c in "\r\n":
            continue
        if pending_uc_skip > 0:
            pending_uc_skip -= 1
            continue
        if not skipping:
            out.append(c)
    return "".join(out).strip()


# ---------------------------------------------------------------------------
# CFB writer — fixture/oracle generator (round-trip certification), and a
# minimal .doc builder on top of it. Not a crawl-path component.
# ---------------------------------------------------------------------------


def build_cfb(streams: dict[str, bytes], *, v4: bool = False) -> bytes:
    """A valid compound file holding the given streams ([MS-CFB] layout:
    header DIFAT → FAT → directory → miniFAT → mini stream → large streams).
    Streams under 4096 bytes go through the mini stream, exercising the
    reader's miniFAT path; larger ones use regular sectors. ``v4`` emits a
    major-version-4 file (4096-byte sectors) — the variant whose sector
    offsets start at a FULL first sector, not at byte 512."""
    ssz, msz, cutoff = (4096 if v4 else 512), 64, 4096

    def pad(b: bytes, size: int) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    small = {n: v for n, v in streams.items() if len(v) < cutoff}
    large = {n: v for n, v in streams.items() if len(v) >= cutoff}

    # mini stream: concatenation of small streams in 64-byte mini sectors
    mini_alloc: dict[str, tuple[int, int]] = {}  # name -> (start_mini, size)
    mini_parts: list[bytes] = []
    mini_cursor = 0
    for name, v in small.items():
        nsec = max(1, -(-len(v) // msz))
        mini_alloc[name] = (mini_cursor, len(v))
        mini_parts.append(pad(v, msz))
        mini_cursor += nsec
    mini_stream = pad(b"".join(mini_parts), ssz)
    n_mini_sects = mini_cursor

    # miniFAT: one chain per small stream
    minifat: list[int] = []
    for name, v in small.items():
        start, size = mini_alloc[name]
        nsec = max(1, -(-size // msz))
        minifat += list(range(start + 1, start + nsec)) + [_ENDOFCHAIN]
    minifat_bytes = pad(
        b"".join(struct.pack("<I", x) for x in minifat), ssz
    ) if minifat else b""

    # sector plan (after the FAT, whose size we solve for):
    # [FAT][directory][miniFAT][mini stream][large streams...]
    n_dir_entries = 1 + len(streams)
    n_dir_sects = max(1, -(-(n_dir_entries * 128) // ssz))
    n_minifat_sects = len(minifat_bytes) // ssz
    large_sects = {n: -(-len(v) // ssz) for n, v in large.items()}
    n_payload = (
        n_dir_sects
        + n_minifat_sects
        + len(mini_stream) // ssz
        + sum(large_sects.values())
    )
    # FAT sectors: cover themselves + payload (iterate to fixpoint)
    n_fat = 1
    while (n_fat + n_payload) > n_fat * (ssz // 4):
        n_fat += 1

    sect = 0
    fat_start = sect
    sect += n_fat
    dir_start = sect
    sect += n_dir_sects
    minifat_start = sect if n_minifat_sects else _ENDOFCHAIN
    sect += n_minifat_sects
    ministream_start = sect if len(mini_stream) else _ENDOFCHAIN
    sect += len(mini_stream) // ssz
    large_start: dict[str, int] = {}
    for name in large:
        large_start[name] = sect
        sect += large_sects[name]
    total_sects = sect

    fat = [_FREESECT] * (n_fat * (ssz // 4))
    for k in range(n_fat):
        fat[fat_start + k] = _FATSECT

    def chain(start: int, count: int) -> None:
        for k in range(count - 1):
            fat[start + k] = start + k + 1
        if count:
            fat[start + count - 1] = _ENDOFCHAIN

    chain(dir_start, n_dir_sects)
    if n_minifat_sects:
        chain(minifat_start, n_minifat_sects)
    if len(mini_stream):
        chain(ministream_start, len(mini_stream) // ssz)
    for name in large:
        chain(large_start[name], large_sects[name])

    def dir_entry(
        name: str, otype: int, start: int, size: int, child: int = _FREESECT
    ) -> bytes:
        raw = name.encode("utf-16-le")[:62]
        e = bytearray(128)
        e[0 : len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw) + 2)
        e[66] = otype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # flat directory: root's child points at entry 1; siblings chain via
    # the red-black fields — a simple left-spine (each entry's left sibling
    # is the next) keeps every reader happy for small counts
    entries = [
        dir_entry(
            "Root Entry",
            5,
            ministream_start if len(mini_stream) else _ENDOFCHAIN,
            len(mini_stream),
            child=1 if streams else _FREESECT,
        )
    ]
    names = list(streams)
    for idx, name in enumerate(names):
        v = streams[name]
        if name in mini_alloc:
            start, size = mini_alloc[name]
        else:
            start, size = large_start[name], len(v)
        e = bytearray(dir_entry(name, 2, start, size))
        nxt = idx + 2  # 1-based entry index of the next stream
        if idx + 1 < len(names):
            struct.pack_into("<I", e, 68, nxt)  # left sibling chain
        entries.append(bytes(e))
    dir_bytes = pad(b"".join(entries), ssz)
    assert len(dir_bytes) // ssz == n_dir_sects

    header = bytearray(ssz)  # v4: the header block is a FULL 4096 B sector
    header[0:8] = OLE_MAGIC
    struct.pack_into("<H", header, 24, 0x3E)  # minor
    struct.pack_into("<H", header, 26, 4 if v4 else 3)  # major
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 12 if v4 else 9)
    struct.pack_into("<H", header, 32, 6)
    if v4:
        struct.pack_into("<I", header, 40, n_dir_sects)  # v4 tracks dir count
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, cutoff)
    struct.pack_into("<I", header, 60, minifat_start)
    struct.pack_into("<I", header, 64, n_minifat_sects)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    for k in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * k, fat_start + k if k < n_fat else _FREESECT
        )
    if n_fat > 109:
        raise ValueError("fixture CFB too large for header-only DIFAT")

    fat_bytes = b"".join(struct.pack("<I", x) for x in fat)
    body = (
        bytes(header)
        + fat_bytes
        + dir_bytes
        + minifat_bytes
        + mini_stream
        + b"".join(pad(streams[n], ssz) for n in large)
    )
    assert (len(body) - ssz) // ssz == total_sects
    return body


def build_doc_bytes(text: str, *, unicode_pieces: bool = False) -> bytes:
    """A minimal valid Word 97 .doc containing ``text`` as the main document
    (FIB + two-piece Clx piece table in 1Table). With ``unicode_pieces`` the
    second piece is stored UTF-16 to exercise both PCD encodings. Built for
    round-trip certification of extract_doc_text — not a document writer."""
    half = len(text) // 2
    p1, p2 = text[:half], text[half:]
    wd = bytearray(2048)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 2, 0x00C1)  # nFib: Word 97
    struct.pack_into("<H", wd, 0x0A, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<I", wd, 0x4C, len(text))  # ccpText
    text_off = 0x800
    raw1 = p1.encode("cp1252", errors="replace")
    enc2 = "utf-16-le" if unicode_pieces else "cp1252"
    raw2 = p2.encode(enc2, errors="replace")
    wd += raw1 + raw2
    fc1 = (text_off * 2) | 0x40000000  # compressed: fc counts half-bytes
    fc2_base = text_off + len(raw1)
    fc2 = (fc2_base * 2) | 0x40000000 if not unicode_pieces else fc2_base
    plc = struct.pack("<III", 0, len(p1), len(text))
    plc += struct.pack("<HIH", 0, fc1, 0)
    plc += struct.pack("<HIH", 0, fc2, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    table = bytearray(0x40)  # fcClx points past a small header gap
    table += clx
    struct.pack_into("<I", wd, 0x01A2, 0x40)
    struct.pack_into("<I", wd, 0x01A6, len(clx))
    return build_cfb({"WordDocument": bytes(wd), "1Table": bytes(table)})
