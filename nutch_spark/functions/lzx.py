"""LZX decompression (the CHM / cabinet flavor), from the public spec.

Reference behaviour: the parse-tika plugin delegates .chm files to Tika's
ChmParser, which decompresses the ``::DataSpace/Storage/MSCompressed``
section with LZX. This is a from-scratch implementation of the published
format ([MS-PATCH] LZXD and the cabinet SDK's LZX documentation, the same
public sources chmlib/cabextract derive from):

- bitstream of 16-bit little-endian words, bits consumed MSB-first;
- blocks: 3-bit type (1 verbatim, 2 aligned-offset, 3 uncompressed) +
  24-bit uncompressed size (16 high bits then 8 low bits);
- canonical Huffman trees whose path lengths are themselves Huffman-coded
  by 20-element pretrees (delta codes 0-16, zero-runs 17/18, repeat 19);
- main tree = 256 literals + 8 length-headers x position-slots, length
  tree = 249 symbols, aligned tree = 8 x 3-bit;
- LRU repeated-offset set R0/R1/R2 (initialized to 1), formatted offsets
  ``position_base[slot] + extra`` with the aligned-offset low-3-bit split;
- 32 KiB output frames with 16-bit realignment at each frame boundary and
  optional E8 call-translation undo.

The companion ``lzx_compress_block`` emits REAL spec-conformant verbatim /
uncompressed blocks (literal-only Huffman coding) so fixtures round-trip
through the genuine decoder — the same build-it-from-the-spec pattern the
repo uses for media containers and WordPerfect.
"""

from __future__ import annotations

import struct

FRAME = 0x8000  # 32 KiB output frame

_BLOCK_VERBATIM = 1
_BLOCK_ALIGNED = 2
_BLOCK_UNCOMPRESSED = 3


def _position_slots(window_bits: int) -> int:
    if window_bits == 21:
        return 50
    if window_bits == 20:
        return 42
    return window_bits * 2


def _position_tables() -> tuple[list[int], list[int]]:
    extra, base = [], []
    b = 0
    for i in range(51):
        e = min(17, max(0, (i // 2) - 1))
        extra.append(e)
        base.append(b)
        b += 1 << e
    return extra, base


_EXTRA_BITS, _POSITION_BASE = _position_tables()


class _BitReader:
    """16-bit little-endian words, bits served MSB-first."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # byte position of the next 16-bit word
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 16:
            if self.pos + 1 < len(self.data):
                word = self.data[self.pos] | (self.data[self.pos + 1] << 8)
            elif self.pos < len(self.data):
                word = self.data[self.pos]
            else:
                # a forged header that promises more output than the
                # stream encodes would otherwise decode padding forever
                if self.pos > len(self.data) + 16:
                    raise ValueError("LZX input exhausted")
                word = 0
            self.pos += 2
            self.buf = (self.buf << 16) | word
            self.nbits += 16

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        val = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return val

    def peek16(self) -> int:
        """Next 16 bits without consuming (zero-padded past stream end)."""
        self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def consume(self, n: int) -> None:
        self.nbits -= n

    def align16(self) -> None:
        self.nbits -= self.nbits % 16

    def byte_align_pos(self) -> int:
        """Byte offset of the first unconsumed byte (for uncompressed
        blocks, after align16)."""
        return self.pos - self.nbits // 8


class _Huffman:
    """Canonical-code decoder from a path-length array, via a direct
    2^16 prefix lookup (one table index per symbol instead of one dict
    probe per bit — the literal loop is the decode hot path)."""

    def __init__(self, lengths: list[int]) -> None:
        maxlen = max((l for l in lengths if l), default=0)
        self.shift = 16 - maxlen
        self.lut: list[tuple[int, int] | None] = [None] * (1 << maxlen)
        code = 0
        n = 0
        size = 1 << maxlen
        for ln in range(1, maxlen + 1):
            code <<= 1
            span = 1 << (maxlen - ln)
            for sym, l in enumerate(lengths):
                if l == ln:
                    base = code << (maxlen - ln)
                    if base + span > size:
                        # over-subscribed code space: a hostile tree
                        # declaration must fail loudly, not silently grow
                        # the table (slice-assign past the end APPENDS)
                        raise ValueError("oversubscribed LZX Huffman tree")
                    self.lut[base : base + span] = [(sym, ln)] * span
                    code += 1
                    n += 1
        self.empty = n == 0

    def decode(self, br: _BitReader) -> int:
        entry = self.lut[br.peek16() >> self.shift]
        if entry is None:
            raise ValueError("invalid LZX Huffman code")
        br.consume(entry[1])
        return entry[0]


def _read_lengths(br: _BitReader, prev: list[int], first: int, last: int) -> None:
    """Read path lengths [first, last) with a fresh 20-element pretree,
    updating ``prev`` in place (deltas are vs the previous tree's lengths)."""
    pre = _Huffman([br.read(4) for _ in range(20)])
    i = first
    while i < last:
        c = pre.decode(br)
        if c == 17:
            run = br.read(4) + 4
            for _ in range(run):
                if i < last:
                    prev[i] = 0
                    i += 1
        elif c == 18:
            run = br.read(5) + 20
            for _ in range(run):
                if i < last:
                    prev[i] = 0
                    i += 1
        elif c == 19:
            run = br.read(1) + 4
            z = pre.decode(br)
            val = (prev[i] + 17 - z) % 17 if i < last else 0
            for _ in range(run):
                if i < last:
                    prev[i] = val
                    i += 1
        else:
            prev[i] = (prev[i] + 17 - c) % 17
            i += 1


class LzxDecoder:
    """Stateful LZX decoder; call :meth:`reset` at CHM reset-block
    boundaries (fresh trees, R0-R2 = 1, E8 header re-read)."""

    def __init__(self, window_bits: int) -> None:
        if not 15 <= window_bits <= 21:
            raise ValueError(f"window bits {window_bits} outside 15..21")
        self.window_bits = window_bits
        self.slots = _position_slots(window_bits)
        self.reset()

    def reset(self) -> None:
        self.R = [1, 1, 1]
        self.main_lengths = [0] * (256 + 8 * self.slots)
        self.length_lengths = [0] * 249
        self.header_read = False
        self.intel_filesize = 0
        self.frames_done = 0

    def decompress(self, data: bytes, out_len: int) -> bytes:
        """Decompress one (reset-interval-sized) chunk to out_len bytes."""
        br = _BitReader(data)
        if not self.header_read:
            self.header_read = True
            if br.read(1):
                self.intel_filesize = (br.read(16) << 16) | br.read(16)
        out = bytearray()
        block_remaining = 0
        block_type = _BLOCK_VERBATIM
        aligned: _Huffman | None = None
        main: _Huffman | None = None
        lengths: _Huffman | None = None
        while len(out) < out_len:
            frame_end = (len(out) // FRAME + 1) * FRAME
            target = min(out_len, frame_end)
            while len(out) < target:
                if block_remaining == 0:
                    block_type = br.read(3)
                    block_remaining = (br.read(16) << 8) | br.read(8)
                    if block_type == _BLOCK_ALIGNED:
                        aligned = _Huffman([br.read(3) for _ in range(8)])
                    if block_type in (_BLOCK_VERBATIM, _BLOCK_ALIGNED):
                        _read_lengths(br, self.main_lengths, 0, 256)
                        _read_lengths(
                            br, self.main_lengths, 256, 256 + 8 * self.slots
                        )
                        main = _Huffman(self.main_lengths)
                        _read_lengths(br, self.length_lengths, 0, 249)
                        lengths = _Huffman(self.length_lengths)
                    elif block_type == _BLOCK_UNCOMPRESSED:
                        # "read 1-16 (not 0) bits to align": discard to the
                        # next 16-bit boundary; a full word when already on
                        # one (consumed bits ≡ 16 - nbits mod 16)
                        r = br.nbits % 16
                        br.read(r if r else 16)
                        p = br.byte_align_pos()
                        if p + 12 > len(data):
                            raise ValueError("truncated uncompressed block")
                        self.R = list(struct.unpack_from("<III", data, p))
                        p += 12
                        take = block_remaining
                        out += data[p : p + take]
                        p += take + (take & 1)  # odd-size pad byte
                        block_remaining = 0
                        # reposition the bit reader past the raw bytes
                        br = _BitReader(data)
                        br.pos = p
                        continue
                    else:
                        raise ValueError(f"bad LZX block type {block_type}")
                # decode until the frame target or the block ends; a match
                # may overshoot the frame boundary (legal — realignment
                # happens at the next symbol boundary), never the block
                while len(out) < target and block_remaining > 0:
                    sym = main.decode(br)
                    if sym < 256:
                        out.append(sym)
                        block_remaining -= 1
                        continue
                    sym -= 256
                    slot, len_header = sym >> 3, sym & 7
                    match_len = (
                        lengths.decode(br) + 9 if len_header == 7 else len_header + 2
                    )
                    if slot == 0:
                        offset = self.R[0]
                    elif slot == 1:
                        offset = self.R[1]
                        self.R[1] = self.R[0]
                        self.R[0] = offset
                    elif slot == 2:
                        offset = self.R[2]
                        self.R[2] = self.R[0]
                        self.R[0] = offset
                    else:
                        eb = _EXTRA_BITS[slot]
                        if block_type == _BLOCK_ALIGNED and eb >= 3:
                            v = br.read(eb - 3) << 3
                            formatted = _POSITION_BASE[slot] + v + aligned.decode(br)
                        else:
                            formatted = _POSITION_BASE[slot] + br.read(eb)
                        offset = formatted - 2
                        self.R[2] = self.R[1]
                        self.R[1] = self.R[0]
                        self.R[0] = offset
                    if offset > len(out):
                        raise ValueError("LZX match beyond window start")
                    for _ in range(match_len):
                        out.append(out[-offset])
                    block_remaining -= match_len
                if block_remaining < 0:
                    raise ValueError("LZX match crossed block boundary")
            if len(out) >= frame_end:
                br.align16()  # 16-bit realignment at each 32 KiB frame
            self.frames_done += 1
        if self.intel_filesize:
            out = self._undo_e8(out)
        return bytes(out[:out_len])

    def _undo_e8(self, out: bytearray) -> bytearray:
        """Reverse the encoder's E8 call translation (cabinet SDK: applied
        per 32 KiB frame, skipped for the last 10 bytes of each frame)."""
        fs = self.intel_filesize
        data = bytearray(out)
        pos = 0
        while pos + 10 <= len(data):
            frame_limit = min(pos + FRAME, len(data)) - 10
            i = pos
            while i < frame_limit:
                if data[i] != 0xE8:
                    i += 1
                    continue
                (absolute,) = struct.unpack_from("<i", data, i + 1)
                if -i <= absolute < fs:
                    rel = absolute - i if absolute >= 0 else absolute + fs
                    struct.pack_into("<i", data, i + 1, rel)
                i += 5
            pos += FRAME
        return data


# --------------------------------------------------------------------------
# fixture encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.words: list[int] = []
        self.cur = 0
        self.ncur = 0

    def write(self, val: int, n: int) -> None:
        self.cur = (self.cur << n) | (val & ((1 << n) - 1))
        self.ncur += n
        while self.ncur >= 16:
            self.ncur -= 16
            self.words.append((self.cur >> self.ncur) & 0xFFFF)
        self.cur &= (1 << self.ncur) - 1

    def align16(self) -> None:
        if self.ncur:
            self.write(0, 16 - self.ncur)

    def bytes(self) -> bytes:
        self.align16()
        return b"".join(struct.pack("<H", w) for w in self.words)


def _write_zero_lengths(bw: _BitWriter, count: int) -> None:
    """Pretree declaring `count` all-zero path lengths: only symbol 18 has
    a (1-bit) code; runs of 20-51 zeros each."""
    for sym in range(20):
        bw.write(1 if sym == 18 else 0, 4)
    left = count
    while left:
        if left < 20:  # can't happen for the 249/128+ arrays used here
            raise ValueError("zero-run tail below 20")
        run = min(51, left)
        if left - run and left - run < 20:
            run = left - 20
        bw.write(0, 1)  # symbol 18's 1-bit code
        bw.write(run - 20, 5)
        left -= run


def lzx_compress_block(
    data: bytes,
    window_bits: int = 16,
    *,
    intel_filesize: int = 0,
    first: bool = True,
    prev_literal_len: int = 0,
) -> bytes:
    """One spec-conformant verbatim LZX block encoding ``data`` with
    literal-only Huffman coding (every literal 8 bits — an exact canonical
    code; match symbols and the length tree are declared all-zero through
    real pretrees). Decodes with any conforming LZX decoder. A non-zero
    ``intel_filesize`` sets the E8 translation header (the caller supplies
    already-translated bytes; the decoder undoes the translation).

    For continuation blocks of the SAME stream (e.g. per-CFDATA frames in
    a cabinet folder), pass ``first=False`` (the E8 header appears once
    per stream) and ``prev_literal_len`` = the previous block's literal
    path length (8) so the delta-coded tree update is correct."""
    if not data:
        raise ValueError("empty input")
    bw = _BitWriter()
    if first:
        if intel_filesize:
            bw.write(1, 1)
            bw.write(intel_filesize >> 16, 16)
            bw.write(intel_filesize & 0xFFFF, 16)
        else:
            bw.write(0, 1)  # no E8 translation
    bw.write(_BLOCK_VERBATIM, 3)
    bw.write(len(data) >> 8, 16)
    bw.write(len(data) & 0xFF, 8)
    # main tree part 1: 256 literal lengths, all 8, delta-coded vs the
    # previous tree: code c with (prev + 17 - c) % 17 == 8. Pretree: that
    # single symbol at 1 bit.
    delta = (prev_literal_len + 17 - 8) % 17
    for sym in range(20):
        bw.write(1 if sym == delta else 0, 4)
    for _ in range(256):
        bw.write(0, 1)  # the delta symbol's 1-bit code
    # main tree part 2 (8 * slots match headers) + length tree: all zero
    _write_zero_lengths(bw, 8 * _position_slots(window_bits))
    _write_zero_lengths(bw, 249)
    for i, b in enumerate(data):
        bw.write(b, 8)  # canonical 8-bit code of literal b IS b
        if (i + 1) % FRAME == 0:  # 16-bit realignment at each 32 KiB frame
            bw.align16()
    return bw.bytes()


def lzx_compress_uncompressed_block(data: bytes) -> bytes:
    """One type-3 (uncompressed) LZX block: header, 16-bit alignment,
    little-endian R0/R1/R2, raw bytes, odd-size pad."""
    if not data:
        raise ValueError("empty input")
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(_BLOCK_UNCOMPRESSED, 3)
    bw.write(len(data) >> 8, 16)
    bw.write(len(data) & 0xFF, 8)
    head = bw.bytes()  # align16 happens here; 4+24 bits -> pads to 32
    body = struct.pack("<III", 1, 1, 1) + data
    if len(data) & 1:
        body += b"\x00"
    return head + body
