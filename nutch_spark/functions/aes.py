"""Pure-Python AES (FIPS-197) + CBC mode — stdlib-only, used by the PDF
standard security handler (AESV2 /V 4 and AESV3 /V 5 encrypted documents,
reference: Tika's PDFBox path behind parse-tika; PDF 32000-1 §7.6).

The container has no crypto libs, so the block cipher is implemented from
the public FIPS-197 spec: S-box generated at import from the GF(2^8)
multiplicative inverse + affine transform, straightforward (non-T-table)
rounds. Throughput is ~0.5 MB/s per core — fine for the encrypted-PDF tail
of a crawl (decryption runs inside the parse mapInPandas stage, so it
scales out with executors); deployments that install `cryptography` can
monkeypatch `cbc_decrypt`/`cbc_encrypt` with a fast path.
"""

from __future__ import annotations


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses in GF(2^8) via 3 as generator
    exp = [0] * 256
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by 3: x ^= xtime(x)
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
        x &= 0xFF
    sbox = bytearray(256)
    for v in range(256):
        inv = 0 if v == 0 else exp[(255 - log[v]) % 255]
        # affine transform: b ^ rot1(b) ^ rot2(b) ^ rot3(b) ^ rot4(b) ^ 0x63
        res = (
            inv
            ^ ((inv << 1) | (inv >> 7)) & 0xFF
            ^ ((inv << 2) | (inv >> 6)) & 0xFF
            ^ ((inv << 3) | (inv >> 5)) & 0xFF
            ^ ((inv << 4) | (inv >> 4)) & 0xFF
            ^ 0x63
        )
        sbox[v] = res
    inv_sbox = bytearray(256)
    for v in range(256):
        inv_sbox[sbox[v]] = v
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys as 16-byte blocks (Nk=4/6/8 → 11/13/15 rounds)."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16/24/32 bytes")
    rounds = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = bytes(_SBOX[c] for c in t)
            t = bytes([t[0] ^ _RCON[i // nk - 1], t[1], t[2], t[3]])
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[c] for c in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(rounds + 1)]


def _mix_column(c: bytes, inv: bool) -> bytes:
    a0, a1, a2, a3 = c
    if not inv:
        return bytes(
            [
                _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3,
                a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3,
                a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3),
                _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2),
            ]
        )
    return bytes(
        [
            _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9),
            _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13),
            _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11),
            _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14),
        ]
    )


# state is column-major: byte i of the block is state[i % 4][i // 4]


def _shift_rows(s: list[bytearray], inv: bool) -> None:
    for r in range(1, 4):
        k = (-r) % 4 if inv else r
        s[r] = s[r][k:] + s[r][:k]


def _to_state(block: bytes) -> list[bytearray]:
    return [bytearray(block[r::4][i] for i in range(4)) for r in range(4)]


def _from_state(s: list[bytearray]) -> bytes:
    return bytes(s[r][c] for c in range(4) for r in range(4))


def encrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    s = _to_state(bytes(a ^ b for a, b in zip(block, key_schedule[0])))
    n = len(key_schedule) - 1
    for rnd in range(1, n + 1):
        for r in range(4):
            s[r] = bytearray(_SBOX[c] for c in s[r])
        _shift_rows(s, inv=False)
        if rnd != n:
            for c in range(4):
                col = _mix_column(bytes(s[r][c] for r in range(4)), inv=False)
                for r in range(4):
                    s[r][c] = col[r]
        rk = key_schedule[rnd]
        out = _from_state(s)
        s = _to_state(bytes(a ^ b for a, b in zip(out, rk)))
    return _from_state(s)


def decrypt_block(key_schedule: list[bytes], block: bytes) -> bytes:
    n = len(key_schedule) - 1
    s = _to_state(bytes(a ^ b for a, b in zip(block, key_schedule[n])))
    for rnd in range(n - 1, -1, -1):
        _shift_rows(s, inv=True)
        for r in range(4):
            s[r] = bytearray(_INV_SBOX[c] for c in s[r])
        rk = key_schedule[rnd]
        out = bytes(a ^ b for a, b in zip(_from_state(s), rk))
        s = _to_state(out)
        if rnd != 0:
            for c in range(4):
                col = _mix_column(bytes(s[r][c] for r in range(4)), inv=True)
                for r in range(4):
                    s[r][c] = col[r]
    return _from_state(s)


def expand_key(key: bytes) -> list[bytes]:
    """Public alias so callers can reuse one schedule across blocks."""
    return _expand_key(key)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC decrypt, NO padding removal (PDF strips PKCS#7 itself)."""
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # tolerate ragged tails
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(ks, blk), prev))
        prev = blk
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt, NO padding added (callers pad per their spec)."""
    if len(data) % 16:
        raise ValueError("cbc_encrypt needs 16-byte-aligned input")
    ks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        prev = encrypt_block(ks, bytes(a ^ b for a, b in zip(data[i : i + 16], prev)))
        out += prev
    return bytes(out)
