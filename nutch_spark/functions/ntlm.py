"""NTLM (NTLMv2) HTTP authentication — the last auth scheme the reference's
protocol-httpclient supports that this engine didn't (Http.java:62,
HttpAuthenticationFactory.java:79 hand the challenge to commons-httpclient's
NTLMScheme; the math below is the PUBLIC [MS-NLMP] spec).

Pieces:
- pure-Python MD4 (RFC 1320) — OpenSSL 3 ships it only behind the legacy
  provider, so hashlib.new("md4") is not dependable
- NTOWFv2 / NTLMv2+LMv2 response computation ([MS-NLMP] §3.3.2)
- NEGOTIATE / CHALLENGE / AUTHENTICATE message codecs ([MS-NLMP] §2.2.1)
- the 3-leg 401 handshake over ONE kept-alive http.client connection —
  NTLM authenticates the CONNECTION, so the legs must not be spread across
  pooled sockets the way urllib would
"""

from __future__ import annotations

import base64
import hmac
import struct

# ---------------------------------------------------------------------------
# MD4 (RFC 1320)
# ---------------------------------------------------------------------------

_R3_K = [0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15]


def md4(data: bytes) -> bytes:
    msg = bytearray(data)
    bit_len = (8 * len(data)) & 0xFFFFFFFFFFFFFFFF
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += bit_len.to_bytes(8, "little")

    def lrot(x: int, s: int) -> int:
        return ((x << s) | (x >> (32 - s))) & 0xFFFFFFFF

    state = [0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476]
    rot = [(0, 1, 2, 3), (3, 0, 1, 2), (2, 3, 0, 1), (1, 2, 3, 0)]
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", msg[off : off + 64])
        r = list(state)
        for i in range(16):  # round 1: F = (B & C) | (~B & D)
            a, b, c, d = rot[i % 4]
            f = (r[b] & r[c]) | (~r[b] & r[d])
            r[a] = lrot((r[a] + f + x[i]) & 0xFFFFFFFF, (3, 7, 11, 19)[i % 4])
        for i in range(16):  # round 2: G = majority, +0x5A827999
            a, b, c, d = rot[i % 4]
            g = (r[b] & r[c]) | (r[b] & r[d]) | (r[c] & r[d])
            k = (i % 4) * 4 + i // 4
            r[a] = lrot(
                (r[a] + g + x[k] + 0x5A827999) & 0xFFFFFFFF, (3, 5, 9, 13)[i % 4]
            )
        for i in range(16):  # round 3: H = xor, +0x6ED9EBA1
            a, b, c, d = rot[i % 4]
            h = r[b] ^ r[c] ^ r[d]
            r[a] = lrot(
                (r[a] + h + x[_R3_K[i]] + 0x6ED9EBA1) & 0xFFFFFFFF,
                (3, 9, 11, 15)[i % 4],
            )
        state = [(s + v) & 0xFFFFFFFF for s, v in zip(state, r)]
    return struct.pack("<4I", *state)


def _hmac_md5(key: bytes, data: bytes) -> bytes:
    return hmac.new(key, data, "md5").digest()


# ---------------------------------------------------------------------------
# [MS-NLMP] §3.3.2 NTLMv2
# ---------------------------------------------------------------------------


def ntowf_v2(user: str, password: str, domain: str) -> bytes:
    """NTOWFv2 = HMAC-MD5(MD4(UTF-16LE(password)),
    UTF-16LE(UPPER(user) + domain))."""
    nt_hash = md4(password.encode("utf-16-le"))
    return _hmac_md5(nt_hash, (user.upper() + domain).encode("utf-16-le"))


def ntlmv2_responses(
    user: str,
    password: str,
    domain: str,
    server_challenge: bytes,
    target_info: bytes,
    *,
    client_challenge: bytes,
    timestamp_100ns: int,
) -> tuple[bytes, bytes]:
    """(nt_challenge_response, lm_challenge_response)."""
    key = ntowf_v2(user, password, domain)
    blob = (
        b"\x01\x01\x00\x00\x00\x00\x00\x00"
        + struct.pack("<Q", timestamp_100ns)
        + client_challenge
        + b"\x00\x00\x00\x00"
        + target_info
        + b"\x00\x00\x00\x00"
    )
    nt_proof = _hmac_md5(key, server_challenge + blob)
    lm = _hmac_md5(key, server_challenge + client_challenge) + client_challenge
    return nt_proof + blob, lm


# ---------------------------------------------------------------------------
# message codecs ([MS-NLMP] §2.2.1)
# ---------------------------------------------------------------------------

_SIGNATURE = b"NTLMSSP\x00"
# Unicode | RequestTarget | NTLM | AlwaysSign | ExtendedSessionSecurity
_FLAGS = 0x00008201 | 0x00080000


def build_negotiate() -> bytes:
    """Type 1: bare negotiate — empty domain/workstation fields."""
    return _SIGNATURE + struct.pack("<II", 1, _FLAGS) + struct.pack(
        "<HHI", 0, 0, 32
    ) + struct.pack("<HHI", 0, 0, 32)


def parse_challenge(msg: bytes) -> tuple[bytes, bytes]:
    """Type 2 → (server_challenge, target_info)."""
    if msg[:8] != _SIGNATURE or struct.unpack("<I", msg[8:12])[0] != 2:
        raise ValueError("not an NTLM CHALLENGE message")
    server_challenge = msg[24:32]
    ti_len, _ti_max, ti_off = struct.unpack("<HHI", msg[40:48])
    return server_challenge, msg[ti_off : ti_off + ti_len]


def build_authenticate(
    user: str,
    password: str,
    domain: str,
    server_challenge: bytes,
    target_info: bytes,
    *,
    workstation: str = "NUTCH-SPARK",
    client_challenge: bytes | None = None,
    timestamp_100ns: int | None = None,
) -> bytes:
    """Type 3 with NTLMv2/LMv2 responses."""
    import os
    import time

    if client_challenge is None:
        client_challenge = os.urandom(8)
    if timestamp_100ns is None:
        # 100 ns ticks since 1601-01-01 (11644473600 s before the epoch)
        timestamp_100ns = int((time.time() + 11644473600) * 10_000_000)
    nt, lm = ntlmv2_responses(
        user, password, domain, server_challenge, target_info,
        client_challenge=client_challenge, timestamp_100ns=timestamp_100ns,
    )
    dom = domain.encode("utf-16-le")
    usr = user.encode("utf-16-le")
    wks = workstation.encode("utf-16-le")
    header_len = 64
    payload = bytearray()

    def field(blob: bytes) -> bytes:
        off = header_len + len(payload)
        payload.extend(blob)
        return struct.pack("<HHI", len(blob), len(blob), off)

    # field order in the payload mirrors the common layout: domain, user,
    # workstation, LM response, NT response (offsets make order irrelevant)
    f_dom = field(dom)
    f_usr = field(usr)
    f_wks = field(wks)
    f_lm = field(lm)
    f_nt = field(nt)
    f_session = struct.pack("<HHI", 0, 0, header_len + len(payload))
    return (
        _SIGNATURE
        + struct.pack("<I", 3)
        + f_lm
        + f_nt
        + f_dom
        + f_usr
        + f_wks
        + f_session
        + struct.pack("<I", _FLAGS)
        + bytes(payload)
    )


# ---------------------------------------------------------------------------
# the 3-leg HTTP handshake — one persistent connection
# ---------------------------------------------------------------------------


def ntlm_fetch(
    url: str,
    user: str,
    password: str,
    *,
    domain: str = "",
    headers: dict[str, str] | None = None,
    timeout_s: float = 10.0,
    max_bytes: int = 1 << 20,
) -> tuple[int, dict[str, str], bytes]:
    """GET ``url`` authenticating with NTLMv2: request → 401 NTLM →
    NEGOTIATE → 401 + CHALLENGE → AUTHENTICATE → final response. All three
    legs ride ONE keep-alive connection (http.client), because NTLM binds
    the authentication to the TCP connection, not the request. ``user`` may
    be ``DOMAIN\\user``. Returns (status, headers, body)."""
    import http.client
    import urllib.parse

    if "\\" in user and not domain:
        domain, user = user.split("\\", 1)
    sp = urllib.parse.urlsplit(url)
    conn_cls = (
        http.client.HTTPSConnection if sp.scheme == "https" else http.client.HTTPConnection
    )
    conn = conn_cls(sp.hostname, sp.port, timeout=timeout_s)
    path = (sp.path or "/") + (f"?{sp.query}" if sp.query else "")
    base_hdrs = {"Connection": "keep-alive", **(headers or {})}
    try:
        token1 = base64.b64encode(build_negotiate()).decode()
        conn.request("GET", path,
                     headers={**base_hdrs, "Authorization": f"NTLM {token1}"})
        resp = conn.getresponse()
        # drain to EOF so the keep-alive connection can be reused — a
        # single capped read could leave bytes on the socket and corrupt
        # the third leg's response parse. 401 bodies are small, so cap
        # the drain; a server streaming more than the cap can't be
        # reused for the connection-bound leg 3 → give up cleanly.
        drained, cap = 0, max(max_bytes, 1 << 20)
        while drained <= cap:
            chunk = resp.read(1 << 16)
            if not chunk:
                break
            drained += len(chunk)
        else:
            return resp.status, dict(resp.getheaders()), b""
        www = resp.getheader("WWW-Authenticate") or ""
        if resp.status != 401 or not www.startswith("NTLM "):
            return resp.status, dict(resp.getheaders()), b""
        challenge = base64.b64decode(www.split(" ", 1)[1].strip())
        server_challenge, target_info = parse_challenge(challenge)
        token3 = base64.b64encode(
            build_authenticate(user, password, domain, server_challenge, target_info)
        ).decode()
        conn.request("GET", path,
                     headers={**base_hdrs, "Authorization": f"NTLM {token3}"})
        final = conn.getresponse()
        body = final.read(max_bytes)
        return final.status, dict(final.getheaders()), body
    finally:
        conn.close()
